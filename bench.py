"""Benchmark: realtime ratio of the full SLAM pipeline on synthetic data.

Runs the complete per-scan pipeline (preprocess -> window build -> static
points -> sliding-window DMSA -> keyframes -> submap DMSA) on a synthetic
LiDAR-inertial sequence at reference-like settings (see
io.synthetic.bench_config) and reports data-seconds processed per
wall-second, excluding jit warmup.

The accuracy gate (trajectory ATE vs the analytic truth) is checked over
MULTIPLE seeds; the JSON line is ALWAYS printed — a failed gate sets
"gate": "failed" and exits nonzero AFTER printing, so a red round still
records its throughput (VERDICT r2 finding #3).

Baseline: the reference C++ runs at 0.33-0.5x realtime
(/root/reference/README.md:54); vs_baseline uses 0.5x (its best case).
"""

import contextlib
import json
import os
import sys
import time

import numpy as np

ATE_GATE_M = 0.10
SEEDS = (3, 4, 7)  # multi-seed gate (VERDICT r2: single-seed is a coin flip)


def run_sequence(cfg, seed: int, n_scans: int, timed_from: int = 0):
    """Run the fused pipeline over `n_scans`; returns (slam, seq, wall_s of
    scans >= timed_from, profiled)."""
    from dmsa_lidar_slam_tpu.io.synthetic import bench_sequence, feed_scan
    from dmsa_lidar_slam_tpu.pipeline.fused import FusedDmsaSlam

    slam = FusedDmsaSlam(cfg, flush_every=20)
    seq = bench_sequence(seed)
    t_imu = seq.t_start - 0.2
    for i in range(timed_from):
        t_imu = feed_scan(slam, seq, i, t_imu)

    prof = contextlib.nullcontext()
    if os.environ.get("DMSA_PROFILE_DIR"):
        import jax

        prof = jax.profiler.trace(os.environ["DMSA_PROFILE_DIR"])

    t0 = time.perf_counter()
    with prof:
        for i in range(timed_from, n_scans):
            t_imu = feed_scan(slam, seq, i, t_imu)
        _ = slam.kf_count  # drain the async dispatch queue
    wall = time.perf_counter() - t0
    return slam, seq, wall


def main():
    from dmsa_lidar_slam_tpu.io.synthetic import ate_rmse, bench_config

    cfg_fn = bench_config
    n_warm = 10  # scans for jit warmup (excluded from timing)
    n_bench = 40

    # --- primary (timed) run, seed 3 ------------------------------------
    slam, seq, wall = run_sequence(cfg_fn(), SEEDS[0], n_warm + n_bench, timed_from=n_warm)
    sweep = seq.sweep
    ratio = (n_bench * sweep) / wall

    ates = {}
    stamps, transl, _ = slam.all_poses()
    ates[SEEDS[0]] = ate_rmse(stamps, transl, seq) if len(stamps) >= 3 else float("nan")
    n_kf = slam.kf_count
    n_traj = len(stamps)
    stage_times = {k: round(v["total_s"], 3) for k, v in slam.metrics.summary().items()}

    # --- extra accuracy-only seeds (untimed) ----------------------------
    for seed in SEEDS[1:]:
        s2, q2, _ = run_sequence(cfg_fn(), seed, n_warm + n_bench)
        st2, tr2, _ = s2.all_poses()
        ates[seed] = ate_rmse(st2, tr2, q2) if len(st2) >= 3 else float("nan")

    worst = max(ates.values())
    gate_ok = np.isfinite(worst) and worst <= ATE_GATE_M

    result = {
        "metric": "realtime_ratio",
        "value": round(ratio, 4),
        "unit": "x_realtime",
        "vs_baseline": round(ratio / 0.5, 4),
        "gate": "passed" if gate_ok else "failed",
        "detail": {
            "scans_per_sec": round(n_bench / wall, 3),
            "n_bench_scans": n_bench,
            "keyframes": int(n_kf),
            "trajectory_poses": int(n_traj),
            "synthetic_ate_rmse_m": round(float(ates[SEEDS[0]]), 4),
            "ate_per_seed_m": {str(k): round(float(v), 4) for k, v in ates.items()},
            "ate_gate_m": ATE_GATE_M,
            "stage_times": stage_times,
        },
    }
    print(json.dumps(result))
    if not gate_ok:
        print(f"bench gate FAILED: worst ATE {worst:.4f} m > {ATE_GATE_M} m", file=sys.stderr)
        sys.exit(1)


if __name__ == "__main__":
    main()
