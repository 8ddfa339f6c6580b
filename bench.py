"""Benchmark: realtime ratio of the full SLAM pipeline on synthetic data.

Runs the complete per-scan pipeline (preprocess -> window build -> static
points -> sliding-window DMSA -> keyframes -> submap DMSA) on a synthetic
LiDAR-inertial sequence at reference-like settings (3000 pts/scan after
downsampling, 5-scan window, 6 control poses, 10 window iterations) and
reports data-seconds processed per wall-second, excluding jit warmup.

Baseline: the reference C++ runs at 0.33-0.5x realtime
(/root/reference/README.md:54); vs_baseline uses 0.5x (its best case).
"""

import json
import time

import numpy as np


def main():
    from dmsa_lidar_slam_tpu.config import Config
    from dmsa_lidar_slam_tpu.io.synthetic import SyntheticSequence, ate_rmse
    from dmsa_lidar_slam_tpu.pipeline.fused import FusedDmsaSlam

    cfg = Config(
        n_clouds=5,
        num_control_poses=6,
        max_num_points_per_scan=3000,
        min_dist_ds=2.0,
        min_dist=0.1,
        num_iter_sliding_window_optim=10,
        num_iter_keyframe_optim=10,
        min_num_points_gauss=10,
        min_num_points_gauss_key=10,
        closest_k_keyframes_as_static_points=3,
        last_n_keyframes_for_optim=50,
        dist_new_keyframe=0.5,  # ~1 keyframe / 4 scans at bench speed, so the
        # submap optimization + retirement paths carry real weight in the number
        use_imu=True,
        imu_factor_weight_submap=0.001,
        n_dense=501,
        static_points_cap=8192,
        scan_cap_factor=1.3,
        keyframe_points_cap=4096,
        raw_scan_cap=32768,
    )
    slam = FusedDmsaSlam(cfg, flush_every=20)
    seq = SyntheticSequence(rng=np.random.default_rng(3), noise_std=0.01)

    sweep = seq.sweep
    n_warm = 10  # scans for jit warmup (excluded from timing)
    n_bench = 40

    pts_per_scan = 20000  # raw points before downsampling

    def feed(i, t_imu_from):
        t_end = seq.t_start + (i + 1) * sweep
        ts, acc, gyr = seq.imu_samples(t_imu_from, t_end)
        for j in range(len(ts)):
            slam.process_imu(acc[j], gyr[j], ts[j])
        pts, stamps, rings = seq.scan(i, pts_per_scan)
        slam.process_scan(pts, stamps, rings)
        return t_end

    t_imu = seq.t_start - 0.2
    for i in range(n_warm):
        t_imu = feed(i, t_imu)

    import contextlib
    import os

    prof = contextlib.nullcontext()
    if os.environ.get("DMSA_PROFILE_DIR"):
        import jax

        prof = jax.profiler.trace(os.environ["DMSA_PROFILE_DIR"])

    t0 = time.perf_counter()
    with prof:
        for i in range(n_warm, n_warm + n_bench):
            t_imu = feed(i, t_imu)
        _ = slam.kf_count  # drain the async dispatch queue
    wall = time.perf_counter() - t0

    data_time = n_bench * sweep
    ratio = data_time / wall

    n = slam.kf_count
    # accuracy over the FULL merged trajectory (retired + live keyframes +
    # non-keyframe poses) — the same ledger the TUM writer emits
    stamps, transl, _ = slam.all_poses()
    rmse = ate_rmse(stamps, transl, seq) if len(stamps) >= 3 else None
    if rmse is None or not np.isfinite(rmse):
        raise SystemExit(f"bench failed: no usable ATE ({len(stamps)} poses)")
    if rmse > 0.10:
        raise SystemExit(f"bench failed: ATE RMSE {rmse:.4f} m > 0.10 m")

    result = {
        "metric": "realtime_ratio",
        "value": round(ratio, 4),
        "unit": "x_realtime",
        "vs_baseline": round(ratio / 0.5, 4),
        "detail": {
            "scans_per_sec": round(n_bench / wall, 3),
            "n_bench_scans": n_bench,
            "keyframes": int(n),
            "trajectory_poses": int(len(stamps)),
            "synthetic_ate_rmse_m": round(rmse, 4),
            "stage_times": {k: round(v["total_s"], 3) for k, v in slam.metrics.summary().items()},
        },
    }
    print(json.dumps(result))


if __name__ == "__main__":
    main()
