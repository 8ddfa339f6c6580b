"""Capture and summarize a TPU trace of the fused per-scan step.

Runs the bench-config fused pipeline (tools share io.synthetic.bench_config
with bench.py so they cannot drift), warms up past jit compilation, traces a
few steady-state scans with jax.profiler, then parses the Chrome-trace
export and prints device-time totals grouped by XLA op / op category.

Trace capture and parsing live in pipeline.traceutil — the SAME machinery
bench.py uses for its device_ms_per_scan field, so the two instruments
share one definition of device-busy time (VERDICT r3 finding #2).

Usage: python tools/profile_tpu.py [n_traced_scans]
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def run_and_trace(n_warm: int = 12, n_traced: int = 8):
    from dmsa_lidar_slam_tpu.io.synthetic import bench_config, bench_sequence, feed_scan
    from dmsa_lidar_slam_tpu.pipeline import traceutil
    from dmsa_lidar_slam_tpu.pipeline.fused import FusedDmsaSlam

    slam = FusedDmsaSlam(bench_config(), flush_every=20)
    seq = bench_sequence(3)
    t_imu = seq.t_start - 0.2
    for i in range(n_warm):
        t_imu = feed_scan(slam, seq, i, t_imu)
    _ = slam.kf_count  # sync

    with traceutil.capture() as trace_dir:
        for i in range(n_warm, n_warm + n_traced):
            t_imu = feed_scan(slam, seq, i, t_imu)
        _ = slam.kf_count  # sync
    return trace_dir, n_traced


def summarize(trace_dir: str, n_traced: int):
    from dmsa_lidar_slam_tpu.pipeline import traceutil

    mod_total, ops, opn = traceutil.op_totals(trace_dir)
    print(f"device busy {mod_total:.1f} ms -> {mod_total / n_traced:.2f} ms/scan\n")

    print("top ops (total over trace):")
    for k, v in sorted(ops.items(), key=lambda kv: -kv[1])[:30]:
        print(f"  {v / 1e3:9.2f} ms  x{opn[k]:6d}  {k[:110]}")

    cat, catn = traceutil.category_totals(ops, opn, mod_total)
    print("\nby category (structural ops excluded):")
    for k, v in sorted(cat.items(), key=lambda kv: -kv[1])[:25]:
        print(f"  {v / 1e3:9.2f} ms  x{catn[k]:7d}  {k}")


def main():
    n_traced = int(sys.argv[1]) if len(sys.argv) > 1 else 8
    trace_dir, n = run_and_trace(n_traced=n_traced)
    summarize(trace_dir, n)


if __name__ == "__main__":
    main()
