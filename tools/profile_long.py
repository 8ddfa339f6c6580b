"""Capture and summarize a TPU trace of the LONG-config fused per-scan step.

Same machinery as tools/profile_tpu.py (pipeline.traceutil) but at the
realistic long-bench configuration (io.synthetic.long_config /
long_sequence: OS-128 131072-pt raw scans, uncapped submap spans) — the
regime where BENCH long.ratio is measured.  Traces a window of scans that
includes keyframe/submap events so the submap adjustment shows up with its
amortized weight.

Usage: python tools/profile_long.py [n_warm] [n_traced]
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def run_and_trace(n_warm: int = 40, n_traced: int = 12):
    import bench as benchmod
    from dmsa_lidar_slam_tpu.io.synthetic import long_config, long_sequence
    from dmsa_lidar_slam_tpu.pipeline import traceutil
    from dmsa_lidar_slam_tpu.pipeline.fused import FusedDmsaSlam

    seq = long_sequence(3)
    t0 = time.perf_counter()
    data = benchmod.pregenerate(seq, n_warm + n_traced, pts_per_scan=131072, n_rings=128)
    print(f"gen {time.perf_counter() - t0:.1f} s", flush=True)

    slam = FusedDmsaSlam(long_config(), flush_every=20)
    t0 = time.perf_counter()
    for i in range(n_warm):
        benchmod.feed(slam, data[i])
    _ = slam.kf_count  # sync
    print(f"warm {time.perf_counter() - t0:.1f} s", flush=True)

    t0 = time.perf_counter()
    with traceutil.capture() as trace_dir:
        for i in range(n_warm, n_warm + n_traced):
            benchmod.feed(slam, data[i])
        _ = slam.kf_count  # sync
    print(f"traced wall {(time.perf_counter() - t0) * 1e3 / n_traced:.1f} ms/scan", flush=True)
    return trace_dir, n_traced


def main():
    n_warm = int(sys.argv[1]) if len(sys.argv) > 1 else 40
    n_traced = int(sys.argv[2]) if len(sys.argv) > 2 else 12
    trace_dir, n = run_and_trace(n_warm=n_warm, n_traced=n_traced)
    from tools.profile_tpu import summarize

    summarize(trace_dir, n)


if __name__ == "__main__":
    main()
