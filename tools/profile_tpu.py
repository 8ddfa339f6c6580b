"""Capture and summarize a TPU trace of the fused per-scan step.

Runs the bench-config fused pipeline (tools share io.synthetic.bench_config
with bench.py so they cannot drift), warms up past jit compilation, traces a
few steady-state scans with jax.profiler, then parses the Chrome-trace
export and prints device-time totals grouped by XLA op / op category.

Usage: python tools/profile_tpu.py [n_traced_scans]
"""

import collections
import glob
import gzip
import json
import os
import re
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

TRACE_DIR = "/tmp/dmsa_profile"


def run_and_trace(n_warm: int = 12, n_traced: int = 8):
    import jax

    from dmsa_lidar_slam_tpu.io.synthetic import bench_config, bench_sequence, feed_scan
    from dmsa_lidar_slam_tpu.pipeline.fused import FusedDmsaSlam

    slam = FusedDmsaSlam(bench_config(), flush_every=20)
    seq = bench_sequence(3)
    t_imu = seq.t_start - 0.2
    for i in range(n_warm):
        t_imu = feed_scan(slam, seq, i, t_imu)
    _ = slam.kf_count  # sync

    with jax.profiler.trace(TRACE_DIR):
        for i in range(n_warm, n_warm + n_traced):
            t_imu = feed_scan(slam, seq, i, t_imu)
        _ = slam.kf_count  # sync
    return n_traced


def load_trace(trace_dir: str):
    paths = glob.glob(os.path.join(trace_dir, "**", "*.trace.json.gz"), recursive=True)
    if not paths:
        raise SystemExit(f"no trace.json.gz under {trace_dir}")
    path = max(paths, key=os.path.getmtime)
    d = json.loads(gzip.decompress(open(path, "rb").read()))
    events = d.get("traceEvents", [])
    pids = {
        e["pid"]: e["args"].get("name", "")
        for e in events
        if e.get("ph") == "M" and e.get("name") == "process_name"
    }
    tids = {
        (e["pid"], e["tid"]): e["args"].get("name", "")
        for e in events
        if e.get("ph") == "M" and e.get("name") == "thread_name"
    }
    xs = [e for e in events if e.get("ph") == "X"]
    return xs, pids, tids


def summarize(n_traced: int):
    xs, pids, tids = load_trace(TRACE_DIR)
    ts0 = min(e["ts"] for e in xs)
    ts1 = max(e["ts"] + e.get("dur", 0) for e in xs)
    print(f"trace span {(ts1 - ts0) / 1e3:.1f} ms over {n_traced} scans")

    mod_total = 0.0
    ops = collections.Counter()
    opn = collections.Counter()
    for e in xs:
        line = tids.get((e["pid"], e["tid"]), "")
        if line == "XLA Modules":
            mod_total += e.get("dur", 0)
        elif line == "XLA Ops":
            ops[e["name"]] += e.get("dur", 0)
            opn[e["name"]] += 1
    print(f"device busy {mod_total / 1e3:.1f} ms -> {mod_total / n_traced / 1e3:.2f} ms/scan\n")

    print("top ops (total over trace):")
    for k, v in ops.most_common(30):
        print(f"  {v / 1e3:9.2f} ms  x{opn[k]:6d}  {k[:110]}")

    cat = collections.Counter()
    catn = collections.Counter()
    # structural ops (conditionals/whiles) nest the rest; skip double counts
    for k, v in ops.items():
        if re.match(r"^(conditional|while)[.\d]*$", k) and v > 0.05 * mod_total:
            continue
        base = re.sub(r"[.\d]+$", "", k)
        cat[base] += v
        catn[base] += opn[k]
    print("\nby category (structural ops excluded):")
    for k, v in cat.most_common(25):
        print(f"  {v / 1e3:9.2f} ms  x{catn[k]:7d}  {k}")


def main():
    n_traced = int(sys.argv[1]) if len(sys.argv) > 1 else 8
    os.system(f"rm -rf {TRACE_DIR}")
    n = run_and_trace(n_traced=n_traced)
    summarize(n)


if __name__ == "__main__":
    main()
