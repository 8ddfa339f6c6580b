"""Diagnose the bench ATE: keyframe-only vs full-ledger error, per-pose
breakdown. Runs the exact bench configuration (io.synthetic.bench_config)
on the CPU backend.

Usage: PYTHONPATH=. python tools/bench_diag.py [--seed N] [--no-imu]
"""

import argparse
import os

os.environ["XLA_FLAGS"] = "--xla_force_host_platform_device_count=8"

import jax

jax.config.update("jax_platforms", "cpu")

import numpy as np


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--seed", type=int, default=3)
    ap.add_argument("--no-imu", action="store_true")
    ap.add_argument("--scans", type=int, default=50)
    args = ap.parse_args()

    from dmsa_lidar_slam_tpu.io.synthetic import (
        ate_rmse,
        bench_config,
        bench_sequence,
        feed_scan,
    )
    from dmsa_lidar_slam_tpu.pipeline.fused import FusedDmsaSlam

    cfg = bench_config(use_imu=not args.no_imu)
    slam = FusedDmsaSlam(cfg, flush_every=20)
    seq = bench_sequence(args.seed)

    t_imu = seq.t_start - 0.2
    for i in range(args.scans):
        t_imu = feed_scan(slam, seq, i, t_imu)

    slam._flush_events()
    ks, kt, _ = slam.keyframe_poses()
    print("keyframes:", slam.kf_count, "retired:", len(slam.output.static_keyframes))
    print("keyframe-only ATE:", ate_rmse(ks, kt, seq))
    ls, lt, _ = slam.all_poses()
    print("ledger poses:", len(ls), "ledger ATE:", ate_rmse(ls, lt, seq))
    # per-pose errors (unaligned, anchored at first pose)
    gt = np.asarray([seq.pose(float(s)).position for s in ls])
    est = np.asarray(lt, float) - np.asarray(lt[0], float) + gt[0]
    err = np.linalg.norm(est - gt, axis=1)
    for i in range(len(ls)):
        kind = (
            "KF"
            if bool(np.isin(ls[i], ks))
            or any(abs(ls[i] - s) < 1e-9 for s, _, _ in slam.output.static_keyframes)
            else "nk"
        )
        print(f"{i:3d} {kind} t={ls[i]-seq.t_start:7.3f} err={err[i]:7.4f}")
    ev = np.array(slam.state.events)
    print("stop reasons (col16):", np.unique(ev[:, 16], return_counts=True))
    print("overlaps:", np.round(ev[ev[:, 0] > 1.5, 15], 2))


if __name__ == "__main__":
    main()
