"""Diagnose the bench ATE: keyframe-only vs full-ledger error, per-pose
breakdown. Runs the exact bench configuration on the CPU backend.
"""

import os

os.environ["XLA_FLAGS"] = "--xla_force_host_platform_device_count=8"

import jax

jax.config.update("jax_platforms", "cpu")

import numpy as np


def main():
    from dmsa_lidar_slam_tpu.config import Config
    from dmsa_lidar_slam_tpu.io.synthetic import SyntheticSequence, ate_rmse
    from dmsa_lidar_slam_tpu.pipeline.fused import FusedDmsaSlam

    cfg = Config(
        n_clouds=5, num_control_poses=6, max_num_points_per_scan=3000,
        min_dist_ds=2.0, min_dist=0.1, num_iter_sliding_window_optim=10,
        num_iter_keyframe_optim=10, min_num_points_gauss=10,
        min_num_points_gauss_key=10, closest_k_keyframes_as_static_points=3,
        last_n_keyframes_for_optim=50, dist_new_keyframe=0.5, use_imu=True,
        imu_factor_weight_submap=0.001, n_dense=501, static_points_cap=8192,
        scan_cap_factor=1.3, keyframe_points_cap=4096, raw_scan_cap=32768,
    )
    slam = FusedDmsaSlam(cfg, flush_every=20)
    seq = SyntheticSequence(rng=np.random.default_rng(3), noise_std=0.01)

    t_imu = seq.t_start - 0.2
    for i in range(50):
        t_end = seq.t_start + (i + 1) * seq.sweep
        ts, acc, gyr = seq.imu_samples(t_imu, t_end)
        for j in range(len(ts)):
            slam.process_imu(acc[j], gyr[j], ts[j])
        t_imu = t_end
        pts, stamps, rings = seq.scan(i, 20000)
        slam.process_scan(pts, stamps, rings)

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
        kind = "KF" if bool(np.isin(ls[i], ks)) or any(abs(ls[i]-s)<1e-9 for s,_,_ in slam.output.static_keyframes) else "nk"
        print(f"{i:3d} {kind} t={ls[i]-seq.t_start:7.3f} err={err[i]:7.4f}")
    ev = np.array(slam.state.events)
    print("stop reasons (col16):", np.unique(ev[:, 16], return_counts=True))
    print("overlaps:", np.round(ev[ev[:, 0] > 1.5, 15], 2))


if __name__ == "__main__":
    main()
