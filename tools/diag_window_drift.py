"""Diagnostic: per-scan window drift on the bench scene.

Runs the exact bench configuration and, after every dispatched scan, pulls
the stored optimized window (state.ow_*) and compares each control pose to
the analytic truth: position error and yaw error per control pose.  Shows
whether drift enters at the anchor (handoff/gauge), the tail (new poses),
or uniformly (map pull).

Usage: PYTHONPATH=. python tools/diag_window_drift.py [--no-imu] [--seed N]
"""

import argparse
import os

os.environ["XLA_FLAGS"] = "--xla_force_host_platform_device_count=8"

import jax

jax.config.update("jax_platforms", "cpu")

import numpy as np


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--no-imu", action="store_true")
    ap.add_argument("--seed", type=int, default=3)
    ap.add_argument("--scans", type=int, default=50)
    args = ap.parse_args()

    from dmsa_lidar_slam_tpu.io.synthetic import ate_rmse, bench_config, bench_sequence
    from dmsa_lidar_slam_tpu.pipeline.fused import FusedDmsaSlam
    from scipy.spatial.transform import Rotation

    cfg = bench_config(use_imu=not args.no_imu)
    slam = FusedDmsaSlam(cfg, flush_every=20)
    seq = bench_sequence(args.seed)

    t_imu = seq.t_start - 0.2
    for i in range(args.scans):
        t_end = seq.t_start + (i + 1) * seq.sweep
        ts, acc, gyr = seq.imu_samples(t_imu, t_end)
        for j in range(len(ts)):
            slam.process_imu(acc[j], gyr[j], ts[j])
        t_imu = t_end
        pts, stamps, rings = seq.scan(i, 20000)
        slam.process_scan(pts, stamps, rings)

        if slam.scan_counter == 0 or not bool(slam.state.submap_initialized):
            continue
        # stored old window: global ctrl poses + stamps rel to its t0
        t0_w = slam._window_t0_history[-1]
        stamps_rel = np.array(slam.state.ow_stamps)
        transl = np.array(slam.state.ow_transl)
        orient = np.array(slam.state.ow_orient)
        t_abs = t0_w + stamps_rel
        # constant gauge: estimator frame = truth pose at the FIRST window t0
        # (yaw unobservable from gravity init, position anchored at origin)
        if not hasattr(slam, "_diag_gauge"):
            tp0 = seq.pose(float(t_abs[0]))
            slam._diag_gauge = (
                Rotation.from_rotvec([0.0, 0.0, tp0.rotvec[2]]).as_matrix(),
                tp0.position,
            )
        R0, g_p0 = slam._diag_gauge
        est_w = transl @ R0.T + g_p0[None, :]
        gt_pos = np.stack([seq.pose(float(t)).position for t in t_abs])
        gt_yaw = np.array([seq.pose(float(t)).rotvec[2] for t in t_abs])
        est_yaw = np.array(
            [Rotation.from_rotvec(o).as_euler("zyx")[0] for o in orient]
        ) + np.arctan2(R0[1, 0], R0[0, 0])
        perr = np.linalg.norm(est_w - gt_pos, axis=1)
        yerr = est_yaw - gt_yaw
        # error decomposition: along-track / cross-track / vertical, and
        # orientation error tilt (xy) vs yaw (z), at anchor and tail
        dvec = est_w - gt_pos
        v_dir = seq.v_lin / np.linalg.norm(seq.v_lin)
        e_alg = dvec @ v_dir
        e_z = dvec[:, 2]
        e_crs = np.sign(np.cross(np.tile(v_dir, (len(dvec), 1)), dvec)[:, 2]) * np.sqrt(
            np.maximum(np.linalg.norm(dvec, axis=1) ** 2 - e_alg**2 - e_z**2, 0)
        )
        # full orientation error: est R0*R vs truth R
        tilt = []
        for k in (0, 5):
            R_est = R0 @ Rotation.from_rotvec(orient[k]).as_matrix()
            R_gt = Rotation.from_rotvec(seq.pose(float(t_abs[k])).rotvec).as_matrix()
            aa = Rotation.from_matrix(R_gt.T @ R_est).as_rotvec()
            tilt.append((np.linalg.norm(aa[:2]) * 1e3, aa[2] * 1e3))
        ev = np.array(slam.state.events[(slam.state.ev_index - 1) % slam.shapes.ev_cap])
        print(
            f"scan {i:3d} etype={int(ev[0])} ov={ev[15]:.2f} "
            f"perr0={perr[0]:.3f} perr5={perr[5]:.3f} "
            f"alg=[{e_alg[0]:+.3f} {e_alg[5]:+.3f}] "
            f"crs=[{e_crs[0]:+.3f} {e_crs[5]:+.3f}] "
            f"z=[{e_z[0]:+.3f} {e_z[5]:+.3f}] "
            f"tilt=[{tilt[0][0]:.1f} {tilt[1][0]:.1f}] "
            f"yaw=[{tilt[0][1]:+.1f} {tilt[1][1]:+.1f}]mrad"
        )

    slam._flush_events()
    ks, kt, _ = slam.keyframe_poses()
    ls, lt, _ = slam.all_poses()
    print("keyframe ATE:", ate_rmse(ks, kt, seq), " ledger ATE:", ate_rmse(ls, lt, seq))


if __name__ == "__main__":
    main()
