"""Diagnostic: are the window IMU residuals zero-bias at the TRUTH poses?

Builds a bench-like window (5 scans, post-ramp constant-twist motion,
analytically consistent IMU) exactly the way pipeline.fused.assemble_window
does, sets the control poses to ground truth, and prints the raw rot/vel/pos
errors + weighted residuals per interval.  If these are far from zero the
IMU factor math (resampling, preintegration, model velocities) is biased.
"""

import os

os.environ["XLA_FLAGS"] = "--xla_force_host_platform_device_count=8"

import jax

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", True)

import numpy as np
import jax.numpy as jnp


def main():
    from dmsa_lidar_slam_tpu.core import poses as cp
    from dmsa_lidar_slam_tpu.imu.buffer import ImuBuffer
    from dmsa_lidar_slam_tpu.io.synthetic import SyntheticSequence
    from dmsa_lidar_slam_tpu.trajectory import continuous as ct

    seq = SyntheticSequence(rng=np.random.default_rng(3), noise_std=0.0)
    shapes = ct.WindowShapes(n_window_pts=8, n_static=0, n_ctrl=6, n_dense=501)
    pdt = jnp.float64

    # window over scans 20..24 (well past the ramp: constant twist)
    i0 = 20
    t0_w = seq.t_start + i0 * seq.sweep
    t1_w = seq.t_start + (i0 + 5) * seq.sweep
    horizon = (t1_w - t0_w) + 1e-3
    dt = horizon / (shapes.n_dense - 1)

    buf = ImuBuffer()
    # feed from the static pre-ramp start like the bench does, so the
    # first-50-sample gyro bias estimate is legitimate
    ts, acc, gyr = seq.imu_samples(seq.t_start - 0.2, t1_w + 0.1)
    for j in range(len(ts)):
        buf.add_measurement(acc[j], gyr[j], ts[j])
    dense_t = t0_w + np.arange(shapes.n_dense) * dt
    acc_d, gyr_d, timediff = buf.resample_nearest(dense_t)
    print("resample timediff:", timediff)

    cov_gyr = jnp.asarray(0.01**2 * np.eye(3), pdt)
    cov_acc = jnp.asarray(0.3**2 * np.eye(3), pdt)
    pr_rot, pr_vel, pr_pos, cov_inv, pr_full = ct.compute_preint_factors(
        jnp.asarray(gyr_d, pdt), jnp.asarray(acc_d, pdt), jnp.asarray(dt, pdt),
        cov_gyr, cov_acc, shapes
    )

    # truth control poses at the control stamps
    ctrl_t = t0_w + np.array(shapes.param_indices) * dt
    g_orient = np.stack([seq.pose(t).rotvec for t in ctrl_t])
    g_transl = np.stack([seq.pose(t).position for t in ctrl_t])
    gp = cp.GlobalPoses(orient=jnp.asarray(g_orient, pdt), transl=jnp.asarray(g_transl, pdt))
    chain = cp.global2relative(gp)

    data = ct.WindowData(
        local_pts=jnp.zeros((8, 3), jnp.float32),
        pt_mask=jnp.zeros(8, bool),
        pt_ring=jnp.zeros(8, jnp.int32),
        pt_tform_idx=jnp.zeros(8, jnp.int32),
        static_pts=jnp.zeros((0, 3), jnp.float32),
        static_mask=jnp.zeros(0, bool),
        static_ring=jnp.zeros(0, jnp.int32),
        anchor_orient=chain.orient[0],
        anchor_transl=chain.transl[0],
        ctrl_stamps=ct.ctrl_stamps_from_dt(jnp.asarray(dt, pdt), shapes),
        dt=jnp.asarray(dt, pdt),
        horizon=jnp.asarray(horizon, pdt),
        acc_dense=jnp.asarray(acc_d, pdt),
        gyr_dense=jnp.asarray(gyr_d, pdt),
        gravity=jnp.asarray(ct.GRAVITY_W, pdt),
        preint_rot=pr_rot,
        preint_vel=pr_vel,
        preint_pos=pr_pos,
        cov_inv=cov_inv,
        preint_pos_full=pr_full,
        balancing_imu=jnp.asarray(0.001, pdt),
    )

    params = cp.params_from_chain(chain)
    chain2, gp2, q_dense, d_transl = ct.dense_pose_tables(params, data, shapes)

    # raw error components (mirror imu_residuals internals)
    pi = jnp.array(shapes.param_indices, dtype=jnp.int32)
    one_div = 1.0 / data.dt
    from dmsa_lidar_slam_tpu.core import rotations as rot

    R_start = rot.axang2rotm(gp2.orient[:-1])
    delta_t = data.ctrl_stamps[1:] - data.ctrl_stamps[:-1]
    v_start = one_div * (d_transl[pi[:-1] + 1] - d_transl[pi[:-1]])
    v_end = one_div * (d_transl[pi[1:]] - d_transl[pi[1:] - 1])
    dp_world = (gp2.transl[1:] - gp2.transl[:-1] - v_start * delta_t[:, None]
                - 0.5 * delta_t[:, None] ** 2 * data.gravity[None, :])
    delta_p_model = jnp.einsum("kji,kj->ki", R_start, dp_world)
    pos_error = delta_p_model - data.preint_pos
    R_rel = rot.axang2rotm(chain2.orient[1:])
    R_tmp = jnp.einsum("kji,kjl->kil", data.preint_rot, R_rel)
    rot_error = rot.rotm2axang(R_tmp)
    dv_world = v_end - v_start - data.gravity[None, :] * delta_t[:, None]
    delta_v_model = jnp.einsum("kji,kj->ki", R_start, dv_world)
    vel_error = delta_v_model - data.preint_vel

    np.set_printoptions(precision=6, suppress=True)
    print("true v_lin:", seq.v_lin, " v_start fd:", np.asarray(v_start))
    print("rot_error:\n", np.asarray(rot_error))
    print("vel_error:\n", np.asarray(vel_error))
    print("pos_error:\n", np.asarray(pos_error))
    res = ct.imu_residuals(chain2, gp2, d_transl, data, shapes)
    print("weighted residuals:", np.asarray(res))
    print("cov_inv diag magnitude:", np.asarray(jnp.diagonal(cov_inv, axis1=1, axis2=2)[0]))

    # compare: residuals at a slightly perturbed trajectory (what the
    # optimizer would trade against lidar terms)
    pert = params + 0.01 * np.random.default_rng(0).standard_normal(params.shape)
    ch_p, gp_p, _, dt_p = ct.dense_pose_tables(jnp.asarray(pert), data, shapes)
    res_p = ct.imu_residuals(ch_p, gp_p, dt_p, data, shapes)
    print("residuals @ perturbed (0.01):", np.asarray(res_p))


if __name__ == "__main__":
    main()
