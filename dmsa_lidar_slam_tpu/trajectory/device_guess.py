"""Fully-traced window initial guess (no host-side branch on last_known).

Device-resident variant of trajectory.continuous.initial_guess
(updateInitialGuess, ContinuousTrajectory.h:367-469) where `last_known` —
the index of the last control stamp still covered by the previous window —
is a traced integer, so the whole guess lives inside the fused per-scan
step with no host round trip.

Trick for the IMU dead-reckoning suffix: run the dead-reckon scan over ALL
control intervals, but overwrite the carry with the interpolated state
whenever the interval index is below last_known; from last_known onward the
carry integrates freely — exactly the reference's "interpolate prefix, then
integrate" without a data-dependent loop start.
"""

import jax
import jax.numpy as jnp

from dmsa_lidar_slam_tpu.core import interpolation as interp
from dmsa_lidar_slam_tpu.core import poses as cp
from dmsa_lidar_slam_tpu.core import rotations as rot


def traced_initial_guess(
    old_orient_w,  # [C, 3] previous window's global control orientations
    old_transl_w,  # [C, 3]
    old_stamps,  # [C] previous window's control stamps (rel to old t0)
    shift,  # [] new_t0 - old_t0
    old_horizon,  # []
    new_ctrl_stamps,  # [C]
    preint_rot,  # [C-1, 3, 3] new window preint factors
    preint_vel,  # [C-1, 3]
    preint_pos,  # [C-1, 3]
    delta_t_ctrl,  # [C-1]
    gravity,  # [3]
    use_imu,  # [] traced bool
):
    """Returns the full PoseChain (anchor row 0 + relatives) for the new
    window."""
    C = new_ctrl_stamps.shape[0]
    t_query = new_ctrl_stamps + shift

    # last_known: largest k with t_query[k] < old_horizon (>= 0)
    covered = t_query < old_horizon
    last_known = jnp.maximum(jnp.sum(covered.astype(jnp.int32)) - 1, 0)

    old_gp = cp.GlobalPoses(orient=old_orient_w, transl=old_transl_w)
    interp_orient = interp.interp_rotations(t_query, old_stamps, old_gp.orient)  # [C,3]
    interp_transl = interp.barycentric_interp(t_query, old_stamps, old_gp.transl, d=2)
    v_all = interp.barycentric_derivative(t_query, old_stamps, old_gp.transl, d=2)  # [C,3]

    v0 = v_all[last_known]

    # --- IMU branch: masked dead-reckon over all intervals -------------
    def dr_step(carry, inp):
        R, p, v = carry
        k, dR, dv, dp, dtk = inp
        # reset the carry to the interpolated state while k <= last_known
        R_i = rot.axang2rotm(interp_orient[k])
        reset = k <= last_known
        R = jnp.where(reset, R_i, R)
        p = jnp.where(reset, interp_transl[k], p)
        v = jnp.where(reset, v0, v)
        p_new = p + v * dtk + 0.5 * gravity * dtk**2 + R @ dp
        v_new = v + gravity * dtk + R @ dv
        R_new = R @ dR
        return (R_new, p_new, v_new), (rot.rotm2axang(R_new), p_new)

    ks = jnp.arange(C - 1)
    init = (jnp.eye(3, dtype=old_orient_w.dtype), jnp.zeros(3, old_orient_w.dtype), v0)
    (_, _, _), (dr_orient, dr_transl) = jax.lax.scan(
        dr_step, init, (ks, preint_rot, preint_vel, preint_pos, delta_t_ctrl)
    )
    # pose k (k >= 1) from dead reckoning of interval k-1 when beyond the
    # covered prefix; else the interpolated pose
    k_idx = jnp.arange(C)
    use_interp = (k_idx <= last_known)[:, None]
    imu_orient = jnp.where(
        use_interp, interp_orient, jnp.concatenate([interp_orient[:1], dr_orient], axis=0)
    )
    imu_transl = jnp.where(
        use_interp, interp_transl, jnp.concatenate([interp_transl[:1], dr_transl], axis=0)
    )

    chain_imu = cp.global2relative(cp.GlobalPoses(imu_orient, imu_transl))

    # --- no-IMU branch: constant velocity (repeat relative of last_known)
    chain_ni = cp.global2relative(cp.GlobalPoses(interp_orient, interp_transl))
    rep_o = chain_ni.orient[last_known]
    rep_t = chain_ni.transl[last_known]
    tail = (k_idx > last_known)[:, None]
    chain_cv = cp.PoseChain(
        orient=jnp.where(tail, rep_o[None, :], chain_ni.orient),
        transl=jnp.where(tail, rep_t[None, :], chain_ni.transl),
    )

    orient = jnp.where(use_imu, chain_imu.orient, chain_cv.orient)
    transl = jnp.where(use_imu, chain_imu.transl, chain_cv.transl)
    return cp.PoseChain(orient=orient, transl=transl)
