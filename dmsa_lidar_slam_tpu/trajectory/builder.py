"""Host-side assembly of WindowData from scan/IMU buffers.

Mirrors prepareTrajectoryForOptimization (reference: DmsaSlam.h:416-467):
window timing from the scan buffer's min/max point stamps, dense-grid IMU
resampling, preintegration factors, per-point transform indices, and the
static-point slots (filled later by the pipeline's static-point selection).
"""

from typing import List, NamedTuple, Optional

import numpy as np
import jax.numpy as jnp

from dmsa_lidar_slam_tpu.imu.buffer import ImuBuffer
from dmsa_lidar_slam_tpu.trajectory import continuous as ct
from dmsa_lidar_slam_tpu.utils.dtypes import pose_dtype


class HostScan(NamedTuple):
    """One preprocessed scan on host (already in the IMU frame)."""

    points: np.ndarray  # [n, 3] f32
    stamps: np.ndarray  # [n] f64 absolute
    rings: np.ndarray  # [n] i32
    grid_size: float


def build_window(
    scans: List[HostScan],
    shapes: ct.WindowShapes,
    imu_buffer: Optional[ImuBuffer],
    cov_gyr: np.ndarray,
    cov_acc: np.ndarray,
    balancing_imu: float,
    use_imu: bool,
    anchor_orient=None,
    anchor_transl=None,
):
    """Returns (WindowData, t0, min_grid_size, imu_timediff)."""
    pdt = pose_dtype()
    all_stamps = np.concatenate([s.stamps for s in scans])
    t0 = float(all_stamps.min())
    t_max = float(all_stamps.max())
    # horizon includes one extra dt_res-like step (ContinuousTrajectory.h:309)
    dt_ref = 0.001
    horizon = t_max - t0 + dt_ref
    dt = horizon / (shapes.n_dense - 1)

    # pad window points
    nw = shapes.n_window_pts
    pts = np.zeros((nw, 3), dtype=np.float32)
    rel_stamps = np.zeros(nw, dtype=np.float64)
    rings = np.zeros(nw, dtype=np.int32)
    mask = np.zeros(nw, dtype=bool)
    off = 0
    total = sum(len(s.points) for s in scans)
    if total > nw:
        raise ValueError(f"window overflow: {total} points > capacity {nw}")
    for s in scans:
        n = len(s.points)
        pts[off : off + n] = s.points
        rel_stamps[off : off + n] = s.stamps - t0
        rings[off : off + n] = s.rings
        mask[off : off + n] = True
        off += n

    tform_idx = np.minimum(
        np.ceil(rel_stamps / dt - 1e-9).astype(np.int32), shapes.n_dense - 1
    )
    tform_idx = np.maximum(tform_idx, 0)
    tform_idx[~mask] = 0

    ctrl_stamps = np.asarray(shapes.param_indices, dtype=np.float64) * dt

    # IMU resampling onto the dense grid (transferImuMeasurements)
    imu_timediff = 0.0
    if use_imu and imu_buffer is not None and imu_buffer.num_updates > 0:
        dense_t = t0 + np.arange(shapes.n_dense) * dt
        acc_dense, gyr_dense, imu_timediff = imu_buffer.resample_nearest(dense_t)
    else:
        use_imu = False
        acc_dense = np.zeros((shapes.n_dense, 3))
        gyr_dense = np.zeros((shapes.n_dense, 3))

    gravity = np.asarray(ct.GRAVITY_W)

    if use_imu:
        pr_rot, pr_vel, pr_pos, cov_inv, pr_full = ct.compute_preint_factors_jit(
            jnp.asarray(gyr_dense, dtype=pdt),
            jnp.asarray(acc_dense, dtype=pdt),
            jnp.asarray(dt, dtype=pdt),
            jnp.asarray(cov_gyr, dtype=pdt),
            jnp.asarray(cov_acc, dtype=pdt),
            shapes,
        )
    else:
        K = shapes.n_ctrl - 1
        pr_rot = jnp.tile(jnp.eye(3, dtype=pdt), (K, 1, 1))
        pr_vel = jnp.zeros((K, 3), dtype=pdt)
        pr_pos = jnp.zeros((K, 3), dtype=pdt)
        cov_inv = jnp.tile(jnp.eye(9, dtype=pdt), (K, 1, 1))
        pr_full = jnp.zeros(3, dtype=pdt)

    if anchor_orient is None:
        anchor_orient = np.zeros(3)
    if anchor_transl is None:
        anchor_transl = np.zeros(3)

    ns = shapes.n_static
    data = ct.WindowData(
        local_pts=jnp.asarray(pts),
        pt_mask=jnp.asarray(mask),
        pt_ring=jnp.asarray(rings),
        pt_tform_idx=jnp.asarray(tform_idx),
        static_pts=jnp.zeros((ns, 3), dtype=jnp.float32),
        static_mask=jnp.zeros(ns, dtype=bool),
        static_ring=jnp.zeros(ns, dtype=jnp.int32),
        anchor_orient=jnp.asarray(anchor_orient, dtype=pdt),
        anchor_transl=jnp.asarray(anchor_transl, dtype=pdt),
        ctrl_stamps=jnp.asarray(ctrl_stamps, dtype=pdt),
        dt=jnp.asarray(dt, dtype=pdt),
        horizon=jnp.asarray(horizon, dtype=pdt),
        acc_dense=jnp.asarray(acc_dense, dtype=pdt),
        gyr_dense=jnp.asarray(gyr_dense, dtype=pdt),
        gravity=jnp.asarray(gravity, dtype=pdt),
        preint_rot=pr_rot,
        preint_vel=pr_vel,
        preint_pos=pr_pos,
        cov_inv=cov_inv,
        preint_pos_full=pr_full,
        balancing_imu=jnp.asarray(balancing_imu, dtype=pdt),
    )
    min_grid = min(s.grid_size for s in scans)
    return data, t0, min_grid, imu_timediff
