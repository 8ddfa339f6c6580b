"""Fused device-resident SLAM pipeline: one jit step per scan, zero
steady-state downloads.

Remote TPU attachment makes host<->device round trips the dominant cost
(hundreds of ms each through the tunnel), so unlike the host-orchestrated
pipeline (pipeline.slam, which mirrors the reference's control flow 1:1),
this pipeline keeps ALL estimator state on device:

  - the preprocessed scan ring buffer,
  - the keyframe map (map.device_map),
  - the previous window's control poses,
  - a per-scan event ledger ring (keyframe / non-keyframe / retirement
    records), downloaded in one batched transfer every `flush_every` scans.

Per scan the host does exactly: (1) pack the raw scan + resampled IMU +
scalars into ONE f32 upload, (2) dispatch the fused step.  All control flow
(buffer-full gate, map init, keyframe decision, submap optimization) runs
under lax.cond inside the step.

Capability parity with pipeline.slam / the reference's processPointCloud
(DmsaSlam.h:116-204) — divergences:
  - the window time span comes from raw-scan stamp extremes (host-known)
    instead of post-preprocessing extremes (a few ms of horizon slack).

Keyframe stamps are carried ON DEVICE (DeviceMapState.stamps, f64, relative
to the run's stamp base), uploaded per scan as a hi/lo f32 pair and returned
through the event ledger on retirement — so a crash between dispatch and
flush can never desynchronize stamps from poses (it can only lose unflushed
output events, which the checkpoint flushes first).
"""

import dataclasses
import logging
from functools import partial
from typing import List, NamedTuple, Optional

import numpy as np

import jax
import jax.numpy as jnp

from dmsa_lidar_slam_tpu.config import Config
from dmsa_lidar_slam_tpu.core import poses as cp
from dmsa_lidar_slam_tpu.core import rotations as rot
from dmsa_lidar_slam_tpu.dmsa import optimizer as opt
from dmsa_lidar_slam_tpu.imu.buffer import ImuBuffer
from dmsa_lidar_slam_tpu.map import device_map as dmap
from dmsa_lidar_slam_tpu.map import keyframes as kfm
from dmsa_lidar_slam_tpu.map import normals as nrm
from dmsa_lidar_slam_tpu.map import static_points as sp
from dmsa_lidar_slam_tpu.ops import voxel
from dmsa_lidar_slam_tpu.pipeline import preprocess as pp
from dmsa_lidar_slam_tpu.pipeline.metrics import Metrics
from dmsa_lidar_slam_tpu.pipeline.output import OutputManager
from dmsa_lidar_slam_tpu.trajectory import continuous as ct
from dmsa_lidar_slam_tpu.trajectory.device_guess import traced_initial_guess
from dmsa_lidar_slam_tpu.utils.dtypes import pose_dtype

log = logging.getLogger("dmsa_fused")

# event record layout (f32): [type, pose(6), related_kf, retired_flag,
# retired_pose(6), overlap, stop_reason, num_gauss, n_kept, grid,
# retired_stamp_hi, grav_ok, retired_stamp_lo, shuffle_overflow] -> width 25
# (retired stamp = hi + lo reconstructs the device f64 stamp exactly;
# shuffle_overflow = points dropped by the spatial backend's all_to_all
# bucket caps this submap optimization — ADVICE r4: counted, never silent)
EV_WIDTH = 25
EV_NONE, EV_INIT_KF, EV_KEYFRAME, EV_NONKEYFRAME = 0.0, 1.0, 2.0, 3.0

# raw-point wire quantization (host -> device): 5 mm resolution, +-163.8 m
# range — beyond any supported sensor, and the added uniform noise
# (std ~1.4 mm) sits far below the 10 mm measurement noise the estimator
# already absorbs.  Shrinks the per-scan upload 2.4x at OS-128 scale.
PT_SCALE = 0.005
PT_INV_SCALE = 200.0


class FusedState(NamedTuple):
    # scan ring buffer (slot 0 = oldest of the window)
    scan_pts: jnp.ndarray  # [S, cap, 3] f32 IMU frame
    scan_mask: jnp.ndarray  # [S, cap]
    scan_rings: jnp.ndarray  # [S, cap] i32
    scan_rel_stamps: jnp.ndarray  # [S, cap] f32, rel to own scan t0
    scan_grid: jnp.ndarray  # [S] f32
    num_scans: jnp.ndarray  # [] i32
    # keyframe map
    kf: dmap.DeviceMapState
    # previous window
    ow_orient: jnp.ndarray  # [C, 3]
    ow_transl: jnp.ndarray  # [C, 3]
    ow_stamps: jnp.ndarray  # [C]
    ow_horizon: jnp.ndarray  # []
    submap_initialized: jnp.ndarray  # [] bool
    # event ledger (1 row per processed scan, ring over flush window)
    events: jnp.ndarray  # [EV_CAP, EV_WIDTH] f32
    ev_index: jnp.ndarray  # [] i32 (monotonic scan counter)


@dataclasses.dataclass(frozen=True)
class FusedShapes:
    n_clouds: int
    scan_cap: int
    raw_cap: int
    n_static: int
    n_ctrl: int
    n_dense: int
    kf_cap: int
    kf_pts_cap: int
    n_candidates: int
    ev_cap: int

    def __post_init__(self):
        assert self.n_clouds <= 6, "pack layout carries scan_t0_rel in one row"

    @property
    def aux_rows(self) -> int:
        return self.n_dense + 4

    @property
    def window(self) -> ct.WindowShapes:
        return ct.WindowShapes(
            n_window_pts=self.n_clouds * self.scan_cap,
            n_static=self.n_static,
            n_ctrl=self.n_ctrl,
            n_dense=self.n_dense,
        )

    @property
    def map(self) -> kfm.MapShapes:
        return kfm.MapShapes(n_keyframes=self.kf_cap, n_pts_per_kf=self.kf_pts_cap)


def empty_state(shapes: FusedShapes) -> FusedState:
    pdt = pose_dtype()
    S, cap, C = shapes.n_clouds, shapes.scan_cap, shapes.n_ctrl
    return FusedState(
        scan_pts=jnp.zeros((S, cap, 3), jnp.float32),
        scan_mask=jnp.zeros((S, cap), bool),
        scan_rings=jnp.zeros((S, cap), jnp.int32),
        scan_rel_stamps=jnp.zeros((S, cap), jnp.float32),
        scan_grid=jnp.full((S,), 0.4, jnp.float32),
        num_scans=jnp.asarray(0, jnp.int32),
        kf=dmap.empty_state(shapes.map, pdt),
        ow_orient=jnp.zeros((C, 3), pdt),
        ow_transl=jnp.zeros((C, 3), pdt),
        ow_stamps=jnp.zeros((C,), pdt),
        ow_horizon=jnp.asarray(0.0, pdt),
        submap_initialized=jnp.asarray(False),
        events=jnp.zeros((shapes.ev_cap, EV_WIDTH), jnp.float32),
        ev_index=jnp.asarray(0, jnp.int32),
    )


class StepScalars(NamedTuple):
    """Per-scan traced scalars (small pytree upload)."""

    dt: jnp.ndarray  # [] window dense grid step
    horizon: jnp.ndarray  # []
    scan_t0_rel: jnp.ndarray  # [S] scan t0 offsets relative to window t0
    use_imu: jnp.ndarray  # [] bool
    step_length: jnp.ndarray  # [] window optimizer gain (imu/no-imu)
    max_step: jnp.ndarray  # []
    balancing_imu: jnp.ndarray  # []
    key: jnp.ndarray  # PRNG key
    win_t0: jnp.ndarray  # [] f64 window t0 relative to the run's stamp base
    acc_init: jnp.ndarray  # [3] static-start mean acc (gravity init)
    acc_init_valid: jnp.ndarray  # [] bool


def make_step(config: Config, shapes: FusedShapes, mesh=None):
    """Build the fused per-scan step function (jit, donated state).

    When `mesh` (jax.sharding.Mesh, >1 device) is given, the submap
    keyframe optimization runs SHARDED over it — the keyframe clouds of
    the capped submap view are partitioned across devices, cell statistics
    and normal equations reduce over psum, and the small chain solve is
    replicated (parallel.keyframe_dist), all inside the same single
    per-scan jit dispatch (shard_map composes under the outer jit).
    Reference path being distributed: keyframeOptimization
    (DmsaSlam.h:212-238)."""
    c = config
    pdt = pose_dtype()
    wshapes = shapes.window
    mshapes = shapes.map
    C = shapes.n_ctrl

    fwd_imu = ct.make_forward(wshapes, use_imu=True)
    structured_window = ct.make_structured(wshapes, use_imu=True)
    # fused Pallas residual kernels (ops.fused_residuals) carry the GN loop
    # on TPU; elsewhere the structured-Jacobian XLA path remains (the
    # kernels' XLA reference fallback is slower than the structured path on
    # CPU).  DMSA_FUSED_TABULAR=1 forces the tabular path for e2e testing.
    import os as _os

    from dmsa_lidar_slam_tpu.ops import fused_residuals as _fr

    use_tabular = _fr._use_pallas() or _os.environ.get("DMSA_FUSED_TABULAR", "0") == "1"
    tabular_window = ct.make_tabular(wshapes, use_imu=True) if use_tabular else None
    T = c.lidar_to_imu_tform
    R_l2i = jnp.asarray(T[:3, :3], jnp.float32)
    t_l2i = jnp.asarray(T[:3, 3], jnp.float32)
    gravity = jnp.asarray(ct.GRAVITY_W, pdt)
    cov_gyr = jnp.asarray(c.cov_gyr, pdt)
    cov_acc = jnp.asarray(c.cov_acc, pdt)
    cov_grav_inv = jnp.asarray(np.linalg.inv(kfm.STD_DEV_ACC**2 * np.eye(3)), pdt)
    odom_cov_inv = jnp.asarray(np.linalg.inv(kfm.ODOM_STD**2 * np.eye(3)), pdt)

    settings_window = opt.OptimSettings(
        num_iter=c.num_iter_sliding_window_optim,
        min_num_points_per_set=c.min_num_points_gauss,
        step_length_optim=c.alpha_sliding_window_no_imu,
        max_step=c.max_step_sliding_window_no_imu,
    )
    settings_map = opt.OptimSettings(
        num_iter=c.num_iter_keyframe_optim,
        min_num_points_per_set=c.min_num_points_gauss_key,
        step_length_optim=c.alpha_keyframe_optim,
        max_step=0.01,
        epsilon=c.epsilon_keyframe_opt,
        use_centralization=False,
    )
    use_grav_terms = c.use_gravity_term_in_keyframe_opt and c.use_imu
    # the submap problem is materialized at a compact fixed shape
    # [S_sub, P] so its cost is bounded by the submap span, not the map
    # capacity (the reference's getSubmap is variable-size for the same
    # reason, MapManagement.h:254-276).  Default (no explicit cap) = the
    # full suffix, matching the reference's [minRelatedKeyId .. end]
    cap = c.submap_max_keyframes or shapes.kf_cap
    if cap < shapes.kf_cap:
        log.info(
            "submap span capped at %d of %d keyframes (reference semantics "
            "is the uncapped suffix; set submap_max_keyframes=None for that)",
            cap,
            shapes.kf_cap,
        )
    S_sub = max(2, min(cap, shapes.kf_cap))
    sub_mshapes = kfm.MapShapes(
        n_keyframes=S_sub, n_pts_per_kf=shapes.kf_pts_cap
    )
    kf_fwd = kfm.make_forward(
        sub_mshapes, use_grav_terms, c.use_odometry_term_in_keyframe_opt, True
    )
    kf_structured = kfm.make_structured(
        sub_mshapes, use_grav_terms, c.use_odometry_term_in_keyframe_opt, True
    )
    kf_tabular = (
        kfm.make_tabular(sub_mshapes, use_grav_terms, c.use_odometry_term_in_keyframe_opt)
        if use_tabular
        else None
    )
    dist_submap_opt = None
    dist_is_spatial = c.dist_backend == "spatial"
    if mesh is not None and mesh.devices.size > 1:
        common = dict(
            num_iter=c.num_iter_keyframe_optim,
            min_points=c.min_num_points_gauss_key,
            step_length=c.alpha_keyframe_optim,
            max_step=0.01,
            epsilon=c.epsilon_keyframe_opt,
            use_gravity=use_grav_terms,
            use_odometry=c.use_odometry_term_in_keyframe_opt,
            jit=False,  # composes inside the fused step's jit
        )
        if dist_is_spatial:
            from dmsa_lidar_slam_tpu.parallel import spatial

            dist_submap_opt = spatial.make_spatial_dist_optimize(
                mesh, sub_mshapes, use_split=True, **common
            )
        else:
            from dmsa_lidar_slam_tpu.parallel import keyframe_dist

            log.warning(
                "dist_backend='hash' optimizes a coarser submap model than "
                "single-chip/'spatial': no normal-split cell channel "
                "(Gaussians.h:27-85 analogue) and owner-election cell drops"
            )
            dist_submap_opt = keyframe_dist.make_keyframe_dist_optimize(
                mesh, sub_mshapes, table_size=c.dist_table_size, **common
            )

    def preint_all(gyr_dense, acc_dense, dt, use_imu):
        pr_rot, pr_vel, pr_pos, cov_inv, pr_full = ct.compute_preint_factors(
            gyr_dense, acc_dense, dt, cov_gyr, cov_acc, wshapes
        )
        eye9 = jnp.broadcast_to(jnp.eye(9, dtype=pdt), cov_inv.shape)
        cov_inv = jnp.where(use_imu, cov_inv, eye9)
        return pr_rot, pr_vel, pr_pos, cov_inv, pr_full

    def assemble_window(state: FusedState, sc: StepScalars, acc_dense, gyr_dense):
        """Scan buffer -> WindowData (static slots empty)."""
        rel = state.scan_rel_stamps + sc.scan_t0_rel[:, None]  # [S,cap]
        pts = state.scan_pts.reshape(-1, 3)
        mask = state.scan_mask.reshape(-1)
        rings = state.scan_rings.reshape(-1)
        rel_f = rel.reshape(-1)
        tform_idx = jnp.clip(
            jnp.ceil(rel_f / sc.dt.astype(jnp.float32) - 1e-6).astype(jnp.int32),
            0,
            shapes.n_dense - 1,
        )
        ctrl_stamps = ct.ctrl_stamps_from_dt(sc.dt, wshapes)
        pr_rot, pr_vel, pr_pos, cov_inv, pr_full = preint_all(
            gyr_dense, acc_dense, sc.dt, sc.use_imu
        )
        ns = shapes.n_static
        return ct.WindowData(
            local_pts=pts,
            pt_mask=mask,
            pt_ring=rings,
            pt_tform_idx=tform_idx,
            static_pts=jnp.zeros((ns, 3), jnp.float32),
            static_mask=jnp.zeros(ns, bool),
            static_ring=jnp.zeros(ns, jnp.int32),
            anchor_orient=jnp.zeros(3, pdt),
            anchor_transl=jnp.zeros(3, pdt),
            ctrl_stamps=ctrl_stamps,
            dt=sc.dt,
            horizon=sc.horizon,
            acc_dense=acc_dense,
            gyr_dense=gyr_dense,
            gravity=gravity,
            preint_rot=pr_rot,
            preint_vel=pr_vel,
            preint_pos=pr_pos,
            cov_inv=cov_inv,
            preint_pos_full=pr_full,
            balancing_imu=sc.balancing_imu,
        )

    def gravity_estimate(params, data, use_imu):
        _, gp, _, d_t = ct.dense_poses(params, data, wshapes)
        grav = ct.submap_gravity_estimate(gp, d_t, data, wshapes)
        plaus = (
            jnp.abs(jnp.linalg.norm(grav) - jnp.linalg.norm(gravity))
            < c.gravity_outlier_thresh
        ) & use_imu
        return jnp.where(use_imu, grav, jnp.zeros_like(grav)), plaus

    def make_keyframe_cloud(points_w, mask, rings, anchor_o, anchor_t, min_grid, key):
        """Downsample window cloud, transform to keyframe-local, normals
        (addNewKeyframeToMap, DmsaSlam.h:500-532)."""
        keep = voxel.random_downsample_mask(points_w, mask, min_grid, key)
        idx, out_mask = voxel.compact(keep, mshapes.n_pts_per_kf)
        pts_w_c = points_w[idx]
        rings_out = jnp.where(out_mask, rings[idx], 0)
        R_inv = rot.axang2rotm(anchor_o).T.astype(jnp.float32)
        pts_local = (pts_w_c - anchor_t.astype(jnp.float32)[None, :]) @ R_inv.T
        pts_local = jnp.where(out_mask[:, None], pts_local, 0.0)
        normals = nrm.estimate_normals(pts_local, out_mask, min_grid)
        return pts_local, normals, rings_out, out_mask, jnp.sum(keep)

    def window_step(state: FusedState, sc: StepScalars, acc_dense, gyr_dense, scan_t0_abs_rel):
        """The full per-window pipeline (buffer is full)."""
        data = assemble_window(state, sc, acc_dense, gyr_dense)
        min_grid = jnp.min(state.scan_grid)
        k1, k2, k3 = jax.random.split(sc.key, 3)

        # ---- initial guess ------------------------------------------------
        def first_window(_):
            # gravity init from the static-start mean acc when available
            # (single-sample fallback = reference behavior,
            # ContinuousTrajectory.h:263-299)
            acc_for_init = jnp.where(sc.acc_init_valid, sc.acc_init, data.acc_dense[0])
            anchor_o = jnp.where(
                sc.use_imu,
                ct.init_gravity_anchor_orientation(acc_for_init, gravity),
                jnp.zeros(3, pdt),
            )
            chain = cp.PoseChain(
                orient=jnp.concatenate([anchor_o[None], jnp.zeros((C - 1, 3), pdt)]),
                transl=jnp.zeros((C, 3), pdt),
            )
            return chain

        def subsequent(_):
            return traced_initial_guess(
                state.ow_orient,
                state.ow_transl,
                state.ow_stamps,
                scan_t0_abs_rel,  # new window t0 - old window t0
                state.ow_horizon,
                data.ctrl_stamps,
                data.preint_rot,
                data.preint_vel,
                data.preint_pos,
                data.ctrl_stamps[1:] - data.ctrl_stamps[:-1],
                gravity,
                sc.use_imu,
            )

        chain0 = jax.lax.cond(state.submap_initialized, subsequent, first_window, None)
        data = data._replace(anchor_orient=chain0.orient[0], anchor_transl=chain0.transl[0])
        params0 = cp.params_from_chain(chain0)

        # ---- map init (first full window) --------------------------------
        def fit_rows(arr, target):
            """Pad-or-truncate leading axis to `target` rows."""
            n = arr.shape[0]
            if n == target:
                return arr
            if n > target:
                return arr[:target]
            pad = [(0, target - n)] + [(0, 0)] * (arr.ndim - 1)
            return jnp.pad(arr, pad)

        def init_map(args):
            state, data, params0 = args
            P = mshapes.n_pts_per_kf
            pts0 = fit_rows(state.scan_pts[0], P)
            mask0 = fit_rows(state.scan_mask[0], P)
            rings0 = fit_rows(state.scan_rings[0], P)
            normals0 = nrm.estimate_normals(pts0, mask0, state.scan_grid[0])
            grav, plaus = gravity_estimate(params0, data, sc.use_imu)
            kf_new, *_ = dmap.add_keyframe(
                state.kf,
                data.anchor_transl,
                data.anchor_orient,
                sc.win_t0,
                pts0,
                normals0,
                rings0,
                mask0,
                state.scan_grid[0],
                grav,
                plaus,
            )
            ev = jnp.zeros(EV_WIDTH, jnp.float32)
            ev = ev.at[0].set(EV_INIT_KF)
            ev = ev.at[1:4].set(data.anchor_orient.astype(jnp.float32))
            ev = ev.at[4:7].set(data.anchor_transl.astype(jnp.float32))
            ev = ev.at[19].set(jnp.sum(mask0).astype(jnp.float32))
            ev = ev.at[20].set(state.scan_grid[0])
            state = state._replace(kf=kf_new)
            state = store_old_window(state, params0, data)
            return state._replace(submap_initialized=jnp.asarray(True)), ev

        # ---- main branch ---------------------------------------------------
        def main_window(args):
            state, data, params0 = args
            curr_pos = data.anchor_transl

            # static points (addStaticPoints, DmsaSlam.h:264-358)
            cand_ids, cand_valid = dmap.closest_candidates(
                state.kf,
                curr_pos,
                shapes.n_candidates,
                c.dist_static_points_keyframe,
            )
            kf_pts, kf_nrm, kf_rings, kf_mask = dmap.candidate_clouds(
                state.kf, cand_ids, cand_valid
            )
            out0 = fwd_imu(params0, data)
            nw = wshapes.n_window_pts
            sel = sp.select_static_points(
                out0.points[:nw],
                out0.mask[:nw],
                kf_pts,
                kf_nrm,
                kf_rings,
                kf_mask,
                curr_pos.astype(jnp.float32),
                min_grid,
                k1,
                shapes.n_static,
            )
            data = data._replace(
                static_pts=sel.static_pts,
                static_mask=sel.static_mask,
                static_ring=sel.static_ring,
            )
            max_overlap_slot = jnp.argmax(sel.overlap_counts)
            max_overlap_kf = cand_ids[max_overlap_slot]
            has_sel = sel.overlap_counts > 0
            min_related = jnp.min(jnp.where(has_sel, cand_ids, jnp.iinfo(jnp.int32).max))
            min_related = jnp.where(jnp.any(has_sel), min_related, -1)

            # sliding-window optimization (centralized)
            cdata, origin = ct.centralize(data)
            result = opt.optimize(
                fwd_imu,
                params0,
                cdata,
                settings_window,
                min_grid,
                step_length=sc.step_length,
                max_step=sc.max_step,
                structured_fn=structured_window,
                tabular_fn=tabular_window,
            )
            data = ct.decentralize(cdata, origin)
            params_opt = result.params
            data_nostat = data._replace(static_mask=jnp.zeros_like(data.static_mask))

            # keyframe decision (DmsaSlam.h:170-201)
            last_kf_pos = state.kf.transl_w[jnp.maximum(state.kf.count - 1, 0)]
            dist = jnp.linalg.norm(curr_pos - last_kf_pos)
            new_kf = (sel.overlap_fraction < c.min_overlap_new_keyframe) | (
                dist > c.dist_new_keyframe
            )
            min_related_adj = jnp.where(
                state.kf.count >= shapes.kf_cap, min_related - 1, min_related
            )

            def keyframe_branch(args):
                state, data, params_opt = args
                out = fwd_imu(params_opt, data)
                pts_local, normals, rings_out, out_mask, n_kept = make_keyframe_cloud(
                    out.points[:nw],
                    out.mask[:nw],
                    out.ring_ids[:nw],
                    data.anchor_orient,
                    data.anchor_transl,
                    min_grid,
                    k2,
                )
                grav, plaus = gravity_estimate(params_opt, data, sc.use_imu)
                kf_new, ret_o, ret_t, ret_stamp, retired = dmap.add_keyframe(
                    state.kf,
                    data.anchor_transl,
                    data.anchor_orient,
                    sc.win_t0,
                    pts_local,
                    normals,
                    rings_out,
                    out_mask,
                    min_grid,
                    grav,
                    plaus,
                )
                state = state._replace(kf=kf_new)

                # submap keyframe optimization (keyframeOptimization,
                # DmsaSlam.h:212-238)
                def do_submap(state):
                    overflow = jnp.asarray(0, jnp.int32)
                    from_id = jnp.maximum(min_related_adj, 0)
                    # bound the submap span to S_sub keyframes (keep the
                    # most recent ones, which the new keyframe constrains)
                    from_id = jnp.maximum(from_id, state.kf.count - S_sub)
                    sdata, sparams = dmap.submap_view_capped(
                        state.kf,
                        from_id,
                        S_sub,
                        jnp.asarray(c.balancing_factor_gravity, pdt),
                        jnp.asarray(c.balancing_factor_odometry, pdt),
                        cov_grav_inv,
                        odom_cov_inv,
                        odom_cov_inv,
                        gravity,
                    )
                    smin_grid = dmap.min_grid_from(state.kf, from_id)
                    if dist_submap_opt is None:
                        sres = opt.optimize(
                            kf_fwd,
                            sparams,
                            sdata,
                            settings_map,
                            smin_grid,
                            structured_fn=kf_structured,
                            tabular_fn=kf_tabular,
                        )
                        params_new = sres.params
                    else:
                        from dmsa_lidar_slam_tpu.parallel import keyframe_dist

                        fp, fm, fr, aux = keyframe_dist.flatten_problem(sdata)
                        grids = jnp.stack(
                            [
                                settings_map.grid_size_1_factor * smin_grid,
                                settings_map.grid_size_2_factor * smin_grid,
                            ]
                        )
                        if dist_is_spatial:
                            fn3 = sdata.local_normals.reshape(-1, 3)
                            params_new, _, _, ov = dist_submap_opt(
                                sparams, fp, fm, fr, aux, grids, flat_normals=fn3
                            )
                            overflow = ov.astype(jnp.int32)
                        else:
                            # hash backend: slot 3 is the valid-cell count,
                            # not an overflow
                            params_new, _, _, _ = dist_submap_opt(
                                sparams, fp, fm, fr, aux, grids
                            )
                    kf2 = dmap.write_back_capped(state.kf, from_id, params_new)
                    return state._replace(kf=kf2), overflow

                run_submap = (
                    jnp.asarray(c.optimize_sliding_window_keyframes)
                    & (min_related_adj >= 0)
                    & (state.kf.count >= 3)
                )
                # submap span actually optimized (same from_id computation
                # as do_submap), for the event ledger / bench evidence that
                # deep suffix spans occur (DmsaSlam.h:212-238)
                span_from = jnp.maximum(jnp.maximum(min_related_adj, 0), state.kf.count - S_sub)
                submap_span = jnp.where(run_submap, state.kf.count - span_from, 0)
                state, shuffle_ov = jax.lax.cond(
                    run_submap,
                    do_submap,
                    lambda s: (s, jnp.asarray(0, jnp.int32)),
                    state,
                )

                # re-anchor the current trajectory at the (possibly
                # submap-corrected) last keyframe pose (DmsaSlam.h:233-237)
                last = jnp.maximum(state.kf.count - 1, 0)
                data = data._replace(
                    anchor_orient=state.kf.orient_w[last],
                    anchor_transl=state.kf.transl_w[last],
                )

                ev = jnp.zeros(EV_WIDTH, jnp.float32)
                ev = ev.at[0].set(EV_KEYFRAME)
                ev = ev.at[1:4].set(data.anchor_orient.astype(jnp.float32))
                ev = ev.at[4:7].set(data.anchor_transl.astype(jnp.float32))
                ev = ev.at[7].set(submap_span.astype(jnp.float32))
                ev = ev.at[8].set(retired.astype(jnp.float32))
                ev = ev.at[9:12].set(ret_o.astype(jnp.float32))
                ev = ev.at[12:15].set(ret_t.astype(jnp.float32))
                ev = ev.at[19].set(n_kept.astype(jnp.float32))
                ev = ev.at[22].set(plaus.astype(jnp.float32))
                # retired keyframe stamp, exact f64 as hi/lo f32 pair
                rs_hi = ret_stamp.astype(jnp.float32)
                rs_lo = (ret_stamp - rs_hi.astype(jnp.float64)).astype(jnp.float32)
                ev = ev.at[21].set(rs_hi)
                ev = ev.at[23].set(rs_lo)
                ev = ev.at[24].set(shuffle_ov.astype(jnp.float32))
                return state, data, params_opt, ev

            def nonkeyframe_branch(args):
                state, data, params_opt = args
                kf_o = state.kf.orient_w[max_overlap_kf]
                kf_t = state.kf.transl_w[max_overlap_kf]
                R_kf = rot.axang2rotm(kf_o)
                rel_t = R_kf.T @ (curr_pos - kf_t)
                rel_R = R_kf.T @ rot.axang2rotm(data.anchor_orient)
                rel_o = rot.rotm2axang(rel_R)
                ev = jnp.zeros(EV_WIDTH, jnp.float32)
                ev = ev.at[0].set(EV_NONKEYFRAME)
                ev = ev.at[1:4].set(rel_o.astype(jnp.float32))
                ev = ev.at[4:7].set(rel_t.astype(jnp.float32))
                ev = ev.at[7].set(max_overlap_kf.astype(jnp.float32))
                return state, data, params_opt, ev

            state, data_o, params_o, ev = jax.lax.cond(
                new_kf, keyframe_branch, nonkeyframe_branch, (state, data_nostat, params_opt)
            )

            state = store_old_window(state, params_o, data_o)
            ev = ev.at[15].set(sel.overlap_fraction.astype(jnp.float32))
            ev = ev.at[16].set(result.stop_reason.astype(jnp.float32))
            ev = ev.at[17].set(result.num_gaussians.astype(jnp.float32))
            ev = ev.at[18].set(sel.num_active.astype(jnp.float32))
            ev = ev.at[20].set(min_grid)
            return state, ev

        return jax.lax.cond(
            state.kf.count > 0, main_window, init_map, (state, data, params0)
        )

    def store_old_window(state: FusedState, params, data):
        _, gp, _, _ = ct.dense_poses(params, data, wshapes)
        return state._replace(
            ow_orient=gp.orient,
            ow_transl=gp.transl,
            ow_stamps=data.ctrl_stamps,
            ow_horizon=data.horizon,
        )

    def step(state: FusedState, pack, aux):
        """TWO async uploads per scan: the QUANTIZED raw scan + a small
        f32 aux block — 10 B/point instead of 24 (the 3.2 MB/scan f32
        pack was the dominant tunnel payload at OS-128 scale, and tunnel
        H2D throughput is the least stable resource in this environment).

        pack int16 [raw_cap, 5]:
          cols 0-2: points quantized at PT_SCALE (5 mm; clipped +-163 m;
                    host maps NaN/Inf to 0 -> range 0 -> min_dist filter)
          col  3:   rel stamp quantized at aux qscale (u16 stored as i16)
          col  4:   ring id
        aux f32 [n_dense + 4, 6]:
          rows [0, D):  acc(3), gyr(3) on the dense grid
          row  D:       dt, horizon, use_imu, step_length, max_step,
                        balancing_imu
          row  D+1:     scan_t0_rel[:n_clouds] (pad 0)
          row  D+2:     shift_t0, prng_seed, win_t0_hi, win_t0_lo
          row  D+3:     acc_init(3), acc_init_valid, n_valid_raw_rows,
                        stamp_qscale

        Raw-row validity is computed HERE (row count), not on the host —
        rows >= n of the reused pack buffers hold stale data.
        """
        rc, D, S = shapes.raw_cap, shapes.n_dense, shapes.n_clouds
        imu_rows = aux[:D]
        srow = aux[D]
        trow = aux[D + 1]
        xrow = aux[D + 2]
        grow = aux[D + 3]

        acc_dense = imu_rows[:, :3].astype(pdt)
        gyr_dense = imu_rows[:, 3:].astype(pdt)
        sc = StepScalars(
            dt=srow[0].astype(pdt),
            horizon=srow[1].astype(pdt),
            scan_t0_rel=trow[:S],
            use_imu=srow[2] > 0.5,
            step_length=srow[3].astype(pdt),
            max_step=srow[4].astype(pdt),
            balancing_imu=srow[5].astype(pdt),
            key=jax.random.PRNGKey(xrow[1].astype(jnp.int32)),
            win_t0=xrow[2].astype(jnp.float64) + xrow[3].astype(jnp.float64),
            acc_init=grow[:3].astype(pdt),
            acc_init_valid=grow[3] > 0.5,
        )
        shift_t0 = xrow[0].astype(pdt)

        raw_pts = pack[:, :3].astype(jnp.float32) * PT_SCALE
        qscale = grow[5].astype(jnp.float32)
        raw_rel = (pack[:, 3].astype(jnp.int32) & 0xFFFF).astype(jnp.float32) * qscale
        raw_rings = pack[:, 4].astype(jnp.int32)
        # validity ON DEVICE via the row count (grow[4], host-known): the
        # host pack buffers are a reused ring, so rows >= n hold stale
        # data.  Dequantized values are always finite; host NaN/Inf
        # sanitization maps to the origin, which min_dist drops.
        n_valid_rows = grow[4].astype(jnp.int32)
        row_i = jnp.arange(rc, dtype=jnp.int32)
        raw_mask = row_i < n_valid_rows

        res = pp.preprocess_scan(
            raw_pts,
            raw_mask,
            jax.random.fold_in(sc.key, 917),
            R_l2i,
            t_l2i,
            c.max_num_points_per_scan,
            c.min_dist_ds,
            c.min_dist,
            shapes.scan_cap,
        )
        new_pts = pp.transform_to_imu(raw_pts[res.indices], R_l2i, t_l2i)
        new_pts = jnp.where(res.mask[:, None], new_pts, 0.0)
        new_rel = jnp.where(res.mask, raw_rel[res.indices], 0.0)
        new_rings = jnp.where(res.mask, raw_rings[res.indices], 0)

        # push into the ring buffer (shift when full)
        full = state.num_scans >= shapes.n_clouds

        def shift(x):
            return jnp.where(full, jnp.roll(x, -1, axis=0), x)

        slot = jnp.where(full, shapes.n_clouds - 1, state.num_scans)
        state = state._replace(
            scan_pts=shift(state.scan_pts).at[slot].set(new_pts),
            scan_mask=shift(state.scan_mask).at[slot].set(res.mask),
            scan_rings=shift(state.scan_rings).at[slot].set(new_rings),
            scan_rel_stamps=shift(state.scan_rel_stamps).at[slot].set(new_rel),
            scan_grid=shift(state.scan_grid).at[slot].set(res.grid_size),
            num_scans=jnp.minimum(state.num_scans + 1, shapes.n_clouds),
        )

        ready = state.num_scans >= shapes.n_clouds

        def run(args):
            return window_step(*args)

        def skip(args):
            state = args[0]
            ev = jnp.zeros(EV_WIDTH, jnp.float32)
            ev = ev.at[19].set(res.num_kept.astype(jnp.float32))
            ev = ev.at[20].set(res.grid_size)
            return state, ev

        state, ev = jax.lax.cond(ready, run, skip, (state, sc, acc_dense, gyr_dense, shift_t0))
        slot_ev = state.ev_index % shapes.ev_cap
        state = state._replace(
            events=state.events.at[slot_ev].set(ev), ev_index=state.ev_index + 1
        )
        return state

    return jax.jit(step, donate_argnums=(0,))


class FusedDmsaSlam:
    """Host wrapper: same public API as pipeline.slam.DmsaSlam, one upload +
    one dispatch per scan, batched event download every `flush_every`."""

    def __init__(self, config: Optional[Config] = None, flush_every: int = 16):
        self.config = config or Config()
        c = self.config
        self.shapes = FusedShapes(
            n_clouds=c.n_clouds,
            scan_cap=-(-int(c.scan_cap_factor * c.max_num_points_per_scan) // 256) * 256,
            # raw padding must cover the post-downsample capacity, or
            # voxel.compact's indices/mask shapes diverge
            raw_cap=max(
                c.raw_scan_cap,
                -(-int(c.scan_cap_factor * c.max_num_points_per_scan) // 256) * 256,
            ),
            n_static=c.static_points_cap,
            n_ctrl=c.num_control_poses,
            n_dense=c.n_dense,
            kf_cap=c.last_n_keyframes_for_optim,
            kf_pts_cap=c.keyframe_points_cap,
            n_candidates=c.closest_k_keyframes_as_static_points,
            ev_cap=max(flush_every, 16),
        )
        self.flush_every = min(flush_every, self.shapes.ev_cap)
        mesh = None
        if c.distributed_keyframe_opt:
            import jax as _jax
            from dmsa_lidar_slam_tpu.parallel import mesh as pmesh

            cap = c.submap_max_keyframes or self.shapes.kf_cap
            s_sub = max(2, min(cap, self.shapes.kf_cap))
            n_total = s_sub * self.shapes.kf_pts_cap
            devs = _jax.devices()
            n_use = len(devs)
            while n_total % n_use != 0:  # drop devices until shards are even
                n_use -= 1
            if n_use > 1:
                mesh = pmesh.make_mesh("data", devices=devs[:n_use])
                if n_use < len(devs):
                    log.warning("fused distributed submap uses %d/%d devices", n_use, len(devs))
            else:
                log.warning("distributed_keyframe_opt requested but only 1 usable device")
        self.mesh = mesh
        self.step = make_step(c, self.shapes, mesh=mesh)
        self.state = empty_state(self.shapes)
        self.imu_buffer = ImuBuffer()
        self.output = OutputManager()
        self.metrics = Metrics()

        self.time_initialized = False
        self.received_imu = False
        self.buffered_scan = None
        self.scan_counter = 0  # scans dispatched to the device
        self._flushed_upto = 0
        self._scan_minmax: List = []  # (min, max) raw stamps, window ring
        self._window_t0_history: List[float] = []  # per dispatched scan
        self._prev_window_t0: Optional[float] = None
        # absolute-time origin for device-side f64 stamps (first window t0);
        # keyframe stamps live in state.kf.stamps relative to this base
        self._stamp_base: Optional[float] = None
        self._imu_disabled_logged = False
        self.max_submap_span = 0  # deepest [minRelatedKeyId..end] optimized
        self.shuffle_overflow = 0  # spatial-backend dropped points (ev[24])

    # ------------------------------------------------------------------ API
    def process_imu(self, acc, gyr, stamp: float):
        if not self.time_initialized:
            return
        self.received_imu = True
        acc = np.array(acc, float)
        if self.config.acceleration_in_g:
            acc = acc * 9.81
        self.imu_buffer.add_measurement(acc, gyr, stamp + self.config.timeshift_to_imu)

    def process_imu_batch(self, acc, gyr, stamps):
        """Vectorized IMU ingestion (n samples at once) — identical
        semantics to n process_imu calls, ~40x less Python overhead at
        typical 400 Hz rates."""
        if not self.time_initialized or len(stamps) == 0:
            return
        self.received_imu = True
        acc = np.asarray(acc, float)
        if self.config.acceleration_in_g:
            acc = acc * 9.81
        self.imu_buffer.add_batch(
            acc, gyr, np.asarray(stamps, float) + self.config.timeshift_to_imu
        )

    def process_scan(self, points: np.ndarray, stamps: np.ndarray, rings: np.ndarray):
        c = self.config
        if not self.time_initialized:
            self.metrics.start_clock(float(stamps.min()))
            self.time_initialized = True
        if self.buffered_scan is None:
            self.buffered_scan = (points, stamps, rings)
            return
        to_process, self.buffered_scan = self.buffered_scan, (points, stamps, rings)
        points, stamps, rings = to_process

        with self.metrics.stage("dispatch"):
            self._dispatch(points, stamps, rings)
        self.scan_counter += 1
        if self.scan_counter - self._flushed_upto >= self.flush_every:
            with self.metrics.stage("flush"):
                self._flush_events()

    def _dispatch(self, points, stamps, rings):
        c = self.config
        sh = self.shapes
        n = min(len(points), sh.raw_cap)
        if len(points) > sh.raw_cap:
            log.warning("raw scan truncated: %d > %d", len(points), sh.raw_cap)

        scan_t0 = float(stamps[:n].min())
        scan_t1 = float(stamps[:n].max())
        self._scan_minmax.append((scan_t0, scan_t1))
        if len(self._scan_minmax) > sh.n_clouds:
            self._scan_minmax.pop(0)

        # window timing once the buffer will be full after this scan
        mins = [a for a, _ in self._scan_minmax]
        maxs = [b for _, b in self._scan_minmax]
        t0_w = min(mins)
        horizon = max(maxs) - t0_w + 1e-3
        dt = horizon / (sh.n_dense - 1)
        shift_t0 = 0.0 if self._prev_window_t0 is None else t0_w - self._prev_window_t0
        self._prev_window_t0 = t0_w
        self._window_t0_history.append(t0_w)

        use_imu_now = c.use_imu and self.received_imu
        if (
            self.scan_counter == 0
            and c.use_imu
            and not self.received_imu
            and not self._imu_disabled_logged
        ):
            log.warning("no IMU before initialization; disabling IMU")
            self._imu_disabled_logged = True
            c.use_imu = False
            use_imu_now = False

        if use_imu_now and self.imu_buffer.num_updates > 0:
            dense_t = t0_w + np.arange(sh.n_dense) * dt
            acc_d, gyr_d, timediff = self.imu_buffer.resample_nearest(dense_t)
            if timediff > 0.1:
                log.warning("traj-to-IMU timediff %.3f s", timediff)
        else:
            use_imu_now = False
            acc_d = np.zeros((sh.n_dense, 3))
            gyr_d = np.zeros((sh.n_dense, 3))

        # preallocated RING of pack buffers: at OS-128 scale per-scan
        # allocations alone cost ~2 ms of host time, so buffers are reused —
        # but never the one just handed to the async device_put: PJRT
        # host-buffer semantics allow the H2D transfer to read the numpy
        # buffer after the call returns, so a single reused buffer could be
        # overwritten mid-transfer (ADVICE r4).  Rotating 4 buffers gives
        # the transfer >= 3 scan intervals before reuse.  Validity of rows
        # >= n is handled on device via the row count; stale data there
        # never needs clearing.  The CPU backend may alias numpy buffers
        # indefinitely (zero-copy), so it keeps fresh allocations.
        import jax as _jax

        # ring size = flush_every (>= 4): between a buffer's use at scan k
        # and its reuse at scan k + ring, a flush has ALWAYS run (flushes
        # fire every flush_every scans), and _flush_events blocks on the
        # device state — which waits for every queued step, hence every
        # H2D transfer, up to that point.  So reuse never races the async
        # device_put, with ZERO added synchronization (an explicit
        # per-scan block_until_ready on the old transfer measured a
        # tunnel sync round trip per scan).  ~26 MB host RAM at OS-128
        # shapes with the default flush_every=20.
        reuse = _jax.default_backend() != "cpu"
        n_bufs = max(4, self.flush_every) if reuse else 1
        bufs = getattr(self, "_pack_bufs", None) if reuse else None
        if bufs is None or bufs[0][0].shape[0] != sh.raw_cap or len(bufs) != n_bufs:
            bufs = [
                (
                    np.zeros((sh.raw_cap, 5), dtype=np.int16),
                    np.zeros((sh.aux_rows, 6), dtype=np.float32),
                )
                for _ in range(n_bufs)
            ]
            if reuse:
                self._pack_bufs = bufs
        slot = self.scan_counter % len(bufs)
        pack, aux = bufs[slot]
        span = max(scan_t1 - scan_t0, 1e-6)
        qscale = span / 65535.0
        with self.metrics.stage("pack_fill"):
            # 5 mm fixed-point (rounded, not truncated — truncation would
            # bias every coordinate toward the origin); NaN/Inf -> 0 ->
            # dropped by the min_dist filter (the reference also discards
            # near-origin returns)
            q = np.nan_to_num(
                np.asarray(points[:n], np.float32) * PT_INV_SCALE,
                nan=0.0, posinf=0.0, neginf=0.0,
            )
            np.rint(q, out=q)
            # out-of-range points go to the ORIGIN (same drop path as NaN:
            # the min_dist filter removes them) — clipping to the +-163.8 m
            # boundary would fabricate finite phantom points at wrong
            # coordinates for very-long-range returns
            bad = np.abs(q).max(axis=1) > 32767.0
            if bad.any():
                q[bad] = 0.0
            pack[:n, :3] = q
            pack[:n, 3] = (
                ((stamps[:n] - scan_t0) * (1.0 / qscale)).astype(np.uint16).view(np.int16)
            )
            pack[:n, 4] = np.asarray(rings[:n]) & 0x7FFF
        D = sh.n_dense
        aux[:D, :3] = acc_d
        aux[:D, 3:] = gyr_d
        aux[D, :] = [
            dt,
            horizon,
            1.0 if use_imu_now else 0.0,
            c.alpha_sliding_window_imu if use_imu_now else c.alpha_sliding_window_no_imu,
            c.max_step_sliding_window_imu if use_imu_now else c.max_step_sliding_window_no_imu,
            c.imu_factor_weight_submap if use_imu_now else 0.0,
        ]
        rel = [a - t0_w for a, _ in self._scan_minmax]
        rel = [0.0] * (sh.n_clouds - len(rel)) + rel
        aux[D + 1, : sh.n_clouds] = rel
        aux[D + 2, 0] = shift_t0
        aux[D + 2, 1] = float(self.scan_counter + 1)
        if self._stamp_base is None:
            self._stamp_base = t0_w
        t0_rel = t0_w - self._stamp_base
        t0_hi = np.float32(t0_rel)
        aux[D + 2, 2] = t0_hi
        aux[D + 2, 3] = np.float32(t0_rel - float(t0_hi))
        acc_init = self.imu_buffer.initial_acc_mean
        if acc_init is not None:
            aux[D + 3, :3] = acc_init
            aux[D + 3, 3] = 1.0
        else:
            aux[D + 3, 3] = 0.0  # reused buffer: explicit reset
        aux[D + 3, 4] = float(n)  # valid raw rows (device-side mask)
        aux[D + 3, 5] = qscale

        with self.metrics.stage("upload"):
            # device_put, NOT jnp.asarray: interleaved with step launches,
            # asarray's H2D takes a blocking path on the remote backend
            # (measured 14-35 ms/scan at OS-128 pack size vs ~3 ms async;
            # the 4-buffer ring above makes the async transfer safe)
            pack_dev = jax.device_put(pack)
            aux_dev = jax.device_put(aux)
        with self.metrics.stage("launch"):
            self.state = self.step(self.state, pack_dev, aux_dev)
        self.received_imu = False

    # ------------------------------------------------------------- events
    def _flush_events(self):
        """Download the event ring once and replay into the output ledger."""
        n_new = self.scan_counter - self._flushed_upto
        if n_new <= 0:
            return
        events = np.array(self.state.events)  # one transfer
        cap = self.shapes.ev_cap
        for i in range(self._flushed_upto, self.scan_counter):
            ev = events[i % cap]
            t0_w = self._window_t0_history[i]
            etype = int(round(ev[0]))
            if etype in (1, 2):  # init / keyframe
                if etype == 2:
                    self.max_submap_span = max(self.max_submap_span, int(round(ev[7])))
                    ov = int(round(ev[24]))
                    if ov > 0:  # spatial all_to_all bucket overflow
                        self.shuffle_overflow += ov
                        log.warning(
                            "spatial shuffle overflow: %d points dropped "
                            "(total %d)", ov, self.shuffle_overflow
                        )
                if ev[8] > 0.5 and etype == 2:  # retirement first
                    # exact device f64 stamp: base + hi + lo
                    ret_stamp = (self._stamp_base or 0.0) + float(ev[21]) + float(ev[23])
                    self.output.add_static_keyframe_pose(ev[12:15], ev[9:12], ret_stamp)
                self.output.inform_about_new_keyframe()
            elif etype == 3:  # non-keyframe, pose relative to live kf
                self.output.add_non_keyframe_pose(ev[4:7], ev[1:4], t0_w, int(ev[7]))
        self._flushed_upto = self.scan_counter

    # ------------------------------------------------------------- outputs
    @property
    def kf_count(self) -> int:
        return int(self.state.kf.count)

    def keyframe_poses(self):
        """(stamps, transl [n,3], orient [n,3]) of the active keyframes.

        Stamps come from the device map itself (f64, relative to the stamp
        base) so they can never desynchronize from the poses."""
        n = self.kf_count
        transl = np.array(self.state.kf.transl_w)[:n]
        orient = np.array(self.state.kf.orient_w)[:n]
        base = self._stamp_base or 0.0
        stamps = np.array(self.state.kf.stamps)[:n] + base if n else np.zeros(0)
        return stamps, transl, orient

    def map_points(self, first: int = 0):
        n = self.kf_count
        if n == 0 or first >= n:
            return None
        from scipy.spatial.transform import Rotation

        pts = np.array(self.state.kf.local_pts)[first:n]
        msk = np.array(self.state.kf.pt_mask)[first:n]
        orient = np.array(self.state.kf.orient_w)[first:n]
        transl = np.array(self.state.kf.transl_w)[first:n]
        out = []
        for k in range(n - first):
            R = Rotation.from_rotvec(orient[k]).as_matrix().astype(np.float32)
            out.append(pts[k][msk[k]] @ R.T + transl[k].astype(np.float32))
        return np.concatenate(out) if out else None

    def submap_points(self, span: int = 8):
        """Clouds of the most recent `span` keyframes — the live-view
        equivalent of the reference's /dmsa_slam/submap publication
        (dmsa_slam_ros.cpp:222-225)."""
        return self.map_points(first=max(0, self.kf_count - span))

    def current_pose(self):
        """(position [3], rotvec [3]) of the latest keyframe pose."""
        n = self.kf_count
        if n == 0:
            return None
        return (
            np.array(self.state.kf.transl_w[n - 1], float),
            np.array(self.state.kf.orient_w[n - 1], float),
        )

    def all_poses(self):
        """Full merged trajectory (retired + live keyframes + non-keyframe
        poses, insertion order) as (stamps, transl [n,3], orient [n,3])."""
        self._flush_events()
        stamps, transl, orient = self.keyframe_poses()
        return self.output.dense_poses_list(stamps, transl, orient)

    def save_poses(self, result_dir: str) -> str:
        self._flush_events()
        stamps, transl, orient = self.keyframe_poses()
        return self.output.save_dense_poses(stamps, transl, orient, result_dir)
