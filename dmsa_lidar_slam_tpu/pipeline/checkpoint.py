"""Checkpoint / resume of the full SLAM state.

The reference has no resume capability — a crash loses everything past the
last cyclic Poses.txt rewrite and processing cannot restart mid-bag
(SURVEY §5).  Here the complete estimator state — keyframe map, output
ledger, previous-window poses, scan/IMU buffers, counters — serializes to a
single .npz so a run can resume exactly where it stopped.
"""

import json
import os
from typing import Optional

import numpy as np

from dmsa_lidar_slam_tpu.imu.buffer import BIAS_ESTIMATION_SAMPLES

# v2: fused checkpoints carry stamp_base + meaningful device stamps
# (kf_stamp_queue removed); v1 fused checkpoints are rejected on load.
CHECKPOINT_VERSION = 3  # r5: event ledger width 24 -> 25 (shuffle overflow)


def save_checkpoint(slam, path: str):
    """Serialize a pipeline.slam.DmsaSlam to `path` (.npz)."""
    kf = slam.kf_map
    out = slam.output
    arrays = {
        # keyframe map
        "kf_local_pts": kf.local_pts,
        "kf_local_normals": kf.local_normals,
        "kf_pt_mask": kf.pt_mask,
        "kf_pt_ring": kf.pt_ring,
        "kf_grid_size": kf.grid_size,
        "kf_orient_w": kf.orient_w,
        "kf_transl_w": kf.transl_w,
        "kf_stamps": kf.stamps,
        "kf_grav_meas": kf.grav_meas,
        "kf_grav_plausible": kf.grav_plausible,
        "kf_odom_rel_orient": kf.odom_rel_orient,
        "kf_odom_rel_transl": kf.odom_rel_transl,
        # imu buffer
        "imu_acc": slam.imu_buffer.acc,
        "imu_gyr": slam.imu_buffer.gyr,
        "imu_stamps": slam.imu_buffer.stamps,
        "imu_bias": slam.imu_buffer.bias_gyr,
        # output ledger
        "out_order_is_key": np.asarray(out.order_is_key, dtype=bool),
        "out_static_stamps": np.asarray([s for s, _, _ in out.static_keyframes]),
        "out_static_transl": (
            np.stack([t for _, t, _ in out.static_keyframes])
            if out.static_keyframes
            else np.zeros((0, 3))
        ),
        "out_static_orient": (
            np.stack([o for _, _, o in out.static_keyframes])
            if out.static_keyframes
            else np.zeros((0, 3))
        ),
        "out_nk_transl": (
            np.stack([nk.transl for nk in out.non_keyframes])
            if out.non_keyframes
            else np.zeros((0, 3))
        ),
        "out_nk_orient": (
            np.stack([nk.orient for nk in out.non_keyframes])
            if out.non_keyframes
            else np.zeros((0, 3))
        ),
        "out_nk_stamp": np.asarray([nk.stamp for nk in out.non_keyframes]),
        "out_nk_rel": np.asarray([nk.relative for nk in out.non_keyframes], dtype=bool),
        "out_nk_kfid": np.asarray(
            [nk.related_keyframe_id for nk in out.non_keyframes], dtype=np.int64
        ),
    }
    if slam.old_window is not None:
        ow = slam.old_window
        arrays.update(
            ow_orient=ow.orient_w,
            ow_transl=ow.transl_w,
            ow_stamps=ow.ctrl_stamps,
            ow_scalars=np.asarray([ow.t0, ow.horizon]),
        )
    # scan buffer (ragged -> per-scan arrays)
    for i, scan in enumerate(slam.scan_buffer):
        arrays[f"scan{i}_points"] = scan.points
        arrays[f"scan{i}_stamps"] = scan.stamps
        arrays[f"scan{i}_rings"] = scan.rings
        arrays[f"scan{i}_grid"] = np.asarray(scan.grid_size)
    if slam.buffered_scan is not None:
        p, s, r = slam.buffered_scan
        arrays["buffered_points"] = p
        arrays["buffered_stamps"] = s
        arrays["buffered_rings"] = r

    meta = {
        "version": CHECKPOINT_VERSION,
        "kf_count": kf.count,
        "kf_num_updates": kf.num_updates,
        "imu_next_idx": slam.imu_buffer.next_idx,
        "imu_num_updates": slam.imu_buffer.num_updates,
        "scan_updates": slam.scan_updates,
        "n_scans_in_buffer": len(slam.scan_buffer),
        "time_initialized": slam.time_initialized,
        "submap_initialized": slam.submap_initialized,
        "received_imu": slam.received_imu,
        "use_imu": slam.config.use_imu,
        "prng_counter": slam._prng_counter,
        "has_old_window": slam.old_window is not None,
        "has_buffered_scan": slam.buffered_scan is not None,
    }
    tmp = path + ".tmp.npz"
    np.savez_compressed(tmp, meta=json.dumps(meta), **arrays)
    os.replace(tmp, path)


def load_checkpoint(slam, path: str):
    """Restore state saved by save_checkpoint into a freshly-constructed
    DmsaSlam (same Config/shapes required)."""
    from dmsa_lidar_slam_tpu.pipeline.output import _NonKeyframePose
    from dmsa_lidar_slam_tpu.pipeline.slam import OldWindow
    from dmsa_lidar_slam_tpu.trajectory.builder import HostScan

    z = np.load(path, allow_pickle=False)
    meta = json.loads(str(z["meta"]))
    if meta["version"] != CHECKPOINT_VERSION:
        raise ValueError(f"checkpoint version {meta['version']} != {CHECKPOINT_VERSION}")

    kf = slam.kf_map
    for name, attr in [
        ("kf_local_pts", "local_pts"),
        ("kf_local_normals", "local_normals"),
        ("kf_pt_mask", "pt_mask"),
        ("kf_pt_ring", "pt_ring"),
        ("kf_grid_size", "grid_size"),
        ("kf_orient_w", "orient_w"),
        ("kf_transl_w", "transl_w"),
        ("kf_stamps", "stamps"),
        ("kf_grav_meas", "grav_meas"),
        ("kf_grav_plausible", "grav_plausible"),
        ("kf_odom_rel_orient", "odom_rel_orient"),
        ("kf_odom_rel_transl", "odom_rel_transl"),
    ]:
        getattr(kf, attr)[...] = z[name]
    kf.count = meta["kf_count"]
    kf.num_updates = meta["kf_num_updates"]

    slam.imu_buffer.acc[...] = z["imu_acc"]
    slam.imu_buffer.gyr[...] = z["imu_gyr"]
    slam.imu_buffer.stamps[...] = z["imu_stamps"]
    slam.imu_buffer.bias_gyr[...] = z["imu_bias"]
    slam.imu_buffer.next_idx = meta["imu_next_idx"]
    slam.imu_buffer.num_updates = meta["imu_num_updates"]
    if slam.imu_buffer.num_updates >= BIAS_ESTIMATION_SAMPLES:
        # static-start mean acc (gravity init) is derivable from the stored
        # ring: the first 50 samples sit at the buffer head until wrap (and
        # after a wrap the value is no longer consulted)
        slam.imu_buffer.acc_init = (
            slam.imu_buffer.acc[:BIAS_ESTIMATION_SAMPLES].mean(axis=0)
        )

    out = slam.output
    out.order_is_key = [bool(v) for v in z["out_order_is_key"]]
    out.static_keyframes = [
        (float(s), t.copy(), o.copy())
        for s, t, o in zip(z["out_static_stamps"], z["out_static_transl"], z["out_static_orient"])
    ]
    out.non_keyframes = []
    for t, o, s, rel, kid in zip(
        z["out_nk_transl"], z["out_nk_orient"], z["out_nk_stamp"], z["out_nk_rel"], z["out_nk_kfid"]
    ):
        nk = _NonKeyframePose(t, o, float(s), int(kid))
        nk.relative = bool(rel)
        out.non_keyframes.append(nk)

    if meta["has_old_window"]:
        t0, horizon = z["ow_scalars"]
        slam.old_window = OldWindow(
            orient_w=z["ow_orient"],
            transl_w=z["ow_transl"],
            ctrl_stamps=z["ow_stamps"],
            t0=float(t0),
            horizon=float(horizon),
        )

    slam.scan_buffer = [
        HostScan(
            points=z[f"scan{i}_points"],
            stamps=z[f"scan{i}_stamps"],
            rings=z[f"scan{i}_rings"],
            grid_size=float(z[f"scan{i}_grid"]),
        )
        for i in range(meta["n_scans_in_buffer"])
    ]
    if meta["has_buffered_scan"]:
        slam.buffered_scan = (z["buffered_points"], z["buffered_stamps"], z["buffered_rings"])

    slam.scan_updates = meta["scan_updates"]
    slam.time_initialized = meta["time_initialized"]
    slam.submap_initialized = meta["submap_initialized"]
    slam.received_imu = meta["received_imu"]
    slam.config.use_imu = meta["use_imu"]
    slam._prng_counter = meta["prng_counter"]
    return slam


# ---------------------------------------------------------------- fused
def save_fused_checkpoint(slam, path: str):
    """Serialize a pipeline.fused.FusedDmsaSlam (downloads the device state
    once — one batched transfer per leaf)."""
    import jax

    slam._flush_events()
    leaves, treedef = jax.tree.flatten(slam.state)
    arrays = {f"leaf{i}": np.asarray(l) for i, l in enumerate(leaves)}
    arrays.update(
        imu_acc=slam.imu_buffer.acc,
        imu_gyr=slam.imu_buffer.gyr,
        imu_stamps=slam.imu_buffer.stamps,
        imu_bias=slam.imu_buffer.bias_gyr,
        scan_minmax=np.asarray(slam._scan_minmax, dtype=np.float64).reshape(-1, 2)
        if slam._scan_minmax
        else np.zeros((0, 2)),
        window_t0_history=np.asarray(slam._window_t0_history),
        out_order_is_key=np.asarray(slam.output.order_is_key, dtype=bool),
        out_static_stamps=np.asarray([s for s, _, _ in slam.output.static_keyframes]),
        out_static_transl=(
            np.stack([t for _, t, _ in slam.output.static_keyframes])
            if slam.output.static_keyframes
            else np.zeros((0, 3))
        ),
        out_static_orient=(
            np.stack([o for _, _, o in slam.output.static_keyframes])
            if slam.output.static_keyframes
            else np.zeros((0, 3))
        ),
        out_nk_transl=(
            np.stack([nk.transl for nk in slam.output.non_keyframes])
            if slam.output.non_keyframes
            else np.zeros((0, 3))
        ),
        out_nk_orient=(
            np.stack([nk.orient for nk in slam.output.non_keyframes])
            if slam.output.non_keyframes
            else np.zeros((0, 3))
        ),
        out_nk_stamp=np.asarray([nk.stamp for nk in slam.output.non_keyframes]),
        out_nk_rel=np.asarray([nk.relative for nk in slam.output.non_keyframes], dtype=bool),
        out_nk_kfid=np.asarray(
            [nk.related_keyframe_id for nk in slam.output.non_keyframes], dtype=np.int64
        ),
    )
    meta = {
        "version": CHECKPOINT_VERSION,
        "kind": "fused",
        "num_leaves": len(leaves),
        "scan_counter": slam.scan_counter,
        "flushed_upto": slam._flushed_upto,
        "time_initialized": slam.time_initialized,
        "received_imu": slam.received_imu,
        "use_imu": slam.config.use_imu,
        "imu_next_idx": slam.imu_buffer.next_idx,
        "imu_num_updates": slam.imu_buffer.num_updates,
        "prev_window_t0": slam._prev_window_t0,
        "stamp_base": slam._stamp_base,
        "has_buffered_scan": slam.buffered_scan is not None,
    }
    arrays_b = {}
    if slam.buffered_scan is not None:
        p, s, r = slam.buffered_scan
        arrays_b = {"buffered_points": p, "buffered_stamps": s, "buffered_rings": r}
    tmp = path + ".tmp.npz"
    np.savez_compressed(tmp, meta=json.dumps(meta), **arrays, **arrays_b)
    os.replace(tmp, path)


def load_fused_checkpoint(slam, path: str):
    """Restore into a freshly-constructed FusedDmsaSlam (same Config)."""
    import jax
    import jax.numpy as jnp

    from dmsa_lidar_slam_tpu.pipeline.output import _NonKeyframePose

    z = np.load(path, allow_pickle=False)
    meta = json.loads(str(z["meta"]))
    if meta.get("kind") != "fused":
        raise ValueError("not a fused-pipeline checkpoint")
    if meta.get("version") != CHECKPOINT_VERSION:
        raise ValueError(
            f"fused checkpoint version {meta.get('version')} != {CHECKPOINT_VERSION}"
        )

    leaves, treedef = jax.tree.flatten(slam.state)
    new_leaves = [jnp.asarray(z[f"leaf{i}"], dtype=l.dtype) for i, l in enumerate(leaves)]
    slam.state = jax.tree.unflatten(treedef, new_leaves)

    slam.imu_buffer.acc[...] = z["imu_acc"]
    slam.imu_buffer.gyr[...] = z["imu_gyr"]
    slam.imu_buffer.stamps[...] = z["imu_stamps"]
    slam.imu_buffer.bias_gyr[...] = z["imu_bias"]
    slam.imu_buffer.next_idx = meta["imu_next_idx"]
    slam.imu_buffer.num_updates = meta["imu_num_updates"]
    if slam.imu_buffer.num_updates >= BIAS_ESTIMATION_SAMPLES:
        # static-start mean acc (gravity init) is derivable from the stored
        # ring: the first 50 samples sit at the buffer head until wrap (and
        # after a wrap the value is no longer consulted)
        slam.imu_buffer.acc_init = (
            slam.imu_buffer.acc[:BIAS_ESTIMATION_SAMPLES].mean(axis=0)
        )

    slam._scan_minmax = [tuple(row) for row in z["scan_minmax"]]
    slam._window_t0_history = list(z["window_t0_history"])
    slam.scan_counter = meta["scan_counter"]
    slam._flushed_upto = meta["flushed_upto"]
    slam.time_initialized = meta["time_initialized"]
    slam.received_imu = meta["received_imu"]
    slam.config.use_imu = meta["use_imu"]
    slam._prev_window_t0 = meta["prev_window_t0"]
    slam._stamp_base = meta.get("stamp_base")
    if meta["has_buffered_scan"]:
        slam.buffered_scan = (z["buffered_points"], z["buffered_stamps"], z["buffered_rings"])

    out = slam.output
    out.order_is_key = [bool(v) for v in z["out_order_is_key"]]
    out.static_keyframes = [
        (float(s), t.copy(), o.copy())
        for s, t, o in zip(z["out_static_stamps"], z["out_static_transl"], z["out_static_orient"])
    ]
    out.non_keyframes = []
    for t, o, s, rel, kid in zip(
        z["out_nk_transl"], z["out_nk_orient"], z["out_nk_stamp"], z["out_nk_rel"], z["out_nk_kfid"]
    ):
        nk = _NonKeyframePose(t, o, float(s), int(kid))
        nk.relative = bool(rel)
        out.non_keyframes.append(nk)
    return slam
