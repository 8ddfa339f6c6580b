"""Distributed keyframe adjustment on the 8-device virtual CPU mesh."""

import numpy as np
import pytest
from scipy.spatial.transform import Rotation

import jax
import jax.numpy as jnp

from dmsa_lidar_slam_tpu.map import keyframes as kfm
from dmsa_lidar_slam_tpu.map.management import KeyframeMap
from dmsa_lidar_slam_tpu.parallel import keyframe_dist, mesh as pmesh
from dmsa_lidar_slam_tpu.utils.dtypes import pose_dtype

from dmsa_lidar_slam_tpu.io import synthetic as iosyn

from tests import synthetic


def build_map(rng, n_kf=8, pts_per_kf=512, noise=0.01, room_scale=0.45):
    """Keyframe map from synthetic scans at known poses (noisy scans in a
    small room so the cell landscape is well conditioned at test scale)."""
    shapes = kfm.MapShapes(n_keyframes=n_kf, n_pts_per_kf=pts_per_kf)
    kf_map = KeyframeMap(shapes)
    planes = iosyn.room_scene(room_scale)
    true_poses = []
    for k in range(n_kf):
        pos = room_scale * np.array([-3.0 + 0.4 * k, -1.0 + 0.15 * k, 2.6])
        rv = np.array([0.0, 0.0, 0.1 + 0.05 * k])
        true_poses.append((pos, rv))
        world = iosyn.sample_scene_points(rng, pts_per_kf, planes=planes)
        local, rings, _ = synthetic.scan_from_pose(rng, world, pos, rv)
        local = local + rng.normal(scale=noise, size=local.shape).astype(np.float32)
        normals = np.zeros_like(local)
        normals[:, 2] = 1.0
        kf_map.add_keyframe(pos, rv, 1000.0 + k, local, normals, rings, 0.2)
    return shapes, kf_map, true_poses


def test_distributed_keyframe_adjustment(rng):
    if len(jax.devices()) < 2:
        pytest.skip("needs multiple devices")
    mesh = pmesh.make_mesh("data")
    shapes, kf_map, true_poses = build_map(rng, n_kf=8, pts_per_kf=512)

    data, params_true = kf_map.to_problem_data(0, 1.0, 1000.0)
    pdt = pose_dtype()

    # perturb the relative chain
    noise = rng.normal(scale=0.01, size=params_true.shape)
    noise[: 3 * (shapes.n_keyframes - 1)] *= 0.3
    params0 = jnp.asarray(params_true + noise, dtype=pdt)

    params, err = keyframe_dist.distributed_keyframe_optimize(
        mesh, data, shapes, params0, num_iter=14, min_grid=0.2, step_length=0.3, max_step=0.1
    )
    got = np.asarray(params)
    e0 = np.linalg.norm(params_true - np.asarray(params0))
    e1 = np.linalg.norm(params_true - got)
    assert e1 < 0.65 * e0, f"param err {e0} -> {e1}"


def test_dist_matches_mesh_size_one(rng):
    if len(jax.devices()) < 2:
        pytest.skip("needs multiple devices")
    shapes, kf_map, _ = build_map(rng, n_kf=8, pts_per_kf=256)
    data, params_true = kf_map.to_problem_data(0, 1.0, 1000.0)
    pdt = pose_dtype()
    params0 = jnp.asarray(params_true + 0.02, dtype=pdt)

    mesh8 = pmesh.make_mesh("data")
    mesh1 = pmesh.make_mesh("data", devices=jax.devices()[:1])
    kwargs = dict(num_iter=2, min_grid=0.2, step_length=0.3, max_step=0.1, table_size=4096)
    p8, _ = keyframe_dist.distributed_keyframe_optimize(mesh8, data, shapes, params0, **kwargs)
    p1, _ = keyframe_dist.distributed_keyframe_optimize(mesh1, data, shapes, params0, **kwargs)
    # f32 per-cell partial sums reduce in device-count-dependent order, so
    # agreement is to reduction-order noise, not bitwise
    np.testing.assert_allclose(np.asarray(p8), np.asarray(p1), rtol=5e-3, atol=2e-3)
