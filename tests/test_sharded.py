"""Distributed (shard_map) DMSA tests on the 8-device virtual CPU mesh."""

import numpy as np
import pytest
from scipy.spatial.transform import Rotation

import jax
import jax.numpy as jnp

from dmsa_lidar_slam_tpu.core import poses as cp
from dmsa_lidar_slam_tpu.core import rotations as rot
from dmsa_lidar_slam_tpu.parallel import mesh as pmesh
from dmsa_lidar_slam_tpu.parallel import sharded
from dmsa_lidar_slam_tpu.utils.dtypes import pose_dtype

from tests import synthetic


@pytest.fixture(scope="module")
def mesh():
    if len(jax.devices()) < 2:
        pytest.skip("needs multiple devices")
    return pmesh.make_mesh("data")


def test_hash_cells_consistent(rng):
    pts = rng.uniform(-10, 10, size=(512, 3)).astype(np.float32)
    mask = np.ones(512, dtype=bool)
    cid = np.asarray(sharded.hash_cell_ids(jnp.asarray(pts), jnp.asarray(mask), 1.0, 4096))
    vox = np.floor(pts / 1.0).astype(int)
    # same voxel -> same id
    from collections import defaultdict

    groups = defaultdict(list)
    for i, v in enumerate(map(tuple, vox)):
        groups[v].append(i)
    for ids in groups.values():
        assert len(set(cid[ids])) == 1


def two_scan_problem(rng, n_pts=2048):
    world1 = synthetic.sample_scene_points(rng, n_pts)
    world2 = synthetic.sample_scene_points(rng, n_pts)
    pose0 = (np.array([-4.0, -1.0, 1.2]), np.array([0.0, 0.0, 0.1]))
    pose1 = (np.array([-3.8, -0.9, 1.22]), np.array([0.0, 0.0, 0.15]))
    l1, r1, _ = synthetic.scan_from_pose(rng, world1, *pose0)
    l2, r2, _ = synthetic.scan_from_pose(rng, world2, *pose1)
    R0 = Rotation.from_rotvec(pose0[1]).as_matrix()
    R1 = Rotation.from_rotvec(pose1[1]).as_matrix()
    true_params = np.concatenate(
        [
            Rotation.from_matrix(R0.T @ R1).as_rotvec(),
            R0.T @ (pose1[0] - pose0[0]),
        ]
    )
    # interleave scans so shards get a mix of both
    local = np.stack([l1, l2], axis=1).reshape(-1, 3)
    rings = np.stack([r1, r2], axis=1).reshape(-1)
    scan_id = np.tile(np.asarray([0, 1], np.int32), n_pts)
    anchor = (pose0[1], pose0[0])
    return local, rings, scan_id, anchor, true_params


def make_transform(anchor, scan_ids):
    pdt = pose_dtype()
    a_o = jnp.asarray(anchor[0], dtype=pdt)
    a_t = jnp.asarray(anchor[1], dtype=pdt)

    def transform(params, local_pts):
        R0 = rot.axang2rotm(a_o)
        R_rel = rot.axang2rotm(params[:3])
        t_rel = params[3:]
        R1 = R0 @ R_rel
        t1 = a_t + R0 @ t_rel
        Rs = jnp.stack([R0, R1]).astype(jnp.float32)
        ts = jnp.stack([a_t, t1]).astype(jnp.float32)
        sid = scan_ids[: local_pts.shape[0]]
        return jnp.einsum("nij,nj->ni", Rs[sid], local_pts) + ts[sid]

    return transform


def test_sharded_gn_converges(mesh, rng):
    local, rings, scan_id, anchor, true_params = two_scan_problem(rng)
    pdt = pose_dtype()
    n = len(local)
    ndev = len(jax.devices())
    assert n % ndev == 0

    # scan ids must shard identically to points: fold into transform by
    # sharding them alongside (here: pass per-shard slice via closure index)
    sid_global = jnp.asarray(scan_id)

    def transform(params, local_pts, aux):
        # inside shard_map the leading axis is the local shard; scan ids
        # pattern repeats [0,1,0,1,...] so recompute locally
        m = local_pts.shape[0]
        sid = (jax.lax.broadcasted_iota(jnp.int32, (m, 1), 0).squeeze(-1)) % 2
        R0 = rot.axang2rotm(jnp.asarray(anchor[0], dtype=pdt))
        R_rel = rot.axang2rotm(params[:3])
        R1 = R0 @ R_rel
        t0 = jnp.asarray(anchor[1], dtype=pdt)
        t1 = t0 + R0 @ params[3:]
        Rs = jnp.stack([R0, R1]).astype(jnp.float32)
        ts = jnp.stack([t0, t1]).astype(jnp.float32)
        return jnp.einsum("nij,nj->ni", Rs[sid], local_pts) + ts[sid]

    step_fn = sharded.make_sharded_step(
        mesh,
        transform,
        min_points=6,
        table_size=4096,
        lambda_diag=1e-5,
        step_length=0.3,
        max_step=0.3,
        grid_sizes=(0.6, 1.5),
    )

    init = true_params + np.array([0.01, -0.01, 0.02, 0.08, -0.06, 0.04])
    params = jnp.asarray(init, dtype=pdt)
    pts_s = jnp.asarray(local)
    mask_s = jnp.ones(n, dtype=bool)
    rings_s = jnp.asarray(rings)
    for _ in range(10):
        params, err, ncells = step_fn(params, pts_s, mask_s, rings_s, ())
    got = np.asarray(params)
    assert int(ncells) > 20
    err0 = np.linalg.norm(init - true_params)
    err1 = np.linalg.norm(got - true_params)
    assert err1 < 0.5 * err0, f"{err0} -> {err1}"


def test_sharded_matches_single_device(mesh, rng):
    """The psum'd GN system must be independent of the device count."""
    local, rings, scan_id, anchor, true_params = two_scan_problem(rng, n_pts=1024)
    pdt = pose_dtype()
    n = len(local)

    def transform(params, local_pts, aux):
        m = local_pts.shape[0]
        sid = (jax.lax.broadcasted_iota(jnp.int32, (m, 1), 0).squeeze(-1)) % 2
        R0 = rot.axang2rotm(jnp.asarray(anchor[0], dtype=pdt))
        R1 = R0 @ rot.axang2rotm(params[:3])
        t0 = jnp.asarray(anchor[1], dtype=pdt)
        t1 = t0 + R0 @ params[3:]
        Rs = jnp.stack([R0, R1]).astype(jnp.float32)
        ts = jnp.stack([t0, t1]).astype(jnp.float32)
        return jnp.einsum("nij,nj->ni", Rs[sid], local_pts) + ts[sid]

    mesh1 = pmesh.make_mesh("data", devices=jax.devices()[:1])
    common = dict(
        min_points=6, table_size=2048, lambda_diag=1e-5, step_length=0.3, max_step=0.3,
        grid_sizes=(0.6,),
    )
    f_multi = sharded.make_sharded_step(mesh, transform, **common)
    f_single = sharded.make_sharded_step(mesh1, transform, **common)

    init = jnp.asarray(true_params + 0.05, dtype=pdt)
    args = (jnp.asarray(local), jnp.ones(n, dtype=bool), jnp.asarray(rings), ())
    p_m, e_m, c_m = f_multi(init, *args)
    p_s, e_s, c_s = f_single(init, *args)
    assert int(c_m) == int(c_s)
    # f32 partial sums reduce in device-count-dependent order; the
    # closed-form spectral inverse amplifies that for near-planar cells
    np.testing.assert_allclose(np.asarray(p_m), np.asarray(p_s), rtol=5e-3, atol=5e-4)
