"""Gaussian cell statistics vs numpy (np.cov, eig floor per Gaussians.h)."""

import numpy as np

import jax.numpy as jnp

from dmsa_lidar_slam_tpu.ops import gaussians, voxel


def np_info(cov):
    w, v = np.linalg.eigh(cov)
    w = np.maximum(w, gaussians.COV_EIG_FLOOR)
    return v @ np.diag(1.0 / w) @ v.T


def make_cloud(rng, n=400, spread=6.0):
    pts = rng.uniform(-spread, spread, size=(n, 3)).astype(np.float32)
    rings = rng.integers(0, 16, size=n).astype(np.int32)
    mask = np.ones(n, dtype=bool)
    return pts, rings, mask


def test_segment_mean_cov_matches_numpy(rng):
    pts, rings, mask = make_cloud(rng)
    grid = 3.0
    b = voxel.bin_points(jnp.asarray(pts), jnp.asarray(mask), grid)
    pc = np.asarray(b.point_cell)
    count, mean, cov = gaussians.segment_mean_cov(
        jnp.asarray(pts), jnp.asarray(pc), jnp.asarray(mask.astype(np.float32)), len(pts)
    )
    count, mean, cov = np.asarray(count), np.asarray(mean), np.asarray(cov)
    for cid in np.unique(pc):
        members = pts[pc == cid]
        if len(members) < 2:
            continue
        np.testing.assert_allclose(mean[cid], members.mean(axis=0), atol=1e-4)
        np.testing.assert_allclose(cov[cid], np.cov(members.T, ddof=1), atol=1e-3)


def test_build_cells_validity_rules(rng):
    # one tight cluster with diverse rings (valid), one with a single ring
    # (invalid), one with too few points (invalid)
    pts = np.concatenate(
        [
            rng.normal(scale=0.08, size=(20, 3)) + [0.5, 0.5, 0.5],
            rng.normal(scale=0.08, size=(20, 3)) + [10.5, 0.5, 0.5],
            rng.normal(scale=0.08, size=(3, 3)) + [20.5, 0.5, 0.5],
        ]
    ).astype(np.float32)
    rings = np.concatenate([np.arange(20) % 4, np.zeros(20), np.arange(3)]).astype(np.int32)
    mask = np.ones(len(pts), dtype=bool)
    cs = gaussians.build_cells(jnp.asarray(pts), jnp.asarray(mask), jnp.asarray(rings), 1.0, 6)
    assert int(cs.num_valid) == 1
    valid = np.asarray(cs.valid)
    pc = np.asarray(cs.point_cell)
    assert valid[pc[0]]  # the diverse cluster's cell is the valid one
    assert not valid[pc[20]]
    assert not valid[pc[40]]


def test_info_matches_numpy_floor(rng):
    # nearly-planar covariance exercises the floor
    A = rng.normal(size=(50, 3)).astype(np.float64)
    A[:, 2] *= 1e-4
    cov = np.cov(A.T, ddof=1)
    info = np.asarray(gaussians.info_from_cov(jnp.asarray(cov)[None]))[0]
    np.testing.assert_allclose(info, np_info(cov), rtol=1e-6, atol=1e-3)


def test_rebalancing_weights_mean_one(rng):
    pts, rings, mask = make_cloud(rng, n=600, spread=4.0)
    cs = gaussians.build_cells(jnp.asarray(pts), jnp.asarray(mask), jnp.asarray(rings), 2.0, 6)
    w = np.asarray(cs.weight)
    valid = np.asarray(cs.valid)
    if valid.sum() > 0:
        np.testing.assert_allclose(w[valid].mean(), 1.0, rtol=1e-5)
        # w propto 1/count
        counts = np.asarray(cs.count)[valid]
        ratio = w[valid] * counts
        np.testing.assert_allclose(ratio, ratio.mean(), rtol=1e-5)


def test_cell_residuals_match_direct(rng):
    pts, rings, mask = make_cloud(rng, n=500, spread=5.0)
    cs = gaussians.build_cells(jnp.asarray(pts), jnp.asarray(mask), jnp.asarray(rings), 2.5, 6)
    res = np.asarray(gaussians.cell_residuals(jnp.asarray(pts), jnp.asarray(mask), cs))
    from dmsa_lidar_slam_tpu.ops.eig3 import unpack_sym6

    pc = np.asarray(cs.point_cell)
    info = np.asarray(unpack_sym6(cs.info6))
    weight = np.asarray(cs.weight)
    valid = np.asarray(cs.valid)
    for cid in range(len(res)):
        if not valid[cid]:
            assert res[cid] == 0.0
            continue
        members = pts[pc == cid]
        mean = members.mean(axis=0)
        d = members - mean
        q = weight[cid] * np.einsum("ni,ij,nj->", d, info[cid], d)
        np.testing.assert_allclose(res[cid], np.sqrt(abs(q)), rtol=1e-4, atol=1e-5)


def test_cell_residuals_differentiable(rng):
    import jax

    pts, rings, mask = make_cloud(rng, n=200, spread=3.0)
    cs = gaussians.build_cells(jnp.asarray(pts), jnp.asarray(mask), jnp.asarray(rings), 2.0, 6)

    def loss(shift):
        moved = jnp.asarray(pts) + shift[None, :]
        r = gaussians.cell_residuals(moved, jnp.asarray(mask), cs)
        return jnp.sum(r**2)

    g = jax.grad(loss)(jnp.zeros(3, dtype=jnp.float32))
    # residuals are invariant to a global translation (mean-centered)
    np.testing.assert_allclose(np.asarray(g), 0.0, atol=1e-2)
    g2 = jax.jacfwd(loss)(jnp.ones(3, dtype=jnp.float32) * 0.01)
    assert np.all(np.isfinite(np.asarray(g2)))
