"""Hash-grid neighbor queries vs scipy cKDTree golden references."""

import numpy as np
from scipy.spatial import cKDTree

import jax.numpy as jnp

from dmsa_lidar_slam_tpu.ops import knn


def test_min_sq_dist_exact_within_cell(rng):
    ref = rng.uniform(-5, 5, size=(400, 3)).astype(np.float32)
    q = rng.uniform(-5, 5, size=(200, 3)).astype(np.float32)
    radius = 0.8
    grid = knn.build_grid(jnp.asarray(ref), jnp.ones(400, bool), radius)
    d2 = np.asarray(knn.min_sq_dist(grid, jnp.asarray(q), jnp.ones(200, bool), cap=32))
    tree = cKDTree(ref)
    d_true, _ = tree.query(q, k=1)
    # exact wherever the true NN is within the cell size
    close = d_true <= radius
    np.testing.assert_allclose(np.sqrt(d2[close]), d_true[close], rtol=1e-5)
    # never reports closer than truth
    assert np.all(np.sqrt(d2) >= d_true - 1e-5)


def test_has_neighbor_within_matches_kdtree(rng):
    ref = rng.uniform(-5, 5, size=(500, 3)).astype(np.float32)
    q = rng.uniform(-6, 6, size=(300, 3)).astype(np.float32)
    radius = 0.5
    grid = knn.build_grid(jnp.asarray(ref), jnp.ones(500, bool), radius)
    got = np.asarray(knn.has_neighbor_within(grid, jnp.asarray(q), jnp.ones(300, bool), radius, cap=32))
    tree = cKDTree(ref)
    d, _ = tree.query(q, k=1)
    np.testing.assert_array_equal(got, d <= radius)


def test_masked_ref_points_excluded(rng):
    ref = np.zeros((10, 3), dtype=np.float32)
    ref[5:] += 100.0
    mask = np.array([True] * 5 + [False] * 5)
    grid = knn.build_grid(jnp.asarray(ref), jnp.asarray(mask), 1.0)
    q = np.array([[100.0, 100.0, 100.0]], dtype=np.float32)
    got = np.asarray(knn.has_neighbor_within(grid, jnp.asarray(q), jnp.ones(1, bool), 1.0))
    assert not got[0]


def test_overlap_fraction(rng):
    ref = rng.uniform(0, 10, size=(1000, 3)).astype(np.float32)
    # half the queries are jittered ref points, half are far away
    q_near = ref[:100] + rng.normal(scale=0.05, size=(100, 3)).astype(np.float32)
    q_far = rng.uniform(50, 60, size=(100, 3)).astype(np.float32)
    q = np.concatenate([q_near, q_far])
    frac = float(
        knn.overlap_fraction(
            jnp.asarray(ref), jnp.ones(1000, bool), jnp.asarray(q), jnp.ones(200, bool), 0.3, cap=32
        )
    )
    assert 0.45 <= frac <= 0.55


def test_knn_indices_match_kdtree(rng):
    ref = rng.uniform(-3, 3, size=(300, 3)).astype(np.float32)
    grid_size = 1.0
    grid = knn.build_grid(jnp.asarray(ref), jnp.ones(300, bool), grid_size)
    q = ref[:50]
    idx, d2, valid = knn.knn_indices(grid, jnp.asarray(q), jnp.ones(50, bool), 4, cap=32)
    d2 = np.asarray(d2)
    tree = cKDTree(ref)
    d_true, _ = tree.query(q, k=4)
    # kNN from 27-neighborhood is exact while the k-th NN is within one cell
    ok = d_true[:, -1] <= grid_size
    np.testing.assert_allclose(np.sqrt(d2[ok]), d_true[ok], rtol=1e-5, atol=1e-6)


def test_normals_on_plane(rng):
    from dmsa_lidar_slam_tpu.map import normals as nrm

    # points on z=2 plane, viewpoint at origin below -> normals -z toward vp
    pts = np.concatenate(
        [rng.uniform(-3, 3, size=(400, 2)), np.full((400, 1), 2.0)], axis=1
    ).astype(np.float32)
    n = np.asarray(
        nrm.estimate_normals(jnp.asarray(pts), jnp.ones(400, bool), 0.3, viewpoint=jnp.zeros(3))
    )
    # normal should be +-z, oriented toward origin => -z
    assert np.mean(np.abs(n[:, 2])) > 0.99
    assert np.mean(n[:, 2] < 0) > 0.99
