"""Brute-force NN distances (ops.nn_bruteforce) vs scipy cKDTree."""

import numpy as np
import pytest
from scipy.spatial import cKDTree

import jax.numpy as jnp

from dmsa_lidar_slam_tpu.ops import nn_bruteforce as bf


@pytest.fixture
def rng():
    return np.random.default_rng(7)


def test_min_sq_dist_matches_kdtree(rng):
    ref = rng.normal(size=(700, 3)).astype(np.float32) * 5
    q = rng.normal(size=(450, 3)).astype(np.float32) * 5
    got = np.asarray(
        bf.min_sq_dist(jnp.asarray(ref), jnp.ones(700, bool), jnp.asarray(q), jnp.ones(450, bool))
    )
    d, _ = cKDTree(ref).query(q, k=1)
    np.testing.assert_allclose(got, d**2, rtol=2e-4, atol=1e-5)


def test_respects_ref_validity(rng):
    ref = np.zeros((10, 3), np.float32)
    ref[0] = [1.0, 0.0, 0.0]  # the only valid ref
    valid = np.zeros(10, bool)
    valid[0] = True
    q = np.zeros((4, 3), np.float32)
    got = np.asarray(bf.min_sq_dist(jnp.asarray(ref), jnp.asarray(valid), jnp.asarray(q), jnp.ones(4, bool)))
    np.testing.assert_allclose(got, 1.0, rtol=1e-5)


def test_invalid_queries_and_empty_ref(rng):
    ref = rng.normal(size=(16, 3)).astype(np.float32)
    q = rng.normal(size=(8, 3)).astype(np.float32)
    qv = np.zeros(8, bool)
    qv[:3] = True
    got = np.asarray(bf.min_sq_dist(jnp.asarray(ref), jnp.ones(16, bool), jnp.asarray(q), jnp.asarray(qv)))
    assert np.all(np.isinf(got[3:]))
    assert np.all(np.isfinite(got[:3]))
    # no valid reference at all -> all inf
    got2 = np.asarray(bf.min_sq_dist(jnp.asarray(ref), jnp.zeros(16, bool), jnp.asarray(q), jnp.asarray(qv)))
    assert np.all(np.isinf(got2))


def test_has_neighbor_within_matches_kdtree(rng):
    ref = rng.uniform(-4, 4, size=(900, 3)).astype(np.float32)
    q = rng.uniform(-4, 4, size=(600, 3)).astype(np.float32)
    radius = 0.35
    got = np.asarray(
        bf.has_neighbor_within(
            jnp.asarray(ref), jnp.ones(900, bool), jnp.asarray(q), jnp.ones(600, bool), radius
        )
    )
    d, _ = cKDTree(ref).query(q, k=1)
    want = d <= radius
    # allow disagreement only in a tiny band around the radius (f32 rounding)
    band = np.abs(d - radius) < 1e-4
    assert np.array_equal(got[~band], want[~band])


def test_large_offset_coordinates(rng):
    """Centering keeps f32 cancellation in check for far-from-origin clouds."""
    offset = np.array([300.0, -450.0, 120.0], np.float32)
    ref = rng.normal(size=(500, 3)).astype(np.float32) * 3 + offset
    q = rng.normal(size=(300, 3)).astype(np.float32) * 3 + offset
    got = np.asarray(
        bf.min_sq_dist(jnp.asarray(ref), jnp.ones(500, bool), jnp.asarray(q), jnp.ones(300, bool))
    )
    d, _ = cKDTree(ref).query(q, k=1)
    np.testing.assert_allclose(got, d**2, rtol=1e-3, atol=1e-4)
