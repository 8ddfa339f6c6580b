"""Preprocessing ladder + approximate voxel counting."""

import numpy as np

import jax
import jax.numpy as jnp

from dmsa_lidar_slam_tpu.ops import voxel
from dmsa_lidar_slam_tpu.pipeline import preprocess as pp


def test_count_voxels_ladder_close(rng):
    """The one-sort ladder counter (what preprocess_scan's grid decision
    uses) stays within hash-collision distance of the exact counts at
    every ladder level, with masked points excluded."""
    pts = rng.uniform(-20, 20, size=(5000, 3)).astype(np.float32)
    mask = rng.uniform(size=5000) > 0.1
    grids = pp.GRID_LADDER
    counts = np.asarray(
        voxel.count_voxels_ladder(jnp.asarray(pts), jnp.asarray(mask), grids)
    )
    for gi, grid in enumerate(grids):
        exact = int(voxel.count_voxels(jnp.asarray(pts), jnp.asarray(mask), grid))
        assert abs(int(counts[gi]) - exact) <= max(3, 0.005 * exact), (
            grid, exact, int(counts[gi]),
        )


def test_preprocess_grid_choice_and_range(rng):
    # dense cloud -> coarse grid chosen; range window applied
    n = 8000
    pts = rng.uniform(-3, 3, size=(n, 3)).astype(np.float32)
    mask = np.ones(n, dtype=bool)
    res = pp.preprocess_scan(
        jnp.asarray(pts),
        jnp.asarray(mask),
        jax.random.PRNGKey(0),
        jnp.eye(3, dtype=jnp.float32),
        jnp.zeros(3, dtype=jnp.float32),
        max_num_points=500,
        min_dist_ds=1.0,
        min_dist=0.2,
        cap=2000,
    )
    idx = np.asarray(res.indices)
    m = np.asarray(res.mask)
    sel = idx[m]
    ranges = np.linalg.norm(pts[sel], axis=1)
    assert np.all(ranges > 0.2)
    # threshold keeps roughly max_num_points (plus the min_dist_ds floor)
    assert 100 <= len(sel) <= 2000
    assert min(abs(float(res.grid_size) - g) for g in (0.4, 0.3, 0.2, 0.15)) < 1e-6


def test_preprocess_masked_invalid_points(rng):
    n = 1000
    pts = rng.uniform(-5, 5, size=(n, 3)).astype(np.float32)
    pts[::7] = np.nan
    mask = np.isfinite(pts).all(axis=1)
    res = pp.preprocess_scan(
        jnp.asarray(np.nan_to_num(pts)),
        jnp.asarray(mask),
        jax.random.PRNGKey(1),
        jnp.eye(3, dtype=jnp.float32),
        jnp.zeros(3, dtype=jnp.float32),
        max_num_points=300,
        min_dist_ds=2.0,
        min_dist=0.0,
        cap=1000,
    )
    idx = np.asarray(res.indices)[np.asarray(res.mask)]
    assert np.all(mask[idx])
