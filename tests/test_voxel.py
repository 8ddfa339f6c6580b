"""Voxel binning / downsampling vs a dict-based numpy reference."""

import numpy as np

import jax
import jax.numpy as jnp

from dmsa_lidar_slam_tpu.ops import voxel


def np_voxel_groups(points, mask, grid):
    groups = {}
    for i in range(len(points)):
        if not mask[i]:
            continue
        key = tuple(np.floor(points[i] / grid).astype(int))
        groups.setdefault(key, []).append(i)
    return groups


def test_bin_points_cell_count(rng):
    pts = rng.uniform(-10, 10, size=(500, 3)).astype(np.float32)
    mask = rng.uniform(size=500) > 0.1
    grid = 1.5
    b = voxel.bin_points(jnp.asarray(pts), jnp.asarray(mask), grid)
    groups = np_voxel_groups(pts, mask, grid)
    assert int(b.num_cells) == len(groups)


def test_bin_points_grouping(rng):
    pts = rng.uniform(-5, 5, size=(300, 3)).astype(np.float32)
    mask = np.ones(300, dtype=bool)
    grid = 2.0
    b = voxel.bin_points(jnp.asarray(pts), jnp.asarray(mask), grid)
    pc = np.asarray(b.point_cell)
    groups = np_voxel_groups(pts, mask, grid)
    # same voxel -> same cell id; different voxel -> different id
    for ids in groups.values():
        assert len(set(pc[ids])) == 1
    rep = {k: pc[ids[0]] for k, ids in groups.items()}
    assert len(set(rep.values())) == len(groups)


def test_masked_points_in_sentinel(rng):
    pts = rng.uniform(-5, 5, size=(100, 3)).astype(np.float32)
    mask = np.ones(100, dtype=bool)
    mask[40:60] = False
    b = voxel.bin_points(jnp.asarray(pts), jnp.asarray(mask), 1.0)
    pc = np.asarray(b.point_cell)
    assert np.all(pc[40:60] == 99)
    assert np.all(pc[mask] < int(b.num_cells))


def test_random_downsample_one_per_voxel(rng):
    pts = rng.uniform(-8, 8, size=(1000, 3)).astype(np.float32)
    mask = np.ones(1000, dtype=bool)
    grid = 2.0
    keep = np.asarray(
        voxel.random_downsample_mask(jnp.asarray(pts), jnp.asarray(mask), grid, jax.random.PRNGKey(0))
    )
    groups = np_voxel_groups(pts, mask, grid)
    assert keep.sum() == len(groups)
    for ids in groups.values():
        assert keep[ids].sum() == 1


def test_random_downsample_deterministic(rng):
    pts = rng.uniform(-8, 8, size=(200, 3)).astype(np.float32)
    mask = np.ones(200, dtype=bool)
    k1 = np.asarray(voxel.random_downsample_mask(jnp.asarray(pts), jnp.asarray(mask), 2.0, jax.random.PRNGKey(7)))
    k2 = np.asarray(voxel.random_downsample_mask(jnp.asarray(pts), jnp.asarray(mask), 2.0, jax.random.PRNGKey(7)))
    np.testing.assert_array_equal(k1, k2)


def test_compact():
    mask = np.array([False, True, False, True, True, False])
    idx, out_mask = voxel.compact(jnp.asarray(mask), 4)
    idx = np.asarray(idx)
    out_mask = np.asarray(out_mask)
    assert out_mask.tolist() == [True, True, True, False]
    assert idx[:3].tolist() == [1, 3, 4]


def test_split_channel_separates(rng):
    pts = np.zeros((10, 3), dtype=np.float32)  # all same voxel
    mask = np.ones(10, dtype=bool)
    channel = np.array([0] * 5 + [1] * 5, dtype=np.int32)
    b = voxel.bin_points(jnp.asarray(pts), jnp.asarray(mask), 1.0, channel=jnp.asarray(channel))
    pc = np.asarray(b.point_cell)
    assert int(b.num_cells) == 2
    assert len(set(pc[:5])) == 1 and len(set(pc[5:])) == 1 and pc[0] != pc[5]
