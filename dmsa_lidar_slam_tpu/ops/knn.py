"""Fixed-radius neighbor queries and kNN on a hash grid — no trees.

TPU-native replacement for the reference's PCL KdTreeFLANN usage: static
point matching (DmsaSlam.h:285-345), overlap computation (DmsaSlam.h:377-414)
and the k=6 normal-estimation search (DmsaSlam.h:557-568).

Design: reference points are binned at cell size = radius; a query point
only needs the 27 adjacent voxels, each truncated to `cap` members (the
clouds are voxel-downsampled upstream, so true occupancy is small; callers
log `max_occupancy` vs cap — no silent-truncation policy).  Cell lookup is
a batched binary search over the sorted int64 voxel keys; candidate
gathering is fully vectorized over (27 x cap) with queries chunked through
lax.map to bound the [chunk, 27, cap, 3] gather footprint.
"""

from functools import partial
from typing import NamedTuple

import jax
import jax.numpy as jnp

_B = jnp.int64(1) << 20  # cells per axis; coords offset to [0, 2^19)
_OFF = 1 << 19

_QUERY_CHUNK = 4096


class HashGrid(NamedTuple):
    """Searchable grid over a reference cloud (capacity = n points)."""

    sorted_pts: jnp.ndarray  # [N, 3] points in key-sorted order
    sorted_valid: jnp.ndarray  # [N] bool
    cell_keys: jnp.ndarray  # [N] int64 key of each cell (pad: max)
    cell_start: jnp.ndarray  # [N] start offset of each cell in sorted order
    cell_count: jnp.ndarray  # [N] member count of each cell
    num_cells: jnp.ndarray  # []
    cell_size: jnp.ndarray  # []
    max_occupancy: jnp.ndarray  # [] for overflow logging


def _keys64(points, mask, cell_size):
    c = jnp.floor(points / cell_size).astype(jnp.int64) + _OFF
    key = (c[:, 0] * _B + c[:, 1]) * _B + c[:, 2]
    return jnp.where(mask, key, jnp.iinfo(jnp.int64).max)


def build_grid(points, mask, cell_size) -> HashGrid:
    n = points.shape[0]
    keys = _keys64(points, mask, cell_size)
    order = jnp.argsort(keys)
    keys_s = keys[order]
    pts_s = points[order]
    valid_s = mask[order]

    new_cell = jnp.concatenate(
        [jnp.ones((1,), jnp.int32), (keys_s[1:] != keys_s[:-1]).astype(jnp.int32)]
    )
    seg_ids = jnp.minimum(jnp.cumsum(new_cell) - 1, n - 1)
    num_cells = jnp.where(jnp.any(valid_s), jnp.max(jnp.where(valid_s, seg_ids, -1)) + 1, 0)

    idx = jnp.arange(n)
    cell_start = jax.ops.segment_min(idx, seg_ids, num_segments=n, indices_are_sorted=True)
    cell_count = jax.ops.segment_sum(
        valid_s.astype(jnp.int32), seg_ids, num_segments=n, indices_are_sorted=True
    )
    cell_keys = jax.ops.segment_min(keys_s, seg_ids, num_segments=n, indices_are_sorted=True)
    return HashGrid(
        sorted_pts=pts_s,
        sorted_valid=valid_s,
        cell_keys=cell_keys,
        cell_start=cell_start,
        cell_count=cell_count,
        num_cells=num_cells,
        cell_size=jnp.asarray(cell_size),
        max_occupancy=jnp.max(jnp.where(jnp.arange(n) < num_cells, cell_count, 0)),
    )


def _neighbor_offsets(dtype=jnp.int64):
    o = jnp.asarray(
        [(dx, dy, dz) for dx in (-1, 0, 1) for dy in (-1, 0, 1) for dz in (-1, 0, 1)],
        dtype=dtype,
    )
    return o  # [27, 3]


def _candidates(grid: HashGrid, q_chunk, cap: int):
    """Candidate neighbor info for one query chunk.

    Returns (idx [C, 27*cap] into sorted_pts, ok [C, 27*cap]).
    """
    n = grid.sorted_pts.shape[0]
    c = jnp.floor(q_chunk / grid.cell_size).astype(jnp.int64) + _OFF  # [C,3]
    off = _neighbor_offsets()  # [27,3]
    cc = c[:, None, :] + off[None, :, :]  # [C,27,3]
    nk = (cc[..., 0] * _B + cc[..., 1]) * _B + cc[..., 2]  # [C,27]
    pos = jnp.searchsorted(grid.cell_keys, nk)  # [C,27]
    pos = jnp.minimum(pos, n - 1)
    hit = grid.cell_keys[pos] == nk
    start = grid.cell_start[pos]  # [C,27]
    count = grid.cell_count[pos]
    j = jnp.arange(cap)  # [cap]
    idx = jnp.minimum(start[..., None] + j, n - 1)  # [C,27,cap]
    ok = hit[..., None] & (j < count[..., None])
    return idx.reshape(idx.shape[0], -1), ok.reshape(ok.shape[0], -1)


def _chunked_query(fn, queries, chunk=_QUERY_CHUNK):
    """Apply fn to query chunks via lax.map (bounds the gather footprint).

    Pads to a multiple of the chunk size; callers mask invalid queries.
    Supports pytree outputs with leading query axis.
    """
    q = queries
    n = q.shape[0]
    if n <= chunk:
        return fn(q)
    n_pad = (-n) % chunk
    q_pad = jnp.pad(q, ((0, n_pad), (0, 0)))
    out = jax.lax.map(fn, q_pad.reshape(-1, chunk, q.shape[1]))
    return jax.tree.map(lambda x: x.reshape(-1, *x.shape[2:])[:n], out)


def min_sq_dist(grid: HashGrid, queries, query_mask, cap: int = 16):
    """Squared distance from each query to its nearest grid point among the
    27 adjacent voxels (exact for radii <= cell_size given sufficient cap).

    Returns [Q] f32, +inf where no candidate / query invalid.
    """

    def one_chunk(qc):
        idx, ok = _candidates(grid, qc, cap)  # [C, M]
        cand = grid.sorted_pts[idx]  # [C, M, 3]
        d2 = jnp.sum((qc[:, None, :] - cand) ** 2, axis=-1)
        d2 = jnp.where(ok, d2, jnp.inf)
        return jnp.min(d2, axis=1)

    best = _chunked_query(one_chunk, queries)
    return jnp.where(query_mask, best, jnp.inf)


def has_neighbor_within(grid: HashGrid, queries, query_mask, radius, cap: int = 16):
    """Boolean [Q]: nearest-neighbor distance <= radius (needs cell_size >=
    radius for exactness)."""
    return min_sq_dist(grid, queries, query_mask, cap=cap) <= radius * radius


def overlap_fraction(ref_pts, ref_mask, query_pts, query_mask, max_dist, cap: int = 16):
    """Fraction of valid query points with a ref neighbor within max_dist
    (getOverlap, DmsaSlam.h:377-414)."""
    grid = build_grid(ref_pts, ref_mask, max_dist)
    near = has_neighbor_within(grid, query_pts, query_mask, max_dist, cap=cap) & query_mask
    denom = jnp.maximum(jnp.sum(query_mask), 1)
    return jnp.sum(near) / denom


def knn_indices(grid: HashGrid, queries, query_mask, k: int, cap: int = 8):
    """Indices (into grid.sorted_pts) of the k nearest grid points per query.

    Candidates come from the 27 adjacent voxels (cap per voxel).  Returns
    (idx [Q, k], dist2 [Q, k], valid [Q, k]).
    """

    def one_chunk(qc):
        idx, ok = _candidates(grid, qc, cap)
        cand = grid.sorted_pts[idx]
        d2 = jnp.sum((qc[:, None, :] - cand) ** 2, axis=-1)
        d2 = jnp.where(ok, d2, jnp.inf)
        neg_d2, sel = jax.lax.top_k(-d2, k)
        out_idx = jnp.take_along_axis(idx, sel, axis=1)
        return out_idx.astype(jnp.int32), -neg_d2

    idx, d2 = _chunked_query(one_chunk, queries)
    valid = jnp.isfinite(d2) & query_mask[:, None]
    return idx, d2, valid
