"""Distributed DMSA: point-sharded Gauss-Newton over a device mesh.

The reference is strictly single-process (SURVEY §2: OpenMP only).  The
TPU-native scaling axis is the point/keyframe dimension: shard the global
points of a problem across a `jax.sharding.Mesh`, build Gaussian cells with
a COLLISION-HASHED table (no global sort, so per-device work stays local),
reduce per-cell statistics and the small Gauss-Newton system with `psum`
over ICI, and solve the (P x P) pose system replicated — the
Schur-complement-style reduction recommended in SURVEY §7.

Differences vs the single-chip path (ops.gaussians):
  - cell identity is a spatial hash mod `table_size` instead of sorted
    unique keys; rare collisions merge distant voxels (probability ~
    n_cells / table_size) — a documented approximation, acceptable because
    merged cells simply contribute a conservative joint covariance;
  - the ring-diversity test uses per-cell ring min/max like the reference.

Used by dryrun_multichip (driver validation) and the multi-host keyframe
adjustment.
"""

from functools import partial
from typing import NamedTuple

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from dmsa_lidar_slam_tpu.ops.gaussians import COV_EIG_FLOOR, info_from_cov

# large primes for the spatial hash
_P1, _P2, _P3 = 73856093, 19349663, 83492791


def hash_cell_ids(points, mask, grid_size, table_size: int):
    """Spatial-hash cell id per point: hash(voxel coords) mod table_size.

    Invalid points map to table_size - 1 (shared junk slot; masked out of
    every reduction by weight 0).
    """
    c = jnp.floor(points / grid_size).astype(jnp.int32)
    h = (c[:, 0] * _P1) ^ (c[:, 1] * _P2) ^ (c[:, 2] * _P3)
    h = jnp.abs(h) % (table_size - 1)
    return jnp.where(mask, h, table_size - 1)


def _partial_first_moments(points, w, cid, rings, table_size):
    """Per-shard first-order partial sums for cell statistics (psum'd)."""
    count = jax.ops.segment_sum(w, cid, num_segments=table_size)
    psum_ = jax.ops.segment_sum(points * w[:, None], cid, num_segments=table_size)
    big = jnp.iinfo(jnp.int32).max
    rmin = jax.ops.segment_min(jnp.where(w > 0, rings, big), cid, num_segments=table_size)
    rmax = jax.ops.segment_max(jnp.where(w > 0, rings, -big), cid, num_segments=table_size)
    return count, psum_, rmin, rmax


class ShardedCells(NamedTuple):
    info: jnp.ndarray  # [T, 3, 3]
    weight: jnp.ndarray  # [T]
    valid: jnp.ndarray  # [T]
    num_valid: jnp.ndarray  # []


def build_cells_sharded(points, mask, rings, grid_size, min_points, table_size, axis_name="data"):
    """Cell statistics with cross-device reduction (call inside shard_map).

    Two-pass: psum first moments -> global means; then psum mean-centered
    second moments.  The extra psum round buys f32 safety — raw moments
    cancel catastrophically (cov ~1e-4 under coordinates ~10 m) and the
    floored inverse amplifies that noise by 1/floor^2.
    """
    w = mask.astype(points.dtype)
    cid = hash_cell_ids(points, mask, grid_size, table_size)
    count, psum_, rmin, rmax = _partial_first_moments(points, w, cid, rings, table_size)
    count = jax.lax.psum(count, axis_name)
    psum_ = jax.lax.psum(psum_, axis_name)
    rmin = jax.lax.pmin(rmin, axis_name)
    rmax = jax.lax.pmax(rmax, axis_name)

    safe_n = jnp.maximum(count, 1.0)
    mean = psum_ / safe_n[:, None]

    centered = (points - mean[cid]) * w[:, None]
    outer = (centered[:, :, None] * centered[:, None, :]).reshape(-1, 9)
    m2 = jax.ops.segment_sum(outer, cid, num_segments=table_size)
    m2 = jax.lax.psum(m2, axis_name)
    cov = m2.reshape(-1, 3, 3) / jnp.maximum(count - 1.0, 1.0)[:, None, None]

    slot = jnp.arange(table_size)
    valid = (count >= min_points) & (rmin != rmax) & (slot < table_size - 1)
    info = info_from_cov(cov)
    raw_w = jnp.where(valid, 1.0 / jnp.maximum(count, 1.0), 0.0)
    num_valid = jnp.sum(valid)
    mean_w = jnp.sum(raw_w) / jnp.maximum(num_valid, 1)
    weight = jnp.where(valid, raw_w / jnp.maximum(mean_w, 1e-30), 0.0)
    return ShardedCells(info=info, weight=weight, valid=valid, num_valid=num_valid), cid


def cell_residuals_sharded(points, mask, cid, cells: ShardedCells, table_size, axis_name="data"):
    """Replicated [T] residual vector from sharded points (inside shard_map)."""
    w = mask.astype(points.dtype)
    count = jax.lax.psum(jax.ops.segment_sum(w, cid, num_segments=table_size), axis_name)
    psum_ = jax.lax.psum(
        jax.ops.segment_sum(points * w[:, None], cid, num_segments=table_size), axis_name
    )
    mean = psum_ / jnp.maximum(count, 1.0)[:, None]
    d = points - mean[cid]
    quad = jnp.einsum("ni,nij,nj->n", d, cells.info[cid], d) * w
    cell_quad = jax.lax.psum(
        jax.ops.segment_sum(quad, cid, num_segments=table_size), axis_name
    )
    val = cells.weight * cell_quad
    return jnp.where(cells.valid, jnp.sqrt(jnp.abs(val) + 1e-30), 0.0)


def sharded_gn_step(
    transform_fn,
    params,
    local_pts,
    mask,
    rings,
    grid_sizes,
    min_points: int,
    table_size: int,
    lambda_diag: float,
    step_length: float,
    max_step: float,
    axis_name: str = "data",
    extra_fn=None,
):
    """One damped GN step with points sharded over `axis_name`.

    transform_fn(params, local_pts) -> global points [n_local, 3]: the
    problem's deskew/compose, differentiable in params (may use
    jax.lax.axis_index(axis_name) to identify its shard).  extra_fn(params)
    -> replicated additional residuals (IMU / gravity / odometry terms).
    Cell build, the residual, and J^T J / J^T r reductions all ride psum;
    the small solve is replicated.  Call inside shard_map (or via
    `make_sharded_step`).
    """

    def residuals(p, cells_and_cids):
        pts = transform_fn(p, local_pts)
        parts = [
            cell_residuals_sharded(pts, mask, cid, cells, table_size, axis_name)
            for cells, cid in cells_and_cids
        ]
        if extra_fn is not None:
            parts.append(extra_fn(p))
        return jnp.concatenate(parts)

    pts0 = transform_fn(params, local_pts)
    cells_and_cids = tuple(
        build_cells_sharded(pts0, mask, rings, g, min_points, table_size, axis_name)
        for g in grid_sizes
    )

    res_fn = lambda p: residuals(p, cells_and_cids)
    e0 = res_fn(params)

    num_params = params.shape[0]
    eye = jnp.eye(num_params, dtype=params.dtype)
    J = jax.vmap(lambda t: jax.jvp(res_fn, (params,), (t,))[1])(eye).T  # [R, P]

    H = J.T @ J + lambda_diag * jnp.eye(num_params, dtype=params.dtype)
    g = J.T @ e0
    step = -step_length * jnp.linalg.solve(H, g)
    max_elem = jnp.max(jnp.abs(step))
    step = jnp.where(max_elem > max_step, (max_step / jnp.maximum(max_elem, 1e-30)) * step, step)

    # line search (vmapped, replicated params; per-candidate psums inside)
    ks = jnp.concatenate(
        [0.1 * jnp.arange(1, 10, dtype=params.dtype), jnp.asarray([0.05, 0.02, 0.01], params.dtype)]
    )
    cand = params[None, :] + ks[:, None] * step[None, :]
    errs = jax.vmap(lambda p: (lambda e: jnp.dot(e, e))(res_fn(p)))(cand)
    all_err = jnp.concatenate([jnp.dot(e0, e0)[None], errs])
    best = jnp.argmin(all_err)
    new_params = jnp.where(best > 0, cand[jnp.maximum(best - 1, 0)], params)
    return new_params, all_err[best], sum(c.num_valid for c, _ in cells_and_cids)


def make_sharded_step(
    mesh: Mesh,
    transform_fn,
    min_points,
    table_size,
    lambda_diag,
    step_length,
    max_step,
    grid_sizes,
    extra_fn=None,
):
    """jit-compiled shard_map wrapper of sharded_gn_step.

    Inputs: params replicated; local_pts/mask/rings sharded on leading axis.
    Returns (new_params, best_error, num_cells) replicated.
    """
    axis = mesh.axis_names[0]

    def step(params, local_pts, mask, rings):
        return sharded_gn_step(
            transform_fn,
            params,
            local_pts,
            mask,
            rings,
            grid_sizes,
            min_points,
            table_size,
            lambda_diag,
            step_length,
            max_step,
            axis_name=axis,
            extra_fn=extra_fn,
        )

    sharded = jax.shard_map(
        step,
        mesh=mesh,
        in_specs=(P(), P(axis), P(axis), P(axis)),
        out_specs=(P(), P(), P()),
        check_vma=False,
    )
    return jax.jit(sharded)
