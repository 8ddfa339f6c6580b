"""Gaussian cell statistics: per-voxel mean / covariance / information matrix.

TPU-native replacement for the reference's Gaussians container + octree leaf
iteration (reference: include/DMSA/Gaussians.h:87-202,
DmsaOptimizer.h:275-350).  A "cell set" here is a fixed-capacity padded array
of candidate cells (capacity = number of points, the trivially safe bound);
validity is a mask combining the reference's acceptance rules:

  - at least `min_points` members (DmsaOptimizer.h:307),
  - at least two distinct ring ids in the cell (same line),
  - eigenvalue floor 1e-4 on the covariance before inversion
    (Gaussians.h:181-201),
  - rebalancing weights w_k ∝ obs_weight_k / n_k, normalized to mean 1 over
    valid cells (Gaussians.h:170-179).

All reductions are segment_sums over the voxel binning from ops.voxel.
"""

from typing import NamedTuple

import jax
import jax.numpy as jnp

from dmsa_lidar_slam_tpu.ops import voxel

COV_EIG_FLOOR = 1e-4  # Gaussians.h:193


class CellSet(NamedTuple):
    """Padded Gaussian cells over N points (capacity N).

    point_cell  [N]  cell id per original point (sentinel N-1 if masked out)
    info        [N, 3, 3]  information matrix per cell (junk where invalid)
    weight      [N]  rebalancing weight per cell (0 where invalid)
    count       [N]  member count per cell
    valid       [N]  cell validity mask
    num_valid   []   number of valid cells
    num_raw     []   number of occupied voxels before acceptance rules
    """

    point_cell: jnp.ndarray
    info: jnp.ndarray
    weight: jnp.ndarray
    count: jnp.ndarray
    valid: jnp.ndarray
    num_valid: jnp.ndarray
    num_raw: jnp.ndarray


def segment_mean_cov(points, point_cell, point_weight, num_segments):
    """Two-pass per-segment mean and covariance (numerically safe in f32).

    point_weight [N] is a 0/1 mask weight.  Returns (count [S], mean [S,3],
    cov [S,3,3]) with cov normalized by (n - 1) to match Eigen's sample
    covariance in Gaussians.h:146-147.
    """
    w = point_weight
    count = jax.ops.segment_sum(w, point_cell, num_segments=num_segments)
    psum = jax.ops.segment_sum(points * w[:, None], point_cell, num_segments=num_segments)
    safe_n = jnp.maximum(count, 1.0)
    mean = psum / safe_n[:, None]
    centered = (points - mean[point_cell]) * w[:, None]
    outer = centered[:, :, None] * centered[:, None, :]
    m2 = jax.ops.segment_sum(outer.reshape(-1, 9), point_cell, num_segments=num_segments)
    cov = m2.reshape(-1, 3, 3) / jnp.maximum(count - 1.0, 1.0)[:, None, None]
    return count, mean, cov


def info_from_cov(cov):
    """Eigenvalue-floored inverse covariance (Gaussians.h:181-201).

    cov [S, 3, 3] symmetric -> info [S, 3, 3] = V diag(1/max(l, floor)) V^T.
    """
    w, v = jnp.linalg.eigh(cov)
    w = jnp.maximum(w, COV_EIG_FLOOR)
    return jnp.einsum("sij,sj,skj->sik", v, 1.0 / w, v)


def build_cells(
    points,
    mask,
    ring_ids,
    grid_size,
    min_points: int,
    obs_weight=None,
    split_ids=None,
) -> CellSet:
    """Bin points and compute accepted Gaussian cells at one resolution.

    points [N, 3] f32, mask [N] bool, ring_ids [N] int32 (the per-point id
    used for the ring-diversity test; DmsaOptimizer.h:304-307), obs_weight
    optional [N] per-point observation weight whose per-cell mean feeds the
    rebalancing weight (getWeightOfPointSet; OptimizablePointSet.h:52).
    split_ids optional [N] small ints subdividing voxels by surface
    orientation — the TPU-shaped analogue of the reference's normal-based
    set splitting (Gaussians.h:27-85): instead of the O(n^2) most-opposed
    normal pair search per octree leaf, points carry a normal-direction
    bucket and cells split along bucket boundaries.
    """
    n = points.shape[0]
    binning = voxel.bin_points(points, mask, grid_size, channel=split_ids)
    pc = binning.point_cell
    w = mask.astype(points.dtype)

    count, mean, cov = segment_mean_cov(points, pc, w, n)

    ring_f = jnp.where(mask, ring_ids, 0)
    big = jnp.iinfo(jnp.int32).max
    ring_min = jax.ops.segment_min(jnp.where(mask, ring_f, big), pc, num_segments=n)
    ring_max = jax.ops.segment_max(jnp.where(mask, ring_f, -big), pc, num_segments=n)

    cell_has_pts = count > 0.5
    valid = cell_has_pts & (count >= min_points) & (ring_min != ring_max)
    # points assigned to sentinel cell n-1 must not validate it spuriously:
    # the sentinel only collects masked points, which have zero weight, so
    # count==0 there already excludes it unless real points share id n-1.

    info = info_from_cov(cov)

    if obs_weight is None:
        cell_obs = jnp.ones_like(count)
    else:
        obs_sum = jax.ops.segment_sum(obs_weight * w, pc, num_segments=n)
        cell_obs = obs_sum / jnp.maximum(count, 1.0)

    # rebalancing: w_k = obs_k / n_k, normalized by mean over valid cells
    raw_w = jnp.where(valid, cell_obs / jnp.maximum(count, 1.0), 0.0)
    num_valid = jnp.sum(valid)
    mean_w = jnp.sum(raw_w) / jnp.maximum(num_valid, 1)
    weight = jnp.where(valid, raw_w / jnp.maximum(mean_w, 1e-30), 0.0)

    return CellSet(
        point_cell=pc,
        info=info,
        weight=weight,
        count=count,
        valid=valid,
        num_valid=num_valid,
        num_raw=binning.num_cells,
    )


def cell_residuals(points, mask, cells: CellSet):
    """Per-cell DMSA residuals r_k = sqrt(w_k * sum_j d_j^T Info_k d_j).

    Matches DmsaOptimizer::updateErrorTerms (DmsaOptimizer.h:234-273): the
    mean is recomputed from the *current* points while Info and membership
    stay frozen (they are captured in `cells` at the linearization point).
    Invalid cells produce residual 0.  Returns [N] (padded capacity).
    """
    n = points.shape[0]
    w = mask.astype(points.dtype)
    pc = cells.point_cell
    count = jax.ops.segment_sum(w, pc, num_segments=n)
    psum = jax.ops.segment_sum(points * w[:, None], pc, num_segments=n)
    mean = psum / jnp.maximum(count, 1.0)[:, None]

    d = points - mean[pc]
    info_p = cells.info[pc]  # [N, 3, 3]
    quad = jnp.einsum("ni,nij,nj->n", d, info_p, d) * w
    cell_quad = jax.ops.segment_sum(quad, pc, num_segments=n)
    val = cells.weight * cell_quad
    return jnp.where(cells.valid, jnp.sqrt(jnp.abs(val) + 1e-30), 0.0)
