"""Gaussian cell statistics: per-voxel mean / covariance / information matrix.

TPU-native replacement for the reference's Gaussians container + octree leaf
iteration (reference: include/DMSA/Gaussians.h:87-202,
DmsaOptimizer.h:275-350).  A "cell set" here is a fixed-capacity padded array
of candidate cells (capacity = number of points, the trivially safe bound);
validity is a mask combining the reference's acceptance rules:

  - at least `min_points` members (DmsaOptimizer.h:307),
  - at least two distinct ring ids in the cell (same line),
  - eigenvalue floor 1e-4 on the covariance before inversion
    (Gaussians.h:181-201) — via the closed-form spectral polynomial
    (ops.eig3), no iterative eigensolver,
  - rebalancing weights w_k ∝ obs_weight_k / n_k, normalized to mean 1 over
    valid cells (Gaussians.h:170-179).

Performance shape: binning sorts points by voxel key once per cell build;
the CellSet keeps that permutation so every subsequent residual evaluation
(line search, Jacobian tangents) uses gather + SORTED segment reductions
instead of scatter-adds — the fast path on TPU.
"""

from typing import NamedTuple

import jax
import jax.numpy as jnp

from dmsa_lidar_slam_tpu.ops import voxel

COV_EIG_FLOOR = 1e-4  # Gaussians.h:193


class CellSet(NamedTuple):
    """Padded Gaussian cells over N points (capacity N).

    order       [N]  permutation sorting points by cell (invalid last)
    seg_ids     [N]  cell id per *sorted* point (ascending)
    point_cell  [N]  cell id per original point (sentinel N-1 if masked)
    info        [N, 3, 3]  information matrix per cell (junk where invalid)
    weight      [N]  rebalancing weight per cell (0 where invalid)
    count       [N]  member count per cell
    valid       [N]  cell validity mask
    num_valid   []   number of valid cells
    num_raw     []   number of occupied voxels before acceptance rules
    start       [N]  first sorted index of each cell (N for empty cells)
    mu0         [N, 3]  cell mean at build time (the linearization point)
    info_sorted [N, 3, 3]  information matrix gathered per sorted point
    mu0_sorted  [N, 3]  build-time mean gathered per sorted point
    w_sorted    [N]  point mask in sorted order (as dtype of points)
    """

    order: jnp.ndarray
    seg_ids: jnp.ndarray
    point_cell: jnp.ndarray
    info: jnp.ndarray
    weight: jnp.ndarray
    count: jnp.ndarray
    valid: jnp.ndarray
    num_valid: jnp.ndarray
    num_raw: jnp.ndarray
    start: jnp.ndarray
    mu0: jnp.ndarray
    info_sorted: jnp.ndarray
    mu0_sorted: jnp.ndarray
    w_sorted: jnp.ndarray


def segment_mean_cov(points, point_cell, point_weight, num_segments, indices_are_sorted=False):
    """Two-pass per-segment mean and covariance (numerically safe in f32).

    point_weight [N] is a 0/1 mask weight.  Returns (count [S], mean [S,3],
    cov [S,3,3]) with cov normalized by (n - 1) to match Eigen's sample
    covariance in Gaussians.h:146-147.
    """
    w = point_weight
    count = jax.ops.segment_sum(
        w, point_cell, num_segments=num_segments, indices_are_sorted=indices_are_sorted
    )
    psum = jax.ops.segment_sum(
        points * w[:, None], point_cell, num_segments=num_segments, indices_are_sorted=indices_are_sorted
    )
    safe_n = jnp.maximum(count, 1.0)
    mean = psum / safe_n[:, None]
    centered = (points - mean[point_cell]) * w[:, None]
    outer = centered[:, :, None] * centered[:, None, :]
    m2 = jax.ops.segment_sum(
        outer.reshape(-1, 9), point_cell, num_segments=num_segments, indices_are_sorted=indices_are_sorted
    )
    cov = m2.reshape(-1, 3, 3) / jnp.maximum(count - 1.0, 1.0)[:, None, None]
    return count, mean, cov


def info_from_cov(cov):
    """Eigenvalue-floored inverse covariance (Gaussians.h:181-201), via the
    closed-form spectral polynomial (ops.eig3)."""
    from dmsa_lidar_slam_tpu.ops.eig3 import floored_inverse_sym3

    return floored_inverse_sym3(cov, COV_EIG_FLOOR)


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
    set splitting (Gaussians.h:27-85).
    """
    n = points.shape[0]
    binning = voxel.bin_points(points, mask, grid_size, channel=split_ids)
    order = binning.order
    seg = binning.seg_ids  # sorted ascending

    pts_s = points[order]
    w_s = mask[order].astype(points.dtype)
    rings_s = ring_ids[order]

    count, mean, cov = segment_mean_cov(pts_s, seg, w_s, n, indices_are_sorted=True)

    big = jnp.iinfo(jnp.int32).max
    ring_min = jax.ops.segment_min(
        jnp.where(w_s > 0, rings_s, big), seg, num_segments=n, indices_are_sorted=True
    )
    ring_max = jax.ops.segment_max(
        jnp.where(w_s > 0, rings_s, -big), seg, num_segments=n, indices_are_sorted=True
    )

    valid = (count > 0.5) & (count >= min_points) & (ring_min != ring_max)

    info = info_from_cov(cov)
    # zero invalid cells' info: keeps junk/NaN out of the cumsum path
    info = jnp.where(valid[:, None, None], info, 0.0)

    if obs_weight is None:
        cell_obs = jnp.ones_like(count)
    else:
        obs_sum = jax.ops.segment_sum(
            obs_weight[order] * w_s, seg, num_segments=n, indices_are_sorted=True
        )
        cell_obs = obs_sum / jnp.maximum(count, 1.0)

    # rebalancing: w_k = obs_k / n_k, normalized by mean over valid cells
    raw_w = jnp.where(valid, cell_obs / jnp.maximum(count, 1.0), 0.0)
    num_valid = jnp.sum(valid)
    mean_w = jnp.sum(raw_w) / jnp.maximum(num_valid, 1)
    weight = jnp.where(valid, raw_w / jnp.maximum(mean_w, 1e-30), 0.0)

    idx = jnp.arange(n)
    start = jax.ops.segment_min(idx, seg, num_segments=n, indices_are_sorted=True)
    # empty (padded) cells: segment_min yields INT_MAX-ish; clamp to n so
    # start == end and the cumsum-diff reduces to zero
    start = jnp.minimum(start, n)

    return CellSet(
        order=order,
        seg_ids=seg,
        point_cell=binning.point_cell,
        info=info,
        weight=weight,
        count=count,
        valid=valid,
        num_valid=num_valid,
        num_raw=binning.num_cells,
        start=start,
        mu0=mean,
        info_sorted=info[seg],
        mu0_sorted=mean[seg],
        w_sorted=w_s,
    )


def _run_sums(values, start, count):
    """Per-cell sums of contiguous sorted runs via cumsum-diff.

    values [N, C]; start/count [N] cell run boundaries.  TPU-native
    segmented reduction: one log-depth cumsum + two boundary gathers
    instead of a scatter-add.
    """
    n = values.shape[0]
    csum = jnp.cumsum(values, axis=0)
    zero = jnp.zeros((1, values.shape[-1]), dtype=values.dtype)
    padded = jnp.concatenate([zero, csum], axis=0)  # [N+1, C]
    end = jnp.minimum(start + count.astype(start.dtype), n)
    s = jnp.minimum(start, n)
    return padded[end] - padded[s]


def cell_residuals(points, mask, cells: CellSet):
    """Per-cell DMSA residuals r_k = sqrt(w_k * sum_j d_j^T Info_k d_j).

    Matches DmsaOptimizer::updateErrorTerms (DmsaOptimizer.h:234-273): the
    mean is recomputed from the *current* points while Info and membership
    stay frozen (captured in `cells` at the linearization point).

    Formulated around the frozen build-time mean mu0 for f32 safety and
    speed:  with d0_j = p_j - mu0 and s = mean(d0) over the cell,
        sum_j (p_j - mean)^T L (p_j - mean)
          = sum_j d0^T L d0  -  n * s^T L s.
    Per-point work is one gather + one 3x3 quadratic form; reductions are
    cumsum-diff over the sorted runs.  Invalid cells give 0.  Returns [N].
    """
    pts_s = points[cells.order]
    d0 = (pts_s - cells.mu0_sorted) * cells.w_sorted[:, None]

    quad = jnp.einsum("ni,nij,nj->n", d0, cells.info_sorted, d0)
    stacked = jnp.concatenate([d0, quad[:, None]], axis=1)  # [N, 4]
    sums = _run_sums(stacked, cells.start, cells.count)
    s_mean = sums[:, :3] / jnp.maximum(cells.count, 1.0)[:, None]
    q1 = sums[:, 3]
    corr = cells.count * jnp.einsum("ni,nij,nj->n", s_mean, cells.info, s_mean)
    val = cells.weight * (q1 - corr)
    return jnp.where(cells.valid, jnp.sqrt(jnp.abs(val) + 1e-30), 0.0)
