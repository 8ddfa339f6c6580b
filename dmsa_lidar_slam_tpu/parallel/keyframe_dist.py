"""Distributed keyframe-map adjustment: keyframes sharded over the mesh.

The multi-host scaling axis (SURVEY §5, BASELINE config 5): the keyframe
ring buffer is partitioned across devices/hosts along time; each shard
transforms only its keyframes' clouds, Gaussian-cell statistics and the
Gauss-Newton normal equations reduce over `psum` (ICI), and the small pose
chain solve is replicated — a Schur-complement-style reduction where the
per-cell blocks are eliminated locally.

The gravity error terms (reference: include/DMSA/MapManagement.h:210-232)
and odometry priors (MapManagement.h:234-252) are tiny and replicated (an
`extra_fn` over the replicated KfAux); the per-point work (the scaling
term) is fully sharded.

Everything problem-specific rides through a replicated `KfAux` pytree, so
one compiled optimization step (make_keyframe_dist_optimize) serves every
submap instance of the same map shapes — the production path used by
pipeline.slam when `Config.distributed_keyframe_opt` is set.
"""

from functools import lru_cache
from typing import NamedTuple, Optional

import numpy as np

import jax
import jax.numpy as jnp
from jax.sharding import Mesh

from dmsa_lidar_slam_tpu.core import poses as cp
from dmsa_lidar_slam_tpu.core import rotations as rot
from dmsa_lidar_slam_tpu.map import keyframes as kfm
from dmsa_lidar_slam_tpu.parallel import sharded
from dmsa_lidar_slam_tpu.utils.dtypes import pose_dtype


class KfAux(NamedTuple):
    """Replicated per-problem data for the distributed keyframe adjustment.

    Field names match KeyframeMapData so kfm.gravity_residuals /
    kfm.odometry_residuals / kfm.global_chain accept it unchanged
    (duck-typed: they only read these fields)."""

    anchor_orient: jnp.ndarray  # [3]
    anchor_transl: jnp.ndarray  # [3]
    kf_mask: jnp.ndarray  # [K] bool
    grav_meas: jnp.ndarray  # [K, 3]
    grav_plausible: jnp.ndarray  # [K] bool
    odom_rel_transl: jnp.ndarray  # [K, 3]
    odom_rel_orient: jnp.ndarray  # [K, 3]
    gravity: jnp.ndarray  # [3]
    cov_grav_inv: jnp.ndarray  # [3, 3]
    odom_transl_cov_inv: jnp.ndarray  # [3, 3]
    odom_orient_cov_inv: jnp.ndarray  # [3, 3]
    balancing_grav: jnp.ndarray  # []
    balancing_odom: jnp.ndarray  # []


def aux_from_data(data: kfm.KeyframeMapData) -> KfAux:
    """Extract the replicated aux from full problem data (the big point
    arrays are sharded separately)."""
    return KfAux(
        anchor_orient=data.anchor_orient,
        anchor_transl=data.anchor_transl,
        kf_mask=data.kf_mask,
        grav_meas=data.grav_meas,
        grav_plausible=data.grav_plausible,
        odom_rel_transl=data.odom_rel_transl,
        odom_rel_orient=data.odom_rel_orient,
        gravity=data.gravity,
        cov_grav_inv=data.cov_grav_inv,
        odom_transl_cov_inv=data.odom_transl_cov_inv,
        odom_orient_cov_inv=data.odom_orient_cov_inv,
        balancing_grav=data.balancing_grav,
        balancing_odom=data.balancing_odom,
    )


def make_transform(n_keyframes: int, n_pts_per_kf: int, axis: str):
    """Sharded keyframe-cloud transform: each shard recovers which keyframes
    it owns from axis_index, composes the replicated global chain, and
    transforms only its own points.  Requires (K * P) divisible by the mesh
    size (whole or fractional keyframes per shard both work)."""

    def transform(params, local_pts, aux: KfAux):
        chain, gp = kfm.global_chain(
            params, aux, kfm.MapShapes(n_keyframes, n_pts_per_kf)
        )
        R = rot.axang2rotm(gp.orient).astype(jnp.float32)  # [K,3,3]
        t = gp.transl.astype(jnp.float32)
        m = local_pts.shape[0]
        shard = jax.lax.axis_index(axis)
        g0 = shard * m  # global index of this shard's first point
        gidx = g0 + jax.lax.broadcasted_iota(jnp.int32, (m, 1), 0).squeeze(-1)
        kf_id = gidx // n_pts_per_kf
        return jnp.einsum("nij,nj->ni", R[kf_id], local_pts) + t[kf_id]

    return transform


def make_extra_fn(n_keyframes: int, use_gravity: bool, use_odometry: bool):
    """Replicated gravity + odometry residuals from KfAux
    (MapManagement.h:210-252), or None when both terms are off."""
    if not (use_gravity or use_odometry):
        return None
    shapes = kfm.MapShapes(n_keyframes, 1)  # n_pts_per_kf unused by the chain

    def extra(params, aux: KfAux):
        chain, gp = kfm.global_chain(params, aux, shapes)
        parts = []
        if use_gravity:
            parts.append(kfm.gravity_residuals(gp, aux))
        if use_odometry:
            parts.append(kfm.odometry_residuals(chain, aux))
        return jnp.concatenate(parts)

    return extra


def make_keyframe_dist_step(
    mesh: Mesh,
    n_keyframes: int,
    n_pts_per_kf: int,
    min_points: int = 6,
    table_size: int = 32768,
    lambda_diag: float = 1e-5,
    step_length: float = 0.2,
    max_step: float = 0.01,
    grid_factors=(2.0, 5.0),
    min_grid: float = 0.2,
    use_gravity: bool = False,
    use_odometry: bool = False,
):
    """Build the jitted one-GN-step function for a keyframe map.

    Call as step(params, flat_pts, flat_mask, flat_rings, aux) with params
    [6 (K-1)] replicated, points [K * P, 3] / mask / rings sharded on the
    leading axis, aux = aux_from_data(data) replicated.
    """
    axis = mesh.axis_names[0]
    n_total = n_keyframes * n_pts_per_kf
    assert n_total % mesh.devices.size == 0, "points must shard evenly"
    grid_sizes = tuple(f * min_grid for f in grid_factors)
    return sharded.make_sharded_step(
        mesh,
        make_transform(n_keyframes, n_pts_per_kf, axis),
        min_points=min_points,
        table_size=table_size,
        lambda_diag=lambda_diag,
        step_length=step_length,
        max_step=max_step,
        grid_sizes=grid_sizes,
        extra_fn=make_extra_fn(n_keyframes, use_gravity, use_odometry),
    )


@lru_cache(maxsize=8)
def _cached_optimize(
    mesh_key,
    n_keyframes,
    n_pts_per_kf,
    num_iter,
    min_points,
    table_size,
    lambda_diag,
    step_length,
    max_step,
    epsilon,
    use_gravity,
    use_odometry,
    grid_factors,
    jit,
):
    mesh = _MESH_REGISTRY[mesh_key]
    axis = mesh.axis_names[0]
    return sharded.make_sharded_optimize(
        mesh,
        make_transform(n_keyframes, n_pts_per_kf, axis),
        num_iter=num_iter,
        min_points=min_points,
        table_size=table_size,
        lambda_diag=lambda_diag,
        step_length=step_length,
        max_step=max_step,
        epsilon=epsilon,
        extra_fn=make_extra_fn(n_keyframes, use_gravity, use_odometry),
        n_grids=len(grid_factors),
        jit=jit,
    )


_MESH_REGISTRY = {}


def make_keyframe_dist_optimize(
    mesh: Mesh,
    shapes: kfm.MapShapes,
    num_iter: int = 10,
    min_points: int = 6,
    table_size: int = 32768,
    lambda_diag: float = 1e-5,
    step_length: float = 0.2,
    max_step: float = 0.01,
    epsilon: float = 1e-5,
    use_gravity: bool = False,
    use_odometry: bool = False,
    grid_factors=(2.0, 5.0),
    jit: bool = True,
):
    """The once-built full distributed keyframe adjustment (cached per mesh
    and shapes — the production entry used by pipeline.slam).

    Returns opt(params0, flat_pts, flat_mask, flat_rings, aux, grid_sizes)
    -> (params, num_iters, final_error, num_cells); grid_sizes is a traced
    [len(grid_factors)] vector (pass min_grid * grid_factors per call).
    jit=False returns the raw shard_map callable for composition inside a
    larger jit (the fused pipeline's submap branch)."""
    mesh_key = (tuple(d.id for d in mesh.devices.flat), mesh.axis_names)
    _MESH_REGISTRY[mesh_key] = mesh
    n_total = shapes.n_keyframes * shapes.n_pts_per_kf
    assert n_total % mesh.devices.size == 0, "points must shard evenly"
    return _cached_optimize(
        mesh_key,
        shapes.n_keyframes,
        shapes.n_pts_per_kf,
        num_iter,
        min_points,
        table_size,
        lambda_diag,
        step_length,
        max_step,
        epsilon,
        use_gravity,
        use_odometry,
        tuple(grid_factors),
        jit,
    )


def flatten_problem(data: kfm.KeyframeMapData):
    """(flat_pts [K*P,3], flat_mask, flat_rings, aux) from problem data."""
    flat_pts = data.local_pts.reshape(-1, 3)
    flat_mask = (data.pt_mask & data.kf_mask[:, None]).reshape(-1)
    flat_rings = data.pt_ring.reshape(-1)
    return flat_pts, flat_mask, flat_rings, aux_from_data(data)


def distributed_keyframe_optimize(
    mesh: Mesh,
    data: kfm.KeyframeMapData,
    shapes: kfm.MapShapes,
    params0,
    num_iter: int = 10,
    min_grid: float = 0.2,
    grid_factors=(2.0, 5.0),
    use_gravity: bool = False,
    use_odometry: bool = False,
    **step_kwargs,
):
    """Run the distributed keyframe adjustment over `data` (convenience
    wrapper: builds/reuses the cached jitted loop, one dispatch total)."""
    opt_fn = make_keyframe_dist_optimize(
        mesh,
        shapes,
        num_iter=num_iter,
        use_gravity=use_gravity,
        use_odometry=use_odometry,
        grid_factors=grid_factors,
        **step_kwargs,
    )
    flat_pts, flat_mask, flat_rings, aux = flatten_problem(data)
    grids = jnp.asarray([f * min_grid for f in grid_factors], dtype=params0.dtype)
    params, iters, err, ncells = opt_fn(params0, flat_pts, flat_mask, flat_rings, aux, grids)
    return params, err
