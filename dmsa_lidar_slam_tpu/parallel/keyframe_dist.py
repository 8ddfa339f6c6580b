"""Distributed keyframe-map adjustment: keyframes sharded over the mesh.

The multi-host scaling axis (SURVEY §5, BASELINE config 5): the keyframe
ring buffer is partitioned across devices/hosts along time; each shard
transforms only its keyframes' clouds, Gaussian-cell statistics and the
Gauss-Newton normal equations reduce over `psum` (ICI), and the small pose
chain solve is replicated — a Schur-complement-style reduction where the
per-cell blocks are eliminated locally.

Keyframe pose chain, gravity / odometry residuals are tiny and replicated;
the per-point work (the scaling term) is fully sharded.
"""

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


def make_keyframe_dist_step(
    mesh: Mesh,
    n_keyframes: int,
    n_pts_per_kf: int,
    anchor_orient,
    anchor_transl,
    min_points: int = 6,
    table_size: int = 8192,
    lambda_diag: float = 1e-5,
    step_length: float = 0.2,
    max_step: float = 0.01,
    grid_factors=(2.0, 5.0),
    min_grid: float = 0.2,
    extra_fn=None,
):
    """Build the jitted distributed GN step for a keyframe map.

    Inputs at call time: params [6 (K-1)] replicated; flat local points
    [K * P, 3] / mask / rings sharded on the leading axis (whole keyframes
    per shard: K must be divisible by the mesh size).

    transform: each shard recovers which keyframes it owns from
    axis_index, composes the replicated global chain, and transforms only
    its own points.
    """
    axis = mesh.axis_names[0]
    n_dev = mesh.devices.size
    assert n_keyframes % n_dev == 0, "keyframes must shard evenly"
    kf_per_dev = n_keyframes // n_dev
    pdt = pose_dtype()
    a_o = jnp.asarray(anchor_orient, dtype=pdt)
    a_t = jnp.asarray(anchor_transl, dtype=pdt)

    anchor = cp.PoseChain(
        orient=jnp.concatenate([a_o[None], jnp.zeros((n_keyframes - 1, 3), pdt)]),
        transl=jnp.concatenate([a_t[None], jnp.zeros((n_keyframes - 1, 3), pdt)]),
    )

    def transform(params, local_pts):
        chain = cp.chain_from_params(params, anchor)
        gp = cp.relative2global(chain)
        R = rot.axang2rotm(gp.orient).astype(jnp.float32)  # [K,3,3]
        t = gp.transl.astype(jnp.float32)
        shard = jax.lax.axis_index(axis)
        kf0 = shard * kf_per_dev
        m = local_pts.shape[0]
        local_kf = jax.lax.broadcasted_iota(jnp.int32, (m, 1), 0).squeeze(-1) // n_pts_per_kf
        kf_id = kf0 + local_kf
        return jnp.einsum("nij,nj->ni", R[kf_id], local_pts) + t[kf_id]

    grid_sizes = tuple(f * min_grid for f in grid_factors)
    return sharded.make_sharded_step(
        mesh,
        transform,
        min_points=min_points,
        table_size=table_size,
        lambda_diag=lambda_diag,
        step_length=step_length,
        max_step=max_step,
        grid_sizes=grid_sizes,
        extra_fn=extra_fn,
    )


def distributed_keyframe_optimize(
    mesh: Mesh,
    data: kfm.KeyframeMapData,
    shapes: kfm.MapShapes,
    params0,
    num_iter: int = 10,
    **step_kwargs,
):
    """Run `num_iter` distributed GN steps over the keyframe map data.

    Convenience wrapper used by tests and the multi-host runner; for
    production the step function should be built once and reused.
    """
    step_fn = make_keyframe_dist_step(
        mesh,
        shapes.n_keyframes,
        shapes.n_pts_per_kf,
        np.asarray(data.anchor_orient),
        np.asarray(data.anchor_transl),
        **step_kwargs,
    )
    flat_pts = data.local_pts.reshape(-1, 3)
    flat_mask = (data.pt_mask & data.kf_mask[:, None]).reshape(-1)
    flat_rings = data.pt_ring.reshape(-1)
    params = params0
    err = None
    for _ in range(num_iter):
        params, err, ncells = step_fn(params, flat_pts, flat_mask, flat_rings)
    return params, err
