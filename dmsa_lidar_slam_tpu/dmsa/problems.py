"""Simple problem adapters for the generic DMSA optimizer.

The production problems live in trajectory.continuous (sliding window) and
map.keyframes (keyframe map).  This module provides the minimal rigid
multi-scan alignment problem — BASELINE config 1's "two-scan DMSA
alignment" — where each scan k has one rigid pose (a consecutive relative
chain, pose 0 anchored), no deskew, no extra residuals.
"""

import dataclasses
from functools import lru_cache
from typing import NamedTuple

import jax.numpy as jnp

from dmsa_lidar_slam_tpu.core import poses as cp
from dmsa_lidar_slam_tpu.core import rotations as rot
from dmsa_lidar_slam_tpu.dmsa.optimizer import ForwardOut


@dataclasses.dataclass(frozen=True)
class ScanAlignShapes:
    n_scans: int
    n_pts: int  # per-scan capacity


class ScanAlignData(NamedTuple):
    local_pts: jnp.ndarray  # [S, N, 3] f32, scan-local frames
    mask: jnp.ndarray  # [S, N] bool
    ring: jnp.ndarray  # [S, N] i32
    anchor_orient: jnp.ndarray  # [3]
    anchor_transl: jnp.ndarray  # [3]


@lru_cache(maxsize=None)
def make_forward(shapes: ScanAlignShapes):
    def forward(params, data: ScanAlignData) -> ForwardOut:
        anchor = cp.PoseChain(
            orient=jnp.concatenate(
                [data.anchor_orient[None], jnp.zeros((shapes.n_scans - 1, 3), data.anchor_orient.dtype)]
            ),
            transl=jnp.concatenate(
                [data.anchor_transl[None], jnp.zeros((shapes.n_scans - 1, 3), data.anchor_transl.dtype)]
            ),
        )
        chain = cp.chain_from_params(params, anchor)
        gp = cp.relative2global(chain)
        R = rot.axang2rotm(gp.orient).astype(jnp.float32)
        t = gp.transl.astype(jnp.float32)
        pts_w = jnp.einsum("sij,snj->sni", R, data.local_pts) + t[:, None, :]
        return ForwardOut(
            points=pts_w.reshape(-1, 3),
            mask=data.mask.reshape(-1),
            ring_ids=data.ring.reshape(-1),
            obs_weight=None,
            extra=jnp.zeros((0,), dtype=params.dtype),
        )

    return forward
