"""Pose containers and relative<->global chain conversion.

Functional equivalent of the reference's Poses / ConsecutivePoses
(reference: include/DMSA/Poses.h, ConsecutivePoses.h).  Poses are SoA
arrays: orientations [N, 3] axis-angle and translations [N, 3].  The
parameter vector excludes pose 0 — the gauge anchor — exactly like
Poses::getParamsAsVector (Poses.h:64-76): params = [orients[1:].ravel(),
transls[1:].ravel()], length 6 (N - 1).

relative2global is a sequential compose (ConsecutivePoses.h:26-43)
implemented as a lax.scan over quaternions; global2relative
(ConsecutivePoses.h:45-67) is element-wise over consecutive pairs and fully
vectorized.
"""

from typing import NamedTuple

import jax
import jax.numpy as jnp

from dmsa_lidar_slam_tpu.core import rotations as rot


class PoseChain(NamedTuple):
    """Relative pose chain; entry 0 is the absolute pose of the first node."""

    orient: jnp.ndarray  # [N, 3] axis-angle, pose k relative to pose k-1
    transl: jnp.ndarray  # [N, 3], translation k expressed in frame k-1

    @property
    def n(self) -> int:
        return self.orient.shape[0]


class GlobalPoses(NamedTuple):
    orient: jnp.ndarray  # [N, 3] axis-angle world <- body_k
    transl: jnp.ndarray  # [N, 3] world position of body_k


def relative2global(chain: PoseChain) -> GlobalPoses:
    """Sequential compose of the relative chain (ConsecutivePoses.h:26-43).

    T_w_k = T_w_{k-1} * T_{k-1}_k with T_w_0 = (R(aa_0), t_0), expressed as
    a log-depth associative scan over SE(3) composition — O(log N) batched
    quaternion ops instead of an N-step while loop on device (the chain is
    on the hot path of every optimizer residual evaluation).
    """
    q_glob, t_glob = compose_prefix(rot.axang2quat(chain.orient), chain.transl)
    return GlobalPoses(orient=rot.quat2axang(q_glob), transl=t_glob)


def compose_prefix(q_rel, t_rel):
    """Prefix SE(3) compositions of relative (quat [N,4], transl [N,3]).

    combine((q1,t1),(q2,t2)) = (q1*q2, t1 + R(q1) t2) is associative, so
    lax.associative_scan evaluates all prefixes in log2(N) batched rounds.
    Quaternions are renormalized once at the end (the reference normalizes
    per step; at chain lengths <= a few hundred the drift is ~ulp-level).
    """

    def combine(a, b):
        qa, ta = a
        qb, tb = b
        return rot.quat_mul(qa, qb), ta + rot.quat_rotate(qa, tb)

    q_glob, t_glob = jax.lax.associative_scan(combine, (q_rel, t_rel), axis=0)
    q_glob = q_glob / jnp.linalg.norm(q_glob, axis=-1, keepdims=True)
    return q_glob, t_glob


def global2relative(gp: GlobalPoses) -> PoseChain:
    """Vectorized inverse of relative2global (ConsecutivePoses.h:45-67)."""
    R = rot.axang2rotm(gp.orient)  # [N, 3, 3]
    R_prev = R[:-1]
    t_prev = gp.transl[:-1]
    R_curr = R[1:]
    t_curr = gp.transl[1:]
    rel_R = jnp.einsum("nji,njk->nik", R_prev, R_curr)  # R_prev^T @ R_curr
    rel_t = jnp.einsum("nji,nj->ni", R_prev, t_curr - t_prev)
    rel_orient = jnp.concatenate([gp.orient[:1], rot.rotm2axang(rel_R)], axis=0)
    rel_transl = jnp.concatenate([gp.transl[:1], rel_t], axis=0)
    return PoseChain(orient=rel_orient, transl=rel_transl)


def _rotate(q, v):
    """Rotate vector(s) v by unit quaternion q."""
    qv = jnp.concatenate([jnp.zeros_like(v[..., :1]), v], axis=-1)
    q_conj = q * jnp.array([1.0, -1.0, -1.0, -1.0], dtype=q.dtype)
    return rot.quat_mul(rot.quat_mul(q, qv), q_conj)[..., 1:]


def params_from_chain(chain: PoseChain) -> jnp.ndarray:
    """Pack chain into optimizer params, excluding pose 0 (Poses.h:64-70).

    Eigen's column-major reshape of the 3x(N-1) block stacks pose vectors
    consecutively: [o1, o2, ..., t1, t2, ...].
    """
    return jnp.concatenate([chain.orient[1:].ravel(), chain.transl[1:].ravel()])


def chain_from_params(params: jnp.ndarray, anchor: PoseChain) -> PoseChain:
    """Unpack optimizer params; pose 0 comes from `anchor` (Poses.h:72-76)."""
    n = anchor.n
    m = 3 * (n - 1)
    orient_rest = params[:m].reshape(n - 1, 3)
    transl_rest = params[m : 2 * m].reshape(n - 1, 3)
    return PoseChain(
        orient=jnp.concatenate([anchor.orient[:1], orient_rest], axis=0),
        transl=jnp.concatenate([anchor.transl[:1], transl_rest], axis=0),
    )


def transform_points(orient_aa, transl, points):
    """Batched rigid transform: R(orient) @ p + t.

    orient_aa [..., 3], transl [..., 3], points [..., 3] (broadcastable).
    """
    R = rot.axang2rotm(orient_aa)
    return jnp.einsum("...ij,...j->...i", R, points) + transl
