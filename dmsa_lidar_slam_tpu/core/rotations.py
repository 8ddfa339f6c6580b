"""Rotation primitives on axis-angle vectors, built for batching under jit.

Functional equivalents of the reference's helpers (reference:
include/DMSA/helpers.h:24-65 — slerp / skew / axang2rotm / rotm2axang), but
closed-form (Rodrigues and quaternion-log) instead of Eigen's dense matrix
exp/log, so everything vmaps and differentiates cleanly.

All functions accept arbitrary leading batch dimensions.
"""

import jax.numpy as jnp

# Below this angle the rotation is treated as identity to match the
# reference's EPSILON_ROT guard (helpers.h:18) while staying differentiable.
_EPS = 1e-12


def skew(v):
    """[..., 3] -> [..., 3, 3] skew-symmetric matrix (helpers.h:39)."""
    x, y, z = v[..., 0], v[..., 1], v[..., 2]
    zero = jnp.zeros_like(x)
    return jnp.stack(
        [
            jnp.stack([zero, -z, y], axis=-1),
            jnp.stack([z, zero, -x], axis=-1),
            jnp.stack([-y, x, zero], axis=-1),
        ],
        axis=-2,
    )


def axang2rotm(aa):
    """Axis-angle [..., 3] -> rotation matrix [..., 3, 3] via Rodrigues.

    Equivalent to skew(aa).exp() (helpers.h:51) but closed-form.  Uses the
    series-safe formulation sin(t)/t and (1-cos t)/t^2 so gradients are
    finite at t = 0.
    """
    theta2 = jnp.sum(aa * aa, axis=-1)
    theta = jnp.sqrt(theta2 + _EPS)
    # sin(t)/t and (1 - cos t)/t^2 with small-angle series fallback
    small = theta2 < 1e-12
    a = jnp.where(small, 1.0 - theta2 / 6.0, jnp.sin(theta) / theta)
    b = jnp.where(small, 0.5 - theta2 / 24.0, (1.0 - jnp.cos(theta)) / (theta2 + _EPS))
    K = skew(aa)
    KK = K @ K
    eye = jnp.broadcast_to(jnp.eye(3, dtype=aa.dtype), K.shape)
    return eye + a[..., None, None] * K + b[..., None, None] * KK


def rotm2axang(R):
    """Rotation matrix [..., 3, 3] -> axis-angle [..., 3] (helpers.h:59).

    Uses the quaternion route (stable near pi, exact near 0) rather than a
    dense matrix log.
    """
    q = rotm2quat(R)
    return quat2axang(q)


def axang2quat(aa):
    """Axis-angle [..., 3] -> quaternion [..., 4] (w, x, y, z), unit norm."""
    theta2 = jnp.sum(aa * aa, axis=-1)
    theta = jnp.sqrt(theta2 + _EPS)
    half = 0.5 * theta
    small = theta2 < 1e-12
    # sin(t/2)/t with series fallback
    k = jnp.where(small, 0.5 - theta2 / 48.0, jnp.sin(half) / theta)
    w = jnp.where(small, 1.0 - theta2 / 8.0, jnp.cos(half))
    xyz = aa * k[..., None]
    return jnp.concatenate([w[..., None], xyz], axis=-1)


def quat_rotate(q, v):
    """Rotate vectors v [..., 3] by unit quaternions q [..., 4] (w, x, y, z).

    v' = v + w*t + u x t with u = q.xyz, t = 2 (u x v) — 18 mul + 12 add per
    point, all VPU elementwise; used for the per-point deskew so only a [D,4]
    quaternion table is gathered instead of [D,3,3] rotation matrices
    (9x -> 4x less gather/tangent memory in the optimizer's batched evals).
    """
    w = q[..., :1]
    u = q[..., 1:]
    t = 2.0 * jnp.cross(u, v)
    return v + w * t + jnp.cross(u, t)


def quat_rotate_vjp_q(q, v, g):
    """Cotangent of quat_rotate wrt q: returns [..., 4] = g^T d(quat_rotate)/dq.

    Closed form of the VJP of `quat_rotate(q, v)` (holding v fixed) with
    output cotangent g [..., 3] — the per-point pose-gradient hook of the
    structured Gauss-Newton Jacobian (see dmsa.optimizer).  With
    t = 2 (u x v):

        d/dw = g . t
        d/du = 2 w (v x g) + t x g + 2 v x (g x u)
    """
    w = q[..., :1]
    u = q[..., 1:]
    t = 2.0 * jnp.cross(u, v)
    aw = jnp.sum(g * t, axis=-1, keepdims=True)
    au = 2.0 * w * jnp.cross(v, g) + jnp.cross(t, g) + 2.0 * jnp.cross(v, jnp.cross(g, u))
    return jnp.concatenate([aw, au], axis=-1)


def quat2axang(q):
    """Quaternion [..., 4] (w, x, y, z) -> axis-angle [..., 3]."""
    q = q * jnp.sign(q[..., :1] + _EPS)  # enforce w >= 0 => angle in [0, pi]
    w = jnp.clip(q[..., 0], -1.0, 1.0)
    v = q[..., 1:]
    vnorm = jnp.linalg.norm(v, axis=-1)
    theta = 2.0 * jnp.arctan2(vnorm, w)
    # theta / sin(theta/2) with series fallback
    small = vnorm < 1e-9
    scale = jnp.where(small, 2.0 / jnp.maximum(w, 0.5), theta / jnp.where(small, 1.0, vnorm))
    return v * scale[..., None]


def rotm2quat(R):
    """Rotation matrix [..., 3, 3] -> quaternion [..., 4] (w, x, y, z).

    Branch-free Shepperd-style selection over the four candidate forms,
    safe under vmap/jit.
    """
    m00, m01, m02 = R[..., 0, 0], R[..., 0, 1], R[..., 0, 2]
    m10, m11, m12 = R[..., 1, 0], R[..., 1, 1], R[..., 1, 2]
    m20, m21, m22 = R[..., 2, 0], R[..., 2, 1], R[..., 2, 2]

    tr = m00 + m11 + m22
    # four candidates, each valid when its pivot is the largest
    qw_ = jnp.sqrt(jnp.maximum(1.0 + tr, 0.0)) / 2.0
    qx_ = jnp.sqrt(jnp.maximum(1.0 + m00 - m11 - m22, 0.0)) / 2.0
    qy_ = jnp.sqrt(jnp.maximum(1.0 - m00 + m11 - m22, 0.0)) / 2.0
    qz_ = jnp.sqrt(jnp.maximum(1.0 - m00 - m11 + m22, 0.0)) / 2.0

    c0 = jnp.stack([qw_, (m21 - m12) / (4 * qw_ + _EPS), (m02 - m20) / (4 * qw_ + _EPS), (m10 - m01) / (4 * qw_ + _EPS)], axis=-1)
    c1 = jnp.stack([(m21 - m12) / (4 * qx_ + _EPS), qx_, (m01 + m10) / (4 * qx_ + _EPS), (m02 + m20) / (4 * qx_ + _EPS)], axis=-1)
    c2 = jnp.stack([(m02 - m20) / (4 * qy_ + _EPS), (m01 + m10) / (4 * qy_ + _EPS), qy_, (m12 + m21) / (4 * qy_ + _EPS)], axis=-1)
    c3 = jnp.stack([(m10 - m01) / (4 * qz_ + _EPS), (m02 + m20) / (4 * qz_ + _EPS), (m12 + m21) / (4 * qz_ + _EPS), qz_], axis=-1)

    cand = jnp.stack([c0, c1, c2, c3], axis=-2)  # [..., 4, 4]
    pivots = jnp.stack([qw_, qx_, qy_, qz_], axis=-1)  # [..., 4]
    idx = jnp.argmax(pivots, axis=-1)
    q = jnp.take_along_axis(cand, idx[..., None, None].repeat(4, axis=-1), axis=-2)[..., 0, :]
    q = q / jnp.linalg.norm(q, axis=-1, keepdims=True)
    return q


def quat_mul(q1, q2):
    """Hamilton product of quaternions [..., 4] (w, x, y, z)."""
    w1, x1, y1, z1 = q1[..., 0], q1[..., 1], q1[..., 2], q1[..., 3]
    w2, x2, y2, z2 = q2[..., 0], q2[..., 1], q2[..., 2], q2[..., 3]
    return jnp.stack(
        [
            w1 * w2 - x1 * x2 - y1 * y2 - z1 * z2,
            w1 * x2 + x1 * w2 + y1 * z2 - z1 * y2,
            w1 * y2 - x1 * z2 + y1 * w2 + z1 * x2,
            w1 * z2 + x1 * y2 - y1 * x2 + z1 * w2,
        ],
        axis=-1,
    )


def slerp(aa1, aa2, t):
    """Slerp between two axis-angle rotations (helpers.h:24).

    `t` may broadcast against leading batch dims; t=0 -> aa1, t=1 -> aa2.
    Matches Eigen's Quaternion::slerp (shortest path).
    """
    q1 = axang2quat(aa1)
    q2 = axang2quat(aa2)
    return quat2axang(quat_slerp(q1, q2, t))


def quat_slerp(q1, q2, t):
    """Shortest-path slerp of unit quaternions with lerp fallback when close."""
    t = jnp.asarray(t, dtype=q1.dtype)
    dot = jnp.sum(q1 * q2, axis=-1)
    q2 = jnp.where(dot[..., None] < 0.0, -q2, q2)
    dot = jnp.abs(dot)
    dot = jnp.clip(dot, -1.0, 1.0)
    theta = jnp.arccos(dot)
    sin_theta = jnp.sin(theta)
    close = sin_theta < 1e-6
    w1 = jnp.where(close, 1.0 - t, jnp.sin((1.0 - t) * theta) / jnp.where(close, 1.0, sin_theta))
    w2 = jnp.where(close, t, jnp.sin(t * theta) / jnp.where(close, 1.0, sin_theta))
    q = w1[..., None] * q1 + w2[..., None] * q2
    return q / jnp.linalg.norm(q, axis=-1, keepdims=True)


def rodrigues_between(v_from, v_to):
    """Rotation matrix taking direction v_from to v_to (Rodrigues formula).

    Mirrors the gravity-alignment construction in
    ContinuousTrajectory.h:263-299 (initGravityDir).
    """
    v1 = v_from / jnp.linalg.norm(v_from, axis=-1, keepdims=True)
    v2 = v_to / jnp.linalg.norm(v_to, axis=-1, keepdims=True)
    axis_raw = jnp.cross(v1, v2)
    norm = jnp.linalg.norm(axis_raw, axis=-1, keepdims=True)
    axis = axis_raw / jnp.maximum(norm, _EPS)
    angle = jnp.arccos(jnp.clip(jnp.sum(v1 * v2, axis=-1), -1.0, 1.0))
    K = skew(axis)
    eye = jnp.broadcast_to(jnp.eye(3, dtype=v_from.dtype), K.shape)
    return eye + jnp.sin(angle)[..., None, None] * K + (1.0 - jnp.cos(angle))[..., None, None] * (K @ K)
