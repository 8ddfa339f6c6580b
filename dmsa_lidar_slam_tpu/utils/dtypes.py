"""Dtype policy.

The reference keeps poses / IMU state in double precision and point
coordinates in single precision (reference: include/DMSA/Poses.h,
ImuPreintegration.h use Eigen doubles; PointStampId.h stores float xyz).

On TPU, float64 is emulated and slow, so the pose dtype is selectable:
float64 on CPU (tests, golden validation), float32 on TPU by default.
Pose state is tiny (a handful of control poses), so the numerical loss of
f32 only matters through long compose chains; the pipeline re-anchors the
window at keyframes which bounds the chain length.
"""

import os
from functools import lru_cache

import jax
import jax.numpy as jnp


@lru_cache(maxsize=None)
def _backend() -> str:
    try:
        return jax.default_backend()
    except Exception:  # pragma: no cover - backend probing should not fail
        return "cpu"


def pose_dtype():
    """Dtype for pose / IMU / trajectory math."""
    force = os.environ.get("DMSA_POSE_DTYPE", "")
    if force in ("float32", "f32"):
        return jnp.float32
    if force in ("float64", "f64"):
        return jnp.float64
    if not jax.config.jax_enable_x64:
        return jnp.float32
    if _backend() == "cpu":
        return jnp.float64
    return jnp.float32


def point_dtype():
    """Dtype for point-cloud coordinates."""
    return jnp.float32
