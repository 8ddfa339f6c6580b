"""Shared bf16-limb MXU helpers (usable inside and outside Pallas kernels).

The TPU MXU multiplies in bf16; an f32 `dot_general` without explicit
precision lowers to a ~6-pass contraction under this package's global
'highest' matmul default.  Everywhere the kernels need MORE than plain
bf16 rounding but LESS than six passes, they split operands into bf16
limbs (each limb exactly representable) and issue single-pass
DEFAULT-precision contractions:

  - split2: x = hi + lo         (~2^-16 relative per element)
  - split3: x = hi + mid + lo   (~2^-24: full f32)

Two precision-critical invariants every caller relies on (stated ONCE
here instead of at four call sites — r5 review):

  1. A ONE-HOT contraction never sums two table entries, so limb
     splitting reconstructs the gathered f32 values EXACTLY (3 limbs) —
     see onehot-gather users in ops.fused_residuals.
  2. When the OTHER operand is exact in bf16 (0/1 incidence or one-hot
     matrices), the product error comes only from the split operand's
     limb truncation; the f32 accumulator adds no per-pass rounding
     beyond normal f32 summation.
"""

import jax
import jax.numpy as jnp


def split2(x):
    """x (f32) -> (hi, lo) bf16 limbs with x ~= hi + lo (~2^-16 rel)."""
    hi = x.astype(jnp.bfloat16)
    lo = (x - hi.astype(jnp.float32)).astype(jnp.bfloat16)
    return hi, lo


def split3(x):
    """x (f32) -> (hi, mid, lo) bf16 limbs with x ~= hi + mid + lo (~f32)."""
    hi = x.astype(jnp.bfloat16)
    r = x - hi.astype(jnp.float32)
    mid = r.astype(jnp.bfloat16)
    lo = (r - mid.astype(jnp.float32)).astype(jnp.bfloat16)
    return hi, mid, lo


def dot_default(a, b, dims):
    """Single-pass (DEFAULT-precision) dot_general with f32 accumulation —
    the package-wide 'highest' matmul default must never reach a bf16
    kernel contraction."""
    return jax.lax.dot_general(
        a,
        b,
        (dims, ((), ())),
        preferred_element_type=jnp.float32,
        precision=jax.lax.Precision.DEFAULT,
    )
