import dmsa_lidar_slam_tpu  # enables x64
import functools
import numpy as np
import jax
import jax.numpy as jnp
import jax.experimental.pallas as pl
from jax.experimental.pallas import tpu as pltpu

TQ, TN = 512, 1024
NQ, NR = 2, 3  # tiles


def kernel(refA_ref, qA_ref, qn_ref, out_ref):
    k = pl.program_id(1)

    @pl.when(k == 0)
    def _():
        out_ref[:] = jnp.full_like(out_ref, jnp.inf)

    dot = jax.lax.dot_general(
        refA_ref[:], qA_ref[:], (((0,), (0,)), ((), ())), preferred_element_type=jnp.float32
    )
    d2 = dot + qn_ref[:]
    out_ref[:] = jnp.minimum(out_ref[:], jnp.min(d2, axis=0, keepdims=True))


refA = jnp.asarray(np.random.randn(4, NR * TN), jnp.float32)
qA = jnp.asarray(np.random.randn(4, NQ * TQ), jnp.float32)
qn = jnp.asarray(np.random.randn(1, NQ * TQ), jnp.float32)

out = pl.pallas_call(
    kernel,
    grid=(NQ, NR),
    in_specs=[
        pl.BlockSpec((4, TN), lambda j, k: (0, k), memory_space=pltpu.VMEM),
        pl.BlockSpec((4, TQ), lambda j, k: (0, j), memory_space=pltpu.VMEM),
        pl.BlockSpec((1, TQ), lambda j, k: (0, j), memory_space=pltpu.VMEM),
    ],
    out_specs=pl.BlockSpec((1, TQ), lambda j, k: (0, j), memory_space=pltpu.VMEM),
    out_shape=jax.ShapeDtypeStruct((1, NQ * TQ), jnp.float32),
)(refA, qA, qn)
ref = np.asarray(refA)
q = np.asarray(qA)
want = (ref.T @ q).min(axis=0) + np.asarray(qn)[0] * 0  # not exact math, just run check
print("ran ok", np.asarray(out).shape)
