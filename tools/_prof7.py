"""Verify the Pallas brute-force NN on TPU: correctness vs numpy + speed."""
import time
import numpy as np
import jax
import jax.numpy as jnp

from dmsa_lidar_slam_tpu.map import static_points as sp
from dmsa_lidar_slam_tpu.ops import nn_bruteforce as bf

print("backend:", jax.default_backend())
rng = np.random.default_rng(7)

# correctness
ref = rng.normal(size=(3000, 3)).astype(np.float32) * 5
q = rng.normal(size=(2000, 3)).astype(np.float32) * 5
got = np.asarray(
    bf.min_sq_dist(jnp.asarray(ref), jnp.ones(3000, bool), jnp.asarray(q), jnp.ones(2000, bool))
)
d2 = ((q[:, None, :] - ref[None, :, :]) ** 2).sum(-1).min(1)
err = np.abs(got - d2).max()
print("max |d2 err| vs numpy:", err)
assert err < 1e-3, err

# speed of select_static_points at bench shapes
NW, NS = 20480, 8192
REPS = 20
wpts = jnp.asarray(rng.normal(size=(NW, 3)) * 10, jnp.float32)
wmask = jnp.ones(NW, bool)
kpts = jnp.asarray(rng.normal(size=(3, 4096, 3)) * 10, jnp.float32)
knrm = jnp.asarray(rng.normal(size=(3, 4096, 3)), jnp.float32)
krng = jnp.zeros((3, 4096), jnp.int32)
kmask = jnp.ones((3, 4096), bool)
key = jax.random.PRNGKey(0)


def scalarize(x):
    ls = [l for l in jax.tree_util.tree_leaves(x) if hasattr(l, "dtype")]
    return sum(jnp.sum(l.astype(jnp.float32)) for l in ls)


def looped(wp, wm):
    def body(i, acc):
        out = sp.select_static_points(
            wp, wm, kpts, knrm, krng, kmask, jnp.zeros(3, jnp.float32), 0.2, key, NS
        )
        return acc + scalarize(out) * 1e-30

    return jax.lax.fori_loop(0, REPS, body, jnp.float32(0.0))


f = jax.jit(looped)
float(f(wpts, wmask))
t0 = time.perf_counter()
float(f(wpts, wmask))
print("select_static_points: %.2f ms" % ((time.perf_counter() - t0) / REPS * 1e3))
