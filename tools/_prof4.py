"""Time the non-optimizer stages of the fused step at bench shapes."""
import time
import numpy as np
import jax
import jax.numpy as jnp

from dmsa_lidar_slam_tpu.map import normals as nrm
from dmsa_lidar_slam_tpu.map import static_points as sp
from dmsa_lidar_slam_tpu.pipeline import preprocess as pp

RT = None  # measured round-trip to subtract


def timeit(f, *a, n=5, label="", fetch_small=True):
    r = f(*a)
    jax.tree_util.tree_map(lambda x: np.asarray(x) if hasattr(x, 'shape') and np.prod(x.shape) < 100 else None, r)
    # sync via tiny fetch: reduce all leaves to a scalar through another jit
    def sync(r):
        leaves = [x for x in jax.tree_util.tree_leaves(r) if hasattr(x, "dtype")]
        s = _sum_all(*leaves)
        return float(s)
    _sum_all = jax.jit(lambda *ls: sum(jnp.sum(jnp.asarray(l, jnp.float32)) if l.dtype != jnp.bool_ else jnp.sum(l) for l in ls))
    sync(r)
    t0 = time.perf_counter()
    for _ in range(n):
        sync(f(*a))
    dt = (time.perf_counter() - t0) / n
    print(f"{label:44s} {dt*1e3:8.2f} ms")


rng = np.random.default_rng(0)

# round-trip baseline
f_null = jax.jit(lambda x: x + 1)
timeit(f_null, jnp.zeros(8), n=10, label="baseline round trip (subtract this)")

# preprocess: raw 32768 -> 4096
RAW, CAP = 32768, 4096
raw_pts = jnp.asarray(rng.normal(size=(RAW, 3)) * 10, jnp.float32)
raw_mask = jnp.ones(RAW, bool)
key = jax.random.PRNGKey(0)
R = jnp.eye(3, dtype=jnp.float32)
t = jnp.zeros(3, jnp.float32)
f_pp = jax.jit(lambda p, m, k: pp.preprocess_scan(p, m, k, R, t, 3000, 2.0, 0.1, CAP))
timeit(f_pp, raw_pts, raw_mask, key, label="preprocess_scan (32768 raw)")

# static point selection: 20480 window pts vs 3x4096 kf pts
NW, NKF, NS = 20480, 3 * 4096, 8192
wpts = jnp.asarray(rng.normal(size=(NW, 3)) * 10, jnp.float32)
wmask = jnp.ones(NW, bool)
kpts = jnp.asarray(rng.normal(size=(3, 4096, 3)) * 10, jnp.float32)
knrm = jnp.asarray(rng.normal(size=(3, 4096, 3)), jnp.float32)
krng = jnp.zeros((3, 4096), jnp.int32)
kmask = jnp.ones((3, 4096), bool)
cpos = jnp.zeros(3, jnp.float32)
f_sp = jax.jit(
    lambda wp, wm, kp, kn, kr, km, k: sp.select_static_points(
        wp, wm, kp, kn, kr, km, cpos, 0.2, k, NS
    )
)
timeit(f_sp, wpts, wmask, kpts, knrm, krng, kmask, key, label="select_static_points")

# normal estimation at keyframe creation: 4096 pts
f_nrm = jax.jit(lambda p, m: nrm.estimate_normals(p, m, 0.2))
timeit(f_nrm, kpts[0], kmask[0], label="estimate_normals (4096)")
