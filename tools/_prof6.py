"""Device-true timing: run each component 50x inside one jit fori_loop."""
import time
import numpy as np
import jax
import jax.numpy as jnp

from dmsa_lidar_slam_tpu.dmsa import optimizer as opt
from dmsa_lidar_slam_tpu.io.synthetic import SyntheticSequence
from dmsa_lidar_slam_tpu.map import normals as nrm
from dmsa_lidar_slam_tpu.map import static_points as sp
from dmsa_lidar_slam_tpu.ops import gaussians, voxel
from dmsa_lidar_slam_tpu.pipeline import preprocess as pp
from dmsa_lidar_slam_tpu.trajectory import builder, continuous as ct
from dmsa_lidar_slam_tpu.utils.dtypes import pose_dtype

REPS = 50


def scalarize(x):
    ls = [l for l in jax.tree_util.tree_leaves(x) if hasattr(l, "dtype")]
    return sum(jnp.sum(l.astype(jnp.float32)) for l in ls)


def timeit(make_f, *a, label="", reps=REPS):
    """Runs make_f reps times inside one jit; data-dependence via a scalar
    perturbation so XLA can't hoist the body out of the loop."""

    def looped(*args):
        def body(i, acc):
            # perturb the first float arg by acc*0 to create dependence
            out = make_f(*args)
            return acc + scalarize(out) * 1e-30

        return jax.lax.fori_loop(0, reps, body, jnp.float32(0.0))

    f = jax.jit(looped)
    float(f(*a))
    t0 = time.perf_counter()
    float(f(*a))
    dt = (time.perf_counter() - t0) / reps
    print(f"{label:44s} {dt*1e3:8.3f} ms")


SCAN_CAP, N_SCANS, N_STATIC, N_CTRL, N_DENSE = 4096, 5, 8192, 6, 501
seq = SyntheticSequence(rng=np.random.default_rng(0), noise_std=0.01)
scans = []
for i in range(N_SCANS):
    pts, stamps, rings = seq.scan(i, 3000)
    scans.append(builder.HostScan(points=pts, stamps=stamps, rings=rings, grid_size=0.2))
shapes = ct.WindowShapes(
    n_window_pts=N_SCANS * SCAN_CAP, n_static=N_STATIC, n_ctrl=N_CTRL, n_dense=N_DENSE
)
data, t0w, min_grid, _ = builder.build_window(
    scans, shapes, None, np.eye(3) * 1e-4, np.eye(3) * 1e-2, 1e-3, use_imu=True
)
pdt = pose_dtype()
params = jnp.zeros(6 * (N_CTRL - 1), dtype=pdt)
fwd = ct.make_forward(shapes, use_imu=True)

timeit(lambda p, d: fwd(p, d), params, data, label="forward (deskew)")

out = jax.jit(lambda p, d: fwd(p, d))(params, data)
pts, mask, rings = out.points, out.mask, out.ring_ids

timeit(lambda p, m, r: gaussians.build_cells(p, m, r, 2 * min_grid, 10), pts, mask, rings,
       label="build_cells grid1")
timeit(lambda p, m: voxel.bin_runs(p, m, 2 * min_grid), pts, mask, label="bin_runs (lexsort)")
timeit(lambda p, m: jnp.lexsort((p[:, 0].astype(jnp.int32), p[:, 1].astype(jnp.int32))),
       pts, mask, label="raw lexsort 28672")

cells1 = jax.jit(lambda: gaussians.build_cells(pts, mask, rings, 2 * min_grid, 10))()
cells2 = jax.jit(lambda: gaussians.build_cells(pts, mask, rings, 5 * min_grid, 10))()
timeit(lambda p, m: gaussians.cell_residuals(p, m, cells1), pts, mask, label="cell_residuals")


def residuals(p):
    o = fwd(p, data)
    parts = [gaussians.cell_residuals(o.points, o.mask, c) for c in (cells1, cells2)]
    parts.append(o.extra)
    return jnp.concatenate(parts)


timeit(residuals, params, label="full residual eval", reps=20)
timeit(lambda p: opt.chunked_jacfwd(residuals, p, 128), params, label="jacfwd 30 tangents", reps=10)

ks = jnp.linspace(0.1, 0.9, 14).astype(pdt)
timeit(lambda p: jax.vmap(lambda k: (lambda e: jnp.dot(e, e))(residuals(p + k * 1e-12)))(ks),
       params, label="line search (14 evals)", reps=10)

# static selection at bench shapes
rng = np.random.default_rng(0)
kpts = jnp.asarray(rng.normal(size=(3, 4096, 3)) * 10, jnp.float32)
knrm = jnp.asarray(rng.normal(size=(3, 4096, 3)), jnp.float32)
krng = jnp.zeros((3, 4096), jnp.int32)
kmask = jnp.ones((3, 4096), bool)
key = jax.random.PRNGKey(0)
timeit(
    lambda wp, wm: sp.select_static_points(
        wp, wm, kpts, knrm, krng, kmask, jnp.zeros(3, jnp.float32), 0.2, key, N_STATIC
    ),
    pts[: shapes.n_window_pts], mask[: shapes.n_window_pts],
    label="select_static_points", reps=5,
)
timeit(lambda p, m: nrm.estimate_normals(p, m, 0.2), kpts[0], kmask[0],
       label="estimate_normals (4096)", reps=10)

raw_pts = jnp.asarray(rng.normal(size=(32768, 3)) * 10, jnp.float32)
raw_mask = jnp.ones(32768, bool)
timeit(
    lambda p, m, k: pp.preprocess_scan(p, m, k, jnp.eye(3, dtype=jnp.float32),
                                       jnp.zeros(3, jnp.float32), 3000, 2.0, 0.1, 4096),
    raw_pts, raw_mask, key, label="preprocess_scan (32768)", reps=10,
)
