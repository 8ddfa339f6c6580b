"""Clean per-component timing: reduce outputs to a scalar inside jit."""
import time
import numpy as np
import jax
import jax.numpy as jnp

from dmsa_lidar_slam_tpu.dmsa import optimizer as opt
from dmsa_lidar_slam_tpu.io.synthetic import SyntheticSequence
from dmsa_lidar_slam_tpu.ops import gaussians, voxel
from dmsa_lidar_slam_tpu.trajectory import builder, continuous as ct
from dmsa_lidar_slam_tpu.utils.dtypes import pose_dtype


def scalarize(x):
    ls = [l for l in jax.tree_util.tree_leaves(x) if hasattr(l, "dtype")]
    return sum(jnp.sum(l.astype(jnp.float32)) for l in ls)


def timeit(make_f, *a, n=10, label=""):
    f = jax.jit(lambda *args: scalarize(make_f(*args)))
    float(f(*a))
    t0 = time.perf_counter()
    for _ in range(n):
        float(f(*a))
    dt = (time.perf_counter() - t0) / n
    print(f"{label:44s} {dt*1e3:8.2f} ms")


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
settings = opt.OptimSettings(num_iter=10, min_num_points_per_set=10)

timeit(lambda x: x + 1, jnp.zeros(8), n=20, label="baseline round trip")
timeit(lambda p, d: opt.optimize(fwd, p, d, settings, min_grid), params, data, n=3,
       label="optimize (10 iter)")
timeit(lambda p, d: fwd(p, d).points, params, data, label="forward (deskew)")

out = jax.jit(lambda p, d: fwd(p, d))(params, data)
pts, mask, rings = out.points, out.mask, out.ring_ids

timeit(lambda p, m, r: gaussians.build_cells(p, m, r, 2 * min_grid, 10), pts, mask, rings,
       label="build_cells grid1")
timeit(lambda p, m: voxel.bin_runs(p, m, 2 * min_grid), pts, mask, label="bin_runs (lexsort)")

cells1 = jax.jit(lambda p, m, r: gaussians.build_cells(p, m, r, 2 * min_grid, 10))(pts, mask, rings)
cells2 = jax.jit(lambda p, m, r: gaussians.build_cells(p, m, r, 5 * min_grid, 10))(pts, mask, rings)
timeit(lambda p, m: gaussians.cell_residuals(p, m, cells1), pts, mask, label="cell_residuals")


def residuals(p):
    o = fwd(p, data)
    parts = [gaussians.cell_residuals(o.points, o.mask, c) for c in (cells1, cells2)]
    parts.append(o.extra)
    return jnp.concatenate(parts)


timeit(residuals, params, label="full residual eval")
timeit(lambda p: opt.chunked_jacfwd(residuals, p, 128), params, n=3, label="jacfwd 30 tangents")

ks = jnp.linspace(0.1, 0.9, 14).astype(pdt)
timeit(lambda p: jax.vmap(lambda k: (lambda e: jnp.dot(e, e))(residuals(p + 0 * k)))(ks),
       params, n=3, label="line search (14 evals)")
