"""Time the window-optimizer components at bench shapes on the real TPU."""
import time
import numpy as np
import jax
import jax.numpy as jnp

from dmsa_lidar_slam_tpu.dmsa import optimizer as opt
from dmsa_lidar_slam_tpu.io.synthetic import SyntheticSequence
from dmsa_lidar_slam_tpu.ops import gaussians, voxel
from dmsa_lidar_slam_tpu.trajectory import builder, continuous as ct
from dmsa_lidar_slam_tpu.utils.dtypes import pose_dtype


def timeit(f, *a, n=10, label=""):
    r = jax.block_until_ready(f(*a))
    t0 = time.perf_counter()
    for _ in range(n):
        r = jax.block_until_ready(f(*a))
    dt = (time.perf_counter() - t0) / n
    print(f"{label:40s} {dt*1e3:8.2f} ms")
    return r


SCAN_CAP = 4096
N_SCANS = 5
N_STATIC = 8192
N_CTRL = 6
N_DENSE = 501

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

# full optimize
f_opt = jax.jit(lambda p, d: opt.optimize(fwd, p, d, settings, min_grid))
timeit(f_opt, params, data, n=3, label="optimize (10 iter)")

# forward only
f_fwd = jax.jit(lambda p, d: fwd(p, d).points)
timeit(f_fwd, params, data, label="forward (deskew)")

out = jax.jit(lambda p, d: fwd(p, d))(params, data)
pts, mask, rings = out.points, out.mask, out.ring_ids

# cell build at each resolution
f_b1 = jax.jit(lambda p, m, r: gaussians.build_cells(p, m, r, 2 * min_grid, 10))
f_b2 = jax.jit(lambda p, m, r: gaussians.build_cells(p, m, r, 5 * min_grid, 10))
cells1 = timeit(f_b1, pts, mask, rings, label="build_cells grid1")
cells2 = timeit(f_b2, pts, mask, rings, label="build_cells grid2")

# sort alone
f_sort = jax.jit(lambda p, m: voxel.bin_runs(p, m, 2 * min_grid).order)
timeit(f_sort, pts, mask, label="bin_runs (lexsort)")

# residuals
f_res = jax.jit(lambda p, m: gaussians.cell_residuals(p, m, cells1))
timeit(f_res, pts, mask, label="cell_residuals (one grid)")


# full residual fn incl forward
def residuals(p):
    o = fwd(p, data)
    parts = [gaussians.cell_residuals(o.points, o.mask, c) for c in (cells1, cells2)]
    parts.append(o.extra)
    return jnp.concatenate(parts)


f_resfull = jax.jit(residuals)
timeit(f_resfull, params, label="full residual eval")

# jacobian
f_jac = jax.jit(lambda p: opt.chunked_jacfwd(residuals, p, 128))
timeit(f_jac, params, n=3, label="chunked_jacfwd (30 tangents)")

# line search = 14 vmapped residual evals
ks = jnp.linspace(0.1, 0.9, 14).astype(pdt)
f_ls = jax.jit(
    lambda p: jax.vmap(lambda k: jnp.dot(residuals(p * (1 + k)), residuals(p * (1 + k))))(ks)
)
timeit(f_ls, params, n=3, label="line search (14 evals)")
