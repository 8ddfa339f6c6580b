"""Round-2 profiling: component-level timing of the fused step at bench shapes.

Times (on the real TPU):
  - the full optimize() at bench window shapes, vs num_iter
  - one residual pass (forward + 2x cell_residuals)
  - one cell build pass (forward + 2x build_cells)
  - chunked jacfwd of the residual
  - the vmapped line search (14 candidates)
  - dense_poses alone
Prints a ms-per-call table -> the round-2 optimization targets.
"""

import time

import numpy as np

import jax
import jax.numpy as jnp

from dmsa_lidar_slam_tpu.config import Config
from dmsa_lidar_slam_tpu.dmsa import optimizer as opt
from dmsa_lidar_slam_tpu.io.synthetic import SyntheticSequence
from dmsa_lidar_slam_tpu.ops import gaussians
from dmsa_lidar_slam_tpu.trajectory import builder, continuous as ct
from dmsa_lidar_slam_tpu.utils.dtypes import pose_dtype


def timeit(fn, *args, n=10, warm=2):
    for _ in range(warm):
        r = fn(*args)
        jax.block_until_ready(r)
    t0 = time.perf_counter()
    for _ in range(n):
        r = fn(*args)
    jax.block_until_ready(r)
    return (time.perf_counter() - t0) / n * 1e3  # ms


def main():
    pdt = pose_dtype()
    # bench-like window shapes: 5 scans x 4096 cap + 8192 static
    shapes = ct.WindowShapes(n_window_pts=5 * 4096, n_static=8192, n_ctrl=6, n_dense=501)
    seq = SyntheticSequence(rng=np.random.default_rng(3), noise_std=0.01)
    scans = []
    for i in range(5):
        pts, stamps, rings = seq.scan(i, 4096)
        scans.append(builder.HostScan(points=pts, stamps=stamps, rings=rings, grid_size=0.2))
    data, t0, min_grid, _ = builder.build_window(
        scans, shapes, None, np.eye(3) * 1e-4, np.eye(3) * 1e-2, 1e-3, use_imu=False
    )
    # fill static slots with plausible world points so cells resemble bench
    sp = np.asarray(seq.scan(0, shapes.n_static)[0]) + np.array([0.5, 0.3, 0.1], np.float32)
    data = data._replace(
        static_pts=jnp.asarray(sp),
        static_mask=jnp.ones(shapes.n_static, bool),
        static_ring=jnp.asarray(np.arange(shapes.n_static) % 16, jnp.int32),
    )
    params = jnp.zeros(6 * (shapes.n_ctrl - 1), dtype=pdt)
    fwd = ct.make_forward(shapes, use_imu=False)
    mg = float(min_grid)

    settings = opt.OptimSettings(
        num_iter=10, min_num_points_per_set=10,
        step_length_optim=0.1, max_step=0.1,
    )

    print(f"backend={jax.default_backend()} pose_dtype={pdt.__name__} "
          f"N={shapes.n_window_pts + shapes.n_static} min_grid={mg:.3f}")

    # --- components --------------------------------------------------------
    @jax.jit
    def f_dense(p):
        _, _, o, t = ct.dense_poses(p, data, shapes)
        return o, t

    @jax.jit
    def f_forward(p):
        out = fwd(p, data)
        return out.points

    @jax.jit
    def f_build(p):
        out = fwd(p, data)
        c1 = gaussians.build_cells(out.points, out.mask, out.ring_ids, 2.0 * mg, 10)
        c2 = gaussians.build_cells(out.points, out.mask, out.ring_ids, 5.0 * mg, 10)
        return c1.num_valid + c2.num_valid

    def make_cells(p):
        out = fwd(p, data)
        c1 = gaussians.build_cells(out.points, out.mask, out.ring_ids, 2.0 * mg, 10)
        c2 = gaussians.build_cells(out.points, out.mask, out.ring_ids, 5.0 * mg, 10)
        return c1, c2

    cells = jax.jit(make_cells)(params)
    jax.block_until_ready(cells)
    print("n_valid cells:", int(cells[0].num_valid), int(cells[1].num_valid))

    def residuals(p, cells):
        out = fwd(p, data)
        return jnp.concatenate([
            gaussians.cell_residuals(out.points, out.mask, cells[0]),
            gaussians.cell_residuals(out.points, out.mask, cells[1]),
            out.extra,
        ])

    f_resid = jax.jit(residuals)

    @jax.jit
    def f_jac(p, cells):
        return opt.chunked_jacfwd(lambda q: residuals(q, cells), p, 128)

    @jax.jit
    def f_linesearch(p, cells):
        step = jnp.ones_like(p) * 0.01
        ks = jnp.concatenate([
            0.1 * jnp.arange(1, 10, dtype=p.dtype),
            jnp.asarray([0.05, 0.02, 0.01, 0.005, 0.002], dtype=p.dtype),
        ])
        cand = p[None, :] + ks[:, None] * step[None, :]
        errs = jax.vmap(lambda q: (lambda e: jnp.dot(e, e))(residuals(q, cells)))(cand)
        return errs

    @jax.jit
    def f_linesearch9(p, cells):
        step = jnp.ones_like(p) * 0.01
        ks = 0.1 * jnp.arange(1, 10, dtype=p.dtype)
        cand = p[None, :] + ks[:, None] * step[None, :]
        errs = jax.vmap(lambda q: (lambda e: jnp.dot(e, e))(residuals(q, cells)))(cand)
        return errs

    print(f"dense_poses:        {timeit(f_dense, params):8.2f} ms")
    print(f"forward (deskew):   {timeit(f_forward, params):8.2f} ms")
    print(f"build 2x cells:     {timeit(f_build, params):8.2f} ms")
    print(f"residual pass:      {timeit(f_resid, params, cells):8.2f} ms")
    print(f"jacobian (30 tang): {timeit(f_jac, params, cells):8.2f} ms")
    print(f"line search (14):   {timeit(f_linesearch, params, cells):8.2f} ms")
    print(f"line search (9):    {timeit(f_linesearch9, params, cells):8.2f} ms")

    def run_opt(p):
        return opt.optimize(fwd, p, data, settings, mg).params

    print(f"optimize (10 it):   {timeit(run_opt, params, n=5):8.2f} ms")

    s1 = opt.OptimSettings(num_iter=1, min_num_points_per_set=10,
                           step_length_optim=0.1, max_step=0.1)

    def run_opt1(p):
        return opt.optimize(fwd, p, data, s1, mg).params

    print(f"optimize (1 it):    {timeit(run_opt1, params, n=5):8.2f} ms")


if __name__ == "__main__":
    main()
