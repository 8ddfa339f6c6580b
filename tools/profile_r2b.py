"""Round-2 profiling, part B: attribute per-iteration cost inside optimize()
by toggling components (line-search grid, second cell build, jacobian chunk).

All numbers are 10-iteration optimize() wall times at bench window shapes, so
the ~3 ms axon dispatch overhead amortizes out.
"""

import time

import numpy as np

import jax
import jax.numpy as jnp

from dmsa_lidar_slam_tpu.dmsa import optimizer as opt
from dmsa_lidar_slam_tpu.io.synthetic import SyntheticSequence
from dmsa_lidar_slam_tpu.trajectory import builder, continuous as ct
from dmsa_lidar_slam_tpu.utils.dtypes import pose_dtype


def timeit(fn, *args, n=5, warm=2):
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
    shapes = ct.WindowShapes(n_window_pts=5 * 4096, n_static=8192, n_ctrl=6, n_dense=501)
    seq = SyntheticSequence(rng=np.random.default_rng(3), noise_std=0.01)
    scans = []
    for i in range(5):
        pts, stamps, rings = seq.scan(i, 4096)
        scans.append(builder.HostScan(points=pts, stamps=stamps, rings=rings, grid_size=0.2))
    data, t0, min_grid, _ = builder.build_window(
        scans, shapes, None, np.eye(3) * 1e-4, np.eye(3) * 1e-2, 1e-3, use_imu=False
    )
    sp = np.asarray(seq.scan(0, shapes.n_static)[0]) + np.array([0.5, 0.3, 0.1], np.float32)
    data = data._replace(
        static_pts=jnp.asarray(sp),
        static_mask=jnp.ones(shapes.n_static, bool),
        static_ring=jnp.asarray(np.arange(shapes.n_static) % 16, jnp.int32),
    )
    params = jnp.zeros(6 * (shapes.n_ctrl - 1), dtype=pdt)
    fwd = ct.make_forward(shapes, use_imu=False)
    mg = float(min_grid)

    base = dict(num_iter=10, min_num_points_per_set=10, step_length_optim=0.1, max_step=0.1)

    variants = {
        "baseline (14 ls, 2 builds)": opt.OptimSettings(**base),
        "9-cand line search": opt.OptimSettings(**base, line_search_fracs=tuple(0.1 * k for k in range(1, 10))),
        "1-cand line search": opt.OptimSettings(**base, line_search_fracs=(0.5,)),
        "single grid build": opt.OptimSettings(**base, grid_size_2_factor=0.0),
        "chunk=32": opt.OptimSettings(**base, jacobian_chunk=32),
        "epsilon huge (stops iter1)": opt.OptimSettings(
            num_iter=10, min_num_points_per_set=10, step_length_optim=0.1,
            max_step=0.1, epsilon=1e9,
        ),
    }
    print("backend:", jax.default_backend())
    for name, st in variants.items():
        def run(p, _st=st):
            r = opt.optimize(fwd, p, data, _st, mg)
            return r.params, r.num_iters, r.stop_reason
        out = jax.block_until_ready(run(params))
        print(f"{name:32s} {timeit(run, params):8.2f} ms   iters={int(out[1])} stop={int(out[2])}")


if __name__ == "__main__":
    main()
