"""Microbenchmark the window DMSA optimization on the live backend.

Builds a bench-shaped window problem (5 x 4096 scan points + 8192 static,
501 dense, 6 control poses) and times opt.optimize under controlled
variants to decompose the per-iteration cost:

  autodiff / structured Jacobian x line-search grid size x num_iter

Usage: python tools/micro_opt.py
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

import jax
import jax.numpy as jnp


def build_problem():
    from dmsa_lidar_slam_tpu.io.synthetic import SyntheticSequence
    from dmsa_lidar_slam_tpu.trajectory import builder, continuous as ct
    from dmsa_lidar_slam_tpu.utils.dtypes import pose_dtype

    seq = SyntheticSequence(rng=np.random.default_rng(0), noise_std=0.01)
    scans = []
    for i in range(5):
        pts, stamps, rings = seq.scan(i, 4096)
        scans.append(builder.HostScan(points=pts, stamps=stamps, rings=rings, grid_size=0.2))
    shapes = ct.WindowShapes(n_window_pts=5 * 4096, n_static=8192, n_ctrl=6, n_dense=501)
    data, t0, min_grid, _ = builder.build_window(
        scans, shapes, None, np.eye(3) * 1e-4, np.eye(3) * 1e-2, 1e-3, use_imu=False
    )
    # fill static slots with plausible map points (same scene, world frame)
    rng = np.random.default_rng(1)
    from dmsa_lidar_slam_tpu.io.synthetic import room_scene, sample_scene_points

    st = sample_scene_points(rng, shapes.n_static, planes=room_scene(1.0)).astype(np.float32)
    data = data._replace(
        static_pts=jnp.asarray(st),
        static_mask=jnp.ones(shapes.n_static, bool),
        static_ring=jnp.asarray(rng.integers(0, 32, shapes.n_static).astype(np.int32)),
    )
    params = jnp.zeros(6 * (shapes.n_ctrl - 1), dtype=pose_dtype())
    return shapes, data, params, float(min_grid)


def timeit(fn, *args, reps=5, **kw):
    out = fn(*args, **kw)
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    for _ in range(reps):
        out = fn(*args, **kw)
    jax.block_until_ready(out)
    return (time.perf_counter() - t0) / reps


def main():
    from dmsa_lidar_slam_tpu.dmsa import optimizer as opt
    from dmsa_lidar_slam_tpu.trajectory import continuous as ct

    shapes, data, params, min_grid = build_problem()
    fwd = ct.make_forward(shapes, use_imu=False)
    structured = ct.make_structured(shapes, use_imu=False)
    print(f"backend={jax.default_backend()} n_pts={shapes.n_window_pts + shapes.n_static}")

    full = (0.1, 0.2, 0.3, 0.4, 0.5, 0.6, 0.7, 0.8, 0.9, 0.05, 0.02, 0.01, 0.005, 0.002)
    ref9 = (0.1, 0.2, 0.3, 0.4, 0.5, 0.6, 0.7, 0.8, 0.9)
    one = (0.5,)

    variants = [
        ("autodiff ls14 it10", dict(line_search_fracs=full), None, 10),
        ("struct   ls14 it10", dict(line_search_fracs=full), structured, 10),
        ("struct   ls9  it10", dict(line_search_fracs=ref9), structured, 10),
        ("struct   ls1  it10", dict(line_search_fracs=one), structured, 10),
        ("autodiff ls1  it10", dict(line_search_fracs=one), None, 10),
        ("struct   ls14 it2 ", dict(line_search_fracs=full), structured, 2),
    ]
    for name, skw, sfn, it in variants:
        settings = opt.OptimSettings(
            num_iter=it, min_num_points_per_set=10, epsilon=0.0, **skw
        )
        t = timeit(
            opt.optimize, fwd, params, data, settings, min_grid, structured_fn=sfn
        )
        r = opt.optimize(fwd, params, data, settings, min_grid, structured_fn=sfn)
        print(
            f"{name}: {t * 1e3:8.2f} ms  iters={int(r.num_iters)} "
            f"stop={int(r.stop_reason)} ng={int(r.num_gaussians)}"
        )

    # single forward + cell build cost for scale
    from dmsa_lidar_slam_tpu.ops import gaussians

    f_j = jax.jit(lambda p, d: fwd(p, d).points)
    print(f"forward only:         {timeit(f_j, params, data) * 1e3:8.2f} ms")

    def cellbuild(p, d):
        out = fwd(p, d)
        c = gaussians.build_cells(out.points, out.mask, out.ring_ids, 2 * min_grid, 10)
        return c.info6

    print(f"forward+1cellbuild:   {timeit(jax.jit(cellbuild), params, data) * 1e3:8.2f} ms")

    def resid(p, d):
        out = fwd(p, d)
        c = gaussians.build_cells(out.points, out.mask, out.ring_ids, 2 * min_grid, 10)
        return gaussians.cell_residuals(out.points, out.mask, c)

    print(f"fwd+build+residuals:  {timeit(jax.jit(resid), params, data) * 1e3:8.2f} ms")


if __name__ == "__main__":
    main()
