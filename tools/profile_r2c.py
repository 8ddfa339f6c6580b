"""Round-2 profiling, part C: primitive-level timings at window shapes.

Feeds a fresh input each call (fold a counter into the data) so no relay /
program-level caching can fake the numbers; blocks per call.
"""

import time

import numpy as np

import jax
import jax.numpy as jnp

from dmsa_lidar_slam_tpu.ops import gaussians, voxel

N = 28672
T = 65536


def timeit(fn, args_list, warm=2):
    for a in args_list[:warm]:
        jax.block_until_ready(fn(*a))
    t0 = time.perf_counter()
    for a in args_list[warm:]:
        jax.block_until_ready(fn(*a))
    return (time.perf_counter() - t0) / (len(args_list) - warm) * 1e3


def main():
    print("backend:", jax.default_backend())
    rng = np.random.default_rng(0)
    n_calls = 7

    ptss = [jnp.asarray(rng.normal(size=(N, 3)).astype(np.float32) * 3.0) for _ in range(n_calls)]
    mask = jnp.ones((N,), bool)
    rings = jnp.asarray(rng.integers(0, 16, N).astype(np.int32))
    keys = [jnp.asarray(rng.integers(0, 1 << 20, N).astype(np.int32)) for _ in range(n_calls)]
    vals9 = [jnp.asarray(rng.normal(size=(N, 9)).astype(np.float32)) for _ in range(n_calls)]

    f_sort = jax.jit(lambda k: jnp.argsort(k))
    f_seg = jax.jit(lambda v, k: jax.ops.segment_sum(v, k % T, num_segments=T))
    f_cumsum = jax.jit(lambda v: jnp.cumsum(v, axis=0))
    f_build = jax.jit(lambda p: gaussians.build_cells(p, mask, rings, 0.4, 10).num_valid)
    f_binruns = jax.jit(lambda p: voxel.bin_runs(p, mask, 0.4).order)

    def _resid(p):
        c = gaussians.build_cells(p, mask, rings, 0.4, 10)
        return gaussians.cell_residuals(p, mask, c)

    f_resid = jax.jit(_resid)

    def _resid14(p):
        c = gaussians.build_cells(p, mask, rings, 0.4, 10)
        cand = p[None] + jnp.arange(14, dtype=p.dtype)[:, None, None] * 1e-4
        return jax.vmap(lambda q: gaussians.cell_residuals(q, mask, c))(cand)

    f_resid14 = jax.jit(_resid14)

    print(f"argsort [N] i32:        {timeit(f_sort, [(k,) for k in keys]):8.2f} ms")
    print(f"segment_sum [N,9]->T:   {timeit(f_seg, list(zip(vals9, keys))):8.2f} ms")
    print(f"cumsum [N,9]:           {timeit(f_cumsum, [(v,) for v in vals9]):8.2f} ms")
    print(f"bin_runs (sort+runs):   {timeit(f_binruns, [(p,) for p in ptss]):8.2f} ms")
    print(f"build_cells (1 grid):   {timeit(f_build, [(p,) for p in ptss]):8.2f} ms")
    print(f"build+cell_residuals:   {timeit(f_resid, [(p,) for p in ptss]):8.2f} ms")
    print(f"build+resid x14 vmap:   {timeit(f_resid14, [(p,) for p in ptss]):8.2f} ms")


if __name__ == "__main__":
    main()
