"""Round-2 profiling, part D: where do bin_runs' 24 ms go?"""

import time

import numpy as np

import jax
import jax.numpy as jnp

N = 28672


def timeit(fn, args_list, warm=2):
    for a in args_list[:warm]:
        jax.block_until_ready(fn(*a))
    t0 = time.perf_counter()
    for a in args_list[warm:]:
        jax.block_until_ready(fn(*a))
    return (time.perf_counter() - t0) / (len(args_list) - warm) * 1e3


def main():
    print("backend:", jax.default_backend(), "x64:", jax.config.jax_enable_x64)
    rng = np.random.default_rng(0)
    n_calls = 7
    his = [jnp.asarray(rng.integers(0, 1 << 30, N).astype(np.int32)) for _ in range(n_calls)]
    los = [jnp.asarray(rng.integers(0, 1 << 15, N).astype(np.int32)) for _ in range(n_calls)]

    f_argsort = jax.jit(lambda h: jnp.argsort(h))
    f_lexsort = jax.jit(lambda h, l: jnp.lexsort((l, h)))

    def _variadic(h, l):
        iota = jnp.arange(N, dtype=jnp.int32)
        _, _, o = jax.lax.sort((h, l, iota), num_keys=2)
        return o

    f_variadic = jax.jit(_variadic)

    def _skv(h, l):
        # single fused key in int64 (x64 on)
        k = (h.astype(jnp.int64) << 15) | l.astype(jnp.int64)
        return jnp.argsort(k)

    f_skv64 = jax.jit(_skv)

    def _sort1(h):
        iota = jnp.arange(N, dtype=jnp.int32)
        _, o = jax.lax.sort_key_val(h, iota)
        return o

    f_skv32 = jax.jit(_sort1)

    def _two_pass(h, l):
        # stable radix-style: sort by lo, then stable sort by hi
        iota = jnp.arange(N, dtype=jnp.int32)
        o1 = jnp.argsort(l, stable=True)
        o2 = jnp.argsort(h[o1], stable=True)
        return o1[o2]

    f_two = jax.jit(_two_pass)

    print(f"argsort i32:          {timeit(f_argsort, [(h,) for h in his]):8.2f} ms")
    print(f"argsort i32 stable:   {timeit(jax.jit(lambda h: jnp.argsort(h, stable=True)), [(h,) for h in his]):8.2f} ms")
    print(f"sort_key_val i32:     {timeit(f_skv32, [(h,) for h in his]):8.2f} ms")
    print(f"lexsort 2xi32:        {timeit(f_lexsort, list(zip(his, los))):8.2f} ms")
    print(f"lax.sort variadic(3): {timeit(f_variadic, list(zip(his, los))):8.2f} ms")
    print(f"argsort fused i64:    {timeit(f_skv64, list(zip(his, los))):8.2f} ms")
    print(f"two-pass stable:      {timeit(f_two, list(zip(his, los))):8.2f} ms")


if __name__ == "__main__":
    main()
