"""XLA TPU gather cost model: rows vs width vs index order.

The fwd feature gather (3M x 16 B) and bwd gradient gather (3M x 32 B)
each cost ~14 ms — far above the ~0.3 ms HBM transaction floor. This
microbenchmark pins down what XLA's gather actually charges for:
  * row count (fixed width)
  * row width (fixed count)
  * index order (random vs sorted vs iota)
  * dtype container (i32 lanes vs f32)
"""
from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax
import jax.numpy as jnp
import numpy as np

jax.config.update(
    "jax_compilation_cache_dir",
    os.environ.get("JAX_COMPILATION_CACHE_DIR", "/root/.jax_cache"),
)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)


def _sync(x):
    return float(jnp.ravel(x)[0])


def timeit(f, *a):
    _sync(f(*a))

    def wall(j):
        best = float("inf")
        for _ in range(3):
            t0 = time.perf_counter()
            out = None
            for _ in range(j):
                out = f(*a)
            _sync(out)
            best = min(best, time.perf_counter() - t0)
        return best

    return (wall(10) - wall(2)) / 8 * 1e3


def main():
    n = 1_000_000
    k = 3_000_000
    rng = np.random.default_rng(0)
    idx_rand = jnp.asarray(rng.integers(0, n, k, dtype=np.int32))
    idx_sort = jnp.sort(idx_rand)
    idx_iota = jnp.asarray((np.arange(k, dtype=np.int64) % n).astype(np.int32))

    for width in (1, 2, 4, 8, 16):
        tbl = jnp.asarray(rng.integers(0, 1 << 30, (n, width), np.int32))
        g = jax.jit(lambda t, i: t[i])
        t_r = timeit(g, tbl, idx_rand)
        t_s = timeit(g, tbl, idx_sort)
        print(f"width {width:3d} i32: rand {t_r:7.2f} ms   sorted {t_s:7.2f} ms")

    # row count scaling at width 4
    tbl = jnp.asarray(rng.integers(0, 1 << 30, (n, 4), np.int32))
    for kk in (750_000, 1_500_000, 3_000_000):
        g = jax.jit(lambda t, i: t[i])
        t_r = timeit(g, tbl, idx_rand[:kk])
        print(f"rows {kk:9d} w4: rand {t_r:7.2f} ms")

    # iota (pure streaming) as the floor
    g = jax.jit(lambda t, i: t[i])
    print(f"iota w4 3M: {timeit(g, tbl, idx_iota):7.2f} ms")

    # one_hot matmul alternative at small table (sanity only)
    # take_along_axis / jnp.take variants
    g2 = jax.jit(lambda t, i: jnp.take(t, i, axis=0))
    print(f"jnp.take w4 3M rand: {timeit(g2, tbl, idx_rand):7.2f} ms")

    # table transposed: gather along axis 1
    tblT = tbl.T  # (4, N)
    g3 = jax.jit(lambda t, i: t[:, i])
    print(f"axis1 w4 3M rand: {timeit(g3, tblT, idx_rand):7.2f} ms")


if __name__ == "__main__":
    main()
