"""A/B the sub_g0 searchsorted: XLA binary search vs method='sort' vs
a merge via one lax.sort of (cum_d ++ bounds).

sub_g0[b] = #{r : cum_d[r] <= b*stride}, cum_d ascending, bounds regular.
"""
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
    leaf = jax.tree_util.tree_leaves(x)[0]
    return float(jnp.ravel(leaf)[0])


def timeit(f, *a, iters=20):
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

    w1, w2 = wall(2), wall(2 + iters)
    return round(max((w2 - w1) / iters, 0.0) * 1e3, 2)


n = 1_000_000
cap = 3_000_000
stride = 256
rng = np.random.default_rng(0)
counts = rng.integers(0, 6, n).astype(np.float32)
cum = np.cumsum(counts).astype(np.float32)
cum_d = jax.device_put(jnp.asarray(cum))
nb = -(-cap // stride)
j_bounds = jnp.arange(0, cap, stride, dtype=jnp.int32).astype(jnp.float32)
n_vis = jnp.int32(n)

f_scan = jax.jit(lambda c: jnp.minimum(
    jnp.searchsorted(c, j_bounds, side="right").astype(jnp.int32), n_vis))
f_sort = jax.jit(lambda c: jnp.minimum(
    jnp.searchsorted(c, j_bounds, side="right",
                     method="sort").astype(jnp.int32), n_vis))


def merge(c):
    # one ascending sort of keys (cum_d, bounds'); a bound's final
    # position minus its rank among bounds = #cum values <= it.
    # side='right' tie-break: bounds sort AFTER equal cum values -> key
    # bump by +0.5 (cum values are integers).
    keys = jnp.concatenate([c, j_bounds + 0.5])
    tags = jnp.concatenate(
        [jnp.zeros((n,), jnp.int32), jnp.ones((nb,), jnp.int32)]
    )
    _, t_sorted = jax.lax.sort((keys, tags), is_stable=True, num_keys=1)
    pos = jnp.cumsum(t_sorted)            # rank among bounds, inclusive
    idx = jnp.nonzero(t_sorted, size=nb)[0].astype(jnp.int32)
    g0 = idx - (pos[idx] - 1)
    return jnp.minimum(g0.astype(jnp.int32), n_vis)


f_merge = jax.jit(merge)

a = np.asarray(f_scan(cum_d))
b = np.asarray(f_sort(cum_d))
c = np.asarray(f_merge(cum_d))
assert (a == b).all(), (a[:10], b[:10])
assert (a == c).all(), np.nonzero(a != c)[0][:10]

print("scan_ms:", timeit(f_scan, cum_d))
print("sortmethod_ms:", timeit(f_sort, cum_d))
print("merge_ms:", timeit(f_merge, cum_d))
