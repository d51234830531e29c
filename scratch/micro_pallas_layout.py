"""Does a Pallas TPU operand with a tiny minor dim (T, P, 4) cost more to
feed than a lane-major (T, 4, P) one? Times a trivial per-tile reduction
kernel over both layouts, plus the producing fusion (build cotangent ->
kernel) end-to-end.
"""
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

jax.config.update(
    "jax_compilation_cache_dir",
    os.environ.get("JAX_COMPILATION_CACHE_DIR", "/root/.jax_cache"),
)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)

T, P = 8160, 256


def _sync(x):
    return float(jnp.ravel(jax.tree_util.tree_leaves(x)[0])[0])


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


def kernel_tp4(g_ref, o_ref):
    o_ref[0, :, :] = g_ref[0] * 2.0


def kernel_t4p(g_ref, o_ref):
    o_ref[0, :, :] = g_ref[0] * 2.0


f_tp4 = pl.pallas_call(
    kernel_tp4,
    grid=(T,),
    in_specs=[pl.BlockSpec((1, P, 4), lambda i: (i, 0, 0))],
    out_specs=pl.BlockSpec((1, P, 4), lambda i: (i, 0, 0)),
    out_shape=jax.ShapeDtypeStruct((T, P, 4), jnp.float32),
)
f_t4p = pl.pallas_call(
    kernel_t4p,
    grid=(T,),
    in_specs=[pl.BlockSpec((1, 4, P), lambda i: (i, 0, 0))],
    out_specs=pl.BlockSpec((1, 4, P), lambda i: (i, 0, 0)),
    out_shape=jax.ShapeDtypeStruct((T, 4, P), jnp.float32),
)

rng = np.random.default_rng(0)
a_tp4 = jax.device_put(jnp.asarray(
    rng.standard_normal((T, P, 4), np.float32)))
a_t4p = jax.device_put(jnp.asarray(
    rng.standard_normal((T, 4, P), np.float32)))

j_tp4 = jax.jit(f_tp4)
j_t4p = jax.jit(f_t4p)
print("pallas_tp4_ms:", timeit(j_tp4, a_tp4))
print("pallas_t4p_ms:", timeit(j_t4p, a_t4p))

# end-to-end: image cotangent build feeding the kernel
H, W = 1080, 1920
TY, TX, TH, TW = 68, 120, 16, 16
gimg = jax.device_put(jnp.asarray(
    rng.standard_normal((H, W, 4), np.float32)))


def build_tp4(g):
    g = g[::-1]
    g = jnp.pad(g, ((0, TY * TH - H), (0, 0), (0, 0)))
    g = g.reshape(TY, TH, TX, TW, 4).transpose(0, 2, 1, 3, 4)
    g = g.reshape(T, TH * TW, 4)
    g_rgb = g[..., :3]
    g_t = -g[..., 3]
    return jnp.concatenate([g_rgb, g_t[..., None]], axis=-1)


def build_t4p(g):
    g = jnp.moveaxis(g[::-1], -1, 0)
    g = g * jnp.asarray([1.0, 1.0, 1.0, -1.0])[:, None, None]
    g = jnp.pad(g, ((0, 0), (0, TY * TH - H), (0, 0)))
    g = g.reshape(4, TY, TH, TX, TW).transpose(1, 3, 0, 2, 4)
    return g.reshape(T, 4, TH * TW)


e_tp4 = jax.jit(lambda g: f_tp4(build_tp4(g)))
e_t4p = jax.jit(lambda g: f_t4p(build_t4p(g)))
print("e2e_build+pallas_tp4_ms:", timeit(e_tp4, gimg))
print("e2e_build+pallas_t4p_ms:", timeit(e_t4p, gimg))
