"""A/B the image-cotangent -> tile-cotangent reshuffle variants.

The bench-step trace shows ~10 ms/step in building the (T, P, 4) kernel
cotangent from the (H, W, 4) image cotangent (slice_negate 3.3 +
pad_maximum 4.8 + copy 2.0) plus ~2 ms in the forward assembly reshape —
all layout shuffles of a 33 MB image whose channel-minor dim of 4 tiles
terribly on TPU. Measures alternatives.
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


H, W = 1080, 1920
TY, TX, TH, TW = 68, 120, 16, 16
T, P = TY * TX, TH * TW

gimg = jax.device_put(jnp.asarray(
    np.random.default_rng(0).standard_normal((H, W, 4), np.float32)))


def current(g):
    # verbatim _image_cotangent_to_tiles (no background)
    g = jnp.asarray(g, jnp.float32)[::-1]
    g = jnp.pad(g, ((0, TY * TH - H), (0, 0), (0, 0)))
    g = g.reshape(TY, TH, TX, TW, 4).transpose(0, 2, 1, 3, 4)
    g = g.reshape(T, TH * TW, 4)
    g_rgb = g[..., :3]
    g_alpha = g[..., 3]
    g_t = -g_alpha
    return jnp.concatenate([g_rgb, g_t[..., None]], axis=-1)


def planar(g):
    # planar-first: channel math while channel is the MAJOR dim, one
    # final moveaxis back to the kernel's (T, P, 4)
    g = jnp.moveaxis(jnp.asarray(g, jnp.float32)[::-1], -1, 0)  # (4, H, W)
    g = g * jnp.asarray([1.0, 1.0, 1.0, -1.0])[:, None, None]
    g = jnp.pad(g, ((0, 0), (0, TY * TH - H), (0, 0)))
    g = g.reshape(4, TY, TH, TX, TW).transpose(1, 3, 0, 2, 4)
    return g.reshape(T, 4, P)          # (T, 4, P) planar tile cotangent


def planar_tp4(g):
    # planar intermediate but deliver (T, P, 4) like the current kernel
    g = jnp.moveaxis(jnp.asarray(g, jnp.float32)[::-1], -1, 0)
    g = g * jnp.asarray([1.0, 1.0, 1.0, -1.0])[:, None, None]
    g = jnp.pad(g, ((0, 0), (0, TY * TH - H), (0, 0)))
    g = g.reshape(4, TY, TH, TX, TW).transpose(1, 3, 2, 4, 0)
    return g.reshape(T, P, 4)


def fwd_assemble(x):
    # verbatim tiles_to_image core (no background): (T, P, 4) -> (H, W, 4)
    x = x.reshape(TY, TX, TH, TW, 4)
    x = x.transpose(0, 2, 1, 3, 4).reshape(TY * TH, TX * TW, 4)
    x = x[:H, :W]
    rgb = x[..., :3]
    alpha = 1.0 - x[..., 3]
    return jnp.concatenate([rgb, alpha[..., None]], axis=-1)[::-1]


def fwd_assemble_planar(x4):
    # from planar kernel output (T, 4, P)
    x = x4.reshape(TY, TX, 4, TH, TW).transpose(2, 0, 3, 1, 4)
    x = x.reshape(4, TY * TH, TX * TW)[:, :H, :W]
    sgn = jnp.asarray([1.0, 1.0, 1.0, -1.0])[:, None, None]
    off = jnp.asarray([0.0, 0.0, 0.0, 1.0])[:, None, None]
    x = off + sgn * x
    return jnp.moveaxis(x, 0, -1)[::-1]


j_current = jax.jit(current)
j_planar = jax.jit(planar)
j_planar_tp4 = jax.jit(planar_tp4)
j_fwd = jax.jit(fwd_assemble)
j_fwd_p = jax.jit(fwd_assemble_planar)

out_tp4 = jax.device_put(jnp.asarray(
    np.random.default_rng(1).standard_normal((T, P, 4), np.float32)))
out_t4p = jax.device_put(jnp.transpose(out_tp4, (0, 2, 1)).copy())

# correctness
a = np.asarray(j_current(gimg))
c = np.asarray(j_planar_tp4(gimg))
np.testing.assert_allclose(a, c, atol=1e-6)
b = np.asarray(j_planar(gimg))
np.testing.assert_allclose(a, np.transpose(b, (0, 2, 1)), atol=1e-6)
fa = np.asarray(j_fwd(out_tp4))
fb = np.asarray(j_fwd_p(out_t4p))
np.testing.assert_allclose(fa, fb, atol=1e-6)

print("cot_current_ms:", timeit(j_current, gimg))
print("cot_planar_t4p_ms:", timeit(j_planar, gimg))
print("cot_planar_tp4_ms:", timeit(j_planar_tp4, gimg))
print("fwd_assemble_ms:", timeit(j_fwd, out_tp4))
print("fwd_assemble_planar_ms:", timeit(j_fwd_p, out_t4p))
