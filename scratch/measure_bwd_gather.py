"""Measure bwd gradient-gather candidates on real TPU.

The backward's biggest XLA-bound cost is the 3M-row permutation gather of
(K, 16) f32 gradient rows into gid-sorted order (~39 ms measured r2).
Candidates:
  A. status quo: (K, 16) f32 rows, 64 B         -> baseline
  B. bf16-packed (K, 8) int32 rows, 32 B        -> halved bytes
  C. (K, 8) f32 rows x2 gathers                 -> sanity (expect worse)
"""
import os, sys, time
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/.jax_cache")
import jax, jax.numpy as jnp
jax.config.update("jax_compilation_cache_dir", "/root/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)
import numpy as np

K = 3_000_000


def sync(x):
    return float(jnp.ravel(jax.tree_util.tree_leaves(x)[0])[0])


def timeit(f, *a, iters=10):
    sync(f(*a))
    t0 = time.perf_counter()
    for _ in range(iters):
        sync(f(*a))
    return (time.perf_counter() - t0) / iters * 1000


tiny = jax.jit(lambda x: x + 1.0)
t = jax.device_put(jnp.zeros((8, 128)))
rtt = timeit(tiny, t)
print(f"rtt {rtt:.2f} ms")

key = jax.random.PRNGKey(0)
rows = jax.random.normal(key, (K, 16), jnp.float32)
order = jax.random.permutation(jax.random.PRNGKey(1), K).astype(jnp.int32)


@jax.jit
def gather16(r, o):
    return r[o]


@jax.jit
def pack_bf16(r):
    b = r.astype(jnp.bfloat16)  # (K, 16)
    u = jax.lax.bitcast_convert_type(b, jnp.uint16).astype(jnp.uint32)
    lo = u[:, 0::2]
    hi = u[:, 1::2]
    return ((hi << 16) | lo).astype(jnp.int32)  # (K, 8)


@jax.jit
def gather8_unpack(p, o):
    g = p[o]                               # (K, 8) int32
    u = g.astype(jnp.uint32)
    lo = (u & 0xFFFF).astype(jnp.uint16)
    hi = (u >> 16).astype(jnp.uint16)
    b = jnp.stack([lo, hi], axis=-1).reshape(K, 16)
    return jax.lax.bitcast_convert_type(b, jnp.bfloat16).astype(jnp.float32)


@jax.jit
def pack_and_gather(r, o):
    return gather8_unpack(pack_bf16(r), o)


print("A  gather (K,16) f32 :", timeit(gather16, rows, order) - rtt, "ms")
p8 = jax.block_until_ready(pack_bf16(rows))
print("B  gather (K,8) i32  :", timeit(gather8_unpack, p8, order) - rtt, "ms")
print("B+ pack+gather+unpack:", timeit(pack_and_gather, rows, order) - rtt, "ms")
# accuracy
out_a = np.asarray(gather16(rows, order)[:1000])
out_b = np.asarray(pack_and_gather(rows, order)[:1000])
rel = np.abs(out_a - out_b) / (np.abs(out_a) + 1e-12)
print("bf16 max rel err:", rel.max())
