"""Microbenchmark: VPU element-wise / transcendental throughput f32 vs bf16.

Decides whether the rasterizer's fragment math should run in bf16 for the
fast/training path (round-3 kernel diet): if bf16 element-wise ops stream
2x on v5e, the whole (P, CHUNK) fragment pipeline halves.

Run on the real TPU:  python -u scratch/micro_bf16.py
"""
import time

import jax
import jax.numpy as jnp

N = 8 * 1024 * 1024  # 8M lanes


def timeit(fn, *args, iters=30):
    jax.block_until_ready(fn(*args))
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fn(*args)
    jax.block_until_ready(out)
    return (time.perf_counter() - t0) / iters * 1e3


def main():
    key = jax.random.PRNGKey(0)
    xf = jax.random.uniform(key, (N,), jnp.float32, 0.01, 0.99)
    yf = jax.random.uniform(jax.random.PRNGKey(1), (N,), jnp.float32, 0.01, 0.99)
    xb, yb = xf.astype(jnp.bfloat16), yf.astype(jnp.bfloat16)
    print(f"N = {N/1e6:.0f}M lanes", flush=True)

    for name, x, y in (("f32", xf, yf), ("bf16", xb, yb)):
        for op, fn in (
            ("exp   ", jax.jit(lambda a, b: jnp.exp(-a))),
            ("log1p ", jax.jit(lambda a, b: jnp.log1p(-a))),
            ("fma3  ", jax.jit(lambda a, b: ((a * b + a) * b + a) * b)),
        ):
            t = timeit(fn, x, y)
            print(f"{op} {name:5s}: {t:7.3f} ms  {N/t/1e6:8.1f} Mlanes/ms",
                  flush=True)

    # MXU at kernel-like shapes, batched: acc (P,C)@(C,4), tri (P,C)@(C,C)
    P, C, B = 256, 128, 1024
    w = jax.random.uniform(key, (B, P, C), jnp.float32)
    col = jax.random.uniform(key, (B, C, 4), jnp.float32)
    d = (((2,), (1,)), ((0,), (0,)))

    def mm_highest(w, col):
        return jax.lax.dot_general(
            w, col, d, precision=jax.lax.Precision.HIGHEST,
            preferred_element_type=jnp.float32)

    def mm_hilo(w, col):
        hi = w.astype(jnp.bfloat16)
        lo = (w - hi.astype(jnp.float32)).astype(jnp.bfloat16)
        cb = col.astype(jnp.bfloat16)
        return (jax.lax.dot_general(hi, cb, d, preferred_element_type=jnp.float32)
                + jax.lax.dot_general(lo, cb, d, preferred_element_type=jnp.float32))

    def mm_bf16(w, col):
        return jax.lax.dot_general(
            w.astype(jnp.bfloat16), col.astype(jnp.bfloat16), d,
            preferred_element_type=jnp.float32)

    for nm, fn in (("acc HIGHEST", mm_highest), ("acc hi/lo2 ", mm_hilo),
                   ("acc bf16x1 ", mm_bf16)):
        t = timeit(jax.jit(fn), w, col, iters=10)
        print(f"{nm}: {t:7.3f} ms ({B} x ({P},{C})@({C},4))", flush=True)

    tri = (jax.lax.broadcasted_iota(jnp.int32, (C, C), 0)
           < jax.lax.broadcasted_iota(jnp.int32, (C, C), 1)).astype(jnp.bfloat16)
    dt = (((2,), (0,)), ((), ()))

    def tri_hilo(w):
        hi = w.astype(jnp.bfloat16)
        lo = (w - hi.astype(jnp.float32)).astype(jnp.bfloat16)
        return (jax.lax.dot_general(hi, tri, dt, preferred_element_type=jnp.float32)
                + jax.lax.dot_general(lo, tri, dt, preferred_element_type=jnp.float32))

    def tri_bf16(w):
        return jax.lax.dot_general(
            w.astype(jnp.bfloat16), tri, dt, preferred_element_type=jnp.float32)

    for nm, fn in (("tri hi/lo2 ", tri_hilo), ("tri bf16x1 ", tri_bf16)):
        t = timeit(jax.jit(fn), w, iters=10)
        print(f"{nm}: {t:7.3f} ms ({B} x ({P},{C})@({C},{C}))", flush=True)


if __name__ == "__main__":
    main()
