"""Measured K-cut lever: exact-forward fps + PSNR at importance-LOD
fractions (1M trained fixture @ 1080p, one v5e)."""
import os, sys, time
sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))
import numpy as np, jax, jax.numpy as jnp
jax.config.update("jax_compilation_cache_dir", "/root/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)
from splatjax import select_important
from splatjax.camera import make_camera
from splatjax.io import load_splat, tile_scene
from splatjax.render import bin_scene, render

here = os.path.join(os.path.dirname(os.path.abspath(__file__)), "..")
scene = tile_scene(load_splat(os.path.join(
    here, "tests", "fixtures", "trained_scene.splat")), 1_000_000)
cam = make_camera((0, 0, 2.8), (0, 0, 0), width=1920, height=1080)

def sync(x):
    return float(jnp.ravel(x)[0])

def timeit(f, *a, iters=12, batch=4):
    sync(f(*a))
    ts = []
    for _ in range(iters // batch):
        t0 = time.perf_counter()
        for _ in range(batch):
            out = f(*a)
        sync(out)
        ts.append((time.perf_counter() - t0) / batch)
    return float(np.median(ts)) * 1e3

full_img = None
for frac in (1.0, 0.5, 0.25):
    sub = select_important(scene, frac) if frac < 1.0 else scene
    k = int(bin_scene(sub, cam, capacity=1024).num_instances)
    cap = -(-int(k * 1.03) // 1024) * 1024
    sub_d = jax.device_put(sub)
    f = jax.jit(lambda s: render(s, cam, capacity=cap, alpha_clip=0.999,
                                 early_stop=1e-4))
    ms = timeit(f, sub_d)
    img = np.asarray(f(sub_d))
    if full_img is None:
        full_img = img
        psnr = float("inf")
    else:
        mse = float(np.mean((img - full_img) ** 2))
        psnr = 10.0 * np.log10(1.0 / max(mse, 1e-12))
    print(f"lod {frac}: K={k} cap={cap} fwd {ms:.1f} ms "
          f"({1000/ms:.1f} fps) psnr_vs_full {psnr:.1f} dB", flush=True)
