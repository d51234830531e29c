"""Display-loop (fused cached redraw) fps at importance-LOD fractions —
the reference's own frame-loop semantics (stale order + truncation)."""
import os, sys, time
sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))
import numpy as np, jax, jax.numpy as jnp
jax.config.update("jax_compilation_cache_dir", "/root/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)
from splatjax import select_important
from splatjax.camera import make_camera
from splatjax.io import load_splat, tile_scene
from splatjax.render import bin_scene, render_binned, render

here = os.path.join(os.path.dirname(os.path.abspath(__file__)), "..")
scene = tile_scene(load_splat(os.path.join(
    here, "tests", "fixtures", "trained_scene.splat")), 1_000_000)
cam = make_camera((0, 0, 2.8), (0, 0, 0), width=1920, height=1080)

def sync(x):
    return float(jnp.ravel(x)[0])

def timeit(f, *a, iters=16, batch=4):
    sync(f(*a))
    ts = []
    for _ in range(iters // batch):
        t0 = time.perf_counter()
        for _ in range(batch):
            out = f(*a)
        sync(out)
        ts.append((time.perf_counter() - t0) / batch)
    return float(np.median(ts)) * 1e3

full = None
for frac in (1.0, 0.5, 0.25):
    sub = select_important(scene, frac) if frac < 1.0 else scene
    k = int(bin_scene(sub, cam, capacity=1024).num_instances)
    cap = -(-int(k * 1.03) // 1024) * 1024
    bins = bin_scene(sub, cam, capacity=cap, cache_params=True)
    jax.block_until_ready(bins.prm_cm)
    f = jax.jit(lambda mv: render_binned(
        sub, cam, bins, feature_bytes=16, alpha_clip=0.999,
        early_stop=1e-4))
    ms = timeit(f, cam.modelview)
    img = np.asarray(f(cam.modelview))
    if full is None:
        full = np.asarray(render(sub, cam, capacity=cap))
        psnr = 99.0
    else:
        mse = float(np.mean((img - full) ** 2))
        psnr = 10.0 * np.log10(1.0 / max(mse, 1e-12))
    print(f"lod {frac}: K={k} redraw {ms:.1f} ms ({1000/ms:.1f} fps) "
          f"psnr_vs_full {psnr:.1f} dB", flush=True)
