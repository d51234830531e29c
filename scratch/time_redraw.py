"""Time the fused cached redraw vs the old cached path at 1M@1080p."""
import os, sys, time
sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))
import jax, jax.numpy as jnp, numpy as np
jax.config.update("jax_compilation_cache_dir", "/root/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)
from splatjax.camera import make_camera
from splatjax.io import load_splat, tile_scene
from splatjax.render import bin_scene, CachedBins, _render_binned_cached_impl

here = os.path.join(os.path.dirname(os.path.abspath(__file__)), "..")
scene = tile_scene(load_splat(os.path.join(
    here, "tests", "fixtures", "trained_scene.splat")), 1_000_000)
cam = make_camera((0, 0, 2.8), (0, 0, 0), width=1920, height=1080)
bins = bin_scene(scene, cam, capacity=3_000_000, cache_params=True)
jax.block_until_ready(bins.prm_cm)

def make_fn(prm):
    def f(mv):
        img, _ = _render_binned_cached_impl(
            bins.means, bins.cov6, bins.colors, bins.opacities,
            bins.max_scales, None, mv, cam.projection, None, None, None,
            bins.bins, prm, width=1920, height=1080, tile_size=16,
            alpha_clip=0.999, early_stop=1e-4, viewer_exact=False,
            return_depth=False, feature_bytes=16)
        return img
    return jax.jit(f)

def timeit(f, mv, iters=16, batch=4):
    float(f(mv)[0,0,0])
    ts = []
    for _ in range(iters // batch):
        t0 = time.perf_counter()
        for _ in range(batch):
            out = f(mv)
        float(out[0,0,0])
        ts.append((time.perf_counter() - t0) / batch)
    return float(np.median(ts)) * 1e3

mv = cam.modelview
f_fused = make_fn(bins.prm_cm)
f_old = make_fn(None)
print("fused redraw ms:", round(timeit(f_fused, mv), 2), flush=True)
print("old   redraw ms:", round(timeit(f_old, mv), 2), flush=True)
