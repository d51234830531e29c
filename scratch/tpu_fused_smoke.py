import os, sys, time
sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))
import numpy as np, jax
from splatjax.camera import make_camera
from splatjax.io import synthetic_scene
from splatjax.render import bin_scene, render_binned, render

scene = synthetic_scene(2000, seed=9, extent=0.6, scale_range=(0.02, 0.06))
cam = make_camera((0.1, -0.1, 2.3), (0, 0, 0), width=256, height=192)
bins = bin_scene(scene, cam, capacity=16384, cache_params=True)
print("bins built", flush=True)
t0 = time.time()
img_fused = np.asarray(render_binned(scene, cam, bins, feature_bytes=16))
print("fused compiled+ran in", round(time.time()-t0, 1), "s", flush=True)
img_full = np.asarray(render(scene, cam))
d = np.abs(img_fused - img_full)
print("max diff:", d.max(), "mean:", d.mean(), flush=True)
