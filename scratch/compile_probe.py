import os, sys, time
sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))
import numpy as np, jax, jax.numpy as jnp
from splatjax.camera import make_camera
from splatjax.io import synthetic_scene
from splatjax.ops.binning import TileConfig, bin_gaussians
from splatjax.ops.projection import project_gaussians
from splatjax.ops.rasterize import (
    pack_cached_rows, group_major_rows, make_camera_table,
    rasterize_cached_fwd,
)
from splatjax.scene import build_covariances, covariance_upper

w, h = int(sys.argv[1]) if len(sys.argv) > 1 else 256, 192
scene = synthetic_scene(2000, seed=9, extent=0.6, scale_range=(0.02, 0.06))
cam = make_camera((0.1, -0.1, 2.3), (0, 0, 0), width=w, height=h)
cov3d = build_covariances(scene.quats, scene.scales)
proj = project_gaussians(scene.means, cov3d, scene.colors, scene.opacities,
                         cam.modelview, cam.projection, w, h,
                         max_scales=jnp.max(jnp.asarray(scene.scales), -1))
cfg = TileConfig(w, h, 16, 16)
b = bin_gaussians(proj, cfg, 16384, with_features=False)
prm = group_major_rows(pack_cached_rows(
    jnp.asarray(scene.means)[b.gauss_id],
    covariance_upper(cov3d)[b.gauss_id],
    jnp.asarray(scene.colors)[b.gauss_id],
    jnp.asarray(scene.opacities)[b.gauss_id],
    jnp.max(jnp.asarray(scene.scales), -1)[b.gauss_id]))
cam_tbl = make_camera_table(cam.modelview, cam.projection)
t0 = time.time()
lowered = rasterize_cached_fwd.lower(prm, cam_tbl, b.starts, b.ends, cfg,
                                     alpha_clip=0.999, early_stop=1e-4)
print("lower:", round(time.time()-t0, 1), flush=True)
t0 = time.time()
compiled = lowered.compile()
print("compile:", round(time.time()-t0, 1), flush=True)
