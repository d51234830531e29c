#!/usr/bin/env python
"""Measure the instance cut from opacity-aware support bounds (VERDICT r3 #2).

For the bench's trained-fixture scene at 1080p: what fraction of duplicated
instances come from splats whose opacity-aware support ellipse
(t_eff = min(4, ln(opa/eps))) spans fewer tiles than the cutoff-4 ellipse?
"""
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))
import numpy as np
import jax.numpy as jnp

from splatjax.camera import make_camera
from splatjax.io import load_splat
from splatjax.scene import GaussianScene, build_covariances
from splatjax.ops.projection import project_gaussians
from splatjax.ops.binning import TileConfig, gaussian_tile_span

from splatjax.io import tile_scene

here = os.path.join(os.path.dirname(os.path.abspath(__file__)), "..")
base = load_splat(os.path.join(here, "tests", "fixtures",
                               "trained_scene.splat"))
n = 1_000_000
scene = tile_scene(base, n)
cam = make_camera((0, 0, 2.8), (0, 0, 0), width=1920, height=1080)

opa = np.asarray(scene.opacities)
print("opacity percentiles:",
      {p: round(float(np.percentile(opa, p)), 5)
       for p in (1, 5, 10, 25, 50, 75, 90)})

cov3d = build_covariances(scene.quats, scene.scales)
proj = project_gaussians(
    scene.means, cov3d, scene.colors, scene.opacities,
    cam.modelview, cam.projection, 1920, 1080,
    max_scales=jnp.max(scene.scales, axis=-1),
)
cfg = TileConfig(1920, 1080, 16, 16)
_, _, _, _, count = gaussian_tile_span(proj, cfg)
total = int(jnp.sum(count))
print(f"baseline instances: {total}")

for eps in (2e-5, 5e-5, 1e-4, 2e-4, 5e-4, 1e-3):
    t_eff = jnp.clip(jnp.log(jnp.maximum(proj.opacity, 1e-30) / eps), 0.0, 4.0)
    scale = jnp.sqrt(t_eff / 4.0)
    proj2 = proj.__class__(
        mean2d=proj.mean2d, conic=proj.conic, depth=proj.depth,
        mask=proj.mask & (proj.opacity > eps),
        bbox_half=proj.bbox_half * scale[:, None],
        color=proj.color, opacity=proj.opacity,
    )
    _, _, _, _, c2 = gaussian_tile_span(proj2, cfg)
    t2 = int(jnp.sum(c2))
    print(f"eps={eps:g}: instances {t2} ({100*(1-t2/total):.1f}% cut)")
