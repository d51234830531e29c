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

here = os.path.join(os.path.dirname(os.path.abspath(__file__)), "..")
base = load_splat(os.path.join(here, "tests", "fixtures",
                               "trained_scene.splat"))
n = 1_000_000
reps = -(-n // base.num_gaussians)
rng = np.random.default_rng(11)
offs = rng.uniform(-0.9, 0.9, (reps, 3)).astype(np.float32)
scene = GaussianScene(
    means=jnp.concatenate([base.means * 0.25 + o for o in offs])[:n],
    scales=jnp.tile(base.scales * 0.25, (reps, 1))[:n],
    quats=jnp.tile(base.quats, (reps, 1))[:n],
    colors=jnp.tile(base.colors, (reps, 1))[:n],
    opacities=jnp.tile(base.opacities, reps)[:n],
)
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
