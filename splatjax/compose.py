"""Whole-scene-graph composition: splats + multiple opaque layers.

The reference embeds its splat entities in an arbitrary A-Frame scene
graph and lets the browser's depth buffer resolve every interaction: any
number of opaque meshes, any number of splat entities, all in one frame
(index.js:177-181 — splats draw with depthTest:true / depthWrite:false;
index.html:9-14 and cutout-demo.html:23-25 exercise both). The single-call
analogues here are ``render(zbuf=...)`` + ``composite_over`` (one opaque
layer) and ``render_instances`` (many splat entities); this module closes
the remaining gap — MANY opaque layers AND many splat entities in one
depth-correct frame:

  1. every opaque layer carries an (H, W) camera-z buffer (z negative in
     front, -inf where the layer is empty) and an (H, W, 3) color; the
     layers z-merge per pixel exactly like a depth buffer (nearest wins);
  2. every splat entity projects with its own model/cutout transform and
     ALL of them bin + sort TOGETHER (render_instances), so splat-splat
     interleaving is globally front-to-back — two separate render calls
     could not composite mid-volume overlaps (see render_instances);
  3. the merged z-buffer culls splat fragments BEHIND the nearest opaque
     surface inside the rasterizer sweep, and the merged opaque color
     under-composites beneath the surviving splats.

This is exactly the browser's compositing model for the splat material:
opaque geometry writes depth first, splats then blend in depth order
against that buffer.
"""
from __future__ import annotations

from typing import NamedTuple, Optional, Sequence

import jax
import jax.numpy as jnp

from splatjax.camera import Camera
from splatjax.render import composite_over, render_instances

Array = jax.Array


class OpaqueLayer(NamedTuple):
    """One opaque element of the scene graph, already rasterized to the
    camera: ``rgb`` (H, W, 3) and ``z`` (H, W) camera-space depth
    (negative in front of the camera, ``-inf`` where the layer has no
    coverage — farther values lose the z-merge automatically)."""

    rgb: Array
    z: Array


def merge_opaque_layers(layers: Sequence[OpaqueLayer]):
    """Per-pixel nearest-wins z-merge of opaque layers (the depth-buffer
    resolve). Returns (rgb (H, W, 3), z (H, W), mask (H, W) bool).
    Requires at least one layer."""
    if not layers:
        raise ValueError("merge_opaque_layers requires at least one layer")
    rgb = jnp.asarray(layers[0].rgb, jnp.float32)
    z = jnp.asarray(layers[0].z, jnp.float32)
    for layer in layers[1:]:
        lz = jnp.asarray(layer.z, jnp.float32)
        nearer = lz > z  # camera z negative in front: nearer == larger
        z = jnp.where(nearer, lz, z)
        rgb = jnp.where(
            nearer[..., None], jnp.asarray(layer.rgb, jnp.float32), rgb
        )
    return rgb, z, jnp.isfinite(z)


def compose_scene(
    splat_instances,
    opaque_layers: Sequence[OpaqueLayer],
    camera: Camera,
    *,
    background: Optional[Array] = None,
    tile_size: int = 16,
    capacity: Optional[int] = None,
    alpha_clip="auto",
    early_stop: float = 1e-4,
    feature_bytes="auto",
) -> Array:
    """Depth-correct frame of many splat entities + many opaque layers.

    splat_instances: as :func:`splatjax.render.render_instances` —
      a sequence of ``(scene, model)`` or ``(scene, model, cutout)``
      tuples (model: object->world (4, 4) or None; cutout: world->unit-box
      or None, the reference's per-entity cutoutEntity).
    opaque_layers: :class:`OpaqueLayer` sequence (may be empty).
    background: optional (3,) RGB under everything.
    feature_bytes: packed instance-row width (16 = fast redraw rows,
      NOT a parity mode; see splatjax.render.render).

    Returns (H, W, 4): splats blended front-to-back across ALL entities,
    culled against the merged opaque depth, over the merged opaque color,
    over the background. Differentiable w.r.t. splat parameters (the
    z-cull is a mask, like the viewer's depth test).
    """
    zbuf = None
    if opaque_layers:
        mesh_rgb, zbuf, mesh_mask = merge_opaque_layers(opaque_layers)
    img = render_instances(
        splat_instances, camera,
        tile_size=tile_size, capacity=capacity, alpha_clip=alpha_clip,
        early_stop=early_stop, zbuf=zbuf, feature_bytes=feature_bytes,
    )
    if opaque_layers:
        # under-composite the opaque resolve only where it has coverage
        under = jnp.where(mesh_mask[..., None], mesh_rgb, 0.0)
        img = composite_over(img, under, under_mask=mesh_mask)
    if background is not None:
        bg = jnp.asarray(background, jnp.float32)
        rgb = img[..., :3] + (1.0 - img[..., 3:4]) * bg
        img = jnp.concatenate([rgb, img[..., 3:4]], axis=-1)
    return img
