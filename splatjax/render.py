"""End-to-end differentiable rendering: scene + camera -> (H, W, 4) image.

Pipeline (all inside one jit): covariance build -> EWA projection + culls ->
tile binning + on-device sort -> Pallas tiled rasterize (custom VJP) ->
image assembly. Equivalent to the reference viewer's full frame
(loadData/pushDataBuffer precompute + worker sort + draw, SURVEY.md §3.2) but
exact-per-frame, differentiable, and TPU-resident.
"""
from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp

from splatjax.camera import Camera
from splatjax.ops.binning import TileConfig, bin_gaussians
from splatjax.ops.projection import project_gaussians
from splatjax.ops.rasterize import tiles_to_image
from splatjax.ops.rasterize_vjp import rasterize_tiles
from splatjax.scene import (
    GaussianScene,
    build_covariances,
    covariance_upper,
    cov6_to_mat,
    dequantize_covariances_int16,
    quantize_covariances_int16,
)

Array = jax.Array


def default_capacity(num_gaussians: int, dup_factor: int = 4) -> int:
    """Static instance-buffer capacity: ~dup_factor x N, 1024-aligned."""
    cap = max(dup_factor * max(num_gaussians, 1), 1024)
    return -(-cap // 1024) * 1024


# A fragment that reaches alpha == 1.0 (possible with u8 opacity 255 from
# .splat assets) zeroes the saved transmittance, which the backward divides
# by — clamping at 0.999 keeps 1/(1-a) bounded while changing the forward by
# < 1e-3 only in the measure-zero saturated region. "auto" resolves to this
# clamp except in viewer_exact mode, which keeps the WebGL blend bit-exact.
DEFAULT_ALPHA_CLIP = 0.999


def resolve_alpha_clip(alpha_clip, viewer_exact: bool) -> Optional[float]:
    if isinstance(alpha_clip, str):
        if alpha_clip != "auto":
            raise ValueError(f"alpha_clip must be float, None or 'auto', got {alpha_clip!r}")
        return None if viewer_exact else DEFAULT_ALPHA_CLIP
    return alpha_clip


@functools.partial(
    jax.jit,
    static_argnames=(
        "width", "height", "tile_size", "capacity",
        "alpha_clip", "early_stop", "viewer_exact", "exact_depth_sort",
    ),
)
def _render_impl(
    means, scales, quats, colors, opacities, sh,
    modelview, projection, cutout, background,
    *,
    width: int,
    height: int,
    tile_size: int,
    capacity: int,
    alpha_clip: Optional[float],
    early_stop: float,
    viewer_exact: bool,
    exact_depth_sort: bool,
):
    cov3d = build_covariances(quats, scales)
    if viewer_exact:
        q, qs = quantize_covariances_int16(covariance_upper(cov3d))
        cov3d = cov6_to_mat(dequantize_covariances_int16(q, qs))
    proj = project_gaussians(
        means, cov3d, colors, opacities, modelview, projection,
        width, height,
        max_scales=jnp.max(scales, axis=-1),
        cutout=cutout,
        sh=sh,
    )
    cfg = TileConfig(width, height, tile_size, tile_size)
    binned = bin_gaussians(proj, cfg, capacity, exact_depth_sort=exact_depth_sort)
    out_tiles, _ = rasterize_tiles(
        binned.feat, binned.starts, binned.ends, cfg, alpha_clip, early_stop
    )
    img = tiles_to_image(out_tiles, cfg, background)
    return img, binned.overflow


def render(
    scene: GaussianScene,
    camera: Camera,
    *,
    tile_size: int = 16,
    capacity: Optional[int] = None,
    alpha_clip="auto",
    early_stop: float = 1e-4,
    viewer_exact: bool = False,
    exact_depth_sort: bool = False,
    cutout: Optional[Array] = None,
    background: Optional[Array] = None,
    return_overflow: bool = False,
):
    """Render a scene with the tiled TPU pipeline.

    Args:
      scene: GaussianScene (activated parameters).
      camera: Camera (modelview/projection/viewport).
      tile_size: square tile edge in pixels.
      capacity: static instance-buffer size (None -> 4x N heuristic). If the
        scene's duplicated instances exceed it, the overflow tail is dropped
        (analogous to the viewer's MAX_TEXTURE_SIZE^2 truncation,
        index.js:30-36); pass return_overflow=True to monitor.
      alpha_clip: clamp per-fragment alpha. "auto" (default) = 0.999 to keep
        1/(1-a) bounded in the backward, or None in viewer_exact mode; pass
        None explicitly for unclamped blending.
      early_stop: stop a tile's sweep when all transmittances fall below
        this (0.0 = exact back-to-front blend equivalence).
      viewer_exact: apply the viewer's int16 covariance quantization (and
        disable the auto alpha clamp).
      exact_depth_sort: order instances by exact f32 depth within each tile
        (two stable sorts) instead of the packed quantized-depth key.
      cutout: optional (4, 4) world->unit-box cull matrix.
      background: optional (3,) RGB composited under the splats.
    """
    if capacity is None:
        capacity = default_capacity(scene.num_gaussians)
    img, overflow = _render_impl(
        jnp.asarray(scene.means, jnp.float32),
        jnp.asarray(scene.scales, jnp.float32),
        jnp.asarray(scene.quats, jnp.float32),
        jnp.asarray(scene.colors, jnp.float32),
        jnp.asarray(scene.opacities, jnp.float32),
        None if scene.sh is None else jnp.asarray(scene.sh, jnp.float32),
        camera.modelview,
        camera.projection,
        None if cutout is None else jnp.asarray(cutout, jnp.float32),
        None if background is None else jnp.asarray(background, jnp.float32),
        width=camera.width,
        height=camera.height,
        tile_size=tile_size,
        capacity=capacity,
        alpha_clip=resolve_alpha_clip(alpha_clip, viewer_exact),
        early_stop=early_stop,
        viewer_exact=viewer_exact,
        exact_depth_sort=exact_depth_sort,
    )
    if return_overflow:
        return img, overflow
    return img
