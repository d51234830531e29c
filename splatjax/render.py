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
from splatjax.ops.binning import (
    TileConfig,
    bin_gaussians,
    features_from_projection,
)
from splatjax.ops.projection import project_gaussians
from splatjax.ops.rasterize import (
    tiles_to_depth,
    tiles_to_image,
    zbuffer_to_tiles,
)
from splatjax.ops.rasterize_vjp import (
    rasterize_gathered,
    render_image_gathered,
)
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


def resolve_feature_bytes(feature_bytes, viewer_exact: bool) -> int:
    """Resolve the packed instance-row width (ops/rasterize.py).

    "auto" (default) = 32: full-precision rows, inside the 1e-3 viewer
    parity budget. 16 selects the fixed-point/bf16/RGBA8 training rows —
    ~2x cheaper on the dominant gather + kernel DMA traffic, with a
    measured quantization error of ~1e-3 MEAN but up to ~3e-2 at the hard
    edges of near-opaque splats (alpha-slope x 16-bit mean/conic steps) —
    the training default (FitConfig.feature_bytes) and an explicit
    speed/quality knob for interactive redraw, NOT a parity mode.
    Training rows carry f32 depth, so return_depth/zbuf work in either
    mode.
    """
    if isinstance(feature_bytes, str):
        if feature_bytes != "auto":
            raise ValueError(
                f"feature_bytes must be 16, 32 or 'auto', got {feature_bytes!r}"
            )
        return 32
    fb = int(feature_bytes)
    if fb not in (16, 32):
        raise ValueError(f"feature_bytes must be 16, 32 or 'auto', got {fb}")
    if fb == 16 and viewer_exact:
        raise ValueError(
            "feature_bytes=16 is not a parity mode; use 32 with "
            "viewer_exact (training rows carry f32 depth, so "
            "return_depth/zbuf work in either mode)"
        )
    return fb


@functools.partial(
    jax.jit,
    static_argnames=(
        "width", "height", "tile_size", "capacity",
        "alpha_clip", "early_stop", "viewer_exact",
        "return_depth", "feature_bytes",
    ),
)
def _render_impl(
    means, scales, quats, colors, opacities, sh,
    modelview, projection, cutout, background, zbuf,
    *,
    width: int,
    height: int,
    tile_size: int,
    capacity: int,
    alpha_clip: Optional[float],
    early_stop: float,
    viewer_exact: bool,
    return_depth: bool,
    feature_bytes: int = 32,
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
        support_eps=None if viewer_exact else early_stop,
    )
    cfg = TileConfig(width, height, tile_size, tile_size)
    binned = bin_gaussians(proj, cfg, capacity, with_features=False)
    zbuf_tiles = None if zbuf is None else zbuffer_to_tiles(zbuf, cfg)
    if not return_depth:
        # image-level fused VJP: the backward consumes the (H, W, 4)
        # cotangent directly (no padded (T, P, 8) intermediate)
        img = render_image_gathered(
            features_from_projection(proj),
            binned.gauss_id, binned.starts, binned.ends,
            binned.cum, binned.count, binned.perm, binned.cum_d,
            binned.count_d, binned.overflow, background, zbuf_tiles,
            cfg, alpha_clip, early_stop, feature_bytes == 16,
        )
        return img, None, binned.overflow
    out_tiles, _ = rasterize_gathered(
        features_from_projection(proj),
        binned.gauss_id, binned.starts, binned.ends,
        binned.cum, binned.count, binned.perm, binned.cum_d, binned.count_d,
        binned.overflow, zbuf_tiles, cfg, alpha_clip, early_stop,
        feature_bytes == 16, True,
    )
    img = tiles_to_image(out_tiles, cfg, background)
    depth = tiles_to_depth(out_tiles, cfg)
    return img, depth, binned.overflow


@functools.partial(
    jax.jit,
    static_argnames=(
        "width", "height", "tile_size", "capacity",
        "alpha_clip", "early_stop", "return_depth", "feature_bytes",
    ),
)
def _render_multi_impl(
    parts,            # tuple of (means, scales, quats, colors, opacities, sh)
    models,           # tuple of Optional (4,4) object->world matrices
    cutouts,          # tuple of Optional (4,4) world->unit-box matrices
    modelview, projection, background, zbuf,
    *,
    width: int, height: int, tile_size: int, capacity: int,
    alpha_clip: Optional[float], early_stop: float, return_depth: bool,
    feature_bytes: int = 32,
):
    projs = []
    for (means, scales, quats, colors, opacities, sh), model, cutout in zip(
        parts, models, cutouts
    ):
        mv = modelview if model is None else modelview @ model
        projs.append(project_gaussians(
            means, build_covariances(quats, scales), colors, opacities,
            mv, projection, width, height,
            max_scales=jnp.max(scales, axis=-1),
            cutout=cutout, sh=sh, support_eps=early_stop,
        ))
    proj = jax.tree_util.tree_map(
        lambda *xs: jnp.concatenate(xs, axis=0), *projs
    )
    cfg = TileConfig(width, height, tile_size, tile_size)
    binned = bin_gaussians(proj, cfg, capacity, with_features=False)
    zbuf_tiles = None if zbuf is None else zbuffer_to_tiles(zbuf, cfg)
    out_tiles, _ = rasterize_gathered(
        features_from_projection(proj),
        binned.gauss_id, binned.starts, binned.ends,
        binned.cum, binned.count, binned.perm, binned.cum_d, binned.count_d,
        binned.overflow, zbuf_tiles, cfg, alpha_clip, early_stop,
        feature_bytes == 16, return_depth or zbuf is not None,
    )
    img = tiles_to_image(out_tiles, cfg, background)
    depth = tiles_to_depth(out_tiles, cfg) if return_depth else None
    return img, depth, binned.overflow


def render_instances(
    instances,
    camera: Camera,
    *,
    tile_size: int = 16,
    capacity: Optional[int] = None,
    alpha_clip="auto",
    early_stop: float = 1e-4,
    background: Optional[Array] = None,
    zbuf: Optional[Array] = None,
    return_depth: bool = False,
    return_overflow: bool = False,
    feature_bytes="auto",
):
    """Render multiple scene instances depth-correctly in ONE pipeline pass.

    The reference's cutout demo draws two entities of the same asset with
    different world transforms in a single frame (cutout-demo.html:23-25;
    per-entity object.matrixWorld folded into the modelview at
    index.js:443-448, 467-487). Here every instance is projected with
    ``modelview @ model`` and the projected sets are concatenated BEFORE
    binning, so the global front-to-back sort interleaves instances
    correctly (two separate render() calls could not composite
    mid-volume overlaps).

    instances: sequence of (scene, model) or (scene, model, cutout) tuples;
      model is an object->world (4, 4) matrix or None; cutout a
      world->unit-box matrix or None (per-instance, like cutoutEntity).
    feature_bytes: packed instance-row width, as in :func:`render` —
      16 gives interactive multi-entity scenes the fast redraw
      configuration (NOT a parity mode).
    """
    norm = []
    total = 0
    for inst in instances:
        if len(inst) == 2:
            scene, model = inst
            cutout = None
        else:
            scene, model, cutout = inst
        total += scene.num_gaussians
        norm.append((scene, model, cutout))
    if capacity is None:
        capacity = default_capacity(total)
    parts = tuple(
        (
            jnp.asarray(s.means, jnp.float32),
            jnp.asarray(s.scales, jnp.float32),
            jnp.asarray(s.quats, jnp.float32),
            jnp.asarray(s.colors, jnp.float32),
            jnp.asarray(s.opacities, jnp.float32),
            None if s.sh is None else jnp.asarray(s.sh, jnp.float32),
        )
        for s, _, _ in norm
    )
    models = tuple(
        None if m is None else jnp.asarray(m, jnp.float32)
        for _, m, _ in norm
    )
    cutouts = tuple(
        None if c is None else jnp.asarray(c, jnp.float32)
        for _, _, c in norm
    )
    img, depth, overflow = _render_multi_impl(
        parts, models, cutouts,
        camera.modelview, camera.projection,
        None if background is None else jnp.asarray(background, jnp.float32),
        None if zbuf is None else jnp.asarray(zbuf, jnp.float32),
        width=camera.width, height=camera.height, tile_size=tile_size,
        capacity=capacity,
        alpha_clip=resolve_alpha_clip(alpha_clip, False),
        early_stop=early_stop, return_depth=return_depth,
        feature_bytes=resolve_feature_bytes(feature_bytes, False),
    )
    out = (img,)
    if return_depth:
        out += (depth,)
    if return_overflow:
        out += (overflow,)
    return out[0] if len(out) == 1 else out


def composite_over(
    splat_img: Array,
    under_rgb: Array,
    under_mask: Optional[Array] = None,
) -> Array:
    """Under-composite opaque content beneath a rendered splat image.

    The depth-correct mesh+splat frame of the reference demo
    (index.html:9-14: opaque spheres intersecting the splat volume) is
    reproduced in two halves: render(..., zbuf=mesh_z) discards splat
    fragments BEHIND the mesh inside the sweep; this helper then lays the
    mesh color UNDER the surviving splats: rgb + (1 - alpha) * under_rgb.

    under_rgb: (H, W, 3); under_mask: optional (H, W) bool where opaque
    content exists (output alpha is 1 there).
    """
    rgb = splat_img[..., :3] + (1.0 - splat_img[..., 3:4]) * under_rgb
    alpha = splat_img[..., 3:4]
    if under_mask is not None:
        alpha = jnp.maximum(alpha, under_mask[..., None].astype(alpha.dtype))
    return jnp.concatenate([rgb, alpha], axis=-1)


@functools.partial(
    jax.jit,
    static_argnames=("width", "height", "tile_size", "capacity",
                     "viewer_exact", "early_stop"),
)
def _bin_impl(
    means, scales, quats, colors, opacities, sh, modelview, projection,
    cutout,
    *, width: int, height: int, tile_size: int, capacity: int,
    viewer_exact: bool, early_stop: float = 1e-4,
):
    cov3d = build_covariances(quats, scales)
    if viewer_exact:
        q, qs = quantize_covariances_int16(covariance_upper(cov3d))
        cov3d = cov6_to_mat(dequantize_covariances_int16(q, qs))
    proj = project_gaussians(
        means, cov3d, colors, opacities, modelview, projection,
        width, height, max_scales=jnp.max(scales, axis=-1),
        cutout=cutout, sh=sh,
        support_eps=None if viewer_exact else early_stop,
    )
    cfg = TileConfig(width, height, tile_size, tile_size)
    return bin_gaussians(proj, cfg, capacity, with_features=False)


@functools.partial(
    jax.jit,
    static_argnames=("width", "height", "tile_size",
                     "alpha_clip", "early_stop", "viewer_exact",
                     "return_depth", "feature_bytes"),
)
def _render_binned_impl(
    means, scales, quats, colors, opacities, sh,
    modelview, projection, cutout, background, zbuf, bins,
    *, width: int, height: int, tile_size: int,
    alpha_clip: Optional[float], early_stop: float, viewer_exact: bool,
    return_depth: bool, feature_bytes: int = 32,
):
    cov3d = build_covariances(quats, scales)
    if viewer_exact:
        q, qs = quantize_covariances_int16(covariance_upper(cov3d))
        cov3d = cov6_to_mat(dequantize_covariances_int16(q, qs))
    proj = project_gaussians(
        means, cov3d, colors, opacities, modelview, projection,
        width, height, max_scales=jnp.max(scales, axis=-1),
        cutout=cutout, sh=sh,
    )
    cfg = TileConfig(width, height, tile_size, tile_size)
    zbuf_tiles = None if zbuf is None else zbuffer_to_tiles(zbuf, cfg)
    out_tiles, _ = rasterize_gathered(
        features_from_projection(proj),
        bins.gauss_id, bins.starts, bins.ends,
        bins.cum, bins.count, bins.perm, bins.cum_d, bins.count_d,
        bins.overflow, zbuf_tiles, cfg, alpha_clip, early_stop,
        feature_bytes == 16, return_depth,
    )
    img = tiles_to_image(out_tiles, cfg, background)
    depth = tiles_to_depth(out_tiles, cfg) if return_depth else None
    return img, depth


def bin_scene(
    scene: GaussianScene,
    camera: Camera,
    *,
    tile_size: int = 16,
    capacity: Optional[int] = None,
    viewer_exact: bool = False,
    cutout: Optional[Array] = None,
    early_stop: float = 1e-4,
    cache_params: bool = False,
):
    """Build the tile-binned instance index for a (scene, view) pair.

    The result can be passed to :func:`render_binned` to redraw frames
    WITHOUT re-sorting — the TPU analogue of the reference viewer reusing
    the worker's previous sorted order while a new sort is in flight
    (index.js:439-453, 206): projection/colors are always fresh, only the
    tile lists and front-to-back order are stale. With an unchanged camera
    the redraw is exact; under small camera motion splats keep their old
    tile assignment and blend order (coverage fades at tile borders much
    like the reference's one-frame-stale order).

    ``cache_params=True`` additionally pre-gathers the camera-INDEPENDENT
    per-instance parameters (means, covariance, colors, opacities) into
    the returned :class:`CachedBins`: redraws then project each instance
    directly instead of paying the dominant per-frame feature gather
    (~15 ms at 3M instances on v5e) — the TPU analogue of the reference
    running its vertex shader per instance per frame against the worker's
    previous order (index.js:101-164, 438-455). Costs ~56 B of HBM per
    instance.
    """
    if capacity is None:
        capacity = default_capacity(scene.num_gaussians)
    args = (
        jnp.asarray(scene.means, jnp.float32),
        jnp.asarray(scene.scales, jnp.float32),
        jnp.asarray(scene.quats, jnp.float32),
        jnp.asarray(scene.colors, jnp.float32),
        jnp.asarray(scene.opacities, jnp.float32),
        None if scene.sh is None else jnp.asarray(scene.sh, jnp.float32),
    )
    bins = _bin_impl(
        *args,
        camera.modelview, camera.projection,
        None if cutout is None else jnp.asarray(cutout, jnp.float32),
        width=camera.width, height=camera.height, tile_size=tile_size,
        capacity=capacity, viewer_exact=viewer_exact, early_stop=early_stop,
    )
    if not cache_params:
        return bins
    cache = _gather_param_cache(
        *args, bins.gauss_id, viewer_exact=viewer_exact
    )
    return CachedBins(bins, *cache)


def render_binned(
    scene: GaussianScene,
    camera: Camera,
    bins,
    *,
    tile_size: int = 16,
    alpha_clip="auto",
    early_stop: float = 1e-4,
    viewer_exact: bool = False,
    cutout: Optional[Array] = None,
    background: Optional[Array] = None,
    zbuf: Optional[Array] = None,
    return_depth: bool = False,
    feature_bytes="auto",
):
    """Render with a cached instance index from :func:`bin_scene`.

    Skips the depth sort / expansion / tile sort (~40% of a frame at
    1M@1080p) — fresh projection and shading, stale binning. Exact when
    the camera matches the one the bins were built with.

    With a :class:`CachedBins` (``bin_scene(cache_params=True)``) the
    per-frame feature gather is skipped too: projection runs directly on
    the cached per-instance parameters.
    """
    if isinstance(bins, CachedBins):
        img, depth = _render_binned_cached_impl(
            bins.means, bins.cov6, bins.colors, bins.opacities,
            bins.max_scales, bins.sh,
            camera.modelview, camera.projection,
            None if cutout is None else jnp.asarray(cutout, jnp.float32),
            None if background is None
            else jnp.asarray(background, jnp.float32),
            None if zbuf is None else jnp.asarray(zbuf, jnp.float32),
            bins.bins, bins.prm_cm,
            width=camera.width, height=camera.height, tile_size=tile_size,
            alpha_clip=resolve_alpha_clip(alpha_clip, viewer_exact),
            early_stop=early_stop, viewer_exact=viewer_exact,
            return_depth=return_depth,
            feature_bytes=resolve_feature_bytes(feature_bytes, viewer_exact),
        )
        return (img, depth) if return_depth else img
    img, depth = _render_binned_impl(
        jnp.asarray(scene.means, jnp.float32),
        jnp.asarray(scene.scales, jnp.float32),
        jnp.asarray(scene.quats, jnp.float32),
        jnp.asarray(scene.colors, jnp.float32),
        jnp.asarray(scene.opacities, jnp.float32),
        None if scene.sh is None else jnp.asarray(scene.sh, jnp.float32),
        camera.modelview, camera.projection,
        None if cutout is None else jnp.asarray(cutout, jnp.float32),
        None if background is None else jnp.asarray(background, jnp.float32),
        None if zbuf is None else jnp.asarray(zbuf, jnp.float32),
        bins,
        width=camera.width, height=camera.height, tile_size=tile_size,
        alpha_clip=resolve_alpha_clip(alpha_clip, viewer_exact),
        early_stop=early_stop, viewer_exact=viewer_exact,
        return_depth=return_depth,
        feature_bytes=resolve_feature_bytes(feature_bytes, viewer_exact),
    )
    return (img, depth) if return_depth else img


def render(
    scene: GaussianScene,
    camera: Camera,
    *,
    tile_size: int = 16,
    capacity: Optional[int] = None,
    alpha_clip="auto",
    early_stop: float = 1e-4,
    viewer_exact: bool = False,
    cutout: Optional[Array] = None,
    background: Optional[Array] = None,
    zbuf: Optional[Array] = None,
    model: Optional[Array] = None,
    return_overflow: bool = False,
    return_depth: bool = False,
    feature_bytes="auto",
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
      cutout: optional (4, 4) world->unit-box cull matrix.
      background: optional (3,) RGB composited under the splats.
      zbuf: optional (H, W) camera-z buffer of opaque geometry (row 0 top,
        -inf where empty): splat fragments at or behind it are discarded
        inside the sweep, reproducing the reference's depthTest against
        scene meshes (index.js:177-181, index.html:9-14).
      return_depth: also return the (H, W) alpha-weighted expected splat
        depth map (camera z; divide by alpha for the normalized depth).
      model: optional (4, 4) object->world transform folded into the
        modelview exactly as the reference folds object.matrixWorld
        (index.js:467-487); see render_instances for multi-instance frames.
      feature_bytes: packed width of the per-instance rows the kernels
        move: "auto" (default) = 32, full-precision rows inside the 1e-3
        viewer-parity budget; 16 selects the fixed-point/bf16/RGBA8
        training rows — ~2x cheaper on the dominant gather + kernel DMA
        traffic, but NOT a parity mode (edge error up to ~3e-2 on
        near-opaque splats; the reference itself renders from int16
        covariance + RGBA8 textures, index.js:384-394). Both widths carry
        f32 depth, so return_depth/zbuf work in either mode.
    """
    if capacity is None:
        capacity = default_capacity(scene.num_gaussians)
    if scene.num_gaussians == 0:
        img = jnp.zeros((camera.height, camera.width, 4), jnp.float32)
        out = (img,)
        if return_depth:
            out += (jnp.zeros((camera.height, camera.width), jnp.float32),)
        if return_overflow:
            out += (jnp.zeros((), jnp.int32),)
        return out[0] if len(out) == 1 else out
    img, depth, overflow = _render_impl(
        jnp.asarray(scene.means, jnp.float32),
        jnp.asarray(scene.scales, jnp.float32),
        jnp.asarray(scene.quats, jnp.float32),
        jnp.asarray(scene.colors, jnp.float32),
        jnp.asarray(scene.opacities, jnp.float32),
        None if scene.sh is None else jnp.asarray(scene.sh, jnp.float32),
        camera.modelview if model is None
        else camera.modelview @ jnp.asarray(model, jnp.float32),
        camera.projection,
        None if cutout is None else jnp.asarray(cutout, jnp.float32),
        None if background is None else jnp.asarray(background, jnp.float32),
        None if zbuf is None else jnp.asarray(zbuf, jnp.float32),
        width=camera.width,
        height=camera.height,
        tile_size=tile_size,
        capacity=capacity,
        alpha_clip=resolve_alpha_clip(alpha_clip, viewer_exact),
        early_stop=early_stop,
        viewer_exact=viewer_exact,
        return_depth=return_depth,
        feature_bytes=resolve_feature_bytes(feature_bytes, viewer_exact),
    )
    out = (img,)
    if return_depth:
        out += (depth,)
    if return_overflow:
        out += (overflow,)
    return out[0] if len(out) == 1 else out


def render_stereo(
    scene: GaussianScene,
    camera_left: Camera,
    camera_right: Camera,
    *,
    xr_pixel_ratio: float = 0.5,
    tile_size: int = 16,
    capacity: Optional[int] = None,
    alpha_clip="auto",
    early_stop: float = 1e-4,
    viewer_exact: bool = False,
    feature_bytes="auto",
    cutout: Optional[Array] = None,
    background: Optional[Array] = None,
    shared_bins: bool = False,
):
    """Render a stereo eye pair — the WebXR analogue.

    The reference renders per-eye inside the browser's XR loop with the
    framebuffer scaled by ``xrPixelRatio`` (default 0.5,
    /root/reference/index.js:13-15) and ONE worker sort order shared by
    both eyes (the worker sorts against a single view matrix per frame,
    index.js:438-455). Here each eye renders through the exact tiled
    pipeline at the scaled resolution; ``shared_bins=True`` additionally
    reuses the LEFT eye's tile index for the right eye (the closest
    analogue of the reference's shared per-frame order — exact ordering
    per tile, but tile COVERAGE lags by the eye baseline's disparity, so
    it is an approximation for small baselines, not a parity mode; our
    tile index carries coverage, which the reference's instance order
    does not).

    Returns (img_left, img_right), each (H*ratio, W*ratio, 4).
    """
    def _scale(cam: Camera) -> Camera:
        if xr_pixel_ratio == 1.0:
            return cam
        return Camera(
            modelview=cam.modelview, projection=cam.projection,
            width=max(int(cam.width * xr_pixel_ratio), 1),
            height=max(int(cam.height * xr_pixel_ratio), 1),
        )

    cl, cr = _scale(camera_left), _scale(camera_right)
    kw = dict(
        tile_size=tile_size, alpha_clip=alpha_clip, early_stop=early_stop,
        viewer_exact=viewer_exact, feature_bytes=feature_bytes,
        cutout=cutout, background=background,
    )
    if shared_bins:
        bins = bin_scene(
            scene, cl, tile_size=tile_size, capacity=capacity,
            viewer_exact=viewer_exact, cutout=cutout, early_stop=early_stop,
        )
        return (
            render_binned(scene, cl, bins, **kw),
            render_binned(scene, cr, bins, **kw),
        )
    full = dict(kw, capacity=capacity)
    return render(scene, cl, **full), render(scene, cr, **full)


class CachedBins(tuple):
    """Tile index + camera-independent PER-INSTANCE parameters.

    Built by :func:`bin_scene` with ``cache_params=True``. Redraws with a
    cached index then project each duplicated instance directly — the
    per-frame 32-byte feature gather (the single largest redraw stage,
    ~15 ms at 3M instances on v5e) disappears, replaced by ~4 ms of extra
    elementwise projection math on the pre-gathered parameters. This is
    the closest TPU analogue of the reference's tick: the vertex shader
    runs per INSTANCE every frame against the worker's previous order
    (index.js:101-164, 438-455).
    """

    __slots__ = ()

    def __new__(cls, bins, means, cov6, colors, opacities, max_scales, sh,
                prm_cm=None):
        return super().__new__(
            cls,
            (bins, means, cov6, colors, opacities, max_scales, sh, prm_cm),
        )

    bins = property(lambda self: self[0])
    means = property(lambda self: self[1])
    cov6 = property(lambda self: self[2])
    colors = property(lambda self: self[3])
    opacities = property(lambda self: self[4])
    max_scales = property(lambda self: self[5])
    sh = property(lambda self: self[6])
    # chunk-major f32 parameter rows for the FUSED redraw kernel
    # (ops/rasterize.rasterize_cached_fwd): projection happens INSIDE the
    # rasterize kernel, so a redraw is one kernel + assembly — no
    # per-frame gather, pack, or XLA projection pass.
    prm_cm = property(lambda self: self[7])


@functools.partial(jax.jit, static_argnames=("viewer_exact",))
def _gather_param_cache(means, scales, quats, colors, opacities, sh, gid,
                        *, viewer_exact: bool):
    from splatjax.ops.rasterize import (
        group_major_rows, pack_cached_rows,
    )

    cov3d = build_covariances(quats, scales)
    if viewer_exact:
        q, qs = quantize_covariances_int16(covariance_upper(cov3d))
        cov6 = dequantize_covariances_int16(q, qs)
    else:
        cov6 = covariance_upper(cov3d)
    max_scales = jnp.max(scales, axis=-1)
    means_i, cov6_i, colors_i, opa_i, maxs_i = (
        means[gid], cov6[gid], colors[gid], opacities[gid],
        max_scales[gid],
    )
    # group-major rows for the fused redraw kernel (built once per resort)
    prm_cm = group_major_rows(
        pack_cached_rows(means_i, cov6_i, colors_i, opa_i, maxs_i)
    )
    return (
        means_i, cov6_i, colors_i, opa_i, maxs_i,
        None if sh is None else sh[gid], prm_cm,
    )


@functools.partial(
    jax.jit,
    static_argnames=("width", "height", "tile_size",
                     "alpha_clip", "early_stop", "viewer_exact",
                     "return_depth", "feature_bytes"),
)
def _render_binned_cached_impl(
    means_i, cov6_i, colors_i, opa_i, maxs_i, sh_i,
    modelview, projection, cutout, background, zbuf, bins,
    prm_cm=None,
    *, width: int, height: int, tile_size: int,
    alpha_clip: Optional[float], early_stop: float, viewer_exact: bool,
    return_depth: bool, feature_bytes: int = 32,
):
    from splatjax.ops.binning import features_from_projection as ffp
    from splatjax.ops.rasterize import (
        chunk_major_rows,
        make_camera_table,
        pack_feature_table,
        pack_feature_table16,
        rasterize_cached_fwd,
        rasterize_cm_fwd,
    )

    if (
        prm_cm is not None and feature_bytes == 16 and sh_i is None
        and cutout is None and zbuf is None and not viewer_exact
        and not return_depth
    ):
        # FUSED redraw: projection runs inside the rasterize kernel on
        # the cached group-major rows — one kernel + assembly per frame.
        # Taken only in the 16-byte SPEED mode: it keeps the fast
        # fragment math but projects in full f32 (no 16-byte row
        # quantization), so it is strictly MORE precise than the packed
        # path it replaces (measured 3e-3 vs the exact render where the
        # packed path sits at 2e-2); feature_bytes=32 keeps the exact
        # 3-pass gather path for parity-mode redraws.
        cfg = TileConfig(width, height, tile_size, tile_size)
        out_tiles, _ = rasterize_cached_fwd(
            prm_cm, make_camera_table(modelview, projection),
            bins.starts, bins.ends, cfg,
            alpha_clip=alpha_clip, early_stop=early_stop,
        )
        return tiles_to_image(out_tiles, cfg, background), None

    proj = project_gaussians(
        means_i, cov6_to_mat(cov6_i), colors_i, opa_i,
        modelview, projection, width, height,
        max_scales=maxs_i, cutout=cutout, sh=sh_i,
        support_eps=None if viewer_exact else early_stop,
    )
    cfg = TileConfig(width, height, tile_size, tile_size)
    zbuf_tiles = None if zbuf is None else zbuffer_to_tiles(zbuf, cfg)
    pack = pack_feature_table16 if feature_bytes == 16 else pack_feature_table
    # rows are already instance-major: straight to the streaming layout
    feat_cm = chunk_major_rows(pack(ffp(proj)))
    want_depth = return_depth or zbuf is not None
    out_tiles, _ = rasterize_cm_fwd(
        feat_cm, bins.starts, bins.ends, cfg, alpha_clip=alpha_clip,
        early_stop=early_stop, zbuf=zbuf_tiles,
        packed16=feature_bytes == 16, want_depth=want_depth,
    )
    img = tiles_to_image(out_tiles, cfg, background)
    depth = tiles_to_depth(out_tiles, cfg) if return_depth else None
    return img, depth
