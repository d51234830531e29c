"""Pure-JAX ground-truth rasterizer (no Pallas, runs on any backend).

Evaluates every Gaussian at every pixel with exact front-to-back "over"
compositing — O(N * pixels), intended for small configs (<= ~50k splats) as
the golden image and gradient reference for the tiled Pallas pipeline
(BASELINE.json config 1). It is differentiable end-to-end by construction.

Compositing matches the reference's back-to-front blend
(CustomBlending, blendSrcAlpha=One, index.js:177-181) re-expressed
front-to-back:  C = sum_i c_i a_i T_i,  T_i = prod_{j<i} (1 - a_j),
A = 1 - prod_i (1 - a_i), with per-fragment alpha = exp(power) * opacity and
the exp(-4) cutoff (index.js:170-175).
"""
from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp

from splatjax.camera import Camera
from splatjax.ops.projection import (
    POWER_CUTOFF,
    ProjectedGaussians,
    project_gaussians,
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


def composite_pixels(
    proj: ProjectedGaussians,
    pixel_xy: Array,
    *,
    alpha_clip: Optional[float] = None,
    zbuf_px: Optional[Array] = None,
) -> Array:
    """Composite all gaussians (front-to-back) at given pixel centers.

    pixel_xy: (P, 2) in the y-up screen frame. Returns (P, 4) RGBA.
    zbuf_px: optional (P,) camera-z of opaque geometry per pixel (-inf =
    empty): fragments at or behind it are discarded, the reference's
    depthTest behavior (index.js:177-181).
    """
    order = jnp.argsort(-proj.depth)  # front first (depth<0, near = larger)
    mean2d = proj.mean2d[order]
    conic = proj.conic[order]
    color = proj.color[order]
    depth = proj.depth[order]
    opacity = jnp.where(proj.mask, proj.opacity, 0.0)[order]

    d = pixel_xy[:, None, :] - mean2d[None, :, :]      # (P, N, 2)
    dx, dy = d[..., 0], d[..., 1]
    power = -0.5 * (
        conic[None, :, 0] * dx * dx
        + 2.0 * conic[None, :, 1] * dx * dy
        + conic[None, :, 2] * dy * dy
    )
    alpha = jnp.where(power >= POWER_CUTOFF, jnp.exp(power), 0.0) * opacity[None, :]
    if zbuf_px is not None:
        alpha = jnp.where(depth[None, :] > zbuf_px[:, None], alpha, 0.0)
    if alpha_clip is not None:
        alpha = jnp.minimum(alpha, alpha_clip)

    one_minus = 1.0 - alpha
    # exclusive cumprod: T_i = prod_{j<i}(1 - a_j)
    trans = jnp.concatenate(
        [jnp.ones_like(one_minus[:, :1]), jnp.cumprod(one_minus, axis=-1)[:, :-1]],
        axis=-1,
    )
    w = alpha * trans                                   # (P, N)
    with jax.default_matmul_precision("highest"):
        rgb = w @ color                                 # (P, 3)
    a_out = 1.0 - jnp.prod(one_minus, axis=-1)
    return jnp.concatenate([rgb, a_out[:, None]], axis=-1)


def render_projected_reference(
    proj: ProjectedGaussians,
    width: int,
    height: int,
    *,
    pixel_chunk: int = 1024,
    alpha_clip: Optional[float] = None,
    zbuf: Optional[Array] = None,
) -> Array:
    """Rasterize projected gaussians to an (H, W, 4) image, row 0 on top.

    zbuf: optional (H, W) camera-z of opaque geometry (row 0 top)."""
    xs = jnp.arange(width, dtype=jnp.float32) + 0.5
    ys = jnp.arange(height, dtype=jnp.float32) + 0.5  # y-up rows
    px, py = jnp.meshgrid(xs, ys)                      # (H, W)
    pix = jnp.stack([px.ravel(), py.ravel()], axis=-1)  # (H*W, 2)

    total = pix.shape[0]
    pad = (-total) % pixel_chunk
    pix = jnp.pad(pix, ((0, pad), (0, 0)))
    chunks = pix.reshape(-1, pixel_chunk, 2)

    if zbuf is not None:
        zb = jnp.asarray(zbuf, jnp.float32)[::-1].ravel()   # y-up order
        zb = jnp.pad(zb, (0, pad), constant_values=-jnp.inf)
        zchunks = zb.reshape(-1, pixel_chunk)
        out = jax.lax.map(
            lambda a: composite_pixels(
                proj, a[0], alpha_clip=alpha_clip, zbuf_px=a[1]
            ),
            (chunks, zchunks),
        )
    else:
        out = jax.lax.map(
            lambda p: composite_pixels(proj, p, alpha_clip=alpha_clip),
            chunks,
        )
    img = out.reshape(-1, 4)[:total].reshape(height, width, 4)
    return img[::-1]  # y-up -> row 0 top


def render_reference(
    scene: GaussianScene,
    camera: Camera,
    *,
    viewer_exact: bool = False,
    cutout: Optional[Array] = None,
    pixel_chunk: int = 1024,
    alpha_clip="auto",
    zbuf: Optional[Array] = None,
) -> Array:
    """Ground-truth render of a scene. (H, W, 4) float32 in [0, 1].

    viewer_exact=True additionally applies the viewer's int16 covariance
    quantization (index.js:371-387) so output matches what the WebGL viewer
    actually displays, bit-for-bit math-wise.

    alpha_clip follows splatjax.render's "auto" convention (0.999 clamp
    outside viewer_exact mode) so golden/gradient comparisons against the
    tiled pipeline share identical blending by default.
    """
    from splatjax.render import resolve_alpha_clip

    alpha_clip = resolve_alpha_clip(alpha_clip, viewer_exact)
    cov3d = build_covariances(scene.quats, scene.scales)
    if viewer_exact:
        q, qs = quantize_covariances_int16(covariance_upper(cov3d))
        cov3d = cov6_to_mat(dequantize_covariances_int16(q, qs))
    proj = project_gaussians(
        scene.means,
        cov3d,
        scene.colors,
        scene.opacities,
        camera.modelview,
        camera.projection,
        camera.width,
        camera.height,
        max_scales=jnp.max(scene.scales, axis=-1),
        cutout=cutout,
        sh=scene.sh,
    )
    return render_projected_reference(
        proj,
        camera.width,
        camera.height,
        pixel_chunk=pixel_chunk,
        alpha_clip=alpha_clip,
        zbuf=zbuf,
    )
