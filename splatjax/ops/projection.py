"""Gaussian projection: 3D covariance -> screen-space conic, culls, depths.

This is a differentiable, batched JAX implementation of the reference's
vertex-shader math (index.js:101-164) plus the sort-worker culls
(index.js:507-554). Both the pure-JAX ground-truth rasterizer and the Pallas
tile pipeline consume its outputs, so "viewer parity" is established once,
here.

Conventions
-----------
* Screen frame is the shader's: x right, y **up**, pixel centers at
  half-integers; ``mean2d = ((ndc_x+1) W/2, (ndc_y+1) H/2)``. Rasterizers
  produce bottom-up images and flip rows at the very end.
* ``depth`` is camera-space z (negative in front of the camera, matching the
  worker's ``view . center`` metric, index.js:519-523). Front-to-back order
  is descending depth.
* The conic is the inverse of the *clamped* 2D covariance reconstructed from
  the shader's eigen-axes (lambda2 >= 0.1, axis length <= 1024 px,
  index.js:143-149), so the rendered footprint matches the shader's quad
  exactly, including the exp(-4) cutoff (index.js:172).
"""
from __future__ import annotations

import dataclasses
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

Array = jax.Array

# Shader quad corners sit at +/-2 in eigen-axis units (index.js:56-61), i.e.
# the rendered extent is 2*|v1| + 2*|v2| per screen axis.
QUAD_HALF_EXTENT = 2.0
# Fragment shader discards where -(u^2+v^2) < -4 (index.js:172).
POWER_CUTOFF = -4.0
# Worker cull threshold: keep if max_scale*opacity > 1e-4 * |depth|
# (index.js:509, 548).
SIZE_CULL_THRESHOLD = 1e-4
# Vertex-shader frustum guard band: cull beyond 1.2 * w (index.js:110).
FRUSTUM_GUARD = 1.2


@jax.tree_util.register_dataclass
@dataclasses.dataclass(frozen=True)
class ProjectedGaussians:
    """Per-Gaussian screen-space quantities (all shapes (N, ...))."""

    mean2d: Array        # (N, 2) pixel center, y-up frame
    conic: Array         # (N, 3) (A, B, C): power = -0.5(A dx^2 + 2B dxdy + C dy^2)
    depth: Array         # (N,) camera-space z (negative in front)
    mask: Array          # (N,) bool: survives all culls
    bbox_half: Array     # (N, 2) conservative half-extent of the quad, pixels
    color: Array         # (N, 3)
    opacity: Array       # (N,)


def eval_sh(sh: Array, dc_color: Array, dirs: Array) -> Array:
    """Evaluate real SH (degree<=3) view-dependent color.

    The reference bakes only the DC band at .ply conversion
    (0.5 + SH_C0*f_dc, index.js:727-731); training wants the full basis.
    sh: (N, K, 3) bands >= 1; dc_color: (N, 3) already-activated DC color;
    dirs: (N, 3) unit view directions (gaussian - camera position).
    """
    result = dc_color - 0.5
    if sh is not None and sh.shape[1] > 0:
        x, y, z = dirs[:, 0:1], dirs[:, 1:2], dirs[:, 2:3]
        k = sh.shape[1]
        basis = [
            -0.4886025119029199 * y,
            0.4886025119029199 * z,
            -0.4886025119029199 * x,
        ]
        if k > 3:
            xx, yy, zz, xy, yz, xz = x * x, y * y, z * z, x * y, y * z, x * z
            basis += [
                1.0925484305920792 * xy,
                -1.0925484305920792 * yz,
                0.31539156525252005 * (2.0 * zz - xx - yy),
                -1.0925484305920792 * xz,
                0.5462742152960396 * (xx - yy),
            ]
        if k > 8:
            basis += [
                -0.5900435899266435 * y * (3 * xx - yy),
                2.890611442640554 * xy * z,
                -0.4570457994644658 * y * (4 * zz - xx - yy),
                0.3731763325901154 * z * (2 * zz - 3 * xx - 3 * yy),
                -0.4570457994644658 * x * (4 * zz - xx - yy),
                1.445305721320277 * z * (xx - yy),
                -0.5900435899266435 * x * (xx - 3 * yy),
            ]
        b = jnp.concatenate(basis[:k], axis=-1)  # (N, K)
        result = result + jnp.einsum("nk,nkc->nc", b, sh)
    return jnp.clip(result + 0.5, 0.0, None)


def project_gaussians(
    means: Array,
    cov3d: Array,
    colors: Array,
    opacities: Array,
    modelview: Array,
    projection: Array,
    width: int,
    height: int,
    *,
    max_scales: Optional[Array] = None,
    cutout: Optional[Array] = None,
    sh: Optional[Array] = None,
    camera_pos: Optional[Array] = None,
    support_eps: Optional[float] = None,
) -> ProjectedGaussians:
    """Project N Gaussians to screen space with all reference culls.

    Args:
      means: (N, 3) world positions.
      cov3d: (N, 3, 3) world covariances.
      colors / opacities: (N, 3), (N,).
      modelview / projection: (4, 4).
      max_scales: (N,) max linear scale per gaussian, for the worker's
        tiny-transparent cull (index.js:396-397, 548). If None, derived from
        the covariance (sqrt of max diagonal entry — equal for axis extents).
      cutout: optional (4, 4) world->unit-box matrix; splats outside
        [-0.5, 0.5]^3 are culled with the worker's Y-negation quirk
        (index.js:533-540).
      sh / camera_pos: optional SH bands and camera world position for
        view-dependent color.
      support_eps: optional opacity-aware support bound: a fragment is
        invisible once exp(power) * opacity < eps, so the per-splat power
        cutoff tightens from the shader's fixed 4 (index.js:172) to
        t_eff = min(4, ln(opacity / eps)) and the binned bbox shrinks by
        sqrt(t_eff / 4) (to a single center-tile instance at
        opacity <= eps — NOT a hard cull: during training a splat whose
        opacity dips below eps must keep its O(1) opacity gradient
        through that one instance, or it could never recover). Every
        dropped fragment contributes alpha < eps, consistent with the
        rasterizer's early_stop error budget (render passes early_stop
        here). None (or 0) keeps the exact cutoff-4 support — required
        for viewer parity.
    """
    return _project_f32(
        means, cov3d, colors, opacities, modelview, projection,
        width, height, max_scales, cutout, sh, camera_pos, support_eps,
    )


def _project_f32(
    means, cov3d, colors, opacities, modelview, projection,
    width, height, max_scales, cutout, sh, camera_pos,
    support_eps=None,
) -> ProjectedGaussians:
    means = jnp.asarray(means, jnp.float32)
    cov3d = jnp.asarray(cov3d, jnp.float32)
    colors = jnp.asarray(colors, jnp.float32)
    opacities = jnp.asarray(opacities, jnp.float32)
    mv = jnp.asarray(modelview, jnp.float32)
    proj = jnp.asarray(projection, jnp.float32)
    focal = (height / 2.0) * jnp.abs(proj[1, 1])  # index.js:191

    # All transforms written elementwise: exact f32 on the VPU (TPU f32
    # matmuls default to bf16 MXU passes, which breaks 1e-3 viewer parity,
    # and batched tiny matmuls are slow there anyway).
    cam = (
        means[:, 0:1] * mv[None, :3, 0]
        + means[:, 1:2] * mv[None, :3, 1]
        + means[:, 2:3] * mv[None, :3, 2]
        + mv[None, :3, 3]
    )                                                 # (N, 3) camera space
    pos2d = (
        cam[:, 0:1] * proj[None, :3, 0]
        + cam[:, 1:2] * proj[None, :3, 1]
        + cam[:, 2:3] * proj[None, :3, 2]
        + proj[None, :3, 3]
    )                                                 # clip xyz
    w_clip = (
        cam[:, 0] * proj[3, 0] + cam[:, 1] * proj[3, 1]
        + cam[:, 2] * proj[3, 2] + proj[3, 3]
    )                                                 # clip w

    bounds = FRUSTUM_GUARD * w_clip
    in_frustum = (
        (pos2d[:, 2] >= -w_clip)
        & (pos2d[:, 0] >= -bounds) & (pos2d[:, 0] <= bounds)
        & (pos2d[:, 1] >= -bounds) & (pos2d[:, 1] <= bounds)
    )  # index.js:110-115

    x, y, z = cam[:, 0], cam[:, 1], cam[:, 2]
    safe_z = jnp.where(jnp.abs(z) < 1e-8, 1e-8, z)
    fz = focal / safe_z
    fz2 = focal / (safe_z * safe_z)
    # J as the shader's column-major mat3 (index.js:127-131) has only two
    # nonzero columns: col0 = (f/z, 0, -f x/z^2), col1 = (0, -f/z, f y/z^2).
    # With W = mat3(MV)^T (index.js:133), T = W J collapses to two (N, 3)
    # column vectors t0, t1 built from rows of MV:
    #   t0 = (f/z) mv_row0 - (f x/z^2) mv_row2
    #   t1 = -(f/z) mv_row1 + (f y/z^2) mv_row2
    t0 = fz[:, None] * mv[None, 0, :3] - (x * fz2)[:, None] * mv[None, 2, :3]
    t1 = -fz[:, None] * mv[None, 1, :3] + (y * fz2)[:, None] * mv[None, 2, :3]
    # cov2d = T^T Vrk T entries via u_i = Sigma t_i (index.js:135)
    u0 = jnp.sum(cov3d * t0[:, None, :], axis=-1)      # (N, 3)
    u1 = jnp.sum(cov3d * t1[:, None, :], axis=-1)
    a = jnp.sum(t0 * u0, axis=-1) + 0.3                # index.js:139-141
    b = jnp.sum(t1 * u0, axis=-1)
    c = jnp.sum(t1 * u1, axis=-1) + 0.3

    mid = 0.5 * (a + c)
    # double-where keeps sqrt's backward finite at r2 == 0 (isotropic or
    # degenerate covariances, e.g. pruned slots during training: a == c,
    # b == 0 makes d sqrt/d r2 infinite and NaNs the whole gradient tree)
    r2 = jnp.square((a - c) / 2.0) + jnp.square(b)
    r2_pos = r2 > 0.0
    radius = jnp.where(r2_pos, jnp.sqrt(jnp.where(r2_pos, r2, 1.0)), 0.0)
    lam1 = mid + radius
    lam2 = jnp.maximum(mid - radius, 0.1)              # index.js:146

    # Eigenvector of lam1; safe fallback to (1, 0) when (b, lam1-a) ~ 0,
    # which is the correct axis-aligned limit (GLSL normalize(0) is undefined
    # there; measure-zero for real scenes).
    vx, vy = b, lam1 - a
    # guard the sqrt *argument*, not just the division: at v2 == 0 (exactly
    # isotropic or degenerate covariance) sqrt's backward is infinite and
    # 0-cotangent * inf = NaN even under the outer where
    v2 = vx * vx + vy * vy
    ok = v2 > 1e-24
    vnorm = jnp.sqrt(jnp.where(ok, v2, 1.0))
    dvx = jnp.where(ok, vx / vnorm, 1.0)
    dvy = jnp.where(ok, vy / vnorm, 0.0)

    len1 = jnp.minimum(jnp.sqrt(2.0 * lam1), 1024.0)   # index.js:148-149
    len2 = jnp.minimum(jnp.sqrt(2.0 * jnp.maximum(lam2, 0.0)), 1024.0)
    lam1_eff = 0.5 * len1 * len1
    lam2_eff = jnp.maximum(0.5 * len2 * len2, 1e-8)

    # conic = inverse of the clamped covariance, in the same eigenbasis
    inv1 = 1.0 / jnp.maximum(lam1_eff, 1e-8)
    inv2 = 1.0 / lam2_eff
    conic_a = inv1 * dvx * dvx + inv2 * dvy * dvy
    conic_b = (inv1 - inv2) * dvx * dvy
    conic_c = inv1 * dvy * dvy + inv2 * dvx * dvx
    conic = jnp.stack([conic_a, conic_b, conic_c], axis=-1)

    safe_w = jnp.where(jnp.abs(w_clip) < 1e-8, 1e-8, w_clip)
    ndc = pos2d[:, :2] / safe_w[:, None]
    mean2d = jnp.stack(
        [(ndc[:, 0] + 1.0) * (width / 2.0), (ndc[:, 1] + 1.0) * (height / 2.0)],
        axis=-1,
    )

    # Tight pixel bbox of the *rendered support*: fragments are discarded
    # beyond power < -4 (index.js:172), i.e. the ellipse
    # {d : 0.5 d^T conic d <= 4}, whose axis-aligned extent is
    # sqrt(8 * Sigma'_xx) per axis. This is never larger than the quad's
    # own bbox (corners at +/-2 eigen units, index.js:56-61/160-163 — up to
    # sqrt(2) looser for rotated splats) and never cuts visible fragments,
    # so binning work drops ~25% with identical images.
    cov_xx = lam1_eff * dvx * dvx + lam2_eff * dvy * dvy
    cov_yy = lam1_eff * dvy * dvy + lam2_eff * dvx * dvx
    bbox_half = jnp.stack(
        [
            jnp.sqrt(8.0 * jnp.maximum(cov_xx, 0.0)),
            jnp.sqrt(8.0 * jnp.maximum(cov_yy, 0.0)),
        ],
        axis=-1,
    )

    depth = z
    if support_eps is not None and support_eps > 0.0:
        # Opacity-aware support: exp(power) * opa < eps is invisible, so
        # the effective cutoff is t_eff = min(4, ln(opa/eps)) and the
        # ellipse extent scales by sqrt(t_eff/4). Index-only math
        # (stop_gradient: bbox_half feeds no differentiable output; the
        # double-where keeps sqrt's JVP finite at t_eff == 0).
        t_eff = jnp.clip(
            jnp.log(jnp.maximum(opacities, 1e-30))
            - float(np.log(support_eps)),
            0.0, 4.0,
        )
        pos = t_eff > 0.0
        shrink = jnp.where(
            pos, jnp.sqrt(jnp.where(pos, t_eff, 1.0) * 0.25), 0.0
        )
        bbox_half = bbox_half * jax.lax.stop_gradient(shrink)[:, None]
    if max_scales is None:
        max_scales = jnp.sqrt(
            jnp.maximum(
                jnp.max(
                    jnp.stack(
                        [cov3d[:, 0, 0], cov3d[:, 1, 1], cov3d[:, 2, 2]], -1
                    ),
                    axis=-1,
                ),
                0.0,
            )
        )
    # Worker culls (index.js:548): depth < 0 and size*opacity > 1e-4*(-depth).
    size_keep = (depth < 0.0) & (
        max_scales * opacities > SIZE_CULL_THRESHOLD * (-depth)
    )

    mask = in_frustum & size_keep

    if cutout is not None:
        p = means * jnp.array([1.0, -1.0, 1.0], dtype=jnp.float32)  # :533
        h = (
            p[:, 0:1] * cutout[None, :3, 0]
            + p[:, 1:2] * cutout[None, :3, 1]
            + p[:, 2:3] * cutout[None, :3, 2]
            + cutout[None, :3, 3]
        )
        hw = (
            p[:, 0] * cutout[3, 0] + p[:, 1] * cutout[3, 1]
            + p[:, 2] * cutout[3, 2] + cutout[3, 3]
        )
        q = h / jnp.where(jnp.abs(hw) < 1e-12, 1e-12, hw)[:, None]
        inside = jnp.all((q >= -0.5) & (q <= 0.5), axis=-1)  # :537-540
        mask = mask & inside

    out_color = colors
    if sh is not None:
        if camera_pos is None:
            # camera world position = -R^T t of the modelview
            camera_pos = -(mv[:3, :3].T @ mv[:3, 3])
        dirs = means - camera_pos
        dirs = dirs / jnp.maximum(
            jnp.linalg.norm(dirs, axis=-1, keepdims=True), 1e-12
        )
        out_color = eval_sh(sh, colors, dirs)

    return ProjectedGaussians(
        mean2d=mean2d,
        conic=conic,
        depth=depth,
        mask=mask,
        bbox_half=bbox_half,
        color=out_color,
        opacity=opacities,
    )
