"""Multi-chip rendering: primitive-sharded projection -> tile-sharded
rasterization via shard_map.

Design (SURVEY.md §5, BASELINE.json config 5):

  * gaussians are sharded over the mesh axis — each device projects N/D
    primitives (embarrassingly parallel VPU work);
  * projected screen-space features (13 floats/gaussian) are all_gathered
    over ICI — at 1M gaussians that is ~52 MB, far below ICI bandwidth per
    frame budget;
  * the image is sharded as horizontal *bands of tile rows* — each device
    shifts mean2d.y into band-local coordinates and runs the standard
    binning + Pallas rasterizer for its own band, so the single-chip kernel
    is reused unchanged;
  * backward: jax autodiff through shard_map turns the all_gather into a
    reduce-scatter (psum) of splat gradients automatically, and the
    projection backward is local to each device's primitive shard.

The band-shift trick means per-device binning only keeps gaussians whose
quad bbox intersects the band (the off-band ones clamp to an empty span),
so duplication work also scales ~1/D.
"""
from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, PartitionSpec as P
from jax import shard_map

from splatjax.camera import Camera
from splatjax.ops.binning import TileConfig, bin_gaussians
from splatjax.ops.projection import ProjectedGaussians, project_gaussians
from splatjax.ops.rasterize import tiles_to_image
from splatjax.ops.rasterize_vjp import rasterize_tiles
from splatjax.render import default_capacity
from splatjax.scene import GaussianScene, build_covariances

Array = jax.Array


def _pack_projected(proj: ProjectedGaussians) -> Array:
    """(N, 13) float32: mean2d, conic, color, opacity, depth, bbox, mask."""
    return jnp.concatenate(
        [
            proj.mean2d,
            proj.conic,
            proj.color,
            proj.opacity[:, None],
            proj.depth[:, None],
            proj.bbox_half,
            proj.mask.astype(jnp.float32)[:, None],
        ],
        axis=-1,
    )


def _unpack_projected(packed: Array) -> ProjectedGaussians:
    return ProjectedGaussians(
        mean2d=packed[:, 0:2],
        conic=packed[:, 2:5],
        color=packed[:, 5:8],
        opacity=packed[:, 8],
        depth=packed[:, 9],
        bbox_half=packed[:, 10:12],
        mask=packed[:, 12] > 0.5,
    )


def padded_band_height(height: int, n_devices: int, tile: int) -> int:
    """Pad image height so each device owns an equal band of tile rows."""
    rows = -(-height // tile)
    rows_per_dev = -(-rows // n_devices)
    return rows_per_dev * tile


def render_sharded(
    scene: GaussianScene,
    camera: Camera,
    mesh: Mesh,
    *,
    axis: str = "dev",
    tile_size: int = 16,
    capacity: Optional[int] = None,
    alpha_clip="auto",
    early_stop: float = 1e-4,
    return_overflow: bool = False,
) -> Array:
    """Render across all devices of ``mesh`` (1-D axis). Returns (H, W, 4)
    (or ``(image, overflow)`` with ``return_overflow=True``, where overflow
    is the (D,) per-band count of instances dropped at capacity).

    Gaussian count must divide by the axis size (pad the scene if needed);
    per-device instance capacity defaults to the single-chip heuristic
    divided by the axis size. NOTE: the /D default assumes roughly uniform
    band occupancy — a view whose splats concentrate in one horizontal band
    can overflow it; monitor with return_overflow or raise ``capacity``.
    """
    from splatjax.render import resolve_alpha_clip

    alpha_clip = resolve_alpha_clip(alpha_clip, False)
    n_dev = mesh.shape[axis]
    n = scene.num_gaussians
    if n % n_dev:
        raise ValueError(f"gaussian count {n} not divisible by mesh axis {n_dev}")
    if capacity is None:
        capacity = max(default_capacity(n) // n_dev, 1024)

    band_h = padded_band_height(camera.height, n_dev, tile_size)
    cfg_band = TileConfig(camera.width, band_h, tile_size, tile_size)

    def shard_fn(means, scales, quats, colors, opacities, mv, pr):
        proj_local = project_gaussians(
            means, cov3d=build_covariances(quats, scales),
            colors=colors, opacities=opacities,
            modelview=mv, projection=pr,
            width=camera.width, height=camera.height,
            max_scales=jnp.max(scales, axis=-1),
        )
        packed = _pack_projected(proj_local)              # (N/D, 13)
        packed_all = jax.lax.all_gather(
            packed, axis, axis=0, tiled=True
        )                                                  # (N, 13)
        proj = _unpack_projected(packed_all)
        d = jax.lax.axis_index(axis)
        # shift into band-local pixel coordinates (y-up, bands bottom-up)
        shift = (d * band_h).astype(jnp.float32)
        proj = ProjectedGaussians(
            mean2d=proj.mean2d - jnp.stack(
                [jnp.zeros_like(shift), shift]
            )[None, :],
            conic=proj.conic,
            depth=proj.depth,
            mask=proj.mask,
            bbox_half=proj.bbox_half,
            color=proj.color,
            opacity=proj.opacity,
        )
        binned = bin_gaussians(proj, cfg_band, capacity)
        out_tiles, _ = rasterize_tiles(
            binned.feat, binned.starts, binned.ends, cfg_band,
            alpha_clip, early_stop,
        )
        return out_tiles, binned.overflow[None]            # (T_band, P, 8), (1,)

    fn = shard_map(
        shard_fn,
        mesh=mesh,
        in_specs=(P(axis), P(axis), P(axis), P(axis), P(axis), P(), P()),
        out_specs=(P(axis), P(axis)),
        check_vma=False,
    )
    out_tiles, overflow = fn(
        jnp.asarray(scene.means, jnp.float32),
        jnp.asarray(scene.scales, jnp.float32),
        jnp.asarray(scene.quats, jnp.float32),
        jnp.asarray(scene.colors, jnp.float32),
        jnp.asarray(scene.opacities, jnp.float32),
        camera.modelview,
        camera.projection,
    )
    # bands are stacked along the tile axis bottom-up; assemble globally
    cfg_full = TileConfig(
        camera.width, band_h * n_dev, tile_size, tile_size
    )
    img = tiles_to_image(out_tiles, cfg_full)
    # tiles_to_image flips to row-0-top of the padded image; crop the pad
    # (which sits at the top after the flip)
    img = img[band_h * n_dev - camera.height:]
    if return_overflow:
        return img, overflow
    return img
