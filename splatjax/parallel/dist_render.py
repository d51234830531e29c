"""Multi-chip rendering: primitive-sharded projection -> tile-sharded
rasterization via shard_map.

Design (SURVEY.md §5, BASELINE.json config 5):

  * gaussians are sharded over the mesh (1-D axis or a 2-D
    ('host', 'chip') mesh — pass ``axis`` as a name or tuple of names;
    collectives ride the flattened axes, so ICI carries the intra-host
    part and DCN only the cross-host slices);
  * the image is sharded as horizontal *bands of tile rows* — one band per
    device — and each device runs the standard binning + fused Pallas
    rasterizer for its own band, reusing the single-chip kernels
    unchanged (mean2d.y is shifted into band-local coordinates);
  * redistribution between the two shardings is an ALL_TO_ALL of exactly
    the projected gaussians whose screen bbox intersects each band
    (default), not an all_gather of everything: per-device memory and
    binning work scale ~1/D instead of O(N). Per (source, dest) transfers
    are fixed-capacity (static shapes); dropped rows are counted and
    surfaced. ``redistribute="all_gather"`` keeps the simple O(N)
    correctness path for comparison;
  * backward: jax autodiff through shard_map transposes the all_to_all
    into the reverse all_to_all and the projection backward stays local;
    parameter gradients reduce over the mesh automatically.
"""
from __future__ import annotations

import functools
from typing import Optional, Sequence, Union

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, PartitionSpec as P
from jax import shard_map

from splatjax.camera import Camera
from splatjax.ops.binning import (
    TileConfig,
    bin_gaussians,
    features_from_projection,
)
from splatjax.ops.projection import ProjectedGaussians, project_gaussians
from splatjax.ops.rasterize import tiles_to_image
from splatjax.ops.rasterize_vjp import rasterize_gathered
from splatjax.render import default_capacity, resolve_alpha_clip
from splatjax.scene import GaussianScene, build_covariances

Array = jax.Array
AxisName = Union[str, Sequence[str]]

# Max bands a single gaussian may be duplicated into during redistribution.
# A band is >= one tile row (16 px); at sane capacities a splat's rendered
# bbox rarely spans more than 2 bands — spans beyond MAX_BANDS are counted
# as dropped (surfaced via return_overflow), not silently lost.
MAX_BANDS = 4


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


def _axis_flat_index(axis: AxisName):
    if isinstance(axis, str):
        return jax.lax.axis_index(axis)
    idx = jax.lax.axis_index(axis[0])
    for name in axis[1:]:
        idx = idx * jax.lax.axis_size(name) + jax.lax.axis_index(name)
    return idx


def _mesh_axis_size(mesh: Mesh, axis: AxisName) -> int:
    if isinstance(axis, str):
        return mesh.shape[axis]
    out = 1
    for name in axis:
        out *= mesh.shape[name]
    return out


def _band_render_body(
    means, scales, quats, colors, opacities, sh, mv, pr, *,
    axis: AxisName, n_dev: int, width: int, height: int, band_h: int,
    cfg_band: TileConfig, pair_capacity: int, capacity: int,
    alpha_clip, early_stop: float, redistribute: str,
    packed16: bool = False,
):
    """Per-device body of the band-sharded render (runs inside shard_map
    over ``axis``): local projection (incl. optional SH view-dependent
    color — a zero-band (n, 0, 3) ``sh`` is a no-op) -> fixed-capacity
    all_to_all redistribution -> band-local binning + fused rasterize.
    Returns (out_tiles PLANAR (T_band, 8, P), my_drop (1,)).
    Differentiable — jax
    transposes the all_to_all/all_gather and keeps parameter gradients on
    the owning shard."""
    proj_local = project_gaussians(
        means, cov3d=build_covariances(quats, scales),
        colors=colors, opacities=opacities,
        modelview=mv, projection=pr,
        width=width, height=height,
        max_scales=jnp.max(scales, axis=-1),
        sh=sh if sh.shape[1] > 0 else None,
        # same opacity-aware support bound as the single-chip render()
        # (early_stop=0.0 disables it, keeping exact-parity runs exact)
        support_eps=early_stop if early_stop > 0.0 else None,
    )
    packed = _pack_projected(proj_local)              # (n_loc, 13)
    pair_drop = jnp.zeros((n_dev,), jnp.int32)

    if redistribute == "all_gather":
        packed_all = jax.lax.all_gather(
            packed, axis, axis=0, tiled=True
        )                                              # (N, 13)
    else:
        # bands intersected by each gaussian's rendered bbox
        my = proj_local.mean2d[:, 1]
        by = proj_local.bbox_half[:, 1]
        fb0 = jnp.floor((my - by) / band_h).astype(jnp.int32)
        fb1 = jnp.floor((my + by) / band_h).astype(jnp.int32)
        on = proj_local.mask & (fb1 >= 0) & (fb0 <= n_dev - 1)
        b0 = jnp.clip(fb0, 0, n_dev - 1)
        b1 = jnp.clip(fb1, 0, n_dev - 1)
        # spans beyond MAX_BANDS keep the window of MAX_BANDS consecutive
        # bands CENTERED on the band containing the gaussian's mean (its
        # densest coverage); the cut bands are counted per losing band
        # below, not estimated
        bc = jnp.clip(
            jnp.floor(my / band_h).astype(jnp.int32), b0, b1
        )
        w0 = jnp.clip(bc - (MAX_BANDS - 1) // 2, b0,
                      jnp.maximum(b1 - MAX_BANDS + 1, b0))
        dests = w0[None, :] + jnp.arange(
            MAX_BANDS, dtype=jnp.int32
        )[:, None]                                      # (MAXB, n_loc)
        ok = on[None, :] & (dests <= b1[None, :])
        dest = jnp.where(ok, dests, n_dev).reshape(-1)  # sentinel last
        order_key, e_sorted = jax.lax.sort(
            (dest, jnp.arange(dest.shape[0], dtype=jnp.int32)),
            is_stable=True, num_keys=1,
        )
        bounds = jnp.searchsorted(
            order_key, jnp.arange(n_dev + 1, dtype=jnp.int32),
            side="left",
        )
        n_loc = means.shape[0]
        idx = bounds[:-1, None] + jnp.arange(
            pair_capacity, dtype=jnp.int32
        )[None, :]                                      # (D, cap_pair)
        take = jnp.minimum(idx, dest.shape[0] - 1)
        src_g = e_sorted[take] % n_loc
        valid_row = idx < bounds[1:, None]
        send = jnp.where(
            valid_row[:, :, None], packed[src_g], 0.0
        )                                               # (D, cap, 13)
        pair_drop = jnp.maximum(
            bounds[1:] - bounds[:-1] - pair_capacity, 0
        ) + jnp.zeros((n_dev,), jnp.int32)
        # rows lost to the MAX_BANDS span cap, attributed EXACTLY to the
        # bands that lost coverage: every band of [b0, b1] outside the
        # kept window [w0, w0+MAXB) drops one instance of this gaussian
        band_ids = jnp.arange(n_dev, dtype=jnp.int32)[:, None]
        lost = (
            on[None, :]
            & (band_ids >= b0[None, :]) & (band_ids <= b1[None, :])
            & ((band_ids < w0[None, :])
               | (band_ids >= (w0 + MAX_BANDS)[None, :]))
        )                                               # (n_dev, n_loc)
        pair_drop = pair_drop + jnp.sum(lost.astype(jnp.int32), axis=1)
        recv = jax.lax.all_to_all(
            send, axis, split_axis=0, concat_axis=0, tiled=True
        )                                               # (D*cap, 13)
        packed_all = recv.reshape(n_dev * pair_capacity, 13)

    proj = _unpack_projected(packed_all)
    d = _axis_flat_index(axis)
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
    binned = bin_gaussians(proj, cfg_band, capacity, with_features=False)
    out_tiles, _ = rasterize_gathered(
        features_from_projection(proj),
        binned.gauss_id, binned.starts, binned.ends,
        binned.cum, binned.count, binned.perm,
        binned.cum_d, binned.count_d, binned.overflow,
        None, cfg_band, alpha_clip, early_stop, packed16,
    )
    # per-band total drop: local binning overflow + transfer drops
    # destined here from every source (psum'd)
    my_drop = binned.overflow + jax.lax.psum(
        pair_drop, axis
    )[d] if redistribute == "all_to_all" else binned.overflow
    return out_tiles, my_drop[None]


def render_sharded(
    scene: GaussianScene,
    camera: Camera,
    mesh: Mesh,
    *,
    axis: AxisName = "dev",
    tile_size: int = 16,
    capacity: Optional[int] = None,
    pair_capacity: Optional[int] = None,
    alpha_clip="auto",
    early_stop: float = 1e-4,
    redistribute: str = "all_to_all",
    return_overflow: bool = False,
) -> Array:
    """Render across the devices of ``mesh``. Returns (H, W, 4) (or
    ``(image, overflow)`` with ``return_overflow=True``, where overflow is
    the (D,) per-band count of instances dropped at any capacity:
    per-pair transfer caps, MAX_BANDS spans, or binning capacity).

    Gaussian count must divide by the total axis size (pad if needed).
    ``capacity`` is the per-device binning instance cap (default: the
    single-chip heuristic on the per-device post-redistribution row count);
    ``pair_capacity`` caps each (source, dest) transfer (default
    6 * N / D^2 — tolerates ~2x band concentration, which real trained
    scenes exhibit; the round-3 default of 3x dropped ~3% of the trained
    fixture's instances and broke band parity). Concentrated views can
    still overflow — monitor with return_overflow and raise
    ``pair_capacity`` (up to 3 * N / D for fully-concentrated scenes).
    """
    alpha_clip = resolve_alpha_clip(alpha_clip, False)
    n_dev = _mesh_axis_size(mesh, axis)
    n = scene.num_gaussians
    if n % n_dev:
        raise ValueError(f"gaussian count {n} not divisible by mesh size {n_dev}")
    n_loc = n // n_dev
    if pair_capacity is None:
        pair_capacity = max(-(-6 * n_loc // n_dev // 128) * 128, 128)
    recv_rows = n_dev * pair_capacity if redistribute == "all_to_all" else n
    if capacity is None:
        capacity = max(default_capacity(recv_rows), 2048)

    band_h = padded_band_height(camera.height, n_dev, tile_size)
    cfg_band = TileConfig(camera.width, band_h, tile_size, tile_size)

    def shard_fn(means, scales, quats, colors, opacities, sh, mv, pr):
        return _band_render_body(
            means, scales, quats, colors, opacities, sh, mv, pr,
            axis=axis, n_dev=n_dev, width=camera.width,
            height=camera.height, band_h=band_h, cfg_band=cfg_band,
            pair_capacity=pair_capacity, capacity=capacity,
            alpha_clip=alpha_clip, early_stop=early_stop,
            redistribute=redistribute,
        )

    spec = P(axis if isinstance(axis, str) else tuple(axis))
    fn = shard_map(
        shard_fn,
        mesh=mesh,
        in_specs=(spec, spec, spec, spec, spec, spec, P(), P()),
        out_specs=(spec, spec),
        check_vma=False,
    )
    sh = (
        jnp.asarray(scene.sh, jnp.float32)
        if scene.sh is not None
        else jnp.zeros((n, 0, 3), jnp.float32)
    )
    # Deal gaussians round-robin to shards (shard s takes rows s, s+D,
    # s+2D, ...): index-contiguous shards of real assets are spatially
    # CLUSTERED (3DGS files are written in importance/creation order;
    # tiled fixtures repeat blocks), which concentrated 80-90% of a shard
    # into one band on the trained fixture and overflowed the per-pair
    # transfer caps. Dealing gives every shard the same spatial mix, so
    # pair loads drop from ~|shard| to ~|band|/D (measured 4550 -> ~600
    # of a 5000-row shard at 8 devices). Ordering is semantically free
    # for a gaussian set; the permutation is deterministic and static.
    deal = jnp.arange(n).reshape(n // n_dev, n_dev).T.reshape(-1)

    def _deal(a):
        return jnp.take(jnp.asarray(a, jnp.float32), deal, axis=0)

    out_tiles, overflow = fn(
        _deal(scene.means),
        _deal(scene.scales),
        _deal(scene.quats),
        _deal(scene.colors),
        _deal(scene.opacities),
        jnp.take(sh, deal, axis=0),
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
