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
# as dropped (surfaced via return_overflow), not silently lost. Load-
# balanced bands can be as thin as HALF the equal share (_balanced_
# boundaries' min_rows corridor), so that mode doubles the window — the
# worst-case covered pixel height then matches equal-height mode.
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
    """Pad image height so each device owns an equal band of tile rows
    (the ``balance="equal"`` layout)."""
    rows = -(-height // tile)
    rows_per_dev = -(-rows // n_devices)
    return rows_per_dev * tile


def max_band_rows(height: int, n_devices: int, tile: int) -> int:
    """Static per-band tile-row capacity for LOAD-BALANCED bands: 4x the
    equal share (clamped to the total row count). The cap only exists to
    keep kernel/collective shapes static — each device rasterizes a
    max_band_rows-tall band and the assembly gather drops the unused tail
    rows — so it must be generous enough that COLD bands can stretch over
    sparse regions (sky, image borders): a tight cap forces boundaries
    into the cold tail and re-creates the imbalance the balancer exists
    to remove. Cost of the slack is static padding only: ~4x the tile
    all_gather bytes (a few extra ms-fractions on ICI) and empty-tile
    kernel walk, not extra instance work."""
    rows = -(-height // tile)
    return min(rows, 4 * (-(-rows // n_devices)))


def _balanced_boundaries(r0, r1, weight, on, n_rows, n_dev, max_rows, axis):
    """(D+1,) int32 tile-row band boundaries equalizing instance load.

    Load histogram: per tile row, the (weighted) count of locally
    projected instances whose rendered bbox covers it — weight is each
    gaussian's covered x-tile count, so a row's load approximates the
    duplicated-instance count binning will actually produce there. The
    histogram is psum'd over the band axis, so every device computes
    IDENTICAL boundaries from global information. Boundary d sits where
    the cumulative load crosses d/D of the total; a monotone clamp then
    enforces min_rows <= b_{d+1} - b_d <= max_rows and full coverage of
    [0, n_rows). min_rows is 1 (not a fraction of the equal share): a
    single hot tile row can legitimately carry more than a full band
    share, and forcing thicker bands there costs more balance than the
    extra span-window copies cost transport (the span window is doubled
    in load mode — _band_render_body)."""
    r = jnp.arange(n_rows, dtype=jnp.int32)[:, None]
    lo = jnp.clip(r0, 0, n_rows - 1)[None, :]
    hi = jnp.clip(r1, 0, n_rows - 1)[None, :]
    w = jnp.where(on, weight, 0.0)[None, :]
    cover = jnp.sum(
        jnp.where((r >= lo) & (r <= hi), w, 0.0), axis=1
    )                                                  # (n_rows,)
    cover = jax.lax.psum(cover, axis)
    cum = jnp.cumsum(cover)
    targets = cum[-1] * jnp.arange(1, n_dev, dtype=jnp.float32) / n_dev
    raw = jnp.searchsorted(cum, targets, side="left").astype(jnp.int32)

    min_rows = 1 if n_rows >= n_dev else 0   # empty bands ok when rows < D

    def fix(prev, xs):
        raw_d, d = xs
        lo_b = jnp.maximum(prev + min_rows,
                           n_rows - (n_dev - d) * max_rows)
        hi_b = jnp.minimum(prev + max_rows,
                           n_rows - (n_dev - d) * min_rows)
        b = jnp.clip(raw_d, lo_b, hi_b)
        return b, b

    _, mids = jax.lax.scan(
        fix, jnp.int32(0), (raw, jnp.arange(1, n_dev, dtype=jnp.int32))
    )
    return jnp.concatenate([
        jnp.zeros((1,), jnp.int32), mids,
        jnp.full((1,), n_rows, jnp.int32),
    ])


def _band_of(bounds, rows):
    """Band owning each (clipped, in-range) tile row; empty bands (equal
    consecutive boundaries) are skipped by the right-side search."""
    return (
        jnp.searchsorted(bounds, rows, side="right").astype(jnp.int32) - 1
    )


def _assemble_band_tiles(
    tiles_all: Array, bounds: Array, cfg_band: TileConfig,
    n_rows: int, height: int, background=None,
) -> Array:
    """Gather per-band planar tiles into global row order and assemble.

    tiles_all: (n_dev * T_band, 8, P) concatenated/all-gathered tiles;
    device d's T_band block holds its band's rows [bounds[d],
    bounds[d+1]) in its FIRST (bounds[d+1]-bounds[d]) tile rows (the
    max_band_rows tail is unused padding). The gather map reproduces the
    contiguous stack exactly when bands are equal-height, so the
    ``balance="equal"`` path keeps its old numerics."""
    tiles_x = cfg_band.tiles_x
    t_band_rows = cfg_band.tiles_y                    # static per-band cap
    r = jnp.arange(n_rows, dtype=jnp.int32)
    o = _band_of(bounds, r)
    lr = r - bounds[o]
    row_block = o * (t_band_rows * tiles_x) + lr * tiles_x
    idx = (
        row_block[:, None] + jnp.arange(tiles_x, dtype=jnp.int32)[None, :]
    ).reshape(-1)
    tiles_ordered = jnp.take(tiles_all, idx, axis=0)
    cfg_full = TileConfig(
        cfg_band.width, n_rows * cfg_band.tile_h,
        cfg_band.tile_w, cfg_band.tile_h,
    )
    img = tiles_to_image(tiles_ordered, cfg_full, background)
    # crop the row padding (sits at the top after the assembly flip)
    return img[n_rows * cfg_band.tile_h - height:]


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
    axis: AxisName, n_dev: int, width: int, height: int, n_rows: int,
    cfg_band: TileConfig, pair_capacity: int, capacity: int,
    alpha_clip, early_stop: float, redistribute: str,
    packed16: bool = False, balance: str = "load",
):
    """Per-device body of the band-sharded render (runs inside shard_map
    over ``axis``): local projection (incl. optional SH view-dependent
    color — a zero-band (n, 0, 3) ``sh`` is a no-op) -> per-frame band
    boundary choice -> fixed-capacity all_to_all redistribution ->
    band-local binning + fused rasterize.

    ``n_rows`` is the total tile-row count the bands partition;
    ``cfg_band.tiles_y`` is the static per-band row capacity. With
    ``balance="load"`` boundaries equalize the measured per-row instance
    load of THIS frame (psum'd histogram — identical on every device);
    ``balance="equal"`` reproduces the fixed equal-height layout (pass
    n_rows = n_dev * cfg_band.tiles_y).

    Returns (out_tiles PLANAR (T_band, 8, P), my_drop (1,), bounds
    (n_dev+1,) int32). Differentiable — jax transposes the
    all_to_all/all_gather and keeps parameter gradients on the owning
    shard (boundaries are integer-valued and carry no gradient; the band
    partition is an exact decomposition of the image either way)."""
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

    # tile-row span of each gaussian's rendered bbox (y-up band rows)
    tile_h = cfg_band.tile_h
    my = proj_local.mean2d[:, 1]
    by = proj_local.bbox_half[:, 1]
    r0 = jnp.floor((my - by) / tile_h).astype(jnp.int32)
    r1 = jnp.floor((my + by) / tile_h).astype(jnp.int32)
    on = proj_local.mask & (r1 >= 0) & (r0 <= n_rows - 1)

    if n_dev == 1:
        bounds = jnp.asarray([0, n_rows], jnp.int32)
    elif balance == "load":
        # weight = covered x-tile count: a row's load then approximates
        # the duplicated-instance count binning will produce there
        mx = proj_local.mean2d[:, 0]
        bx = proj_local.bbox_half[:, 0]
        tx0 = jnp.clip(
            jnp.floor((mx - bx) / cfg_band.tile_w), 0,
            cfg_band.tiles_x - 1,
        )
        tx1 = jnp.clip(
            jnp.floor((mx + bx) / cfg_band.tile_w), 0,
            cfg_band.tiles_x - 1,
        )
        bounds = _balanced_boundaries(
            r0, r1, tx1 - tx0 + 1.0, on, n_rows, n_dev,
            cfg_band.tiles_y, axis,
        )
    else:
        bounds = jnp.arange(n_dev + 1, dtype=jnp.int32) * cfg_band.tiles_y

    if redistribute == "all_gather":
        packed_all = jax.lax.all_gather(
            packed, axis, axis=0, tiled=True
        )                                              # (N, 13)
    else:
        # bands intersected by each gaussian's rendered bbox; balanced
        # bands can be thinner than the equal height (down to one tile
        # row in hot regions), so that mode doubles the span window —
        # spans still beyond it are cut with exact per-band drop
        # accounting below, surfaced via return_overflow
        max_bands = min(
            n_dev, MAX_BANDS if balance != "load" else 2 * MAX_BANDS
        )
        b0 = _band_of(bounds, jnp.clip(r0, 0, n_rows - 1))
        b1 = _band_of(bounds, jnp.clip(r1, 0, n_rows - 1))
        # spans beyond max_bands keep the window of max_bands consecutive
        # bands CENTERED on the band containing the gaussian's mean (its
        # densest coverage); the cut bands are counted per losing band
        # below, not estimated
        rc = jnp.clip(
            jnp.floor(my / tile_h).astype(jnp.int32),
            jnp.clip(r0, 0, n_rows - 1), jnp.clip(r1, 0, n_rows - 1),
        )
        bc = _band_of(bounds, rc)
        w0 = jnp.clip(bc - (max_bands - 1) // 2, b0,
                      jnp.maximum(b1 - max_bands + 1, b0))
        dests = w0[None, :] + jnp.arange(
            max_bands, dtype=jnp.int32
        )[:, None]                                      # (MAXB, n_loc)
        ok = on[None, :] & (dests <= b1[None, :])
        dest = jnp.where(ok, dests, n_dev).reshape(-1)  # sentinel last
        order_key, e_sorted = jax.lax.sort(
            (dest, jnp.arange(dest.shape[0], dtype=jnp.int32)),
            is_stable=True, num_keys=1,
        )
        seg = jnp.searchsorted(
            order_key, jnp.arange(n_dev + 1, dtype=jnp.int32),
            side="left",
        )
        n_loc = means.shape[0]
        idx = seg[:-1, None] + jnp.arange(
            pair_capacity, dtype=jnp.int32
        )[None, :]                                      # (D, cap_pair)
        take = jnp.minimum(idx, dest.shape[0] - 1)
        src_g = e_sorted[take] % n_loc
        valid_row = idx < seg[1:, None]
        send = jnp.where(
            valid_row[:, :, None], packed[src_g], 0.0
        )                                               # (D, cap, 13)
        pair_drop = jnp.maximum(
            seg[1:] - seg[:-1] - pair_capacity, 0
        ) + jnp.zeros((n_dev,), jnp.int32)
        # rows lost to the max_bands span cap, attributed EXACTLY to the
        # bands that lost coverage: every band of [b0, b1] outside the
        # kept window [w0, w0+MAXB) drops one instance of this gaussian
        band_ids = jnp.arange(n_dev, dtype=jnp.int32)[:, None]
        lost = (
            on[None, :]
            & (band_ids >= b0[None, :]) & (band_ids <= b1[None, :])
            & ((band_ids < w0[None, :])
               | (band_ids >= (w0 + max_bands)[None, :]))
        )                                               # (n_dev, n_loc)
        pair_drop = pair_drop + jnp.sum(lost.astype(jnp.int32), axis=1)
        recv = jax.lax.all_to_all(
            send, axis, split_axis=0, concat_axis=0, tiled=True
        )                                               # (D*cap, 13)
        packed_all = recv.reshape(n_dev * pair_capacity, 13)

    proj = _unpack_projected(packed_all)
    d = _axis_flat_index(axis)
    # shift into band-local pixel coordinates (y-up, bands bottom-up)
    shift = (bounds[d] * tile_h).astype(jnp.float32)
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
    return out_tiles, my_drop[None], bounds


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
    balance: str = "load",
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

    ``balance``: ``"load"`` (default) picks band boundaries per frame
    from the psum'd per-tile-row instance histogram, equalizing per-band
    work within a [half, 2x] equal-share corridor (real scenes load
    equal-height bands ~2x unevenly — docs/SCALING_EVIDENCE.md);
    ``"equal"`` keeps fixed equal-height bands.
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

    if balance == "load":
        band_rows = max_band_rows(camera.height, n_dev, tile_size)
        n_rows = -(-camera.height // tile_size)
    else:
        band_rows = padded_band_height(
            camera.height, n_dev, tile_size
        ) // tile_size
        n_rows = band_rows * n_dev
    cfg_band = TileConfig(
        camera.width, band_rows * tile_size, tile_size, tile_size
    )

    def shard_fn(means, scales, quats, colors, opacities, sh, mv, pr):
        return _band_render_body(
            means, scales, quats, colors, opacities, sh, mv, pr,
            axis=axis, n_dev=n_dev, width=camera.width,
            height=camera.height, n_rows=n_rows, cfg_band=cfg_band,
            pair_capacity=pair_capacity, capacity=capacity,
            alpha_clip=alpha_clip, early_stop=early_stop,
            redistribute=redistribute, balance=balance,
        )

    spec = P(axis if isinstance(axis, str) else tuple(axis))
    fn = shard_map(
        shard_fn,
        mesh=mesh,
        in_specs=(spec, spec, spec, spec, spec, spec, P(), P()),
        out_specs=(spec, spec, P()),
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

    out_tiles, overflow, bounds = fn(
        _deal(scene.means),
        _deal(scene.scales),
        _deal(scene.quats),
        _deal(scene.colors),
        _deal(scene.opacities),
        jnp.take(sh, deal, axis=0),
        camera.modelview,
        camera.projection,
    )
    # bands stack along the tile axis bottom-up; gather each band's real
    # rows into global row order and assemble
    img = _assemble_band_tiles(
        out_tiles, bounds, cfg_band, n_rows, camera.height
    )
    if return_overflow:
        return img, overflow
    return img
