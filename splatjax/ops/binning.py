"""Tile binning: duplicate gaussians per overlapped tile, sort, range-index.

TPU-native replacement for the reference's Web-Worker depth sort
(index.js:507-567). The worker sorts whole gaussians once per frame because
the GPU's ROP hardware resolves per-pixel coverage; on TPU the rasterizer is
a tiled kernel, so we instead build, *on device with static shapes*:

  1. per-gaussian tile span from the projected quad bbox,
  2. a duplicated instance list (gaussian, tile) of fixed capacity, built
     with a prefix-sum + searchsorted expansion (no dynamic shapes),
  3. a front-to-back (tile-major, depth-minor) order via two stable sorts
     (exact f32 depth — strictly finer than the worker's 16-bit buckets),
  4. contiguous per-tile [start, end) ranges via searchsorted.

Everything is jnp; gradients flow through the feature gather (its transpose
is the scatter-add back to gaussians), while index computations are
non-differentiable constants, as they should be.
"""
from __future__ import annotations

import dataclasses
import functools
from typing import NamedTuple

import jax
import jax.numpy as jnp

from splatjax.ops.projection import ProjectedGaussians

Array = jax.Array

# Feature row layout for the rasterizer (padded to 16 rows):
# 0: mean2d.x  1: mean2d.y  2: conic.a  3: conic.b  4: conic.c
# 5: color.r   6: color.g   7: color.b  8: opacity  9-15: pad
# Width 16 is deliberate: v5e row-gather cost is flat from 36 B to 64 B rows
# (measured 23.5-23.9 ms for 3M rows at 9/10/12/16 f32 columns), so there is
# nothing to win by narrowing, and 16 sublanes keep every kernel DMA window
# aligned to Mosaic's (8, 128) tiling without a pad/slice copy.
FEAT_DIM = 16


@dataclasses.dataclass(frozen=True)
class TileConfig:
    width: int
    height: int
    tile_w: int = 16
    tile_h: int = 16

    @property
    def tiles_x(self) -> int:
        return -(-self.width // self.tile_w)

    @property
    def tiles_y(self) -> int:
        return -(-self.height // self.tile_h)

    @property
    def num_tiles(self) -> int:
        return self.tiles_x * self.tiles_y

    @property
    def pixels_per_tile(self) -> int:
        return self.tile_w * self.tile_h


class BinnedInstances(NamedTuple):
    """Fixed-capacity, tile-sorted duplicated instances."""

    feat: Array        # (FEAT_DIM, K_cap) float32, feature-major, sorted order
    gauss_id: Array    # (K_cap,) int32 source gaussian per instance
    tile_id: Array     # (K_cap,) int32 (num_tiles == sentinel for invalid)
    starts: Array      # (num_tiles,) int32
    ends: Array        # (num_tiles,) int32
    num_instances: Array  # () int32 — total before capacity clamp
    overflow: Array    # () int32 — instances dropped due to capacity


def features_from_projection(proj: ProjectedGaussians) -> Array:
    """Pack per-gaussian screen features into the (N, 16) kernel layout."""
    n = proj.mean2d.shape[0]
    opacity = jnp.where(proj.mask, proj.opacity, 0.0)
    feat = jnp.concatenate(
        [
            proj.mean2d,
            proj.conic,
            proj.color,
            opacity[:, None],
            jnp.zeros((n, FEAT_DIM - 9), jnp.float32),
        ],
        axis=-1,
    )
    return feat.astype(jnp.float32)


@jax.custom_vjp
def gather_features(feat_n: Array, gid: Array, cum: Array, count: Array) -> Array:
    """(N, 9) features + (K,) ids -> (9, K) feature-major gathered rows.

    Forward is a plain row gather. The backward replaces XLA's scatter-add
    (~400 ms for 4M rows on v5e) with sort + mean-shifted cumsum segment
    sums: subtracting the per-channel mean before the cumsum turns
    worst-case same-sign prefixes into a random walk, bounding the
    cancellation error of the prefix-difference trick at ~eps * sqrt(K)
    instead of eps * K.

    ``cum``/``count`` are the binning expansion's per-gaussian inclusive
    instance cumsum and counts (non-differentiable). Re-sorting the K
    instances by gid groups them per gaussian in exactly the runs
    [cum[g-1], min(cum[g], K)) — reusing them saves the backward a 22 ms
    histogram scatter-add + an extra segment-boundary gather on v5e.
    """
    del cum, count
    return feat_n[gid].T


def _gather_features_fwd(feat_n, gid, cum, count):
    return gather_features(feat_n, gid, cum, count), (gid, cum, count)


def _blocked_cumsum(x: Array, block: int = 128) -> Array:
    """Inclusive cumsum along axis 0 of (K, C), K % block == 0.

    One batched triangular matmul on the MXU per block + a tiny cross-block
    prefix — instead of XLA's log2(K)-pass scan, whose 8x lane padding at
    C=16 makes it the dominant cost of the gradient scatter path.
    """
    k, c = x.shape
    xb = x.reshape(k // block, block, c)
    tri = jnp.tril(jnp.ones((block, block), x.dtype))
    inner = jax.lax.dot_general(
        tri, xb, (((1,), (1,)), ((), ())),
        precision=jax.lax.Precision.HIGHEST,
        preferred_element_type=jnp.float32,
    ).transpose(1, 0, 2)                                 # (B, block, C)
    block_tot = inner[:, -1, :]
    prefix = jnp.cumsum(block_tot, axis=0) - block_tot   # exclusive (B, C)
    return (inner + prefix[:, None, :]).reshape(k, c)


def _gather_features_bwd(res, g):
    gid, cum, count = res
    k = gid.shape[0]
    gt = g.T                                             # (K, 16)
    _, order = jax.lax.sort(
        (gid, jnp.arange(k, dtype=jnp.int32)), is_stable=True, num_keys=1
    )
    gs = gt[order]                                       # (K, 16) by gaussian
    mu = jnp.mean(gs, axis=0, keepdims=True)
    pad = (-k) % 128
    xs = jnp.pad(gs - mu, ((0, pad), (0, 0)))
    cs = _blocked_cumsum(xs)[:k]
    ce = jnp.concatenate([jnp.zeros((1, gs.shape[1]), gs.dtype), cs], axis=0)
    # per-gaussian runs from the expansion residuals: end[g] = min(cum[g], K)
    # and start[g] = min(cum[g-1], K) = shifted end — ONE boundary gather.
    ends = jnp.minimum(cum, k)
    z = ce[ends]                                         # (N, 16)
    z_prev = jnp.concatenate([jnp.zeros_like(z[:1]), z[:-1]], axis=0)
    run = (ends - jnp.minimum(cum - count, k)).astype(gs.dtype)
    seg = (z - z_prev) + run[:, None] * mu
    return seg, None, None, None


gather_features.defvjp(_gather_features_fwd, _gather_features_bwd)


def gaussian_tile_span(
    proj: ProjectedGaussians, cfg: TileConfig
) -> tuple[Array, Array, Array, Array, Array]:
    """Per-gaussian inclusive tile bbox [x0, x1] x [y0, y1] and count.

    The bbox covers the rendered quad (bbox_half from projection; corners at
    +/-2 eigen-axis units, index.js:56-61/160-163). Culled gaussians get
    count 0.
    """
    mx, my = proj.mean2d[:, 0], proj.mean2d[:, 1]
    bx, by = proj.bbox_half[:, 0], proj.bbox_half[:, 1]

    # A gaussian overlaps tile column c iff [mx-bx, mx+bx] meets
    # [c*tw, (c+1)*tw]. Off-screen portions clamp away entirely below.
    x0 = jnp.floor((mx - bx) / cfg.tile_w).astype(jnp.int32)
    x1 = jnp.floor((mx + bx) / cfg.tile_w).astype(jnp.int32)
    y0 = jnp.floor((my - by) / cfg.tile_h).astype(jnp.int32)
    y1 = jnp.floor((my + by) / cfg.tile_h).astype(jnp.int32)

    # fully off-screen -> empty span
    offscreen = (
        (x1 < 0) | (x0 >= cfg.tiles_x) | (y1 < 0) | (y0 >= cfg.tiles_y)
    )
    x0 = jnp.clip(x0, 0, cfg.tiles_x - 1)
    x1 = jnp.clip(x1, 0, cfg.tiles_x - 1)
    y0 = jnp.clip(y0, 0, cfg.tiles_y - 1)
    y1 = jnp.clip(y1, 0, cfg.tiles_y - 1)

    keep = proj.mask & ~offscreen
    count = jnp.where(keep, (x1 - x0 + 1) * (y1 - y0 + 1), 0)
    return x0, x1, y0, y1, count.astype(jnp.int32)


@functools.partial(
    jax.jit,
    static_argnames=("cfg", "capacity", "exact_depth_sort"),
    donate_argnums=(),
)
def bin_gaussians(
    proj: ProjectedGaussians,
    cfg: TileConfig,
    capacity: int,
    exact_depth_sort: bool = False,
) -> BinnedInstances:
    """Build the sorted instance lists. ``capacity`` is the static K_cap.

    exact_depth_sort=True forces exact f32 depth ordering via two stable
    sorts (for bit-exact golden tests); the default packs tile+quantized
    depth into one key, with more depth resolution than the reference
    viewer's own 16-bit counting sort.
    """
    if proj.mean2d.shape[0] == 0:  # empty scene: all-sentinel instances
        zero = jnp.zeros((), jnp.int32)
        return BinnedInstances(
            feat=jnp.zeros((FEAT_DIM, capacity), jnp.float32),
            gauss_id=jnp.zeros((capacity,), jnp.int32),
            tile_id=jnp.full((capacity,), cfg.num_tiles, jnp.int32),
            starts=jnp.zeros((cfg.num_tiles,), jnp.int32),
            ends=jnp.zeros((cfg.num_tiles,), jnp.int32),
            num_instances=zero,
            overflow=zero,
        )
    x0, x1, y0, y1, count = gaussian_tile_span(proj, cfg)
    span_w = (x1 - x0 + 1).astype(jnp.int32)

    cum = jnp.cumsum(count)                       # inclusive
    total = cum[-1] if count.shape[0] > 0 else jnp.int32(0)

    inst = jnp.arange(capacity, dtype=jnp.int32)
    # instance j belongs to gaussian g with cum[g-1] <= j < cum[g], i.e.
    # g(j) = #{i : cum[i] <= j}. Because the queries are exactly arange(CAP),
    # this searchsorted collapses to a histogram + cumsum — a single
    # scatter-add (~5 ms at 2M on v5e) instead of a 20-step binary-search
    # scan (~300 ms) or a sort-based merge (~35 ms).
    hist = jnp.zeros((capacity + 1,), jnp.int32).at[
        jnp.clip(cum, 0, capacity)
    ].add(1, mode="drop")
    g = jnp.cumsum(hist[:capacity]).astype(jnp.int32)
    g_safe = jnp.minimum(g, count.shape[0] - 1)

    # TPU gathers pay per ROW, not per byte: gather the five per-gaussian
    # values needed below as ONE packed (N, 5) int32 table (depth bitcast)
    # instead of five separate K-sized gathers.
    table = jnp.stack(
        [
            x0, y0, span_w,
            cum - count,  # base offset of each gaussian's run
            jax.lax.bitcast_convert_type(
                -proj.depth.astype(jnp.float32), jnp.int32
            ),
        ],
        axis=-1,
    )
    rows = table[g_safe]                          # (capacity, 5)
    base = rows[:, 3]
    local = inst - base
    valid = inst < jnp.minimum(total, capacity)

    tx = rows[:, 0] + local % rows[:, 2]
    ty = rows[:, 1] + local // rows[:, 2]
    tile = ty * cfg.tiles_x + tx
    tile = jnp.where(valid, tile, cfg.num_tiles).astype(jnp.int32)

    # Front-to-back: ascending -depth (depth is camera z, negative in front;
    # nearest has the largest depth).
    neg_depth = jax.lax.bitcast_convert_type(rows[:, 4], jnp.float32)
    neg_depth = jnp.where(valid, neg_depth, jnp.inf)

    # <= 23 so 2^depth_bits - 1 is exactly representable in f32 (the bucket
    # is computed in f32; at 24+ bits the clip bound rounds UP and the
    # bucket spills into the next tile's key range)
    depth_bits = min(31 - max((cfg.num_tiles + 1).bit_length(), 1), 23)
    if exact_depth_sort or depth_bits < 14:
        # two stable sorts: tile-major, exact-f32-depth-minor order
        _, tile_d, gid_d = jax.lax.sort(
            (neg_depth, tile, g_safe), is_stable=True, num_keys=1
        )
        tile_sorted, gid_sorted = jax.lax.sort(
            (tile_d, gid_d), is_stable=True, num_keys=1
        )
    else:
        # single sort on a packed (tile << depth_bits | bucket) key. The
        # depth quantization (>= 2^14 buckets; 2^17 at 1080p) is strictly
        # finer than the reference worker's 2^16-bucket counting sort
        # (index.js:557-567), and one 2M-element sort is ~2x cheaper than
        # two on TPU.
        nd_valid = jnp.where(
            proj.mask, -proj.depth.astype(jnp.float32), jnp.nan
        )
        dmin = jnp.nanmin(nd_valid)
        dmax = jnp.nanmax(nd_valid)
        inv = (2.0 ** depth_bits - 1.0) / jnp.maximum(dmax - dmin, 1e-20)
        bucket = jnp.clip(
            ((neg_depth - dmin) * inv), 0.0, 2.0 ** depth_bits - 1.0
        ).astype(jnp.int32)
        key = tile * (1 << depth_bits) + jnp.where(valid, bucket, 0)
        key_sorted, gid_sorted = jax.lax.sort(
            (key, g_safe), is_stable=True, num_keys=1
        )
        tile_sorted = key_sorted >> depth_bits

    # tile_sorted is sorted, so end[t] == start[t+1]: one binary-search pass
    # over T+1 queries instead of separate left/right passes (saves ~3 ms of
    # the ~6 ms searchsorted cost at 3M instances / 8160 tiles on v5e)
    tile_range = jnp.arange(cfg.num_tiles + 1, dtype=jnp.int32)
    bounds = jnp.searchsorted(tile_sorted, tile_range, side="left")
    starts = bounds[:-1]
    ends = bounds[1:]

    feat = gather_features(
        features_from_projection(proj), gid_sorted, cum, count
    )

    return BinnedInstances(
        feat=feat,
        gauss_id=gid_sorted,
        tile_id=tile_sorted,
        starts=starts.astype(jnp.int32),
        ends=ends.astype(jnp.int32),
        num_instances=total,
        overflow=jnp.maximum(total - capacity, 0),
    )
