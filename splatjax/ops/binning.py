"""Tile binning: duplicate gaussians per overlapped tile, sort, range-index.

TPU-native replacement for the reference's Web-Worker depth sort
(index.js:507-567). The worker sorts whole gaussians once per frame because
the GPU's ROP hardware resolves per-pixel coverage; on TPU the rasterizer is
a tiled kernel, so we instead build, *on device with static shapes*:

  1. per-gaussian tile span from the projected quad bbox,
  2. a depth-compacting sort of the N *gaussians* (zero-instance gaussians
     last, visible ones front-to-back) — N-sized, ~3x cheaper than sorting
     the duplicated instances by a packed depth key, and it makes in-tile
     depth order *exact* f32 instead of bucketed,
  3. a Pallas expansion kernel (ops/expand.py) emitting per-instance
     (tile, gaussian) via monotone-window one-hot matmuls on the MXU —
     replacing round 1's XLA scatter-add histogram + 3M-row table gather,
  4. ONE stable sort of the instances by tile id: depth-major expansion
     order makes within-tile depth order come out for free,
  5. contiguous per-tile [start, end) ranges via searchsorted.

Capacity truncation drops the *farthest* instances (depth-major expansion),
unlike round 1's arbitrary-order tail drop — the analogue of the viewer
keeping the most important splats when capped (index.js:329-335, 667-669).

Gradients flow through the feature gather (its transpose is a sort +
segment-sum back onto gaussians); index computations are non-differentiable
constants, as they should be.
"""
from __future__ import annotations

import dataclasses
import functools
import os
from typing import NamedTuple, Optional

import jax
import jax.numpy as jnp


def _grad_gather_mode() -> str:
    """Packing mode of the backward's gradient-row gather, read at trace
    time from SPLATJAX_GRAD_GATHER:

      "i16"  (default) per-channel-scaled int16 pairs in int32 lanes —
             halves the dominant backward gather's bytes (64 B -> 32 B
             rows, ~36 -> ~20 ms at 3M rows on v5e) at a per-term error
             of channel_max * 2^-16 (~10x tighter than bf16's 2^-9
             relative rounding, and far below optimizer noise);
      "bf16" two bf16 per int32 lane (no pre-pass, per-term 2^-9 rel);
      "f32"  unpacked 64 B rows — bit-exact transpose of the gather,
             for strict-parity runs and the algorithm-exactness tests.
    """
    return os.environ.get("SPLATJAX_GRAD_GATHER", "i16")

from splatjax.ops.projection import ProjectedGaussians

Array = jax.Array

# UNPACKED feature row layout (f32; the differentiable boundary):
# 0: mean2d.x  1: mean2d.y  2: conic.a  3: conic.b  4: conic.c
# 5: color.r   6: color.g   7: color.b  8: opacity  9: depth  10-15: pad
# The rasterizer's hot path consumes the PACKED 8-row int32 form
# (ops/rasterize.py pack_feature_table) — the post-sort instance gather is
# ~30% cheaper at 32 B rows than 64 B on v5e; this 16-row layout remains
# the gradient layout (10 used rows, 16 keeps segment-sum windows aligned
# to Mosaic's (8, 128) tiling).
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
    """Fixed-capacity, tile-sorted duplicated instances.

    ``feat`` is None when built with ``with_features=False`` (the fused
    rasterize_gathered path gathers packed rows itself); the trailing run
    residuals (cum/count/perm/cum_d/count_d) feed the merged backward's
    segment sum.
    """

    feat: Optional[Array]  # (FEAT_DIM, K_cap) f32 feature-major, or None
    gauss_id: Array    # (K_cap,) int32 source gaussian per instance
    tile_id: Array     # (K_cap,) int32 (num_tiles == sentinel for invalid)
    starts: Array      # (num_tiles,) int32
    ends: Array        # (num_tiles,) int32
    num_instances: Array  # () int32 — total before capacity clamp
    overflow: Array    # () int32 — instances dropped due to capacity
    cum: Optional[Array] = None      # (N,) int32 inclusive instance cumsum
    count: Optional[Array] = None    # (N,) int32 per-gaussian instance count
    perm: Optional[Array] = None     # (N,) int32 depth-compact order
    cum_d: Optional[Array] = None    # (N,) f32 cumsum in depth order
    count_d: Optional[Array] = None  # (N,) f32 counts in depth order


def features_from_projection(proj: ProjectedGaussians) -> Array:
    """Pack per-gaussian screen features into the (N, 16) unpacked layout
    (incl. camera depth in column 9 for expected-depth rendering)."""
    n = proj.mean2d.shape[0]
    opacity = jnp.where(proj.mask, proj.opacity, 0.0)
    feat = jnp.concatenate(
        [
            proj.mean2d,
            proj.conic,
            proj.color,
            opacity[:, None],
            proj.depth[:, None],
            jnp.zeros((n, FEAT_DIM - 10), jnp.float32),
        ],
        axis=-1,
    )
    return feat.astype(jnp.float32)


@jax.custom_vjp
def gather_features(
    feat_n: Array, gid: Array, cum: Array, count: Array,
    perm: Array, cum_d: Array, count_d: Array, overflow: Array,
) -> Array:
    """(N, C) features + (K,) ids -> (C, K) feature-major gathered rows.

    Forward is a plain row gather. The backward replaces XLA's scatter-add
    (~400 ms for 4M rows on v5e) with sort + mean-shifted cumsum segment
    sums: subtracting the per-channel mean before the cumsum turns
    worst-case same-sign prefixes into a random walk, bounding the
    cancellation error of the prefix-difference trick at ~eps * sqrt(K)
    instead of eps * K.

    ``cum``/``count`` are the original-order per-gaussian inclusive instance
    cumsum and counts (non-differentiable). Re-sorting the K instances by
    gid groups them per gaussian in exactly the runs [cum[g-1], cum[g]) —
    reusing them saves the backward a 22 ms histogram scatter-add on v5e.
    Invalid tail slots must carry gid N-1 with zero cotangent rows (they
    group after gaussian N-1's real run and never enter it).

    When ``overflow > 0`` the capacity cut dropped the depth-farthest
    instances, so per-gaussian run lengths shrink to the *included* counts:
    ``perm``/``cum_d``/``count_d`` (the depth-compact order and its instance
    prefix) reconstruct them; the correction is only computed under a
    lax.cond so the common non-truncated path pays nothing.
    """
    del cum, count, perm, cum_d, count_d, overflow
    return feat_n[gid].T


def _gather_features_fwd(feat_n, gid, cum, count, perm, cum_d, count_d,
                         overflow):
    out = gather_features(feat_n, gid, cum, count, perm, cum_d, count_d,
                          overflow)
    return out, (gid, cum, count, perm, cum_d, count_d, overflow)


def _effective_cum(cum, count, perm, cum_d, count_d, overflow, k):
    """Per-gaussian run-end prefix in gid-sorted instance order, corrected
    for depth-major capacity truncation (dropped = depth-farthest) under a
    lax.cond so the common non-truncated path pays nothing."""
    n = cum.shape[0]

    def _truncated(_):
        inc_d = jnp.clip(k - (cum_d - count_d), 0, count_d)
        eff_count = jnp.zeros((n,), cum_d.dtype).at[perm].set(inc_d)
        return jnp.cumsum(eff_count)

    def _full(_):
        return cum.astype(cum_d.dtype)

    return jax.lax.cond(overflow > 0, _truncated, _full, None)


def segment_sum_by_gid_packed_bf16(
    gp: Array, gid: Array, cum: Array, count: Array,
    perm: Array, cum_d: Array, count_d: Array, overflow: Array,
) -> Array:
    """Transpose of the instance gather for KERNEL-PACKED gradient rows.

    gp: (8, K) int32 feature-major bf16-pair planes as written by the fast
    backward kernel (rasterize_vjp._pack_grad_bf16: channel c low half,
    c+8 high). Sort by gid, gather the 32-byte packed rows into contiguous
    per-gaussian runs, and sum each run exactly over the packed bf16
    values (up to f32 summation-order rounding) with the windowed one-hot kernel
    (ops/segreduce.segment_reduce_packed_bf16). Returns (N, 16) f32.
    Total error = the pack-time bf16 rounding (2^-9 relative per term).
    """
    from splatjax.ops.segreduce import LANES2, W, segment_reduce_packed_bf16

    k = gid.shape[0]
    n = cum.shape[0]
    eff_cum = _effective_cum(cum, count, perm, cum_d, count_d, overflow, k)
    # unstable 2-key sort == stable 1-key + iota payload EXACTLY (the
    # iota makes every (gid, iota) pair unique and ascending within ties),
    # but skips the hidden stability iota XLA adds — one fewer 3M-row
    # operand through every bitonic pass (measured ~2 ms standalone)
    _, order = jax.lax.sort(
        (gid, jnp.arange(k, dtype=jnp.int32)), is_stable=False, num_keys=2
    )
    # pad the gather INDICES, not the rows (pad rows repeat row 0; runs
    # end at eff_cum[-1] <= k so pads never enter any run)
    k_pad2 = -(-k // W) * W
    order_p = jnp.pad(order, (0, k_pad2 - k))
    rows_pm = gp.T[order_p].T                        # (8, K_pad)
    n_pad2 = (-n) % LANES2
    cum_p2 = jnp.pad(eff_cum.astype(jnp.int32), (0, n_pad2), mode="edge")
    sums = segment_reduce_packed_bf16(rows_pm, cum_p2)   # (16, N_pad)
    return sums[:, :n].T


def segment_sum_by_gid(
    g: Array, gid: Array, cum: Array, count: Array,
    perm: Array, cum_d: Array, count_d: Array, overflow: Array,
) -> Array:
    """Transpose of the per-instance row gather: (C, K) cotangent rows ->
    (N, C) per-gaussian sums. Sort by gid, gather rows into per-gaussian
    contiguous runs, then sum each run exactly with the windowed one-hot
    MXU kernel (ops/segreduce.py) — replacing the earlier mean-shifted
    blocked-cumsum + boundary-gather pipeline (~24 ms at 3M rows on v5e,
    and prefix-difference cancellation error with it). Run lengths correct
    for depth-major capacity truncation under a lax.cond.
    """
    from splatjax.ops.segreduce import segment_reduce_rows

    k = gid.shape[0]
    n = cum.shape[0]
    c = g.shape[0]
    eff_cum = _effective_cum(cum, count, perm, cum_d, count_d, overflow, k)

    gt = g.T                                             # (K, C)
    # unstable 2-key sort == stable 1-key + iota payload EXACTLY (the
    # iota makes every (gid, iota) pair unique and ascending within ties),
    # but skips the hidden stability iota XLA adds — one fewer 3M-row
    # operand through every bitonic pass (measured ~2 ms standalone)
    _, order = jax.lax.sort(
        (gid, jnp.arange(k, dtype=jnp.int32)), is_stable=False, num_keys=2
    )
    mode = _grad_gather_mode()
    if mode == "i16" and c == 16:
        # Halve the dominant backward cost — the K-row random-permutation
        # gather of gradient rows (~36 ms at 3M x 64 B on v5e; 32 B rows
        # gather ~45% faster) — by quantizing to per-channel-scaled int16
        # and packing channel pairs (c, c+8) as biased u16 halves in int32
        # lanes. The packed gather output feeds the windowed segment-sum
        # kernel DIRECTLY (ops/segreduce.segment_reduce_packed_u16): no
        # XLA-side unpack / dequantize / re-pad, and the kernel's limb
        # arithmetic makes each run's sum f32-exact over the quantized
        # values — total error is the quantization alone, bounded by
        # channel_max / 65534 per gathered term.
        from splatjax.ops.segreduce import (
            LANES2, W, segment_reduce_packed_u16,
        )

        cmax = jnp.max(jnp.abs(gt), axis=0)              # (C,)
        scale = jnp.where(cmax > 0, cmax, 1.0) * (1.0 / 32767.0)
        q = jnp.clip(jnp.round(gt / scale), -32767.0, 32767.0)
        u = (q + 32768.0).astype(jnp.uint32)             # biased u16 range
        packed = ((u[:, 8:] << 16) | u[:, :8]).astype(jnp.int32)
        # pad the gather INDICES, not the gathered 32 B rows (saves a full
        # ~96 MB HBM pad copy at 3M instances): pad rows repeat row 0, which
        # is safe — run bounds end at eff_cum[-1] <= k, so pad rows beyond k
        # never enter any run (same exclusion as the sentinel tail)
        k_pad2 = -(-k // W) * W
        order_p = jnp.pad(order, (0, k_pad2 - k))
        rows_pm = packed[order_p].T                      # (8, K_pad) gather
        n_pad2 = (-n) % LANES2
        cum_p2 = jnp.pad(
            eff_cum.astype(jnp.int32), (0, n_pad2), mode="edge"
        )
        sums = segment_reduce_packed_u16(rows_pm, cum_p2)   # (16, N_pad)
        return (sums[:, :n] * scale[:, None]).T
    # pad the gather INDICES up front so gathered rows are born 128-aligned
    # (pad rows repeat row 0 and never enter any run — bounds end at
    # eff_cum[-1] <= k)
    k_pad_to = -(-k // 128) * 128
    order_p = jnp.pad(order, (0, k_pad_to - k))
    if mode in ("i16", "bf16") and c % 2 == 0:
        # bf16 fallback (and i16 with non-16 channel counts): two bf16 per
        # int32 lane around the gather; per-term error 2^-9 relative.
        u = jax.lax.bitcast_convert_type(
            gt.astype(jnp.bfloat16), jnp.uint16
        ).astype(jnp.uint32)                             # (K, C)
        packed = ((u[:, 1::2] << 16) | u[:, 0::2]).astype(jnp.int32)
        gp = packed[order_p].astype(jnp.uint32)          # (K_pad, C/2)
        lo = (gp & 0xFFFF).astype(jnp.uint16)
        hi = (gp >> 16).astype(jnp.uint16)
        gs = jax.lax.bitcast_convert_type(
            jnp.stack([lo, hi], axis=-1).reshape(k_pad_to, c), jnp.bfloat16
        ).astype(jnp.float32)                            # (K_pad, C)
    else:
        gs = gt[order_p]                                 # (K_pad, C)
    # per-gaussian runs are [eff_cum[g-1], eff_cum[g]) in this order; the
    # sentinel tail (gid n-1, zero rows) sorts after gaussian n-1's real
    # run and matches no lane in the kernel. Pad runs to the kernel's
    # 128 alignment (empty pad runs repeat the final cum).
    n_pad = (-n) % 128
    gs_fm = gs.T                                         # (C, K_pad)
    cum_p = jnp.pad(eff_cum.astype(jnp.int32), (0, n_pad), mode="edge")
    return segment_reduce_rows(gs_fm, cum_p).T[:n]


def _gather_features_bwd(res, g):
    gid, cum, count, perm, cum_d, count_d, overflow = res
    seg = segment_sum_by_gid(
        g, gid, cum, count, perm, cum_d, count_d, overflow
    )
    return seg, None, None, None, None, None, None, None


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


def _searchsorted_right_blocked(a: Array, q: Array, block: int = 1024):
    """#{i : a[i] <= q} for sorted ``a`` — jnp.searchsorted(side='right')
    without the ~20-iteration binary-search while loop (measured ~0.4 ms
    at 1M rows / 1.5k queries on v5e; XLA gathers the queries from HBM
    every iteration). One coarse compare matrix counts the FULL blocks
    (last element <= q), one contiguous-window gather pulls the boundary
    block, one fine compare finishes: ~0.05 ms of dense VPU compares."""
    n = a.shape[0]
    nb = -(-n // block)
    a2 = jnp.pad(
        a, (0, nb * block - n), constant_values=jnp.inf
    ).reshape(nb, block)
    lasts = a2[:, block - 1]                             # (nb,)
    full = jnp.sum(
        (lasts[None, :] <= q[:, None]).astype(jnp.int32), axis=1
    )                                                    # (nq,) full blocks
    base = jnp.minimum(full, nb - 1)
    # ROW gather (contiguous 4*block-byte rows), not a (nq, block)
    # element gather — element gathers pay the per-element transaction
    # floor (measured +7 ms at 1.5M elements on v5e)
    win = a2[base]                                       # (nq, block)
    fine = jnp.sum((win <= q[:, None]).astype(jnp.int32), axis=1)
    # full == nb (every block full): the window re-counts block nb-1,
    # which is already in full*block — drop it
    fine = jnp.where(full >= nb, 0, fine)
    return full * block + fine


@functools.partial(
    jax.jit,
    static_argnames=("cfg", "capacity", "with_features"),
    donate_argnums=(),
)
def bin_gaussians(
    proj: ProjectedGaussians,
    cfg: TileConfig,
    capacity: int,
    with_features: bool = True,
) -> BinnedInstances:
    """Build the sorted instance lists. ``capacity`` is the static K_cap.

    Ordering is always tile-major with *exact* f32 front-to-back depth
    within each tile (the depth-compact expansion makes it free) —
    strictly finer than the reference worker's 2^16-bucket counting sort
    (index.js:557-567).
    """
    from splatjax.ops import expand as expand_mod

    n = proj.mean2d.shape[0]
    if n == 0:  # empty scene: all-sentinel instances
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
    assert capacity < (1 << 24) and n < (1 << 24), (
        "indices must stay exact in f32 (the expansion kernel reassembles "
        "them from 8-bit limbs into f32 arithmetic)"
    )
    assert cfg.tiles_x <= 255 and cfg.tiles_y <= 255, (
        "tile coordinates must fit the expansion kernel's bf16-exact "
        "<=255 bound (16 px tiles cover images up to 4080 px per side); "
        "use a larger tile_size for wider images"
    )
    cap_pad = -(-capacity // expand_mod.CHUNK) * expand_mod.CHUNK

    x0, x1, y0, y1, count = gaussian_tile_span(proj, cfg)
    span_w = (x1 - x0 + 1).astype(jnp.int32)
    cum = jnp.cumsum(count)                       # inclusive, original order
    total = cum[-1]

    # Depth-compact gaussian sort: gaussians WITH instances first, front-to-
    # back (depth is camera z, negative in front: ascending -depth = near
    # first); empty ones (culled or off-screen) keyed +inf to the tail so
    # the visible prefix is gap-free — the expansion kernel's window bound
    # g(j+C) <= g(j) + C relies on every prefix gaussian having >= 1
    # instance.
    #
    # The expansion-table columns ride the sort as PACKED PAYLOADS instead
    # of a post-sort 32 B table gather: x0/y0/span_w are <= 255 (asserted
    # above) so they share one int32 lane, count gets its own, and the
    # original gaussian id IS the sort's identity payload. Measured on
    # v5e at 1M gaussians: +2 payload operands cost ~1.8 ms vs the
    # ~4.8 ms row gather they replace.
    has_inst = count > 0
    dkey = jnp.where(has_inst, -proj.depth.astype(jnp.float32), jnp.inf)
    packed_xys = (x0 << 16) | (y0 << 8) | span_w
    # unstable 2-key == stable 1-key + iota payload EXACTLY (the iota
    # makes every (dkey, iota) pair unique, breaking +-inf and equal-f32
    # ties identically) while skipping the hidden stability iota — one
    # fewer N-row operand through every sort pass
    _, perm, pxys_d, count_d_i = jax.lax.sort(
        (dkey, jnp.arange(n, dtype=jnp.int32), packed_xys, count),
        is_stable=False, num_keys=2,
    )
    n_vis = jnp.sum(has_inst.astype(jnp.int32))

    x0_d = ((pxys_d >> 16) & 255).astype(jnp.float32)
    y0_d = ((pxys_d >> 8) & 255).astype(jnp.float32)
    spanw_d = (pxys_d & 255).astype(jnp.float32)
    count_d = count_d_i.astype(jnp.float32)
    cum_d = jnp.cumsum(count_d)                   # exact: total < 2^24
    cum_ex = cum_d - count_d
    ogid_d = perm                                 # col 4 was arange(n)
    cum_ex_i = cum_ex.astype(jnp.int32)

    def limbs(v):
        return (
            (v & 255).astype(jnp.float32),
            ((v >> 8) & 255).astype(jnp.float32),
            (v >> 16).astype(jnp.float32),
        )

    og0, og1, og2 = limbs(ogid_d)
    ce0, ce1, ce2 = limbs(cum_ex_i)
    zero = jnp.zeros((n,), jnp.float32)
    tbl16 = jnp.stack(
        [
            x0_d, y0_d, spanw_d,
            cum_d, cum_ex,                            # full f32 (compares)
            og0, og1, og2, ce0, ce1, ce2,
            zero, zero, zero, zero, zero,
        ],
        axis=-1,
    )
    # pad lanes: CUM_EXCL = 2^24 > any instance id, so no instance can ever
    # select them; SPANW >= 1 keeps the masked-garbage path finite. Vpad is
    # a 128-multiple for Mosaic's lane-aligned window DMAs.
    vpad = -(-(n + expand_mod.PAD_G) // 128) * 128
    pad_row = jnp.zeros((expand_mod.TBL_ROWS,), jnp.float32)
    pad_row = pad_row.at[expand_mod.COL_SPANW].set(1.0)
    pad_row = pad_row.at[expand_mod.COL_CUM_INCL].set(float(1 << 24))
    pad_row = pad_row.at[expand_mod.COL_CUM_EXCL].set(float(1 << 24))
    tbl_pad = jnp.concatenate(
        [tbl16, jnp.broadcast_to(pad_row, (vpad - n, expand_mod.TBL_ROWS))],
        axis=0,
    )
    tbl_t = tbl_pad.T                      # (TBL_ROWS, Vpad): lanes = gaussians

    # g at every program-DMA boundary (g(j) = #{r : cum_d[r] <= j}),
    # clamped into the gap-free visible prefix. The expansion kernel only
    # needs g at PROGRAM granularity (CHUNK instances per window DMA) —
    # it derives the per-group anchors from the window's own cum row.
    stride = expand_mod.CHUNK
    j_bounds = jnp.arange(
        0, cap_pad, stride, dtype=jnp.int32
    ).astype(jnp.float32)
    sub_g0 = _searchsorted_right_blocked(cum_d, j_bounds)
    sub_g0 = jnp.minimum(sub_g0, n_vis)

    total_i = total.astype(jnp.int32)
    total_clamped = jnp.minimum(total_i, capacity)
    tile, gid = expand_mod.expand_instances(
        tbl_t, sub_g0, total_clamped, cap_pad, cfg.tiles_x,
        cfg.num_tiles, n,
    )

    # ONE stable sort by tile id: expansion order is depth-major, so equal
    # tiles keep exact front-to-back f32 depth order; sentinel tiles
    # (== num_tiles) sort last and are cut by the [:capacity] slice.
    tile_sorted, gid_sorted = jax.lax.sort(
        (tile, gid), is_stable=True, num_keys=1
    )
    tile_sorted = tile_sorted[:capacity]
    gid_sorted = gid_sorted[:capacity]

    # Per-tile bounds WITHOUT a searchsorted over the K_cap array (the 22
    # binary-search iterations x 8161-query gathers measured 2.6 ms/step
    # at 3M/1080p): tile_sorted's per-tile counts equal a separable
    # rectangle histogram, computed as TWO one-hot MXU contractions
    # (~0.3 ms) + one (T,) cumsum. tile ids are ty*tiles_x+tx (row-major
    # rect enumeration, ops/expand.py), so for each gaussian the KEPT
    # depth-major prefix c_keep = clip(capacity - cum_ex, 0, count)
    # covers full_rows = floor(c_keep/span_w) whole tile rows plus a
    # partial row of (c_keep mod span_w) leading columns — exactly the
    # instances the expansion emits under the capacity cut, so the
    # cumsum matches searchsorted(tile_sorted, arange(T+1)) bit-for-bit
    # in overflow frames too. Exactness: 0/1 bf16 operands, f32 integer
    # accumulation < 2^24.
    c_keep = jnp.clip(jnp.float32(capacity) - cum_ex, 0.0, count_d)
    spanw_safe = jnp.maximum(spanw_d, 1.0)
    full_rows = jnp.floor(c_keep / spanw_safe)        # exact int ratio
    part_w = c_keep - full_rows * spanw_d             # leading columns
    ty_i = jnp.arange(cfg.tiles_y, dtype=jnp.float32)[:, None]
    tx_i = jnp.arange(cfg.tiles_x, dtype=jnp.float32)[None, :]
    u_full = ((ty_i >= y0_d[None, :])
              & (ty_i < (y0_d + full_rows)[None, :])).astype(jnp.bfloat16)
    v_x = ((tx_i >= x0_d[:, None])
           & (tx_i < (x0_d + spanw_d)[:, None])).astype(jnp.bfloat16)
    w_part = (ty_i == (y0_d + full_rows)[None, :]).astype(jnp.bfloat16)
    v_p = ((tx_i >= x0_d[:, None])
           & (tx_i < (x0_d + part_w)[:, None])).astype(jnp.bfloat16)
    counts2d = jax.lax.dot_general(
        u_full, v_x, (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    ) + jax.lax.dot_general(
        w_part, v_p, (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )                                                 # (TY, TX) exact
    bounds = jnp.concatenate([
        jnp.zeros((1,), jnp.int32),
        jnp.cumsum(counts2d.reshape(-1).astype(jnp.int32)),
    ])
    starts = bounds[:-1]
    ends = bounds[1:]

    overflow = jnp.maximum(total_i - capacity, 0)
    feat = None
    if with_features:
        feat = gather_features(
            features_from_projection(proj), gid_sorted, cum, count,
            perm, cum_d, count_d, overflow,
        )

    return BinnedInstances(
        feat=feat,
        gauss_id=gid_sorted,
        tile_id=tile_sorted,
        starts=starts.astype(jnp.int32),
        ends=ends.astype(jnp.int32),
        num_instances=total_i,
        overflow=overflow,
        cum=cum,
        count=count,
        perm=perm,
        cum_d=cum_d,
        count_d=count_d,
    )
