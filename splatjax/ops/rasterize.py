"""Tiled Pallas rasterizer: forward kernel, XLA emulation, image assembly.

The TPU-native replacement for the reference's GPU rasterization (instanced
quads + fragment blend + ROP, index.js:68-199). Each grid program owns one
image tile (default 16x16 = 256 pixels on the *sublane* axis) and walks its
depth-sorted instance list front-to-back in chunks of ``CHUNK`` gaussians on
the *lane* axis:

  alpha      = exp(power) * opacity          (power >= -4, index.js:170-175)
  T_within   = exclusive cumprod(1 - alpha)  along the chunk (MXU tri-matmul)
  rgb       += sum_k alpha_k * T_k * color_k
  depth_out += sum_k alpha_k * T_k * depth_k     (expected splat depth)
  T         *= prod_k (1 - alpha_k)

with whole-tile early termination once max(T) < eps. This equals the
viewer's back-to-front "over" blend (index.js:177-181) exactly when eps=0.
An optional per-pixel z-buffer culls fragments BEHIND opaque geometry
inside the sweep — the analogue of the viewer rendering splats with
depthTest:true against the scene depth buffer (index.js:177-181,
index.html:9-14's spheres intersecting the splat volume).

Memory layout (chosen for Mosaic's (sublane, lane)=(8, 128) tiling rules):
  * instance features are PACKED 8-row int32, feature-major ``(8, K_pad)``
    in HBM — v5e row/chunk movement costs scale with bytes, and the
    dominant post-sort feature gather is ~30% cheaper at 32 B than at the
    naive 64 B float layout (measured 17.3 vs 23.5 ms at 3M rows). Packing:

      row 0-4: f32 bits of mean2d.x, mean2d.y, conic a, b, c
      row 5:   (r_u16 << 16) | g_u16      color quantized to 1/65535
      row 6:   (b_u16 << 16) | o_u16      (max error 7.6e-6 — far inside
      row 7:   f32 bits of camera depth    the 1e-3 viewer-parity budget)

    The int32 container (not f32) keeps arbitrary bit patterns safe from
    NaN canonicalization anywhere in the XLA pipeline.
  * tile ranges need not be 128-aligned — the kernel rounds the DMA window
    down to a 128 boundary and masks instances outside [start, end);
  * per-tile output is PLANAR ``(8, P)``: channel rows r, g, b, T_final,
    chunks_done, expected_depth, log T_final (1 spare) with PIXELS ON
    LANES — a
    channel-minor (P, 8) block leaves 8 of 128 lanes live and cost
    ~4x on every XLA-side producer/consumer of the tile buffers
    (measured: a trivial pallas round-trip over (T, P, 4) blocks runs
    7.2 ms vs 1.7 ms planar at 1080p, scratch/micro_pallas_layout.py).
    The per-pixel accumulators stay (P, chan) inside the kernel
    (pixels on sublanes, gaussians on lanes); one 2-pass bf16-split
    identity-matmul transpose per tile flips them to the planar block
    (error <= 2^-17 RELATIVE — transmittance therefore also ships as
    log T in channel 6, which the backward consumes: raw T below the
    bf16 subnormal range would flush to 0 and kill deep-stack
    gradients).

The UNPACKED per-gaussian feature layout (16 f32 rows, used at the
differentiable boundary and for gradients):
  0 mean2d.x  1 mean2d.y  2 conic.a  3 conic.b  4 conic.c
  5 color.r   6 color.g   7 color.b  8 opacity  9 depth  10-15 pad
"""
from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from splatjax.ops.binning import FEAT_DIM, TileConfig  # noqa: F401
from splatjax.ops.projection import FRUSTUM_GUARD, SIZE_CULL_THRESHOLD

Array = jax.Array

CHUNK = 128  # gaussians composited per inner step (lane axis)

# Packed kernel-facing feature rows (int32, see module docstring).
PACKED_ROWS = 8
# Unpacked gradient/feature rows (f32): 10 used, padded to 16 for aligned
# segment-sum windows.
FEAT_PAD = 16

# ---- 16-byte training rows (PACKED16_ROWS = 4 data lanes) ---------------
# Training needs far less precision than the viewer-parity path, so the
# training row packs its payload into 4 int32 lanes (the reference itself
# renders from int16-quantized covariance + RGBA8 color textures,
# index.js:384-394 — precision dieting is reference-sanctioned):
#
#   lane 0: mean2d fixed-point  (mx_u16 << 16) | my_u16,  1/8 px steps,
#           bias +2048 px -> covers [-2048, 6144) px: every legal mean
#           (bbox_half <= 2048 from the 1024 eigen-axis cap, width <= 4080
#           from the tile-coordinate bound) is in range; max round error
#           1/16 px.
#   lane 1: (conic.a bf16 << 16) | conic.b bf16
#   lane 2: (conic.c bf16 << 16) | opacity u16       (1/65535 steps)
#   lane 3: (r_u8 << 24) | (g_u8 << 16) | (b_u8 << 8)  (RGBA8-equivalent)
#   lane 4: f32 bits of camera depth (expected-depth / z-buffer occlusion
#           work in fast mode too)
#   lanes 5-7: zero padding
#
# The table is STORED 8 lanes wide even though only 16 B carry payload:
# the post-sort instance gather is per-ROW bound on v5e (~4.4 cycles/row
# regardless of width), and an 8-lane row lets XLA fuse the chunk-major
# shuffle into the gather — measured 14.9 ms vs 18.6 ms for the 4-lane
# layout at 3M rows. The extra ring-DMA bytes are latency-hidden behind
# fragment compute (docs/PERF.md item 5).
#
# Worst-case image error (bf16 conic: |power| * 2^-9 <= 8e-3 of power;
# mean: slope sqrt(8*conic_max) * 1/16 px) stays inside the 1e-3 parity
# budget on real splat statistics — enforced by the on-device gate in
# bench.py and tests/test_tiled_pipeline.py.
PACKED16_ROWS = 4
MEAN16_STEP = 0.125          # px per fixed-point unit
MEAN16_BIAS = 2048.0         # px


def _bf16_bits_hi(x: Array) -> Array:
    """f32 -> int32 with the value's bf16 bit pattern in the HIGH half."""
    u = jax.lax.bitcast_convert_type(
        x.astype(jnp.bfloat16), jnp.uint16
    ).astype(jnp.uint32)
    return (u << 16).astype(jnp.int32)


def pack_feature_table16(feat_n: Array) -> Array:
    """Unpacked (N, >=9) f32 per-gaussian features -> packed (N, 8) int32
    training rows (16-byte payload + depth lane + padding; row-major
    gather source — see the PACKED16 layout note above)."""
    mxq = jnp.clip(
        jnp.floor((feat_n[:, 0] + MEAN16_BIAS) * (1.0 / MEAN16_STEP) + 0.5),
        0.0, 65535.0,
    ).astype(jnp.int32)
    myq = jnp.clip(
        jnp.floor((feat_n[:, 1] + MEAN16_BIAS) * (1.0 / MEAN16_STEP) + 0.5),
        0.0, 65535.0,
    ).astype(jnp.int32)
    ca = _bf16_bits_hi(feat_n[:, 2])
    cb = _bf16_bits_hi(feat_n[:, 3])
    cc = _bf16_bits_hi(feat_n[:, 4])
    r8 = jnp.floor(
        jnp.clip(feat_n[:, 5], 0.0, 1.0) * 255.0 + 0.5
    ).astype(jnp.int32)
    g8 = jnp.floor(
        jnp.clip(feat_n[:, 6], 0.0, 1.0) * 255.0 + 0.5
    ).astype(jnp.int32)
    b8 = jnp.floor(
        jnp.clip(feat_n[:, 7], 0.0, 1.0) * 255.0 + 0.5
    ).astype(jnp.int32)
    opa = _quant16(feat_n[:, 8])
    lane0 = (mxq << 16) | myq
    lane1 = ca | ((cb >> 16) & 0xFFFF)
    lane2 = cc | opa
    lane3 = (r8 << 24) | (g8 << 16) | (b8 << 8)
    depth = feat_n[:, 9] if feat_n.shape[1] > 9 else jnp.zeros_like(feat_n[:, 0])
    lane4 = jax.lax.bitcast_convert_type(depth, jnp.int32)
    zero = jnp.zeros_like(lane0)
    return jnp.stack(
        [lane0, lane1, lane2, lane3, lane4, zero, zero, zero], axis=1
    )


def unpack_chunk16(chunk_i32: Array):
    """Packed (8, C) int32 training rows -> tuple of (1, C) f32 feature
    rows (mx, my, ca, cb, cc, r, g, b, opa, depth).

    bf16 decode is one mask/shift + int32->f32 bitcast (a bf16 value's f32
    bit pattern IS its 16 bits shifted high) — no 16-bit lane types in the
    kernel."""
    l0 = chunk_i32[0:1, :]
    l1 = chunk_i32[1:2, :]
    l2 = chunk_i32[2:3, :]
    l3 = chunk_i32[3:4, :]
    hi_mask = jnp.int32(-65536)  # 0xFFFF0000
    mx = (
        jnp.right_shift(l0, 16) & 0xFFFF
    ).astype(jnp.float32) * MEAN16_STEP - MEAN16_BIAS
    my = (l0 & 0xFFFF).astype(jnp.float32) * MEAN16_STEP - MEAN16_BIAS
    ca = jax.lax.bitcast_convert_type(l1 & hi_mask, jnp.float32)
    cb = jax.lax.bitcast_convert_type(jnp.left_shift(l1, 16), jnp.float32)
    cc = jax.lax.bitcast_convert_type(l2 & hi_mask, jnp.float32)
    opa = (l2 & 0xFFFF).astype(jnp.float32) * jnp.float32(1.0 / 65535.0)
    inv255 = jnp.float32(1.0 / 255.0)
    r = (jnp.right_shift(l3, 24) & 255).astype(jnp.float32) * inv255
    g = (jnp.right_shift(l3, 16) & 255).astype(jnp.float32) * inv255
    b = (jnp.right_shift(l3, 8) & 255).astype(jnp.float32) * inv255
    # kernels that need no depth stream only the 4 payload lanes (the ring
    # DMA slices lanes [0, 4) out of the 8-lane stored rows); depth-free
    # call sites consume only g_d == 0-weighted terms, so zeros are exact
    if chunk_i32.shape[0] > 4:
        depth = jax.lax.bitcast_convert_type(chunk_i32[4:5, :], jnp.float32)
    else:
        depth = jnp.zeros_like(mx)
    return (mx, my, ca, cb, cc, r, g, b, opa, depth)


def _use_interpret() -> bool:
    return jax.default_backend() == "cpu"


def _quant16(x: Array) -> Array:
    """[0,1] -> u16 as int32 (round-to-nearest)."""
    return jnp.floor(
        jnp.clip(x, 0.0, 1.0) * 65535.0 + 0.5
    ).astype(jnp.int32)


def pack_feature_rows(feat_fm: Array) -> Array:
    """Unpacked (>=10, K) f32 feature-major rows -> packed (8, K) int32."""
    bits = jax.lax.bitcast_convert_type(feat_fm[0:5], jnp.int32)   # (5, K)
    r = _quant16(feat_fm[5])
    g = _quant16(feat_fm[6])
    b = _quant16(feat_fm[7])
    o = _quant16(feat_fm[8])
    if feat_fm.shape[0] > 9:
        depth = feat_fm[9]
    else:
        depth = jnp.zeros_like(feat_fm[0])
    dbits = jax.lax.bitcast_convert_type(depth, jnp.int32)
    return jnp.concatenate(
        [
            bits,
            ((r << 16) | g)[None, :],
            ((b << 16) | o)[None, :],
            dbits[None, :],
        ],
        axis=0,
    )


def pack_feature_table(feat_n: Array) -> Array:
    """Unpacked (N, >=10) f32 per-gaussian features -> packed (N, 8) int32
    (row-major, the gather source layout)."""
    bits = jax.lax.bitcast_convert_type(feat_n[:, 0:5], jnp.int32)
    r = _quant16(feat_n[:, 5])
    g = _quant16(feat_n[:, 6])
    b = _quant16(feat_n[:, 7])
    o = _quant16(feat_n[:, 8])
    depth = feat_n[:, 9] if feat_n.shape[1] > 9 else jnp.zeros_like(feat_n[:, 0])
    dbits = jax.lax.bitcast_convert_type(depth, jnp.int32)
    return jnp.concatenate(
        [
            bits,
            ((r << 16) | g)[:, None],
            ((b << 16) | o)[:, None],
            dbits[:, None],
        ],
        axis=1,
    )


def unpack_chunk(chunk_i32: Array):
    """Packed (8, C) int32 -> tuple of (1, C) f32 feature rows
    (mx, my, ca, cb, cc, r, g, b, opa, depth)."""
    f = jax.lax.bitcast_convert_type(chunk_i32[0:5, :], jnp.float32)
    rg = chunk_i32[5:6, :]
    bo = chunk_i32[6:7, :]
    inv = jnp.float32(1.0 / 65535.0)
    r = ((rg >> 16) & 0xFFFF).astype(jnp.float32) * inv
    g = (rg & 0xFFFF).astype(jnp.float32) * inv
    b = ((bo >> 16) & 0xFFFF).astype(jnp.float32) * inv
    o = (bo & 0xFFFF).astype(jnp.float32) * inv
    depth = jax.lax.bitcast_convert_type(chunk_i32[7:8, :], jnp.float32)
    return (f[0:1], f[1:2], f[2:3], f[3:4], f[4:5], r, g, b, o, depth)


def pad_packed(feat_pk: Array) -> Array:
    """Pad packed (8, K) -> (8, K_pad) so chunk DMAs never run off the end."""
    k = feat_pk.shape[1]
    k_pad = (-(-k // CHUNK)) * CHUNK + CHUNK
    return jnp.pad(feat_pk, ((0, 0), (0, k_pad - k)))


# Streaming-ring DMA geometry (forward kernel). The instance list is
# consumed in strictly increasing positions across the whole tile grid
# (tile ranges are sorted and contiguous; a tile's 128-aligned window can
# only reach < CHUNK lanes behind the previous tile's end, which never
# crosses back over a block boundary) — so feature blocks can stream
# through a revolving VMEM ring with ONE DMA + ONE semaphore wait per
# BLK-instance block instead of one per 128-instance chunk. At ~1 us DMA
# issue/wait overhead on v5e this is the difference between ~22k and ~6k
# sequenced DMAs per 1M-splat frame (measured: the per-chunk
# double-buffered variant spent ~40% of the forward kernel stalled).
BLK_CHUNKS = 4                 # chunks per streamed block
BLK = CHUNK * BLK_CHUNKS       # instances per block DMA (16 KB packed)
NRING = 8                      # ring slots (VMEM: NRING * 16 KB = 128 KB)
LOOKAHEAD = NRING - 2          # blocks kept in flight ahead of the reader


def chunk_major(feat_pk_pad: Array) -> Array:
    """Packed (8, K_pad) -> chunk-major (K_pad/CHUNK, 8, CHUNK) HBM layout.

    Each (8, CHUNK) chunk is a contiguous leading-dim row, so a block DMA
    is a plain leading-dim slice with no lane-alignment constraints. Cost
    on device equals the (K, 8) -> (8, K) transpose it replaces in the
    gather epilogue (one shuffle of the same bytes).
    """
    k_pad = feat_pk_pad.shape[1]
    return feat_pk_pad.reshape(PACKED_ROWS, k_pad // CHUNK, CHUNK).transpose(
        1, 0, 2
    )


def chunk_major_rows(feat_km: Array) -> Array:
    """Row-major gathered (K, n_rows) int32 rows -> streaming-ready
    chunk-major (n_chunks, n_rows, CHUNK) with block padding. This
    replaces the (K, n) -> (n, K) transpose the gather epilogue used to
    pay — same bytes, one shuffle."""
    k, n_rows = feat_km.shape
    k_pad = -(-k // CHUNK) * CHUNK + CHUNK
    padded = jnp.pad(feat_km, ((0, k_pad - k), (0, 0)))
    cm = padded.reshape(k_pad // CHUNK, CHUNK, n_rows).transpose(0, 2, 1)
    return pad_chunk_major(cm)


def gather_chunk_major(table_pk: Array, gid: Array) -> Array:
    """Gather packed rows straight into the streaming chunk-major layout.

    Pads the (K,) int32 *indices* to the block-aligned capacity before the
    gather (repeating index 0) so the gathered rows are born padded —
    replacing the post-gather jnp.pad of the 32 B x K data itself, a full
    extra HBM copy (~96 MB / ~1.5 ms at 3M instances on v5e). Pad lanes
    hold gaussian 0's real features, which is safe everywhere a zero row
    was: tile ranges never reach pad lanes, out-of-range lanes die through
    the opacity-row mask, and a real conic keeps power <= 0 (no exp
    overflow; the old zero rows relied on the same property).
    """
    k = gid.shape[0]
    n_rows = table_pk.shape[1]                            # 8 or 4 lanes
    k_pad = -(-(k + CHUNK) // BLK) * BLK
    gid_p = jnp.pad(gid, (0, k_pad - k))
    rows = table_pk[gid_p]                                # (K_pad, n_rows)
    return rows.reshape(k_pad // CHUNK, CHUNK, n_rows).transpose(0, 2, 1)


def _pixel_grids(cfg: TileConfig, tile_idx):
    """(P, 1) x/y pixel-center coordinates for one tile (y-up frame)."""
    p = cfg.pixels_per_tile
    tile_x = (tile_idx % cfg.tiles_x).astype(jnp.float32)
    tile_y = (tile_idx // cfg.tiles_x).astype(jnp.float32)
    pix = jax.lax.broadcasted_iota(jnp.int32, (p, 1), 0)
    lx = (pix % cfg.tile_w).astype(jnp.float32)
    ly = (pix // cfg.tile_w).astype(jnp.float32)
    px = tile_x * cfg.tile_w + lx + 0.5
    py = tile_y * cfg.tile_h + ly + 0.5
    return px, py


def _lane_iota(cols: int):
    return jax.lax.broadcasted_iota(jnp.int32, (1, cols), 1)


# ---- MXU scan reformulation -------------------------------------------
# A lane scan (Hillis-Steele) costs log2(128)=7 rounds of roll+select+op on
# a (P, CHUNK) tile — ~21 VPU ops, the single largest compute block in both
# kernels. A cumsum along lanes is also a matmul against a constant 0/1
# triangular matrix, which the MXU does for ~free next to the VPU cost:
#   prefix:  out[p,k] = sum_j x[p,j] * [j <= k]
#   suffix:  out[p,k] = sum_j x[p,j] * [j >= k]
# and cumprod becomes exp(tri_cumsum(log1p(-alpha))) — two transcendentals
# replacing the 7-round product scan. The 0/1 mask is bf16-exact; the data
# operand keeps full f32 mantissa via Precision.HIGHEST (the one-hot/
# selection-matmul rule: MXU default bf16 passes corrupt anything needing
# more than 8 mantissa bits).


def _flip2(x, p: int, to_rows: bool):
    """Shared 2-pass bf16 hi/lo split identity-matmul transpose core.

    Per-value error <= 2^-17 |x| (RELATIVE — NOT exact: values below
    bf16's subnormal range, |x| < ~9.2e-41, flush to 0; never route a
    quantity whose log matters through this — carry the log itself, as
    the kernels do for transmittance). Precision.HIGHEST's 6 passes cost
    ~3x for exactness nothing downstream observes."""
    eye = (
        jax.lax.broadcasted_iota(jnp.int32, (p, p), 0)
        == jax.lax.broadcasted_iota(jnp.int32, (p, p), 1)
    ).astype(jnp.bfloat16)
    hi = x.astype(jnp.bfloat16)
    lo = (x - hi.astype(jnp.float32)).astype(jnp.bfloat16)
    if to_rows:   # (P, C) -> (C, P): contract the shared P on dim 0
        dims = (((0,), (0,)), ((), ()))
        pairs = ((hi, eye), (lo, eye))
    else:         # (C, P) -> (P, C): eye on the left, contract its dim 0
        dims = (((0,), (1,)), ((), ()))
        pairs = ((eye, hi), (eye, lo))
    (a, b), (a2, b2) = pairs
    return jax.lax.dot_general(
        a, b, dims, preferred_element_type=jnp.float32
    ) + jax.lax.dot_general(
        a2, b2, dims, preferred_element_type=jnp.float32
    )


def _flip_to_rows(x):
    """(P, C) -> (C, P) transpose via :func:`_flip2` (2-pass bf16 split,
    error <= 2^-17 relative; see its caveats)."""
    return _flip2(x, x.shape[0], to_rows=True)


def _flip_to_cols(x):
    """(C, P) -> (P, C): the other direction of :func:`_flip_to_rows`,
    same error model."""
    return _flip2(x, x.shape[1], to_rows=False)


def _tri_mask(cols: int, suffix: bool, strict: bool = False):
    j = jax.lax.broadcasted_iota(jnp.int32, (cols, cols), 0)
    k = jax.lax.broadcasted_iota(jnp.int32, (cols, cols), 1)
    if strict:
        keep = (j > k) if suffix else (j < k)
    else:
        keep = (j >= k) if suffix else (j <= k)
    return keep.astype(jnp.bfloat16)  # 0/1 is bf16-exact


def _tri_cumsum(x, mask, fast: bool = False):
    """Inclusive lane cumsum of (P, C) f32 x against a precomputed (C, C)
    triangular 0/1 bf16 mask (see :func:`_tri_mask`) on the MXU.

    Runs as TWO single-pass bf16 matmuls (hi + residual lo split of x)
    instead of one Precision.HIGHEST matmul (6 passes on v5e): the mask is
    bf16-exact, so each product is exact and only the lo-residual's own
    bf16 rounding survives — per-term error <= 2^-18 |x|, i.e. summed
    log-transmittance error <~ 2^-18 * sum|log(1-a)|, orders of magnitude
    inside the 1e-3 viewer-parity budget.

    ``fast`` (the 16-byte-row training mode) drops the lo residual: ONE
    bf16 pass, per-term error 2^-9 |x| — summed log-transmittance error
    <= 2^-9 * sum|log(1-a)| <= ~2% relative T in the deepest visible
    stacks (|log T| <= 9.2 at the 1e-4 early stop), below the training
    rows' own quantization floor.
    """
    hi = x.astype(jnp.bfloat16)
    dims = (((1,), (0,)), ((), ()))
    out = jax.lax.dot_general(
        hi, mask, dims, preferred_element_type=jnp.float32
    )
    if fast:
        return out
    lo = (x - hi.astype(jnp.float32)).astype(jnp.bfloat16)
    return out + jax.lax.dot_general(
        lo, mask, dims, preferred_element_type=jnp.float32
    )


# log1p(-alpha) clamp: exp(-60) ~ 8.8e-27 stands in for "opaque" (alpha=1,
# true factor 0); any product below exp(-87) underflows to exactly 0.0 in
# f32 anyway, and transmittance this small is far past every early-stop /
# gradient threshold.
_LOG_OM_MIN = -60.0


def clip_bounds_alpha(alpha_clip) -> bool:
    """True iff alpha_clip bounds alpha strictly below 1 *after f32
    rounding*. The kernels clip in LOG space in f32
    (jnp.minimum(power, log_clip) in _chunk_alpha), so a Python double
    like 1 - 1e-8 rounds to exactly 1.0f (log_clip == 0.0f) and does NOT
    bound alpha — comparing the double (`alpha_clip < 1.0`) would wrongly
    skip the log1p(-1) = -inf / divide-by-(1-alpha)==0 guards."""
    return alpha_clip is not None and float(np.float32(alpha_clip)) < 1.0


def _log_om(alpha, alpha_clip=None):
    """log(1 - alpha), clamped against alpha == 1. The clamp is a full
    (P, CHUNK) VPU op per chunk; when alpha_clip already bounds alpha away
    from 1 at trace time (log1p(-clip) is finite, e.g. -6.9 at the default
    0.999) it is skipped entirely."""
    s = jnp.log1p(-alpha)
    if clip_bounds_alpha(alpha_clip):
        return s
    return jnp.maximum(s, _LOG_OM_MIN)


def _power_basis(pxl, pyl):
    """(P, 6) quadratic pixel basis [1, x, y, x^2, xy, y^2] in TILE-LOCAL
    coordinates (build once per tile program; see :func:`_chunk_alpha`)."""
    ones_p = jnp.ones_like(pxl)
    return jnp.concatenate(
        [ones_p, pxl, pyl, pxl * pxl, pxl * pyl, pyl * pyl], axis=1
    )


class _ExactBasis:
    """(P, 6) pixel basis whose every entry is EXACTLY representable in
    bf16 — built from CENTERED half-integer tile-local coordinates.

    With the basis origin at the tile CENTER, local pixel coordinates are
    half-integers in [-(tile/2 - 0.5), +(tile/2 - 0.5)]; for tiles up to
    16 px the doubled coordinates are integers <= 15, so every product
    x*y (= (2x)(2y)/4) is an integer <= 225 scaled by a power of two —
    at most 8 significand bits, which bf16 holds exactly. The power
    matmul then needs NO basis hi/lo split: splitting only the (6, CHUNK)
    coefficient operand gives
      fast  (16-byte rows):  b @ ch + b @ cl            (2 MXU passes)
      exact (32-byte rows):  b @ ch + b @ cl + b @ cl2  (3 passes)
    with error = the coefficient tail alone (~|coef| * 2^-16 fast /
    2^-24 exact — the exact form matches Precision.HIGHEST's 6 passes at
    half the cost). Tiles wider than 16 px fall back to the split-basis /
    HIGHEST paths (see _basis_is_bf16_exact)."""

    __slots__ = ("b",)

    def __init__(self, b):
        self.b = b


def _basis_is_bf16_exact(cfg: TileConfig) -> bool:
    """True when centered tile-local basis entries are bf16-exact (see
    :class:`_ExactBasis`): doubled coords must stay <= 15."""
    return cfg.tile_w <= 16 and cfg.tile_h <= 16


def _make_basis(px, py, oxb, oyb, cfg: TileConfig, fast: bool):
    """Per-tile basis operand for :func:`_chunk_alpha`'s power matmul:
    :class:`_ExactBasis` for <=16 px tiles (centered origin oxb/oyb), else
    the legacy split-tuple (fast) / f32 HIGHEST (exact) forms."""
    basis6 = _power_basis(px - oxb, py - oyb)
    if _basis_is_bf16_exact(cfg):
        return _ExactBasis(basis6.astype(jnp.bfloat16))
    return _split_basis(basis6) if fast else basis6


def _split_basis(basis6):
    """Pre-split the (P, 6) basis into bf16 hi + lo residual ONCE per tile
    program, for the fast-mode 3-pass power matmul in :func:`_chunk_alpha`
    (the split is loop-invariant; doing it per chunk would waste VPU).
    Only used for tiles too wide for the exact-bf16 basis."""
    bh = basis6.astype(jnp.bfloat16)
    bl = (basis6 - bh.astype(jnp.float32)).astype(jnp.bfloat16)
    return bh, bl


def _log_clip(alpha_clip):
    """log of the f32-rounded alpha clip, for folding the clip into
    log-alpha space (min(p, log clip) <=> min(alpha, clip) up to one ulp
    of exp/log rounding). 0.0 when the clip doesn't bound alpha below 1
    (exp(0) = 1: alpha <= 1 keeps _log_om's -60 floor reachable instead
    of nan); None when alpha_clip is None (no clamp pass at all — matches
    the historical unclipped semantics, including its alpha > 1 hazard
    under quantization, which post-sigmoid assets never hit)."""
    if alpha_clip is None:
        return None
    if clip_bounds_alpha(alpha_clip):
        return float(np.log(np.float32(alpha_clip)))
    return 0.0


def _chunk_alpha(chunk, basis6, ox, oy, kidx, start, end, alpha_clip,
                 zb=None, packed16=False):
    """Alpha matrix (P, CHUNK) for one packed feature chunk at tile pixels.

    chunk: (8, CHUNK) int32 packed; kidx: (1, CHUNK) absolute instance ids;
    basis6: the per-tile basis operand from :func:`_make_basis`
    (:class:`_ExactBasis`, split tuple, or f32 array); ox/oy: the basis
    ORIGIN (tile center for the exact-bf16 basis); zb: optional (P, 1)
    per-pixel z-buffer (camera z, -inf = unoccluded) — fragments at or
    behind it are discarded (depthTest analogue, index.js:177-181).

    The Gaussian quadratic form -(dx,dy)ᵀ·conic·(dx,dy)/2 is evaluated as
    ONE (P, 6) @ (6, CHUNK) MXU matmul against per-instance polynomial
    coefficients instead of ~10 (P, CHUNK) VPU ops. Everything is expanded
    in TILE-LOCAL coordinates: visible fragments have ca·mxl² ≤ ~1.2e3
    (the +0.3 conic dilation bounds 1/σ² ≤ 3.33 and |mxl| ≤ 2.8σ + 16),
    so the f32 cancellation error in power is ≤ ~1e-4 — 10x inside the
    1e-3 viewer-parity budget. Global coordinates would push terms to
    ~1e7 and the error past the budget; never switch this to global px.

    Everything per-fragment is computed in LOG-ALPHA space: log(opacity)
    and the range mask are FOLDED into the constant coefficient (masked
    lanes get log(1e-30), so their alpha underflows the blend without any
    (P, CHUNK) select or multiply), and the alpha clip folds in as
    min(p, log clip). (1, CHUNK) row math is ~P-times cheaper than the
    per-fragment passes it replaces; the callers' weight w = alpha * T
    becomes exp(s_excl + p_eff) — an add instead of a multiply.

    The exp(-4) cutoff (index.js:172) is kept in BOTH row modes as a
    row-threshold compare + one select on log-alpha (skipping it in the
    fast mode was measured to drag the fast-vs-exact gradient cosine to
    0.9986, under the 0.999 contract).

    Returns (alpha, rows, in_range, p_eff, p_raw):
      rows: unpacked feature tuple (:func:`unpack_chunk` /
            :func:`unpack_chunk16` by the static ``packed16`` flag);
      p_eff: (P, CHUNK) effective log alpha — alpha == exp(p_eff);
      p_raw: pre-clip log alpha for the backward's clip mask (compare
             against :func:`_log_clip`; None when alpha_clip is None).
    """
    rows = unpack_chunk16(chunk) if packed16 else unpack_chunk(chunk)
    return _rows_alpha(rows, basis6, ox, oy, kidx, start, end,
                       alpha_clip, zb, packed16)


def _rows_alpha(rows, basis6, ox, oy, kidx, start, end, alpha_clip,
                zb=None, packed16=False):
    """:func:`_chunk_alpha`'s fragment math on an already-unpacked rows
    tuple [mx, my, ca, cb, cc, r, g, b, opa, depth] of (1, CHUNK) f32 —
    shared with the fused cached-viewer kernel, whose rows come from
    in-kernel projection instead of a packed table."""
    mxl = rows[0] - ox                     # (1, CHUNK) tile-local mean
    myl = rows[1] - oy
    ca, cb, cc = rows[2], rows[3], rows[4]
    opa = rows[8]
    in_range = (kidx >= start) & (kidx < end)
    opa_m = jnp.where(in_range, opa, 0.0)  # (1, CHUNK)
    lnopa = jnp.log(jnp.maximum(opa_m, 1e-30))
    coef = jnp.concatenate(
        [
            -0.5 * (ca * mxl * mxl + cc * myl * myl) - cb * mxl * myl
            + lnopa,
            ca * mxl + cb * myl,
            cc * myl + cb * mxl,
            -0.5 * ca,
            -cb,
            -0.5 * cc,
        ],
        axis=0,
    )                                      # (6, CHUNK)
    dims = (((1,), (0,)), ((), ()))
    if isinstance(basis6, _ExactBasis):
        # exact-bf16 basis (<=16 px tiles): split only the coefficient.
        # 2 passes (fast rows, ~|coef| 2^-16 tail, at the rows' own
        # quantization floor) or 3 (32-byte rows, ~2^-24 tail — the same
        # error class as Precision.HIGHEST at half the MXU passes).
        b = basis6.b
        ch = coef.astype(jnp.bfloat16)
        c1 = coef - ch.astype(jnp.float32)
        cl = c1.astype(jnp.bfloat16)
        power = jax.lax.dot_general(
            b, ch, dims, preferred_element_type=jnp.float32
        ) + jax.lax.dot_general(
            b, cl, dims, preferred_element_type=jnp.float32
        )
        if not packed16:
            cl2 = (c1 - cl.astype(jnp.float32)).astype(jnp.bfloat16)
            power = power + jax.lax.dot_general(
                b, cl2, dims, preferred_element_type=jnp.float32
            )                              # (P, CHUNK)
    elif isinstance(basis6, tuple):
        # wide-tile fast fallback: 3-pass hi/lo split against the split
        # basis (:func:`_split_basis`); dropped bl@cl term ~2^-18 |term|.
        bh, bl = basis6
        ch = coef.astype(jnp.bfloat16)
        cl = (coef - ch.astype(jnp.float32)).astype(jnp.bfloat16)
        power = (
            jax.lax.dot_general(bh, ch, dims,
                                preferred_element_type=jnp.float32)
            + jax.lax.dot_general(bh, cl, dims,
                                  preferred_element_type=jnp.float32)
            + jax.lax.dot_general(bl, ch, dims,
                                  preferred_element_type=jnp.float32)
        )                                  # (P, CHUNK)
    else:
        power = jax.lax.dot_general(
            basis6, coef, dims,
            precision=jax.lax.Precision.HIGHEST,
            preferred_element_type=jnp.float32,
        )                                  # (P, CHUNK)
    log_clip = _log_clip(alpha_clip)
    if log_clip is None:
        p_raw = None
        p_eff = power
    else:
        p_raw = power
        p_eff = jnp.minimum(power, log_clip)
    # exp(-4) cutoff on the RAW quadratic power (power here includes
    # lnopa, so the threshold is the (1, CHUNK) row lnopa - 4). Kept in
    # the fast mode too: dropping it adds the sub-exp(-4) Gaussian tails
    # back and pushes the fast-vs-exact gradient cosine below the 0.999
    # contract (measured 0.9986 on the pipeline test).
    valid = power >= (lnopa - 4.0)
    if zb is not None:
        # camera z is negative in front; nearer = larger. A fragment
        # at depth <= z-buffer is occluded by opaque geometry.
        valid = valid & (rows[9] > zb)     # (P, CHUNK) broadcast
    p_eff = jnp.where(valid, p_eff, -1e4)
    alpha = jnp.exp(p_eff)                 # exp(-1e4) == +0.0 in f32
    return alpha, rows, in_range, p_eff, p_raw


def _fwd_kernel(
    # scalar prefetch
    starts_ref, ends_ref,
    # inputs
    feat_hbm, *maybe_zbuf_and_outs,
    # then: out_ref, scratch (ring, cur, sems)
    cfg: TileConfig, alpha_clip, early_stop, has_zbuf: bool, n_blocks: int,
    packed16: bool, stream_lanes: int = 8,
):
    if has_zbuf:
        zbuf_ref, out_ref, ring, cur, sems = maybe_zbuf_and_outs
        zb = zbuf_ref[0, :, 0:1]           # (P, 1) camera-z buffer
    else:
        out_ref, ring, cur, sems = maybe_zbuf_and_outs
        zb = None
    t = pl.program_id(0)
    p = cfg.pixels_per_tile
    start = starts_ref[t]
    end = ends_ref[t]
    astart = (start // CHUNK) * CHUNK      # aligned first chunk
    n_chunks = pl.cdiv(end - astart, CHUNK)
    px, py = _pixel_grids(cfg, t)
    ox = (t % cfg.tiles_x).astype(jnp.float32) * cfg.tile_w
    oy = (t // cfg.tiles_x).astype(jnp.float32) * cfg.tile_h
    # 16-byte training rows select the fast fragment math: 2-pass power
    # matmul on the exact-bf16 basis, single-pass bf16 scans and
    # accumulation — the rows' own quantization already floors the error
    # above all of these
    fast = packed16
    if _basis_is_bf16_exact(cfg):
        # basis origin at the tile CENTER: half-integer local coords make
        # every basis entry bf16-exact (see _ExactBasis)
        ox = ox + 0.5 * cfg.tile_w
        oy = oy + 0.5 * cfg.tile_h
    basis6 = _make_basis(px, py, ox, oy, cfg, fast)

    def block_copy(bi):
        # clamped source keeps lookahead DMAs past the table in bounds
        # (their data is never read; they are drained at grid end)
        src = jnp.minimum(bi, n_blocks - 1) * BLK_CHUNKS
        if stream_lanes < feat_hbm.shape[1]:
            # depth-free packed16 path: stream only the 4 payload lanes of
            # the 8-lane stored rows — halves ring HBM traffic (the wide
            # storage exists for the fused post-sort gather, not the kernel)
            src_ref = feat_hbm.at[pl.ds(src, BLK_CHUNKS),
                                  pl.ds(0, stream_lanes)]
        else:
            src_ref = feat_hbm.at[pl.ds(src, BLK_CHUNKS)]
        return pltpu.make_async_copy(
            src_ref,
            ring.at[pl.ds((bi % NRING) * BLK_CHUNKS, BLK_CHUNKS)],
            sems.at[bi % NRING],
        )

    # ring cursors live in SMEM across the whole sequential grid:
    # cur[0] = first block not yet waited, cur[1] = first not yet issued
    @pl.when(t == 0)
    def _():
        cur[0] = 0
        cur[1] = 0

    def enter_block(b):
        """Advance the ring to block b: retire skipped in-flight blocks,
        top the lookahead back up, ensure b's data has landed. Consumption
        is monotone at block granularity, so every slot reuse is safe: all
        outstanding blocks live within LOOKAHEAD < NRING of the reader."""
        waited = cur[0]
        fetched = cur[1]
        retire_to = jnp.minimum(b + 1, fetched)

        def w(bi, _):
            block_copy(bi).wait()
            return 0

        jax.lax.fori_loop(waited, retire_to, w, 0)
        waited = jnp.maximum(waited, retire_to)
        # a jump past the lookahead window skips never-issued blocks
        fetched = jnp.maximum(fetched, b)
        waited = jnp.maximum(waited, b)

        def s(bi, _):
            block_copy(bi).start()
            return 0

        jax.lax.fori_loop(fetched, b + LOOKAHEAD, s, 0)
        fetched = jnp.maximum(fetched, b + LOOKAHEAD)

        @pl.when(waited == b)  # jump case: b was only just issued
        def _():
            block_copy(b).wait()

        cur[0] = jnp.maximum(waited, b + 1)
        cur[1] = fetched

    tri_pre = _tri_mask(CHUNK, suffix=False, strict=True)

    def body(state):
        c, lt_vec, acc = state
        ci = astart // CHUNK + c           # global chunk index
        b = ci // BLK_CHUNKS               # global block index

        @pl.when(b >= cur[0])
        def _():
            enter_block(b)

        chunk = ring[(b % NRING) * BLK_CHUNKS + (ci % BLK_CHUNKS)]
        kidx = _lane_iota(CHUNK) + ci * CHUNK
        alpha, rows, _, p_eff, _ = _chunk_alpha(
            chunk, basis6, ox, oy, kidx, start, end, alpha_clip, zb,
            packed16=packed16,
        )
        # EXCLUSIVE cumprod of (1-alpha) straight from the STRICT
        # triangular mask (no roll/select pass); the chunk-inclusive
        # total needed for the carry is recovered on the last lane only.
        s = _log_om(alpha, alpha_clip)                    # (P, CHUNK)
        s_excl = _tri_cumsum(s, tri_pre, fast)
        # w = alpha * exp(s_excl) as ONE exp of the log-space sum: the
        # within-chunk weight rides log-alpha (p_eff) — an add replaces
        # the t_excl multiply (and masked lanes die through p_eff ~ -69)
        w = jnp.exp(s_excl + p_eff)                       # within-chunk only
        # rgb + expected-depth accumulation as ONE small MXU pass instead
        # of four VPU lane-tree reductions: (P, K) @ (K, 4). The carried
        # transmittance t_vec scales the whole chunk uniformly per pixel,
        # so it multiplies the (P, 4) matmul OUTPUT — 1/32nd the lanes of
        # scaling w itself.
        colmat = jnp.concatenate(
            [rows[5], rows[6], rows[7], rows[9]], axis=0
        )                                                 # (4, CHUNK)
        if fast:
            # single bf16 pass: error ~2^-9 * w * c <= 2e-3 absolute rgb,
            # on par with the rows' RGBA8 color floor
            contrib = jax.lax.dot_general(
                w.astype(jnp.bfloat16), colmat.astype(jnp.bfloat16),
                (((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32,
            )
        else:
            contrib = jax.lax.dot_general(
                w, colmat, (((1,), (1,)), ((), ())),
                precision=jax.lax.Precision.HIGHEST,  # f32: parity at 1e-3
                preferred_element_type=jnp.float32,
            )
        acc = acc + jnp.exp(lt_vec) * contrib             # (P, 4)
        # carried transmittance lives in LOG space: lt never underflows
        # (per-term s >= -60 via _log_om), so the saved log-T channel
        # stays finite where T itself flushes below f32/bf16 subnormals —
        # the backward recovers per-instance transmittance from it
        # without a log() and without a dead-gradient window. One (P, 1)
        # exp per chunk replaces the old multiplicative update's exp.
        lt_vec = lt_vec + (
            s_excl[:, CHUNK - 1:CHUNK] + s[:, CHUNK - 1:CHUNK]
        )
        return c + 1, lt_vec, acc

    log_eps = float(np.log(early_stop)) if early_stop > 0.0 else -np.inf

    def cond(state):
        c, lt_vec = state[0], state[1]
        # early_stop == 0.0 walks every chunk ("exact" contract): lt is
        # always finite, unlike the old multiplicative T which could hit
        # exact 0 and stop — identical images (the extra terms add 0.0)
        return jnp.logical_and(c < n_chunks, jnp.max(lt_vec) > log_eps)

    init = (
        jnp.int32(0),
        jnp.zeros((p, 1), jnp.float32),
        jnp.zeros((p, 4), jnp.float32),
    )
    c_done, lt_vec, acc = jax.lax.while_loop(cond, body, init)

    # grid end: drain every still-in-flight lookahead DMA so the kernel
    # exits with balanced semaphores
    @pl.when(t == pl.num_programs(0) - 1)
    def _():
        def w(bi, _):
            block_copy(bi).wait()
            return 0

        jax.lax.fori_loop(cur[0], cur[1], w, 0)

    # assemble the (P, 6) per-pixel block then transpose ONCE to the
    # planar (8, P) output row layout (2-pass bf16-split identity matmul,
    # _flip_to_rows: error <= 2^-17 RELATIVE — far inside the 1e-3 parity
    # budget; log-T rides as its own channel precisely because relative
    # error is harmless on O(100) log values but catastrophic on
    # subnormal-range T itself)
    cols6 = jnp.concatenate(
        [
            acc[:, 0:3],               # r, g, b
            jnp.exp(lt_vec),           # T_final (image alpha = 1 - T)
            acc[:, 3:4],               # expected depth sum_k a_k T_k d_k
            lt_vec,                    # log T_final (backward residual)
        ],
        axis=1,
    )                                  # (P, 6)
    rows6 = _flip_to_rows(cols6)       # (6, P)
    out_ref[0, 0:4, :] = rows6[0:4]
    # chunks-done is a per-tile SCALAR: broadcast a row directly
    out_ref[0, 4:5, :] = jnp.full((1, p), 0.0, jnp.float32) + c_done.astype(
        jnp.float32
    )
    out_ref[0, 5:6, :] = rows6[4:5]
    out_ref[0, 6:7, :] = rows6[5:6]    # log T_final
    out_ref[0, 7:8, :] = jnp.zeros((1, p), jnp.float32)


def pad_chunk_major(feat_cm: Array) -> Array:
    """Pad chunk-major (n, 8, CHUNK) rows to a BLK_CHUNKS multiple so every
    streamed block DMA slice is in bounds."""
    n = feat_cm.shape[0]
    n_pad = -(-n // BLK_CHUNKS) * BLK_CHUNKS
    return jnp.pad(feat_cm, ((0, n_pad - n), (0, 0), (0, 0)))


@functools.partial(
    jax.jit,
    static_argnames=(
        "cfg", "alpha_clip", "early_stop", "packed16", "want_depth"
    ),
)
def rasterize_cm_fwd(
    feat_cm: Array,
    starts: Array,
    ends: Array,
    cfg: TileConfig,
    alpha_clip: Optional[float] = None,
    early_stop: float = 1e-4,
    zbuf: Optional[Array] = None,
    packed16: bool = False,
    want_depth: bool = True,
):
    """Pallas forward on chunk-major packed features.

    feat_cm: (n_chunks, 8, CHUNK) int32 chunk-major instance rows (sorted;
    see :func:`chunk_major`), n_chunks a BLK_CHUNKS multiple with at least
    one chunk of slack past the last real instance. ``packed16`` selects
    the training-row decode + fast fragment math (the rows are 8 int32
    lanes wide either way — see the PACKED16 layout note).
    zbuf: optional (T, P, 1) camera-z buffer for opaque-geometry occlusion
    (depth rides lane 4 in training rows, lane 7 in viewer rows).
    Returns (out_tiles PLANAR (T, 8, P) [rows r,g,b,T_final,chunks,
    depth,..], chunks_done (T,)).
    """
    t_tiles = cfg.num_tiles
    p = cfg.pixels_per_tile
    n_rows = feat_cm.shape[1]
    # training rows without a depth consumer: stream only the 4 payload
    # lanes (lane 4 = f32 depth is needed for expected-depth output or
    # z-buffer occlusion; lanes 5-7 are gather-alignment padding)
    stream_lanes = (
        PACKED16_ROWS
        if packed16 and zbuf is None and not want_depth
        else n_rows
    )
    n_blocks = feat_cm.shape[0] // BLK_CHUNKS
    kernel = functools.partial(
        _fwd_kernel, cfg=cfg, alpha_clip=alpha_clip, early_stop=early_stop,
        has_zbuf=zbuf is not None, n_blocks=n_blocks, packed16=packed16,
        stream_lanes=stream_lanes,
    )
    in_specs = [pl.BlockSpec(memory_space=pltpu.MemorySpace.HBM)]
    inputs = [feat_cm]
    if zbuf is not None:
        in_specs.append(
            pl.BlockSpec((1, p, 1), lambda i, *_: (i, 0, 0),
                         memory_space=pltpu.VMEM)
        )
        inputs.append(zbuf)
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,
        grid=(t_tiles,),
        in_specs=in_specs,
        out_specs=pl.BlockSpec((1, 8, p), lambda i, *_: (i, 0, 0),
                               memory_space=pltpu.VMEM),
        scratch_shapes=[
            pltpu.VMEM((NRING * BLK_CHUNKS, stream_lanes, CHUNK), jnp.int32),
            pltpu.SMEM((2,), jnp.int32),
            pltpu.SemaphoreType.DMA((NRING,)),
        ],
    )
    out = pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((t_tiles, 8, p), jnp.float32),
        interpret=_use_interpret(),
    )(starts, ends, *inputs)
    return out, out[:, 4, 0].astype(jnp.int32)


# ---- fused cached-viewer forward: projection INSIDE the kernel ---------
#
# The stale-order redraw (render.bin_scene(cache_params=True) +
# render_binned) re-projects every duplicated instance each frame. Doing
# that as an XLA pass costs ~4 ms of elementwise math on 3M instances plus
# ~1.5 ms packing/relayout into the 16-byte rows the kernel streams — all
# of it per-INSTANCE row work the kernel itself can do on (1, CHUNK) rows
# for ~1/P-th of a (P, CHUNK) pass (i.e. essentially free against its own
# transcendental floor). This kernel streams the CAMERA-INDEPENDENT
# per-instance parameters (mean / cov6 / rgb / opacity / max_scale —
# gathered once per resort) and runs the reference's vertex-shader EWA +
# worker culls (index.js:101-164, 507-554; the same math as
# ops/projection.project_gaussians, elementwise f32) per chunk before the
# shared fragment path (_rows_alpha). No per-frame gather, no per-frame
# pack, full-f32 projection (no 16-byte row quantization).

CACHED_ROWS = 16   # mean xyz, cov6 (xx xy xz yy yz zz), rgb, opa, max_scale
GSUB = 8           # chunks projected together: (GSUB, CHUNK) = full vregs
GROUP = GSUB * CHUNK
NRING_G = 6        # group ring slots (6 x 64 KB VMEM)
LOOKAHEAD_G = NRING_G - 2


def group_major_rows(feat_km: Array) -> Array:
    """(K, CACHED_ROWS) f32 rows -> (n_groups, CACHED_ROWS, GSUB, CHUNK)
    group-major layout: one group = GSUB chunks, so each parameter row of
    a group is a contiguous (GSUB, CHUNK) block — FULL (8, 128) vregs for
    the in-kernel projection (per-(1, CHUNK) row math wastes 7/8 sublanes
    and measured ~5 ms/frame at 30k chunks). One slack group is appended
    for the ring's clamped lookahead DMAs."""
    k, n_rows = feat_km.shape
    k_pad = -(-k // GROUP) * GROUP + GROUP
    padded = jnp.pad(feat_km, ((0, k_pad - k), (0, 0)))
    return padded.reshape(
        k_pad // GROUP, GSUB, CHUNK, n_rows
    ).transpose(0, 3, 1, 2)


def pack_cached_rows(means, cov6, colors, opacities, max_scales) -> Array:
    """Per-instance camera-independent parameters -> (K, CACHED_ROWS) f32
    rows for :func:`rasterize_cached_fwd` (chunk-major via
    :func:`chunk_major_rows`)."""
    k = means.shape[0]
    return jnp.concatenate(
        [
            jnp.asarray(means, jnp.float32),
            jnp.asarray(cov6, jnp.float32),
            jnp.asarray(colors, jnp.float32),
            jnp.asarray(opacities, jnp.float32)[:, None],
            jnp.asarray(max_scales, jnp.float32)[:, None],
            jnp.zeros((k, CACHED_ROWS - 14), jnp.float32),
        ],
        axis=-1,
    )


def make_camera_table(modelview, projection) -> Array:
    """(8, 128) f32 camera scalar block for the fused kernel: modelview in
    [0:4, 0:4], projection in [4:8, 0:4] (lane-padded to the VMEM tile)."""
    tbl = jnp.zeros((8, 128), jnp.float32)
    tbl = tbl.at[0:4, 0:4].set(jnp.asarray(modelview, jnp.float32))
    return tbl.at[4:8, 0:4].set(jnp.asarray(projection, jnp.float32))


def _project_rows(prm, cam, *, width: int, height: int):
    """In-kernel EWA projection of one GROUP of cached parameter rows.

    prm: (CACHED_ROWS, GSUB, CHUNK) f32 — one group-major block, so every
    elementwise op below runs on full (8, 128) vregs; cam: (8, 128)
    camera table. Returns (10, GSUB, CHUNK) stacked `_rows_alpha` rows
    [mx, my, ca, cb, cc, r, g, b, opa, depth] — the exact math of
    ops/projection._project_f32 (vertex shader index.js:101-164 + worker
    culls index.js:507-554), with every cull folded into the opacity row
    (masked -> 0, which _rows_alpha maps to log(1e-30))."""
    mv = [[cam[i, j] for j in range(4)] for i in range(4)]
    pr = [[cam[4 + i, j] for j in range(4)] for i in range(4)]
    mex, mey, mez = prm[0], prm[1], prm[2]
    sxx, sxy, sxz = prm[3], prm[4], prm[5]
    syy, syz, szz = prm[6], prm[7], prm[8]
    opa = prm[12]
    max_scale = prm[13]

    def xform(m, vx, vy, vz):
        return [
            m[i][0] * vx + m[i][1] * vy + m[i][2] * vz + m[i][3]
            for i in range(4)
        ]

    cx, cy, cz, _ = xform(mv, mex, mey, mez)
    px_c, py_c, pz_c, w_clip = xform(pr, cx, cy, cz)

    bounds = FRUSTUM_GUARD * w_clip
    in_frustum = (
        (pz_c >= -w_clip)
        & (px_c >= -bounds) & (px_c <= bounds)
        & (py_c >= -bounds) & (py_c <= bounds)
    )                                       # index.js:110-115
    # worker cull (index.js:548): in front + size*opacity > 1e-4*(-z)
    keep = in_frustum & (cz < 0.0) & (
        max_scale * opa > SIZE_CULL_THRESHOLD * (-cz)
    )

    focal = (height / 2.0) * jnp.abs(pr[1][1])   # index.js:191
    safe_z = jnp.where(jnp.abs(cz) < 1e-8, 1e-8, cz)
    fz = focal / safe_z
    fz2 = focal / (safe_z * safe_z)
    # T = W J collapsed to two row vectors (ops/projection.py t0/t1)
    t0 = [fz * mv[0][j] - (cx * fz2) * mv[2][j] for j in range(3)]
    t1 = [-fz * mv[1][j] + (cy * fz2) * mv[2][j] for j in range(3)]
    u0 = [
        sxx * t0[0] + sxy * t0[1] + sxz * t0[2],
        sxy * t0[0] + syy * t0[1] + syz * t0[2],
        sxz * t0[0] + syz * t0[1] + szz * t0[2],
    ]
    u1 = [
        sxx * t1[0] + sxy * t1[1] + sxz * t1[2],
        sxy * t1[0] + syy * t1[1] + syz * t1[2],
        sxz * t1[0] + syz * t1[1] + szz * t1[2],
    ]
    a = t0[0] * u0[0] + t0[1] * u0[1] + t0[2] * u0[2] + 0.3
    b = t1[0] * u0[0] + t1[1] * u0[1] + t1[2] * u0[2]
    c = t1[0] * u1[0] + t1[1] * u1[1] + t1[2] * u1[2] + 0.3

    mid = 0.5 * (a + c)
    r2 = jnp.square(0.5 * (a - c)) + jnp.square(b)
    radius = jnp.sqrt(jnp.maximum(r2, 0.0))
    lam1 = mid + radius
    lam2 = jnp.maximum(mid - radius, 0.1)       # index.js:146
    vx, vy = b, lam1 - a
    v2 = vx * vx + vy * vy
    ok = v2 > 1e-24
    vnorm = jnp.sqrt(jnp.where(ok, v2, 1.0))
    dvx = jnp.where(ok, vx / vnorm, 1.0)
    dvy = jnp.where(ok, vy / vnorm, 0.0)
    len1 = jnp.minimum(jnp.sqrt(2.0 * lam1), 1024.0)   # index.js:148-149
    len2 = jnp.minimum(jnp.sqrt(2.0 * jnp.maximum(lam2, 0.0)), 1024.0)
    lam1_eff = jnp.maximum(0.5 * len1 * len1, 1e-8)
    lam2_eff = jnp.maximum(0.5 * len2 * len2, 1e-8)
    inv1 = 1.0 / lam1_eff
    inv2 = 1.0 / lam2_eff
    conic_a = inv1 * dvx * dvx + inv2 * dvy * dvy
    conic_b = (inv1 - inv2) * dvx * dvy
    conic_c = inv1 * dvy * dvy + inv2 * dvx * dvx

    safe_w = jnp.where(jnp.abs(w_clip) < 1e-8, 1e-8, w_clip)
    mx = (px_c / safe_w + 1.0) * (width / 2.0)
    my = (py_c / safe_w + 1.0) * (height / 2.0)

    opa_m = jnp.where(keep, opa, 0.0)
    return jnp.stack(
        [mx, my, conic_a, conic_b, conic_c,
         prm[9], prm[10], prm[11], opa_m, cz],
        axis=0,
    )                                       # (10, GSUB, CHUNK)


def _cached_fwd_kernel(
    # scalar prefetch
    starts_ref, ends_ref,
    # inputs
    prm_hbm, cam_ref,
    # outputs + scratch
    out_ref, ring, proj_vmem, cur, sems,
    *, cfg: TileConfig, alpha_clip, early_stop, n_gblocks: int,
):
    """:func:`_fwd_kernel` with the 16-byte-row decode replaced by
    in-kernel projection of cached f32 parameter rows: the ring streams
    GROUP-major blocks (GSUB chunks), each group is projected ONCE on
    full (GSUB, CHUNK) vregs into a persistent scratch (cur[2] tracks
    the projected group across the sequential grid, so boundary groups
    shared by adjacent tiles are not re-projected), and the chunk loop
    slices (1, CHUNK) rows out of it for the shared fragment path."""
    t = pl.program_id(0)
    p = cfg.pixels_per_tile
    start = starts_ref[t]
    end = ends_ref[t]
    astart = (start // CHUNK) * CHUNK
    n_chunks = pl.cdiv(end - astart, CHUNK)
    px, py = _pixel_grids(cfg, t)
    ox = (t % cfg.tiles_x).astype(jnp.float32) * cfg.tile_w
    oy = (t // cfg.tiles_x).astype(jnp.float32) * cfg.tile_h
    if _basis_is_bf16_exact(cfg):
        ox = ox + 0.5 * cfg.tile_w
        oy = oy + 0.5 * cfg.tile_h
    basis6 = _make_basis(px, py, ox, oy, cfg, fast=True)
    cam = cam_ref[0]

    def group_copy(gi):
        src = jnp.minimum(gi, n_gblocks - 1)
        return pltpu.make_async_copy(
            prm_hbm.at[src], ring.at[gi % NRING_G], sems.at[gi % NRING_G],
        )

    @pl.when(t == 0)
    def _():
        cur[0] = 0
        cur[1] = 0
        cur[2] = -1

    def enter_group(g):
        # identical ring-advance protocol to _fwd_kernel (see its note),
        # at group granularity
        waited = cur[0]
        fetched = cur[1]
        retire_to = jnp.minimum(g + 1, fetched)

        def w(gi, _):
            group_copy(gi).wait()
            return 0

        jax.lax.fori_loop(waited, retire_to, w, 0)
        waited = jnp.maximum(waited, retire_to)
        fetched = jnp.maximum(fetched, g)
        waited = jnp.maximum(waited, g)

        def s(gi, _):
            group_copy(gi).start()
            return 0

        jax.lax.fori_loop(fetched, g + LOOKAHEAD_G, s, 0)
        fetched = jnp.maximum(fetched, g + LOOKAHEAD_G)

        @pl.when(waited == g)
        def _():
            group_copy(g).wait()

        cur[0] = jnp.maximum(waited, g + 1)
        cur[1] = fetched

    tri_pre = _tri_mask(CHUNK, suffix=False, strict=True)

    def body(state):
        c, lt_vec, acc = state
        ci = astart // CHUNK + c
        g = ci // GSUB

        @pl.when(g >= cur[0])
        def _():
            enter_group(g)

        @pl.when(cur[2] != g)
        def _():
            proj_vmem[...] = _project_rows(
                ring[g % NRING_G], cam, width=cfg.width, height=cfg.height
            )
            cur[2] = g

        sub = ci % GSUB
        block = proj_vmem[:, pl.ds(sub, 1), :]      # (10, 1, CHUNK)
        rows = tuple(block[r] for r in range(10))
        kidx = _lane_iota(CHUNK) + ci * CHUNK
        alpha, rows, _, p_eff, _ = _rows_alpha(
            rows, basis6, ox, oy, kidx, start, end, alpha_clip,
            packed16=True,
        )
        s = _log_om(alpha, alpha_clip)
        s_excl = _tri_cumsum(s, tri_pre, fast=True)
        w = jnp.exp(s_excl + p_eff)
        colmat = jnp.concatenate(
            [rows[5], rows[6], rows[7], rows[9]], axis=0
        )
        contrib = jax.lax.dot_general(
            w.astype(jnp.bfloat16), colmat.astype(jnp.bfloat16),
            (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        acc = acc + jnp.exp(lt_vec) * contrib
        lt_vec = lt_vec + (
            s_excl[:, CHUNK - 1:CHUNK] + s[:, CHUNK - 1:CHUNK]
        )
        return c + 1, lt_vec, acc

    log_eps = float(np.log(early_stop)) if early_stop > 0.0 else -np.inf

    def cond(state):
        c, lt_vec = state[0], state[1]
        return jnp.logical_and(c < n_chunks, jnp.max(lt_vec) > log_eps)

    init = (
        jnp.int32(0),
        jnp.zeros((p, 1), jnp.float32),
        jnp.zeros((p, 4), jnp.float32),
    )
    c_done, lt_vec, acc = jax.lax.while_loop(cond, body, init)

    @pl.when(t == pl.num_programs(0) - 1)
    def _():
        def w(gi, _):
            group_copy(gi).wait()
            return 0

        jax.lax.fori_loop(cur[0], cur[1], w, 0)

    cols6 = jnp.concatenate(
        [
            acc[:, 0:3],
            jnp.exp(lt_vec),
            acc[:, 3:4],
            lt_vec,
        ],
        axis=1,
    )
    rows6 = _flip_to_rows(cols6)
    out_ref[0, 0:4, :] = rows6[0:4]
    out_ref[0, 4:5, :] = jnp.full((1, p), 0.0, jnp.float32) + c_done.astype(
        jnp.float32
    )
    out_ref[0, 5:6, :] = rows6[4:5]
    out_ref[0, 6:7, :] = rows6[5:6]
    out_ref[0, 7:8, :] = jnp.zeros((1, p), jnp.float32)


@functools.partial(
    jax.jit,
    static_argnames=("cfg", "alpha_clip", "early_stop"),
)
def rasterize_cached_fwd(
    prm_gm: Array,
    cam_tbl: Array,
    starts: Array,
    ends: Array,
    cfg: TileConfig,
    alpha_clip: Optional[float] = None,
    early_stop: float = 1e-4,
):
    """Fused cached-viewer forward: project + rasterize in ONE kernel.

    prm_gm: (n_groups, CACHED_ROWS, GSUB, CHUNK) f32 group-major cached
    parameter rows (:func:`pack_cached_rows` + :func:`group_major_rows`,
    built once per resort); cam_tbl: :func:`make_camera_table` of the
    CURRENT frame's matrices. Returns (out_tiles (T, 8, P), chunks_done).
    """
    t_tiles = cfg.num_tiles
    p = cfg.pixels_per_tile
    n_gblocks = prm_gm.shape[0]
    kernel = functools.partial(
        _cached_fwd_kernel, cfg=cfg, alpha_clip=alpha_clip,
        early_stop=early_stop, n_gblocks=n_gblocks,
    )
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,
        grid=(t_tiles,),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.MemorySpace.HBM),
            pl.BlockSpec((1, 8, 128), lambda i, *_: (0, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, 8, p), lambda i, *_: (i, 0, 0),
                               memory_space=pltpu.VMEM),
        scratch_shapes=[
            pltpu.VMEM((NRING_G, CACHED_ROWS, GSUB, CHUNK), jnp.float32),
            pltpu.VMEM((10, GSUB, CHUNK), jnp.float32),
            pltpu.SMEM((3,), jnp.int32),
            pltpu.SemaphoreType.DMA((NRING_G,)),
        ],
    )
    out = pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((t_tiles, 8, p), jnp.float32),
        interpret=_use_interpret(),
    )(starts, ends, prm_gm, cam_tbl[None])
    return out, out[:, 4, 0].astype(jnp.int32)


def rasterize_packed_fwd(
    feat_pk: Array,
    starts: Array,
    ends: Array,
    cfg: TileConfig,
    alpha_clip: Optional[float] = None,
    early_stop: float = 1e-4,
    zbuf: Optional[Array] = None,
):
    """Pallas forward on packed (8, K) features (compat surface; reshapes
    to the chunk-major streaming layout and runs :func:`rasterize_cm_fwd`)."""
    feat_cm = pad_chunk_major(chunk_major(pad_packed(feat_pk)))
    return rasterize_cm_fwd(
        feat_cm, starts, ends, cfg, alpha_clip=alpha_clip,
        early_stop=early_stop, zbuf=zbuf,
    )


def rasterize_tiles_fwd(
    feat_fm: Array,
    starts: Array,
    ends: Array,
    cfg: TileConfig,
    alpha_clip: Optional[float] = None,
    early_stop: float = 1e-4,
    zbuf: Optional[Array] = None,
):
    """Forward on UNPACKED (>=9, K) f32 feature rows (compat surface;
    packs and runs the packed kernel)."""
    return rasterize_packed_fwd(
        pack_feature_rows(feat_fm), starts, ends, cfg,
        alpha_clip=alpha_clip, early_stop=early_stop, zbuf=zbuf,
    )


def rasterize_tiles_xla(
    feat_fm: Array,
    starts: Array,
    ends: Array,
    cfg: TileConfig,
    max_per_tile: int,
    alpha_clip: Optional[float] = None,
):
    """Dense XLA emulation of the forward kernel (tests / debugging).

    Gathers up to ``max_per_tile`` instances per tile; differentiable
    directly through jax autodiff — the gradient oracle for the custom VJP.
    Returns PLANAR out_tiles (T, 8, P) matching the Pallas contract (no
    counts).
    """
    feat = feat_fm.T                                  # (K, 16)
    t_tiles = cfg.num_tiles
    p = cfg.pixels_per_tile
    k_cap = feat.shape[0]

    idx = starts[:, None] + jnp.arange(max_per_tile, dtype=jnp.int32)[None, :]
    valid = idx < ends[:, None]                       # (T, M)
    f = feat[jnp.clip(idx, 0, k_cap - 1)]             # (T, M, 16)

    tile_idx = jnp.arange(t_tiles, dtype=jnp.int32)
    tile_x = (tile_idx % cfg.tiles_x).astype(jnp.float32)
    tile_y = (tile_idx // cfg.tiles_x).astype(jnp.float32)
    pix = jnp.arange(p, dtype=jnp.int32)
    lx = (pix % cfg.tile_w).astype(jnp.float32) + 0.5
    ly = (pix // cfg.tile_w).astype(jnp.float32) + 0.5
    px = tile_x[:, None] * cfg.tile_w + lx[None, :]   # (T, P)
    py = tile_y[:, None] * cfg.tile_h + ly[None, :]

    dx = px[:, None, :] - f[:, :, 0:1]                # (T, M, P)
    dy = py[:, None, :] - f[:, :, 1:2]
    power = (
        -0.5 * (f[:, :, 2:3] * dx * dx + f[:, :, 4:5] * dy * dy)
        - f[:, :, 3:4] * dx * dy
    )
    ok = valid[:, :, None] & (power >= -4.0)
    alpha = jnp.where(ok, jnp.exp(power), 0.0) * f[:, :, 8:9]
    if alpha_clip is not None:
        alpha = jnp.minimum(alpha, alpha_clip)

    om = 1.0 - alpha
    cum = jnp.cumprod(om, axis=1)
    t_excl = jnp.concatenate([jnp.ones_like(cum[:, :1]), cum[:, :-1]], axis=1)
    w = alpha * t_excl                                # (T, M, P)
    rgb = jnp.einsum("tmp,tmc->tcp", w, f[:, :, 5:8])  # planar (T, 3, P)
    t_final = cum[:, -1, :]                           # (T, P)
    out = jnp.concatenate(
        [rgb, t_final[:, None, :],
         jnp.zeros((rgb.shape[0], 4, rgb.shape[2]))], axis=1
    )
    return out


def tiles_to_image(
    out_tiles: Array,
    cfg: TileConfig,
    background: Optional[Array] = None,
) -> Array:
    """Assemble planar (T, 8, P) tiles into an (H, W, 4) image, row 0 top.

    Alpha = 1 - T_final (equals the viewer's accumulated dst alpha under
    blendSrcAlpha=One, index.js:177-181). Optional RGB background composited
    under the splats. The channel math runs in the PLANAR layout (channel
    on the major axis — the channel-minor form wastes 124/128 lanes per
    XLA op); one final moveaxis delivers the public (H, W, 4).
    """
    ty_n, tx_n = cfg.tiles_y, cfg.tiles_x
    th, tw = cfg.tile_h, cfg.tile_w
    x = out_tiles[:, :4, :].reshape(ty_n, tx_n, 4, th, tw)
    x = x.transpose(2, 0, 3, 1, 4).reshape(4, ty_n * th, tx_n * tw)
    x = x[:, : cfg.height, : cfg.width]
    rgb = x[:3]
    alpha = 1.0 - x[3]
    if background is not None:
        rgb = rgb + (1.0 - alpha)[None] * background[:, None, None]
    img = jnp.concatenate([rgb, alpha[None]], axis=0)
    return jnp.moveaxis(img, 0, -1)[::-1]  # y-up tiles -> row 0 on top


def tiles_to_depth(out_tiles: Array, cfg: TileConfig) -> Array:
    """Assemble the expected-depth channel into an (H, W) map, row 0 top.

    Values are alpha-weighted camera-z sums (sum_k a_k T_k d_k, negative in
    front of the camera, 0 where nothing rendered); divide by the image's
    alpha channel for the alpha-normalized expected depth.
    """
    ty_n, tx_n = cfg.tiles_y, cfg.tiles_x
    th, tw = cfg.tile_h, cfg.tile_w
    x = out_tiles[:, 5, :].reshape(ty_n, tx_n, th, tw)
    x = x.transpose(0, 2, 1, 3).reshape(ty_n * th, tx_n * tw)
    return x[: cfg.height, : cfg.width][::-1]


def zbuffer_to_tiles(zbuf_img: Array, cfg: TileConfig) -> Array:
    """(H, W) camera-z buffer (row 0 top; -inf = empty) -> (T, P, 1) tile
    layout consumed by the rasterizer kernels."""
    ty_n, tx_n = cfg.tiles_y, cfg.tiles_x
    th, tw = cfg.tile_h, cfg.tile_w
    x = jnp.asarray(zbuf_img, jnp.float32)[::-1]     # to y-up rows
    x = jnp.pad(
        x,
        ((0, ty_n * th - cfg.height), (0, tx_n * tw - cfg.width)),
        constant_values=-jnp.inf,
    )
    x = x.reshape(ty_n, th, tx_n, tw).transpose(0, 2, 1, 3)
    return x.reshape(ty_n * tx_n, th * tw, 1)
