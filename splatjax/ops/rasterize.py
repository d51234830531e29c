"""Tiled Pallas rasterizer: forward kernel, XLA emulation, image assembly.

The TPU-native replacement for the reference's GPU rasterization (instanced
quads + fragment blend + ROP, index.js:68-199). Each grid program owns one
image tile (default 16x16 = 256 pixels on the *sublane* axis) and walks its
depth-sorted instance list front-to-back in chunks of ``CHUNK`` gaussians on
the *lane* axis:

  alpha      = exp(power) * opacity          (power >= -4, index.js:170-175)
  T_within   = exclusive cumprod(1 - alpha)  along the chunk (lane scan)
  rgb       += sum_k alpha_k * T_k * color_k
  T         *= prod_k (1 - alpha_k)

with whole-tile early termination once max(T) < eps. This equals the
viewer's back-to-front "over" blend (index.js:177-181) exactly when eps=0.

Memory layout (chosen for Mosaic's (sublane, lane)=(8, 128) tiling rules):
  * features are FEATURE-MAJOR ``(9, K_pad)`` in HBM so a chunk DMA is a
    strided (9, 128) block;
  * tile ranges need not be 128-aligned — the kernel rounds the DMA window
    down to a 128 boundary and masks instances outside [start, end);
  * per-tile output is ``(P, 8)``: channels r, g, b, T_final (4 spare),
    written with lane slices (no in-kernel transposes anywhere).

Feature row layout (16 rows):
  0 mean2d.x  1 mean2d.y  2 conic.a  3 conic.b  4 conic.c
  5 color.r   6 color.g   7 color.b  8 opacity  9-15 pad
"""
from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from splatjax.ops.binning import FEAT_DIM, TileConfig  # noqa: F401

Array = jax.Array

CHUNK = 128  # gaussians composited per inner step (lane axis)

# Kernel-facing feature rows: Mosaic requires DMA slice sublane dims to be
# multiples of 8, so the narrow (9, K) feature array (binning.FEAT_DIM) is
# zero-padded to 16 rows at the kernel boundary. The expensive per-instance
# row gathers stay on the 9-row layout (row-gather cost scales with bytes);
# this pad/slice is a cheap sequential copy.
FEAT_PAD = 16


def _use_interpret() -> bool:
    return jax.default_backend() == "cpu"


def pad_features(feat_fm: Array) -> Array:
    """Pad (9, K) -> (FEAT_PAD, K_pad) so chunk DMAs are aligned and never
    run off the end."""
    k = feat_fm.shape[1]
    k_pad = (-(-k // CHUNK)) * CHUNK + CHUNK
    return jnp.pad(
        feat_fm, ((0, FEAT_PAD - feat_fm.shape[0]), (0, k_pad - k))
    )


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


def _cumprod_lanes(x):
    """Inclusive cumprod along the lane axis — Hillis-Steele scan
    (Mosaic has no cumprod primitive)."""
    cols = x.shape[1]
    lane = _lane_iota(cols)
    k = 1
    while k < cols:
        shifted = pltpu.roll(x, k, axis=1)
        x = x * jnp.where(lane >= k, shifted, 1.0)
        k *= 2
    return x


def _cumsum_lanes(x):
    """Inclusive cumsum along the lane axis."""
    cols = x.shape[1]
    lane = _lane_iota(cols)
    k = 1
    while k < cols:
        shifted = pltpu.roll(x, k, axis=1)
        x = x + jnp.where(lane >= k, shifted, 0.0)
        k *= 2
    return x


def _suffix_cumprod_lanes(x):
    """Inclusive suffix cumprod along lanes: out[i] = prod_{j>=i} x[j]."""
    cols = x.shape[1]
    lane = _lane_iota(cols)
    k = 1
    while k < cols:
        shifted = pltpu.roll(x, cols - k, axis=1)  # == roll by -k (circular)
        x = x * jnp.where(lane < cols - k, shifted, 1.0)
        k *= 2
    return x


def _suffix_cumsum_lanes(x):
    """Inclusive suffix cumsum along lanes: out[i] = sum_{j>=i} x[j]."""
    cols = x.shape[1]
    lane = _lane_iota(cols)
    k = 1
    while k < cols:
        shifted = pltpu.roll(x, cols - k, axis=1)  # == roll by -k (circular)
        x = x + jnp.where(lane < cols - k, shifted, 0.0)
        k *= 2
    return x


def _chunk_alpha(chunk, px, py, kidx, start, end, alpha_clip):
    """Alpha matrix (P, CHUNK) for one feature chunk at tile pixels.

    chunk: (9, CHUNK) feature-major; kidx: (1, CHUNK) absolute instance ids.
    """
    mean_x = chunk[0:1, :]
    mean_y = chunk[1:2, :]
    ca = chunk[2:3, :]
    cb = chunk[3:4, :]
    cc = chunk[4:5, :]
    opa = chunk[8:9, :]
    dx = px - mean_x                       # (P, CHUNK)
    dy = py - mean_y
    power = -0.5 * (ca * dx * dx + cc * dy * dy) - cb * dx * dy
    in_range = (kidx >= start) & (kidx < end)
    valid = in_range & (power >= -4.0)     # exp(-4) cutoff, index.js:172
    alpha = jnp.where(valid, jnp.exp(power), 0.0) * opa
    if alpha_clip is not None:
        alpha = jnp.minimum(alpha, alpha_clip)
    return alpha, dx, dy, power, in_range


def _fwd_kernel(
    # scalar prefetch
    starts_ref, ends_ref,
    # inputs
    feat_hbm,
    # outputs
    out_ref,
    # scratch
    feat_vmem, sem,
    *, cfg: TileConfig, alpha_clip, early_stop,
):
    t = pl.program_id(0)
    p = cfg.pixels_per_tile
    start = starts_ref[t]
    end = ends_ref[t]
    astart = (start // CHUNK) * CHUNK      # aligned DMA window
    n_chunks = pl.cdiv(end - astart, CHUNK)
    px, py = _pixel_grids(cfg, t)

    def dma(slot, c):
        return pltpu.make_async_copy(
            feat_hbm.at[:, pl.ds(astart + c * CHUNK, CHUNK)],
            feat_vmem.at[slot],
            sem.at[slot],
        )

    # Tile t's chunk-0 DMA was issued by the previous grid program (slot 0,
    # see the epilogue below) — only the very first program self-issues.
    # This hides the per-tile first-chunk DMA latency, which is otherwise
    # serialized across all ~8k sequential grid steps.
    @pl.when((t == 0) & (n_chunks > 0))
    def _():
        dma(0, 0).start()

    def body(state):
        c, t_vec, acc = state

        @pl.when(c + 1 < n_chunks)  # double buffering: prefetch next chunk
        def _():
            dma((c + 1) % 2, c + 1).start()

        dma(c % 2, c).wait()
        chunk = feat_vmem[c % 2]
        kidx = _lane_iota(CHUNK) + (astart + c * CHUNK)
        alpha, _, _, _, _ = _chunk_alpha(
            chunk, px, py, kidx, start, end, alpha_clip
        )
        om = 1.0 - alpha
        cum = _cumprod_lanes(om)                          # (P, CHUNK)
        rolled = pltpu.roll(cum, 1, axis=1)
        col0 = _lane_iota(CHUNK) == 0
        t_excl = jnp.where(col0, 1.0, rolled)             # exclusive cumprod
        w = alpha * t_excl * t_vec                        # (P, CHUNK)
        # rgb accumulation as ONE small MXU pass instead of three VPU
        # lane-tree reductions: (P, K) @ (K, 4)
        colmat = jnp.concatenate(
            [chunk[5:8, :], jnp.zeros((1, CHUNK), jnp.float32)], axis=0
        )
        acc = acc + jax.lax.dot_general(
            w, colmat, (((1,), (1,)), ((), ())),
            precision=jax.lax.Precision.HIGHEST,  # full f32: parity at 1e-3
            preferred_element_type=jnp.float32,
        )                                                 # (P, 4)
        t_vec = t_vec * cum[:, CHUNK - 1:CHUNK]
        return c + 1, t_vec, acc

    def cond(state):
        c, t_vec = state[0], state[1]
        return jnp.logical_and(c < n_chunks, jnp.max(t_vec) > early_stop)

    init = (
        jnp.int32(0),
        jnp.ones((p, 1), jnp.float32),
        jnp.zeros((p, 4), jnp.float32),
    )
    c_done, t_vec, acc = jax.lax.while_loop(cond, body, init)

    # drain the in-flight prefetch if the loop early-stopped, so the next
    # grid step's semaphore state is clean
    @pl.when(jnp.logical_and(c_done > 0, c_done < n_chunks))
    def _():
        dma(c_done % 2, c_done).wait()

    # prefetch the NEXT tile's first chunk into slot 0 (its chunk 0 always
    # maps to slot 0); the next program waits on sem[0] instead of issuing
    nt = t + 1

    @pl.when(nt < pl.num_programs(0))
    def _():
        nstart = starts_ref[nt]
        nastart = (nstart // CHUNK) * CHUNK
        n_nc = pl.cdiv(ends_ref[nt] - nastart, CHUNK)

        @pl.when(n_nc > 0)
        def _():
            pltpu.make_async_copy(
                feat_hbm.at[:, pl.ds(nastart, CHUNK)],
                feat_vmem.at[0],
                sem.at[0],
            ).start()

    out_ref[0, :, 0:3] = acc[:, 0:3]
    out_ref[0, :, 3:4] = t_vec
    # chunks-done count rides in spare channel 4 (exact in f32 up to 2^24);
    # a dedicated per-tile SMEM output would blow the 1MB SMEM budget at 1080p
    out_ref[0, :, 4:5] = jnp.full((p, 1), 0.0, jnp.float32) + c_done.astype(jnp.float32)
    out_ref[0, :, 5:8] = jnp.zeros((p, 3), jnp.float32)


@functools.partial(
    jax.jit, static_argnames=("cfg", "alpha_clip", "early_stop")
)
def rasterize_tiles_fwd(
    feat_fm: Array,
    starts: Array,
    ends: Array,
    cfg: TileConfig,
    alpha_clip: Optional[float] = None,
    early_stop: float = 1e-4,
):
    """Pallas forward.

    feat_fm: (9, K) feature-major instance features (sorted).
    Returns (out_tiles (T, P, 8) [r,g,b,T_final,...], chunks_done (T,)).
    """
    t_tiles = cfg.num_tiles
    p = cfg.pixels_per_tile
    feat_pad = pad_features(feat_fm)
    kernel = functools.partial(
        _fwd_kernel, cfg=cfg, alpha_clip=alpha_clip, early_stop=early_stop
    )
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,
        grid=(t_tiles,),
        in_specs=[pl.BlockSpec(memory_space=pltpu.MemorySpace.HBM)],
        out_specs=pl.BlockSpec((1, p, 8), lambda i, *_: (i, 0, 0),
                               memory_space=pltpu.VMEM),
        scratch_shapes=[
            pltpu.VMEM((2, FEAT_PAD, CHUNK), jnp.float32),
            pltpu.SemaphoreType.DMA((2,)),
        ],
    )
    out = pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((t_tiles, p, 8), jnp.float32),
        interpret=_use_interpret(),
    )(starts, ends, feat_pad)
    return out, out[:, 0, 4].astype(jnp.int32)


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
    Returns out_tiles (T, P, 8) matching the Pallas contract (no counts).
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
    rgb = jnp.einsum("tmp,tmc->tpc", w, f[:, :, 5:8])
    t_final = cum[:, -1, :]                           # (T, P)
    out = jnp.concatenate(
        [rgb, t_final[:, :, None], jnp.zeros(rgb.shape[:2] + (4,))], axis=-1
    )
    return out


def tiles_to_image(
    out_tiles: Array,
    cfg: TileConfig,
    background: Optional[Array] = None,
) -> Array:
    """Assemble (T, P, 8) tiles into an (H, W, 4) image, row 0 on top.

    Alpha = 1 - T_final (equals the viewer's accumulated dst alpha under
    blendSrcAlpha=One, index.js:177-181). Optional RGB background composited
    under the splats.
    """
    ty_n, tx_n = cfg.tiles_y, cfg.tiles_x
    th, tw = cfg.tile_h, cfg.tile_w
    x = out_tiles[:, :, :4].reshape(ty_n, tx_n, th, tw, 4)
    x = x.transpose(0, 2, 1, 3, 4).reshape(ty_n * th, tx_n * tw, 4)
    x = x[: cfg.height, : cfg.width]
    rgb = x[..., :3]
    alpha = 1.0 - x[..., 3]
    if background is not None:
        rgb = rgb + (1.0 - alpha)[..., None] * background
    img = jnp.concatenate([rgb, alpha[..., None]], axis=-1)
    return img[::-1]  # y-up tiles -> row 0 on top
