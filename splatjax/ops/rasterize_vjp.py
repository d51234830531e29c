"""Custom VJP for the tiled rasterizer: Pallas backward kernel.

The backward re-walks each tile's instance list chunk-by-chunk in *reverse*
(the TPU analogue of the CUDA 3DGS back-to-front backward sweep), recomputing
alphas from the saved features and recovering per-instance transmittance by
division from the saved final transmittance:

    T_k = T_end / prod_{j >= k} (1 - alpha_j)

Per-pixel gradients (front-to-back over-compositing, C = sum a_i T_i c_i,
A = 1 - T_final):

    dC/dc_i       = a_i T_i
    dC/da_i       = T_i c_i - S_i / (1 - a_i),  S_i = sum_{j>i} a_j T_j c_j
    dT_final/da_i = -T_final / (1 - a_i)

then chained to (mean2d, conic, color, opacity) and reduced over the tile's
pixels. Each instance belongs to exactly one tile, so per-instance grads land
disjointly in a (16, K_pad) buffer; 128-aligned windows that straddle two
tiles' rows are handed forward through persistent scratch instead of
read-modify-written (see the ownership note inside the kernel). The
transpose of the upstream feature gather (ops/binning.py) scatter-adds them
back onto gaussians, and jax autodiff continues through projection to the 3D
parameters — fulfilling the north-star "pixel gradients w.r.t. means,
covariances/scales, rotations, opacities and colors" (BASELINE.json) that the
reference viewer lacks entirely (SURVEY.md §2).

Only the chunks the forward actually processed (early termination) are
re-walked: the forward records chunks_done per tile.
"""
from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from splatjax.ops.binning import (
    FEAT_DIM,
    TileConfig,
    segment_sum_by_gid,
    segment_sum_by_gid_packed_bf16,
)
from splatjax.ops.rasterize import (
    CHUNK,
    FEAT_PAD,
    PACKED16_ROWS,
    PACKED_ROWS,
    _ExactBasis,
    _basis_is_bf16_exact,
    _chunk_alpha,
    _flip_to_cols,
    _log_clip,
    _make_basis,
    clip_bounds_alpha,
    _lane_iota,
    _log_om,
    _tri_cumsum,
    _tri_mask,
    _pixel_grids,
    _use_interpret,
    chunk_major,
    chunk_major_rows,
    gather_chunk_major,
    pack_feature_rows,
    pack_feature_table,
    pack_feature_table16,
    pad_chunk_major,
    pad_packed,
    rasterize_cm_fwd,
    rasterize_packed_fwd,
    rasterize_tiles_fwd,
)

Array = jax.Array


def _pack_grad_bf16(rows16):
    """(16, C) f32 gradient rows -> (8, C) int32 bf16 pairs: channel c in
    the LOW half, c+8 in the HIGH half (round-to-nearest-even via integer
    carry arithmetic — Mosaic-safe, no 16-bit lane types). Consumed by
    ops/segreduce.segment_reduce_packed_bf16; halves the kernel's grad
    write traffic and removes the XLA quantize/pack pass entirely."""
    def rn(x):
        b = jax.lax.bitcast_convert_type(x, jnp.int32)
        return b + 0x7FFF + (jnp.right_shift(b, 16) & 1)

    lo = jnp.right_shift(rn(rows16[0:8]), 16) & 0xFFFF
    hi = rn(rows16[8:16]) & jnp.int32(-65536)
    return hi | lo


def _bwd_kernel(
    # scalar prefetch
    starts_ref, ends_ref, chunks_ref,
    # inputs: feat, zeros, g_out, out_saved [, zbuf]
    feat_hbm, zeros_hbm, g_out_ref, out_saved_ref, *rest,
    # then: g_feat_hbm (aliased with zeros_hbm) + scratch
    cfg: TileConfig, alpha_clip, has_zbuf: bool, g_channels: int = 8,
    packed16: bool = False, stream_lanes: int = 8,
):
    del zeros_hbm  # aliased storage for g_feat_hbm; only read via the alias
    if has_zbuf:
        (zbuf_ref, g_feat_hbm, feat_vmem, g_new_vmem, carry_vmem,
         in_carry_vmem, carry_idx, sem_feat, sem_out) = rest
        zb = zbuf_ref[0, :, 0:1]
    else:
        (g_feat_hbm, feat_vmem, g_new_vmem, carry_vmem,
         in_carry_vmem, carry_idx, sem_feat, sem_out) = rest
        zb = None
    t = pl.program_id(0)
    start = starts_ref[t]
    end = ends_ref[t]
    astart = (start // CHUNK) * CHUNK
    c_done = chunks_ref[t]
    px, py = _pixel_grids(cfg, t)

    # PLANAR cotangent/saved-output rows (channel-major (gch, P) blocks —
    # channel-minor (P, gch) operands cost ~4x in XLA layout tax, see the
    # fwd kernel's output note). Per-pixel quantities the chunk loop needs
    # on SUBLANES (log T_final, g_tf) are flipped once per tile by a
    # 2-pass bf16-split identity matmul (2^-17 relative — safe on O(100)
    # log values; raw T would flush below the bf16 subnormal range).
    g4 = g_out_ref[0]                   # (gch, P)
    g_tf_row = g4[3:4, :]               # (1, P)
    if g_channels == 4:
        # image-level cotangent (r, g, b, T_final): no depth channel
        g_d_row = jnp.zeros_like(g_tf_row)
    else:
        g_d_row = g4[5:6, :]            # expected-depth cotangent
    lt_row = out_saved_ref[0, 6:7, :]   # log T_final (never underflows)
    cols2 = _flip_to_cols(
        jnp.concatenate([lt_row, g_tf_row], axis=0)
    )                                   # (P, 2), error <= 2^-17 relative
    lt_final = cols2[:, 0:1]
    t_final = jnp.exp(lt_final)

    # Per-tile constant bases for the MXU gradient reductions (see body):
    # all ten per-instance sums are contractions over the tile's pixels of
    # g_power or w against per-pixel-only factors, so two small matmuls
    # replace ten VPU sublane reduction trees per chunk. Moments use
    # TILE-LOCAL pixel coordinates: any pixel this tile contributes has
    # |dx| >= dist(mean, tile) - tile_w, so the raw-moment recombination
    # below never cancels catastrophically.
    ox = (t % cfg.tiles_x).astype(jnp.float32) * cfg.tile_w
    oy = (t // cfg.tiles_x).astype(jnp.float32) * cfg.tile_h
    # 16-byte training rows -> fast fragment math (see the fwd kernel)
    fast = packed16
    if _basis_is_bf16_exact(cfg):
        # basis origin at the tile CENTER (half-integer local coords are
        # bf16-exact — see _ExactBasis); the moment recombination below
        # uses the SAME origin, so the centered raw moments stay
        # cancellation-safe exactly as the tile-corner ones did
        ox = ox + 0.5 * cfg.tile_w
        oy = oy + 0.5 * cfg.tile_h
    basis_a = _make_basis(px, py, ox, oy, cfg, fast)
    log_clip = _log_clip(alpha_clip)
    cot4p = jnp.concatenate([g4[0:3, :], g_d_row], axis=0)  # (4, P) planar
    gtt = cols2[:, 1:2] * t_final        # (P, 1) hoisted out of the loop

    # Walk chunks in reverse: iteration i handles chunk c = c_done-1-i.
    # Feature reads and grad writes are double-buffered on slot = i % 2.
    #
    # Grad-window ownership (NO read-modify-write): ranges partition
    # [0, total), so a 128-aligned window holds lanes of at most one tile
    # plus its neighbours. Each program writes zeros outside its own
    # [start, end) lanes; the single window its range's TOP can share with
    # LATER tiles (base + CHUNK > end — only possible for the last walked
    # chunk) is not written but handed forward through persistent scratch
    # (carry_vmem / carry_idx survive the sequential grid, like the fwd
    # ring cursors). The next tile with instances starts at end, so ITS
    # lowest window is exactly the carried one: it adds the carry (lanes
    # are disjoint; the carry holds zeros elsewhere) and writes once.
    # Early-stopped tiles never reach their top boundary, so they write
    # everything they walked and hand nothing forward — the untouched gap
    # stays at the buffer's zero initialization, which is also what makes
    # the sentinel tail correct. The final program flushes a pending carry
    # (covers trailing empty tiles).
    def base_of(i):
        return astart + (c_done - 1 - i) * CHUNK

    def feat_dma(i):
        # feat is chunk-major (n_chunks, 8, CHUNK); base_of is CHUNK-aligned.
        # With an image-level cotangent (g_d == 0) and no z-buffer, only the
        # 4 payload lanes are read (see the fwd kernel's lane slicing).
        if stream_lanes < feat_hbm.shape[1]:
            src_ref = feat_hbm.at[base_of(i) // CHUNK].at[
                pl.ds(0, stream_lanes)
            ]
        else:
            src_ref = feat_hbm.at[base_of(i) // CHUNK]
        return pltpu.make_async_copy(
            src_ref, feat_vmem.at[i % 2], sem_feat.at[i % 2],
        )

    def gout_dma(i):
        return pltpu.make_async_copy(
            g_new_vmem.at[i % 2],
            g_feat_hbm.at[:, pl.ds(base_of(i), CHUNK)],
            sem_out.at[i % 2],
        )

    last_prog = t == pl.num_programs(0) - 1

    def wrote(i):
        # the only skippable write is the top chunk's shared window
        return jnp.logical_or(
            jnp.logical_or(i > 0, base_of(0) + CHUNK <= end), last_prog
        )

    # chunk i=0's feat DMA was issued by the previous grid program (see
    # epilogue); only the first program self-issues.
    @pl.when((t == 0) & (c_done > 0))
    def _():
        feat_dma(0).start()

    @pl.when(t == 0)
    def _():
        carry_idx[0] = -1

    # Consume an incoming boundary carry up front (it always targets OUR
    # lowest window, astart): a program with >= 2 chunks stashes its own
    # top window BEFORE its lowest chunk runs, and there is only one
    # outgoing carry slot — so the incoming rows move to a separate
    # buffer now. Empty programs (c_done == 0) pass the carry through.
    has_in = (c_done > 0) & (carry_idx[0] == astart)

    @pl.when(has_in)
    def _():
        in_carry_vmem[:, :] = carry_vmem[:, :]
        carry_idx[0] = -1

    tri_suf = _tri_mask(CHUNK, suffix=True)
    tri_suf_strict = _tri_mask(CHUNK, suffix=True, strict=True)

    def body(i, carry):
        lt_after, s_u = carry
        base = base_of(i)

        @pl.when(i + 1 < c_done)
        def _():
            feat_dma(i + 1).start()

        feat_dma(i).wait()
        chunk = feat_vmem[i % 2]
        kidx = _lane_iota(CHUNK) + base
        alpha, rows, in_range, p_eff, p_raw = _chunk_alpha(
            chunk, basis_a, ox, oy, kidx, start, end, alpha_clip, zb,
            packed16=packed16,
        )
        om = 1.0 - alpha
        # Per-instance transmittance recovered fully in LOG space:
        #   log T_k = log T_after - suffix_cumsum(log(1-alpha))_k
        # (one subtract + one exp, vs exp + divide + zero-guard selects;
        # also no 0/0 hazard when a fragment saturates to alpha == 1 —
        # exp(-inf - s) is exactly 0). Absolute log error is ~eps * |s_q|,
        # i.e. only deeply-opaque stacks (T below any gradient threshold)
        # see more than ~1e-6 relative t_k error.
        s_q = _tri_cumsum(_log_om(alpha, alpha_clip), tri_suf, fast)
        t_k = jnp.exp(lt_after - s_q)

        col_r, col_g, col_b = rows[5], rows[6], rows[7]
        depth_row = rows[9]
        # The per-channel exclusive suffix sums S_i^c = sum_{j>i} a_j T_j c_j
        # enter g_alpha only as sum_c gc * S_i^c, and the pixel cotangents gc
        # are lane-independent — so ONE scan of the pre-weighted combination
        # u = a T (g_r c_r + g_g c_g + g_b c_b + g_d d) replaces four
        # channel scans (depth is blended exactly like a color channel).
        # gdotc[p, k] = cot4[p, :] . (c_r, c_g, c_b, d)[:, k] — one small
        # MXU matmul instead of four VPU multiply-adds on (P, CHUNK).
        colmat4 = jnp.concatenate(
            [col_r, col_g, col_b, depth_row], axis=0
        )                                        # (4, CHUNK)
        if fast:
            gdotc = jax.lax.dot_general(
                cot4p.astype(jnp.bfloat16), colmat4.astype(jnp.bfloat16),
                (((0,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
            )                                    # (P, CHUNK), ~2^-9 rel
        else:
            gdotc = jax.lax.dot_general(
                cot4p, colmat4, (((0,), (0,)), ((), ())),
                precision=jax.lax.Precision.HIGHEST,
                preferred_element_type=jnp.float32,
            )                                    # (P, CHUNK)
        tg = t_k * gdotc                         # (P, CHUNK)
        u = alpha * tg
        # EXCLUSIVE suffix cumsum straight from the strict mask
        sx_loc = _tri_cumsum(u, tri_suf_strict, fast)  # (P, CHUNK), MXU
        sx_u = sx_loc + s_u
        tot_u = sx_loc[:, 0:1] + u[:, 0:1]       # chunk-inclusive total

        if clip_bounds_alpha(alpha_clip) and (
            1.0 - float(np.float32(alpha_clip)) >= 1e-6
        ):
            # alpha <= clip <= 1 - 1e-6 (checked on the f32-ROUNDED clip —
            # the value the kernel actually clips with) bounds om away from
            # 0 at trace time: skip the two-op (P, CHUNK) guard entirely.
            # Clips inside (1 - 1e-6, 1) keep the floor: om can reach
            # ~6e-8 there and an unfloored divide spikes gradients ~17x.
            om_safe = om
        else:
            om_safe = jnp.where(om > 1e-6, om, 1e-6)
        # one division: (S_i + g_T T_final) / (1 - a_i); gtt = g_tf*t_final
        # is per-pixel, hoisted out of the chunk loop
        g_alpha = tg - (sx_u + gtt) / om_safe
        if alpha_clip is not None:
            # min(p, log clip) clipped  <=>  raw log-alpha >= log clip
            # (compare the PRE-clip p_raw: post-clip alpha sits one
            # exp/log ulp below the clip value, so comparing alpha
            # against alpha_clip would never fire)
            g_alpha = jnp.where(p_raw < log_clip, g_alpha, 0.0)
        # out-of-range lanes carry alpha ~ 1e-30 (the log-space opacity
        # fold in _chunk_alpha maps masked lanes to log(1e-30), not to
        # exactly 0), so g_power/w are negligible there without a select;
        # only the row WRITE below needs the explicit in_range mask
        g_power = g_alpha * alpha                 # d(exp(p)*o)/dp = alpha
        w = alpha * t_k

        # All ten per-instance gradient sums are pixel contractions of
        # g_power or w against per-pixel factors: two MXU matmuls replace
        # ten sublane reduction trees. Raw pixel moments (tile-local) are
        # recombined into the centered moments sum(g_power * dx^a dy^b)
        # per instance afterwards — O(CHUNK) work instead of O(P*CHUNK).
        # Moments CANNOT run single-pass bf16: the centered-moment
        # recombination below subtracts raw moments ~ (tile_w)^2 * s1
        # to produce sums ~ sigma^2 * s1 — cancellation amplifies a
        # 2^-9 rounding by up to (tile_w/sigma)^2. With the exact-bf16
        # basis only g_power needs splitting: 2 passes (fast, per-term
        # 2^-16) / 3 passes (exact, 2^-24 — the HIGHEST error class at
        # half the MXU passes). Wide-tile fallbacks keep the old split /
        # HIGHEST forms.
        dimsP = (((0,), (0,)), ((), ()))
        if isinstance(basis_a, _ExactBasis):
            b = basis_a.b
            gh = g_power.astype(jnp.bfloat16)
            g1 = g_power - gh.astype(jnp.float32)
            gl = g1.astype(jnp.bfloat16)
            mom = jax.lax.dot_general(
                b, gh, dimsP, preferred_element_type=jnp.float32
            ) + jax.lax.dot_general(
                b, gl, dimsP, preferred_element_type=jnp.float32
            )
            if not fast:
                gl2 = (g1 - gl.astype(jnp.float32)).astype(jnp.bfloat16)
                mom = mom + jax.lax.dot_general(
                    b, gl2, dimsP, preferred_element_type=jnp.float32
                )                                 # (6, CHUNK)
        elif fast:
            bh, bl = basis_a
            gh = g_power.astype(jnp.bfloat16)
            gl = (g_power - gh.astype(jnp.float32)).astype(jnp.bfloat16)
            mom = (
                jax.lax.dot_general(bh, gh, dimsP,
                                    preferred_element_type=jnp.float32)
                + jax.lax.dot_general(bh, gl, dimsP,
                                      preferred_element_type=jnp.float32)
                + jax.lax.dot_general(bl, gh, dimsP,
                                      preferred_element_type=jnp.float32)
            )                                     # (6, CHUNK)
        else:
            mom = jax.lax.dot_general(
                basis_a, g_power, dimsP,
                precision=jax.lax.Precision.HIGHEST,
                preferred_element_type=jnp.float32,
            )                                     # (6, CHUNK)
        if fast:
            # cw has no cancellation: one bf16 pass (~2^-9 relative
            # color/depth-grad noise) is fine
            cw = jax.lax.dot_general(
                cot4p.astype(jnp.bfloat16), w.astype(jnp.bfloat16),
                (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
            )                                     # (4, CHUNK)
        else:
            cw = jax.lax.dot_general(
                cot4p, w, (((1,), (0,)), ((), ())),
                precision=jax.lax.Precision.HIGHEST,
                preferred_element_type=jnp.float32,
            )                                     # (4, CHUNK)
        s1 = mom[0:1]
        mxl = rows[0] - ox                        # tile-local mean (1, CHUNK)
        myl = rows[1] - oy
        sdx = mom[1:2] - mxl * s1                 # sum g_power * dx
        sdy = mom[2:3] - myl * s1
        sdxx = mom[3:4] - 2.0 * mxl * mom[1:2] + mxl * mxl * s1
        sdxy = mom[4:5] - mxl * mom[2:3] - myl * mom[1:2] + mxl * myl * s1
        sdyy = mom[5:6] - 2.0 * myl * mom[2:3] + myl * myl * s1
        ca, cb, cc = rows[2], rows[3], rows[4]
        g_mx = ca * sdx + cb * sdy
        g_my = cb * sdx + cc * sdy
        g_a = -0.5 * sdxx
        g_bq = -sdxy
        g_c = -0.5 * sdyy
        # d alpha / d opacity = masked exp(power) = alpha / opa, so the
        # opacity gradient is sum(g_alpha * alpha) / opa = S1 / opa (exact
        # when unclipped; where clipped, g_alpha was zeroed above). At
        # opa <= 1e-12 this underestimates (true grad = exp(power)); such
        # splats are invisible and post-sigmoid opacities never reach 0.
        opa = rows[8]
        g_opa = s1 / jnp.where(jnp.abs(opa) > 1e-12, opa, 1e-12)
        g_cr, g_cg, g_cb, g_dep = cw[0:1], cw[1:2], cw[2:3], cw[3:4]

        grow = jnp.concatenate(
            [g_mx, g_my, g_a, g_bq, g_c, g_cr, g_cg, g_cb, g_opa, g_dep,
             jnp.zeros((FEAT_PAD - 10, CHUNK), jnp.float32)],
            axis=0,
        )
        # wait for the write issued two iterations ago (if any) before
        # reusing its buffer slot
        @pl.when((i >= 2) & wrote(i - 2))
        def _():
            gout_dma(i - 2).wait()

        # zeros outside our lanes; at our LOWEST window, add the carried
        # boundary rows from the previous tile with instances (disjoint
        # lanes, zeros elsewhere — see ownership note above)
        rows_own = jnp.where(in_range, grow, 0.0)
        take_carry = (i == c_done - 1) & has_in
        rows_own = rows_own + jnp.where(
            take_carry, in_carry_vmem[:, :], 0.0
        )

        stash = (i == 0) & jnp.logical_not(wrote(0))

        @pl.when(stash)
        def _():
            carry_vmem[:, :] = rows_own
            carry_idx[0] = base

        @pl.when(jnp.logical_not(stash))
        def _():
            # fast mode writes bf16-pair-packed rows (8 int32 rows instead
            # of 16 f32): half the write traffic, no XLA pack pass — the
            # carry stays unpacked f32 so boundary rows still ADD exactly
            g_new_vmem[i % 2] = (
                _pack_grad_bf16(rows_own) if fast else rows_own
            )
            gout_dma(i).start()

        # carry to the previous chunk: log T at this chunk's first
        # instance, combined suffix sum extended by this whole chunk
        return (lt_after - s_q[:, 0:1], s_u + tot_u)

    # log T_final arrives directly from the forward's log-space carry
    # (channel 6): finite even where T itself flushes below the f32/bf16
    # subnormal range, so deep stacks keep their front-splat gradients
    init = (lt_final, jnp.zeros_like(t_final))
    jax.lax.fori_loop(0, c_done, body, init)

    # next tile's first reverse chunk window (i=0 -> slots feat[0]/gold[0])
    nt = t + 1
    in_grid = nt < pl.num_programs(0)
    n_cd = jnp.where(in_grid, chunks_ref[jnp.minimum(nt, pl.num_programs(0) - 1)], 0)
    nstart = starts_ref[jnp.minimum(nt, pl.num_programs(0) - 1)]
    nbase = (nstart // CHUNK) * CHUNK + (n_cd - 1) * CHUNK

    # feat is read-only: prefetch it before the write drain to overlap the
    # DMA with the drain waits below
    @pl.when(in_grid & (n_cd > 0))
    def _():
        if stream_lanes < feat_hbm.shape[1]:
            nsrc = feat_hbm.at[nbase // CHUNK].at[pl.ds(0, stream_lanes)]
        else:
            nsrc = feat_hbm.at[nbase // CHUNK]
        pltpu.make_async_copy(
            nsrc, feat_vmem.at[0], sem_feat.at[0],
        ).start()

    # drain the last (up to two) outstanding grad writes
    @pl.when((c_done >= 2) & wrote(c_done - 2))
    def _():
        gout_dma(c_done - 2).wait()

    @pl.when((c_done >= 1) & wrote(c_done - 1))
    def _():
        gout_dma(c_done - 1).wait()

    # final program: flush a still-pending boundary carry (trailing tiles
    # were all empty). All writes drained above, so slot 0 is free for the
    # fast mode's packed staging.
    @pl.when(last_prog & (carry_idx[0] >= 0))
    def _():
        if fast:
            g_new_vmem[0] = _pack_grad_bf16(carry_vmem[:, :])
            src = g_new_vmem.at[0]
        else:
            src = carry_vmem
        flush = pltpu.make_async_copy(
            src,
            g_feat_hbm.at[:, pl.ds(pl.multiple_of(carry_idx[0], 128), CHUNK)],
            sem_out.at[0],
        )
        flush.start()
        flush.wait()


def _bwd_pallas(
    feat_cm, starts, ends, chunks_done, out_saved, g_out,
    cfg: TileConfig, alpha_clip, zbuf=None, packed16=False,
):
    """feat_cm: chunk-major (n_chunks, 8, CHUNK) packed features (the
    forward's streaming layout, shared as the VJP residual; ``packed16``
    selects the training-row decode). g_out is PLANAR: (T, 8, P) (full
    out_tiles cotangent) or (T, 4, P) (image-level r/g/b/T_final
    cotangent, no depth channel)."""
    t_tiles = cfg.num_tiles
    p = cfg.pixels_per_tile
    k_pad = feat_cm.shape[0] * CHUNK
    gch = g_out.shape[1]                 # planar (T, gch, P)
    # training backward (image-level cotangent, no z-buffer): the depth
    # lane is consumed only through g_d == 0 terms, so stream the 4
    # payload lanes of the 8-lane rows — halves the reverse-walk reads
    stream_lanes = (
        PACKED16_ROWS
        if packed16 and zbuf is None and gch == 4
        else feat_cm.shape[1]
    )
    kernel = functools.partial(
        _bwd_kernel, cfg=cfg, alpha_clip=alpha_clip,
        has_zbuf=zbuf is not None, g_channels=gch, packed16=packed16,
        stream_lanes=stream_lanes,
    )
    # fast mode (16-byte training rows) emits bf16-pair-PACKED grad rows
    fast = packed16
    out_rows, out_dtype = (
        (PACKED_ROWS, jnp.int32) if fast else (FEAT_PAD, jnp.float32)
    )
    zeros = jnp.zeros((out_rows, k_pad), out_dtype)
    in_specs = [
        pl.BlockSpec(memory_space=pltpu.MemorySpace.HBM),  # feat (packed)
        pl.BlockSpec(memory_space=pltpu.MemorySpace.HBM),  # zeros->alias
        pl.BlockSpec((1, gch, p), lambda i, *_: (i, 0, 0),
                     memory_space=pltpu.VMEM),  # g_out (planar rows)
        pl.BlockSpec((1, 8, p), lambda i, *_: (i, 0, 0),
                     memory_space=pltpu.VMEM),  # saved fwd out (T_final)
    ]
    inputs = [feat_cm, zeros, g_out, out_saved]
    if zbuf is not None:
        in_specs.append(
            pl.BlockSpec((1, p, 1), lambda i, *_: (i, 0, 0),
                         memory_space=pltpu.VMEM)
        )
        inputs.append(zbuf)
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=3,
        grid=(t_tiles,),
        in_specs=in_specs,
        out_specs=pl.BlockSpec(memory_space=pltpu.MemorySpace.HBM),
        scratch_shapes=[
            pltpu.VMEM((2, stream_lanes, CHUNK), jnp.int32),      # feat
            pltpu.VMEM((2, out_rows, CHUNK), out_dtype),      # g_new
            pltpu.VMEM((FEAT_PAD, CHUNK), jnp.float32),       # carry out
            pltpu.VMEM((FEAT_PAD, CHUNK), jnp.float32),       # carry in
            pltpu.SMEM((1,), jnp.int32),                      # carry window
            pltpu.SemaphoreType.DMA((2,)),                    # sem_feat
            pltpu.SemaphoreType.DMA((2,)),                    # sem_out
        ],
    )
    g_feat = pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((out_rows, k_pad), out_dtype),
        input_output_aliases={4: 0},  # zeros input (after 3 scalars) -> out
        interpret=_use_interpret(),
        compiler_params=pltpu.CompilerParams(has_side_effects=True),
    )(starts, ends, chunks_done, *inputs)
    return g_feat


@functools.partial(jax.custom_vjp, nondiff_argnums=(3, 4, 5))
def rasterize_tiles(
    feat_fm: Array,
    starts: Array,
    ends: Array,
    cfg: TileConfig,
    alpha_clip: Optional[float] = None,
    early_stop: float = 1e-4,
):
    """Differentiable tiled rasterization (per-instance feature surface).

    feat_fm: (>=10, K) feature-major sorted instance features (f32,
    unpacked layout — see ops/rasterize.py); gradients come back in the
    same layout. The kernel runs on the packed representation internally;
    color/opacity pass through a 1/65535 quantization whose gradient is
    straight-through.
    Returns (out_tiles PLANAR (T, 8, P) [rows r,g,b,T_final,chunks,
    depth,..], chunks_done (T,)).
    """
    return rasterize_tiles_fwd(
        feat_fm, starts, ends, cfg, alpha_clip=alpha_clip,
        early_stop=early_stop,
    )


def _fwd_rule(feat_fm, starts, ends, cfg, alpha_clip, early_stop):
    feat_pk = pack_feature_rows(feat_fm)
    out = rasterize_packed_fwd(
        feat_pk, starts, ends, cfg, alpha_clip=alpha_clip,
        early_stop=early_stop,
    )
    out_tiles, chunks_done = out
    return out, (feat_pk, starts, ends, out_tiles, chunks_done)


def _bwd_rule(cfg, alpha_clip, early_stop, residuals, cotangents):
    del early_stop
    feat_pk, starts, ends, out_tiles, chunks_done = residuals
    g_out, _ = cotangents
    feat_cm = pad_chunk_major(chunk_major(pad_packed(feat_pk)))
    g_feat = _bwd_pallas(
        feat_cm, starts, ends, chunks_done, out_tiles,
        g_out.astype(jnp.float32), cfg, alpha_clip,
    )
    return g_feat[:FEAT_DIM, : feat_pk.shape[1]], None, None


rasterize_tiles.defvjp(_fwd_rule, _bwd_rule)


@functools.partial(jax.custom_vjp, nondiff_argnums=(11, 12, 13, 14, 15))
def rasterize_gathered(
    feat_n: Array,
    gid: Array,
    starts: Array,
    ends: Array,
    cum: Array,
    count: Array,
    perm: Array,
    cum_d: Array,
    count_d: Array,
    overflow: Array,
    zbuf: Optional[Array],
    cfg: TileConfig,
    alpha_clip: Optional[float] = None,
    early_stop: float = 1e-4,
    packed16: bool = False,
    want_depth: bool = True,
):
    """Fused gather + rasterize with a single merged VJP.

    The per-instance feature gather and the tile sweep share one custom
    VJP so the gather can run on the PACKED 32-byte rows (~30% cheaper on
    v5e than 64-byte float rows) while gradients still flow to the
    unpacked per-gaussian features: backward runs the packed bwd kernel
    (10 gradient rows) and transposes the gather with the sort +
    segment-sum path (binning.segment_sum_by_gid).

    feat_n: (N, 16) f32 unpacked per-gaussian screen features
    (binning.features_from_projection). gid/starts/ends and the run
    residuals come from bin_gaussians(..., with_features=False).
    zbuf: optional (T, P, 1) camera-z buffer (opaque-geometry occlusion).
    packed16: move instances as 16-byte training rows instead of the
    32-byte viewer-parity rows (no depth channel; see
    ops/rasterize.pack_feature_table16) — halves the dominant gather and
    the kernels' ring DMA traffic.
    Returns (out_tiles PLANAR (T, 8, P), chunks_done (T,)).
    """
    # gathered packed rows go straight to the streaming chunk-major layout
    # (one shuffle — same cost as the transpose it replaces)
    pack = pack_feature_table16 if packed16 else pack_feature_table
    feat_cm = gather_chunk_major(pack(feat_n), gid)
    return rasterize_cm_fwd(
        feat_cm, starts, ends, cfg, alpha_clip=alpha_clip,
        early_stop=early_stop, zbuf=zbuf, packed16=packed16,
        want_depth=want_depth,
    )


def _gathered_fwd_rule(feat_n, gid, starts, ends, cum, count, perm,
                       cum_d, count_d, overflow, zbuf,
                       cfg, alpha_clip, early_stop, packed16, want_depth):
    pack = pack_feature_table16 if packed16 else pack_feature_table
    feat_cm = gather_chunk_major(pack(feat_n), gid)
    out = rasterize_cm_fwd(
        feat_cm, starts, ends, cfg, alpha_clip=alpha_clip,
        early_stop=early_stop, zbuf=zbuf, packed16=packed16,
        want_depth=want_depth,
    )
    out_tiles, chunks_done = out
    res = (feat_cm, gid, starts, ends, cum, count, perm, cum_d, count_d,
           overflow, zbuf, out_tiles, chunks_done)
    return out, res


def _grad_rows_to_gaussians(g_feat, gid, cum, count, perm, cum_d, count_d,
                            overflow):
    """Dispatch the gather transpose on the kernel's output form: fast
    mode emits (8, K_pad) int32 bf16-pair planes, exact mode (16, K_pad)
    f32 rows. Returns (N, 16) per-gaussian sums."""
    if g_feat.dtype == jnp.int32:
        return segment_sum_by_gid_packed_bf16(
            g_feat[:, : gid.shape[0]], gid, cum, count, perm, cum_d,
            count_d, overflow,
        )
    gt = g_feat[:FEAT_DIM, : gid.shape[0]]             # (16, K)
    return segment_sum_by_gid(
        gt, gid, cum, count, perm, cum_d, count_d, overflow
    )                                                  # (N, 16)


def _gathered_bwd_rule(cfg, alpha_clip, early_stop, packed16, want_depth,
                       res, cotangents):
    del early_stop, want_depth
    (feat_cm, gid, starts, ends, cum, count, perm, cum_d, count_d,
     overflow, zbuf, out_tiles, chunks_done) = res
    g_out, _ = cotangents
    g_feat = _bwd_pallas(
        feat_cm, starts, ends, chunks_done, out_tiles,
        g_out.astype(jnp.float32), cfg, alpha_clip, zbuf=zbuf,
        packed16=packed16,
    )
    seg = _grad_rows_to_gaussians(
        g_feat, gid, cum, count, perm, cum_d, count_d, overflow
    )
    return (seg,) + (None,) * 10


rasterize_gathered.defvjp(_gathered_fwd_rule, _gathered_bwd_rule)


# ---- image-level fused VJP ---------------------------------------------
# Moving the custom-VJP boundary up to the assembled (H, W, 4) image lets
# the backward hand the kernel a 4-channel tile cotangent directly: XLA
# autodiff through tiles_to_image would otherwise materialize a zero-padded
# (T, P, 8) cotangent (~100 MB at 1080p, ~3 ms) plus the slice transpose.


def _assemble_image(out_tiles, cfg: TileConfig, background):
    from splatjax.ops.rasterize import tiles_to_image

    return tiles_to_image(out_tiles, cfg, background)


def _image_cotangent_to_tiles(gimg, cfg: TileConfig, background):
    """(H, W, 4) image cotangent -> PLANAR (T, 4, P) [g_r, g_g, g_b, g_T]
    tiles (the exact transpose of tiles_to_image's layout + channel map).
    Channel math runs channel-MAJOR: the channel-minor form wastes
    124/128 lanes per op and cost ~10 ms/step before round 4."""
    ty_n, tx_n = cfg.tiles_y, cfg.tiles_x
    th, tw = cfg.tile_h, cfg.tile_w
    g = jnp.moveaxis(
        jnp.asarray(gimg, jnp.float32)[::-1], -1, 0
    )                                                   # (4, H, W) y-up
    # out_tiles channel 3 is T_final; image rgb = rgb_tiles + T * bg and
    # image alpha = 1 - T, so g_T = g_rgb . bg - g_alpha
    if background is None:
        g_t = -g[3]
    else:
        bg = jnp.asarray(background, jnp.float32)
        g_t = bg[0] * g[0] + bg[1] * g[1] + bg[2] * g[2] - g[3]
    g = jnp.concatenate([g[:3], g_t[None]], axis=0)     # (4, H, W)
    g = jnp.pad(
        g, ((0, 0), (0, ty_n * th - cfg.height), (0, tx_n * tw - cfg.width))
    )
    g = g.reshape(4, ty_n, th, tx_n, tw).transpose(1, 3, 0, 2, 4)
    return g.reshape(ty_n * tx_n, 4, th * tw)


@functools.partial(jax.custom_vjp, nondiff_argnums=(12, 13, 14, 15))
def render_image_gathered(
    feat_n: Array,
    gid: Array,
    starts: Array,
    ends: Array,
    cum: Array,
    count: Array,
    perm: Array,
    cum_d: Array,
    count_d: Array,
    overflow: Array,
    background: Optional[Array],
    zbuf: Optional[Array],
    cfg: TileConfig,
    alpha_clip: Optional[float] = None,
    early_stop: float = 1e-4,
    packed16: bool = False,
):
    """Fused gather + rasterize + image assembly with one custom VJP.

    Same contract as :func:`rasterize_gathered` but returns the assembled
    (H, W, 4) image directly (optionally over ``background``), and its
    backward builds the kernel's 4-channel cotangent from the image
    cotangent without the padded (T, P, 8) intermediate.
    """
    pack = pack_feature_table16 if packed16 else pack_feature_table
    feat_cm = gather_chunk_major(pack(feat_n), gid)
    # the assembled image consumes only r/g/b/T_final: never stream depth
    out_tiles, _ = rasterize_cm_fwd(
        feat_cm, starts, ends, cfg, alpha_clip=alpha_clip,
        early_stop=early_stop, zbuf=zbuf, packed16=packed16,
        want_depth=False,
    )
    return _assemble_image(out_tiles, cfg, background)


def _image_fwd_rule(feat_n, gid, starts, ends, cum, count, perm,
                    cum_d, count_d, overflow, background, zbuf,
                    cfg, alpha_clip, early_stop, packed16):
    pack = pack_feature_table16 if packed16 else pack_feature_table
    feat_cm = gather_chunk_major(pack(feat_n), gid)
    out_tiles, chunks_done = rasterize_cm_fwd(
        feat_cm, starts, ends, cfg, alpha_clip=alpha_clip,
        early_stop=early_stop, zbuf=zbuf, packed16=packed16,
        want_depth=False,
    )
    img = _assemble_image(out_tiles, cfg, background)
    res = (feat_cm, gid, starts, ends, cum, count, perm, cum_d, count_d,
           overflow, background, zbuf, out_tiles, chunks_done)
    return img, res


def _image_bwd_rule(cfg, alpha_clip, early_stop, packed16, res, gimg):
    del early_stop
    (feat_cm, gid, starts, ends, cum, count, perm, cum_d, count_d,
     overflow, background, zbuf, out_tiles, chunks_done) = res
    g4 = _image_cotangent_to_tiles(gimg, cfg, background)
    g_feat = _bwd_pallas(
        feat_cm, starts, ends, chunks_done, out_tiles, g4, cfg,
        alpha_clip, zbuf=zbuf, packed16=packed16,
    )
    seg = _grad_rows_to_gaussians(
        g_feat, gid, cum, count, perm, cum_d, count_d, overflow
    )                                                   # (N, 16)
    if background is None:
        g_bg = None
    else:
        # image rgb = rgb_tiles + T * bg: d/d bg_c = sum_pixels g_c * T
        g_bg = jnp.tensordot(
            g4[:, :3, :], out_tiles[:, 3, :], axes=([0, 2], [0, 1])
        )
    return (seg,) + (None,) * 9 + (g_bg, None)


render_image_gathered.defvjp(_image_fwd_rule, _image_bwd_rule)
