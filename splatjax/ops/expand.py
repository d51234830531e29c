"""Pallas instance-expansion kernel: depth-ordered gaussians -> (tile, gid).

TPU-native replacement for the XLA histogram + per-instance table gather that
round 1 used to duplicate each gaussian across its overlapped tiles (the
analogue of building the worker's per-splat draw list, index.js:507-567, but
tile-binned for a tiled rasterizer).

Key idea: after gaussians are sorted by depth with zero-instance gaussians
compacted to the end, the instance->gaussian map g(j) is monotone with
g(j+1) <= g(j) + 1 (every gaussian in the visible prefix has >= 1 instance).
A subchunk of 128 instances therefore touches at most 129 consecutive table
rows — a small window a kernel can DMA and "gather" from with a one-hot
selection matmul on the MXU (TPU has no vector gather; a selection-matrix
contraction is the idiomatic substitute).

Layout (dictated by Mosaic DMA tiling: HBM slice offsets/sizes on the minor
dimension must be 128-aligned):
  * table is (TBL_ROWS, Vpad) — columns on sublanes, gaussians on LANES;
  * each window DMA grabs (TBL_ROWS, WINDOW) at a 128-aligned lane offset;
  * per 128-instance subchunk (instances on SUBLANES):
        sel[u, w] = (j_u >= cum_excl[w]) & (j_u < cum_incl[w])  # one-hot
        attrs     = window @ sel^T                 # (16, 128) via MXU
    lanes w before g(j0) have cum_incl <= j0, so they never match — the
    window may start anywhere at or before g(j0). Contracting in the
    (window, sel^T) orientation makes every per-instance quantity a
    (1, 128) lane-major row — 1 vreg per VPU op in the limb-reassembly /
    tile-arithmetic epilogue, and the (16, 128) result rows ARE the
    output block rows (no transpose).

Cost at 3M instances on v5e: 1.4 ms (round 4: transposed contraction +
program-wide window DMA + in-kernel group anchors; 8.6 ms in round 3),
vs ~26 ms for the XLA scatter-add histogram + 3M-row table gather it
replaces (round-1 stage measurements).
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

Array = jax.Array

SUB = 128                      # instances per subchunk (sublane axis)
GROUP = 2                      # subchunks sharing one compare window
SUBS_PER_CHUNK = 16
CHUNK = SUB * SUBS_PER_CHUNK   # instances per grid step
WINDOW = 384                   # lanes per compare window: GROUP consecutive
                               # subchunks touch <= 127 (alignment slack)
                               # + GROUP*128 consecutive rows = 383.
                               # (A dynamic roll to lanes [0,128) would
                               # shrink compares 3x more, but Mosaic's
                               # rotated layout is consumed wrongly by the
                               # MXU on v5e — scratch/check_droll4_tpu.py.)
# The kernel was window-DMA-ISSUE bound at GROUP=2 (8 window DMAs per
# 2048-instance program, ~12k sequenced issues/frame at 3M instances =
# ~6 ms of the 8.6 ms kernel). Window offsets are MONOTONE across a
# program's groups (sub_g0 is nondecreasing), so ONE program-wide DMA
# fetches all 8 compare windows: the per-group windows become 128-aligned
# dynamic VMEM slices of the big window. Worst-case span between a
# program's first and last group boundary is (SUBS_PER_CHUNK - GROUP) *
# SUB instances (g advances <= 1 per instance) + 127 alignment slack,
# rounded up to a lane multiple, plus the last group's WINDOW.
BIGWIN = (SUBS_PER_CHUNK - GROUP) * SUB + 128 + WINDOW   # 2304 lanes
PAD_G = BIGWIN + SUB           # table pad so any window stays in bounds

# Table row layout. Values that pass through the one-hot MXU contraction
# must survive a bf16 input rounding (the fast single-pass MXU mode):
# integers <= 255 are bf16-exact, so wide integers (gaussian id, instance
# cumsum, both < 2^24) ride as THREE 8-bit limbs. Full-range f32 copies of
# the cumsums are kept in separate rows for the VPU interval compares,
# which never touch the MXU. This keeps the contraction in the fast MXU
# mode — Precision.HIGHEST on the same matmul costs ~3x (measured 21.8 ms
# vs ~10 ms for the whole kernel at 3M instances on v5e).
COL_X0 = 0         # <= 255 (tiles_x bounded — see expand_instances)
COL_Y0 = 1         # <= 255
COL_SPANW = 2      # <= 255
COL_CUM_INCL = 3   # full f32, compare-only
COL_CUM_EXCL = 4   # full f32, compare-only
COL_OGID_L0 = 5    # ogid & 255
COL_OGID_L1 = 6    # (ogid >> 8) & 255
COL_OGID_L2 = 7    # ogid >> 16
COL_CUMEX_L0 = 8   # cum_excl limbs
COL_CUMEX_L1 = 9
COL_CUMEX_L2 = 10
TBL_ROWS = 16      # padded to a sublane multiple


def _use_interpret() -> bool:
    return jax.default_backend() == "cpu"


def _expand_kernel(
    # scalar prefetch
    sub_g0_ref, scal_ref,
    # inputs
    tbl_hbm,
    # outputs
    tile_ref, gid_ref,
    # scratch
    win_vmem, sems,
    *, tiles_x: int, num_tiles: int, n_gauss: int, vpad: int,
):
    i = pl.program_id(0)
    total_f = scal_ref[0].astype(jnp.float32)   # min(total, capacity)
    n_groups = SUBS_PER_CHUNK // GROUP

    def big_off(prog):
        # a program's groups share ONE window DMA anchored at the
        # program's first instance boundary (offsets are monotone within
        # a program; BIGWIN covers the worst-case span — see the
        # constant's derivation). sub_g0 is PER-PROGRAM (CHUNK stride).
        g0 = sub_g0_ref[prog]
        off = jnp.minimum((g0 // 128) * 128, vpad - BIGWIN)
        return pl.multiple_of(off, 128)  # both operands are 128-multiples

    def big_dma(prog):
        # double-buffered on program parity: program p owns buffer p % 2
        return pltpu.make_async_copy(
            tbl_hbm.at[:, pl.ds(big_off(prog), BIGWIN)],
            win_vmem.at[prog % 2], sems.at[prog % 2],
        )

    # This program's window DMA was issued by the PREVIOUS grid program
    # (prefetch below) so it overlaps its compute; only the very first
    # program self-issues. One program-wide DMA instead of one per group:
    # the 8-per-program small-window variant was DMA-issue bound (~12k
    # sequenced issues/frame at 3M instances, ~6 of its 8.6 ms on v5e).
    @pl.when(i == 0)
    def _():
        big_dma(0).start()

    # prefetch the NEXT program's window before consuming ours
    @pl.when(i + 1 < pl.num_programs(0))
    def _():
        big_dma(i + 1).start()

    base = i * CHUNK
    subl = jax.lax.broadcasted_iota(jnp.int32, (SUB, 1), 0)
    lanes = jax.lax.broadcasted_iota(jnp.int32, (1, SUB), 1)

    big_dma(i).wait()
    # per-group window anchors are derived IN KERNEL from the big window's
    # own cum row (one lane-count per group) instead of a host-side
    # searchsorted at group stride — the XLA searchsorted only answers
    # PROGRAM-stride queries now (8x fewer, ~3 ms off the frame at 3M
    # instances). cnt = #window lanes with cum_incl <= base_j equals
    # g(base_j) - big_off exactly: every lane before the anchor has
    # cum <= base_j (side='right' semantics), pads carry 2^24, and
    # zero-instance tail gaussians hold cum == total > base_j for every
    # VALID base_j (fully-invalid groups may inflate cnt, but all their
    # instances are masked by j < total below).
    cumi_big = win_vmem[i % 2, COL_CUM_INCL:COL_CUM_INCL + 1, :]

    for grp in range(n_groups):
        # per-group compare window = 128-aligned dynamic slice of the big
        # window: the count is clamped to [0, BIGWIN - WINDOW], and the
        # anchor alignment is preserved (big_off is a 128-multiple).
        base_j = jnp.float32(0) + (base + grp * GROUP * SUB)
        cnt = jnp.sum((cumi_big <= base_j).astype(jnp.int32))
        loc = jnp.minimum((cnt // 128) * 128, BIGWIN - WINDOW)
        loc = pl.multiple_of(loc, 128)
        win = win_vmem[i % 2, :, pl.ds(loc, WINDOW)]  # (TBL_ROWS, WINDOW)
        lim = win[COL_CUM_INCL:COL_CUM_INCL + 1, :]  # (1, WINDOW)
        # selection interval per lane: [cum_excl, cum_incl) = that
        # gaussian's instance id range, both carried in the table — no
        # shuffle needed (pad lanes carry cum_excl = 2^24 so they can
        # never match).
        lim_prev = win[COL_CUM_EXCL:COL_CUM_EXCL + 1, :]
        for u in range(GROUP):
            s = grp * GROUP + u
            j = (base + s * SUB + subl).astype(jnp.float32)   # (SUB, 1)
            sel = ((j >= lim_prev) & (j < lim)).astype(jnp.float32)
            # fast (single-pass bf16) MXU mode: exact for the <=255-valued
            # rows; wide integers are reassembled from 8-bit limbs below.
            # (The full-range rows 3-4 also pass through and come out
            # rounded — they are only ever used in the compares above.)
            # Contracting win x sel^T produces attrs TRANSPOSED (16, SUB):
            # every downstream per-instance value becomes a (1, SUB)
            # lane-major ROW (1 vreg/op on the VPU). The earlier
            # (SUB, 16) orientation cost ~16 near-empty vregs per
            # column slice — the per-instance epilogue dominated the
            # whole kernel — and needed two HIGHEST-precision identity
            # matmuls per program just to transpose the outputs.
            attrs = jax.lax.dot_general(
                win, sel, (((1,), (1,)), ((), ())),
                precision=jax.lax.Precision.DEFAULT,
                preferred_element_type=jnp.float32,
            )                                                  # (16, SUB)
            x0 = attrs[COL_X0:COL_X0 + 1, :]                   # (1, SUB)
            y0 = attrs[COL_Y0:COL_Y0 + 1, :]
            spanw = jnp.maximum(attrs[COL_SPANW:COL_SPANW + 1, :], 1.0)
            ogid = (
                attrs[COL_OGID_L0:COL_OGID_L0 + 1, :]
                + 256.0 * attrs[COL_OGID_L1:COL_OGID_L1 + 1, :]
                + 65536.0 * attrs[COL_OGID_L2:COL_OGID_L2 + 1, :]
            )
            cum_ex = (
                attrs[COL_CUMEX_L0:COL_CUMEX_L0 + 1, :]
                + 256.0 * attrs[COL_CUMEX_L1:COL_CUMEX_L1 + 1, :]
                + 65536.0 * attrs[COL_CUMEX_L2:COL_CUMEX_L2 + 1, :]
            )

            jrow = (base + s * SUB + lanes).astype(jnp.float32)  # (1, SUB)
            local = jrow - cum_ex
            # integer div via f32: (local+0.5)/spanw lies strictly inside
            # (r, r+1) for integer operands, so floor is rounding-robust
            r = jnp.floor((local + 0.5) / spanw)
            tx = x0 + (local - r * spanw)
            ty = y0 + r
            tile = ty * tiles_x + tx
            valid = jrow < total_f
            # output rows ARE the subchunks: write (1, SUB) rows directly
            tile_ref[s:s + 1, :] = jnp.where(
                valid, tile, float(num_tiles)
            ).astype(jnp.int32)
            gid_ref[s:s + 1, :] = jnp.where(
                valid, ogid, float(n_gauss - 1)
            ).astype(jnp.int32)


@functools.partial(
    jax.jit, static_argnames=("capacity", "tiles_x", "num_tiles", "n_real")
)
def expand_instances(
    tbl_t: Array,
    sub_g0: Array,
    total_clamped: Array,
    capacity: int,
    tiles_x: int,
    num_tiles: int,
    n_real: int,
) -> tuple[Array, Array]:
    """Expand depth-compacted gaussians into (tile, gid) per instance.

    tbl_t: (TBL_ROWS, Vpad) f32 depth-ordered table, columns on sublanes
      (see COL_* layout: wide integers as 8-bit limbs); Vpad a 128-multiple
      >= n + PAD_G, pad lanes carrying CUM_INCL/CUM_EXCL > capacity and
      SPANW >= 1. Requires tiles_x <= 255 and tiles_y <= 255 (limb-exact
      bf16 bound; 16 px tiles cover images up to 4080 px per side).
    sub_g0: (capacity/CHUNK,) int32 — g(j) at each program boundary
      (CHUNK instances), clamped into the gap-free visible prefix (the
      kernel derives per-group anchors from the window's cum row).
    total_clamped: () int32 — min(total instances, capacity).
    Returns (tile, gid) int32 arrays of shape (capacity,): tile==num_tiles
    and gid==n_real-1 mark the invalid tail (they sort after all real
    instances and their gradient rows are zero, so the backward's
    per-gaussian run arithmetic stays exact — see binning.gather_features).
    """
    vpad = int(tbl_t.shape[1])
    rows = capacity // SUB
    kernel = functools.partial(
        _expand_kernel, tiles_x=tiles_x, num_tiles=num_tiles,
        n_gauss=n_real, vpad=vpad,
    )
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,
        grid=(capacity // CHUNK,),
        in_specs=[pl.BlockSpec(memory_space=pltpu.MemorySpace.HBM)],
        out_specs=(
            pl.BlockSpec((SUBS_PER_CHUNK, SUB), lambda i, *_: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((SUBS_PER_CHUNK, SUB), lambda i, *_: (i, 0),
                         memory_space=pltpu.VMEM),
        ),
        scratch_shapes=[
            pltpu.VMEM((2, TBL_ROWS, BIGWIN), jnp.float32),
            pltpu.SemaphoreType.DMA((2,)),
        ],
    )
    tile, gid = pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=(
            jax.ShapeDtypeStruct((rows, SUB), jnp.int32),
            jax.ShapeDtypeStruct((rows, SUB), jnp.int32),
        ),
        interpret=_use_interpret(),
    )(sub_g0, total_clamped.reshape(1).astype(jnp.int32), tbl_t)
    return tile.reshape(capacity), gid.reshape(capacity)
