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
        match[u, w] = (j_u < cum_incl[w])      # (128, WINDOW), monotone in w
        sel         = match * (1 - shift(match))   # one-hot first-match
        attrs       = sel @ window^T               # (128, 16) via MXU
    lanes w before g(j0) have cum_incl <= j0, so they never match — the
    window may start anywhere at or before g(j0);
  * per-chunk outputs accumulate as (128, 16) columns and are transposed to
    the (16, 128) output block by an identity matmul (exact for integer
    values < 2^24), avoiding unsupported layout shuffles.

Cost at 3M instances on v5e: ~2-3 ms, vs ~26 ms for the XLA scatter-add
histogram + 3M-row table gather it replaces (round-1 stage measurements).
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

Array = jax.Array

SUB = 128                      # instances per subchunk (sublane axis)
GROUP = 2                      # subchunks sharing one window DMA
SUBS_PER_CHUNK = 16
CHUNK = SUB * SUBS_PER_CHUNK   # instances per grid step
WINDOW = 384                   # lanes per window: GROUP consecutive
                               # subchunks touch <= 127 (alignment slack)
                               # + GROUP*128 consecutive rows = 383.
                               # GROUP=2/384 measured best on v5e (8.9 ms
                               # at 3M instances): halving DMA count beat
                               # narrower windows (GROUP=1/256 -> 12.6 ms);
                               # GROUP=4/640 plateaus at the same 8.9.
                               # (A dynamic roll to lanes [0,128) would
                               # shrink compares 3x more, but Mosaic's
                               # rotated layout is consumed wrongly by the
                               # MXU on v5e — scratch/check_droll4_tpu.py.)
PAD_G = WINDOW + SUB           # table pad so any window stays in bounds

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
    win_vmem, acc_tile, acc_gid, sems,
    *, tiles_x: int, num_tiles: int, n_gauss: int, vpad: int,
):
    i = pl.program_id(0)
    total_f = scal_ref[0].astype(jnp.float32)   # min(total, capacity)
    n_groups = SUBS_PER_CHUNK // GROUP

    def win_off(prog, grp):
        # sub_g0 is sampled at GROUP-subchunk (window-DMA) stride
        g0 = sub_g0_ref[prog * (SUBS_PER_CHUNK // GROUP) + grp]
        off = jnp.minimum((g0 // 128) * 128, vpad - WINDOW)
        return pl.multiple_of(off, 128)  # both operands are 128-multiples

    def win_dma(prog, grp):
        # double-buffered on program parity: program p owns buffer p % 2
        return pltpu.make_async_copy(
            tbl_hbm.at[:, pl.ds(win_off(prog, grp), WINDOW)],
            win_vmem.at[prog % 2, grp], sems.at[prog % 2, grp],
        )

    # This program's window DMAs were issued by the PREVIOUS grid program
    # (epilogue prefetch below) so they overlap its compute; only the very
    # first program self-issues. Measured on v5e: the per-program
    # first-window stall was ~40% of the kernel before this.
    @pl.when(i == 0)
    def _():
        for grp in range(n_groups):
            win_dma(0, grp).start()

    # prefetch the NEXT program's whole window set before consuming ours
    @pl.when(i + 1 < pl.num_programs(0))
    def _():
        for grp in range(n_groups):
            win_dma(i + 1, grp).start()

    base = i * CHUNK
    subl = jax.lax.broadcasted_iota(jnp.int32, (SUB, 1), 0)

    for grp in range(n_groups):
        win_dma(i, grp).wait()
        win = win_vmem[i % 2, grp]                  # (TBL_ROWS, WINDOW)
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
            attrs = jax.lax.dot_general(
                sel, win, (((1,), (1,)), ((), ())),
                precision=jax.lax.Precision.DEFAULT,
                preferred_element_type=jnp.float32,
            )                                                  # (SUB, 16)
            x0 = attrs[:, COL_X0:COL_X0 + 1]
            y0 = attrs[:, COL_Y0:COL_Y0 + 1]
            spanw = jnp.maximum(attrs[:, COL_SPANW:COL_SPANW + 1], 1.0)
            ogid = (
                attrs[:, COL_OGID_L0:COL_OGID_L0 + 1]
                + 256.0 * attrs[:, COL_OGID_L1:COL_OGID_L1 + 1]
                + 65536.0 * attrs[:, COL_OGID_L2:COL_OGID_L2 + 1]
            )
            cum_ex = (
                attrs[:, COL_CUMEX_L0:COL_CUMEX_L0 + 1]
                + 256.0 * attrs[:, COL_CUMEX_L1:COL_CUMEX_L1 + 1]
                + 65536.0 * attrs[:, COL_CUMEX_L2:COL_CUMEX_L2 + 1]
            )

            local = j - cum_ex
            # integer div via f32: (local+0.5)/spanw lies strictly inside
            # (r, r+1) for integer operands, so floor is rounding-robust
            r = jnp.floor((local + 0.5) / spanw)
            tx = x0 + (local - r * spanw)
            ty = y0 + r
            tile = ty * tiles_x + tx
            valid = j < total_f
            acc_tile[:, s:s + 1] = jnp.where(valid, tile, float(num_tiles))
            acc_gid[:, s:s + 1] = jnp.where(valid, ogid, float(n_gauss - 1))

    # exact transpose (128, 16) -> (16, 128) on the MXU: B = I^T-contract(A)
    eye = (
        jax.lax.broadcasted_iota(jnp.int32, (SUB, SUB), 0)
        == jax.lax.broadcasted_iota(jnp.int32, (SUB, SUB), 1)
    ).astype(jnp.float32)
    tile_t = jax.lax.dot_general(
        acc_tile[:, :], eye, (((0,), (0,)), ((), ())),
        precision=jax.lax.Precision.HIGHEST,
        preferred_element_type=jnp.float32,
    )                                               # (16, 128)
    gid_t = jax.lax.dot_general(
        acc_gid[:, :], eye, (((0,), (0,)), ((), ())),
        precision=jax.lax.Precision.HIGHEST,
        preferred_element_type=jnp.float32,
    )
    tile_ref[:, :] = tile_t.astype(jnp.int32)
    gid_ref[:, :] = gid_t.astype(jnp.int32)


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
    sub_g0: (capacity/(SUB*GROUP),) int32 — g(j) at each window-DMA
      boundary (SUB*GROUP instances), clamped into the gap-free visible
      prefix.
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
    n_groups = SUBS_PER_CHUNK // GROUP
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
            pltpu.VMEM((2, n_groups, TBL_ROWS, WINDOW), jnp.float32),
            pltpu.VMEM((SUB, SUBS_PER_CHUNK), jnp.float32),
            pltpu.VMEM((SUB, SUBS_PER_CHUNK), jnp.float32),
            pltpu.SemaphoreType.DMA((2, n_groups)),
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
