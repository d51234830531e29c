"""Pallas segment-reduce kernel: gid-sorted gradient rows -> per-gaussian sums.

The transpose of the instance expansion (ops/expand.py): after the backward
kernel produces per-instance gradient rows and they are re-ordered by source
gaussian (sort + row gather in binning.segment_sum_by_gid), each gaussian's
rows form a contiguous run [cum[g-1], cum[g]).  This kernel sums those runs
directly with a one-hot selection matmul on the MXU:

    sel[u, w] = (cum_excl[w] <= j_u < cum_incl[w])    # (SUB, LANES) one-hot
    acc[:, w] += rows_chunk @ sel                      # (C, LANES) via MXU

replacing the XLA mean-shifted blocked-cumsum + run-boundary-gather pipeline
(~24 ms at 3M instances on v5e: the boundary difference needed a (N, C) row
gather of the cumsum ends).  Per-run sums here are exact f32 accumulation —
no prefix-difference cancellation at all, so the mean-shift trick and its
eps*sqrt(K) error bound become unnecessary.

Rows are feature-major (C, K) — Mosaic HBM slices must be 128-aligned on
the minor (lane) dimension, so instances live on lanes exactly like the
packed feature table in ops/rasterize.py.

Grid: one program per 128-gaussian output block (static offsets).  Each
program walks its block's instance window in 128-row chunks (double-buffered
DMA); rows outside the block's runs never match any lane, so 128-aligned
window overreads are harmless.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

Array = jax.Array

SUB = 128      # instance rows per chunk (lane axis of the rows array)
LANES = 128    # gaussians per output block


def _use_interpret() -> bool:
    return jax.default_backend() == "cpu"


def _segreduce_kernel(
    # scalar prefetch
    blk_start_ref, blk_chunks_ref,
    # inputs
    rows_hbm, cum_ref,
    # outputs
    out_ref,
    # scratch
    rows_vmem, sems,
    *, n_feat: int,
):
    b = pl.program_id(0)
    c0 = blk_start_ref[b]
    n_chunks = blk_chunks_ref[b]

    # this block's run bounds on lanes: [cum_excl[w], cum_incl[w])
    cum_incl = cum_ref[0:1, :]                       # (1, LANES) int32
    cum_excl = jnp.where(
        jax.lax.broadcasted_iota(jnp.int32, (1, LANES), 1) == 0,
        cum_ref[1:2, 0:1], pltpu.roll(cum_incl, 1, axis=1)
    )

    def dma(slot, c):
        return pltpu.make_async_copy(
            rows_hbm.at[:, pl.ds((c0 + c) * SUB, SUB)],
            rows_vmem.at[slot], sems.at[slot],
        )

    # chunk 0 was issued by the previous program's epilogue (cross-program
    # prefetch hides the per-program first-chunk stall across the ~N/128
    # sequential programs); only the very first program self-issues.
    @pl.when((b == 0) & (n_chunks > 0))
    def _():
        dma(0, 0).start()

    subl = jax.lax.broadcasted_iota(jnp.int32, (SUB, 1), 0)

    def body(c, acc):
        @pl.when(c + 1 < n_chunks)
        def _():
            dma((c + 1) % 2, c + 1).start()

        dma(c % 2, c).wait()
        rows = rows_vmem[c % 2]                       # (C, SUB)
        j = (c0 + c) * SUB + subl                     # (SUB, 1) int32
        sel = ((j >= cum_excl) & (j < cum_incl)).astype(jnp.float32)
        return acc + jax.lax.dot_general(
            rows, sel, (((1,), (0,)), ((), ())),
            precision=jax.lax.Precision.HIGHEST,  # one-hot sums must not
            # round through bf16 MXU passes (the hardware default)
            preferred_element_type=jnp.float32,
        )                                             # (C, LANES)

    acc = jax.lax.fori_loop(
        0, n_chunks, body, jnp.zeros((n_feat, LANES), jnp.float32)
    )
    out_ref[:, :] = acc

    # prefetch the NEXT block's chunk 0 into slot 0 (safe: every wait above
    # is done, and a block with zero chunks gets nothing issued for it —
    # the issue condition below mirrors the self-issue guard exactly)
    nb = b + 1
    in_grid = nb < pl.num_programs(0)
    nb_c = jnp.minimum(nb, pl.num_programs(0) - 1)

    @pl.when(in_grid & (blk_chunks_ref[nb_c] > 0))
    def _():
        pltpu.make_async_copy(
            rows_hbm.at[:, pl.ds(blk_start_ref[nb_c] * SUB, SUB)],
            rows_vmem.at[0], sems.at[0],
        ).start()


@jax.jit
def segment_reduce_rows(rows_fm: Array, cum: Array) -> Array:
    """Sum contiguous runs of instance rows into per-gaussian totals.

    rows_fm: (C, K) f32 feature-major — instance rows grouped by gaussian,
      gaussian g's rows occupying columns [cum[g-1], cum[g]).  K must be a
      multiple of 128; columns past the last run are ignored (they match no
      lane).
    cum: (N,) int inclusive run-end prefix (monotone, cum[-1] <= K).
      N must be a multiple of 128.
    Returns (C, N) f32 exact per-run sums, feature-major.
    """
    c, k = rows_fm.shape
    n = cum.shape[0]
    assert k % SUB == 0 and n % LANES == 0
    cum_i = cum.astype(jnp.int32)
    cum_blocks = cum_i.reshape(n // LANES, LANES)
    # cum_excl for lane 0 of each block = previous block's last cum_incl
    prev_last = jnp.concatenate(
        [jnp.zeros((1,), jnp.int32), cum_blocks[:-1, -1]]
    )
    # per-block instance chunk window (128-aligned): runs span
    # [cum[g0-1], cum[g0+127])
    blk_start = prev_last // SUB
    blk_end = -(-cum_blocks[:, -1] // SUB)
    blk_chunks = jnp.maximum(blk_end - blk_start, 0)
    cum_pair = jnp.stack(
        [cum_blocks, jnp.broadcast_to(prev_last[:, None], cum_blocks.shape)],
        axis=1,
    )                                                  # (B, 2, LANES)

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,
        grid=(n // LANES,),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.MemorySpace.HBM),
            pl.BlockSpec((1, 2, LANES), lambda i, *_: (i, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((c, LANES), lambda i, *_: (0, i),
                               memory_space=pltpu.VMEM),
        scratch_shapes=[
            pltpu.VMEM((2, c, SUB), jnp.float32),
            pltpu.SemaphoreType.DMA((2,)),
        ],
    )

    out = pl.pallas_call(
        lambda bs, bc, rows_ref, cum_ref, out_ref, rows_vmem, sems:
            _segreduce_kernel(bs, bc, rows_ref, cum_ref[0], out_ref,
                              rows_vmem, sems, n_feat=c),
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((c, n), jnp.float32),
        interpret=_use_interpret(),
    )(blk_start, blk_chunks, rows_fm, cum_pair)
    return out
