"""Streaming-tile gather: random 64 B row gathers from HBM tables past
the 128 MiB VMEM staging cliff (PERF.md round-4: 43.5 M rows/s vs
145-318 M below the cliff).

XLA's gather from a >VMEM table pays HBM random-access latency per row.
This kernel re-shapes the access pattern so HBM only ever sees
SEQUENTIAL traffic (VERDICT r4 item 4's named design — explicit
HBM->VMEM DMA pipelining, matching the memory-resident sweep role of
the reference's LocateCoreMultiples extension loop,
libbiokanga/SfxArrayV2.cpp:5693+):

  1. sort the indices once on device (lax.sort; ~10 ms for 6.3 M),
  2. stream the table through VMEM in tiles with a double-buffered
     DMA pipeline (tile t+1 in flight while t is consumed),
  3. per tile, process exactly the sorted-index range that lands in it
     (tile boundaries via one searchsorted, prefetched to SMEM), the
     in-tile gather running on the MXU.

Total HBM traffic = one sequential pass over the table + the index and
result arrays, independent of the gather count; the random access
happens VMEM-side.

In-tile gather mechanics (Mosaic constraint-driven: `tpu.dynamic_gather`
is single-vreg along the gather dim, and lane slices must be
128-aligned, so neither `take` nor 16-lane byte-plane matmuls lower):
the table is viewed as (R/8, 128) uint32 LINES of 8 rows; a tile's
lines expand once to 4 byte planes laid out as (LINES, 4*128) bf16
(byte values are exact in bf16); a block of NB sorted indices gathers
its LINES with one one-hot (NB, LINES) x (LINES, 512) MXU matmul
(exact: each one-hot row has a single 1, f32 accumulate), and the
candidate's sub-row within the line is resolved by elementwise lane
masking — no lane shuffles anywhere.

Probe: scripts/probe_stream_gather.py (measured numbers in PERF.md).
The checksum consume is defined byte-wise (sum over selected bytes of
byte ^ index-byte, mod 2^32) so the XLA reference computes the
identical quantity.
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

ROW_WORDS = 16          # 64 B rows
ROWS_PER_LINE = 8       # (8 rows x 16 words) = one 128-lane line
LANES = ROWS_PER_LINE * ROW_WORDS  # 128


def _dma(lines_hbm, tiles, sems, tt, slot, SL):
    return pltpu.make_async_copy(
        lines_hbm.at[pl.ds(tt * SL, SL)], tiles.at[slot], sems.at[slot])


def _consume_kernel(offs_ref, sidx_ref, lines_hbm, out_ref,
                    tiles, planes, sems, *, SL, NB, T):
    """Grid program t: double-buffer tile t's SL lines HBM->VMEM, expand
    byte planes, gather each in-tile sorted-index block with one one-hot
    MXU matmul, XOR-consume bytes, accumulate an (NB, 512) int32
    checksum block."""
    t = pl.program_id(0)

    @pl.when(t == 0)
    def _():
        out_ref[...] = jnp.zeros_like(out_ref)
        _dma(lines_hbm, tiles, sems, 0, 0, SL).start()

    @pl.when(t + 1 < T)
    def _():
        _dma(lines_hbm, tiles, sems, t + 1, (t + 1) % 2, SL).start()

    _dma(lines_hbm, tiles, sems, t, t % 2, SL).wait()

    tilew = tiles[t % 2]                     # (SL, 128) uint32 lines
    for k in range(4):
        planes[:, k * LANES:(k + 1) * LANES] = (
            (tilew >> jnp.uint32(8 * k)) & jnp.uint32(0xFF)
        ).astype(jnp.int32).astype(jnp.float32).astype(jnp.bfloat16)

    lo = offs_ref[t]
    hi = offs_ref[t + 1]
    a0 = (lo // NB) * NB                 # NB-aligned block starts
    nblk = (hi - a0 + NB - 1) // NB
    base_row = t * SL * ROWS_PER_LINE

    lane = jax.lax.iota(jnp.int32, 4 * LANES)[None, :]   # (1, 512)
    k_grp = lane >> 7                    # byte plane 0..3
    sub_row = (lane >> 4) & 7            # row within line 0..7

    def body(i, acc):
        start = a0 + i * NB
        gi = sidx_ref[pl.ds(start, NB)]          # (NB,) global row ids
        pos = start + jax.lax.iota(jnp.int32, NB)
        msk = (pos >= lo) & (pos < hi)
        li = jnp.clip(jnp.where(msk, gi - base_row, 0),
                      0, SL * ROWS_PER_LINE - 1)
        line = li >> 3                           # (NB,) line index
        jsub = (li & 7)[:, None]                 # (NB, 1) row-in-line

        oh = jnp.where(
            line[:, None] == jax.lax.iota(jnp.int32, SL)[None, :],
            jnp.float32(1), jnp.float32(0)).astype(jnp.bfloat16)
        g = jax.lax.dot_general(
            oh, planes[...], (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)   # (NB, 512)
        b = g.astype(jnp.int32)                   # exact bytes 0..255

        gib = (gi[:, None] >> (jnp.int32(8) * k_grp)) & 255
        v = b ^ gib
        # (bool minor-dim inserts don't lower; re-derive the position
        # mask from the 32-bit pos vector instead of msk[:, None])
        ok = ((sub_row == jsub) & (pos[:, None] >= lo)
              & (pos[:, None] < hi))
        return acc + jnp.where(ok, v, 0)

    out_ref[...] += jax.lax.fori_loop(
        0, nblk, body, jnp.zeros((NB, 4 * LANES), jnp.int32))


@functools.partial(jax.jit, static_argnames=("tile_lines", "block"))
def stream_gather_consume(table, idx, tile_lines=512, block=1024):
    """Byte-checksum-consuming streaming gather (probe/verification
    entry): returns sum over i, k, w of
    ((table[idx[i], w] >> 8k) & 0xFF) ^ ((idx[i] >> 8k) & 0xFF)
    mod 2^32 — compute the identical quantity through an XLA gather to
    verify.  The row-producing integration point is the same kernel
    minus the XOR reduction."""
    R, W = table.shape
    assert W == ROW_WORDS
    SL = tile_lines
    lines = -(-R // ROWS_PER_LINE)
    T = -(-lines // SL)
    pad_rows_n = T * SL * ROWS_PER_LINE - R
    if pad_rows_n:
        table = jnp.pad(table, ((0, pad_rows_n), (0, 0)))
    lines_hbm = table.reshape(T * SL, LANES)
    sidx = jnp.sort(idx.astype(jnp.int32))
    offs = jnp.searchsorted(
        sidx, jnp.arange(T + 1, dtype=jnp.int32) * (SL * ROWS_PER_LINE)
    ).astype(jnp.int32)
    # pad sidx so aligned block loads stay in bounds
    sidx = jnp.pad(sidx, (0, 2 * block))

    kern = functools.partial(_consume_kernel, SL=SL, NB=block, T=T)
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(T,),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.ANY),
        ],
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
        scratch_shapes=[
            pltpu.VMEM((2, SL, LANES), jnp.uint32),
            pltpu.VMEM((SL, 4 * LANES), jnp.bfloat16),
            pltpu.SemaphoreType.DMA((2,)),
        ],
    )
    out = pl.pallas_call(
        kern,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((block, 4 * LANES), jnp.int32),
    )(offs, sidx, lines_hbm)
    return jnp.sum(out, dtype=jnp.int32).astype(jnp.uint32)
