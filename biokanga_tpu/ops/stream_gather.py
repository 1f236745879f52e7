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
  2. stream the table through VMEM in S-row tiles with a double-buffered
     DMA pipeline (tile t+1 in flight while t is consumed),
  3. per tile, process exactly the sorted-index range that lands in it
     (tile boundaries via one searchsorted, prefetched to SMEM), the
     in-tile gather being VMEM-local.

Total HBM traffic = one sequential pass over the table + the index and
result arrays, independent of the gather count; the random access
happens VMEM-side where latency is ~20x lower.  The caller gets rows in
SORTED-index order plus the sort permutation (consumers either work in
sorted order or invert with one small scalar-table gather).

Probe: scripts/probe_stream_gather.py (measured numbers in PERF.md).
Two in-tile gather strategies (probe picks the faster that lowers):
  take — jnp.take on the VMEM-resident tile (Mosaic dynamic gather),
  mxu  — one-hot matmul over byte planes (exact: one-hot rows have a
         single 1, byte values <= 255 are exact in bf16, f32 acc).
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _dma(table_hbm, tiles, sems, tt, slot, S):
    return pltpu.make_async_copy(
        table_hbm.at[pl.ds(tt * S, S)], tiles.at[slot], sems.at[slot])


def _consume_kernel_take(offs_ref, sidx_ref, table_hbm, out_ref,
                         tiles, sems, *, S, NB, W, T):
    """Grid program t: double-buffer tile t's S rows HBM->VMEM, gather
    the sorted indices in [offs[t], offs[t+1]) from the resident tile,
    XOR-consume, accumulate an (NB, W) int32 checksum block."""
    t = pl.program_id(0)

    @pl.when(t == 0)
    def _():
        out_ref[...] = jnp.zeros_like(out_ref)
        _dma(table_hbm, tiles, sems, 0, 0, S).start()

    @pl.when(t + 1 < T)
    def _():
        _dma(table_hbm, tiles, sems, t + 1, (t + 1) % 2, S).start()

    _dma(table_hbm, tiles, sems, t, t % 2, S).wait()

    tile = tiles[t % 2]                      # (S, W) uint32
    lo = offs_ref[t]
    hi = offs_ref[t + 1]
    nblk = (hi - lo + NB - 1) // NB

    def body(i, acc):
        start = lo + i * NB
        gi = sidx_ref[pl.ds(start, NB)]          # (NB,) global row ids
        msk = (start + jax.lax.iota(jnp.int32, NB)) < hi
        li = jnp.clip(jnp.where(msk, gi - t * S, 0), 0, S - 1)
        li2 = jnp.broadcast_to(li[:, None], (NB, W))
        rows = jnp.take_along_axis(tile, li2, axis=0, mode="clip")
        v = rows ^ gi.astype(jnp.uint32)[:, None]
        v = jnp.where(msk[:, None], v, jnp.uint32(0))
        return acc + v.astype(jnp.int32)

    out_ref[...] += jax.lax.fori_loop(
        0, nblk, body, jnp.zeros((NB, W), jnp.int32))


def _consume_kernel_mxu(offs_ref, sidx_ref, table_hbm, out_ref,
                        tiles, planes, sems, *, S, NB, SC, W, T):
    """Same contract as _consume_kernel_take; in-tile gather via
    one-hot MXU matmuls over byte planes."""
    t = pl.program_id(0)

    @pl.when(t == 0)
    def _():
        out_ref[...] = jnp.zeros_like(out_ref)
        _dma(table_hbm, tiles, sems, 0, 0, S).start()

    @pl.when(t + 1 < T)
    def _():
        _dma(table_hbm, tiles, sems, t + 1, (t + 1) % 2, S).start()

    _dma(table_hbm, tiles, sems, t, t % 2, S).wait()

    tile = tiles[t % 2]                      # (S, W) uint32
    # byte planes (S, 4*W) bf16: plane k holds byte k of every word
    for k in range(4):
        planes[:, k * W:(k + 1) * W] = (
            (tile >> jnp.uint32(8 * k)) & jnp.uint32(0xFF)
        ).astype(jnp.int32).astype(jnp.float32).astype(jnp.bfloat16)

    lo = offs_ref[t]
    hi = offs_ref[t + 1]
    nblk = (hi - lo + NB - 1) // NB

    def body(i, acc):
        start = lo + i * NB
        gi = sidx_ref[pl.ds(start, NB)]
        msk = (start + jax.lax.iota(jnp.int32, NB)) < hi
        li = jnp.clip(jnp.where(msk, gi - t * S, 0), 0, S - 1)

        def schunk(s, facc):
            oh = jnp.where(
                li[:, None]
                == s * SC + jax.lax.iota(jnp.int32, SC)[None, :],
                jnp.float32(1), jnp.float32(0)).astype(jnp.bfloat16)
            pl_c = planes[pl.ds(s * SC, SC), :]
            return facc + jax.lax.dot_general(
                oh, pl_c,
                (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32)

        f = jax.lax.fori_loop(
            0, S // SC, schunk, jnp.zeros((NB, 4 * W), jnp.float32))
        b = f.astype(jnp.uint32)
        rows = (b[:, 0:W] | (b[:, W:2 * W] << 8)
                | (b[:, 2 * W:3 * W] << 16) | (b[:, 3 * W:4 * W] << 24))
        v = rows ^ gi.astype(jnp.uint32)[:, None]
        v = jnp.where(msk[:, None], v, jnp.uint32(0))
        return acc + v.astype(jnp.int32)

    out_ref[...] += jax.lax.fori_loop(
        0, nblk, body, jnp.zeros((NB, W), jnp.int32))


@functools.partial(
    jax.jit, static_argnames=("tile_rows", "block", "schunk", "use_mxu"))
def stream_gather_consume(table, idx, tile_rows=4096, block=1024,
                          schunk=512, use_mxu=False):
    """Checksum-consuming streaming gather (probe/verification entry):
    returns sum_i (table[idx[i]] ^ idx[i]) summed mod 2^32 over all
    words — bit-comparable with the XLA plain-gather consume.  The
    row-producing integration point is the same kernel minus the XOR
    reduction (rows land in sorted order)."""
    R, W = table.shape
    S = tile_rows
    T = -(-R // S)
    if R % S:
        table = jnp.pad(table, ((0, T * S - R), (0, 0)))
    sidx = jnp.sort(idx.astype(jnp.int32))
    offs = jnp.searchsorted(
        sidx, jnp.arange(T + 1, dtype=jnp.int32) * S).astype(jnp.int32)
    # pad sidx so the last block's dynamic slice stays in bounds
    sidx = jnp.pad(sidx, (0, block))

    if use_mxu:
        kern = functools.partial(
            _consume_kernel_mxu, S=S, NB=block, SC=schunk, W=W, T=T)
        scratch = [
            pltpu.VMEM((2, S, W), jnp.uint32),
            pltpu.VMEM((S, 4 * W), jnp.bfloat16),
            pltpu.SemaphoreType.DMA((2,)),
        ]
    else:
        kern = functools.partial(
            _consume_kernel_take, S=S, NB=block, W=W, T=T)
        scratch = [
            pltpu.VMEM((2, S, W), jnp.uint32),
            pltpu.SemaphoreType.DMA((2,)),
        ]

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(T,),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.ANY),
        ],
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
        scratch_shapes=scratch,
    )
    out = pl.pallas_call(
        kern,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((block, W), jnp.int32),
    )(offs, sidx, table)
    return jnp.sum(out, dtype=jnp.int32).astype(jnp.uint32)
