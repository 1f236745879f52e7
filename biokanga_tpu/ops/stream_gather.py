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


# ---------------------------------------------------------------------------
# Rows-CONSUMING integration: packed Hamming extension past the cliff.
# ---------------------------------------------------------------------------

BASES_PER_WORD = 16
ROW_STRIDE_BASES = 128
MM_INVALID = 255


def _mm_kernel(offs_ref, sr0_ref, lines_hbm, pat_hbm, msk_hbm, out_ref,
               tiles, planes, patb, mskb, sems, bsems, *, SL, NB, T):
    """Extension-mm kernel: per grid program t, stream tile t's SL
    2-row byte lines HBM->VMEM (double-buffered), and for each
    NB-aligned block of the tile's sorted-candidate range: one-hot MXU
    gather of the candidates' LINES, XOR against the pre-shifted read
    byte patterns, mask to valid mismatch-lane bits, SWAR-count 2-bit
    mismatch lanes, select the candidate's row half, and read-modify-
    write the (sorted-order) mm vector."""
    t = pl.program_id(0)

    def tdma(tt, slot):
        return pltpu.make_async_copy(
            lines_hbm.at[pl.ds(tt * SL, SL)], tiles.at[slot],
            sems.at[slot])

    @pl.when(t == 0)
    def _():
        tdma(0, 0).start()

    @pl.when(t + 1 < T)
    def _():
        tdma(t + 1, (t + 1) % 2).start()

    tdma(t, t % 2).wait()

    tilew = tiles[t % 2]                     # (SL, 128) uint8 lines
    planes[...] = tilew.astype(jnp.int32).astype(
        jnp.float32).astype(jnp.bfloat16)

    lo = offs_ref[t]
    hi = offs_ref[t + 1]
    a0 = (lo // NB) * NB
    nblk = (hi - a0 + NB - 1) // NB
    base_row = t * SL * 2

    lane = jax.lax.iota(jnp.int32, 128)[None, :]   # (1, 128)
    half = lane >> 6                               # row within line 0/1

    def body(i, _):
        start = a0 + i * NB
        # candidate row ids + byte pattern/mask blocks for this range
        pdma = pltpu.make_async_copy(
            pat_hbm.at[pl.ds(start, NB)], patb, bsems.at[0])
        mdma = pltpu.make_async_copy(
            msk_hbm.at[pl.ds(start, NB)], mskb, bsems.at[1])
        pdma.start()
        mdma.start()
        r0 = sr0_ref[pl.ds(start, NB)]           # (NB,) sorted row ids
        pos = start + jax.lax.iota(jnp.int32, NB)
        li = jnp.clip(jnp.where((pos >= lo) & (pos < hi),
                                r0 - base_row, 0), 0, SL * 2 - 1)
        line = li >> 1
        jsub = (li & 1)[:, None]

        oh = jnp.where(
            line[:, None] == jax.lax.iota(jnp.int32, SL)[None, :],
            jnp.float32(1), jnp.float32(0)).astype(jnp.bfloat16)
        g = jax.lax.dot_general(
            oh, planes[...], (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)   # (NB, 128) bytes
        b = g.astype(jnp.int32)
        pdma.wait()
        mdma.wait()
        x = b ^ patb[...].astype(jnp.int32)
        l2 = (x | (x >> 1)) & 0x55
        l2 = l2 & mskb[...].astype(jnp.int32)
        cnt = ((l2 & 1) + ((l2 >> 2) & 1) + ((l2 >> 4) & 1)
               + ((l2 >> 6) & 1))
        ok = ((half == jsub) & (pos[:, None] >= lo)
              & (pos[:, None] < hi))
        mm = jnp.sum(jnp.where(ok, cnt, 0), axis=1)   # (NB,)
        cur = out_ref[pl.ds(start, NB)]
        out_ref[pl.ds(start, NB)] = jnp.where(
            (pos >= lo) & (pos < hi), mm, cur)
        return 0

    jax.lax.fori_loop(0, nblk, body, 0)


def _build_patterns(rcodes, rnlane, lengths, loci_flat, read_of, W):
    """XLA-side: per SORTED candidate, the read's packed words SHIFTED
    to the candidate's in-row base offset (MSB-first 2-bit packing),
    as a 16-word pattern + the matching mismatch-lane byte mask.
    Only SMALL-table gathers (rcodes is ~1 MB)."""
    s = (loci_flat & (ROW_STRIDE_BASES - 1)).astype(jnp.int32)   # 0..127
    rw = rcodes[read_of]                     # (N, W) uint32
    nl = rnlane[read_of]                     # (N, W) uint32
    ln = lengths[read_of].astype(jnp.uint32)
    # valid-lane mask per read word (01 bits at valid bases, MSB-first)
    wb = jnp.arange(W, dtype=jnp.int32) * 16
    v = jnp.clip(ln[:, None].astype(jnp.int32) - wb[None, :], 0, 16
                 ).astype(jnp.uint32)
    vmask = jnp.where(
        v == 0, jnp.uint32(0),
        (jnp.uint32(0x55555555)
         << (jnp.uint32(2) * (jnp.uint32(16) - v)))
        & jnp.uint32(0xFFFFFFFF))            # (N, W)
    # reads with N lanes always mismatch: fold 0b01 into the mask is
    # wrong (they must COUNT) — instead flip the pattern bits at N
    # lanes so they can never equal the 2-bit genome code... a 2-bit
    # code XOR 0b11 never equals any code's complement? No: force the
    # mismatch by keeping the mask bit AND xoring pattern with 0b11 at
    # N lanes: genome code g vs pattern (g^3) differs always (3 != 0).
    # (rnlane is 0b11 at N lanes, 0 elsewhere — exactly the flip.)
    rw = rw ^ nl

    def place(words):
        """(N, W) -> (N, 16): shift words right by s bases across a
        16-word MSB-first frame (inverse of _extract_aligned_words)."""
        N = words.shape[0]
        k = (s >> 4).astype(jnp.int32)            # word offset 0..7
        sh = (jnp.uint32(2) * (s & 15).astype(jnp.uint32))[:, None]
        padded = jnp.pad(words, ((0, 0), (1, 16 - W)))  # (N, 17)
        hi16 = padded[:, 1:17] >> sh
        lo16 = jnp.where(
            sh > 0, padded[:, 0:16] << (jnp.uint32(32) - sh), 0)
        base = hi16 | lo16                         # k = 0 placement
        out = jnp.zeros((N, 16), jnp.uint32)
        for kk in range(8):
            shifted = jnp.pad(base, ((0, 0), (kk, 0)))[:, :16]
            out = jnp.where((k == kk)[:, None], shifted, out)
        return out

    pat = place(rw)
    msk = place(vmask)
    return pat, msk


def stream_extend_mm(rows, loci, valid, rcodes, rnlane, lengths,
                     entry_starts, genome_len,
                     tile_lines=1024, block=1024):
    """hamming_extend_packed's contract computed through the streaming
    gather kernel — for packed-row tables PAST the VMEM staging cliff
    (>= ~2M rows), where XLA's gather runs at the 43 M rows/s floor.
    Restrictions (callers fall back to the XLA path otherwise): reads
    <= 128 bases (single-row windows) and an N-free genome
    (PackedGenome.n_rows is None); read Ns are handled exactly (their
    lanes always mismatch, matching the packed path's N rule).

    rows: (R, 16) uint32 overlapping packed rows; loci/valid: (B, C);
    rcodes/rnlane: (B, W<=8); returns (B, C) uint8 mm, MM_INVALID where
    masked."""
    B, C = loci.shape
    W = rcodes.shape[1]
    assert W <= 8, "stream path covers reads <= 128 bases"
    R = rows.shape[0]
    n = genome_len

    starts32 = entry_starts.astype(jnp.int32)
    last = loci + (lengths[:, None] - 1)
    ent_a = jnp.searchsorted(starts32, loci, side="right") - 1
    ent_b = jnp.searchsorted(starts32, last, side="right") - 1
    valid = valid & (loci >= 0) & (last < n) & (ent_a == ent_b)

    lf = loci.reshape(-1).astype(jnp.int32)
    r0 = jnp.clip(lf >> 7, 0, R - 1)
    N = lf.shape[0]

    sr0, perm = jax.lax.sort_key_val(
        r0, jnp.arange(N, dtype=jnp.int32))
    lf_s = lf[perm]                        # scalar gathers: fast regime
    read_of = perm // C                    # read id per sorted candidate
    pat, msk = _build_patterns(rcodes, rnlane, lengths, lf_s, read_of, W)

    SL = tile_lines
    lines = -(-R // 2)
    T = -(-lines // SL)
    pad_r = T * SL * 2 - R
    rows_p = jnp.pad(rows, ((0, pad_r), (0, 0))) if pad_r else rows
    lines_hbm = jax.lax.bitcast_convert_type(
        rows_p, jnp.uint8).reshape(T * SL, 128)
    offs = jnp.searchsorted(
        sr0, jnp.arange(T + 1, dtype=jnp.int32) * (SL * 2)
    ).astype(jnp.int32)
    Npad = (-(-N // block) + 2) * block
    sr0_p = jnp.pad(sr0, (0, Npad - N))
    pat8 = jax.lax.bitcast_convert_type(
        jnp.pad(pat, ((0, Npad - N), (0, 0))), jnp.uint8
    ).reshape(Npad, 64)
    msk8 = jax.lax.bitcast_convert_type(
        jnp.pad(msk, ((0, Npad - N), (0, 0))), jnp.uint8
    ).reshape(Npad, 64)
    # duplicate the 64 pattern bytes into both row halves of the line
    pat128 = jnp.concatenate([pat8, pat8], axis=1)
    msk128 = jnp.concatenate([msk8, msk8], axis=1)

    kern = functools.partial(_mm_kernel, SL=SL, NB=block, T=T)
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(T,),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.VMEM),   # sr0
            pl.BlockSpec(memory_space=pltpu.ANY),    # lines
            pl.BlockSpec(memory_space=pltpu.ANY),    # patterns
            pl.BlockSpec(memory_space=pltpu.ANY),    # masks
        ],
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
        scratch_shapes=[
            pltpu.VMEM((2, SL, 128), jnp.uint8),
            pltpu.VMEM((SL, 128), jnp.bfloat16),
            pltpu.VMEM((block, 128), jnp.uint8),
            pltpu.VMEM((block, 128), jnp.uint8),
            pltpu.SemaphoreType.DMA((2,)),
            pltpu.SemaphoreType.DMA((2,)),
        ],
    )
    mm_sorted = pl.pallas_call(
        kern,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((Npad,), jnp.int32),
    )(offs, sr0_p, lines_hbm, pat128, msk128)
    inv = jnp.zeros(N, jnp.int32).at[perm].set(
        jnp.arange(N, dtype=jnp.int32))
    mm = mm_sorted[inv].reshape(B, C)
    return jnp.where(valid, jnp.minimum(mm, MM_INVALID - 1),
                     MM_INVALID).astype(jnp.uint8)
