"""Pallas banded Smith-Waterman score kernel — the long-pair SW engine.

Why: the lax.scan banded SW (ops/sw.py banded_sw_batch) pays XLA's
per-iteration scan overhead on every DP row; at B=1, La=100,000 (the
long-read / CSSW envelope, pacbiokanga/SSW.cpp:992, 256 Kbp cap
BKScommon.h) that overhead dominates and the measured rate was
0.04 GCUPS (LONGREAD_r03.json).  This kernel runs the whole row loop
INSIDE one Mosaic program: per row it is ~a dozen VPU ops on the
band vector, the lazy-F horizontal dependency is resolved with a
log2(K)-step shift-max scan (pltpu.roll), and the band window of the
target is read with a dynamic lane slice from VMEM — no HBM traffic
in the loop at all.

Band normalisation: callers pre-extract, per pair, the target window
bwin[t] = b[t - W + diag] (host gather), so inside the kernel the band
centre is always 0 and row i reads bwin[i : i + K].  Validity of true
target positions is carried by [jlo, jhi) bounds.

Score semantics are IDENTICAL to ops/sw.banded_sw_batch (same lazy-F
formulation, same N handling, same local floor); tests assert equality
against it and against the full-matrix numpy oracle.  Score-only: the
EC path keeps the scan kernel for its move planes; long pairs use this
kernel for score + best cell (blockwise recompute can localise a
traceback afterwards).
"""
from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .sw import (
    DEFAULT_GAP_EXT,
    DEFAULT_GAP_OPEN,
    DEFAULT_MATCH,
    DEFAULT_MISMATCH,
    NEG,
    TB_DIAG,
    TB_LEFT,
    TB_STOP,
    TB_UP,
)


def _round_up(x: int, m: int) -> int:
    return -(-x // m) * m


def _kernel(alen_ref, jlo_ref, jhi_ref, a_ref, bw_ref, out_ref, *,
            La: int, W: int, KP: int, SP: int, match: int, mismatch: int,
            gap_open: int, gap_ext: int):
    # Mosaic constraint shapes the loop structure: dynamic lane indices
    # must be 128-aligned, so rows advance in BLOCKS of 128 — the query
    # chunk and the two band-window tiles load at aligned offsets, and
    # the per-row values come from lane-compare reductions (query base)
    # and a dynamic lane ROTATE (band window), never unaligned slices.
    # SP pairs ride the SUBLANE axis per program (see _kernel_moves:
    # per-row fori overhead, not vector throughput, bounds one-pair-per-
    # program kernels to ~0.15 GCUPS at K=193).
    K = 2 * W + 1
    alen = jnp.max(alen_ref[0][:, :1], axis=1, keepdims=True)  # (SP,1)
    jlo = jnp.max(jlo_ref[0][:, :1], axis=1, keepdims=True)
    jhi = jnp.max(jhi_ref[0][:, :1], axis=1, keepdims=True)
    ks = jax.lax.broadcasted_iota(jnp.int32, (1, KP), 1)
    lane128 = jax.lax.broadcasted_iota(jnp.int32, (1, 128), 1)
    neg = jnp.full((1, KP), NEG, jnp.int32)
    CW = KP + 128

    def shift_up(x):
        # x[k] <- x[k+1]; top lane NEG (band coord k+1 of previous row).
        # pltpu.roll only takes non-negative shifts: -1 == KP-1 circular
        r = pltpu.roll(x, shift=KP - 1, axis=1)
        return jnp.where(ks == KP - 1, NEG, r)

    def shift_right(x, s):
        r = pltpu.roll(x, shift=s, axis=1)
        return jnp.where(ks < s, NEG, r)

    def outer(blk, carry0):
        i0 = blk * 128
        a_chunk = a_ref[0, :, pl.ds(pl.multiple_of(i0, 128), 128)]
        w1 = bw_ref[0, :, pl.ds(pl.multiple_of(i0, 128), KP)]
        w2 = bw_ref[0, :, pl.ds(pl.multiple_of(i0 + KP, 128), 128)]
        cat = jnp.concatenate([w1, w2], axis=1)  # (SP, KP+128)

        def body(r, carry):
            H, E, best, bi, bk = carry
            i = i0 + r
            ai = jnp.max(jnp.where(lane128 == r, a_chunk, -1),
                         axis=1, keepdims=True)
            win = pltpu.roll(cat, shift=CW - r, axis=1)
            bj = win[:, :KP]
            j = i + ks - W
            in_band = (j >= jlo) & (j < jhi) & (ks < K) & (i < alen)
            is_m = (ai == bj) & (ai < 4) & (bj < 4)
            sub = jnp.where(is_m, match, mismatch)

            E = jnp.maximum(shift_up(H) + gap_open,
                            shift_up(E) + gap_ext)
            Hd = H + sub
            H0 = jnp.maximum(jnp.maximum(Hd, E), 0)
            H0 = jnp.maximum(H0, jnp.where(sub > 0, sub, 0))
            # lazy-F: cummax(H0 - k*ext) via log-step shift-max
            run = H0 + (-gap_ext) * ks
            s = 1
            while s < KP:
                run = jnp.maximum(run, shift_right(run, s))
                s *= 2
            run_prev = shift_right(run, 1)
            F = run_prev + gap_ext * ks + gap_open - gap_ext
            H = jnp.maximum(jnp.maximum(H0, F), 0)
            H = jnp.where(in_band, H, neg)
            E2 = jnp.where(in_band, E, neg)

            rb = jnp.max(H, axis=1, keepdims=True)
            rk = jnp.min(jnp.where(H == rb, ks, KP), axis=1, keepdims=True)
            better = rb > best
            best = jnp.where(better, rb, best)
            bi = jnp.where(better, i, bi)
            bk = jnp.where(better, rk, bk)
            return H, E2, best, bi, bk

        return jax.lax.fori_loop(0, 128, body, carry0)

    H0 = jnp.zeros((SP, KP), jnp.int32)
    E0 = jnp.full((SP, KP), NEG, jnp.int32)
    z = jnp.zeros((SP, 1), jnp.int32)
    H, E, best, bi, bk = jax.lax.fori_loop(
        0, -(-La // 128), outer, (H0, E0, z, z, z)
    )
    # lane-select epilogue (scatter/.at[].set has no Mosaic lowering)
    lane = jax.lax.broadcasted_iota(jnp.int32, (SP, 128), 1)
    out = jnp.where(lane == 0, best,
                    jnp.where(lane == 1, bi,
                              jnp.where(lane == 2, bk, 0)))
    out_ref[...] = out.reshape(out_ref.shape)


@partial(jax.jit, static_argnames=("W", "interpret", "match", "mismatch",
                                   "gap_open", "gap_ext"))
def _run(a32, bw32, alen, jlo, jhi, W, interpret=False,
         match=DEFAULT_MATCH, mismatch=DEFAULT_MISMATCH,
         gap_open=DEFAULT_GAP_OPEN, gap_ext=DEFAULT_GAP_EXT):
    B, La = a32.shape
    K = 2 * W + 1
    KP = _round_up(K, 128)
    SP = 8
    G = -(-B // SP)
    pad = G * SP - B
    a32 = a32.astype(jnp.int32)
    bw32 = bw32.astype(jnp.int32)
    if pad:
        a32 = jnp.pad(a32, ((0, pad), (0, 0)), constant_values=4)
        bw32 = jnp.pad(bw32, ((0, pad), (0, 0)), constant_values=4)
        alen = jnp.pad(alen, (0, pad))
        jlo = jnp.pad(jlo, (0, pad))
        jhi = jnp.pad(jhi, (0, pad))
    vb = lambda v: jnp.broadcast_to(
        v.astype(jnp.int32).reshape(G, SP, 1), (G, SP, 128))
    kern = partial(_kernel, La=La, W=W, KP=KP, SP=SP, match=match,
                   mismatch=mismatch, gap_open=gap_open, gap_ext=gap_ext)
    out = pl.pallas_call(
        kern,
        grid=(G,),
        in_specs=[
            pl.BlockSpec((1, SP, 128), lambda p: (p, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, SP, 128), lambda p: (p, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, SP, 128), lambda p: (p, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, SP, a32.shape[1]), lambda p: (p, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, SP, bw32.shape[1]), lambda p: (p, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, SP, 128), lambda p: (p, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((G, SP, 128), jnp.int32),
        interpret=interpret,
    )(vb(alen), vb(jlo), vb(jhi),
      a32.reshape(G, SP, La), bw32.reshape(G, SP, -1))
    out = out.reshape(G * SP, 128)[:B]
    return out[:, 0], out[:, 1], out[:, 2]


def _kernel_moves(alen_ref, jlo_ref, jhi_ref, a_ref, bw_ref, out_ref,
                  mv_ref, *, La: int, W: int, KP: int, SP: int, match: int,
                  mismatch: int, gap_open: int, gap_ext: int):
    """Forward banded SW emitting PACKED 2-bit traceback codes, SP pairs
    per program on the VPU SUBLANE axis.

    Same DP as _kernel (scores bit-equal to ops/sw.banded_sw_batch); per
    row the move code (STOP/LEFT/UP/DIAG with the scan kernel's override
    order) is packed 16 rows per int32 word — mv[g, s, i>>4, k] holds
    code(i, k) of pair g*SP+s at bit 2*(i&15).  Feeds
    ops/sw_trace.traceback_cols_packed (the EC SW engine, CSSW::Align
    role pacbiokanga/SSW.cpp:992).

    Why sublane packing: at one pair per program the measured per-row
    cost is ~1.2 us regardless of band width — fori/scalar overhead, not
    vector throughput (0.15 GCUPS at K=193).  Batching SP=8 independent
    pairs on sublanes amortises that overhead: every row op is (SP, KP)
    instead of (1, KP); the band-window rotate shift is row-common so
    one roll serves all pairs.
    """
    K = 2 * W + 1
    alen = jnp.max(alen_ref[0][:, :1], axis=1, keepdims=True)  # (SP,1)
    jlo = jnp.max(jlo_ref[0][:, :1], axis=1, keepdims=True)
    jhi = jnp.max(jhi_ref[0][:, :1], axis=1, keepdims=True)
    ks = jax.lax.broadcasted_iota(jnp.int32, (1, KP), 1)
    lane128 = jax.lax.broadcasted_iota(jnp.int32, (1, 128), 1)
    neg = jnp.full((1, KP), NEG, jnp.int32)
    CW = KP + 128

    def shift_up(x):
        r = pltpu.roll(x, shift=KP - 1, axis=1)
        return jnp.where(ks == KP - 1, NEG, r)

    def shift_right(x, s):
        r = pltpu.roll(x, shift=s, axis=1)
        return jnp.where(ks < s, NEG, r)

    def outer(blk, carry0):
        i0 = blk * 128
        a_chunk = a_ref[0, :, pl.ds(pl.multiple_of(i0, 128), 128)]
        w1 = bw_ref[0, :, pl.ds(pl.multiple_of(i0, 128), KP)]
        w2 = bw_ref[0, :, pl.ds(pl.multiple_of(i0 + KP, 128), 128)]
        cat = jnp.concatenate([w1, w2], axis=1)       # (SP, KP+128)

        def body(r16, carry):
            H, E, best, bi, bk, word, w = carry
            r = w * 16 + r16
            i = i0 + r
            ai = jnp.max(jnp.where(lane128 == r, a_chunk, -1),
                         axis=1, keepdims=True)       # (SP, 1)
            win = pltpu.roll(cat, shift=CW - r, axis=1)
            bj = win[:, :KP]
            j = i + ks - W
            in_band = (j >= jlo) & (j < jhi) & (ks < K) & (i < alen)
            is_m = (ai == bj) & (ai < 4) & (bj < 4)
            sub = jnp.where(is_m, match, mismatch)

            E = jnp.maximum(shift_up(H) + gap_open,
                            shift_up(E) + gap_ext)
            Hd = H + sub
            H0 = jnp.maximum(jnp.maximum(Hd, E), 0)
            H0 = jnp.maximum(H0, jnp.where(sub > 0, sub, 0))
            run = H0 + (-gap_ext) * ks
            s = 1
            while s < KP:
                run = jnp.maximum(run, shift_right(run, s))
                s *= 2
            run_prev = shift_right(run, 1)
            F = run_prev + gap_ext * ks + gap_open - gap_ext
            H = jnp.maximum(jnp.maximum(H0, F), 0)
            H = jnp.where(in_band, H, neg)
            E2 = jnp.where(in_band, E, neg)

            # scan-kernel move precedence: STOP < LEFT < UP < DIAG
            pos = H > 0
            code = jnp.full((SP, KP), TB_STOP, jnp.int32)
            code = jnp.where((H == F) & pos, TB_LEFT, code)
            code = jnp.where((H == E2) & pos, TB_UP, code)
            code = jnp.where((H == Hd) & pos, TB_DIAG, code)
            word = word | (code << (2 * r16))

            rb = jnp.max(H, axis=1, keepdims=True)    # (SP, 1)
            rk = jnp.min(jnp.where(H == rb, ks, KP), axis=1, keepdims=True)
            better = rb > best
            best = jnp.where(better, rb, best)
            bi = jnp.where(better, i, bi)
            bk = jnp.where(better, rk, bk)
            return H, E2, best, bi, bk, word, w

        def words(w, carry0):
            H, E, best, bi, bk = carry0
            word0 = jnp.zeros((SP, KP), jnp.int32)
            H, E, best, bi, bk, word, _ = jax.lax.fori_loop(
                0, 16, body, (H, E, best, bi, bk, word0, w)
            )
            mv_ref[0, :, pl.ds(blk * 8 + w, 1), :] = word[:, None, :]
            return H, E, best, bi, bk

        return jax.lax.fori_loop(0, 8, words, carry0)

    H0 = jnp.zeros((SP, KP), jnp.int32)
    E0 = jnp.full((SP, KP), NEG, jnp.int32)
    z = jnp.zeros((SP, 1), jnp.int32)
    H, E, best, bi, bk = jax.lax.fori_loop(
        0, -(-La // 128), outer, (H0, E0, z, z, z)
    )
    lane = jax.lax.broadcasted_iota(jnp.int32, (SP, 128), 1)
    out = jnp.where(lane == 0, best,
                    jnp.where(lane == 1, bi,
                              jnp.where(lane == 2, bk, 0)))
    out_ref[...] = out.reshape(out_ref.shape)


@partial(jax.jit, static_argnames=("W", "interpret", "match", "mismatch",
                                   "gap_open", "gap_ext"))
def _run_moves(a32, bw32, alen, jlo, jhi, W, interpret=False,
               match=DEFAULT_MATCH, mismatch=DEFAULT_MISMATCH,
               gap_open=DEFAULT_GAP_OPEN, gap_ext=DEFAULT_GAP_EXT):
    B, La = a32.shape
    K = 2 * W + 1
    KP = _round_up(K, 128)
    Wd = La // 16
    SP = 8
    G = -(-B // SP)
    pad = G * SP - B
    a32 = a32.astype(jnp.int32)
    bw32 = bw32.astype(jnp.int32)
    if pad:
        a32 = jnp.pad(a32, ((0, pad), (0, 0)), constant_values=4)
        bw32 = jnp.pad(bw32, ((0, pad), (0, 0)), constant_values=4)
        alen = jnp.pad(alen, (0, pad))
        jlo = jnp.pad(jlo, (0, pad))
        jhi = jnp.pad(jhi, (0, pad))
    # per-pair bounds ride as (G, SP, 128) VMEM broadcasts (SMEM refs
    # cannot be indexed per-sublane; the kernel reduces lane 0 back out)
    vb = lambda v: jnp.broadcast_to(
        v.astype(jnp.int32).reshape(G, SP, 1), (G, SP, 128))
    kern = partial(_kernel_moves, La=La, W=W, KP=KP, SP=SP, match=match,
                   mismatch=mismatch, gap_open=gap_open, gap_ext=gap_ext)
    out, mv = pl.pallas_call(
        kern,
        grid=(G,),
        in_specs=[
            pl.BlockSpec((1, SP, 128), lambda p: (p, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, SP, 128), lambda p: (p, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, SP, 128), lambda p: (p, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, SP, a32.shape[1]), lambda p: (p, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, SP, bw32.shape[1]), lambda p: (p, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((1, SP, 128), lambda p: (p, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, SP, Wd, KP), lambda p: (p, 0, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((G, SP, 128), jnp.int32),
            jax.ShapeDtypeStruct((G, SP, Wd, KP), jnp.int32),
        ],
        interpret=interpret,
    )(vb(alen), vb(jlo), vb(jhi),
      a32.reshape(G, SP, La), bw32.reshape(G, SP, -1))
    out = out.reshape(G * SP, 128)[:B]
    mv = mv.reshape(G * SP, Wd, KP)[:B]
    return out[:, 0], out[:, 1], out[:, 2], mv


def banded_sw_moves(a, b, alen, blen, diag, W,
                    match=DEFAULT_MATCH, mismatch=DEFAULT_MISMATCH,
                    gap_open=DEFAULT_GAP_OPEN, gap_ext=DEFAULT_GAP_EXT,
                    interpret: bool | None = None):
    """Batched banded SW via the Pallas kernel with PACKED move planes.

    Returns (best, best_i, best_k, mv_packed (B, ceil(La/128)*8, KP)
    int32, bwin (B, T) int32) — scores bit-equal to banded_sw_batch;
    decode the columns with ops/sw_trace.traceback_cols_packed(bwin=...).
    """
    assert match + gap_open < 0, (
        "custom scoring with match + gap_open >= 0 breaks the lazy-F "
        "out-of-band invariant (see ADVICE r4); use the scan kernel"
    )
    a = np.asarray(a)
    B, La = a.shape
    lap = _round_up(La, 128)
    if lap != La:
        a = np.pad(a, ((0, 0), (0, lap - La)), constant_values=4)
    bwin, jlo, jhi = normalize_band(np.asarray(b), blen, diag, lap, W)
    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    best, bi, bk, mv = _run_moves(
        jnp.asarray(a.astype(np.int32)), jnp.asarray(bwin),
        jnp.asarray(np.asarray(alen, np.int32)),
        jnp.asarray(jlo), jnp.asarray(jhi), W, interpret,
        match, mismatch, gap_open, gap_ext,
    )
    return best, bi, bk, mv, bwin


def normalize_band(b: np.ndarray, blen: np.ndarray, diag: np.ndarray,
                   La: int, W: int):
    """Per-pair target band windows: bwin[p, t] = b[p, t - W + diag[p]]
    (4 outside), plus normalised validity bounds (jlo, jhi)."""
    B = b.shape[0]
    K = 2 * W + 1
    # the kernel reads aligned tiles [i0, i0+KP) and [i0+KP, i0+KP+128)
    # per 128-row block: buffer must cover the last block's second tile
    T = _round_up(La, 128) + _round_up(K, 128) + 128
    t = np.arange(T)[None, :]
    src = t - W + np.asarray(diag)[:, None]
    ok = (src >= 0) & (src < np.asarray(blen)[:, None])
    bwin = np.where(ok, np.take_along_axis(
        np.asarray(b), np.clip(src, 0, b.shape[1] - 1), axis=1), 4)
    jlo = (-np.asarray(diag)).astype(np.int32)
    jhi = (np.asarray(blen) - np.asarray(diag)).astype(np.int32)
    return bwin.astype(np.int32), jlo, jhi


def banded_sw_score(a, b, alen, blen, diag, W,
                    match=DEFAULT_MATCH, mismatch=DEFAULT_MISMATCH,
                    gap_open=DEFAULT_GAP_OPEN, gap_ext=DEFAULT_GAP_EXT,
                    interpret: bool | None = None):
    """Batched banded SW scores via the Pallas kernel.

    Returns (best, best_i, best_k) with best_k in the same band
    coordinates as ops/sw.banded_sw_batch (k = j - i - diag + W).
    a: (B, La) int8/any int; b: (B, Lb); diag: per-pair band centre.
    """
    assert match + gap_open < 0, (
        "custom scoring with match + gap_open >= 0 breaks the lazy-F "
        "out-of-band invariant (see ADVICE r4); use the scan kernel"
    )
    a = np.asarray(a)
    B, La = a.shape
    lap = _round_up(La, 128)
    if lap != La:
        a = np.pad(a, ((0, 0), (0, lap - La)), constant_values=4)
    bwin, jlo, jhi = normalize_band(np.asarray(b), blen, diag, La, W)
    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    best, bi, bk = _run(
        jnp.asarray(a.astype(np.int32)), jnp.asarray(bwin),
        jnp.asarray(np.asarray(alen, np.int32)),
        jnp.asarray(jlo), jnp.asarray(jhi), W, interpret,
        match, mismatch, gap_open, gap_ext,
    )
    return best, bi, bk
