"""Multi-hit assignment and chimeric (adaptive) trimming.

Parity roles:
- AssignMultiMatches / RunClusteringThreads (biokanga/Aligner.cpp:
  5109,4884): reads with 2..MaxMulti equally-best hits are assigned to
  the candidate locus best supported by nearby uniquely-aligned reads;
  ambiguous winners stay multi (unassigned).
- AdaptiveTrim chimeric acceptance (libbiokanga/SfxArrayV2.cpp:5482,
  consts SfxArrayV2.h:53-60): unaccepted reads are re-examined at their
  best candidate locus and flank-trimmed to the longest window with at
  most 15 mismatches per 100bp of trimmed length, at least 25bp after
  trimming, and at least one exact run of 8; accepted chimerics report
  soft-clipped CIGARs.
"""
from __future__ import annotations

from dataclasses import dataclass

import jax
import jax.numpy as jnp
import numpy as np

# AdaptiveTrim constants (SfxArrayV2.h:53-60)
C_MIN_AT_SEQ_LEN = 25
C_MIN_AT_TRIMMED_LEN = 15
C_MAX_AT_MM_PER100 = 15
C_MIN_AT_EXACT_LEN = 8


def topk_best_loci(mm: np.ndarray, loci: np.ndarray, K: int):
    """Per read: up to K loci whose mm equals the row minimum.
    mm: (B, C) uint8 (255 invalid); loci: (B, C) int32.
    Returns (best_mm (B,), lists (B, K) int32 loci, count (B,))."""
    mm_i = mm.astype(np.int32)
    best = mm_i.min(axis=1)
    is_best = mm_i == best[:, None]
    out = np.full((len(mm), K), -1, np.int64)
    cnt = np.zeros(len(mm), np.int64)
    for b in range(len(mm)):
        idx = np.nonzero(is_best[b])[0][:K]
        out[b, : len(idx)] = loci[b, idx]
        cnt[b] = int(is_best[b].sum())
    return best, out, cnt


def assign_multihits(
    unique_loci: np.ndarray,        # loci of uniquely-accepted reads
    unique_lens: np.ndarray,
    multi_cand_loci: np.ndarray,    # (M, K) candidate loci (-1 pad)
    genome_len: int,
    window: int = 500,
):
    """Assign each multi-hit read to the candidate with the most unique-
    read coverage support within +-window; ties/zero support stay
    unassigned. Returns (assigned_locus (M,), assigned mask)."""
    cov = np.zeros(genome_len + 1, np.int64)
    for l, ln in zip(unique_loci, unique_lens):
        a = max(0, int(l))
        b = min(genome_len, int(l) + int(ln))
        if a < b:
            cov[a] += 1
            cov[b] -= 1
    cov = np.cumsum(cov)[:genome_len]
    cs = np.concatenate([[0], np.cumsum(cov)])

    M, K = multi_cand_loci.shape
    assigned = np.full(M, -1, np.int64)
    ok = np.zeros(M, bool)
    for m in range(M):
        scores = []
        for k in range(K):
            l = multi_cand_loci[m, k]
            if l < 0:
                scores.append(-1)
                continue
            a = max(0, int(l) - window)
            b = min(genome_len, int(l) + window)
            scores.append(int(cs[b] - cs[a]))
        s = np.array(scores)
        top = s.max()
        if top > 0 and (s == top).sum() == 1:
            assigned[m] = multi_cand_loci[m, int(s.argmax())]
            ok[m] = True
    return assigned, ok


def adaptive_trim(
    mism: np.ndarray,    # (L,) int mismatch indicators at the best locus
    L: int,
):
    """Find the best flank-trim window per the reference's AdaptiveTrim
    rules. Returns (start, end) of the accepted window or None."""
    cs = np.concatenate([[0], np.cumsum(mism[:L])])
    best = None
    # longest window first: scan window lengths descending
    for wl in range(L, C_MIN_AT_TRIMMED_LEN - 1, -1):
        allowed = (wl * C_MAX_AT_MM_PER100) // 100
        for s in range(0, L - wl + 1):
            mmw = cs[s + wl] - cs[s]
            if mmw > allowed:
                continue
            # at least one exact run >= 8 within the window
            run = best_run = 0
            for i in range(s, s + wl):
                run = run + 1 if mism[i] == 0 else 0
                best_run = max(best_run, run)
                if best_run >= C_MIN_AT_EXACT_LEN:
                    break
            if best_run >= C_MIN_AT_EXACT_LEN:
                best = (s, s + wl)
                break
        if best:
            break
    return best


def chimeric_pass(
    engine, reads: np.ndarray, lengths: np.ndarray, res: dict,
    min_chimeric_pct: int = 50,
):
    """Re-examine reads with no accepted hit: trim flanks at the best
    candidate locus; accept when the trimmed window meets AdaptiveTrim
    rules and covers >= min_chimeric_pct% of the read.

    Mutates `res`, adding soft-clip fields: res['clip5'], res['clip3'].
    """
    B, L = reads.shape
    res.setdefault("clip5", np.zeros(B, np.int32))
    res.setdefault("clip3", np.zeros(B, np.int32))
    # candidates existed (best_mm < 255) but the full-length alignment was
    # not accepted — exactly the chimeric situation (junk flank pushes the
    # whole-read mismatch count over budget)
    left = np.nonzero(~res["unique"] & (res["best_mm"] < 255))[0]
    if len(left) == 0:
        return res
    from ..seq.encode import revcomp

    genome = np.asarray(jax.device_get(engine.didx.genome))
    n = len(genome)
    for i in left:
        locus = int(res["locus"][i])
        if locus < 0 or locus + L > n:
            continue
        ln = int(lengths[i])
        seq = reads[i, :ln]
        if res["is_rc"][i]:
            seq = revcomp(seq)
        win = genome[locus : locus + ln]
        mism = ((win != seq) | (win >= 4) | (seq >= 4)).astype(np.int64)
        t = adaptive_trim(mism, ln)
        if t is None:
            continue
        s, e = t
        if (e - s) * 100 < min_chimeric_pct * ln:
            continue
        if (e - s) < C_MIN_AT_SEQ_LEN:
            continue
        res["unique"][i] = True
        res["locus"][i] = locus + s
        res["best_mm"][i] = int(mism[s:e].sum())
        res["clip5"][i] = s
        res["clip3"][i] = ln - e
    return res
