"""The aligner pipeline: seed -> candidates -> Hamming extend -> accept.

TPU-first re-expression of CAligner::LocateCoredApprox / ProcCoredApprox /
CSfxArrayV3::AlignReads (biokanga/Aligner.cpp:8651,8943;
libbiokanga/SfxArrayV2.cpp:7663): instead of worker threads pulling
4096-read blocks and chasing one candidate at a time, whole read batches
flow through dense, jit-compiled stages:

  1. pack core k-mers at the reference's slide offsets (both strands)
  2. batched SA range lookup per core (ops/lookup.py)
  3. gather up to H candidate loci per core, diagonal-dedup per read
  4. Hamming-extend all candidates at once (ops/extend.py)
  5. order-independent best/next-best reduction with the reference's
     MMDelta margin acceptance

Candidate caps (H) replace the reference's per-core iteration cap
(MaxIter=50000, SfxArrayV2.h:12); reads whose cores overflowed H without
producing an accepted hit are re-run through a wider "rescue" pass,
mirroring the reference's progressive-sensitivity driver.
"""
from __future__ import annotations

from dataclasses import dataclass
from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

from ..index.device import DeviceIndex
from ..ops.extend import MM_INVALID, best_hit_reduce, hamming_extend
from ..ops.lookup import pack_read_kmers, seed_range_lookup
from .params import AlignParams, DerivedParams

_I32_MAX = np.int32(2**31 - 1)


def _rc_reads(reads: jax.Array, lengths: jax.Array) -> jax.Array:
    """Per-read reverse complement keeping padding at the tail."""
    L = reads.shape[1]
    flipped = reads[:, ::-1]
    rc = jnp.where(flipped >= 4, flipped, 3 - flipped).astype(reads.dtype)
    # rc currently has (L - len) pad codes at the front; roll left per read
    col = (jnp.arange(L, dtype=jnp.int32)[None, :] + (L - lengths)[:, None]) % L
    return jnp.take_along_axis(rc, col, axis=1)


def _strand_candidates(didx_arrays, seq, dp: DerivedParams, H: int):
    """Candidate loci for one strand: (B, S*H) loci + validity."""
    key_hi, key_lo, lut, pos_sorted, lut_bases = didx_arrays
    n = pos_sorted.shape[0]
    S = len(dp.offsets)
    qlh, qll, qhh, qhl, has_n = pack_read_kmers(seq, dp.offsets, dp.core_len)
    start, end = seed_range_lookup(key_hi, key_lo, lut, lut_bases, qlh, qll, qhh, qhl)
    size = end - start
    overflow = size > H
    j = jnp.arange(H, dtype=jnp.int32)
    idx = start[..., None] + j  # (B, S, H)
    in_range = j[None, None, :] < jnp.minimum(size, H)[..., None]
    pos = pos_sorted[jnp.clip(idx, 0, n - 1)]
    offs = jnp.asarray(dp.offsets, dtype=jnp.int32)
    diag = pos - offs[None, :, None]
    valid = in_range & (~has_n[..., None]) & (diag >= 0)

    B = seq.shape[0]
    flat = jnp.where(valid, diag, _I32_MAX).reshape(B, S * H)
    # diagonal dedup: identical loci discovered via different cores are one
    # alignment (the reference dedups via its per-thread tsIdentNode hash,
    # SfxArrayV2.h:15-16); sort + neighbour-mask is the batched equivalent
    srt = jax.lax.sort(flat, dimension=1)
    dup = jnp.concatenate(
        [jnp.zeros((B, 1), dtype=bool), srt[:, 1:] == srt[:, :-1]], axis=1
    )
    v = (srt != _I32_MAX) & (~dup)
    return srt, v, jnp.any(overflow, axis=1)


class AlignEngine:
    """Compiles and runs the batch alignment for one DeviceIndex."""

    def __init__(self, didx: DeviceIndex, params: AlignParams | None = None):
        self.didx = didx
        self.params = params or AlignParams()
        self._jitted = {}

    def _fn(self, dp: DerivedParams, H: int, strand: str):
        key = (dp, H, strand)
        if key in self._jitted:
            return self._jitted[key]
        didx = self.didx
        lut_bases = didx.lut_bases
        ap = self.params

        def run(genome, entry_starts, pos_sorted, key_hi, key_lo, lut,
                reads, lengths):
            arrays = (key_hi, key_lo, lut, pos_sorted, lut_bases)
            # per-read mismatch budget from ACTUAL read length — the
            # reference computes MaxTotMM per read (Aligner.cpp:9084-9090)
            if ap.max_subs_per100 == 0:
                max_tot_mm = jnp.zeros_like(lengths)
            else:
                max_tot_mm = jnp.clip(
                    jnp.floor(
                        lengths * (ap.max_subs_per100 / 100.0) + 0.5
                    ).astype(jnp.int32),
                    1,
                    63,
                )
            strands = []
            if strand in ("both", "sense"):
                strands.append((reads, False))
            if strand in ("both", "antisense"):
                strands.append((_rc_reads(reads, lengths), True))

            loci_parts, valid_parts, mm_parts, ovf = [], [], [], None
            for seq, is_rc in strands:
                loci, vmask, o = _strand_candidates(arrays, seq, dp, H)
                mm = hamming_extend(genome, entry_starts, loci, vmask, seq, lengths)
                loci_parts.append(loci)
                valid_parts.append(vmask)
                mm_parts.append(mm)
                ovf = o if ovf is None else (ovf | o)

            loci_all = jnp.concatenate(loci_parts, axis=1)
            mm_all = jnp.concatenate(mm_parts, axis=1)
            C1 = loci_parts[0].shape[1]

            red = best_hit_reduce(
                mm_all,
                max_tot_mm,
                jnp.int32(ap.min_edit_dist),
            )
            bi = red["best_idx"]
            locus = jnp.take_along_axis(loci_all, bi[:, None], axis=1)[:, 0]
            if strand == "both":
                is_rc_hit = bi >= C1
            elif strand == "antisense":
                is_rc_hit = jnp.ones_like(bi, dtype=bool)
            else:
                is_rc_hit = jnp.zeros_like(bi, dtype=bool)
            return {
                "unique": red["unique"],
                "any_hit": red["any_hit"],
                "best_mm": red["best"],
                "inst": red["inst"],
                "locus": locus,
                "is_rc": is_rc_hit,
                "overflow": ovf,
            }

        jitted = jax.jit(run)
        self._jitted[key] = jitted
        return jitted

    def align_batch(self, reads: np.ndarray, lengths: np.ndarray, H=None):
        """reads: (B, L) int8 host array. Returns host-side result dict."""
        B, L = reads.shape
        dp = self.params.derive(int(L), self.didx.total_len)
        H = int(H or self.params.cand_per_core)
        fn = self._fn(dp, H, self.params.strand)
        d = self.didx
        out = fn(
            d.genome, d.entry_starts, d.pos_sorted, d.key_hi, d.key_lo, d.lut,
            jnp.asarray(reads), jnp.asarray(lengths),
        )
        res = {k: np.asarray(v) for k, v in jax.device_get(out).items()}
        res["derived"] = dp
        return res

    def align_with_rescue(self, reads: np.ndarray, lengths: np.ndarray):
        """Primary pass + wider rescue pass for overflowed, unaccepted reads
        (the batched analogue of the reference's progressive sensitivity in
        CSfxArrayV3::AlignReads, SfxArrayV2.cpp:7663-7760)."""
        res = self.align_batch(reads, lengths)
        need = (~res["unique"]) & res["overflow"]
        if need.any():
            rows = np.nonzero(need)[0]
            Hr = self.params.rescue_cand_per_core
            # pad subset to a power-of-two bucket so recompiles are bounded
            sub_r, sub_l = pad_rows(reads[rows], lengths[rows])
            sub = self.align_batch(sub_r, sub_l, H=Hr)
            k_n = len(rows)
            for k in ("unique", "any_hit", "best_mm", "inst", "locus", "is_rc"):
                res[k][rows] = sub[k][:k_n]
        return res


def pad_rows(reads: np.ndarray, lengths: np.ndarray, target: int | None = None):
    """Pad a read block to a power-of-two row count (min 64) with N-filled
    rows of length 0, so jit shapes come from a small bucket set."""
    B = reads.shape[0]
    if target is None:
        target = 64
        while target < B:
            target *= 2
    if B == target:
        return reads, lengths
    pr = np.full((target, reads.shape[1]), 4, dtype=reads.dtype)
    pr[:B] = reads
    pl = np.zeros(target, dtype=lengths.dtype)
    pl[:B] = lengths
    return pr, pl
