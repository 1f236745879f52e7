"""Paired-end pairing + orphan rescue.

Capability match for CAligner::ProcessPairedEnds (biokanga/Aligner.cpp:
2876,3055) and CSfxArrayV3::AlignPairedRead orphan rescue
(libbiokanga/SfxArrayV2.cpp:8247).  Defaults mirror the reference CLI:
insert size 100..1000 (cDfltPairMinLen/cDfltPairMaxLen, Aligner.h:71-72),
FR orientation unless pair_same_strand.

Design: both mates run through the SE engine; pairing classification is a
vectorised pass; orphan rescue re-extends the unanchored mate against the
anchor's insert window using the SAME packed Hamming extension kernel
(candidate loci = every offset in the window) — the windowed scan the
reference does byte-wise, done as one batched device call.
"""
from __future__ import annotations

from dataclasses import dataclass

import jax
import jax.numpy as jnp
import numpy as np

from ..ops.extend_packed import MM_INVALID, hamming_extend_packed, pack_reads
from .pipeline import AlignEngine

C_DFLT_PAIR_MIN_LEN = 100   # Aligner.h:71
C_DFLT_PAIR_MAX_LEN = 1000  # Aligner.h:72


@dataclass(frozen=True)
class PEParams:
    pair_min_len: int = C_DFLT_PAIR_MIN_LEN
    pair_max_len: int = C_DFLT_PAIR_MAX_LEN
    pair_same_strand: bool = False  # -E: accept mates on the same strand
    rescue: bool = True


def _insert_len(loc1, len1, rc1, loc2, len2):
    """Observed insert = span from leftmost start to rightmost end."""
    lo = np.minimum(loc1, loc2)
    hi = np.maximum(loc1 + len1, loc2 + len2)
    return hi - lo


def classify_pairs(
    res1: dict, res2: dict,
    len1: np.ndarray, len2: np.ndarray,
    entry_starts: np.ndarray,
    pe: PEParams,
):
    """Vectorised pair classification over per-mate SE results.

    Returns dict with:
      proper   (N,) bool — both unique, orientation + insert accepted
      orphan1  (N,) bool — mate1 unique anchor, mate2 unaccepted
      orphan2  (N,) bool — mate2 unique anchor, mate1 unaccepted
    """
    u1, u2 = res1["unique"], res2["unique"]
    loc1, loc2 = res1["locus"], res2["locus"]
    rc1, rc2 = res1["is_rc"], res2["is_rc"]

    ent1 = np.searchsorted(entry_starts, loc1, side="right") - 1
    ent2 = np.searchsorted(entry_starts, loc2, side="right") - 1
    same_chrom = ent1 == ent2

    if pe.pair_same_strand:
        orient_ok = rc1 == rc2
    else:
        # FR: mates on opposite strands, forward mate upstream
        fwd_first = (~rc1) & rc2 & (loc1 <= loc2)
        rev_first = rc1 & (~rc2) & (loc2 <= loc1)
        orient_ok = fwd_first | rev_first

    ins = _insert_len(loc1, len1, rc1, loc2, len2)
    ins_ok = (ins >= pe.pair_min_len) & (ins <= pe.pair_max_len)

    proper = u1 & u2 & same_chrom & orient_ok & ins_ok
    orphan1 = u1 & (~u2)
    orphan2 = u2 & (~u1)
    return {
        "proper": proper,
        "orphan1": orphan1,
        "orphan2": orphan2,
        "insert": ins,
    }


class PEAligner:
    """Runs both mates through an AlignEngine and pairs the results."""

    def __init__(self, engine: AlignEngine, pe: PEParams | None = None):
        self.engine = engine
        self.pe = pe or PEParams()
        self._rescue_jit = {}

    def _rescue_fn(self, Wlen: int, L: int):
        """Jitted windowed rescue: extend a mate against every locus in a
        fixed-width window. Wlen = window width in loci.

        The packed-genome arrays are jit ARGUMENTS (not closure
        constants): closed-over device arrays ship inside the compiled
        program (fatal through a slow remote-compile link at chunk sizes)
        and would silently pin the didx the fn was first built against —
        chunked drivers swap engine.didx between chunks."""
        key = (Wlen, L, self.engine.didx.packed.length,
               self.engine.didx.packed.has_n)
        if key in self._rescue_jit:
            return self._rescue_jit[key]
        pk_len = self.engine.didx.packed.length
        pk_has_n = self.engine.didx.packed.has_n

        def run(pk_rows, pk_nrows, entry_starts, win_start, reads,
                lengths, max_tot_mm):
            from ..ops.extend_packed import PackedGenome

            packed = PackedGenome(
                rows=pk_rows, n_rows=pk_nrows if pk_has_n else None,
                length=pk_len)
            # candidates: every offset in [win_start, win_start + Wlen)
            B = reads.shape[0]
            loci = win_start[:, None] + jnp.arange(Wlen, dtype=jnp.int32)
            valid = jnp.ones((B, Wlen), dtype=bool)
            rcodes, rnlane = pack_reads(reads, lengths)
            mm = hamming_extend_packed(
                packed, entry_starts, loci, valid, rcodes, rnlane, lengths
            ).astype(jnp.int32)
            best = jnp.min(mm, axis=1)
            bi = jnp.argmin(mm, axis=1).astype(jnp.int32)
            inst = jnp.sum(mm == best[:, None], axis=1, dtype=jnp.int32)
            locus = win_start + bi
            ok = (best <= max_tot_mm) & (inst == 1)
            return {"ok": ok, "locus": locus, "mm": best}

        inner = jax.jit(run)

        def call(win_start, reads, lengths, max_tot_mm):
            didx = self.engine.didx
            pk = didx.packed
            assert pk.length == pk_len and pk.has_n == pk_has_n
            return inner(pk.rows, pk.n_rows if pk_has_n else pk.rows,
                         didx.entry_starts, win_start, reads, lengths,
                         max_tot_mm)

        self._rescue_jit[key] = call
        return call

    def rescue(self, anchor_loc, anchor_rc, anchor_len, mate_reads,
               mate_lengths, mate_is_rc_of_input: bool):
        """Rescue unanchored mates within the anchor's insert window.

        The mate is searched on the strand opposite the anchor (FR), i.e.
        we extend either the mate as given or its revcomp; the caller
        passes the correctly-oriented sequence in mate_reads.
        Window: if anchor is forward, mate must start within
        [anchor, anchor + pair_max_len - mate_len]; if anchor is reverse,
        within [anchor_end - pair_max_len, anchor_end - mate_len].
        """
        pe = self.pe
        B, L = mate_reads.shape
        Wlen = pe.pair_max_len - int(mate_lengths.min())
        Wlen = max(8, Wlen)
        fwd = ~anchor_rc
        win_start = np.where(
            fwd,
            anchor_loc,
            anchor_loc + anchor_len - pe.pair_max_len,
        ).astype(np.int32)
        ap = self.engine.params
        if ap.max_subs_per100 == 0:
            mtm = np.zeros(B, np.int32)
        else:
            mtm = np.clip(
                np.floor(mate_lengths * ap.max_subs_per100 / 100.0 + 0.5),
                1, 63,
            ).astype(np.int32)
        fn = self._rescue_fn(Wlen, L)
        out = fn(
            jnp.asarray(win_start), jnp.asarray(mate_reads),
            jnp.asarray(mate_lengths), jnp.asarray(mtm),
        )
        return {k: np.asarray(v) for k, v in jax.device_get(out).items()}

    def launch_pairs(self, reads1, len1, reads2, len2):
        """Dispatch the fused 2N-row primary align asynchronously; pair
        with finish_pairs.  Lets a driver keep one PE batch in flight
        while classifying/rescuing the previous one (the PE analogue of
        AlignEngine.align_stream double buffering)."""
        eng = self.engine
        state = eng.launch_primary(np.concatenate([reads1, reads2]),
                                   np.concatenate([len1, len2]))
        return (state, reads1, len1, reads2, len2)

    def finish_pairs(self, pending):
        """Resolve a launch_pairs handle: two-level completion + overflow
        rescue + pairing + orphan rescue (host side)."""
        state, reads1, len1, reads2, len2 = pending
        res = self.engine.finish_primary(state)
        N = len(reads1)
        res1 = {k: (v[:N] if hasattr(v, "__len__") else v)
                for k, v in res.items()}
        res2 = {k: (v[N:] if hasattr(v, "__len__") else v)
                for k, v in res.items()}
        return self._pair_and_rescue(res1, res2, reads1, len1, reads2,
                                     len2)

    def align_pairs(self, reads1, len1, reads2, len2):
        """Full PE path. reads*: (N, L) int8. Returns a result dict with
        per-pair fields; loci for rescued mates filled in.

        Both mates run as ONE fused dispatch (the SE engine sees a 2N-row
        batch) — half the dispatch count of per-mate calls."""
        eng = self.engine
        if reads1.shape == reads2.shape:
            both = eng.align_with_rescue(
                np.concatenate([reads1, reads2]),
                np.concatenate([len1, len2]),
            )
            N = len(reads1)
            res1 = {k: (v[:N] if hasattr(v, "__len__") else v)
                    for k, v in both.items()}
            res2 = {k: (v[N:] if hasattr(v, "__len__") else v)
                    for k, v in both.items()}
            res1["derived"] = res2["derived"] = both.get("derived")
        else:
            res1 = eng.align_with_rescue(reads1, len1)
            res2 = eng.align_with_rescue(reads2, len2)
        return self._pair_and_rescue(res1, res2, reads1, len1, reads2,
                                     len2)

    def _pair_and_rescue(self, res1, res2, reads1, len1, reads2, len2):
        eng = self.engine
        starts = np.asarray(jax.device_get(eng.didx.entry_starts))
        cls = classify_pairs(res1, res2, len1, len2, starts, self.pe)

        if self.pe.rescue:
            from ..seq.encode import revcomp

            for which, (anch, mate_reads, mate_len, mres) in {
                1: (res1, reads2, len2, res2),
                2: (res2, reads1, len1, res1),
            }.items():
                orph = cls[f"orphan{which}"]
                rows = np.nonzero(orph)[0]
                if len(rows) == 0:
                    continue
                a_loc = anch["locus"][rows]
                a_rc = anch["is_rc"][rows]
                a_len = (len1 if which == 1 else len2)[rows]
                # FR: mate aligns on strand opposite the anchor; orient the
                # mate sequence so a forward window scan matches it
                m = mate_reads[rows].copy()
                ml = mate_len[rows]
                for i, r in enumerate(rows):
                    if not a_rc[i]:
                        # anchor forward => mate hits reverse strand: scan rc
                        m[i, : ml[i]] = revcomp(mate_reads[r, : ml[i]])
                out = self.rescue(a_loc, a_rc, a_len, m, ml, False)
                ok = out["ok"]
                # write back: rescued mate becomes an accepted hit
                mres["unique"][rows[ok]] = True
                mres["locus"][rows[ok]] = out["locus"][ok]
                mres["is_rc"][rows[ok]] = ~a_rc[ok]
                mres["best_mm"][rows[ok]] = out["mm"][ok]
            # reclassify with rescued mates
            cls = classify_pairs(res1, res2, len1, len2, starts, self.pe)

        return {"res1": res1, "res2": res2, **cls}
