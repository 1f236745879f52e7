"""Long-read alignment through the main engine: segment + stitch.

Capability match for the reference's 256 Kbp read envelope
(cMaxReadLen, libbiokanga/commdefs.h:158-161): CAligner handles long
reads with the same sliding-core search, scanning cores across the whole
read; the packed TPU extension kernel caps one gather window at
MAX_PACKED_READ_LEN (4096 bp, ops/extend_packed.py), so longer reads are
aligned as SEGMENTS through the unmodified engine and stitched on the
diagonal — the Hamming model (no indels) means every segment of a true
alignment lands on ONE diagonal (locus - segment_offset), exactly the
reference's per-read acceptance domain (mismatch-only,
SfxArrayV2.cpp:5693+ extension).

Acceptance reproduces the reference budget: MaxTotMM = min(63,
subs_per_100bp-scaled) — the 63-sub cap applies to ANY read length
(cMaxTotAllowedSubs, biokanga/Aligner.h:23, Aligner.cpp:9084-9090), so a
100 Kbp read is accepted only within 63 total substitutions, same as the
reference.

Strand is handled at the long-read level (segments of the read vs
segments of its revcomp), because a reverse hit maps segment s of rc(R),
not rc of segment s.
"""
from __future__ import annotations

from dataclasses import replace

import numpy as np

from ..ops.extend_packed import pack_reads
from .params import AlignParams
from .pipeline import AlignEngine, pad_rows

SEG_LEN = 1024
MIN_SEG = 64          # ignore ragged tails shorter than this


def _segment(reads: np.ndarray, lengths: np.ndarray, seg: int):
    """(B, L) -> (B*S, seg) row-major segments + per-segment lengths."""
    B, L = reads.shape
    S = -(-L // seg)
    padL = S * seg
    m = np.full((B, padL), 4, reads.dtype)
    m[:, :L] = reads
    segs = m.reshape(B * S, seg)
    offs = np.tile(np.arange(S, dtype=np.int64) * seg, B)
    seg_len = np.clip(lengths.astype(np.int64)[:, None]
                      - np.arange(S, dtype=np.int64)[None, :] * seg,
                      0, seg).reshape(-1)
    return segs, seg_len.astype(np.int32), offs, S


class LongReadAligner:
    """Aligns reads of any length (up to the reference's 256 Kbp
    envelope) against an AlignEngine's index."""

    def __init__(self, engine: AlignEngine, seg: int = SEG_LEN):
        self.didx = engine.didx
        self.seg = seg
        base = engine.params
        self._eng = {
            s: AlignEngine(engine.didx, replace(base, strand=s))
            for s in ("sense",)
        }
        self.params = base

    def _align_segments(self, segs, seg_lens):
        eng = self._eng["sense"]
        out = []
        B = 4096
        for i in range(0, len(segs), B):
            r, l = pad_rows(segs[i : i + B], seg_lens[i : i + B])
            out.append(eng.align_with_rescue(r, l))
        return {k: np.concatenate([o[k] for o in out])[: len(segs)]
                for k in ("unique", "best_mm", "locus", "any_hit")}

    def _verify_at(self, segs, seg_lens, loci):
        """Mismatch count of each segment at a FIXED locus (one packed
        gather per segment)."""
        import jax.numpy as jnp

        from ..ops.extend_packed import hamming_extend_packed

        pg = self.didx.packed
        rcodes, rnlane = pack_reads(jnp.asarray(segs),
                                    jnp.asarray(seg_lens))
        mm = hamming_extend_packed(
            pg, self.didx.entry_starts,
            jnp.asarray(loci.astype(np.int32))[:, None],
            jnp.ones((len(segs), 1), bool), rcodes, rnlane,
            jnp.asarray(seg_lens),
        )
        return np.asarray(mm)[:, 0].astype(np.int64)

    def align(self, reads: np.ndarray, lengths: np.ndarray) -> dict:
        """Returns per-read dict: unique, locus, is_rc, best_mm."""
        from ..seq.encode import revcomp

        B, L = reads.shape
        if self.params.max_subs_per100 == 0:
            budget = np.zeros(B, np.int64)
        else:
            budget = np.minimum(
                np.floor(lengths * self.params.max_subs_per100 / 100.0
                         + 0.5).astype(np.int64),
                63,
            )

        out = {
            "unique": np.zeros(B, bool),
            "locus": np.full(B, -1, np.int64),
            "is_rc": np.zeros(B, bool),
            "best_mm": np.full(B, 1 << 30, np.int64),
        }
        for is_rc in (False, True):
            if is_rc:
                cur = np.full_like(reads, 4)
                for i in range(B):
                    Lr = int(lengths[i])
                    cur[i, :Lr] = revcomp(reads[i, :Lr])
            else:
                cur = reads
            segs, seg_lens, offs, S = _segment(cur, lengths, self.seg)
            res = self._align_segments(segs, seg_lens)
            valid = (seg_lens >= MIN_SEG)
            diag = np.where(res["unique"] & valid,
                            res["locus"].astype(np.int64) - offs, -1)
            diag_m = diag.reshape(B, S)
            for b in range(B):
                d = diag_m[b][diag_m[b] >= 0]
                nv = int(valid.reshape(B, S)[b].sum())
                if len(d) == 0 or nv == 0:
                    continue
                vals, cnts = np.unique(d, return_counts=True)
                d_star = int(vals[np.argmax(cnts)])
                votes = int(cnts.max())
                if votes * 2 < nv:      # no majority diagonal
                    continue
                rows = np.arange(b * S, (b + 1) * S)
                rows = rows[valid[rows]]
                mm = self._verify_at(segs[rows], seg_lens[rows],
                                     d_star + offs[rows])
                total = int(mm.sum())
                if total <= budget[b] and total < out["best_mm"][b]:
                    out["unique"][b] = True
                    out["locus"][b] = d_star
                    out["is_rc"][b] = is_rc
                    out["best_mm"][b] = total
        out["best_mm"][~out["unique"]] = -1
        return out
