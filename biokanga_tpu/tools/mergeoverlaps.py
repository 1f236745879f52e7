"""PE short-insert overlap merging — capability match for
`biokanga mergeoverlaps` (CMergeReadPairs, biokanga/MergeReadPairs.cpp:
MergeOverlaps :1002, ProcOverlapPairs :1157).

The overlap scan is a batched device computation: for every pair and every
candidate overlap length, mismatches between the 5' read's 3' tail and the
revcomp'd 3' read's 5' head are counted at once (one (B, OV) reduction on
the VPU) — the vectorised form of the reference's per-pair sliding scan.
"""
from __future__ import annotations

from dataclasses import dataclass
from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

from ..seq.encode import revcomp
from ..seq.fasta import read_blocks, write_fasta, write_fastq


@dataclass(frozen=True)
class MergeParams:
    min_overlap: int = 16        # reference allows down to 1 (-l)
    max_subs_pcnt: float = 5.0   # max subs as % of overlap length


@partial(jax.jit, static_argnames=("L",))
def _overlap_mm(r1: jax.Array, rc2: jax.Array, L: int):
    """Mismatch counts for every overlap length ov in [1, L]:
    overlap ov aligns r1[L-ov:] with rc2[:ov].
    Returns (B, L) mm counts; index ov-1 = overlap of length ov."""
    B = r1.shape[0]
    mm = jnp.zeros((B, L), dtype=jnp.int32)
    for ov in range(1, L + 1):
        a = r1[:, L - ov :]
        b = rc2[:, :ov]
        c = jnp.sum((a != b) | (a >= 4) | (b >= 4), axis=1, dtype=jnp.int32)
        mm = mm.at[:, ov - 1].set(c)
    return mm


def merge_pairs_arrays(r1: np.ndarray, r2: np.ndarray, p: MergeParams):
    """r1, r2: (B, L) int8 (uniform length). Returns (merged list of int8
    arrays or None per pair, best overlap lengths, mm counts)."""
    B, L = r1.shape
    rc2 = np.stack([revcomp(x) for x in r2])
    mm = np.asarray(_overlap_mm(jnp.asarray(r1), jnp.asarray(rc2), L))
    ovs = np.arange(1, L + 1)
    allowed = np.floor(ovs * p.max_subs_pcnt / 100.0).astype(np.int32)
    ok = (mm <= allowed[None, :]) & (ovs[None, :] >= p.min_overlap)
    # prefer the LONGEST acceptable overlap (reference takes best-scoring;
    # longest-with-subs-in-budget is its dominant outcome)
    best_ov = np.where(ok.any(axis=1), L - np.argmax(ok[:, ::-1], axis=1), 0)
    merged = []
    for i in range(B):
        ov = int(best_ov[i])
        if ov == 0:
            merged.append(None)
        else:
            # merged length = 2L - ov; take r1 then the unoverlapped rc2 tail
            merged.append(np.concatenate([r1[i], rc2[i, ov:]]))
    return merged, best_ov, mm


# ------------------------- amplicon MID-barcode demux ---------------------
# default plate barcodes (MergeReadPairs.cpp:33-57): 12 column (5') + 8 row
# (3') 6-mers identifying 96 wells; well = col + (row-1)*12 when the column
# barcode is at the 5' end, else row + (col-1)*12 (MapSEBarcodesToWell,
# MergeReadPairs.cpp:420-490)
_COL_BARCODES = ["AACCAA", "ACCCCC", "AGCCGG", "ATCCTT", "AAGGAA",
                 "ACGGCC", "AGGGGG", "ATGGTT", "AATTAA", "ACTTCC",
                 "AGTTGG", "ATTTTT"]
_ROW_BARCODES = ["TAATAA", "TCATCC", "TGATGG", "TTATTT", "TATAAA",
                 "TCTACC", "TGTAGG", "TTTATT"]
_B2C = {"A": 0, "C": 1, "G": 2, "T": 3}


def _codes(s: str) -> np.ndarray:
    return np.array([_B2C[c] for c in s], np.int8)


@dataclass
class PlateBarcodes:
    """The reference's hardcoded 96-well column/row barcode table."""

    cols: list = None
    rows: list = None

    def __post_init__(self):
        if self.cols is None:
            self.cols = [_codes(s) for s in _COL_BARCODES]
        if self.rows is None:
            self.rows = [_codes(s) for s in _ROW_BARCODES]
        self.blen = len(self.cols[0])

    def map_se(self, seq: np.ndarray) -> int:
        """Well 1..96 from the 5' and 3' barcodes of a merged amplicon;
        0 when unidentifiable (MapSEBarcodesToWell semantics: 3' barcode
        appears reverse-complemented)."""
        k = self.blen
        if len(seq) < 2 * k or (seq[:k] >= 4).any() or (seq[-k:] >= 4).any():
            return 0
        p5 = seq[:k]
        p3 = seq[-k:]
        col5 = next((i + 1 for i, b in enumerate(self.cols)
                     if np.array_equal(p5, b)), 0)
        row3 = next((i + 1 for i, b in enumerate(self.rows)
                     if np.array_equal(p3, revcomp(b))), 0)
        if col5 and row3:
            return col5 + (row3 - 1) * 12
        row5 = next((i + 1 for i, b in enumerate(self.rows)
                     if np.array_equal(p5, b)), 0)
        col3 = next((i + 1 for i, b in enumerate(self.cols)
                     if np.array_equal(p3, revcomp(b))), 0)
        if row5 and col3:
            return col3 + (row5 - 1) * 12
        return 0

    def map_pe(self, s1: np.ndarray, s2: np.ndarray) -> int:
        """Well from the 5' barcodes of PE1 and PE2 (MapPEBarcodesToWell,
        MergeReadPairs.cpp:492-556: both barcodes read sense at the reads'
        5' ends)."""
        k = self.blen
        if len(s1) < k or len(s2) < k:
            return 0
        if (s1[:k] >= 4).any() or (s2[:k] >= 4).any():
            return 0
        p5, p3 = s1[:k], s2[:k]
        col5 = next((i + 1 for i, b in enumerate(self.cols)
                     if np.array_equal(p5, b)), 0)
        row3 = next((i + 1 for i, b in enumerate(self.rows)
                     if np.array_equal(p3, b)), 0)
        if col5 and row3:
            return col5 + (row3 - 1) * 12
        row5 = next((i + 1 for i, b in enumerate(self.rows)
                     if np.array_equal(p5, b)), 0)
        col3 = next((i + 1 for i, b in enumerate(self.cols)
                     if np.array_equal(p3, b)), 0)
        if row5 and col3:
            return col3 + (row5 - 1) * 12
        return 0


def merge_amplicons(
    in1: str, in2: str, out_prefix: str,
    params: MergeParams | None = None,
    no_merge: bool = False,
    barcodes: PlateBarcodes | None = None,
    fmt: str = "fastq",
):
    """Amplicon modes (ePMAmplicon / ePMAmpliconNoMerge,
    MergeReadPairs.h:14-17): identify the originating plate well from the
    5'/3' MID barcodes, trim the barcodes, and write per-well files
    `prefix.WellN.SE.fastq` (merged) or `prefix.WellN.PE1/PE2.fastq`
    (no-merge).  Returns (n_pairs, n_welled, per-well counts)."""
    p = params or MergeParams()
    bc = barcodes or PlateBarcodes()
    k = bc.blen
    wells: dict[int, list] = {}
    n_pairs = n_welled = 0
    for blk1, blk2 in zip(
        read_blocks(in1, block_size=8192), read_blocks(in2, block_size=8192)
    ):
        L = max(blk1.codes.shape[1], blk2.codes.shape[1])

        def padto(c):
            if c.shape[1] == L:
                return c
            out = np.full((c.shape[0], L), 4, dtype=np.int8)
            out[:, : c.shape[1]] = c
            return out

        if not no_merge:
            merged, best_ov, _ = merge_pairs_arrays(
                padto(blk1.codes), padto(blk2.codes), p
            )
        for i in range(len(blk1.names)):
            n_pairs += 1
            s1 = blk1.codes[i, : blk1.lengths[i]]
            s2 = blk2.codes[i, : blk2.lengths[i]]
            if no_merge:
                well = bc.map_pe(s1, s2)
                if well == 0:
                    continue
                n_welled += 1
                wells.setdefault(well, []).append(
                    (blk1.names[i], s1[k:], s2[k:])
                )
            else:
                m = merged[i]
                if m is None:
                    continue
                well = bc.map_se(m)
                if well == 0:
                    continue
                n_welled += 1
                wells.setdefault(well, []).append(
                    (blk1.names[i], m[k:-k], None)
                )
    counts = {}
    for well, recs in sorted(wells.items()):
        counts[well] = len(recs)
        if no_merge:
            write_fastq(f"{out_prefix}.Well{well}.PE1.{fmt}",
                        ((n, a, None) for n, a, _ in recs))
            write_fastq(f"{out_prefix}.Well{well}.PE2.{fmt}",
                        ((n, b, None) for n, _, b in recs))
        else:
            path = f"{out_prefix}.Well{well}.SE.{fmt}"
            if fmt == "fasta":
                write_fasta(path, ((n, a) for n, a, _ in recs))
            else:
                write_fastq(path, ((n, a, None) for n, a, _ in recs))
    return n_pairs, n_welled, counts


def merge_overlaps(
    in1: str, in2: str, out_merged: str,
    params: MergeParams | None = None,
    out_unmerged1: str | None = None,
    out_unmerged2: str | None = None,
):
    p = params or MergeParams()
    n_pairs = n_merged = 0
    merged_recs = []
    un1, un2 = [], []
    for blk1, blk2 in zip(
        read_blocks(in1, block_size=8192), read_blocks(in2, block_size=8192)
    ):
        L = max(blk1.codes.shape[1], blk2.codes.shape[1])

        def padto(c):
            if c.shape[1] == L:
                return c
            out = np.full((c.shape[0], L), 4, dtype=np.int8)
            out[:, : c.shape[1]] = c
            return out

        merged, best_ov, _ = merge_pairs_arrays(
            padto(blk1.codes), padto(blk2.codes), p
        )
        for i, m in enumerate(merged):
            n_pairs += 1
            if m is not None:
                n_merged += 1
                merged_recs.append((blk1.names[i], m))
            else:
                un1.append((blk1.names[i], blk1.codes[i, : blk1.lengths[i]], None))
                un2.append((blk2.names[i], blk2.codes[i, : blk2.lengths[i]], None))
    if out_merged.endswith((".fastq", ".fq")):
        write_fastq(out_merged, ((n, c, None) for n, c in merged_recs))
    else:
        write_fasta(out_merged, merged_recs)
    if out_unmerged1:
        write_fastq(out_unmerged1, un1)
    if out_unmerged2:
        write_fastq(out_unmerged2, un2)
    return n_pairs, n_merged
