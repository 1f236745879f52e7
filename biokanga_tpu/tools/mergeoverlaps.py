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
