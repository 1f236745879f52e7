"""Suffix-prefix overlap detection between sequences (device-batched).

TPU re-design of the reference's packed-read overlap machinery
(CKangadna::GenRdsSfx sparse index + CdeNovoAssemb::BuildOverlapExtensions,
biokanga/Kangadna.cpp:6391, deNovoAssemb.cpp:939): instead of a sparse
suffix index over packed 15-base words walked per thread, the current
sequence set is indexed with the SAME bounded-suffix-array build used for
genomes, prefix k-mers of every sequence are range-looked-up in one
batch, and candidate suffix-prefix overlaps are verified with the packed
Hamming extension.  This is the "sorted-prefix join" plan of SURVEY §7.3.4.
"""
from __future__ import annotations

from dataclasses import dataclass

import jax
import jax.numpy as jnp
import numpy as np

from ..index.build import build_index
from ..index.device import to_device
from ..ops.extend_packed import hamming_extend_packed, pack_reads
from ..ops.lookup import pack_read_kmers, seed_range_lookup
from ..seq.encode import revcomp


@dataclass
class OverlapCandidates:
    """For each query sequence: candidate (target seq, target offset)
    pairs where the query PREFIX matches exactly for k bases."""
    qids: np.ndarray       # (M,) query index
    tids: np.ndarray       # (M,) target sequence index
    toffs: np.ndarray      # (M,) offset of match within target


def find_prefix_occurrences(
    seqs: list[np.ndarray],
    queries: np.ndarray,      # (Q, L) int8 padded
    qlens: np.ndarray,
    k: int = 16,
    max_occ: int = 32,
):
    """All occurrences of each query's first-k-bases within the seq set.

    Returns OverlapCandidates (exact k-seed matches; callers verify the
    full overlap). Uses the genome-index machinery over the concatenated
    sequence set.
    """
    idx = build_index([(str(i), s) for i, s in enumerate(seqs)],
                      lut_bases=min(8, k))
    didx = to_device(idx)
    Q, L = queries.shape
    qd = jnp.asarray(queries)
    qlh, qll, qhh, qhl, has_n = pack_read_kmers(qd, (0,), k)
    start, end = seed_range_lookup(
        didx.key_hi, didx.key_lo, didx.lut, didx.lut_bases,
        qlh, qll, qhh, qhl, core_len=k, max_steps=didx.max_bsearch_steps,
    )
    start = np.asarray(start)[:, 0]
    end = np.asarray(end)[:, 0]
    has_n = np.asarray(has_n)[:, 0]
    size = np.minimum(end - start, max_occ)
    size[has_n] = 0
    pos_sorted = np.asarray(jax.device_get(didx.pos_sorted))
    starts = idx.entry_starts

    qids, tids, toffs = [], [], []
    for q in range(Q):
        for j in range(size[q]):
            p = int(pos_sorted[start[q] + j])
            e = int(np.searchsorted(starts, p, side="right")) - 1
            qids.append(q)
            tids.append(e)
            toffs.append(p - int(starts[e]))
    return (
        OverlapCandidates(
            np.array(qids, np.int64), np.array(tids, np.int64),
            np.array(toffs, np.int64),
        ),
        idx,
    )


def verify_overlaps(
    seqs: list[np.ndarray],
    queries: np.ndarray,
    qlens: np.ndarray,
    cands: OverlapCandidates,
    min_overlap: int,
    max_subs_per_100: float = 1.0,
):
    """Check each candidate as a true suffix-prefix overlap:
    target[toff:] must match query[0 : tlen - toff] (i.e. the query
    extends the target to the right), overlap >= min_overlap, and the
    query must extend past the target end (proper dovetail).

    Returns arrays (qid, tid, overlap_len, subs) for accepted overlaps.
    """
    tlens = np.array([len(s) for s in seqs], np.int64)
    ov = tlens[cands.tids] - cands.toffs
    qmax = qlens[cands.qids]
    keep = (ov >= min_overlap) & (ov < qmax)  # dovetail: query extends right
    if not keep.any():
        return (np.zeros(0, np.int64),) * 4
    qid = cands.qids[keep]
    tid = cands.tids[keep]
    toff = cands.toffs[keep]
    ovl = ov[keep]

    # verify mismatches over the overlap via numpy (sets here are modest;
    # device verification kicks in through the aligner-style path when
    # read sets grow — assembly passes shrink the set each round)
    subs = np.zeros(len(qid), np.int64)
    okf = np.ones(len(qid), bool)
    for i in range(len(qid)):
        t = seqs[tid[i]]
        q = queries[qid[i]]
        o = int(ovl[i])
        a = t[int(toff[i]):]
        b = q[:o]
        s = int(np.sum((a != b) | (a >= 4) | (b >= 4)))
        subs[i] = s
        okf[i] = s <= max(0, int(o * max_subs_per_100 / 100.0))
    return qid[okf], tid[okf], ovl[okf], subs[okf]
