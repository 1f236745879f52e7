"""PacBio long-read error correction (`pacbiokanga ecreads` parity).

Capability match for CPBErrCorrect (pacbiokanga/PBErrCorrect.cpp:
Process :2526, ProcPacBioErrCorrect :1268): reads are loaded into an
in-memory index; per probe read, seed cores locate candidate overlapping
reads (IteratePacBio role, SfxArrayV2.cpp:3779 — with the
min-seed-votes-per-extension rule, cPacBioMinKmersExtn SfxArrayV2.h:46),
candidates are Smith-Waterman aligned (ops/sw.py banded kernel replacing
CSSW::Align, SSW.cpp:992), accepted overlaps stack into a column
multialignment and a majority consensus corrects the probe
(CSSW::GenConsensusFromMAF role, SSW.cpp:2115; CMAConsensus role).

The reference distributes SW jobs over its BKS TCP service; here the SW
batch is a single device call, and the multi-chip variant shards the
job batch over the mesh 'dp' axis (parallel/swservice.py).
"""
from __future__ import annotations

from collections import defaultdict
from dataclasses import dataclass

import jax.numpy as jnp
import numpy as np

from ..index.build import build_index
from ..index.device import to_device
from ..ops.lookup import pack_read_kmers, seed_range_lookup
from ..ops.sw import banded_sw_batch, traceback
from ..seq.encode import revcomp


@dataclass(frozen=True)
class ECParams:
    seed_len: int = 12            # short cores for noisy reads
    seed_stride: int = 4
    min_seed_votes: int = 8       # seeds agreeing on a diagonal band
    diag_band: int = 64           # diagonal clustering granularity
    sw_band: int = 96             # SW band half-width
    min_overlap_score: int = 60
    min_cov_for_call: int = 2     # column votes needed to overrule probe
    max_targets: int = 24         # overlap candidates per probe


def _seed_hits(didx, idx, probe: np.ndarray, p: ECParams):
    """(target_entry, diag, qofs) seed hits of probe cores in the read set."""
    k = p.seed_len
    offsets = tuple(range(0, len(probe) - k + 1, p.seed_stride))
    if not offsets:
        return np.zeros((0, 3), np.int64)
    q = jnp.asarray(probe[None, :])
    qlh, qll, qhh, qhl, has_n = pack_read_kmers(q, offsets, k)
    start, end = seed_range_lookup(
        didx.key_hi, didx.key_lo, didx.lut, didx.lut_bases,
        qlh, qll, qhh, qhl, core_len=k, max_steps=didx.max_bsearch_steps,
    )
    start = np.asarray(start)[0]
    end = np.asarray(end)[0]
    has_n = np.asarray(has_n)[0]
    H = 16
    size = np.minimum(end - start, H)
    size[has_n] = 0
    pos_sorted = np.asarray(didx.pos_sorted)
    starts = idx.entry_starts
    rows = []
    for s_i, ofs in enumerate(offsets):
        for j in range(size[s_i]):
            ppos = int(pos_sorted[start[s_i] + j])
            e = int(np.searchsorted(starts, ppos, side="right")) - 1
            toff = ppos - int(starts[e])
            rows.append((e, toff - ofs, ofs))
    return np.array(rows, np.int64) if rows else np.zeros((0, 3), np.int64)


def find_overlap_candidates(didx, idx, probe_id: int, probe: np.ndarray,
                            p: ECParams):
    """Cluster seed hits by (target, diagonal band); returns
    [(target_id, diag_estimate, votes)] sorted by votes."""
    hits = _seed_hits(didx, idx, probe, p)
    votes = defaultdict(list)
    for e, diag, ofs in hits:
        if e == probe_id:
            continue
        votes[(int(e), int(diag) // p.diag_band)].append(int(diag))
    out = []
    for (e, db), diags in votes.items():
        if len(diags) >= p.min_seed_votes:
            out.append((e, int(np.median(diags)), len(diags)))
    out.sort(key=lambda x: -x[2])
    return out[: p.max_targets]


def correct_read(
    probe: np.ndarray,
    targets: list[tuple[np.ndarray, int]],   # (target seq, diag)
    p: ECParams,
):
    """SW-align the probe against each target and take a column-majority
    consensus. Returns (corrected, n_used_overlaps)."""
    if not targets:
        return probe.copy(), 0
    B = len(targets)
    La = len(probe)
    Lb = max(len(t) for t, _ in targets)
    a = np.tile(probe, (B, 1)).astype(np.int8)
    b = np.full((B, Lb), 4, np.int8)
    blen = np.zeros(B, np.int32)
    diag = np.zeros(B, np.int32)
    for i, (t, d) in enumerate(targets):
        b[i, : len(t)] = t
        blen[i] = len(t)
        diag[i] = d
    alen = np.full(B, La, np.int32)
    best, bi, bk, moves = banded_sw_batch(
        jnp.asarray(a), jnp.asarray(b), jnp.asarray(alen),
        jnp.asarray(blen), jnp.asarray(diag), p.sw_band, La, Lb,
    )
    best = np.asarray(best)
    bi = np.asarray(bi)
    bk = np.asarray(bk)
    moves = np.asarray(moves)

    # column votes: probe position -> base counts (0..3) + delete(4);
    # insertion votes: (probe position, base) for target bases inserted
    # AFTER probe position i (the 'I' step semantics of the traceback)
    votes = np.zeros((La, 5), np.int32)
    ins_votes = np.zeros((La + 1, 4), np.int32)
    used = 0
    for t in range(B):
        if best[t] < p.min_overlap_score:
            continue
        steps, path, ops = traceback(moves[t], int(bi[t]), int(bk[t]),
                                     int(diag[t]), p.sw_band)
        if not path:
            continue
        used += 1
        tgt = b[t]
        for op, i, j in steps:
            if op == "M":
                if 0 <= i < La and 0 <= j < blen[t] and tgt[j] < 4:
                    votes[i, tgt[j]] += 1
            elif op == "D":
                # probe base i aligned against a target gap: delete vote
                if 0 <= i < La:
                    votes[i, 4] += 1
            elif op == "I":
                # target base j inserted after probe position i
                if -1 <= i < La and 0 <= j < blen[t] and tgt[j] < 4:
                    ins_votes[i + 1, tgt[j]] += 1
    # consensus call (CSSW::GenConsensusFromMAF role)
    out = []
    for i in range(La):
        tot = int(votes[i].sum())
        if tot >= p.min_cov_for_call:
            call = int(np.argmax(votes[i]))
            if call != 4:
                out.append(call)
            # else: majority says this probe base is an insertion — drop
        else:
            out.append(int(probe[i]))
        itot = int(ins_votes[i + 1].sum())
        if tot >= p.min_cov_for_call and itot * 2 > tot:
            out.append(int(np.argmax(ins_votes[i + 1])))
    return np.array(out, np.int8), used


def ec_reads(
    reads: list[np.ndarray],
    params: ECParams | None = None,
) -> tuple[list[np.ndarray], dict]:
    """Correct every read against the others. Returns (corrected, stats)."""
    p = params or ECParams()
    # index the read set (+ reverse complements as extra entries so rc
    # overlaps seed directly)
    entries = [(f"r{i}", s) for i, s in enumerate(reads)]
    entries += [(f"rc{i}", revcomp(s)) for i, s in enumerate(reads)]
    idx = build_index(entries, lut_bases=8)
    didx = to_device(idx)
    n = len(reads)
    corrected = []
    n_ov = 0
    for i, probe in enumerate(reads):
        cands = []
        for e, diag, v in find_overlap_candidates(didx, idx, i, probe, p):
            base = e % n  # rc entries map back to the same read
            if base == i:
                continue
            t = reads[e] if e < n else revcomp(reads[e - n])
            cands.append((t, diag))
        fixed, used = correct_read(probe, cands, p)
        n_ov += used
        corrected.append(fixed)
    return corrected, {"reads": n, "overlaps_used": n_ov}
