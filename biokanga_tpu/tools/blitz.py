"""Blitz — BLAT-like local alignment (capability match for `biokanga
blitz`, CBlitz, biokanga/Blitz.cpp: Process :594, ProcAlignQuerySeqs
:1243, IdentifyHighScorePaths/HighScoreSW :1495/:1407).

Reference behavior reproduced:
- seed cores of CoreLen (default 20, Blitz.h:11) slid at CoreDelta
  (default (CoreLen+1)/2, Blitz.cpp:989-1002 by sensitivity)
- over-occurring cores suppressed beyond the sensitivity explore depth
  (cDfltSensCoreIters 1500, Blitz.h:52-55; InitOverOccKMers role)
- seeds merged along diagonals into maximal exact blocks, then chained
  into highest-scoring collinear paths with the reference's scoring:
  match +1, mismatch -2, gap open -5, gap extend -1 per 10bp capped at
  10, gaps > 100kbp break paths (Blitz.h:28-45)
- paths accepted if score >= MinPathScore (default 75) and the query
  aligns over >= MinQueryLenAlignedPct (default 25%) of its length
- PSL / PSLX / BED / MAF output rows

TPU design: seed lookup + diagonal merge are batched device ops reusing
the index machinery; the collinear-chain DP runs as a lax.scan over
nodes with all (prev, next) gap costs vectorised per step.
"""
from __future__ import annotations

from dataclasses import dataclass, field

import jax
import jax.numpy as jnp
import numpy as np

from ..index.device import DeviceIndex
from ..ops.lookup import pack_read_kmers, seed_range_lookup
from ..seq.encode import codes_to_ascii, revcomp

# Blitz.h scoring constants
C_DFLT_CORE_LEN = 20
C_DFLT_PATH_SCORE = 75
C_DFLT_MATCH = 1
C_DFLT_MISMATCH = 2
C_DFLT_GAP_OPEN = 5
C_GAP_EXTEND_COST = 1       # per 10 bp
C_GAP_EXTEND_LIMIT = 10
C_GAP_MAX_LEN = 100_000
C_DFLT_MIN_ALIGNED_PCT = 25
C_DFLT_CORE_ITERS = 1500
C_DFLT_MAX_PATHS = 10
C_MAX_OVERLAP_FLOAT = 8


@dataclass(frozen=True)
class BlitzParams:
    core_len: int = C_DFLT_CORE_LEN
    core_delta: int = 0                 # 0 = per-sensitivity default
    sensitivity: str = "default"        # default|more|ultra|less
    min_path_score: int = C_DFLT_PATH_SCORE
    min_aligned_pct: int = C_DFLT_MIN_ALIGNED_PCT
    max_paths: int = C_DFLT_MAX_PATHS
    match_score: int = C_DFLT_MATCH
    mismatch_score: int = C_DFLT_MISMATCH
    gap_open: int = C_DFLT_GAP_OPEN
    max_occs: int = 64                  # per-core occurrence cap (device)
    max_nodes: int = 512                # chain DP node cap per query/strand

    def effective_delta(self) -> int:
        if self.core_delta:
            return self.core_delta
        cl = self.core_len
        return {
            "default": (cl + 1) // 2,
            "more": (cl + 2) // 3,
            "ultra": (cl + 3) // 4,
            "less": cl,
        }[self.sensitivity]


@dataclass
class BlitzPath:
    qname: str
    qsize: int
    strand: str
    qstart: int            # 0-based, on + strand of the query
    qend: int
    tname: str
    tsize: int
    tstart: int
    tend: int
    score: int
    matches: int
    block_sizes: list = field(default_factory=list)
    q_starts: list = field(default_factory=list)
    t_starts: list = field(default_factory=list)


def _seed_nodes(didx: DeviceIndex, q: np.ndarray, p: BlitzParams):
    """Exact-core seed (qofs, tloci) pairs for one query strand, via the
    batched SA range lookup, capped per core and with over-occurring cores
    suppressed (explore-depth semantics)."""
    k = min(p.core_len, 32)
    delta = p.effective_delta()
    offsets = tuple(range(0, len(q) - k + 1, delta))
    if not offsets:
        return np.zeros((0, 2), dtype=np.int64)
    seq = jnp.asarray(q[None, :])
    qlh, qll, qhh, qhl, has_n = pack_read_kmers(seq, offsets, k)
    start, end = seed_range_lookup(
        didx.key_hi, didx.key_lo, didx.lut, didx.lut_bases,
        qlh, qll, qhh, qhl, core_len=k, max_steps=didx.max_bsearch_steps,
    )
    start = np.asarray(start)[0]
    end = np.asarray(end)[0]
    has_n = np.asarray(has_n)[0]
    size = end - start
    H = p.max_occs
    keep = (~has_n) & (size > 0) & (size <= C_DFLT_CORE_ITERS)
    pos_sorted = didx.pos_sorted  # device array; gather per kept core
    nodes = []
    ks = np.nonzero(keep)[0]
    if len(ks) == 0:
        return np.zeros((0, 2), dtype=np.int64)
    idx = start[ks, None] + np.arange(H)[None, :]
    valid = np.arange(H)[None, :] < np.minimum(size[ks], H)[:, None]
    pos = np.asarray(jnp.take(pos_sorted, jnp.asarray(idx), axis=0))
    qofs = np.asarray(offsets)[ks, None]
    out = np.stack(
        [np.broadcast_to(qofs, pos.shape)[valid], pos[valid]], axis=1
    ).astype(np.int64)
    return out


def _merge_diag_blocks(nodes: np.ndarray, core_len: int):
    """Merge exact-core seeds on the same diagonal into maximal blocks.
    nodes: (N, 2) [qofs, tofs]. Returns (M, 3) [qstart, tstart, length]."""
    if len(nodes) == 0:
        return np.zeros((0, 3), dtype=np.int64)
    diag = nodes[:, 1] - nodes[:, 0]
    order = np.lexsort((nodes[:, 0], diag))
    nodes = nodes[order]
    diag = diag[order]
    blocks = []
    cs_q = cs_t = cur_end = None
    cur_diag = None
    for q, t in nodes:
        d = t - q
        if cur_diag == d and q <= cur_end:
            cur_end = max(cur_end, q + core_len)
        else:
            if cur_diag is not None:
                blocks.append((cs_q, cs_t, cur_end - cs_q))
            cur_diag, cs_q, cs_t, cur_end = d, q, t, q + core_len
    blocks.append((cs_q, cs_t, cur_end - cs_q))
    return np.array(blocks, dtype=np.int64)


def _chain_blocks(blocks: np.ndarray, p: BlitzParams):
    """Collinear chaining with the reference's path scoring. Returns list
    of (score, [block indices]) best-first, greedily non-overlapping."""
    M = len(blocks)
    if M == 0:
        return []
    order = np.lexsort((blocks[:, 0], blocks[:, 1]))
    b = blocks[order]
    q0, t0, ln = b[:, 0], b[:, 1], b[:, 2]
    score = (ln * p.match_score).astype(np.int64)
    f = score.copy()
    pred = np.full(M, -1, dtype=np.int64)
    for i in range(M):
        dq = q0[i] - (q0[:i] + ln[:i])
        dt = t0[i] - (t0[:i] + ln[:i])
        ok = (dq > -C_MAX_OVERLAP_FLOAT) & (dt > -C_MAX_OVERLAP_FLOAT)
        ok &= (dt <= C_GAP_MAX_LEN) & (dq <= C_GAP_MAX_LEN)
        gap = np.maximum(np.maximum(dq, dt), 0)
        gcost = np.where(
            gap > 0,
            p.gap_open
            + np.minimum(gap // 10 * C_GAP_EXTEND_COST, C_GAP_EXTEND_LIMIT),
            0,
        )
        cand = np.where(ok, f[:i] - gcost, -(10**12))
        if i and len(cand):
            j = int(np.argmax(cand))
            if cand[j] > 0:
                f[i] = score[i] + cand[j]
                pred[i] = j
    # extract up to max_paths non-overlapping chains best-first
    used = np.zeros(M, dtype=bool)
    paths = []
    for _ in range(p.max_paths):
        masked = np.where(used, -(10**12), f)
        i = int(np.argmax(masked))
        if masked[i] < p.min_path_score:
            break
        chain = []
        while i >= 0 and not used[i]:
            chain.append(i)
            used[i] = True
            i = int(pred[i])
        chain.reverse()
        if not chain:
            break
        paths.append((int(f[chain[-1]]), [order[c] for c in chain]))
    return paths


def blitz_query(
    didx: DeviceIndex, qname: str, q: np.ndarray, p: BlitzParams | None = None
) -> list[BlitzPath]:
    """Align one query (both strands) and return accepted paths."""
    p = p or BlitzParams()
    starts = np.asarray(jax.device_get(didx.entry_starts))
    qsize = len(q)
    out: list[BlitzPath] = []
    for strand, qs in (("+", q), ("-", revcomp(q))):
        nodes = _seed_nodes(didx, qs, p)
        blocks = _merge_diag_blocks(nodes, min(p.core_len, 32))
        if len(blocks) > p.max_nodes:
            # keep the longest blocks (explore-depth style suppression)
            blocks = blocks[np.argsort(blocks[:, 2])[::-1][: p.max_nodes]]
        # split blocks by target entry so paths never span entries
        ent = np.searchsorted(starts, blocks[:, 1], side="right") - 1 if len(
            blocks
        ) else np.zeros(0, int)
        for e in np.unique(ent):
            eb = blocks[ent == e]
            for score, chain in _chain_blocks(eb, p):
                rows = eb[np.asarray(chain)]
                qstart = int(rows[0][0])
                qend = int(rows[-1][0] + rows[-1][2])
                if (qend - qstart) * 100 < p.min_aligned_pct * qsize:
                    continue
                tstart = int(rows[0][1])
                tend = int(rows[-1][1] + rows[-1][2])
                e0 = int(starts[e])
                path = BlitzPath(
                    qname=qname, qsize=qsize, strand=strand,
                    qstart=qstart, qend=qend,
                    tname=didx.entry_names[int(e)],
                    tsize=int(starts[e + 1] - e0),
                    tstart=tstart - e0, tend=tend - e0,
                    score=score,
                    matches=int(rows[:, 2].sum()),
                    block_sizes=[int(x) for x in rows[:, 2]],
                    q_starts=[int(x) for x in rows[:, 0]],
                    t_starts=[int(x - e0) for x in rows[:, 1]],
                )
                out.append(path)
    out.sort(key=lambda x: -x.score)
    return out[: p.max_paths]


# ---------------------------------------------------------------- output --

PSL_HEADER = (
    "psLayout version 3\n\n"
    "match\tmis- \trep. \tN's\tQ gap\tQ gap\tT gap\tT gap\tstrand\tQ        "
    "\tQ   \tQ    \tQ  \tT        \tT   \tT    \tT  \tblock\tblockSizes "
    "\tqStarts\t tStarts\n"
    "     \tmatch\tmatch\t   \tcount\tbases\tcount\tbases\t      \tname     "
    "\tsize\tstart\tend\tname     \tsize\tstart\tend\tcount\n"
    + "-" * 159 + "\n"
)


def psl_row(p: BlitzPath) -> str:
    qnum_ins = tnum_ins = qbase_ins = tbase_ins = 0
    for i in range(1, len(p.block_sizes)):
        dq = p.q_starts[i] - (p.q_starts[i - 1] + p.block_sizes[i - 1])
        dt = p.t_starts[i] - (p.t_starts[i - 1] + p.block_sizes[i - 1])
        if dq > 0:
            qnum_ins += 1
            qbase_ins += dq
        if dt > 0:
            tnum_ins += 1
            tbase_ins += dt
    # PSL: for '-' strand, qStarts are in rc-query coords (BLAT convention)
    return "\t".join(
        str(x)
        for x in (
            p.matches, 0, 0, 0, qnum_ins, qbase_ins, tnum_ins, tbase_ins,
            p.strand, p.qname, p.qsize,
            p.qstart if p.strand == "+" else p.qsize - p.qend,
            p.qend if p.strand == "+" else p.qsize - p.qstart,
            p.tname, p.tsize, p.tstart, p.tend,
            len(p.block_sizes),
            ",".join(map(str, p.block_sizes)) + ",",
            ",".join(map(str, p.q_starts)) + ",",
            ",".join(map(str, p.t_starts)) + ",",
        )
    )


def bed_row(p: BlitzPath) -> str:
    sizes = ",".join(map(str, p.block_sizes)) + ","
    rel = ",".join(str(t - p.tstart) for t in p.t_starts) + ","
    return "\t".join(
        str(x)
        for x in (
            p.tname, p.tstart, p.tend, p.qname, min(p.score, 1000), p.strand,
            p.tstart, p.tend, 0, len(p.block_sizes), sizes, rel,
        )
    )


def maf_block(p: BlitzPath, didx: DeviceIndex, q: np.ndarray) -> str:
    starts = np.asarray(jax.device_get(didx.entry_starts))
    genome = np.asarray(jax.device_get(didx.genome))
    e0 = int(starts[didx.entry_names.index(p.tname)])
    tseq = codes_to_ascii(
        genome[e0 + p.tstart : e0 + p.tend]
    ).decode()
    qs = q if p.strand == "+" else revcomp(q)
    qseq = codes_to_ascii(qs[p.qstart : p.qend]).decode()
    return (
        f"a score={p.score}\n"
        f"s {p.tname} {p.tstart} {p.tend - p.tstart} + {p.tsize} {tseq}\n"
        f"s {p.qname} {p.qstart} {p.qend - p.qstart} {p.strand} {p.qsize} "
        f"{qseq}\n\n"
    )
