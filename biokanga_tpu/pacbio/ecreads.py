"""PacBio long-read error correction (`pacbiokanga ecreads` parity).

Capability match for CPBErrCorrect (pacbiokanga/PBErrCorrect.cpp:
Process :2526, ProcPacBioErrCorrect :1268): reads are loaded into an
in-memory index; seed cores locate candidate overlapping reads
(IteratePacBio role, SfxArrayV2.cpp:3779 — with the
min-seed-votes-per-extension rule, cPacBioMinKmersExtn SfxArrayV2.h:46),
candidates are Smith-Waterman aligned (ops/sw.py banded kernel replacing
CSSW::Align, SSW.cpp:992), accepted overlaps stack into column votes and
a majority consensus corrects each probe (CSSW::GenConsensusFromMAF
role, SSW.cpp:2115; CMAConsensus role).

BATCHED TPU dataflow (replacing the reference's thread pool + BKS TCP
job service): ONE device call seeds every probe at once; candidate
clustering is vectorised host numpy (np.unique over (probe, target,
diagonal-band) keys); ALL (probe, candidate) SW pairs run as chunked
device batches sized by the traceback-plane budget; tracebacks decode
ON DEVICE (ops/sw.traceback_align_batch — the 2-bit move planes never
cross the host link) and scatter directly into device-resident per-probe
column-vote planes; the consensus call is one more device pass, and only
the compact per-probe calls return to host.
"""
from __future__ import annotations

from dataclasses import dataclass
from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

from ..index.device_build import device_build_index
from ..ops.lookup import pack_read_kmers, seed_range_lookup
from ..ops.pallas_sw import _round_up, _run_moves, normalize_band
from ..ops.sw_trace import traceback_cols_packed
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
    sw_chunk_bytes: int = 1 << 30  # traceback-plane budget per dispatch


def _pad_reads(reads: list[np.ndarray], pad_to: int | None = None):
    L = pad_to or max(len(r) for r in reads)
    L = -(-L // 64) * 64
    arr = np.full((len(reads), L), 4, np.int8)
    lens = np.zeros(len(reads), np.int32)
    for i, r in enumerate(reads):
        arr[i, : len(r)] = r
        lens[i] = len(r)
    return arr, lens


@partial(jax.jit, static_argnames=("k", "H", "stride", "S", "max_steps",
                                   "lut_bases"))
def _seed_all(key_hi, key_lo, lut, pos_rows, probes, k, H, stride, S,
              lut_bases, max_steps):
    """One device call: (N, S, H) candidate positions for every probe.

    Rolling k-mer keys (k shifted adds over the whole probe matrix, then
    a strided slice at the core offsets) instead of a per-offset slice
    stack — compile stays O(k), not O(num_offsets)."""
    N, L = probes.shape
    assert k <= 16
    b = jnp.where(probes >= 4, 0, probes).astype(jnp.uint32)
    bp = jnp.pad(b, ((0, 0), (0, k)))
    key = jnp.zeros((N, L), jnp.uint32)
    isn = jnp.pad((probes >= 4), ((0, 0), (0, k)))
    nwin = jnp.zeros((N, L), bool)
    for j in range(k):
        key = key + (bp[:, j : j + L] << jnp.uint32(2 * (15 - j)))
        nwin = nwin | isn[:, j : j + L]
    q_hi = key[:, ::stride][:, :S]
    has_n = nwin[:, ::stride][:, :S]
    pad_hi = jnp.uint32((1 << (2 * (16 - k))) - 1)
    zero = jnp.zeros_like(q_hi)
    ones = jnp.full_like(q_hi, 0xFFFFFFFF)
    start, end = seed_range_lookup(
        key_hi, key_lo, lut, lut_bases, q_hi, zero, q_hi | pad_hi, ones,
        core_len=k, max_steps=max_steps,
    )
    size = jnp.minimum(end - start, H)
    size = jnp.where(has_n, 0, size)
    pos_flat = pos_rows.reshape(-1)
    j = jnp.arange(H, dtype=jnp.int32)
    idx = start[..., None] + j
    pos = pos_flat[jnp.clip(idx, 0, pos_flat.shape[0] - 1)]
    valid = j[None, None, :] < size[..., None]
    return pos, valid


def _build_ec_index(entries, lut_bases: int = 8):
    """Device-built read index (reads + rc copies) — replaces the host
    suffix build, which cost minutes at 10 Mbp while the device build is
    seconds (index/device_build.py).  Returns (didx, entry_starts)."""
    codes = (np.concatenate([np.asarray(e[1], np.int8) for e in entries])
             if entries else np.zeros(0, np.int8))
    starts = np.zeros(len(entries) + 1, np.int64)
    np.cumsum([len(e[1]) for e in entries], out=starts[1:])
    didx = device_build_index(codes, starts.astype(np.int32),
                              lut_bases=lut_bases)
    return didx, starts


def find_overlap_candidates_batch(didx, starts, probes, plens, p: ECParams,
                                  probe_gids=None, n_reads_total=None,
                                  ent_gids=None):
    """Vectorised candidate clustering for a batch of probes.

    Returns (pair_probe, pair_entry, pair_diag) host arrays — one row per
    accepted (probe, target entry) overlap candidate, at most
    p.max_targets per probe, ordered by descending seed votes.

    probe_gids/n_reads_total: when probes are a SUBSET of the indexed
    read set (checkpoint groups), the global read id of each probe and
    the total read count — needed to drop self-overlaps (entry g and its
    rc copy g + n_reads_total both belong to probe with global id g)."""
    N, L = probes.shape
    k = p.seed_len
    offsets = tuple(range(0, L - k + 1, p.seed_stride))
    S = len(offsets)
    H = 16
    pos, valid = _seed_all(
        didx.key_hi, didx.key_lo, didx.lut, didx.pos_rows,
        jnp.asarray(probes), k, H, p.seed_stride, S, didx.lut_bases,
        didx.max_bsearch_steps,
    )
    pos = np.asarray(pos, np.int64)
    valid = np.asarray(valid)
    starts = np.asarray(starts)
    offs = np.asarray(offsets, np.int64)[None, :, None]
    ent = np.searchsorted(starts, pos, side="right") - 1
    diag = (pos - starts[np.clip(ent, 0, len(starts) - 2)]) - offs
    pid = np.broadcast_to(np.arange(N, dtype=np.int64)[:, None, None],
                          pos.shape)

    v = valid.ravel()
    pidv = pid.ravel()[v]
    entv = ent.ravel()[v]
    diagv = diag.ravel()[v]
    band = (diagv + (1 << 22)) // p.diag_band
    E = len(starts)
    key = (pidv * E + entv) * (1 << 24) + band
    uk, inv, cnt = np.unique(key, return_inverse=True, return_counts=True)
    dsum = np.zeros(len(uk), np.int64)
    np.add.at(dsum, inv, diagv)
    keep = cnt >= p.min_seed_votes
    uk, cnt, dsum = uk[keep], cnt[keep], dsum[keep]
    c_probe = (uk >> 24) // E
    c_ent = (uk >> 24) % E
    c_diag = dsum // cnt

    # drop self-overlaps (entry g and its rc copy g+n map to the probe
    # whose GLOBAL read id is g); with a target-chunked index the
    # entry->global-read mapping goes through ent_gids
    n = N if n_reads_total is None else int(n_reads_total)
    gids = (np.arange(N, dtype=np.int64) if probe_gids is None
            else np.asarray(probe_gids, np.int64))
    if ent_gids is None:
        tgt_gid = c_ent % n
    else:
        eg = np.asarray(ent_gids, np.int64)
        tgt_gid = eg[np.clip(c_ent, 0, len(eg) - 1)]
    ok = tgt_gid != gids[c_probe]
    c_probe, c_ent, c_diag, cnt = (c_probe[ok], c_ent[ok], c_diag[ok],
                                   cnt[ok])
    # top max_targets per probe by votes
    order = np.lexsort((-cnt, c_probe))
    c_probe, c_ent, c_diag, cnt = (c_probe[order], c_ent[order],
                                   c_diag[order], cnt[order])
    run_start = np.concatenate([[True], c_probe[1:] != c_probe[:-1]])
    run_id = np.cumsum(run_start) - 1
    first = np.zeros(run_id[-1] + 1 if len(run_id) else 0, np.int64)
    if len(run_id):
        first[run_id[run_start]] = np.nonzero(run_start)[0]
        occ = np.arange(len(c_probe)) - first[run_id]
        sel = occ < p.max_targets
        return c_probe[sel], c_ent[sel], c_diag[sel]
    return c_probe, c_ent, c_diag


def _vote_deltas(out, insc, insb, pids, ok, N: int):
    """One SW chunk's vote-plane deltas as MXU segment matmuls.

    The former scatter-add formulation (votes.at[pids, cols, out].add)
    lowered to a TPU scatter over B*La updates and dominated EC wall
    time (~25 s per 539-pair chunk); the same reduction as a one-hot
    (N, B) x (B, La*7) matmul is exact (0/1 bf16 operands, f32
    accumulate, all partial sums integers < 2^24) and runs in
    milliseconds on the MXU."""
    B, La = out.shape
    seg = (pids[:, None] == jnp.arange(N, dtype=pids.dtype)[None, :]) & \
        ok[:, None]                                   # (B, N)
    segT16 = seg.T.astype(jnp.bfloat16)
    keep = ok[:, None] & (out < 6)
    oh = (out[..., None] == jnp.arange(7, dtype=out.dtype)[None, None, :]
          ) & keep[..., None]
    dv = jax.lax.dot(
        segT16, oh.astype(jnp.bfloat16).reshape(B, La * 7),
        preferred_element_type=jnp.float32,
    ).reshape(N, La, 7).astype(jnp.int32)
    segT32 = seg.T.astype(jnp.float32)
    dc = jax.lax.dot(segT32, insc.astype(jnp.float32),
                     preferred_element_type=jnp.float32).astype(jnp.int32)
    db = jax.lax.dot(
        segT32, insb.astype(jnp.float32).reshape(B, -1),
        preferred_element_type=jnp.float32,
    ).reshape(N, insb.shape[1], 4).astype(jnp.int32)
    return dv, dc, db


@jax.jit
def _consensus(votes, ins_cnt, ins_base, probes, plens, min_cov):
    """Column-majority consensus call (GenConsensusFromMAF role).

    Returns (call (N, La) int8 with 4 = delete-this-base, ins_go
    (N, La+1) bool, ins_b (N, La+1) int8, used_cov (N,))."""
    N, La = probes.shape
    base_votes = votes[..., :4]
    del_votes = votes[..., 5]
    tot = base_votes.sum(-1) + del_votes
    stacked = jnp.concatenate([base_votes, del_votes[..., None]], axis=-1)
    call = jnp.argmax(stacked, axis=-1).astype(jnp.int8)  # 4 = delete
    use = tot >= min_cov
    live = jnp.arange(La)[None, :] < plens[:, None]
    out_call = jnp.where(use & live, call, probes.astype(jnp.int8))
    itot = ins_cnt
    use1 = jnp.concatenate([use[:, :1] & False, use], axis=1)
    ins_go = use1 & (itot * 2 > jnp.concatenate(
        [jnp.zeros_like(tot[:, :1]), tot], axis=1))
    ins_b = jnp.argmax(ins_base, axis=-1).astype(jnp.int8)
    return out_call, ins_go, ins_b


def ec_reads(
    reads: list[np.ndarray],
    params: ECParams | None = None,
    target_chunk: int | None = None,
    mesh=None,
    rounds: int = 1,
) -> tuple[list[np.ndarray], dict]:
    """Correct every read against the others (fully batched; see module
    docstring). Returns (corrected, stats).

    rounds: iterated consensus — round r+1 corrects round r's OUTPUT
    reads against each other (the HGAP-style refinement the reference's
    single-shot CSSW/MAConsensus pipeline lacks; targets at ~0.2%
    residual error make the column votes near-noiseless).  Measured on
    the 500 x 10 kb CLR head-to-head: 1 round 0.956, 2 rounds 0.998
    32-mer recovery vs the reference's 0.960 (BENCH_EC_HTH.json).

    rounds=2 is the production default for CLR-noise inputs via the
    CLI; the library default stays 1 for reference-shaped parity runs.

    target_chunk: index at most this many target reads at a time
    (VERDICT r3 item 6 — the rc-doubled all-vs-all index residency no
    longer bounds read-set size; column votes accumulate exactly across
    target chunks because vote accumulation is associative, mirroring
    the reference's per-target-block SW scheduling
    PBErrCorrect.h:204-230).  NOTE (ADVICE r4): the top-max_targets
    candidate cut applies PER CHUNK, so a chunked run may use up to
    max_targets x n_chunks overlaps per probe — a SUPERSET of the
    unchunked run's candidate set (deeper coverage, not output-identical
    to target_chunk=None).

    mesh: a jax.sharding.Mesh with a 'dp' axis — SW pair batches shard
    over it (parallel/swservice.py dataflow, the BKS RPC replacement);
    None = single-device dispatch.
    """
    p = params or ECParams()
    n = len(reads)
    if rounds > 1:
        cur = reads
        overlaps = 0
        st: dict = {}
        for _ in range(rounds):
            cur, st = ec_reads(cur, p, target_chunk=target_chunk,
                               mesh=mesh, rounds=1)
            overlaps += st["overlaps_used"]
        st = dict(st)
        st["overlaps_used"] = overlaps
        st["rounds"] = rounds
        return cur, st
    if target_chunk is None or target_chunk >= n:
        entries = [(f"r{i}", s) for i, s in enumerate(reads)]
        entries += [(f"rc{i}", revcomp(s)) for i, s in enumerate(reads)]
        didx, starts = _build_ec_index(entries)
        return _correct_probes(reads, entries, starts, didx, reads, p,
                               mesh=mesh)

    probes, plens = _pad_reads(reads, pad_to=max(len(r) for r in reads))
    N, La = probes.shape
    votes = jnp.zeros((N, La, 7), jnp.int32)
    ins_cnt = jnp.zeros((N, La + 1), jnp.int32)
    ins_base = jnp.zeros((N, La + 1, 4), jnp.int32)
    n_pairs_used = 0
    for t0 in range(0, n, target_chunk):
        tids = list(range(t0, min(t0 + target_chunk, n)))
        entries = [(f"r{i}", reads[i]) for i in tids]
        entries += [(f"rc{i}", revcomp(reads[i])) for i in tids]
        ent_gids = np.asarray(tids + tids, np.int64)
        didx, starts = _build_ec_index(entries)
        c_probe, c_ent, c_diag = find_overlap_candidates_batch(
            didx, starts, probes, plens, p,
            probe_gids=np.arange(n), n_reads_total=n, ent_gids=ent_gids,
        )
        tseqs = [e[1] for e in entries]
        votes, ins_cnt, ins_base, used = _sw_and_vote(
            probes, plens, c_probe, c_ent, c_diag, tseqs,
            votes, ins_cnt, ins_base, p, mesh,
        )
        n_pairs_used += used
        del didx
    corrected = _finish_consensus(votes, ins_cnt, ins_base, probes,
                                  plens, p)
    return corrected, {"reads": n, "overlaps_used": n_pairs_used,
                       "target_chunks": -(-n // target_chunk)}


def ec_reads_checkpointed(
    reads: list[np.ndarray],
    params: ECParams | None = None,
    checkpoint_dir: str | None = None,
    group: int = 128,
) -> tuple[list[np.ndarray], dict]:
    """ec_reads in resumable probe GROUPS: each group of `group` probes
    is corrected against the full read set and persisted as one atomic
    cell (utils/checkpoint.SweepCheckpoint); a killed multi-hour EC run
    resumes at the first missing group.  The reference restarts EC from
    zero on any crash (SURVEY §5: no in-process checkpointing; BKS only
    re-queues in-flight jobs on provider loss, BKScommon.h:22-24)."""
    from ..utils.checkpoint import SweepCheckpoint, config_signature

    p = params or ECParams()
    ckpt = None
    if checkpoint_dir:
        sig = config_signature(
            ["ecreads", len(reads),
             [int(len(r)) for r in reads[:64]], p, group]
        )
        ckpt = SweepCheckpoint(checkpoint_dir, sig)
    entries = [(f"r{i}", s) for i, s in enumerate(reads)]
    entries += [(f"rc{i}", revcomp(s)) for i, s in enumerate(reads)]
    didx, starts = _build_ec_index(entries)
    corrected: list[np.ndarray] = []
    overlaps = 0
    for g0 in range(0, len(reads), group):
        gi = g0 // group
        rows = list(range(g0, min(g0 + group, len(reads))))
        if ckpt is not None and ckpt.has(0, gi):
            z = ckpt.load(0, gi)
            lens = z["lengths"]
            flat = z["flat"]
            ofs = 0
            for L in lens:
                corrected.append(flat[ofs : ofs + int(L)].astype(np.int8))
                ofs += int(L)
            overlaps += int(z["overlaps"])
            continue
        sub, st = _correct_probes([reads[i] for i in rows], entries,
                                  starts, didx, reads, p, probe_gids=rows)
        if ckpt is not None:
            ckpt.save(0, gi, {
                "lengths": np.asarray([len(c) for c in sub], np.int64),
                "flat": (np.concatenate(sub) if sub
                         else np.zeros(0, np.int8)),
                "overlaps": np.int64(st["overlaps_used"]),
            })
        corrected.extend(sub)
        overlaps += st["overlaps_used"]
    return corrected, {"reads": len(reads), "overlaps_used": overlaps}


def _make_sw_vote_fn(mesh, W: int, La: int, N: int, min_score: int,
                     interpret: bool):
    """Jitted per-chunk SW + decode + vote-delta step.

    Single device: Pallas packed-moves kernel (ops/pallas_sw.py
    banded_sw_moves internals) -> word-scan column decode
    (ops/sw_trace.py) -> MXU vote deltas.  mesh: the identical function
    body runs under shard_map with pair rows split over 'dp' and the
    integer-exact deltas psum'd — the parallel/swservice.py dataflow
    (BKS RPC replacement, BKSRequester.cpp/BKSProvider.cpp)."""
    # raw (unjitted) kernels: the outer `step` jit compiles everything,
    # and a nested jax.jit under shard_map trips the mesh-context check
    run_moves = getattr(_run_moves, "__wrapped__", _run_moves)
    tb_cols = getattr(traceback_cols_packed, "__wrapped__",
                      traceback_cols_packed)

    def local(a8, bw8, alen, jlo, jhi, pids):
        a32 = a8.astype(jnp.int32)
        bw32 = bw8.astype(jnp.int32)
        best, bi, bk, mv = run_moves(a32, bw32, alen, jlo, jhi, W,
                                     interpret)
        out, insc, insb = tb_cols(mv, bi, bk, bw32, W, La)
        ok = (best >= min_score) & (alen > 0)
        dv, dc, db = _vote_deltas(out, insc, insb, pids, ok, N)
        nok = jnp.sum(ok, dtype=jnp.int32)
        return dv, dc, db, nok

    if mesh is None:
        delta_fn = local
    else:
        from jax import shard_map
        from jax.sharding import PartitionSpec as P

        def local_psum(*args):
            dv, dc, db, nok = local(*args)
            dv = jax.lax.psum(dv, "dp")
            dc = jax.lax.psum(dc, "dp")
            db = jax.lax.psum(db, "dp")
            nok = jax.lax.psum(nok, "dp")
            return dv, dc, db, nok

        delta_fn = shard_map(
            local_psum, mesh=mesh,
            in_specs=(P("dp", None), P("dp", None), P("dp"), P("dp"),
                      P("dp"), P("dp")),
            out_specs=(P(None, None, None), P(None, None),
                       P(None, None, None), P()),
            check_vma=False,
        )

    @partial(jax.jit, donate_argnums=(0, 1, 2))
    def step(votes, ins_cnt, ins_base, a8, bw8, alen, jlo, jhi, pids):
        dv, dc, db, nok = delta_fn(a8, bw8, alen, jlo, jhi, pids)
        return votes + dv, ins_cnt + dc, ins_base + db, nok

    return step


def _sw_and_vote(probes, plens, c_probe, c_ent, c_diag, tseqs,
                 votes, ins_cnt, ins_base, p, mesh=None):
    """Run every (probe, candidate) SW pair in move-plane-budget chunks
    and accumulate accepted alignments into the vote planes.

    The SW engine is the Pallas packed-moves kernel + word-scan decode
    (scores and decodes bit-equal to the former lax.scan path, at ~20x
    the throughput — VERDICT r4 item 2); band windows are host-built
    once per chunk (normalize_band) so the device never gathers target
    bases."""
    N, La = probes.shape
    P = len(c_probe)
    W = p.sw_band
    K = 2 * W + 1
    KP = _round_up(K, 128)
    lap = _round_up(La, 128)
    # per-pair device bytes: packed move words + band window + decode
    bytes_pair = (lap // 16) * KP * 4 + 6 * lap * 4
    chunk = max(16, int(p.sw_chunk_bytes // max(bytes_pair, 1)))
    if mesh is not None:
        n_dp = mesh.shape["dp"]
        chunk = max(n_dp, chunk // n_dp * n_dp)
        from jax.sharding import NamedSharding, PartitionSpec as PS

        row_sh = NamedSharding(mesh, PS("dp", None))
        vec_sh = NamedSharding(mesh, PS("dp"))
    interpret = jax.default_backend() != "tpu"
    step = _make_sw_vote_fn(mesh, W, La, N, p.min_overlap_score,
                            interpret)

    n_pairs_used = 0
    for s in range(0, P, chunk):
        rows = np.arange(s, min(s + chunk, P))
        Bc = len(rows)
        pad = chunk - Bc
        a = probes[np.clip(c_probe[rows], 0, N - 1)]
        alen = plens[np.clip(c_probe[rows], 0, N - 1)].astype(np.int32)
        b = np.full((chunk, La), 4, np.int8)
        blen = np.zeros(chunk, np.int32)
        for i, r in enumerate(rows):
            t = tseqs[int(c_ent[r])]
            b[i, : len(t)] = t
            blen[i] = len(t)
        if pad:
            a = np.concatenate([a, np.full((pad, La), 4, np.int8)])
            alen = np.concatenate([alen, np.zeros(pad, np.int32)])
        if lap != La:
            a = np.pad(a, ((0, 0), (0, lap - La)), constant_values=4)
        dg = np.zeros(chunk, np.int32)
        dg[:Bc] = c_diag[rows].astype(np.int32)
        pids = np.full(chunk, -1, np.int32)  # pad rows vote nowhere
        pids[:Bc] = c_probe[rows].astype(np.int32)
        bwin, jlo, jhi = normalize_band(b, blen, dg, lap, W)
        bw8 = bwin.astype(np.int8)

        if mesh is None:
            args = (jnp.asarray(a), jnp.asarray(bw8), jnp.asarray(alen),
                    jnp.asarray(jlo), jnp.asarray(jhi), jnp.asarray(pids))
        else:
            args = (jax.device_put(a, row_sh), jax.device_put(bw8, row_sh),
                    jax.device_put(alen, vec_sh),
                    jax.device_put(jlo, vec_sh),
                    jax.device_put(jhi, vec_sh),
                    jax.device_put(pids, vec_sh))
        votes, ins_cnt, ins_base, nok = step(votes, ins_cnt, ins_base,
                                             *args)
        n_pairs_used += int(nok)
    return votes, ins_cnt, ins_base, n_pairs_used


def _finish_consensus(votes, ins_cnt, ins_base, probes, plens, p):
    """Consensus call + host-side edit application."""
    call, ins_go, ins_b = jax.device_get(_consensus(
        votes, ins_cnt, ins_base, jnp.asarray(probes), jnp.asarray(plens),
        p.min_cov_for_call,
    ))
    call = np.asarray(call)
    ins_go = np.asarray(ins_go)
    ins_b = np.asarray(ins_b)
    corrected = []
    # vectorised interleave per read: token slots alternate
    # (insert-before-0, call-0, insert-before-1, call-1, ..., insert-L)
    for i in range(probes.shape[0]):
        L = int(plens[i])
        toks = np.empty(2 * L + 1, np.int8)
        sel = np.zeros(2 * L + 1, bool)
        toks[0::2] = ins_b[i, : L + 1]
        sel[0::2] = ins_go[i, : L + 1]
        toks[1::2] = call[i, :L]
        sel[1::2] = call[i, :L] != 4
        corrected.append(toks[sel])
    return corrected


def _correct_probes(probe_reads, entries, starts, didx, all_reads, p,
                    probe_gids=None, mesh=None):
    """Correct `probe_reads` against the prebuilt all-reads index.

    Probes pad to the GLOBAL max read length so every checkpoint group
    compiles to one shape."""
    n = len(probe_reads)
    probes, plens = _pad_reads(probe_reads,
                               pad_to=max(len(r) for r in all_reads))
    N, La = probes.shape

    c_probe, c_ent, c_diag = find_overlap_candidates_batch(
        didx, starts, probes, plens, p,
        probe_gids=probe_gids, n_reads_total=len(all_reads),
    )
    tseqs = [e[1] for e in entries]
    votes = jnp.zeros((N, La, 7), jnp.int32)
    ins_cnt = jnp.zeros((N, La + 1), jnp.int32)
    ins_base = jnp.zeros((N, La + 1, 4), jnp.int32)
    votes, ins_cnt, ins_base, n_pairs_used = _sw_and_vote(
        probes, plens, c_probe, c_ent, c_diag, tseqs,
        votes, ins_cnt, ins_base, p, mesh,
    )
    corrected = _finish_consensus(votes, ins_cnt, ins_base, probes,
                                  plens, p)[:n]
    return corrected, {"reads": n, "overlaps_used": n_pairs_used}

