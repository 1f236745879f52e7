"""Multi-chip sharded alignment over a jax.sharding.Mesh.

TPU-native replacement for the reference's two distribution mechanisms
(SURVEY.md §2.7): worker-thread read-batch parallelism (ThreadedIterReads,
biokanga/Aligner.cpp:9636) and the BKS TCP work-server RPC
(pacbiokanga/BKSRequester.cpp) become SPMD over a device mesh:

  mesh axes: ('dp', 'sp')
    dp — read batches data-parallel (the 128-thread pool analogue)
    sp — the suffix-array/genome SHARDED by sorted-key range; each sp
         shard searches its local key range for every read core and the
         per-candidate mismatch results merge with a min-reduction
         (the allgather/psum analogue of BKS job-response merging)

Because the SA is sorted by key, sharding it into contiguous runs means
each shard holds a disjoint key interval: a seed's candidate set is the
union of per-shard range lookups, and best/next-best Hamming reduction
commutes across shards — so the merge is a couple of small collectives
per batch, riding ICI.
"""
from __future__ import annotations

from dataclasses import dataclass
from functools import partial

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from ..align.params import AlignParams, DerivedParams
from ..align.pipeline import _rc_reads
from ..index.build import GenomeIndex
from ..ops.extend import MM_INVALID, hamming_extend
from ..ops.lookup import pack_read_kmers, seed_range_lookup


def make_mesh(n_dp: int, n_sp: int, devices=None) -> Mesh:
    devices = np.asarray(devices if devices is not None else jax.devices())
    assert devices.size >= n_dp * n_sp
    return Mesh(devices[: n_dp * n_sp].reshape(n_dp, n_sp), ("dp", "sp"))


@dataclass
class ShardedIndex:
    """Index sharded over the 'sp' mesh axis.

    genome + entry_starts replicated (genome gathers are random-access),
    SA arrays (pos_sorted / key_hi / key_lo / lut) sharded by contiguous
    key range. Shards are padded to equal length with +inf keys.
    """

    genome: jax.Array        # replicated (n,)
    entry_starts: jax.Array  # replicated (E+1,)
    pos_sorted: jax.Array    # (n_sp, m) sharded over axis 0
    key_hi: jax.Array        # (n_sp, m)
    key_lo: jax.Array        # (n_sp, m)
    lut: jax.Array           # (n_sp, 4^P+1) per-shard local bucket starts
    lut_bases: int
    entry_names: list[str]
    shard_len: int

    @property
    def total_len(self) -> int:
        return int(self.genome.shape[0])


def shard_index(idx: GenomeIndex, mesh: Mesh) -> ShardedIndex:
    n_sp = mesh.shape["sp"]
    n = idx.total_len
    m = -(-n // n_sp)  # ceil
    P_bases = idx.lut_bases

    pos = np.full((n_sp, m), 0, dtype=np.int32)
    khi = np.full((n_sp, m), 0xFFFFFFFF, dtype=np.uint32)
    klo = np.full((n_sp, m), 0xFFFFFFFF, dtype=np.uint32)
    lut = np.zeros((n_sp, 4**P_bases + 1), dtype=np.int32)
    for s in range(n_sp):
        a, b = s * m, min((s + 1) * m, n)
        k = b - a
        if k <= 0:
            lut[s, :] = 0
            continue
        pos[s, :k] = idx.pos_sorted[a:b]
        khi[s, :k] = idx.key_hi[a:b]
        klo[s, :k] = idx.key_lo[a:b]
        # local LUT: clamp global bucket starts into this shard's range.
        lut[s] = np.clip(idx.lut.astype(np.int64) - a, 0, k).astype(np.int32)

    def put(arr, spec):
        return jax.device_put(arr, NamedSharding(mesh, spec))

    return ShardedIndex(
        genome=put(idx.codes, P()),
        entry_starts=put(idx.entry_starts.astype(np.int32), P()),
        pos_sorted=put(pos, P("sp", None)),
        key_hi=put(khi, P("sp", None)),
        key_lo=put(klo, P("sp", None)),
        lut=put(lut, P("sp", None)),
        lut_bases=P_bases,
        entry_names=list(idx.entry_names),
        shard_len=m,
    )


def _shard_candidates(key_hi, key_lo, lut, lut_bases, pos_sorted, seq, dp, H):
    """Per-shard candidate loci for one strand — local arrays inside
    shard_map; padded keys (0xFFFFFFFF) sort above every real key, so
    lookups never return padded slots for cores (cores pack N as 0)."""
    n = pos_sorted.shape[0]
    S = len(dp.offsets)
    qlh, qll, qhh, qhl, has_n = pack_read_kmers(seq, dp.offsets, dp.core_len)
    start, end = seed_range_lookup(key_hi, key_lo, lut, lut_bases, qlh, qll, qhh, qhl)
    size = end - start
    overflow = size > H
    j = jnp.arange(H, dtype=jnp.int32)
    idx = start[..., None] + j
    in_range = j[None, None, :] < jnp.minimum(size, H)[..., None]
    pos = pos_sorted[jnp.clip(idx, 0, n - 1)]
    offs = jnp.asarray(dp.offsets, dtype=jnp.int32)
    diag = pos - offs[None, :, None]
    valid = in_range & (~has_n[..., None]) & (diag >= 0)
    B = seq.shape[0]
    I32_MAX = jnp.int32(2**31 - 1)
    flat = jnp.where(valid, diag, I32_MAX).reshape(B, S * H)
    srt = jax.lax.sort(flat, dimension=1)
    dup = jnp.concatenate(
        [jnp.zeros((B, 1), dtype=bool), srt[:, 1:] == srt[:, :-1]], axis=1
    )
    v = (srt != I32_MAX) & (~dup)
    return srt, v, jnp.any(overflow, axis=1)


def build_sharded_align_fn(
    mesh: Mesh,
    sidx: ShardedIndex,
    params: AlignParams,
    dp_params: DerivedParams,
    H: int,
):
    """Returns a jitted SPMD align step:
    (reads (B, L) sharded over dp, lengths (B,)) -> per-read result dict
    (replicated over sp).
    """
    lut_bases = sidx.lut_bases
    ap = params
    dpp = dp_params

    from jax import shard_map  # jax >= 0.9

    def local_step(genome, entry_starts, pos_sorted, key_hi, key_lo, lut,
                   reads, lengths):
        # inside shard_map: pos_sorted/key_*/lut have a leading shard axis
        # of size 1 (local block of the 'sp'-sharded array)
        pos_sorted = pos_sorted[0]
        key_hi = key_hi[0]
        key_lo = key_lo[0]
        lut = lut[0]

        if ap.max_subs_per100 == 0:
            max_tot_mm = jnp.zeros_like(lengths)
        else:
            max_tot_mm = jnp.clip(
                jnp.floor(lengths * (ap.max_subs_per100 / 100.0) + 0.5).astype(
                    jnp.int32
                ),
                1,
                63,
            )

        strands = []
        if ap.strand in ("both", "sense"):
            strands.append((reads, False))
        if ap.strand in ("both", "antisense"):
            strands.append((_rc_reads(reads, lengths), True))

        loci_parts, mm_parts = [], []
        ovf = None
        for seq, _is_rc in strands:
            loci, vmask, o = _shard_candidates(
                key_hi, key_lo, lut, lut_bases, pos_sorted, seq, dpp, H
            )
            mm = hamming_extend(genome, entry_starts, loci, vmask, seq, lengths)
            loci_parts.append(loci)
            mm_parts.append(mm)
            ovf = o if ovf is None else (ovf | o)

        loci_all = jnp.concatenate(loci_parts, axis=1)
        mm_all = jnp.concatenate(mm_parts, axis=1).astype(jnp.int32)
        C1 = loci_parts[0].shape[1]
        B = reads.shape[0]

        # --- local reductions, then merge across 'sp' with tiny collectives
        # encode (mm, locus) into one int64-free comparable pair: primary mm,
        # secondary locus for a deterministic argmin across shards.
        best_l = jnp.min(mm_all, axis=1)
        bi_l = jnp.argmin(mm_all, axis=1).astype(jnp.int32)
        locus_l = jnp.take_along_axis(loci_all, bi_l[:, None], axis=1)[:, 0]
        is_rc_l = bi_l >= C1
        is_best = mm_all == best_l[:, None]
        inst_l = jnp.sum(is_best, axis=1, dtype=jnp.int32)
        next_l = jnp.min(jnp.where(is_best, MM_INVALID, mm_all), axis=1)

        # cross-shard merge. NOTE: a candidate found by two different shards
        # cannot exist (shards hold disjoint SA ranges and dedup is by
        # diagonal within shard) — except a locus seeded by different cores
        # landing in different shards. Merge therefore min-combines mm and
        # recomputes instances approximately; exact cross-shard dedup is the
        # all_gather path below.
        g_mm = jax.lax.all_gather(best_l, "sp")         # (n_sp, B)
        g_inst = jax.lax.all_gather(inst_l, "sp")
        g_next = jax.lax.all_gather(next_l, "sp")
        g_locus = jax.lax.all_gather(locus_l, "sp")
        g_rc = jax.lax.all_gather(is_rc_l, "sp")

        best = jnp.min(g_mm, axis=0)
        sh = jnp.argmin(g_mm, axis=0)
        take = lambda a: jnp.take_along_axis(a, sh[None, :], axis=0)[0]
        locus = take(g_locus)
        is_rc = take(g_rc)
        # instances of the global best across shards; duplicate loci across
        # shards (same locus, same strand, equal mm) are collapsed.
        same_best = g_mm == best[None, :]
        same_locus = (g_locus == locus[None, :]) & (g_rc == is_rc[None, :])
        inst = jnp.sum(
            jnp.where(same_best, g_inst, 0), axis=0
        ) - jnp.sum(same_best & same_locus, axis=0) + 1
        # next-best across shards: min of (per-shard next) and (per-shard
        # best where that shard's best > global best)
        cand_next = jnp.where(same_best, g_next, g_mm)
        next_mm = jnp.min(cand_next, axis=0)

        unique = (
            (best <= max_tot_mm) & (inst == 1) & ((next_mm - best) >= ap.min_edit_dist)
        )
        return {
            "unique": unique,
            "any_hit": best <= max_tot_mm,
            "best_mm": jnp.minimum(best, MM_INVALID).astype(jnp.uint8),
            "inst": inst,
            "locus": locus,
            "is_rc": is_rc,
            "overflow": ovf,
        }

    mapped = shard_map(
        local_step,
        mesh=mesh,
        in_specs=(
            P(),              # genome (replicated)
            P(),              # entry_starts
            P("sp", None),    # pos_sorted
            P("sp", None),    # key_hi
            P("sp", None),    # key_lo
            P("sp", None),    # lut
            P("dp", None),    # reads
            P("dp"),          # lengths
        ),
        out_specs={
            "unique": P("dp"),
            "any_hit": P("dp"),
            "best_mm": P("dp"),
            "inst": P("dp"),
            "locus": P("dp"),
            "is_rc": P("dp"),
            "overflow": P("dp"),
        },
        check_vma=False,
    )

    @jax.jit
    def step(reads, lengths):
        return mapped(
            sidx.genome, sidx.entry_starts, sidx.pos_sorted, sidx.key_hi,
            sidx.key_lo, sidx.lut, reads, lengths,
        )

    return step


def build_sharded_pileup_fn(mesh: Mesh, sidx: ShardedIndex):
    """SPMD SNP pileup: each 'dp' shard scatter-adds its local accepted
    alignments into per-locus count planes, then the planes merge with a
    psum over 'dp' — the collective replacement for the reference's
    per-thread pileup accumulation + serialised merge (ProcessSNPs,
    Aligner.cpp:7609; this is BASELINE config 3's "SNP calling with psum
    pileup merge").

    Takes (loci (B,), aligned seqs (B, L), lengths (B,), accept (B,))
    sharded over 'dp'; returns replicated (n, 4) counts + match/mismatch
    planes.
    """
    from jax import shard_map

    genome = sidx.genome
    n = sidx.total_len

    def local(genome, loci, seqs, lengths, accept):
        B, L = seqs.shape
        pos = loci[:, None] + jnp.arange(L, dtype=jnp.int32)
        live = (
            accept[:, None]
            & (jnp.arange(L, dtype=jnp.int32)[None, :] < lengths[:, None])
            & (seqs < 4) & (pos >= 0) & (pos < n)
        )
        posc = jnp.clip(pos, 0, n - 1)
        base = jnp.clip(seqs, 0, 3).astype(jnp.int32)
        counts = jnp.zeros((n, 4), jnp.int32).at[
            posc.ravel(), base.ravel()
        ].add(live.ravel().astype(jnp.int32))
        ref = genome[posc]
        is_mm = (base != ref) & live
        match = jnp.zeros(n, jnp.int32).at[posc.ravel()].add(
            (live & ~is_mm).ravel().astype(jnp.int32)
        )
        mismatch = jnp.zeros(n, jnp.int32).at[posc.ravel()].add(
            is_mm.ravel().astype(jnp.int32)
        )
        counts = jax.lax.psum(counts, "dp")
        match = jax.lax.psum(match, "dp")
        mismatch = jax.lax.psum(mismatch, "dp")
        return counts, match, mismatch

    mapped = shard_map(
        local,
        mesh=mesh,
        in_specs=(P(), P("dp"), P("dp", None), P("dp"), P("dp")),
        out_specs=(P(), P(), P()),
        check_vma=False,
    )

    @jax.jit
    def step(loci, seqs, lengths, accept):
        return mapped(genome, loci, seqs, lengths, accept)

    return step
