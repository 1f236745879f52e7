"""PacBio contigs from CORRECTED reads at >= 1 Mbp (VERDICT r4 item 10:
the `pacbiokanga contigs` capability row, PBAssemb.cpp role).

Pipeline: CLR-profile reads (10 kb, err 7%, 10/60/30 sub/ins/del) at
~25x over a multi-Mbp genome -> ec_reads (2 iterated-consensus rounds,
Pallas SW engine) -> assemble() with the PacBio relaxed-identity
schedule (pacbio contigs defaults) -> N50 + k-mer-based contig accuracy
(residual post-EC errors mean exact-substring checks do not apply; a
contig is 'clean' when >= 99.5% of its 32-mers occur in the genome).

Writes BENCH_PBASM.json.
"""
from __future__ import annotations

import json
import os
import sys
import time

import numpy as np

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)
sys.path.insert(0, os.path.join(REPO, "scripts"))

from bench_ec_headtohead import gen_reads  # noqa: E402
from bench_ecreads import kmer_recovery, kmer_set  # noqa: E402


def n50(lengths):
    ls = sorted(lengths, reverse=True)
    half = sum(ls) / 2
    acc = 0
    for x in ls:
        acc += x
        if acc >= half:
            return x
    return ls[-1] if ls else 0


def main():
    import argparse

    ap = argparse.ArgumentParser()
    ap.add_argument("--mbp", type=float, default=1.0)
    ap.add_argument("--cov", type=float, default=25.0)
    ap.add_argument("--read-len", type=int, default=10_000)
    ap.add_argument("--err", type=float, default=0.07)
    a = ap.parse_args()

    from biokanga_tpu.assembly.assemble import assemble
    from biokanga_tpu.pacbio.ecreads import ECParams, ec_reads
    from biokanga_tpu.utils.jaxcache import enable_persistent_cache

    enable_persistent_cache()
    gbp = int(a.mbp * 1e6)
    n_reads = int(gbp * a.cov / a.read_len)
    reads, truths = gen_reads(n_reads, a.read_len, gbp // 1000, a.err,
                              seed=21)
    # genome regenerated with the same seed inside gen_reads
    rng = np.random.default_rng(21)
    genome = rng.integers(0, 4, size=gbp, dtype=np.int8)

    t0 = time.monotonic()
    corrected, st = ec_reads(reads, ECParams(max_targets=24), rounds=2)
    t_ec = time.monotonic() - t0
    gk = kmer_set(genome)
    sample = corrected[:50]
    ec_acc = float(np.mean([kmer_recovery(c, gk) for c in sample]))

    t0 = time.monotonic()
    contigs, stats = assemble(
        corrected, init_overlap=500, final_overlap=100,
        max_subs_per_100=5.0, min_seq_len=500,
    )
    t_asm = time.monotonic() - t0
    contigs = [c for c in contigs if len(c) >= 1000]
    n_pre_dedup, bp_pre_dedup = (len(contigs),
                                 int(sum(len(c) for c in contigs)))
    from biokanga_tpu.assembly.assemble import kmer_containment_dedup

    # residual post-EC indels defeat the Hamming containment pass, so
    # the raw contig set is heavily redundant; collapse it the
    # indel-tolerant way (canonical-32-mer coverage)
    contigs = kmer_containment_dedup(contigs)
    clean = sum(1 for c in contigs if kmer_recovery(c, gk) >= 0.995)
    row = {
        "metric": "pacbio_contigs_n50_from_corrected_reads",
        "value": n50([len(c) for c in contigs]),
        "unit": "bp",
        "detail": {
            "genome_mbp": a.mbp, "coverage": a.cov,
            "n_reads": n_reads, "read_len": a.read_len, "err": a.err,
            "ec_rounds": 2, "ec_wall_s": round(t_ec, 1),
            "ec_kmer32_recovery_sample": round(ec_acc, 4),
            "asm_wall_s": round(t_asm, 1),
            "n_contigs_pre_dedup": n_pre_dedup,
            "total_bp_pre_dedup": bp_pre_dedup,
            "n_contigs": len(contigs),
            "max_contig": max((len(c) for c in contigs), default=0),
            "total_bp": int(sum(len(c) for c in contigs)),
            "clean_contigs_995": clean,
            "passes": stats.passes,
        },
    }
    with open(os.path.join(REPO, "BENCH_PBASM.json"), "w") as f:
        json.dump(row, f, indent=1)
    print(json.dumps(row))


if __name__ == "__main__":
    main()
