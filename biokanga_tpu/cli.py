"""CLI: name -> subcommand dispatch, mirroring the reference's subprocess
table (biokanga/biokanga.cpp:101-130 `SubProcesses[]`).

`@paramfile` response files are supported exactly like the reference's
argtable2 `arg_parsefromfile` (libbiokanga/Utility.cpp:793): any argument
starting with '@' is replaced by the whitespace/newline-separated tokens
of that file.

Usage:  python -m biokanga_tpu <subcommand> [args...]
"""
from __future__ import annotations

import argparse
import sys

import numpy as np

from . import __version__
from .utils.diagnostics import StopWatch, open_diagnostics


def _expand_response_files(argv: list[str]) -> list[str]:
    out: list[str] = []
    for a in argv:
        if a.startswith("@") and len(a) > 1:
            with open(a[1:]) as f:
                out.extend(f.read().split())
        else:
            out.append(a)
    return out


# ---------------------------------------------------------------- index ----

def cmd_index(argv: list[str]) -> int:
    """`biokanga index` parity: genome FASTA -> on-disk index
    (reference front-end biokanga/kangax.cpp:59)."""
    p = argparse.ArgumentParser(prog="biokanga-tpu index")
    p.add_argument("-i", "--infasta", action="append", required=True,
                   help="input FASTA file(s), gzip ok (repeatable)")
    p.add_argument("-o", "--out", required=True, help="output index file (.npz)")
    p.add_argument("-r", "--ref", default="", help="reference species/tag")
    p.add_argument("--lut-bases", type=int, default=12)
    p.add_argument("-F", "--log", default=None)
    args = p.parse_args(argv)
    log = open_diagnostics(args.log)
    sw = StopWatch()
    from .index.build import build_index_from_fasta, save_index

    idx = build_index_from_fasta(args.infasta, lut_bases=args.lut_bases)
    log.info(
        "indexed %d entries, %d bp total in %.1fs",
        idx.num_entries, idx.total_len, sw.mark("build"),
    )
    save_index(idx, args.out)
    log.info("index written to %s (%.1fs)", args.out, sw.elapsed())
    return 0


# ---------------------------------------------------------------- align ----

def cmd_align(argv: list[str]) -> int:
    """`biokanga align` parity: reads FASTA/FASTQ vs index -> SAM
    (reference front-end biokanga/kanga.cpp)."""
    p = argparse.ArgumentParser(prog="biokanga-tpu align")
    p.add_argument("-i", "--inreads", action="append", required=True)
    p.add_argument("-u", "--pair", action="append", default=None,
                   help="PE 3' mate file(s); enables paired-end processing")
    p.add_argument("-d", "--pairminlen", type=int, default=100)
    p.add_argument("-D", "--pairmaxlen", type=int, default=1000)
    p.add_argument("-E", "--pairstrand", action="store_true",
                   help="accept mates on the same strand")
    p.add_argument("-I", "--sfx", required=True, help="index file from `index`")
    p.add_argument("-o", "--out", required=True, help="output SAM path")
    p.add_argument("-O", "--snpfile", default=None,
                   help="call SNPs and write reference-layout CSV here")
    p.add_argument("--snpvcf", default=None, help="also write SNPs as VCF")
    p.add_argument("-p", "--minsnpreads", type=int, default=5)
    p.add_argument("-P", "--qvalue", type=float, default=0.05)
    p.add_argument("--snpnonrefpcnt", type=float, default=25.0)
    p.add_argument("-s", "--substitutions", type=int, default=10,
                   help="max subs per 100bp (default 10)")
    p.add_argument("-e", "--editdelta", type=int, default=1, choices=(1, 2))
    p.add_argument("-m", "--mode", default="default",
                   choices=("ultra", "more", "default", "less"))
    p.add_argument("-Q", "--strand", default="both",
                   choices=("both", "sense", "antisense"))
    p.add_argument("-R", "--maxmulti", type=int, default=5)
    p.add_argument("--batch-size", type=int, default=4096)
    p.add_argument("-F", "--log", default=None)
    args = p.parse_args(argv)
    log = open_diagnostics(args.log)
    sw = StopWatch()

    from .align.params import AlignParams, Sensitivity
    from .align.pipeline import AlignEngine, pad_rows
    from .align.sam import write_alignments_sam
    from .index.build import load_index
    from .index.device import to_device
    from .seq.fasta import read_blocks

    idx = load_index(args.sfx)
    didx = to_device(idx)
    log.info("index loaded: %d bp, %d entries (%.1fs)",
             idx.total_len, idx.num_entries, sw.mark("load"))
    params = AlignParams(
        max_subs_per100=args.substitutions,
        min_edit_dist=args.editdelta,
        max_multi=args.maxmulti,
        mode=Sensitivity(args.mode),
        strand=args.strand,
        batch_size=args.batch_size,
    )
    engine = AlignEngine(didx, params)

    if args.pair:
        from .align.pe import PEAligner, PEParams
        from .align.sam import write_pe_sam

        pe = PEAligner(
            engine,
            PEParams(
                pair_min_len=args.pairminlen,
                pair_max_len=args.pairmaxlen,
                pair_same_strand=args.pairstrand,
            ),
        )
        n_pairs = n_proper = 0
        with open(args.out, "w") as out:
            first = True
            for p1, p2 in zip(args.inreads, args.pair):
                for blk1, blk2 in zip(
                    read_blocks(p1, block_size=args.batch_size),
                    read_blocks(p2, block_size=args.batch_size),
                ):
                    r1, l1 = pad_rows(blk1.codes, blk1.lengths)
                    r2, l2 = pad_rows(blk2.codes, blk2.lengths)
                    res = pe.align_pairs(r1, l1, r2, l2)
                    nb = len(blk1.names)
                    sub = lambda d: {
                        k: (v[:nb] if hasattr(v, "__len__") else v)
                        for k, v in d.items()
                    }
                    res_v = {
                        "res1": sub(res["res1"]), "res2": sub(res["res2"]),
                        "proper": res["proper"][:nb],
                        "insert": res["insert"][:nb],
                    }
                    write_pe_sam(
                        out, idx.entry_names, idx.entry_starts,
                        blk1.names, blk1.codes, blk1.lengths,
                        blk2.names, blk2.codes, blk2.lengths,
                        res_v, write_header=first,
                    )
                    first = False
                    n_pairs += nb
                    n_proper += int(res["proper"][:nb].sum())
        log.info(
            "paired %d pairs: %d proper (%.2f%%) in %.1fs",
            n_pairs, n_proper, 100.0 * n_proper / max(n_pairs, 1), sw.elapsed(),
        )
        return 0

    pileup = None
    if args.snpfile:
        from .align.snp import PileupAccumulator

        pileup = PileupAccumulator(didx)

    n_total = n_unique = n_multi = n_none = 0
    with open(args.out, "w") as out:
        first = True
        for path in args.inreads:
            for blk in read_blocks(path, block_size=args.batch_size):
                codes, lens = pad_rows(blk.codes, blk.lengths)
                res = engine.align_with_rescue(codes, lens)
                if pileup is not None:
                    pileup.add_alignments(codes, lens, res)
                write_alignments_sam(
                    out, idx.entry_names, idx.entry_starts,
                    blk.names, blk.codes, blk.lengths, res,
                    write_header=first,
                )
                first = False
                n = len(blk.names)
                u = int(res["unique"].sum())
                h = int(res["any_hit"].sum())
                n_total += n
                n_unique += u
                n_multi += h - u
                n_none += n - h
    log.info(
        "aligned %d reads: %d unique (%.2f%%), %d multi, %d unaligned in %.1fs"
        " (%.0f reads/s)",
        n_total, n_unique, 100.0 * n_unique / max(n_total, 1), n_multi, n_none,
        sw.elapsed(), n_total / max(sw.elapsed(), 1e-9),
    )

    if pileup is not None:
        from .align.snp import SNPParams, call_snps, write_snps_csv, write_snps_vcf

        counts, match, mismatch = pileup.finalize()
        calls = call_snps(
            counts, match, mismatch, idx.codes, idx.entry_names,
            idx.entry_starts,
            SNPParams(
                min_snp_reads=args.minsnpreads,
                snp_nonref_pcnt=args.snpnonrefpcnt / 100.0,
                qvalue=args.qvalue,
            ),
        )
        write_snps_csv(args.snpfile, calls)
        if args.snpvcf:
            write_snps_vcf(args.snpvcf, calls, idx.entry_names,
                           np.diff(idx.entry_starts))
        log.info("called %d SNPs -> %s", len(calls), args.snpfile)
    return 0


# ------------------------------------------------------------- simreads ----

def cmd_simreads(argv: list[str]) -> int:
    """`biokanga simreads` parity (biokanga/SimReads.cpp)."""
    p = argparse.ArgumentParser(prog="biokanga-tpu simreads")
    p.add_argument("-i", "--infasta", required=True)
    p.add_argument("-o", "--out", required=True, help="output FASTA/FASTQ")
    p.add_argument("-O", "--out2", default=None,
                   help="PE mate-2 output file (with --pe)")
    p.add_argument("-n", "--numreads", type=int, default=10000)
    p.add_argument("-l", "--readlen", type=int, default=100)
    p.add_argument("--sub-rate", type=float, default=0.0)
    p.add_argument("--pe", action="store_true")
    p.add_argument("--insert-min", type=int, default=200)
    p.add_argument("--insert-max", type=int, default=500)
    p.add_argument("--seed", type=int, default=1)
    args = p.parse_args(argv)
    from .seq.fasta import read_seqs, write_fasta, write_fastq
    from .sim.simreads import simulate_reads

    seqs = [(r.name, r.codes) for r in read_seqs(args.infasta)]
    names, codes, truths = simulate_reads(
        seqs, args.numreads, read_len=args.readlen,
        sub_rate=args.sub_rate, seed=args.seed, pe=args.pe,
        insert_min=args.insert_min, insert_max=args.insert_max,
    )

    def write(path, recs):
        if path.endswith((".fastq", ".fq", ".fastq.gz", ".fq.gz")):
            write_fastq(path, ((n, c, None) for n, c in recs))
        else:
            write_fasta(path, recs)

    if args.pe and args.out2:
        write(args.out, ((names[i], codes[i]) for i in range(0, len(names), 2)))
        write(args.out2, ((names[i], codes[i]) for i in range(1, len(names), 2)))
    else:
        write(args.out, zip(names, codes))
    return 0


SUBCOMMANDS = {
    "index": cmd_index,
    "align": cmd_align,
    "simreads": cmd_simreads,
}


def main(argv: list[str] | None = None) -> int:
    argv = _expand_response_files(list(sys.argv[1:] if argv is None else argv))
    if not argv or argv[0] in ("-h", "--help"):
        names = ", ".join(sorted(SUBCOMMANDS))
        print(f"biokanga-tpu {__version__}\nsubcommands: {names}")
        return 0
    if argv[0] in ("-v", "--version"):
        print(__version__)
        return 0
    cmd = argv[0]
    if cmd not in SUBCOMMANDS:
        print(f"unknown subcommand '{cmd}'", file=sys.stderr)
        return 2
    return SUBCOMMANDS[cmd](argv[1:])


if __name__ == "__main__":
    raise SystemExit(main())
