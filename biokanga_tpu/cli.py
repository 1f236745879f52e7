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
    p.add_argument("-I", "--sfx", required=True, help="index file from `index`")
    p.add_argument("-o", "--out", required=True, help="output SAM path")
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

    n_total = n_unique = n_multi = n_none = 0
    with open(args.out, "w") as out:
        first = True
        for path in args.inreads:
            for blk in read_blocks(path, block_size=args.batch_size):
                codes, lens = pad_rows(blk.codes, blk.lengths)
                res = engine.align_with_rescue(codes, lens)
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
    return 0


# ------------------------------------------------------------- simreads ----

def cmd_simreads(argv: list[str]) -> int:
    """`biokanga simreads` parity (biokanga/SimReads.cpp)."""
    p = argparse.ArgumentParser(prog="biokanga-tpu simreads")
    p.add_argument("-i", "--infasta", required=True)
    p.add_argument("-o", "--out", required=True, help="output FASTA/FASTQ")
    p.add_argument("-n", "--numreads", type=int, default=10000)
    p.add_argument("-l", "--readlen", type=int, default=100)
    p.add_argument("--sub-rate", type=float, default=0.0)
    p.add_argument("--pe", action="store_true")
    p.add_argument("--seed", type=int, default=1)
    args = p.parse_args(argv)
    from .seq.encode import codes_to_ascii
    from .seq.fasta import read_seqs, write_fasta, write_fastq
    from .sim.simreads import simulate_reads

    seqs = [(r.name, r.codes) for r in read_seqs(args.infasta)]
    names, codes, truths = simulate_reads(
        seqs, args.numreads, read_len=args.readlen,
        sub_rate=args.sub_rate, seed=args.seed, pe=args.pe,
    )
    if args.out.endswith((".fastq", ".fq", ".fastq.gz", ".fq.gz")):
        write_fastq(args.out, ((n, c, None) for n, c in zip(names, codes)))
    else:
        write_fasta(args.out, zip(names, codes))
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
