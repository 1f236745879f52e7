"""Write a uniform-random genome as BOTH int8 codes (.npy) and FASTA.

Used by the 3 Gbp north-star benchmark (VERDICT r2 item 1): the .npy codes
feed the TPU chunk-cycled run (memory-mapped, no 3 GB FASTA parse) and the
FASTA derived from the SAME array feeds the reference binary
(refbuild/bin/biokanga), so both rows measure identical inputs.

Usage: python scripts/gen_genome_fasta.py OUTDIR --bp 3000000000 --seed 31
Writes OUTDIR/g.npy and OUTDIR/g.fa.
"""
from __future__ import annotations

import argparse
import os

import numpy as np

LINE = 70


def gen_codes(path_npy: str, n_bp: int, seed: int,
              chunk: int = 100_000_000) -> None:
    rng = np.random.default_rng(seed)
    out = np.lib.format.open_memmap(path_npy, mode="w+", dtype=np.int8,
                                    shape=(n_bp,))
    done = 0
    while done < n_bp:
        m = min(chunk, n_bp - done)
        out[done : done + m] = rng.integers(0, 4, size=m, dtype=np.int8)
        done += m
    out.flush()


def codes_to_fasta(path_npy: str, path_fa: str, name: str = "chr1",
                   chunk: int = 70_000_000) -> None:
    codes = np.load(path_npy, mmap_mode="r")
    n_bp = len(codes)
    lut = np.frombuffer(b"ACGTN", dtype=np.uint8)
    nl = np.uint8(10)
    with open(path_fa, "wb") as f:
        f.write(f">{name}\n".encode())
        done = 0
        while done < n_bp:
            m = min(chunk, n_bp - done)
            if done + m < n_bp:
                m -= m % LINE
            b = lut[codes[done : done + m]]
            full = (m // LINE) * LINE
            rows = b[:full].reshape(-1, LINE)
            block = np.empty((rows.shape[0], LINE + 1), dtype=np.uint8)
            block[:, :LINE] = rows
            block[:, LINE] = nl
            block.tofile(f)
            if full < m:
                b[full:].tofile(f)
                f.write(b"\n")
            done += m


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("outdir")
    ap.add_argument("--bp", type=int, default=3_000_000_000)
    ap.add_argument("--seed", type=int, default=31)
    ap.add_argument("--name", default="chr1")
    a = ap.parse_args()
    os.makedirs(a.outdir, exist_ok=True)
    npy = os.path.join(a.outdir, "g.npy")
    gen_codes(npy, a.bp, a.seed)
    codes_to_fasta(npy, os.path.join(a.outdir, "g.fa"), a.name)


if __name__ == "__main__":
    main()
