"""A/B the round-3 knobs on the headline SE config (VERDICT r3 item 1).

Grid: fast_pass {on,off} x BIOKANGA_TPU_PALLAS_SORT {1,0}, bench.py's
exact SE shape (262,144 x 100 bp vs 4.6 Mbp, batch 32768, min-of-N
epochs).  Prints one JSON line per cell plus a winner summary; commit
the table to PERF.md.
"""
from __future__ import annotations

import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


def run_cell(fast: bool, pallas: str, epochs: int = 4):
    os.environ["BIOKANGA_TPU_PALLAS_SORT"] = pallas
    from biokanga_tpu.align.params import AlignParams
    from biokanga_tpu.align.pipeline import AlignEngine
    from biokanga_tpu.index.build import build_index
    from biokanga_tpu.index.device import to_device
    from biokanga_tpu.sim.simreads import random_genome, simulate_reads

    genome_len = 4_600_000
    read_len = 100
    batch = 32768
    n_reads = 8 * batch
    seqs = random_genome([("chr", genome_len)], seed=42)
    idx = build_index(seqs, lut_bases=10)
    _, reads, _ = simulate_reads(seqs, n_reads, read_len=read_len,
                                 sub_rate=0.01, seed=9)
    lengths = np.full(len(reads), read_len, dtype=np.int32)
    engine = AlignEngine(to_device(idx),
                         AlignParams(batch_size=batch, fast_pass=fast))
    engine.align_batch(reads[:batch], lengths[:batch])  # compile
    dt = float("inf")
    n_unique = 0
    for _ in range(epochs):
        blocks = ((reads[i:i + batch], lengths[i:i + batch])
                  for i in range(0, n_reads, batch))
        t0 = time.monotonic()
        n_unique = 0
        for res in engine.align_stream(blocks):
            n_unique += int(res["unique"].sum())
        dt = min(dt, time.monotonic() - t0)
    return n_reads / dt, n_unique / n_reads


if __name__ == "__main__":
    from biokanga_tpu.utils.jaxcache import enable_persistent_cache

    enable_persistent_cache()
    results = {}
    for fast in (True, False):
        for pallas in ("1", "0"):
            rps, uf = run_cell(fast, pallas)
            key = f"fast={int(fast)},pallas={pallas}"
            results[key] = {"reads_per_s": round(rps, 0),
                            "unique_frac": round(uf, 4)}
            print(json.dumps({"cell": key, **results[key]}), flush=True)
    best = max(results, key=lambda k: results[k]["reads_per_s"])
    print(json.dumps({"winner": best, **results[best]}))
