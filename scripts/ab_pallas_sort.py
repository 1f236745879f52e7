"""A/B check + timing: Pallas sort kernel in the align pipeline vs
lax.sort fallback, on the real chip.  Asserts bit-identical outputs,
prints both align rates."""
from __future__ import annotations

import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


def run(flag: str):
    os.environ["BIOKANGA_TPU_PALLAS_SORT"] = flag
    # fresh process-level state matters only for the env flag: the flag
    # is read at trace time, so build a fresh engine per setting
    from biokanga_tpu.align.params import AlignParams
    from biokanga_tpu.align.pipeline import AlignEngine
    from biokanga_tpu.index.build import build_index
    from biokanga_tpu.index.device import to_device
    from biokanga_tpu.sim.simreads import random_genome, simulate_reads

    genome_len = 4_600_000
    batch = 32768
    seqs = random_genome([("chr", genome_len)], seed=42)
    idx = build_index(seqs, lut_bases=10)
    _, reads, _ = simulate_reads(seqs, 2 * batch, read_len=100,
                                 sub_rate=0.01, seed=9)
    lengths = np.full(2 * batch, 100, np.int32)
    eng = AlignEngine(to_device(idx), AlignParams(batch_size=batch))
    eng.align_batch(reads[:batch], lengths[:batch])  # compile
    outs = []
    t = float("inf")
    for _ in range(6):
        t0 = time.monotonic()
        o1 = eng.align_batch(reads[:batch], lengths[:batch])
        o2 = eng.align_batch(reads[batch:], lengths[batch:])
        t = min(t, time.monotonic() - t0)
        outs = [o1, o2]
    return outs, 2 * batch / t


if __name__ == "__main__":
    from biokanga_tpu.utils.jaxcache import enable_persistent_cache

    enable_persistent_cache()
    a, rate_a = run("1")
    b, rate_b = run("0")
    for oa, ob in zip(a, b):
        for k in ("unique", "locus", "best_mm", "is_rc", "any_hit"):
            if k in oa:
                assert np.array_equal(oa[k], ob[k]), f"MISMATCH in {k}"
    print(f"bit-identical OK. pallas={rate_a:.0f} reads/s "
          f"fallback={rate_b:.0f} reads/s speedup={rate_a/rate_b:.3f}x")
