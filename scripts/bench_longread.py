"""Long-read envelope demo (VERDICT r2 item 8).

1) Reads of 100 Kbp and 256 Kbp (the reference cMaxReadLen,
   libbiokanga/commdefs.h:158-161) with substitution errors, aligned by
   the segment+stitch long-read path (align/longread.py) against a
   10 Mbp genome — verified against the planted locus, forward and rc.
2) Banded SW (ops/sw.py lax.scan wavefront) on a >=100 Kbp pair with
   5% combined sub/indel error — the reference SSW envelope is 256 Kbp
   (pacbiokanga/SSW.h).

Prints one JSON line.
"""
from __future__ import annotations

import argparse
import json
import os
import sys
import time

import numpy as np

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--genome-mbp", type=float, default=10.0)
    ap.add_argument("--sw-len", type=int, default=100_000)
    a = ap.parse_args()

    from biokanga_tpu.utils.jaxcache import enable_persistent_cache

    enable_persistent_cache()
    import jax
    import jax.numpy as jnp

    from biokanga_tpu.align.longread import LongReadAligner
    from biokanga_tpu.align.params import AlignParams
    from biokanga_tpu.align.pipeline import AlignEngine
    from biokanga_tpu.index.build import build_index
    from biokanga_tpu.index.device import to_device
    from biokanga_tpu.seq.encode import revcomp
    from biokanga_tpu.sim.simreads import random_genome

    rng = np.random.default_rng(71)
    gbp = int(a.genome_mbp * 1e6)
    seqs = random_genome([("chr1", gbp)], seed=72)
    codes = seqs[0][1]
    idx = to_device(build_index(seqs))
    eng = AlignEngine(idx, AlignParams(batch_size=4096))
    lra = LongReadAligner(eng)

    out = {"genome_bp": gbp, "reads": []}
    for L, n_subs, as_rc in ((100_000, 40, False), (100_000, 40, True),
                             (262_144, 60, False)):
        st = int(rng.integers(0, gbp - L))
        r = codes[st : st + L].copy()
        pos = rng.choice(L, n_subs, replace=False)
        r[pos] = (r[pos] + rng.integers(1, 4, n_subs)) % 4
        if as_rc:
            r = revcomp(r)
        reads = r[None, :]
        lens = np.array([L], np.int32)
        t0 = time.monotonic()
        res = lra.align(reads, lens)
        dt = time.monotonic() - t0
        out["reads"].append({
            "read_len": L, "planted_subs": n_subs, "rc": as_rc,
            "unique": bool(res["unique"][0]),
            "locus_correct": bool(res["unique"][0]
                                  and int(res["locus"][0]) == st
                                  and bool(res["is_rc"][0]) == as_rc),
            "mm_found": int(res["best_mm"][0]),
            "seconds": round(dt, 2),
        })

    # ---- banded SW on a >=100 Kbp pair ---------------------------------
    from biokanga_tpu.ops.sw import banded_sw_batch

    L = a.sw_len
    st = int(rng.integers(0, gbp - L - 1000))
    w = codes[st : st + L]
    r = []
    for b in w:
        x = rng.random()
        if x < 0.02:
            r.append((b + rng.integers(1, 4)) % 4)
        elif x < 0.035:
            r.append(b)
            r.append(rng.integers(0, 4))
        elif x < 0.05:
            continue
        else:
            r.append(b)
    q = np.array(r, np.int8)
    Lq = len(q)
    W = 1024  # half-band; indel drift over 100 Kbp at 1.5% net ~ +-750
    qa = jnp.asarray(q[None, :])
    ta = jnp.asarray(w[None, :])
    t0 = time.monotonic()
    best, bi, bk, moves = banded_sw_batch(
        qa, ta, jnp.array([Lq], jnp.int32), jnp.array([L], jnp.int32),
        jnp.zeros(1, jnp.int32), W, Lq, L)
    score = int(jax.block_until_ready(best)[0])
    dt = time.monotonic() - t0
    cells = Lq * (2 * W + 1)
    out["banded_sw"] = {
        "query_len": Lq, "target_len": L, "band": band,
        "score": score, "seconds": round(dt, 2),
        "gcups": round(cells / dt / 1e9, 2),
    }
    print(json.dumps({"metric": "longread_envelope", "detail": out}))


if __name__ == "__main__":
    main()
