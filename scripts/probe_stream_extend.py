"""Verify + benchmark stream_extend_mm (the streaming-gather extension
integration, VERDICT r4 item 4 second half) against
hamming_extend_packed:

  1. exactness on a small genome (bit-equal mm incl. read Ns, entry
     splits, out-of-range loci),
  2. chained-execution timing on a past-the-cliff table (250 Mbp chunk
     = 125 MB of packed rows, the 3 Gbp sweep's per-chunk shape).

Usage: python scripts/probe_stream_extend.py
"""
from __future__ import annotations

import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)


def chained_time(fn, args, n=4):
    import jax

    out = fn(*args)
    jax.device_get(out)
    t0 = time.monotonic()
    o = None
    for _ in range(n):
        o = fn(*args)
    jax.device_get(o)
    return (time.monotonic() - t0) / n


def main():
    import jax
    import jax.numpy as jnp
    import numpy as np

    from biokanga_tpu.ops import extend_packed as ep
    from biokanga_tpu.ops.stream_gather import stream_extend_mm

    rng = np.random.default_rng(0)

    # ---- exactness: 1 Mbp genome, 2 entries, reads with Ns ----
    glen = 1_000_000
    codes = rng.integers(0, 4, size=glen, dtype=np.int8)
    pg = ep.pack_genome(codes)
    B, C, L = 512, 64, 100
    loci = rng.integers(-50, glen - 20, size=(B, C), dtype=np.int32)
    reads = np.zeros((B, L), np.int8)
    for b in range(B):
        st = int(loci[b, 0]) if 0 <= loci[b, 0] < glen - L else 1000
        reads[b] = codes[st: st + L]
    mut = rng.random((B, L)) < 0.03
    reads = np.where(mut, (reads + 1) % 4, reads).astype(np.int8)
    reads[rng.random((B, L)) < 0.01] = 4          # Ns
    lengths = np.full(B, L, np.int32)
    lengths[::7] = 80                              # mixed lengths
    rc, nl = ep.pack_reads(jnp.asarray(reads), jnp.asarray(lengths))
    es = jnp.asarray([0, glen // 2, glen], jnp.int32)  # entry SPLIT
    valid = jnp.asarray(rng.random((B, C)) < 0.9)

    ref = np.asarray(ep.hamming_extend_packed(
        pg, es, jnp.asarray(loci), valid, rc, nl, jnp.asarray(lengths)))
    got = np.asarray(jax.jit(
        lambda rows, l, v, rc_, nl_, ln: stream_extend_mm(
            rows, l, v, rc_, nl_, ln, es, glen,
            tile_lines=512, block=1024)
    )(pg.rows, jnp.asarray(loci), valid, rc, nl, jnp.asarray(lengths)))
    eq = (ref == got).mean()
    print(f"exactness: {eq * 100:.4f}% equal "
          f"({(ref != got).sum()} diffs of {ref.size})", flush=True)
    if eq < 1.0:
        bad = np.argwhere(ref != got)[:5]
        for b, c in bad:
            print(f"  diff at ({b},{c}): locus={loci[b, c]} "
                  f"ref={ref[b, c]} got={got[b, c]}", flush=True)

    # ---- perf: 250 Mbp chunk (125 MB packed rows), 32k x 192 cands ----
    glen2 = 250_000_000
    codes2 = rng.integers(0, 4, size=glen2, dtype=np.int8)
    pg2 = ep.pack_genome(codes2)
    B2, C2 = 32768, 192
    loci2 = jnp.asarray(
        rng.integers(0, glen2 - L, size=(B2, C2), dtype=np.int32))
    reads2 = jnp.asarray(
        rng.integers(0, 4, size=(B2, L), dtype=np.int8))
    len2 = jnp.full(B2, L, jnp.int32)
    rc2, nl2 = ep.pack_reads(reads2, len2)
    v2 = jnp.ones((B2, C2), bool)
    es2 = jnp.asarray([0, glen2], jnp.int32)
    N = B2 * C2
    print(f"table {pg2.rows.nbytes / 1e6:.0f} MB packed rows, "
          f"{N} candidates", flush=True)

    f_ref = jax.jit(lambda: ep.hamming_extend_packed(
        pg2, es2, loci2, v2, rc2, nl2, len2))
    t = chained_time(f_ref, ())
    print(f"hamming_extend_packed (XLA gather) {t * 1e3:8.1f} ms  "
          f"{N / t / 1e6:7.1f} M cand/s", flush=True)

    for SL in (512, 1024, 2048):
        f_s = jax.jit(lambda SL=SL: stream_extend_mm(
            pg2.rows, loci2, v2, rc2, nl2, len2, es2, glen2,
            tile_lines=SL, block=1024))
        a = np.asarray(f_ref())
        b = np.asarray(f_s())
        ok = "OK" if (a == b).all() else f"BAD {(a != b).sum()} diffs"
        t = chained_time(f_s, ())
        print(f"stream_extend_mm SL={SL:5d} {t * 1e3:8.1f} ms  "
              f"{N / t / 1e6:7.1f} M cand/s  {ok}", flush=True)


if __name__ == "__main__":
    main()
