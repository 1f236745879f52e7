"""Probe the Pallas streaming-tile gather (ops/stream_gather.py)
against the XLA plain gather on a past-the-cliff table (VERDICT r4
item 4).  Chained-execution timing (round-4 methodology:
block_until_ready does not wait on the axon backend).  Both paths
compute the same byte-wise XOR checksum, so correctness is asserted
bit-for-bit.

Usage: python scripts/probe_stream_gather.py [--mb 128] [--n 6291456]
"""
from __future__ import annotations

import argparse
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
    ap = argparse.ArgumentParser()
    ap.add_argument("--mb", type=float, default=128.0)
    ap.add_argument("--n", type=int, default=6_291_456)
    a = ap.parse_args()

    import jax
    import jax.numpy as jnp
    import numpy as np

    from biokanga_tpu.ops.stream_gather import stream_gather_consume

    R = int(a.mb * 1e6 / 64)
    rng = np.random.default_rng(0)
    table = jnp.asarray(rng.integers(0, 2**32, size=(R, 16),
                                     dtype=np.uint32))
    idx = jnp.asarray(rng.integers(0, R, size=a.n, dtype=np.int32))
    print(f"table {table.nbytes / 1e6:.0f} MB ({R} rows), {a.n} gathers",
          flush=True)

    def consume_bytes(v, i_):
        acc = jnp.uint32(0)
        for k in range(4):
            bk = (v >> jnp.uint32(8 * k)) & jnp.uint32(0xFF)
            gk = (i_[:, None].astype(jnp.uint32)
                  >> jnp.uint32(8 * k)) & jnp.uint32(0xFF)
            acc += jnp.sum(bk ^ gk, dtype=jnp.uint32)
        return acc

    f_plain = jax.jit(lambda t_, i_: consume_bytes(t_[i_], i_))
    want = int(jax.device_get(f_plain(table, idx)))
    t = chained_time(f_plain, (table, idx))
    print(f"xla plain (byte checksum) {t*1e3:8.1f} ms  "
          f"{a.n/t/1e6:7.1f} M rows/s", flush=True)

    for SL, NB in ((256, 1024), (512, 1024), (1024, 1024), (512, 2048)):
        try:
            f = lambda t_, i_: stream_gather_consume(
                t_, i_, tile_lines=SL, block=NB)
            got = int(jax.device_get(f(table, idx)))
            ok = "OK " if got == want else f"BAD got={got} want={want}"
            t = chained_time(f, (table, idx))
            print(f"pallas SL={SL:5d} NB={NB:5d} {t*1e3:8.1f} ms  "
                  f"{a.n/t/1e6:7.1f} M rows/s  {ok}", flush=True)
        except Exception as e:
            print(f"pallas SL={SL:5d} NB={NB:5d}  FAILED: "
                  f"{repr(e)[:300]}", flush=True)


if __name__ == "__main__":
    main()
