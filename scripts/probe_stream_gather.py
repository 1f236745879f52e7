"""Probe the Pallas streaming-tile gather (ops/stream_gather.py)
against XLA plain / masked dual-half gathers on a past-the-cliff table
(VERDICT r4 item 4).  Chained-execution timing (round-4 methodology:
block_until_ready does not wait on the axon backend).

Usage: python scripts/probe_stream_gather.py [--mb 128] [--n 6291456]
       [--interpret]   # CPU correctness check (tiny shapes)
"""
from __future__ import annotations

import argparse
import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)


def chained_time(fn, args, n=4):
    """Chain n dependent executions; one device_get at the end."""
    import jax

    out = fn(*args)
    out.block_until_ready()
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
    ap.add_argument("--tile-rows", type=int, default=4096)
    ap.add_argument("--interpret", action="store_true")
    a = ap.parse_args()

    if a.interpret:
        os.environ.setdefault("JAX_PLATFORMS", "cpu")

    import jax
    import jax.numpy as jnp
    import numpy as np

    from biokanga_tpu.ops.stream_gather import stream_gather_consume

    if a.interpret:
        from jax.experimental.pallas import tpu as pltpu

        pltpu.set_tpu_interpret_mode()
        a.mb, a.n, a.tile_rows = 0.05, 3_000, 256

    R = int(a.mb * 1e6 / 64)
    rng = np.random.default_rng(0)
    table = jnp.asarray(rng.integers(0, 2**32, size=(R, 16),
                                     dtype=np.uint32))
    idx = jnp.asarray(rng.integers(0, R, size=a.n, dtype=np.int32))
    print(f"table {table.nbytes / 1e6:.0f} MB ({R} rows), {a.n} gathers",
          flush=True)

    def consume(v, i_):
        return (v ^ i_[:, None].astype(jnp.uint32)).sum(dtype=jnp.uint32)

    f_plain = jax.jit(lambda t_, i_: consume(t_[i_], i_))
    want = int(jax.device_get(f_plain(table, idx)))
    if not a.interpret:
        t = chained_time(f_plain, (table, idx))
        print(f"xla plain              {t*1e3:8.1f} ms  "
              f"{a.n/t/1e6:7.1f} M rows/s", flush=True)

    for name, kw in (
        ("pallas take", dict(use_mxu=False)),
        ("pallas mxu ", dict(use_mxu=True)),
    ):
        for S in (a.tile_rows, a.tile_rows * 4):
            try:
                f = lambda t_, i_: stream_gather_consume(
                    t_, i_, tile_rows=S, **kw)
                got = int(jax.device_get(f(table, idx)))
                ok = "OK " if got == want else f"BAD got={got} want={want}"
                if a.interpret:
                    print(f"{name} S={S:6d}  {ok}", flush=True)
                    continue
                t = chained_time(f, (table, idx))
                print(f"{name} S={S:6d} {t*1e3:8.1f} ms  "
                      f"{a.n/t/1e6:7.1f} M rows/s  {ok}", flush=True)
            except Exception as e:
                print(f"{name} S={S:6d}  FAILED: "
                      f"{str(e).splitlines()[0][:200]}", flush=True)


if __name__ == "__main__":
    main()
