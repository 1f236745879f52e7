"""Pallas batched columnwise bitonic sort — the aligner's sort kernel.

The aligner's two hot sorts (align/pipeline.py) are COLUMNWISE: a (C, B)
int32 matrix holds C candidates for each of B reads in lanes, sorted
along the candidate (sublane) axis.  `jax.lax.sort(dimension=0)` lowers
to a bitonic network of ~log2(C)*(log2(C)+1)/2 stages, each a separate
HBM-resident pass — at (512, 32768) that is ~45 round trips of the full
matrix through HBM, and the measured 6.3 ms final-sort cost of the
round-2 stage profile (PERF.md) is within 20% of exactly that traffic
bound.  This kernel runs the ENTIRE network on a VMEM-resident
(C, TILE_B) tile: one HBM read + one HBM write per element, ~45x less
HBM traffic, with the compare-exchange partner fetched by sublane rolls
(pltpu.roll — no gathers anywhere).

Two entry points, drop-in for the pipeline's lax.sort calls:
  sort_cols(x)            == lax.sort(x, dimension=0)
  sort2_cols(key, val)    == lax.sort((key, val), dimension=0, num_keys=2)

Both require C to be a power of two (callers pad with INT32_MAX
sentinels, which sort last — the pipeline already uses that sentinel for
invalid candidates) and fall back to lax.sort off-TPU or for shapes the
kernel does not cover (tests exercise the kernel itself in interpreter
mode, see tests/test_pallas_sort.py).

Reference semantics replaced: the per-thread tsIdentNode dedup hash and
qsort of hit loci (libbiokanga/SfxArrayV2.h:15-16, CMTqsort
SfxArrayV2.cpp:9451) — here a batch-parallel sort network per read.
"""
from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_I32_MAX = np.int32(2**31 - 1)

# lane tile: 512 reads per kernel instance keeps VMEM per buffer at
# C*512*4 = 1 MB for C=512 (two buffers + partners + temps < 8 MB)
TILE_B = 512
MAX_C = 1024


def _net_stages(C: int):
    """Static (size, stride) schedule of the bitonic network for C rows."""
    stages = []
    size = 2
    while size <= C:
        stride = size // 2
        while stride >= 1:
            stages.append((size, stride))
            stride //= 2
        size *= 2
    return stages


def _stage(x, y, size: int, stride: int, row):
    """One compare-exchange stage on (C, Bt) arrays x (primary key) and
    optionally y (secondary key / payload); `row` is the (C, 1) iota.

    Element i partners with i ^ stride; ascending iff (i & size) == 0.
    Partner values arrive by two sublane rolls and a row-mask select —
    static control flow only."""
    C = x.shape[0]
    up_shift = (C - stride) % C       # pltpu.roll wants shifts >= 0
    up = (row & size) == 0            # (C, 1) ascending-block mask
    lo = (row & stride) == 0          # (C, 1) partner is below (i + stride)
    px = jnp.where(lo, pltpu.roll(x, up_shift, 0), pltpu.roll(x, stride, 0))
    if y is not None:
        py = jnp.where(lo, pltpu.roll(y, up_shift, 0),
                       pltpu.roll(y, stride, 0))
        gt = (x > px) | ((x == px) & (y > py))
    else:
        py = None
        gt = x > px
    # keep the smaller iff (ascending == is-lower-partner-slot);
    # select(ws, gt, ~gt) == (gt == ws) — bool-select doesn't lower in
    # Mosaic (i8->i1 trunci), the equality does
    want_small = up == lo
    swap = gt == want_small
    # tie (x == px, and y == py): swap is False both sides — stable no-op
    nx = jnp.where(swap, px, x)
    ny = None if y is None else jnp.where(swap, py, y)
    return nx, ny


def _sort_kernel(x_ref, o_ref, *, C: int):
    x = x_ref[:]
    row = jax.lax.broadcasted_iota(jnp.int32, (C, 1), 0)
    for size, stride in _net_stages(C):
        x, _ = _stage(x, None, size, stride, row)
    o_ref[:] = x


def _sort2_kernel(k_ref, v_ref, ok_ref, ov_ref, *, C: int):
    k = k_ref[:]
    v = v_ref[:]
    row = jax.lax.broadcasted_iota(jnp.int32, (C, 1), 0)
    for size, stride in _net_stages(C):
        k, v = _stage(k, v, size, stride, row)
    ok_ref[:] = k
    ov_ref[:] = v


def _kernel_ok(C: int, B: int) -> bool:
    import os

    if os.environ.get("BIOKANGA_TPU_PALLAS_SORT", "1") in ("0", "off"):
        return False
    return (
        C & (C - 1) == 0
        and 2 <= C <= MAX_C
        and B % TILE_B == 0
        and jax.default_backend() == "tpu"
    )


@partial(jax.jit, static_argnames=("interpret",))
def _run_sort(x, interpret=False):
    C, B = x.shape
    return pl.pallas_call(
        partial(_sort_kernel, C=C),
        out_shape=jax.ShapeDtypeStruct((C, B), x.dtype),
        grid=(B // TILE_B,),
        in_specs=[pl.BlockSpec((C, TILE_B), lambda i: (0, i),
                               memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec((C, TILE_B), lambda i: (0, i),
                               memory_space=pltpu.VMEM),
        interpret=interpret,
    )(x)


@partial(jax.jit, static_argnames=("interpret",))
def _run_sort2(k, v, interpret=False):
    C, B = k.shape
    spec = pl.BlockSpec((C, TILE_B), lambda i: (0, i),
                        memory_space=pltpu.VMEM)
    return pl.pallas_call(
        partial(_sort2_kernel, C=C),
        out_shape=(jax.ShapeDtypeStruct((C, B), k.dtype),
                   jax.ShapeDtypeStruct((C, B), v.dtype)),
        grid=(B // TILE_B,),
        in_specs=[spec, spec],
        out_specs=(spec, spec),
        interpret=interpret,
    )(k, v)


def sort_cols(x: jax.Array) -> jax.Array:
    """lax.sort(x, dimension=0) for (C, B) int32, Pallas-accelerated when
    C is a power of two and B tiles by TILE_B (else XLA fallback)."""
    C, B = x.shape
    if not _kernel_ok(C, B):
        return jax.lax.sort(x, dimension=0)
    return _run_sort(x)


def sort2_cols(key: jax.Array, val: jax.Array):
    """lax.sort((key, val), dimension=0, num_keys=2) — two-key columnwise
    sort, Pallas-accelerated under the same shape conditions."""
    C, B = key.shape
    if not _kernel_ok(C, B):
        return jax.lax.sort((key, val), dimension=0, num_keys=2)
    return _run_sort2(key, val)


def pad_pow2_rows(x: jax.Array, fill) -> jax.Array:
    """Pad dim 0 up to the next power of two with `fill` (sorts last when
    fill = INT32_MAX)."""
    C = x.shape[0]
    P = 1 << (C - 1).bit_length()
    if P == C:
        return x
    return jnp.pad(x, ((0, P - C), (0, 0)), constant_values=fill)
