"""Pallas columnwise bitonic sort vs lax.sort (interpreter mode on CPU).

The kernel itself (network schedule, roll-based partner exchange, two-key
lexicographic compare) is exercised through pallas interpret=True so the
test runs on the CPU conftest backend; the TPU fast path compiles the
identical kernel body.
"""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from biokanga_tpu.ops.pallas_sort import (
    TILE_B,
    _run_sort,
    _run_sort2,
    pad_pow2_rows,
)

I32_MAX = np.int32(2**31 - 1)


@pytest.mark.parametrize("C", [2, 8, 64, 256])
def test_single_key_matches_lax_sort(C):
    rng = np.random.default_rng(C)
    x = rng.integers(-(2**30), 2**30, size=(C, TILE_B), dtype=np.int32)
    # sprinkle sentinel ties (the dedup sort's invalid marker)
    x[rng.random(x.shape) < 0.2] = I32_MAX
    got = np.asarray(_run_sort(jnp.asarray(x), interpret=True))
    want = np.asarray(jax.lax.sort(jnp.asarray(x), dimension=0))
    np.testing.assert_array_equal(got, want)


@pytest.mark.parametrize("C", [4, 32, 512])
def test_two_key_matches_lax_sort(C):
    rng = np.random.default_rng(C + 100)
    # small key range forces heavy secondary-key work (mm in 0..20)
    k = rng.integers(0, 20, size=(C, TILE_B), dtype=np.int32)
    v = rng.integers(0, 2**28, size=(C, TILE_B), dtype=np.int32)
    gk, gv = _run_sort2(jnp.asarray(k), jnp.asarray(v), interpret=True)
    wk, wv = jax.lax.sort(
        (jnp.asarray(k), jnp.asarray(v)), dimension=0, num_keys=2
    )
    np.testing.assert_array_equal(np.asarray(gk), np.asarray(wk))
    np.testing.assert_array_equal(np.asarray(gv), np.asarray(wv))


def test_multi_tile_grid():
    rng = np.random.default_rng(3)
    x = rng.integers(0, 1000, size=(16, 2 * TILE_B), dtype=np.int32)
    got = np.asarray(_run_sort(jnp.asarray(x), interpret=True))
    want = np.asarray(jax.lax.sort(jnp.asarray(x), dimension=0))
    np.testing.assert_array_equal(got, want)


def test_pad_pow2_rows():
    x = jnp.zeros((384, 8), jnp.int32)
    p = pad_pow2_rows(x, I32_MAX)
    assert p.shape == (512, 8)
    assert bool((p[384:] == I32_MAX).all())
    assert pad_pow2_rows(p, I32_MAX).shape == (512, 8)
