"""Pallas banded SW score kernel vs the lax.scan kernel and the numpy
full-matrix oracle (interpreter mode on the CPU backend)."""
import numpy as np

from biokanga_tpu.ops.pallas_sw import banded_sw_score
from biokanga_tpu.ops.sw import banded_sw_batch, sw_score_numpy


def _noisy_pair(rng, L, err):
    a = rng.integers(0, 4, L, np.int8)
    out = []
    for c in a:
        r = rng.random()
        if r < err * 0.3:
            continue
        if r < err * 0.6:
            out.append(rng.integers(0, 4))
        if rng.random() < err * 0.4:
            out.append((c + 1 + rng.integers(0, 3)) % 4)
        else:
            out.append(c)
    return a, np.array(out, np.int8)


def test_matches_scan_kernel_banded():
    rng = np.random.default_rng(3)
    B, La, Lb, W = 4, 192, 224, 24
    a = rng.integers(0, 4, (B, La), np.int8)
    b = np.full((B, Lb), 4, np.int8)
    blen = np.zeros(B, np.int32)
    diag = np.zeros(B, np.int32)
    for p in range(B):
        _, nb = _noisy_pair(rng, La, 0.08)
        nb = nb[:Lb]
        b[p, : len(nb)] = rng.integers(0, 4, len(nb), np.int8) \
            if p == 3 else nb
        blen[p] = len(nb)
        diag[p] = rng.integers(-8, 8)
    a2 = a.copy()
    a2[1] = b[1, :La]              # perfect diagonal pair
    alen = np.full(B, La, np.int32)
    want_best, want_i, want_k, _ = banded_sw_batch(
        a2, b, alen, blen, diag, W, La, Lb)
    got_best, got_i, got_k = banded_sw_score(
        a2, b, alen, blen, diag, W, interpret=True)
    assert np.array_equal(np.asarray(want_best), np.asarray(got_best))
    # best score equal is the contract; cell may differ only on ties
    same = np.asarray(want_i) == np.asarray(got_i)
    assert same.sum() >= B - 1, (want_i, got_i)


def test_matches_numpy_oracle_wide_band():
    rng = np.random.default_rng(9)
    La = 96
    a, nb = _noisy_pair(rng, La, 0.1)
    Lb = len(nb)
    W = max(La, Lb)  # band covers the full matrix -> equals full SW
    b = nb[None, :]
    got, _, _ = banded_sw_score(
        a[None, :], b, np.array([La], np.int32),
        np.array([Lb], np.int32), np.array([0], np.int32), W,
        interpret=True)
    assert int(got[0]) == sw_score_numpy(a, nb)


def test_respects_blen_and_alen():
    rng = np.random.default_rng(5)
    a = rng.integers(0, 4, (1, 64), np.int8)
    b = np.concatenate([a[0][:48], rng.integers(0, 4, 16, np.int8)])
    got_full, _, _ = banded_sw_score(
        a, b[None, :], np.array([64], np.int32), np.array([64], np.int32),
        np.array([0], np.int32), 8, interpret=True)
    got_cut, _, _ = banded_sw_score(
        a, b[None, :], np.array([32], np.int32), np.array([64], np.int32),
        np.array([0], np.int32), 8, interpret=True)
    assert int(got_cut[0]) == 32  # truncated query caps the chain
    assert int(got_full[0]) >= 48


def test_moves_kernel_and_packed_traceback_match_scan_path():
    """banded_sw_moves + traceback_cols_packed must reproduce the scan
    path (banded_sw_batch + traceback_align_batch) bit-for-bit: same
    best scores AND same per-column decode outputs."""
    import jax.numpy as jnp

    from biokanga_tpu.ops.pallas_sw import banded_sw_moves
    from biokanga_tpu.ops.sw import traceback_align_batch
    from biokanga_tpu.ops.sw_trace import traceback_cols_packed

    rng = np.random.default_rng(11)
    B, La, Lb, W = 6, 256, 288, 24
    a = np.full((B, La), 4, np.int8)
    alen = np.zeros(B, np.int32)
    b = np.full((B, Lb), 4, np.int8)
    blen = np.zeros(B, np.int32)
    diag = np.zeros(B, np.int32)
    for p in range(B):
        q, nb = _noisy_pair(rng, La - rng.integers(0, 32), 0.12)
        nb = nb[:Lb]
        a[p, : len(q)] = q
        alen[p] = len(q)
        b[p, : len(nb)] = nb
        blen[p] = len(nb)
        diag[p] = rng.integers(-10, 10)
    a[3, 40:44] = 4  # interior Ns
    want_best, want_i, want_k, moves = banded_sw_batch(
        a, b, alen, blen, diag, W, La, Lb)
    w_out, w_insc, w_insb = traceback_align_batch(
        moves, want_i, want_k, jnp.asarray(diag), jnp.asarray(b),
        jnp.asarray(blen), W, La)

    best, bi, bk, mv, bwin = banded_sw_moves(
        a, b, alen, blen, diag, W, interpret=True)
    assert np.array_equal(np.asarray(want_best), np.asarray(best))
    g_out, g_insc, g_insb = traceback_cols_packed(
        mv, bi, bk, jnp.asarray(bwin), W, La)

    # decode comparison on pairs where the best CELL matches (ties may
    # pick different cells; scores already asserted equal)
    same = (np.asarray(want_i) == np.asarray(bi)) & (
        np.asarray(want_k) == np.asarray(bk))
    assert same.sum() >= B - 1
    np.testing.assert_array_equal(np.asarray(g_out)[same],
                                  np.asarray(w_out)[same])
    np.testing.assert_array_equal(np.asarray(g_insc)[same],
                                  np.asarray(w_insc)[same])
    np.testing.assert_array_equal(np.asarray(g_insb)[same],
                                  np.asarray(w_insb)[same])
