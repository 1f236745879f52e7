"""Sharded (multi-device) align must equal the single-device path.

Runs on the 8-virtual-CPU-device mesh from conftest.py.
"""
import jax
import numpy as np
import pytest

from biokanga_tpu.align.params import AlignParams
from biokanga_tpu.align.pipeline import AlignEngine
from biokanga_tpu.index.build import build_index
from biokanga_tpu.index.device import to_device
from biokanga_tpu.parallel.sharded import build_sharded_align_fn, make_mesh, shard_index
from biokanga_tpu.sim.simreads import random_genome, simulate_reads


@pytest.mark.parametrize("n_dp,n_sp", [(2, 4), (4, 2), (1, 8), (8, 1)])
def test_sharded_matches_single(n_dp, n_sp):
    assert len(jax.devices()) >= 8, "conftest must provide 8 virtual devices"
    seqs = random_genome([("c1", 12000), ("c2", 9000)], seed=31)
    idx = build_index(seqs, lut_bases=8)
    params = AlignParams(cand_per_core=48)

    names, reads, truths = simulate_reads(
        seqs, 64, read_len=100, sub_rate=0.02, seed=13
    )
    lengths = np.full(len(reads), 100, dtype=np.int32)

    single = AlignEngine(to_device(idx), params).align_batch(reads, lengths)

    mesh = make_mesh(n_dp, n_sp)
    sidx = shard_index(idx, mesh)
    dp = params.derive(100, idx.total_len)
    step = build_sharded_align_fn(mesh, sidx, params, dp, H=params.cand_per_core)
    out = jax.device_get(step(reads, lengths))

    np.testing.assert_array_equal(out["unique"], single["unique"])
    np.testing.assert_array_equal(out["best_mm"], single["best_mm"])
    # locus/strand must agree wherever unique
    u = np.asarray(single["unique"])
    np.testing.assert_array_equal(out["locus"][u], single["locus"][u])
    np.testing.assert_array_equal(out["is_rc"][u], single["is_rc"][u])
    assert np.asarray(single["unique"]).sum() > 50
