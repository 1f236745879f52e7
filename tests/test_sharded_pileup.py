"""Sharded psum pileup == single-device pileup."""
import jax
import numpy as np

from biokanga_tpu.align.params import AlignParams
from biokanga_tpu.align.pipeline import AlignEngine
from biokanga_tpu.align.snp import PileupAccumulator
from biokanga_tpu.index.build import build_index
from biokanga_tpu.index.device import to_device
from biokanga_tpu.parallel.sharded import (
    build_sharded_pileup_fn,
    make_mesh,
    shard_index,
)
from biokanga_tpu.seq.encode import revcomp
from biokanga_tpu.sim.simreads import random_genome, simulate_reads


def test_sharded_pileup_matches_single():
    assert len(jax.devices()) >= 8
    seqs = random_genome([("c", 8000)], seed=3)
    idx = build_index(seqs, lut_bases=8)
    didx = to_device(idx)
    engine = AlignEngine(didx, AlignParams())
    names, reads, _ = simulate_reads(seqs, 64, read_len=100,
                                     sub_rate=0.02, seed=8)
    lens = np.full(64, 100, np.int32)
    res = engine.align_with_rescue(reads, lens)

    # single-device pileup
    acc = PileupAccumulator(didx)
    acc.add_alignments(reads, lens, res)
    c1, m1, mm1 = acc.finalize()

    # sharded pileup
    aligned = reads.copy()
    for i in np.nonzero(res["is_rc"] & res["unique"])[0]:
        aligned[i] = revcomp(reads[i])
    mesh = make_mesh(4, 2)
    sidx = shard_index(idx, mesh)
    pile = build_sharded_pileup_fn(mesh, sidx)
    c2, m2, mm2 = jax.device_get(
        pile(res["locus"].astype(np.int32), aligned, lens, res["unique"])
    )
    np.testing.assert_array_equal(np.asarray(c2), c1)
    np.testing.assert_array_equal(np.asarray(m2), m1)
    np.testing.assert_array_equal(np.asarray(mm2), mm1)
    assert c1.sum() > 0
