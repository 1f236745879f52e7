"""Device-resident index arrays (HBM) + transfer from the host build."""
from __future__ import annotations

from dataclasses import dataclass

import jax
import jax.numpy as jnp
import numpy as np

from .build import GenomeIndex


@dataclass
class DeviceIndex:
    """HBM-resident arrays of a GenomeIndex (single shard).

    The sharded multi-chip variant lives in biokanga_tpu/parallel/.
    """

    genome: jax.Array        # (n,) int8
    entry_starts: jax.Array  # (E+1,) int32 (single shard < 2^31 bases)
    pos_sorted: jax.Array    # (n,) int32
    key_hi: jax.Array        # (n,) uint32
    key_lo: jax.Array        # (n,) uint32
    lut: jax.Array           # (4^P+1,) int32
    lut_bases: int
    entry_names: list[str]

    @property
    def total_len(self) -> int:
        return int(self.genome.shape[0])


def to_device(idx: GenomeIndex, device=None) -> DeviceIndex:
    put = lambda a: jax.device_put(np.asarray(a), device)
    return DeviceIndex(
        genome=put(idx.codes),
        entry_starts=put(idx.entry_starts.astype(np.int32)),
        pos_sorted=put(idx.pos_sorted.astype(np.int32)),
        key_hi=put(idx.key_hi),
        key_lo=put(idx.key_lo),
        lut=put(idx.lut.astype(np.int32)),
        lut_bases=idx.lut_bases,
        entry_names=list(idx.entry_names),
    )
