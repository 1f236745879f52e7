"""Post-alignment passes over the accepted-hit table.

Parity roles (the CAligner post-pass family, Aligner.cpp:594-672):
- ReducePCRduplicates: reads accepted at the same (locus, strand) are
  PCR artefacts beyond the first; duplicates are demoted to unaccepted
  and counted.
- FiltByPriorityRegions: accepted hits outside a priority-region BED are
  dropped (reference -Y priorityregionbed behavior).
"""
from __future__ import annotations

import numpy as np

from ..seq.annotations import FeatureIndex, read_bed


def reduce_pcr_duplicates(res: dict, lengths: np.ndarray,
                          keep: int = 1) -> int:
    """Demote duplicate accepted hits at identical (locus, strand) beyond
    `keep` copies. Returns number demoted. Mutates res['unique']."""
    acc = np.nonzero(res["unique"])[0]
    seen: dict[tuple, int] = {}
    demoted = 0
    for i in acc:
        key = (int(res["locus"][i]), bool(res["is_rc"][i]))
        c = seen.get(key, 0)
        if c >= keep:
            res["unique"][i] = False
            demoted += 1
        seen[key] = c + 1
    return demoted


class PriorityRegionFilter:
    """Drop accepted hits not overlapping priority regions."""

    def __init__(self, bed_path: str, entry_names, entry_starts):
        feats = read_bed(bed_path)
        self.fidx = FeatureIndex(feats)
        self.entry_names = list(entry_names)
        self.starts = np.asarray(entry_starts)

    def apply(self, res: dict, lengths: np.ndarray) -> int:
        dropped = 0
        for i in np.nonzero(res["unique"])[0]:
            locus = int(res["locus"][i])
            e = int(np.searchsorted(self.starts, locus, "right")) - 1
            chrom = self.entry_names[e]
            s = locus - int(self.starts[e])
            if not self.fidx.overlapping(chrom, s, s + int(lengths[i])):
                res["unique"][i] = False
                dropped += 1
        return dropped
