"""Aligner parameters — reference-compatible defaults and ladders.

Numeric behavior mirrors the reference CLI/engine:
- subs per 100bp default 10, cap 63        (biokanga/Aligner.h:21,23)
- editdelta (MMDelta) default 1, max 2     (biokanga/kanga.cpp:247,770)
- maxmulti default 5, user cap 500         (biokanga/Aligner.h:61-62)
- MinCoreLen ladder by genome size + mode  (biokanga/Aligner.cpp:8722-8760)
- per-read MaxTotMM / CoreLen / CoreDelta  (biokanga/Aligner.cpp:9084-9097)
- core slide offset sequence               (libbiokanga/SfxArrayV2.cpp:5829-5848)
"""
from __future__ import annotations

from dataclasses import dataclass, field
from enum import Enum

C_MIN_CORE_LEN = 4          # Aligner.h:24
C_MAX_TOT_ALLOWED_SUBS = 63  # Aligner.h:23
C_DFLT_ALLOWED_SUBS = 10     # Aligner.h:21
C_DFLT_MAX_MULTI = 5         # Aligner.h:61


class Sensitivity(str, Enum):
    ULTRA = "ultra"      # ePMUltraSens: slides 9, +0 core
    MORE = "more"        # ePMMoreSens: slides 8, +1 core
    DEFAULT = "default"  # ePMdefault:  slides 8, +2 core
    LESS = "less"        # less sensitive: slides 6, +4 core


_MODE_CORE_ADD = {
    Sensitivity.ULTRA: 0,
    Sensitivity.MORE: 1,
    Sensitivity.DEFAULT: 2,
    Sensitivity.LESS: 4,
}
_MODE_SLIDES = {
    Sensitivity.ULTRA: 9,
    Sensitivity.MORE: 8,
    Sensitivity.DEFAULT: 8,
    Sensitivity.LESS: 6,
}


def min_core_len(genome_len: int, mode: Sensitivity = Sensitivity.DEFAULT) -> int:
    """The genome-size core ladder (Aligner.cpp:8722-8741) + mode add."""
    if genome_len <= 500_000:
        base = C_MIN_CORE_LEN
    elif genome_len <= 20_000_000:
        base = C_MIN_CORE_LEN + 3
    elif genome_len <= 250_000_000:
        base = C_MIN_CORE_LEN + 7
    elif genome_len <= 3_500_000_000:
        base = C_MIN_CORE_LEN + 8
    else:
        base = C_MIN_CORE_LEN + 11
    return base + _MODE_CORE_ADD[mode]


@dataclass(frozen=True)
class AlignParams:
    max_subs_per100: int = C_DFLT_ALLOWED_SUBS   # -s
    min_edit_dist: int = 1                       # -e (MMDelta), 1..2
    max_multi: int = C_DFLT_MAX_MULTI            # -R
    mode: Sensitivity = Sensitivity.DEFAULT      # -m
    strand: str = "both"                         # -Q: both|sense|antisense
    # TPU batching knobs (no reference analogue; candidate caps replace
    # the reference's per-core iteration cap MaxIter=50000, SfxArrayV2.h:12)
    cand_per_core: int = 48
    rescue_cand_per_core: int = 1024
    # post-dedup unique-locus cap per strand; truncation raises the
    # overflow flag so affected reads go through the rescue pass
    max_cand_per_strand: int = 192
    batch_size: int = 4096

    def derive(self, read_len: int, genome_len: int) -> "DerivedParams":
        if self.max_subs_per100 == 0:
            max_tot_mm = 0
        else:
            max_tot_mm = max(1, int(0.5 + read_len * self.max_subs_per100 / 100.0))
        max_tot_mm = min(max_tot_mm, C_MAX_TOT_ALLOWED_SUBS)
        mcl = min_core_len(genome_len, self.mode)
        denom = max_tot_mm + (1 if self.min_edit_dist == 1 else 2)
        core_len = max(mcl, read_len // denom)
        slides_per100 = _MODE_SLIDES[self.mode]
        max_slides = max(1, (slides_per100 * read_len + 99) // 100)
        core_delta = max(read_len // max_slides - 1, core_len)
        core_len = min(core_len, 32)  # index keys bound compares to 32 bases
        return DerivedParams(
            read_len=read_len,
            max_tot_mm=max_tot_mm,
            core_len=core_len,
            core_delta=core_delta,
            max_slides=max_slides,
            offsets=tuple(
                core_offsets(read_len, core_len, core_delta, max_slides)
            ),
        )


@dataclass(frozen=True)
class DerivedParams:
    read_len: int
    max_tot_mm: int
    core_len: int
    core_delta: int
    max_slides: int
    offsets: tuple[int, ...]


def core_offsets(L: int, core_len: int, core_delta: int, max_slides: int):
    """Replicates LocateCoreMultiples' slide loop exactly
    (SfxArrayV2.cpp:5829-5848): offsets step by CoreDelta; the step before
    the last is shrunk so the final core lands flush with the read end;
    the loop stops when the (possibly shrunken) delta falls to
    <= CoreLen/3 or the slide cap is reached."""
    offs = []
    d = core_delta
    ofs = 0
    slides = 0
    while slides < max_slides and ofs <= L - core_len and d > core_len // 3:
        offs.append(ofs)
        if ofs + core_len + d > L:
            d = L - (ofs + core_len)
        slides += 1
        ofs += d
        if d <= 0:
            break
    return offs
