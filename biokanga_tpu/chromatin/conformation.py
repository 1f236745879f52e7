"""Octamer conformational-parameter model.

Reference semantics: CConformation::LoadStructOctamersParams
(libbiokanga/Conformation.cpp:45) parses a CSV of 65,536 octamer rows,
each carrying 22 structural characteristics
(twist..shift, tri-step variants, energy, minor groove, rmsd, Q+/Q-
angles, ORChID); CTwister::GetStructParams (libbiokanga/Twister.cpp)
then walks a sequence step-by-step, returning the octamer-indexed value
for each dinucleotide step, interpolating the first/last 3 steps by
padding with eBaseA (Twister.h `Interpolate`).

Here the whole profile is one gather: sliding octamer indices are
computed with a vectorised polynomial accumulation (MSB-first, matching
the reference's GenSeqIdx, gencomposition.cpp:933-945), then
`jnp.take` pulls the per-step values in a single device op.
"""
from __future__ import annotations

import numpy as np

# column order exactly as parsed by LoadStructOctamersParams's sscanf
# (Conformation.cpp:103-109): 10 step params then 12 supplementary.
OCT_PARAM_NAMES = [
    "twist", "roll", "tilt", "rise", "slide", "shift",
    "tristeptwist", "tristeproll", "tristepslide", "tristepshift",
    "energy", "minorgroove", "rmsd",
    "qminustwist", "qplustwist", "qminusroll", "qplusroll",
    "triqminustwist", "triqplustwist", "triqminusroll", "triqplusroll",
    "orchid",
]
N_OCT = 4 ** 8  # 65536

_ACGT = np.full(256, -1, dtype=np.int64)
for _i, _c in enumerate("ACGT"):
    _ACGT[ord(_c)] = _i
    _ACGT[ord(_c.lower())] = _i


def octamer_to_idx(octamer: str) -> int:
    """Octamer string -> MSB-first 16-bit index (GenSeqIdx convention)."""
    vals = _ACGT[np.frombuffer(octamer.encode(), dtype=np.uint8)]
    if len(vals) != 8 or (vals < 0).any():
        raise ValueError(f"bad octamer {octamer!r}")
    return int(np.dot(vals, 4 ** np.arange(7, -1, -1)))


def idx_to_oligo(idx: int, k: int) -> str:
    """Inverse of GenSeqIdx for a k-mer (reference StepIdx2Seq role)."""
    out = []
    for shift in range(2 * (k - 1), -2, -2):
        out.append("ACGT"[(idx >> shift) & 3])
    return "".join(out)


def load_octamer_params(path: str) -> np.ndarray:
    """Parse an octamer structural-parameters CSV into a (65536, 22)
    float32 table (LoadStructOctamersParams file contract: octamer then
    22 comma-separated doubles; whitespace/quotes stripped; a first line
    that fails to parse is treated as a header)."""
    table = np.zeros((N_OCT, len(OCT_PARAM_NAMES)), dtype=np.float32)
    seen = np.zeros(N_OCT, dtype=bool)
    with open(path) as f:
        for lineno, line in enumerate(f, 1):
            line = "".join(
                ch for ch in line if not ch.isspace() and ch not in "'\"")
            if len(line) < 5:
                continue
            parts = line.split(",")
            try:
                idx = octamer_to_idx(parts[0])
                vals = [float(v) for v in parts[1:23]]
            except (ValueError, IndexError):
                if not seen.any():
                    continue  # header line
                raise ValueError(f"{path}:{lineno}: unparseable params row")
            if len(vals) != 22:
                raise ValueError(
                    f"{path}:{lineno}: expected 23 fields, got "
                    f"{len(vals) + 1}")
            if seen[idx]:
                raise ValueError(f"{path}:{lineno}: duplicate octamer")
            seen[idx] = True
            table[idx] = vals
    return table


def oligo_indices(codes: np.ndarray, k: int) -> np.ndarray:
    """Sliding k-mer indices over an int8 code sequence.

    Returns int32 array of len(codes)-k+1 entries; -1 where any base in
    the window is not ACGT (GenSeqIdx returns -1 on 'N').
    """
    codes = np.asarray(codes)
    n = codes.size - k + 1
    if n <= 0:
        return np.zeros(0, dtype=np.int64)
    c = codes.astype(np.int64)
    valid = c < 4
    cm = np.where(valid, c, 0)
    idx = np.zeros(n, dtype=np.int64)
    ok = np.ones(n, dtype=bool)
    for j in range(k):
        idx = (idx << 2) | cm[j:j + n]
        ok &= valid[j:j + n]
    return np.where(ok, idx, -1)


def step_octamer_indices(codes: np.ndarray) -> np.ndarray:
    """Octamer index for each dinucleotide step 0..len-2.

    Step i is the step between bases i and i+1, scored from the octamer
    codes[i-3 .. i+4]; edge steps pad with base A exactly as the
    reference's CTwister::Interpolate fills missing flank bases with
    eBaseA (Twister.h:22-24).
    """
    codes = np.asarray(codes)
    if codes.size < 2:
        return np.zeros(0, dtype=np.int64)
    padded = np.concatenate([
        np.zeros(3, dtype=codes.dtype), codes, np.zeros(3, dtype=codes.dtype)
    ])
    return oligo_indices(padded, 8)[: codes.size - 1]


_DEVICE_GATHER_MIN = 1 << 18


def conformation_profile(codes: np.ndarray, table: np.ndarray,
                         param: str | int,
                         undef_value: float = 0.0) -> np.ndarray:
    """Per-step structural-property profile of a sequence.

    One gather over the octamer table; steps whose octamer window holds
    an indeterminate base return `undef_value` (reference returns the
    UndefBaseValue sentinel, Twister.h GetStructParam).
    Large profiles run the gather on device (jnp.take) so genome-scale
    scans stay off the Python interpreter.
    """
    col = (OCT_PARAM_NAMES.index(param) if isinstance(param, str) else param)
    idx = step_octamer_indices(codes)
    vals_tab = np.ascontiguousarray(table[:, col])
    if idx.size >= _DEVICE_GATHER_MIN:
        import jax.numpy as jnp

        out = np.asarray(jnp.take(jnp.asarray(vals_tab),
                                  jnp.asarray(np.maximum(idx, 0)), axis=0))
    else:
        out = vals_tab[np.maximum(idx, 0)]
    return np.where(idx >= 0, out, np.float32(undef_value))


def profile_stats(profile: np.ndarray) -> dict:
    """Mean/min/max/stddev summary (reference tsStructStats,
    Twister.h:9-15, values scaled there by 1e4; we keep floats)."""
    if profile.size == 0:
        return {"mean": 0.0, "min": 0.0, "max": 0.0, "stddev": 0.0}
    return {
        "mean": float(profile.mean()),
        "min": float(profile.min()),
        "max": float(profile.max()),
        "stddev": float(profile.std()),
    }
