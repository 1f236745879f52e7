"""Head-to-head PacBio error correction: ours vs refbuild/bin/pacbiokanga
on the SAME reads with a REALISTIC PacBio error profile (VERDICT r2 item 7).

The first attempt (scripts/bench_ec_ref.py) used the BENCH_EC generator's
40%-substitution error mix; the reference's SW scoring (mismatch penalty
25, PBErrCorrect defaults) is tuned for real PacBio CLR errors, which are
~90% indels — it classified ~all overlaps as 500bp-window artifacts and
corrected 0 reads.  This bench therefore simulates the error process the
reference was designed for: total error rate --err with mix
10% substitution / 60% insertion / 30% deletion (PacBio CLR-like), and
runs BOTH correctors on the identical FASTA.

Stages (so the CPU reference row and the TPU ours row can run in
parallel and be merged):
  --stage gen    write pb.fa + truth.npz
  --stage ref    run reference pacbiokanga ecreads -T2, score, write ref.json
  --stage ours   run biokanga_tpu ec_reads on the chip, score, write ours.json
  --stage score  merge ref.json + ours.json -> one JSON line
"""
from __future__ import annotations

import argparse
import json
import os
import subprocess
import sys
import time

import numpy as np

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)
sys.path.insert(0, os.path.join(REPO, "scripts"))
REF_BIN = os.path.join(REPO, "refbuild", "bin", "pacbiokanga")

from bench_ecreads import kmer_recovery, kmer_set  # noqa: E402


def gen_reads(n_reads, L, genome_kb, err, seed=3, burst=False):
    """PacBio CLR-like errors: of all error events, 10% are substitutions,
    60% insertions, 30% deletions (the indel-dominated profile the
    reference's PBErrCorrect SW defaults assume, pacbiokanga
    PBErrCorrect.cpp default match/mismatch/gap scoring).

    burst=True modulates the rate along the read like real CLR noise
    (clustered errors, VERDICT r4 missing-5): ~20%% of each read lies in
    random high-noise windows at 3x the base rate, the rest at 0.5x —
    mean rate ~= err but locally bursty (the regime the reference's
    500 bp window-deviation artefact filter is calibrated for)."""
    rng = np.random.default_rng(seed)
    genome = rng.integers(0, 4, size=genome_kb * 1000, dtype=np.int8)
    reads, truths = [], []
    for _ in range(n_reads):
        st = int(rng.integers(0, len(genome) - L))
        w = genome[st : st + L].copy()
        truths.append(w.copy())
        rate = np.full(L, err)
        if burst:
            rate[:] = err * 0.5
            covered = 0
            while covered < 0.2 * L:
                b0 = int(rng.integers(0, L))
                bl = int(rng.integers(200, 800))
                rate[b0: b0 + bl] = err * 3.0
                covered += min(bl, L - b0)
        r = []
        for bi, b in enumerate(w):
            err_i = rate[bi]
            x = rng.random()
            if x < err_i * 0.1:
                r.append((b + rng.integers(1, 4)) % 4)
            elif x < err_i * 0.7:
                r.append(b)
                r.append(rng.integers(0, 4))
            elif x < err_i:
                continue
            else:
                r.append(b)
        reads.append(np.array(r, np.int8))
    return reads, truths


def load(dirpath):
    z = np.load(os.path.join(dirpath, "truth.npz"), allow_pickle=True)
    return list(z["reads"]), list(z["truths"])


def score(reads, truths, corrected_by_idx):
    """post is averaged over ALL reads — a read the corrector did not
    emit scores its UNCORRECTED recovery (ADVICE r3: per-output-only
    averaging rewards correcting only the easy reads).  Also returns
    post_corrected_only for visibility."""
    pre = post = post_out = 0.0
    n_out = 0
    for i in range(len(reads)):
        tk = kmer_set(truths[i])
        p = kmer_recovery(reads[i], tk)
        pre += p
        cs = corrected_by_idx.get(i, [])
        if cs:
            n_out += 1
            best = max(kmer_recovery(c, tk) for c in cs)
            post_out += best
            post += best
        else:
            post += p
    return {
        "pre": round(pre / len(reads), 4),
        "post": round(post / len(reads), 4),
        "post_corrected_only": round(post_out / max(n_out, 1), 4),
        "n_reads_corrected_out": n_out,
    }


def score_ref(a, reads, truths, read_seqs, seconds):
    """Parse + score the reference's corr.fa.  The reference RENAMES
    corrected reads to `ecseq<N>_<i>` where N is the 1-BASED input load
    order (CSeqStore IDs) — verified by k-mer recovery: ecseq427_1
    scores 0.96 vs truth[426] and 0.00 vs truth[427]."""
    import re

    corr = {}
    for rec in read_seqs(os.path.join(a.dir, "corr.fa")):
        m = re.match(r"ecseq(\d+)_", rec.name)
        if m:
            corr.setdefault(int(m.group(1)) - 1, []).append(rec.codes)
            continue
        m = re.search(r"read(\d{1,9})", rec.name)
        if m:
            corr.setdefault(int(m.group(1)), []).append(rec.codes)
    if not corr:
        print(json.dumps({
            "stage": "ref", "warning":
            "reference run succeeded but 0 corrected reads matched an "
            "ecseqN/readN id — check corr.fa headers"}), file=sys.stderr)
    out = {"seconds_T2": seconds, "returncode": 0,
           **score(reads, truths, corr)}
    with open(os.path.join(a.dir, "ref.json"), "w") as f:
        json.dump(out, f)
    print(json.dumps({"stage": "ref", **out}))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--stage", required=True,
                    choices=["gen", "ref", "ours", "score"])
    ap.add_argument("--reads", type=int, default=500)
    ap.add_argument("--read-len", type=int, default=10_000)
    ap.add_argument("--genome-kb", type=int, default=200)
    # 7%: the highest rate at which the reference's SW scoring still
    # accepts dovetails on iid synthetic errors (pairwise divergence
    # 2x err; at 12% the reference corrects ~nothing even with -A 0)
    ap.add_argument("--err", type=float, default=0.07)
    ap.add_argument("--burst", action="store_true",
                    help="burst-modulated CLR error profile")
    ap.add_argument("--dir", default="/tmp/bench_ec_h2h")
    ap.add_argument("--reuse", action="store_true",
                    help="ref stage: rescore an existing corr.fa")
    ap.add_argument("--reuse-seconds", type=float, default=None,
                    help="wall seconds of the run that made corr.fa")
    a = ap.parse_args()
    os.makedirs(a.dir, exist_ok=True)

    from biokanga_tpu.seq.fasta import read_seqs, write_fasta

    if a.stage == "gen":
        reads, truths = gen_reads(a.reads, a.read_len, a.genome_kb,
                                  a.err, burst=a.burst)
        write_fasta(os.path.join(a.dir, "pb.fa"),
                    ((f"read{i:06d}", r) for i, r in enumerate(reads)))
        # truths are all read_len long -> plain 2-D int8; only the ragged
        # reads need object dtype (ADVICE r3)
        robj = np.empty(len(reads), object)
        for i, r in enumerate(reads):
            robj[i] = r
        np.savez(os.path.join(a.dir, "truth.npz"),
                 reads=robj,
                 truths=np.asarray(truths, np.int8))
        print(json.dumps({"stage": "gen", "n": a.reads,
                          "mean_len": float(np.mean([len(r) for r in reads]))}))
        return

    reads, truths = load(a.dir)

    if a.stage == "ref":
        if a.reuse and os.path.exists(os.path.join(a.dir, "corr.fa")):
            return score_ref(a, reads, truths, read_seqs,
                             seconds=a.reuse_seconds)
        t0 = time.monotonic()
        # -A 0 disables the ClassifyPath 500bp-window artefact filter
        # (documented reference option, "0 to disable"): measured on this
        # synthetic uniform-error readset the default -A 70 classifies
        # every overlap artefactual (0 corrected reads at ANY error rate
        # tried, even 7%) — the window-deviation test is calibrated for
        # real PacBio error clustering, not iid simulated errors.
        r = subprocess.run(
            [REF_BIN, "ecreads", "-i", "pb.fa", "-o", "corr.fa",
             "-l", "500", "-S", "500", "-b", "500", "-A", "0",
             "-T2", "-F", "ec.log"],
            cwd=a.dir, capture_output=True, text=True, timeout=14400,
        )
        dt = time.monotonic() - t0
        dt = round(time.monotonic() - t0, 1)
        if r.returncode != 0:
            out = {"seconds_T2": dt, "returncode": r.returncode,
                   "err": (r.stdout + r.stderr)[-500:]}
            with open(os.path.join(a.dir, "ref.json"), "w") as f:
                json.dump(out, f)
            print(json.dumps({"stage": "ref", **out}))
            return
        return score_ref(a, reads, truths, read_seqs, seconds=dt)

    if a.stage == "ours":
        from biokanga_tpu.pacbio.ecreads import ECParams, ec_reads

        # production config: Pallas packed-moves SW engine, 48 overlap
        # candidates/probe, 2 iterated-consensus rounds (round 2
        # corrects round 1's output — 0.956 -> 0.998 recovery)
        t0 = time.monotonic()
        corrected, stats = ec_reads(reads, ECParams(max_targets=48),
                                    rounds=2)
        dt = time.monotonic() - t0
        corr = {i: [corrected[i]] for i in range(len(corrected))
                if len(corrected[i])}
        out = {"seconds_1chip": round(dt, 1), "rounds": 2,
               "max_targets": 48, **score(reads, truths, corr)}
        with open(os.path.join(a.dir, "ours.json"), "w") as f:
            json.dump(out, f)
        print(json.dumps({"stage": "ours", **out}))
        return

    ref = json.load(open(os.path.join(a.dir, "ref.json")))
    ours = json.load(open(os.path.join(a.dir, "ours.json")))
    print(json.dumps({
        "metric": "pacbio_ec_headtohead_kmer32_recovery",
        "value": ours.get("post"),
        "unit": "frac",
        "detail": {
            "error_profile": ("PacBio CLR-like: 10% sub / 60% ins / "
                              "30% del"
                              + (", burst-modulated (3x windows ~20% "
                                 "of read, 0.5x elsewhere)"
                                 if a.burst else "")),
            "err_rate": a.err, "n_reads": a.reads,
            "read_len": a.read_len, "genome_kb": a.genome_kb,
            "ours": ours, "reference_T2": ref,
        },
    }))


if __name__ == "__main__":
    main()
