"""SQLite summaries + loader tests."""
import sqlite3

import numpy as np

from biokanga_tpu.cli import main
from biokanga_tpu.utils.sqlite_summaries import SQLiteSummaries


def test_summaries_roundtrip(tmp_path):
    db = str(tmp_path / "s.db")
    s = SQLiteSummaries(db)
    eid = s.start_experiment("exp1", "test run")
    pid = s.add_process(eid, "align")
    s.add_parameter(eid, pid, "subs", 10)
    s.add_result(eid, pid, "unique", 1234)
    s.end_process(pid, 0)
    s.close()
    con = sqlite3.connect(db)
    assert con.execute("SELECT COUNT(*) FROM TblExperiments").fetchone()[0] == 1
    r = con.execute(
        "SELECT ParamName, ParamValue FROM TblParameters"
    ).fetchone()
    assert r == ("subs", "10")
    assert con.execute(
        "SELECT ResultValue FROM TblResults WHERE ResultName='unique'"
    ).fetchone()[0] == "1234"
    assert con.execute(
        "SELECT Finished IS NOT NULL FROM TblProcesses"
    ).fetchone()[0] == 1


def test_snps2sqlite_and_index_q(tmp_path):
    # produce a SNP CSV through the writer, load it
    from biokanga_tpu.align.snp import SNPCall, write_snps_csv

    cnts = np.array([3, 0, 9, 0], np.int64)
    calls = [
        SNPCall(chrom="chr1", loci=42, ref_base=0, tot_bases=12, nonref=9,
                base_cnts=cnts, pvalue=1e-8, bkgnd_rate=0.01,
                win_bases=200, win_mm=2, rank=1)
    ]
    csvp = str(tmp_path / "snps.csv")
    write_snps_csv(csvp, calls)
    db = str(tmp_path / "snps.db")
    assert main(["snps2sqlite", "-i", csvp, "-o", db, "-n", "e1",
                 "-c", "cv1"]) == 0
    con = sqlite3.connect(db)
    assert con.execute("SELECT COUNT(*) FROM TblSnps").fetchone()[0] == 1
    row = con.execute(
        "SELECT Gcnt, TotCovCnt FROM TblSnps"
    ).fetchone()
    assert row == (9, 12)
    assert con.execute("SELECT SeqName FROM TblSeqs").fetchone()[0] == "chr1"

    # -q experiment logging through the index subcommand
    from biokanga_tpu.seq.fasta import write_fasta
    from biokanga_tpu.sim.simreads import random_genome

    fa = str(tmp_path / "g.fa")
    write_fasta(fa, random_genome([("c", 2000)], seed=2))
    qdb = str(tmp_path / "sum.db")
    assert main(["index", "-i", fa, "-o", str(tmp_path / "g.idx.npz"),
                 "--lut-bases", "8", "-q", qdb]) == 0
    con = sqlite3.connect(qdb)
    assert con.execute(
        "SELECT ProcName FROM TblProcesses"
    ).fetchone()[0] == "index"
    assert con.execute(
        "SELECT ResultValue FROM TblResults WHERE ResultName='total_bp'"
    ).fetchone()[0] == "2000"
