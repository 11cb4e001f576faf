"""Batch-40 round-2: Broder bowtie (operators/bowtie.py), log-odds
keyness (operators/keyness.py), Fellegi-Sunter EM (operators/fs.py)."""

import math

import duckdb

from knowledgebase_processor_spark.operators.bowtie import (
    bowtie, bowtie_summary)
from knowledgebase_processor_spark.operators.fs import fs_em, fs_em_sql
from knowledgebase_processor_spark.operators.keyness import (
    PRIOR_STRENGTH, keyness)


# ------------------------------------------------------------------ bowtie ----

def test_bowtie_hand_graph(spark):
    # 0 -> 1 -> [2 <-> 3] -> 4 -> 5 ; 9 disconnected via self-ring? no:
    # 9 isolated-ish via edge to itself is dropped; use 8 -> 9 island
    edges = [(0, 1), (1, 2), (2, 3), (3, 2), (3, 4), (4, 5), (8, 9)]
    df = spark.createDataFrame(edges, "src long, dst long")
    got = {r.node: r.region for r in bowtie(df).collect()}
    assert got == {0: "in", 1: "in", 2: "core", 3: "core",
                   4: "out", 5: "out", 8: "other", 9: "other"}
    summ = {r.region: r.n_nodes for r in bowtie_summary(
        bowtie(df)).collect()}
    assert summ == {"in": 2, "core": 2, "out": 2, "other": 2}


def test_bowtie_largest_scc_wins(spark):
    # two rings: sizes 2 and 3 — the 3-ring is the core
    edges = [(0, 1), (1, 0), (10, 11), (11, 12), (12, 10), (1, 10)]
    df = spark.createDataFrame(edges, "src long, dst long")
    got = {r.node: r.region for r in bowtie(df).collect()}
    assert got[10] == got[11] == got[12] == "core"
    assert got[0] == got[1] == "in"   # the 2-ring reaches the core


def test_bowtie_tie_break_min_rep(spark):
    # equal-size rings {0,1} and {5,6}: min rep (1 < 6) wins
    edges = [(0, 1), (1, 0), (5, 6), (6, 5)]
    df = spark.createDataFrame(edges, "src long, dst long")
    got = {r.node: r.region for r in bowtie(df).collect()}
    assert got[0] == got[1] == "core"
    assert got[5] == got[6] == "other"


# ----------------------------------------------------------------- keyness ----

def test_keyness_sign_and_shrinkage(spark):
    a = spark.createDataFrame(
        [("spam spam spam casino",)] * 10, "text string")
    b = spark.createDataFrame(
        [("news report weather",)] * 10, "text string")
    got = {r.term: r for r in keyness(a, b, min_count=5).collect()}
    assert got["spam"].z_micro > 0
    assert got["news"].z_micro < 0
    # a term exclusive to A with higher count scores higher
    assert got["spam"].z_micro > got["casino"].z_micro


def test_keyness_matches_python_formula(spark):
    a = spark.createDataFrame([("x x y",)] * 7, "text string")
    b = spark.createDataFrame([("x z z",)] * 5, "text string")
    got = {r.term: r for r in keyness(a, b, min_count=1).collect()}
    tot_a, tot_b = 21, 15

    def z(aw, bw):
        pw = PRIOR_STRENGTH * (aw + bw) / (tot_a + tot_b)
        delta = (math.log((aw + pw) / (tot_a + PRIOR_STRENGTH - aw - pw))
                 - math.log((bw + pw) / (tot_b + PRIOR_STRENGTH - bw - pw)))
        var = 1.0 / (aw + pw) + 1.0 / (bw + pw)
        return round(1e6 * delta / math.sqrt(var))

    assert got["x"].z_micro == z(14, 5)
    assert got["y"].z_micro == z(7, 0)
    assert got["z"].z_micro == z(0, 10)


# -------------------------------------------------------------------- FS EM ----

def test_fs_em_separates_planted_mixture(spark):
    # 30% matches with agreement prob ~0.9 per field; 70% non-matches
    # with agreement prob ~0.1 -> EM should recover pi ~ 0.3, m >> u
    rows = []
    for i in range(1000):
        match = i % 10 < 3
        if match:
            g1, g2, g3 = i % 11 != 0, i % 13 != 0, i % 7 != 0
        else:
            g1, g2, g3 = i % 9 == 0, i % 8 == 0, i % 12 == 0
        rows.append((g1, g2, g3))
    df = spark.createDataFrame(rows, "g1 boolean, g2 boolean, g3 boolean")
    out = fs_em(df, k=3, iters=3).collect()
    p = out[0]
    assert 200_000 <= p.pi_micro <= 420_000
    for i in (1, 2, 3):
        assert p[f"m{i}_micro"] > 600_000
        assert p[f"u{i}_micro"] < 350_000
    # all-agree pattern posterior ~ 1, all-disagree ~ 0
    by_pat = {(r.g1, r.g2, r.g3): r for r in out}
    assert by_pat[(True, True, True)].w_nano > 900_000_000
    assert by_pat[(False, False, False)].w_nano < 100_000_000
    assert by_pat[(True, True, True)].logodds_micro > 0
    assert by_pat[(False, False, False)].logodds_micro < 0


def test_fs_em_sql_text_is_engine_portable(spark):
    pairs_sql = ("SELECT (doc_id % 3 = 0) AS g1, (doc_id % 4 = 0) AS g2"
                 " FROM pts")
    sql = fs_em_sql(pairs_sql, k=2, iters=2)
    con = duckdb.connect()
    con.execute("CREATE TABLE pts AS SELECT unnest(generate_series(0, "
                "499)) AS doc_id")
    duck = con.execute(sql).fetchall()
    spark.range(0, 500).selectExpr("id AS doc_id") \
        .createOrReplaceTempView("pts")
    spk = [tuple(r) for r in spark.sql(sql).collect()]
    assert spk == duck
