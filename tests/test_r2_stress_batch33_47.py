"""Adversarial-scale stress lane for the batch 33-47 operator
families (the round-1 bug-class playbook: hostile 1 MB strings
through every new regex, ANSI overflow probes through every integer
formula, degenerate/hub inputs through every capped join)."""

import time

from pyspark.sql import functions as F

from knowledgebase_processor_spark.operators.conductance import (
    conductance_sweep)
from knowledgebase_processor_spark.operators.covariance import (
    embedding_covariance)
from knowledgebase_processor_spark.operators.inference import (
    binned_auc, chi_square_drift, welch_ttest)
from knowledgebase_processor_spark.operators.itemsets import (
    frequent_triples)
from knowledgebase_processor_spark.operators.ktruss import ktruss
from knowledgebase_processor_spark.operators.rulemine import (
    mine_path_rules)
from knowledgebase_processor_spark.operators.textstats import (
    script_mix_report, token_fertility)
from knowledgebase_processor_spark.operators.trend import mann_kendall
from knowledgebase_processor_spark.operators.wl import wl_colors


# ----------------------------------------------------- hostile-string lane ----

def _hostile_docs(spark):
    rows = [
        ("en", "中" * 300_000),              # 300k CJK, no spaces
        ("en", "<" * 500_000),                   # punct-class bomb
        ("en", ("Ѐ" + " ") * 150_000),      # cyrillic alternating
        ("en", "a" * 1_000_000),                 # one mega-token
        ("en", None), ("en", ""),
    ]
    return spark.createDataFrame(rows, "lang string, text string")


def test_script_mix_linear_on_hostile_megabytes(spark):
    t0 = time.perf_counter()
    rows = script_mix_report(_hostile_docs(spark)).collect()
    assert time.perf_counter() - t0 < 60
    r = rows[0]
    assert r.cjk == 300_000 and r.cyrillic == 150_000
    assert r.other >= 500_000  # the '<' bomb lands in other


def test_token_fertility_linear_on_hostile_megabytes(spark):
    t0 = time.perf_counter()
    rows = token_fertility(_hostile_docs(spark)).collect()
    assert time.perf_counter() - t0 < 60
    r = rows[0]
    # '<'*500k is 500k single-char punct tokens; 'a'*1M is ONE token
    assert r.sum_tokens >= 500_000 + 1


# ----------------------------------------------------- ANSI overflow probes ----

def test_welch_extreme_magnitudes_no_overflow(spark):
    # metric near 1e6 squared * 2e5 rows stays inside BIGINT sums
    df = spark.range(0, 200_000).selectExpr(
        "CAST(990000 + id % 7 AS LONG) AS x", "id % 2 = 0 AS flag")
    r = welch_ttest(df, "x", "flag").collect()[0]
    assert r.sum_a > 0 and r.df_micro is not None


def test_chi_square_single_category_zero_expected_guarded(spark):
    # one category entirely in half 0: e1 = 0 -> division by zero in
    # the contribution formula must not blow up the whole report
    rows = [("only0", 0)] * 10 + [("both", 0)] * 5 + [("both", 1)] * 5
    df = spark.createDataFrame(rows, "cat string, half int")
    out = {r.cat: r for r in chi_square_drift(df, "cat", "half").collect()}
    assert out["both"].chi2_nano is not None
    # the degenerate cell yields NULL (0/0), not an exception
    assert out["only0"].n1 == 0


def test_auc_millions_of_distinct_scores_bounded_window(spark):
    df = spark.range(0, 300_000).selectExpr(
        "id AS score", "id % 3 = 0 AS label")
    r = binned_auc(df, "score", "label").collect()[0]
    assert r.n_pos + r.n_neg == 300_000
    assert 480_000 < r.auc_ppm < 520_000


def test_covariance_large_values_documented_bound(spark):
    # |e| up to 10 at dims=4, 50k rows: q=1e7, q^2=1e14, *5e4 = 5e18
    # -> still under 2^63; this is the documented envelope edge
    df = spark.range(0, 50_000).selectExpr(
        "array(CAST(10.0 AS FLOAT), CAST(-10.0 AS FLOAT),"
        " CAST(10.0 AS FLOAT), CAST(-10.0 AS FLOAT)) AS embedding")
    rows = embedding_covariance(df, "embedding", dims=4).collect()
    assert all(r.sum_qq != 0 for r in rows)


def test_mann_kendall_constant_mega_group_all_ties(spark):
    df = spark.createDataFrame([(1, i, 42) for i in range(500)],
                               "k long, o long, x long")
    r = mann_kendall(df, "k", "o", "x").collect()[0]
    assert (r.s_stat, r.var18, r.z_micro) == (0, 0, None)


# --------------------------------------------------------- hub/cap behavior ----

def test_rule_mining_hub_never_reaches_join(spark):
    # 20k-triple hub entity with cap 100: completes fast, hub absent
    rows = [("h", "p", f"t{i}") for i in range(20_000)]
    rows += [("a", "q", "m"), ("m", "r", "b"), ("a", "s", "b")]
    t = spark.createDataFrame(rows, "subj string, pred string, obj string")
    t0 = time.perf_counter()
    got = {(r.p1, r.p2, r.p3) for r in
           mine_path_rules(t, min_support=1, max_fanout=100).collect()}
    assert time.perf_counter() - t0 < 120
    assert ("q", "r", "s") in got


def test_itemsets_mega_transaction_capped(spark):
    rows = [(0, f"i{k}") for k in range(5_000)]
    rows += [(d, it) for d in (1, 2) for it in ("x", "y", "z")]
    df = spark.createDataFrame(rows, "doc long, item string")
    t0 = time.perf_counter()
    got = {(r.i1, r.i2, r.i3) for r in frequent_triples(
        df, min_support=2, max_items=100).collect()}
    assert time.perf_counter() - t0 < 120
    assert got == {("x", "y", "z")}


def test_wl_hub_capped_fast(spark):
    edges = [(0, i) for i in range(1, 5_000)] + [(9000, 9001)]
    df = spark.createDataFrame(edges, "src long, dst long")
    t0 = time.perf_counter()
    out = wl_colors(df, rounds=2, max_degree=100).collect()
    assert time.perf_counter() - t0 < 60
    assert {r.node for r in out} == {9000, 9001}


# ----------------------------------------------------- degenerate graph lane ----

def test_ktruss_empty_and_selfloops(spark):
    df = spark.createDataFrame([(1, 1), (2, 2)], "src long, dst long")
    assert ktruss(df, 3).collect() == []
    empty = spark.createDataFrame([], "src long, dst long")
    assert ktruss(empty, 3).collect() == []


def test_conductance_all_nodes_one_side(spark):
    # every edge inside the prefix at the end: last rank has cut 0 and
    # min(vol, tot-vol) = 0 -> NULL conductance, no divide error
    df = spark.createDataFrame([(0, 1), (1, 2)], "src long, dst long")
    scores = spark.createDataFrame([(0, 3), (1, 2), (2, 1)],
                                   "node long, score long")
    rows = conductance_sweep(df, scores).orderBy("rank").collect()
    assert rows[-1].cut == 0 and rows[-1].cond_ppm is None
