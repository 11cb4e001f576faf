"""Batch-37 round-2: co-citation/coupling (operators/cocite.py),
zone-map pruning simulation (operators/zonemap.py), split-conformal
calibration (operators/conformal.py)."""

import math

from knowledgebase_processor_spark.operators.cocite import (
    cocitation_pairs, coupling_pairs)
from knowledgebase_processor_spark.operators.conformal import (
    conformal_report, conformal_threshold)
from knowledgebase_processor_spark.operators.zonemap import (
    zonemap_pruning)


# -------------------------------------------------------------- co-citation ----

def test_cocitation_hand_computed(spark):
    edges = [("d1", "a"), ("d1", "b"), ("d2", "a"), ("d2", "b"),
             ("d3", "a"), ("d3", "c")]
    df = spark.createDataFrame(edges, "src string, dst string")
    got = {(r.a, r.b): r.n_common
           for r in cocitation_pairs(df, max_fanout=None).collect()}
    assert got == {("a", "b"): 2, ("a", "c"): 1}


def test_coupling_is_the_transpose(spark):
    edges = [("d1", "a"), ("d2", "a"), ("d1", "b"), ("d3", "a")]
    df = spark.createDataFrame(edges, "src string, dst string")
    got = {(r.a, r.b): r.n_common
           for r in coupling_pairs(df, max_fanout=None).collect()}
    # d1,d2 share a; d1,d3 share a; d2,d3 share a
    assert got == {("d1", "d2"): 1, ("d1", "d3"): 1, ("d2", "d3"): 1}


def test_cocitation_hub_cap_drops_directory_page(spark):
    edges = [("hub", f"t{i}") for i in range(30)]
    edges += [("d1", "t0"), ("d1", "t1"), ("d2", "t0"), ("d2", "t1")]
    df = spark.createDataFrame(edges, "src string, dst string")
    capped = {(r.a, r.b): r.n_common
              for r in cocitation_pairs(df, max_fanout=10).collect()}
    # hub's 435 pairs gone; the organic t0-t1 pair remains with count 2
    assert capped == {("t0", "t1"): 2}
    full = cocitation_pairs(df, max_fanout=None).collect()
    assert len(full) == 30 * 29 // 2  # t0-t1 merges into the hub pairs


def test_cocitation_dedups_multi_edges(spark):
    edges = [("d1", "a"), ("d1", "a"), ("d1", "b")]
    df = spark.createDataFrame(edges, "src string, dst string")
    got = cocitation_pairs(df, max_fanout=None).collect()
    assert [(r.a, r.b, r.n_common) for r in got] == [("a", "b", 1)]


# ---------------------------------------------------------------- zone maps ----

def test_zonemap_value_sorted_prunes_everything_but_hits(spark):
    df = spark.range(0, 1000).selectExpr("id AS doc_id", "id % 10 AS v")
    r = zonemap_pruning(df, "byv", "v", "doc_id", "v", 3, 4,
                        block_rows=100).collect()[0]
    # sorted by v: 10 blocks of one value each; 2 blocks contain 3..4
    assert (r.n_blocks, r.n_pruned, r.prune_ppm) == (10, 8, 800_000)


def test_zonemap_natural_order_prunes_nothing_on_cycling_value(spark):
    df = spark.range(0, 1000).selectExpr("id AS doc_id", "id % 10 AS v")
    r = zonemap_pruning(df, "nat", "doc_id", "doc_id", "v", 3, 4,
                        block_rows=100).collect()[0]
    # every 100-row block sees all 10 values -> nothing prunable
    assert (r.n_blocks, r.n_pruned) == (10, 0)


def test_zonemap_partial_tail_block(spark):
    df = spark.range(0, 250).selectExpr("id AS doc_id", "id AS v")
    r = zonemap_pruning(df, "x", "v", "doc_id", "v", 0, 49,
                        block_rows=100).collect()[0]
    # blocks [0,99],[100,199],[200,249]: only the first intersects
    assert (r.n_blocks, r.n_pruned) == (3, 2)
    assert r.n_rows == 250


# ---------------------------------------------------------------- conformal ----

def test_conformal_threshold_textbook_k(spark):
    # n=9, alpha=0.1 -> k = ceil(10*0.9) = 9 -> q_hat = max score
    df = spark.createDataFrame([(i,) for i in range(1, 10)], "s long")
    r = conformal_threshold(df, "s", alpha_ppm=100000).collect()[0]
    assert (r.n_cal, r.k, r.q_hat) == (9, 9, 9)
    # alpha=0.5 -> k = ceil(10*0.5) = 5 -> the 5th smallest
    r2 = conformal_threshold(df, "s", alpha_ppm=500000).collect()[0]
    assert (r2.k, r2.q_hat) == (5, 5)


def test_conformal_threshold_with_ties(spark):
    df = spark.createDataFrame([(5,)] * 7 + [(9,)] * 3, "s long")
    r = conformal_threshold(df, "s", alpha_ppm=500000).collect()[0]
    # k = ceil(11*0.5) = 6; 6th smallest of 5x7,9x3 is 5
    assert (r.k, r.q_hat) == (6, 5)


def test_conformal_empty_cal_returns_zero_rows(spark):
    # ADVICE round-2: Spark and the oracle must agree on an empty
    # calibration (or test) frame -> ZERO rows, not one row of NULLs.
    from knowledgebase_processor_spark.operators.conformal import (
        conformal_report)
    empty = spark.createDataFrame([], "s long")
    some = spark.createDataFrame([(i,) for i in range(20)], "s long")
    assert conformal_report(empty, some, "s").count() == 0
    assert conformal_report(some, empty, "s").count() == 0
    # n=20 -> k = ceil(21*0.9) = 19 <= n: a real threshold exists
    assert conformal_report(some, some, "s").count() == 1


def test_conformal_coverage_guarantee_on_exchangeable_split(spark):
    # identical distributions in cal and test: coverage ~ 0.9
    df = spark.range(0, 2000).selectExpr("id", "(id * 37) % 1000 AS s")
    cal = df.filter("id % 2 = 0")
    test = df.filter("id % 2 = 1")
    r = conformal_report(cal, test, "s", alpha_ppm=100000).collect()[0]
    assert r.n_cal == 1000 and r.n_test == 1000
    assert r.k == math.ceil(1001 * 0.9)
    assert 880_000 <= r.coverage_ppm <= 960_000
