"""Batch-18 round-2 operators: URL prefix rollup
(operators/urlrules.py::url_prefix_rollup), skew advisor
(operators/skew.py::skew_report), left-outer stream-stream interval
join (streaming/jobs.py::correlate_event_streams_outer)."""

import datetime as dt

from pyspark.sql import functions as F

from knowledgebase_processor_spark.operators.skew import skew_report
from knowledgebase_processor_spark.operators.urlrules import (
    url_prefix_rollup)
from knowledgebase_processor_spark.streaming.jobs import (
    correlate_event_streams, correlate_event_streams_outer)


# ------------------------------------------------------ prefix rollup ----

def test_url_prefix_rollup_counts(spark):
    df = spark.createDataFrame(
        [("/a/b/c",), ("/a/b/d",), ("/a/x",), ("/z",), ("/",)],
        "path string")
    got = {(r.depth, r.prefix): r.n_pages
           for r in url_prefix_rollup(df, "path").collect()}
    assert got == {
        (1, "/a"): 3, (2, "/a/b"): 2, (3, "/a/b/c"): 1, (3, "/a/b/d"): 1,
        (2, "/a/x"): 1, (1, "/z"): 1,
    }  # root "/" has no segments -> contributes nothing


def test_url_prefix_rollup_depth_cap_and_weird_paths(spark):
    df = spark.createDataFrame(
        [("/a/b/c/d/e",), ("//a///b//",)], "path string")
    got = {(r.depth, r.prefix): r.n_pages
           for r in url_prefix_rollup(df, "path", max_depth=2).collect()}
    # empty segments from duplicate slashes are dropped; depth capped
    assert got == {(1, "/a"): 2, (2, "/a/b"): 2}


# -------------------------------------------------------- skew report ----

def test_skew_report_shares_and_salt(spark):
    rows = [("hot",)] * 90 + [("warm",)] * 9 + [("cold",)]
    df = spark.createDataFrame(rows, "k string")
    out = {r.key: r for r in
           skew_report(df, "k", top_k=2, target_rows_per_task=40).collect()}
    assert set(out) == {"hot", "warm", "<TOTAL>"}
    hot = out["hot"]
    assert (hot.n, hot.share_ppm) == (90, 900_000)
    assert hot.suggested_salt == 3          # ceil(90/40)
    # avg rows/key = 100 DIV 3 = 33 -> ratio 90*1e6 DIV 33
    assert hot.skew_ratio_ppm == 90 * 1_000_000 // 33
    assert out["<TOTAL>"].n == 100
    assert out["<TOTAL>"].skew_ratio_ppm is None


def test_skew_report_uniform_keys(spark):
    df = spark.createDataFrame([(f"k{i % 4}",) for i in range(40)],
                               "k string")
    out = {r.key: r for r in skew_report(df, "k", top_k=4).collect()}
    for k in ("k0", "k1", "k2", "k3"):
        assert out[k].n == 10 and out[k].suggested_salt == 1
        assert out[k].skew_ratio_ppm == 1_000_000


# -------------------------------------------- left-outer interval join ----

def _events(spark, rows):
    return spark.createDataFrame(
        [(k, e, dt.datetime(2024, 1, 1, 0, m)) for k, e, m in rows],
        "user_id long, event_id string, ts timestamp")


def test_outer_interval_join_batch_semantics(spark):
    left = _events(spark, [(1, "l1", 0), (1, "l2", 30), (2, "l3", 0)])
    right = _events(spark, [(1, "r1", 3), (9, "r9", 1)])
    got = {(r.key, r.l_event, r.r_event)
           for r in correlate_event_streams_outer(left, right).collect()}
    assert got == {(1, "l1", "r1"),       # within 5 min
                   (1, "l2", None),        # r1 is before l2
                   (2, "l3", None)}        # no key match


def test_outer_join_superset_of_inner(spark):
    import random
    rng = random.Random(3)
    rows = [(rng.randrange(5), f"e{i}", rng.randrange(50))
            for i in range(80)]
    left, right = _events(spark, rows[:40]), _events(spark, rows[40:])
    inner = {(r.key, r.l_event, r.r_event)
             for r in correlate_event_streams(left, right).collect()}
    outer = {(r.key, r.l_event, r.r_event)
             for r in correlate_event_streams_outer(left, right).collect()}
    assert inner <= outer
    matched_lefts = {(k, l) for k, l, _ in inner}
    # every left event appears in the outer result
    assert {(k, l) for k, l, _ in outer} == \
        {(r[0], r[1]) for r in rows[:40]}
    # null rows are exactly the unmatched lefts
    assert {(k, l) for k, l, r in outer if r is None} == \
        {(r[0], r[1]) for r in rows[:40]} - matched_lefts


def test_outer_interval_join_runs_as_stream(spark, tmp_path):
    # the streaming planner accepts the outer join (watermark + interval
    # condition present) and emits the inner matches for an in-order feed.
    left = _events(spark, [(1, "l1", 0), (1, "l2", 30)])
    right = _events(spark, [(1, "r1", 3)])
    lp, rp = str(tmp_path / "l"), str(tmp_path / "r")
    left.write.parquet(lp)
    right.write.parquet(rp)
    ls = spark.readStream.schema(left.schema).parquet(lp)
    rs = spark.readStream.schema(right.schema).parquet(rp)
    out = correlate_event_streams_outer(ls, rs)
    q = (out.writeStream.format("memory").queryName("oj")
         .outputMode("append").trigger(availableNow=True).start())
    q.awaitTermination(120)
    rows = {(r.key, r.l_event, r.r_event)
            for r in spark.sql("SELECT * FROM oj").collect()}
    # inner match emits; null-padded rows wait for watermark advance
    # beyond this finite feed, so only the match is guaranteed here.
    assert (1, "l1", "r1") in rows
