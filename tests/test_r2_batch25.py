"""Batch-25 round-2 operators: recrawl change-rate scheduling
(operators/recrawl.py), per-host template shingles
(operators/webclean.py), ER blocking-quality report
(operators/blocking.py)."""

from knowledgebase_processor_spark.operators.blocking import (
    blocking_quality)
from knowledgebase_processor_spark.operators.recrawl import (
    change_rate_schedule)
from knowledgebase_processor_spark.operators.webclean import (
    host_template_shingles)


# ------------------------------------------------------------- recrawl ----

def test_change_rate_tiers(spark):
    rows = [
        # hot: changes every visit -> 2/2 transitions = 1e6 -> daily
        ("hot", 1, "a"), ("hot", 2, "b"), ("hot", 3, "c"),
        # warm: 1 change over 4 transitions = 250000 -> weekly
        ("warm", 1, "x"), ("warm", 2, "x"), ("warm", 3, "y"),
        ("warm", 4, "y"), ("warm", 5, "y"),
        # cold: never changes -> monthly
        ("cold", 1, "z"), ("cold", 2, "z"),
        # single visit -> unknown
        ("once", 1, "q"),
    ]
    s = spark.createDataFrame(rows,
                              "url string, warc_ts long, fingerprint string")
    out = {r.url: r for r in change_rate_schedule(s).collect()}
    assert (out["hot"].changes, out["hot"].change_ppm,
            out["hot"].revisit) == (2, 1_000_000, "daily")
    assert (out["warm"].changes, out["warm"].change_ppm,
            out["warm"].revisit) == (1, 250_000, "weekly")
    assert (out["cold"].change_ppm, out["cold"].revisit) == (0, "monthly")
    assert (out["once"].visits, out["once"].revisit) == (1, "unknown")


def test_change_rate_flip_flop_counts_every_transition(spark):
    rows = [("u", i, "ab"[i % 2]) for i in range(6)]
    s = spark.createDataFrame(rows,
                              "url string, warc_ts long, fingerprint string")
    r = change_rate_schedule(s).collect()[0]
    assert (r.visits, r.changes, r.change_ppm) == (6, 5, 1_000_000)


# ----------------------------------------------------- template shingles ----

def test_host_template_shingles_finds_footer(spark):
    footer = "all rights reserved worldwide"
    pages = [
        ("h", 1, f"unique alpha text one {footer}"),
        ("h", 2, f"different beta words two {footer}"),
        ("h", 3, f"third gamma body {footer}"),
        ("solo", 9, "single page host ignored entirely"),
    ]
    df = spark.createDataFrame(pages, "host string, doc_id long, text string")
    out = host_template_shingles(df, min_share_ppm=1_000_000).collect()
    assert all(r.host == "h" for r in out)       # solo host skipped
    got = {r.shingle for r in out}
    # the only shingles on ALL 3 pages are inside the footer
    assert got == {"all rights reserved", "rights reserved worldwide"}
    assert all(r.df == 3 and r.n_pages == 3 and r.share_ppm == 1_000_000
               for r in out)


def test_host_template_shingles_share_threshold(spark):
    pages = [("h", i, "common tail phrase" if i < 2 else "something else x")
             for i in range(4)]
    df = spark.createDataFrame(pages, "host string, doc_id long, text string")
    # 2/4 pages = 500000 ppm: kept at 500000, dropped at 600000
    keep = host_template_shingles(df, min_share_ppm=500_000).collect()
    assert {r.shingle for r in keep} == {"common tail phrase",
                                         "something else x"}
    assert host_template_shingles(df, min_share_ppm=600_000).collect() == []


# ------------------------------------------------------------ blocking ----

def test_blocking_quality_counts_and_reduction(spark):
    # blocks: {r0 r1 r2}, {r3 r4}, {r5} -> comparisons 3 + 1 + 0 = 4
    rows = [("b1", "r0"), ("b1", "r1"), ("b1", "r2"),
            ("b2", "r3"), ("b2", "r4"), ("b3", "r5"),
            ("b1", "r1")]                         # dup row ignored
    b = spark.createDataFrame(rows, "block_key string, record_id string")
    r = blocking_quality(b).collect()[0]
    assert (r.n_records, r.n_blocks, r.n_comparisons,
            r.max_block) == (6, 3, 4, 3)
    assert r.max_block_share_ppm == 3 * 1_000_000 // 4
    naive = 6 * 5 // 2
    assert r.reduction_ppm == 1_000_000 - 4 * 1_000_000 // naive
    assert r.n_gold is None and r.pc_ppm is None


def test_blocking_quality_pair_completeness(spark):
    b = spark.createDataFrame(
        [("b1", "r0"), ("b1", "r1"), ("b2", "r2"), ("b2", "r0")],
        "block_key string, record_id string")
    gold = spark.createDataFrame(
        [("r0", "r1"),            # co-blocked in b1
         ("r1", "r0"),            # duplicate reversed: dedups
         ("r0", "r2"),            # co-blocked in b2
         ("r1", "r2"),            # never co-blocked
         ("r5", "r5")],           # self pair: dropped
        "rec_a string, rec_b string")
    r = blocking_quality(b, gold).collect()[0]
    assert r.n_gold == 3
    assert r.pc_ppm == 2 * 1_000_000 // 3


def test_blocking_quality_worse_than_naive_clamps_to_zero(spark):
    # every record in every block: comparisons explode past naive
    rows = [(f"b{j}", f"r{i}") for j in range(3) for i in range(4)]
    b = spark.createDataFrame(rows, "block_key string, record_id string")
    r = blocking_quality(b).collect()[0]
    assert r.n_comparisons == 3 * 6 and r.reduction_ppm == 0


def test_blocking_quality_empty_is_all_zero(spark):
    eb = spark.createDataFrame([], "block_key string, record_id string")
    r = blocking_quality(eb).collect()[0]
    assert (r.n_records, r.n_blocks, r.n_comparisons,
            r.max_block, r.max_block_share_ppm, r.reduction_ppm) \
        == (0, 0, 0, 0, 0, 0)
