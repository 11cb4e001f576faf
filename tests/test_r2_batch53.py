"""Batch-53 round-2: multi-window SLO burn rate (operators/slo.py)
and Bloom zone maps (operators/zonemap.py)."""

import datetime as dt

import pytest

from knowledgebase_processor_spark.operators.slo import burn_rate_alerts
from knowledgebase_processor_spark.operators.zonemap import (
    bloom_zonemap_pruning)


def _ev(spark, rows):
    return spark.createDataFrame(rows, "ts timestamp, is_err boolean")


def test_burn_rate_needs_both_windows(spark):
    base = dt.datetime(2026, 1, 1, 0, 0, 0)
    rows = []
    # hour 0: one hot 10-min window (50% errors) in an otherwise
    # clean hour -> long window below threshold -> NO alert
    for m in range(60):
        err = (10 <= m < 20) and m % 2 == 0
        rows.append((base + dt.timedelta(minutes=m), err))
    # hour 1: sustained 50% errors -> both windows burn -> alert
    for m in range(60):
        rows.append((base + dt.timedelta(hours=1, minutes=m),
                     m % 2 == 0))
    out = burn_rate_alerts(_ev(spark, rows), "ts", "is_err",
                           short_s=600, long_s=3600,
                           budget_ppm=100000,
                           burn_factor_ppm=2000000).collect()
    by_long = {}
    for r in out:
        by_long.setdefault(r.long_bucket, []).append(r)
    lbs = sorted(by_long)
    assert not any(r.alert for r in by_long[lbs[0]])
    assert any(r.alert for r in by_long[lbs[1]])
    # the hot window itself breached its short threshold
    hot = [r for r in by_long[lbs[0]] if r.short_ppm >= 200000]
    assert hot and all(not r.alert for r in hot)


def test_burn_rate_rejects_non_multiple():
    with pytest.raises(ValueError):
        burn_rate_alerts(None, "ts", "e", short_s=600, long_s=1000)


def test_bloom_never_prunes_present_value(spark):
    df = spark.range(0, 1000).selectExpr(
        "id AS doc_id", "'v' || CAST(id AS STRING) AS v")
    r = bloom_zonemap_pruning(df, "doc_id", "doc_id", "v", "v500",
                              block_rows=50).collect()[0]
    assert r.probe_present
    # 20 blocks; the block holding v500 must not be pruned
    assert r.n_blocks == 20 and r.n_pruned <= 19


def test_bloom_prunes_absent_value_mostly(spark):
    # low-cardinality per block: 50 rows of only 5 distinct values
    # -> sparse blooms -> an absent probe prunes nearly everything
    df = spark.range(0, 1000).selectExpr(
        "id AS doc_id", "'w' || CAST(id % 5 AS STRING) AS v")
    r = bloom_zonemap_pruning(df, "doc_id", "doc_id", "v", "absent",
                              block_rows=50).collect()[0]
    assert not r.probe_present
    assert r.prune_ppm >= 900_000


def test_bloom_value_sorted_layout_prunes_better(spark):
    # scattered high-cardinality values: natural layout saturates the
    # per-block blooms; value-sorted layout concentrates each value
    # into one block, so an absent probe prunes (almost) everything
    df = spark.range(0, 2000).selectExpr(
        "id AS doc_id", "'k' || CAST((id * 7) % 40 AS STRING) AS v")
    nat = bloom_zonemap_pruning(df, "doc_id", "doc_id", "v", "nope",
                                block_rows=50).collect()[0]
    srt = bloom_zonemap_pruning(df, "v", "doc_id", "v", "nope",
                                block_rows=50).collect()[0]
    assert srt.n_pruned >= nat.n_pruned
