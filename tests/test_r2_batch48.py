"""Batch-48 round-2: Brier/Murphy decomposition
(operators/agreement.py) and capture-recapture coverage
(operators/capture.py)."""

from knowledgebase_processor_spark.operators.agreement import (
    brier_decomposition)
from knowledgebase_processor_spark.operators.capture import (
    capture_recapture)


def test_brier_perfectly_calibrated_bins(spark):
    # score 250000 with exactly 25% positives, score 750000 with 75%:
    # reliability ~ 0, resolution > 0
    rows = ([(250000, True)] * 25 + [(250000, False)] * 75
            + [(750000, True)] * 75 + [(750000, False)] * 25)
    df = spark.createDataFrame(rows, "p long, y boolean")
    r = brier_decomposition(df, "p", "y", n_bins=10).collect()[0]
    assert r.n == 200 and r.n_bins_used == 2
    assert r.reliability_nano == 0
    # resolution = mean (bin_rate - base_rate)^2 = 0.25^2 = 62.5e6 nano
    assert r.resolution_nano == 62_500_000
    # uncertainty = 0.5 * 0.5
    assert r.uncertainty_nano == 250_000_000


def test_brier_overconfident_scores_pay_reliability(spark):
    # everything scored 990000 but only half positive
    rows = [(990000, True)] * 50 + [(990000, False)] * 50
    df = spark.createDataFrame(rows, "p long, y boolean")
    r = brier_decomposition(df, "p", "y").collect()[0]
    assert r.resolution_nano == 0
    # reliability ~ (0.99 - 0.5)^2 = 0.2401
    assert abs(r.reliability_nano - 240_100_000) < 1000


def test_capture_recapture_estimates_population(spark):
    df = spark.range(0, 20_000).selectExpr("id AS doc_id")
    r = capture_recapture(df, "doc_id", rate_ppm=300000).collect()[0]
    # samples ~ 6000 each; Chapman should land near 20k
    assert 5_500 <= r.n1 <= 6_500 and 5_500 <= r.n2 <= 6_500
    assert r.m > 0
    assert 17_000 <= r.chapman <= 23_000


def test_capture_recapture_deterministic(spark):
    df = spark.range(0, 500).selectExpr("id AS doc_id")
    a = capture_recapture(df, "doc_id").collect()[0]
    b = capture_recapture(df, "doc_id").collect()[0]
    assert a.asDict() == b.asDict()
    # different salts -> (almost surely) different samples
    c = capture_recapture(df, "doc_id", salt_a="other").collect()[0]
    assert (a.n1, a.m) != (c.n1, c.m) or a.n2 == c.n2
