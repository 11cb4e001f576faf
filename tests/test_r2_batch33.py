"""Batch-33 round-2: distributed statistical inference
(operators/inference.py) — Welch's t, chi-square drift, Poisson
bootstrap, rank-sum AUC.  Hand-computed expectations throughout."""

import math

from pyspark.sql import functions as F

from knowledgebase_processor_spark.operators.inference import (
    POISSON1_THRESHOLDS, binned_auc, chi_square_drift,
    poisson_bootstrap_mean, welch_ttest)


# ------------------------------------------------------------- Welch's t ----

def _welch_expected(xs, ys):
    na, nb = len(xs), len(ys)
    ma, mb = sum(xs) / na, sum(ys) / nb
    va = sum((x - ma) ** 2 for x in xs) / (na - 1)
    vb = sum((y - mb) ** 2 for y in ys) / (nb - 1)
    se2 = va / na + vb / nb
    t = (ma - mb) / math.sqrt(se2)
    df = se2 * se2 / ((va / na) ** 2 / (na - 1) + (vb / nb) ** 2 / (nb - 1))
    return round(1e6 * t), round(1e6 * df)


def test_welch_hand_computed(spark):
    xs = [10, 12, 14, 9, 15, 11]
    ys = [20, 25, 22, 30]
    rows = [(x, True) for x in xs] + [(y, False) for y in ys]
    df = spark.createDataFrame(rows, "x long, flag boolean")
    r = welch_ttest(df, "x", "flag").collect()[0]
    t_exp, df_exp = _welch_expected(xs, ys)
    assert (r.n_a, r.n_b) == (6, 4)
    assert (r.sum_a, r.sum_b) == (sum(xs), sum(ys))
    assert r.mean_a_micro == sum(xs) * 1_000_000 // 6
    assert r.t_micro == t_exp
    assert r.df_micro == df_exp


def test_welch_identical_slices_t_zero(spark):
    rows = [(5, True), (7, True), (9, True),
            (5, False), (7, False), (9, False)]
    df = spark.createDataFrame(rows, "x long, flag boolean")
    r = welch_ttest(df, "x", "flag").collect()[0]
    assert r.t_micro == 0


def test_welch_degenerate_slice_is_null_not_error(spark):
    rows = [(5, True), (7, False), (9, False)]
    df = spark.createDataFrame(rows, "x long, flag boolean")
    r = welch_ttest(df, "x", "flag").collect()[0]
    assert r.t_micro is None and r.df_micro is None
    # empty slice: means go NULL too, no ANSI divide-by-zero
    df2 = spark.createDataFrame([(5, False), (7, False)],
                                "x long, flag boolean")
    r2 = welch_ttest(df2, "x", "flag").collect()[0]
    assert r2.n_a == 0 and r2.mean_a_micro is None


# ------------------------------------------------------------ chi-square ----

def test_chi_square_hand_computed(spark):
    # lang a: 30 vs 10; lang b: 10 vs 30 — symmetric drift
    rows = ([("a", 0)] * 30 + [("a", 1)] * 10
            + [("b", 0)] * 10 + [("b", 1)] * 30)
    df = spark.createDataFrame(rows, "cat string, half int")
    out = {r.cat: r for r in chi_square_drift(df, "cat", "half").collect()}
    # totals 40/40; expected per cell = 20
    for c in ("a", "b"):
        assert (out[c].n0 + out[c].n1) == 40
        assert out[c].expected0_micro == 20_000_000
        exp = 1e9 * ((10 ** 2) / 20 + (10 ** 2) / 20)
        assert out[c].chi2_nano == round(exp)
    # statistic = exact sum of contributions
    assert sum(r.chi2_nano for r in out.values()) == 2 * round(1e9 * 10.0)


def test_chi_square_no_drift_zero(spark):
    rows = [("x", 0)] * 5 + [("x", 1)] * 5 + [("y", 0)] * 3 + [("y", 1)] * 3
    df = spark.createDataFrame(rows, "cat string, half int")
    assert all(r.chi2_nano == 0
               for r in chi_square_drift(df, "cat", "half").collect())


# ------------------------------------------------------ Poisson bootstrap ----

def test_poisson_thresholds_are_the_cdf():
    c, p = 0.0, math.exp(-1)
    for k, thr in enumerate(POISSON1_THRESHOLDS):
        c += p
        assert thr == math.floor(c * 1_000_000)
        p /= (k + 1)


def test_bootstrap_deterministic_and_sane(spark):
    df = spark.range(0, 400).select(
        F.col("id").alias("doc_id"),
        (F.col("id") % 50 + 100).alias("x"))
    a = poisson_bootstrap_mean(df, "doc_id", "x", 16).orderBy("b").collect()
    b = poisson_bootstrap_mean(df, "doc_id", "x", 16).orderBy("b").collect()
    assert [r.asDict() for r in a] == [r.asDict() for r in b]
    assert len(a) == 16
    for r in a:
        # Poisson(1) over 400 rows: w_sum concentrates near 400
        assert 300 <= r.w_sum <= 500
        assert r.mean_micro == r.wx_sum * 1_000_000 // r.w_sum
        # the resampled mean stays inside the support of x
        assert 100_000_000 <= r.mean_micro <= 149_000_000


def test_bootstrap_ci_covers_true_mean(spark):
    df = spark.range(0, 1000).select(
        F.col("id").alias("doc_id"), (F.col("id") % 91).alias("x"))
    true_mean_micro = sum(i % 91 for i in range(1000)) * 1_000_000 // 1000
    means = sorted(r.mean_micro for r in
                   poisson_bootstrap_mean(df, "doc_id", "x", 32).collect())
    assert means[0] <= true_mean_micro <= means[-1]


# -------------------------------------------------------------------- AUC ----

def _auc_brute(pairs):
    """pairs: list of (score, label). Pair-counting AUC with 0.5 ties."""
    pos = [s for s, l in pairs if l]
    neg = [s for s, l in pairs if not l]
    wins = sum(1.0 if p > n else 0.5 if p == n else 0.0
               for p in pos for n in neg)
    return wins / (len(pos) * len(neg))


def test_auc_perfect_and_random(spark):
    perfect = [(i + 100, True) for i in range(10)] + \
              [(i, False) for i in range(10)]
    df = spark.createDataFrame(perfect, "score long, label boolean")
    assert binned_auc(df, "score", "label").collect()[0].auc_ppm == 1_000_000
    const = [(7, True)] * 5 + [(7, False)] * 5
    df2 = spark.createDataFrame(const, "score long, label boolean")
    assert binned_auc(df2, "score", "label").collect()[0].auc_ppm == 500_000


def test_auc_ties_match_pair_counting(spark):
    pairs = [(3, True), (3, False), (5, True), (1, False), (5, False),
             (5, True), (2, False), (4, True), (2, True), (1, False)]
    df = spark.createDataFrame(pairs, "score long, label boolean")
    r = binned_auc(df, "score", "label").collect()[0]
    assert r.auc_ppm == math.floor(1e6 * _auc_brute(pairs))


def test_auc_single_class_is_null(spark):
    df = spark.createDataFrame([(1, True), (2, True)],
                               "score long, label boolean")
    assert binned_auc(df, "score", "label").collect()[0].auc_ppm is None
