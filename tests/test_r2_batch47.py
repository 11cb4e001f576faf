"""Batch-47 round-2: Mann-Kendall trend and Jain fairness
(operators/trend.py)."""

import math

from knowledgebase_processor_spark.operators.trend import (
    jain_fairness, mann_kendall)


def _mk_python(xs):
    n = len(xs)
    s = sum((xs[j] > xs[i]) - (xs[j] < xs[i])
            for i in range(n) for j in range(i + 1, n))
    from collections import Counter
    ties = sum(t * (t - 1) * (2 * t + 5)
               for t in Counter(xs).values())
    var18 = n * (n - 1) * (2 * n + 5) - ties
    if var18 == 0:
        return s, var18, None
    z = (s - (1 if s > 0 else -1 if s < 0 else 0)) \
        / math.sqrt(var18 / 18.0)
    return s, var18, round(1e6 * z)


def test_mk_monotone_and_flat(spark):
    rows = ([(1, i, i * 2) for i in range(10)]          # increasing
            + [(2, i, 100 - i) for i in range(10)]      # decreasing
            + [(3, i, 7) for i in range(10)])           # constant
    df = spark.createDataFrame(rows, "k long, o long, x long")
    got = {r.k: r for r in mann_kendall(df, "k", "o", "x").collect()}
    assert got[1].s_stat == 45 and got[1].z_micro > 0
    assert got[2].s_stat == -45 and got[2].z_micro < 0
    assert got[3].s_stat == 0 and got[3].z_micro is None  # all ties


def test_mk_matches_python_with_ties(spark):
    xs = [3, 1, 4, 1, 5, 9, 2, 6, 5, 3, 5]
    df = spark.createDataFrame([(1, i, x) for i, x in enumerate(xs)],
                               "k long, o long, x long")
    r = mann_kendall(df, "k", "o", "x").collect()[0]
    s, var18, z = _mk_python(xs)
    assert (r.s_stat, r.var18, r.z_micro) == (s, var18, z)


def test_jain_extremes(spark):
    even = spark.createDataFrame([(f"h{i % 4}",) for i in range(40)],
                                 "host string")
    r = jain_fairness(even, "host").collect()[0]
    assert r.jain_ppm == 1_000_000          # perfectly even
    skew = spark.createDataFrame([("a",)] * 97 + [("b",)] * 1
                                 + [("c",)] * 1 + [("d",)] * 1,
                                 "host string")
    r2 = jain_fairness(skew, "host").collect()[0]
    exp = round(1e6 * 100 * 100 / (4 * (97 ** 2 + 3)))
    assert r2.jain_ppm == exp
    assert r2.jain_ppm < 300_000            # near the 1/n floor
