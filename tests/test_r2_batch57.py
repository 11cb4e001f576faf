"""Batch-57 round-2: Theil inequality decomposition
(operators/corrstats.py::theil_decomposition)."""

import math

from knowledgebase_processor_spark.operators.corrstats import (
    theil_decomposition)


def _theil_python(rows):
    from collections import defaultdict
    g = defaultdict(list)
    for grp, x in rows:
        if x > 0:
            g[grp].append(x)
    n = sum(len(v) for v in g.values())
    s = sum(sum(v) for v in g.values())
    between = sum(round(1e9 * (sum(v) / s)
                        * math.log((sum(v) * n) / (s * len(v))))
                  for v in g.values())
    within = sum(round(1e9 * (x / s)
                       * math.log((x * len(v)) / sum(v)))
                 for v in g.values() for x in v)
    return between, within


def test_theil_equal_rows_zero(spark):
    rows = [("a", 10)] * 5 + [("b", 10)] * 5
    df = spark.createDataFrame(rows, "source string, x long")
    r = theil_decomposition(df, "source", "x").collect()[0]
    assert (r.between_nano, r.within_nano, r.total_nano) == (0, 0, 0)


def test_theil_between_only(spark):
    # groups internally equal but unequal to each other: within = 0
    rows = [("a", 10)] * 5 + [("b", 30)] * 5
    df = spark.createDataFrame(rows, "source string, x long")
    r = theil_decomposition(df, "source", "x").collect()[0]
    assert r.within_nano == 0
    b, w = _theil_python(rows)
    assert (r.between_nano, r.within_nano) == (b, w)


def test_theil_within_only(spark):
    # one group, unequal inside: between = 0
    rows = [("a", 1), ("a", 9), ("a", 5)]
    df = spark.createDataFrame(rows, "source string, x long")
    r = theil_decomposition(df, "source", "x").collect()[0]
    assert r.between_nano == 0
    b, w = _theil_python(rows)
    assert r.within_nano == w and r.total_nano == w


def test_theil_matches_python_and_zero_rows_drop(spark):
    rows = [("a", 3), ("a", 7), ("b", 20), ("b", 0), ("c", 5)]
    df = spark.createDataFrame(rows, "source string, x long")
    r = theil_decomposition(df, "source", "x").collect()[0]
    assert r.n == 4  # the zero-weight row dropped
    b, w = _theil_python(rows)
    assert (r.between_nano, r.within_nano) == (b, w)
    assert r.total_nano == b + w
