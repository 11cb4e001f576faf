"""Batch-42 round-2: Gonzalez k-center coreset (operators/kcenter.py)
and integer-stepped EWMA drift (operators/ewma.py)."""

import duckdb

from knowledgebase_processor_spark.operators.ewma import (
    ewma_drift_report, ewma_flags, ewma_oracle_sql, ewma_step)
from knowledgebase_processor_spark.operators.kcenter import (
    kcenter_python, kcenter_select)


# ---------------------------------------------------------------- k-center ----

def test_kcenter_matches_python_reference(spark):
    import random
    rng = random.Random(17)
    vecs = {i: [rng.uniform(-1, 1) for _ in range(4)] for i in range(40)}
    df = spark.createDataFrame(
        [(i, [float(x) for x in v]) for i, v in vecs.items()],
        "vec_id long, embedding array<float>")
    got = kcenter_select(df, k=6, dims=4)
    # reference consumes the SAME float32-rounded values spark reads
    import numpy as np
    v32 = {i: [float(np.float32(x)) for x in v] for i, v in vecs.items()}
    exp = kcenter_python(v32, 6)
    assert [(int(a), int(b)) for a, b in got] == exp


def test_kcenter_spreads_clusters(spark):
    # three tight clusters -> first three picks hit all three clusters
    pts = ([(i, [0.0, 0.0]) for i in range(10)]
           + [(100 + i, [10.0, 0.0]) for i in range(10)]
           + [(200 + i, [0.0, 10.0]) for i in range(10)])
    df = spark.createDataFrame(
        [(i, [float(x) for x in v]) for i, v in pts],
        "vec_id long, embedding array<float>")
    picked = [v for v, _ in kcenter_select(df, k=3, dims=2)]
    clusters = {v // 100 for v in picked}
    assert clusters == {0, 1, 2}


# -------------------------------------------------------------------- EWMA ----

def test_ewma_step_and_flags_hand_computed():
    # alpha=0.5: seed 10 -> x=20: flag (|20-10|/10=1.0 > 0.5), ewma 15
    n, f, last = ewma_flags([10, 20], 500000, 500000)
    assert (n, f) == (2, 1)
    assert last == ewma_step(10_000_000, 20, 500000) == 15_000_000
    # steady sequence never flags
    n, f, last = ewma_flags([7] * 10, 200000, 500000)
    assert (n, f, last) == (10, 0, 7_000_000)
    assert ewma_flags([], 200000, 500000) == (0, 0, None)


def test_ewma_drift_report_flags_regression(spark):
    rows = ([(1, i, i, 100) for i in range(20)]
            + [(1, 20 + i, 20 + i, 300) for i in range(5)]  # 3x jump
            + [(2, i, i, 50) for i in range(10)])
    df = spark.createDataFrame(rows, "k long, o long, t long, x long")
    got = {r.k: r for r in ewma_drift_report(
        df, "k", "o", "t", "x").collect()}
    assert got[1].n == 25 and got[1].n_flags >= 1
    assert got[2].n_flags == 0
    exp = ewma_flags([100] * 20 + [300] * 5, 200000, 500000)
    assert (got[1].n, got[1].n_flags, got[1].last_ewma_micro) == exp


def test_ewma_oracle_replays_kernel(spark):
    rows = [(k, i, i, (k * 7 + i * 13) % 50)
            for k in (1, 2, 3) for i in range(30)]
    df = spark.createDataFrame(rows, "k long, o long, t long, x long")
    spark_rows = {r.k: (r.n, r.n_flags, r.last_ewma_micro)
                  for r in ewma_drift_report(df, "k", "o", "t",
                                             "x").collect()}
    con = duckdb.connect()
    con.execute("CREATE TABLE t AS SELECT * FROM (VALUES "
                + ",".join(f"({k},{o},{t},{x})" for k, o, t, x in rows)
                + ") v(k, o, t, x)")
    duck = {r[0]: tuple(r[1:]) for r in con.execute(ewma_oracle_sql(
        "t", "k", "o", "t.t", "x", key_name="k")).fetchall()}
    assert spark_rows == duck
