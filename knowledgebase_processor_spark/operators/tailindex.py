"""Hill tail-index estimation over a heavy-tailed column (Hill 1975,
public estimator; beyond-reference — SURVEY.md §2 round-2 surface,
distribution-diagnostics family with operators/histq.py).

Web corpora are power-law everywhere (document lengths, domain sizes,
in-degrees); curation policies (domain caps, length truncation) need to
know HOW heavy the tail is.  The Hill estimator over the top-k order
statistics:

    alpha_hat(k) = k / sum_{i=1..k} ln(x_(i) / x_(k+1))

with x_(1) >= x_(2) >= ... the descending order statistics.  Reported
at several k (the standard "Hill plot" stability check: pick alpha
where consecutive k agree).

Spark-first, cross-engine-exact design: the ONLY full-data step is a
TakeOrderedAndProject of the top max(k)+1 values (per-partition heaps,
no global sort, no single-partition window over the data — the window
below ranks a <=k+1-row frame).  Per-element ln terms are micro-nat
quantized (``round(1e6 * ln ...)``, the bm25.py idf precedent) so the
per-k sums are exact BIGINT folds any engine replays bit-identically;
only the final ``k*1e6 / sum`` division is float, rounded for the
oracle hash.  Ties at the threshold are broken by the id column, making
the top-k set itself deterministic.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window, functions as F

SCALE = 1_000_000


def hill_tail_index(df: DataFrame, value_col: str, id_col: str,
                    ks: list[int] = (10, 25, 50)) -> DataFrame:
    """One row per k: (k, x_tail, n_tail, sum_ln_micro, alpha) —
    ``x_tail`` is the (k+1)-th largest value (the tail threshold),
    ``alpha`` the Hill estimate.  ks needing more rows than the data
    has are omitted (no threshold order statistic exists)."""
    maxk = max(ks)
    top = (df.filter(F.col(value_col) > 0)
           .select(F.col(id_col).alias("rid"),
                   F.col(value_col).cast("double").alias("x"))
           .orderBy(F.desc("x"), F.asc("rid")).limit(maxk + 1))
    # bounded frame (<= maxk+1 rows): a plain window rank is fine here
    w = Window.orderBy(F.desc("x"), F.asc("rid"))
    ranked = (top.withColumn("rank", F.row_number().over(w))
              .localCheckpoint())
    e = ranked.select(
        "rank", "x",
        F.explode(F.array(*[F.lit(int(k)) for k in ks])).alias("k"))
    thr = (e.filter(F.col("rank") == F.col("k") + 1)
           .groupBy("k").agg(F.max("x").alias("x_tail")))
    terms = (e.filter(F.col("rank") <= F.col("k")).join(thr, "k")
             .withColumn("t", F.round(F.lit(SCALE)
                                      * F.log(F.col("x") / F.col("x_tail")))
                         .cast("long")))
    return (terms.groupBy("k", "x_tail")
            .agg(F.count(F.lit(1)).cast("long").alias("n_tail"),
                 F.sum("t").cast("long").alias("sum_ln_micro"))
            .withColumn("alpha",
                        F.round(F.col("k") * F.lit(float(SCALE))
                                / F.col("sum_ln_micro"), 6))
            .select("k", "x_tail", "n_tail", "sum_ln_micro", "alpha"))


def hill_oracle_sql(values_sql: str, ks: list[int] = (10, 25, 50)) -> str:
    """EXACT ANSI replay of :func:`hill_tail_index` for DuckDB.
    ``values_sql`` must select (rid, x) with x already DOUBLE."""
    maxk = max(ks)
    ks_lit = ", ".join(str(int(k)) for k in ks)
    return f"""
        WITH v AS ({values_sql}),
        top_ AS (
          SELECT rid, x, row_number() OVER (ORDER BY x DESC, rid ASC)
                   AS rank
          FROM v WHERE x > 0
          ORDER BY x DESC, rid ASC LIMIT {maxk + 1}),
        e AS (SELECT rank, x, k
              FROM top_, unnest([{ks_lit}]) AS t(k)),
        thr AS (SELECT k, MAX(x) AS x_tail FROM e
                WHERE rank = k + 1 GROUP BY k),
        terms AS (
          SELECT e.k, thr.x_tail,
                 CAST(round({SCALE} * ln(e.x / thr.x_tail)) AS BIGINT) AS t
          FROM e JOIN thr ON e.k = thr.k WHERE e.rank <= e.k)
        SELECT k, x_tail, COUNT(*)::BIGINT AS n_tail,
               SUM(t)::BIGINT AS sum_ln_micro,
               round(k * {float(SCALE)!r} / SUM(t), 6) AS alpha
        FROM terms GROUP BY k, x_tail"""
