"""EWMA drift detection per entity (the sequential companion to the
snapshot drift family: PSI (q119) and chi-square (q189) compare two
fixed slices; an exponentially-weighted moving average tracks each
host/user's metric CONTINUOUSLY and flags the step where it breaks
away — per-host fetch-latency regressions, per-user event-rate
anomalies.  The same transition function runs in the stateful
streaming scheduler family (streaming/stateful.py pattern): GroupState
holds (ewma_micro,) and the batch twin here is its replayable
ground truth).

Integer-stepped recurrence, so cross-engine replay is EXACT (no float
anywhere):

    ewma' = (alpha_ppm * x_micro + (1e6 - alpha_ppm) * ewma) DIV 1e6
    flag  =  |x_micro - ewma| * 1e6  >  threshold_ppm * ewma

(the flag comparison is multiplication-only on BIGINTs — no division,
so the Spark-DIV vs DuckDB-// negative-operand trap never arises).
Seeded at the first observation; flags evaluated from step 2 on.

Scale shape: sequences are inherently per-entity sequential — ONE
Arrow-batched applyInPandas partitioned by the entity key (the
extract_udf.py boundary contract), kernel shared bit-for-bit with the
pure-Python transition the streaming version uses; the DuckDB oracle
replays the recurrence with a recursive CTE.  Entities are
hosts/users: thousands of short sequences, never one global sort.
"""

from __future__ import annotations

from pyspark.sql import DataFrame

MICRO = 1_000_000


def ewma_step(ewma_micro: int, x: int, alpha_ppm: int) -> int:
    """One integer EWMA transition (shared with streaming state)."""
    x_micro = x * MICRO
    return (alpha_ppm * x_micro
            + (MICRO - alpha_ppm) * ewma_micro) // MICRO


def ewma_flags(xs: list, alpha_ppm: int, threshold_ppm: int) -> tuple:
    """(n, n_flags, last_ewma_micro) over an ordered int sequence."""
    if not xs:
        return 0, 0, None
    ewma = xs[0] * MICRO
    n_flags = 0
    for x in xs[1:]:
        x_micro = x * MICRO
        if abs(x_micro - ewma) * MICRO > threshold_ppm * ewma:
            n_flags += 1
        ewma = ewma_step(ewma, x, alpha_ppm)
    return len(xs), n_flags, ewma


def ewma_drift_report(df: DataFrame, key_col: str, order_col: str,
                      tie_col: str, metric_col: str,
                      alpha_ppm: int = 200000,
                      threshold_ppm: int = 500000) -> DataFrame:
    """-> (key, n, n_flags, last_ewma_micro) per entity: sequences
    ordered by (order_col, tie_col), metric must be integral."""
    import pandas as pd

    cols = df.select(
        df[key_col].alias("k"), df[order_col].alias("o"),
        df[tie_col].alias("t"), df[metric_col].cast("long").alias("x"))

    def run(pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.sort_values(["o", "t"])
        n, f, last = ewma_flags([int(v) for v in pdf["x"]],
                                alpha_ppm, threshold_ppm)
        return pd.DataFrame(
            {"k": [pdf["k"].iloc[0]], "n": [n], "n_flags": [f],
             "last_ewma_micro": [last]})

    out = cols.groupBy("k").applyInPandas(
        run, "k long, n long, n_flags long, last_ewma_micro long")
    return out.withColumnRenamed("k", key_col)


def ewma_oracle_sql(table: str, key_sql: str, order_sql: str,
                    tie_sql: str, metric_sql: str,
                    alpha_ppm: int = 200000,
                    threshold_ppm: int = 500000,
                    key_name: str = "k") -> str:
    """DuckDB recursive-CTE replay of the integer recurrence."""
    return f"""
        WITH RECURSIVE seq AS (
          SELECT {key_sql} AS k, CAST({metric_sql} AS BIGINT) AS x,
                 ROW_NUMBER() OVER (PARTITION BY {key_sql}
                                    ORDER BY {order_sql}, {tie_sql})
                     AS rn
          FROM {table}),
        steps AS (
          SELECT k, rn, x, x * {MICRO} AS ewma, 0 AS flags
          FROM seq WHERE rn = 1
          UNION ALL
          SELECT s.k, s.rn, s.x,
                 ({alpha_ppm} * s.x * {MICRO}
                  + ({MICRO} - {alpha_ppm}) * p.ewma) // {MICRO},
                 p.flags + (CASE WHEN abs(s.x * {MICRO} - p.ewma)
                                      * {MICRO}
                                 > {threshold_ppm} * p.ewma
                            THEN 1 ELSE 0 END)
          FROM seq s JOIN steps p ON s.k = p.k AND s.rn = p.rn + 1),
        last AS (SELECT k, MAX(rn) AS mx FROM steps GROUP BY k)
        SELECT steps.k AS {key_name}, CAST(steps.rn AS BIGINT) AS n,
               CAST(steps.flags AS BIGINT) AS n_flags,
               CAST(steps.ewma AS BIGINT) AS last_ewma_micro
        FROM steps JOIN last ON steps.k = last.k AND steps.rn = last.mx
        ORDER BY {key_name}"""
