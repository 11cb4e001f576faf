"""Inter-arrival / burstiness statistics per entity (beyond-reference;
SURVEY.md §2 round-2 surface — the temporal-behavior twin of
operators/sessions.py: sessionize answers "where do the visits split",
this answers "how bursty is the arrival process", the crawl-scheduling
/ bot-detection / rate-limit planning signal).

Per key, events are ordered by (ts, event_id) and consecutive gaps
taken in WHOLE SECONDS (``epoch_us DIV 1e6`` on the lag difference —
exact BIGINT, engine-portable).  The value-checked payload is all
integer moments: (n_events, n_gaps, sum_gap_s, sum_sq_gap_s,
min_gap_s, max_gap_s, b_num = n·Σg² − (Σg)²).  The one float is the
Goh-Barabási burstiness B = (σ−μ)/(σ+μ), which collapses to
(sqrt(b_num) − Σg) / (sqrt(b_num) + Σg) — sqrt is correctly rounded
IEEE, so even the float is bit-identical across engines.

Scale shape: ONE window partitioned by the entity key (distributed —
each user's events sort within their partition group, no global
window), one partial-agg groupBy.  Σg² bound: gaps in seconds keep
n·Σg² < 2^63 through ~10^6 events/user over years.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window, functions as F


def interarrival_stats(events: DataFrame, key_col: str = "user_id",
                       ts_col: str = "ts",
                       id_col: str = "event_id") -> DataFrame:
    """events -> per-key integer gap moments + exact-expression
    burstiness (keys with < 2 events carry zero moments, NULL B)."""
    w = Window.partitionBy(key_col).orderBy(F.col(ts_col).asc(),
                                            F.col(id_col).asc())
    # Epoch micros for NTZ parquet timestamps (the sessions.py recipe:
    # unix_micros only accepts LTZ; timestampdiff from the NTZ epoch
    # matches DuckDB's epoch_us on naive timestamps).
    us = F.expr(
        f"timestampdiff(MICROSECOND, TIMESTAMP_NTZ '1970-01-01 00:00:00', "
        f"cast({ts_col} as timestamp_ntz))")
    gaps = events.select(
        F.col(key_col).alias("key"),
        (us - F.lag(us).over(w)).cast("long").alias("d_us"))
    gaps = gaps.withColumn(
        "gap_s", F.expr("d_us DIV 1000000").cast("long"))
    agg = gaps.groupBy("key").agg(
        F.count(F.lit(1)).cast("long").alias("n_events"),
        F.count("gap_s").cast("long").alias("n_gaps"),
        F.coalesce(F.sum("gap_s"), F.lit(0)).cast("long")
        .alias("sum_gap_s"),
        F.coalesce(F.sum(F.col("gap_s") * F.col("gap_s")), F.lit(0))
        .cast("long").alias("sum_sq_gap_s"),
        F.min("gap_s").cast("long").alias("min_gap_s"),
        F.max("gap_s").cast("long").alias("max_gap_s"))
    return agg.selectExpr(
        "key", "n_events", "n_gaps", "sum_gap_s", "sum_sq_gap_s",
        "min_gap_s", "max_gap_s",
        "CAST(n_gaps * sum_sq_gap_s - sum_gap_s * sum_gap_s AS BIGINT)"
        " AS b_num",
        "CASE WHEN n_gaps > 0 AND"
        " sqrt(CAST(n_gaps * sum_sq_gap_s - sum_gap_s * sum_gap_s"
        "      AS DOUBLE)) + CAST(sum_gap_s AS DOUBLE) > 0"
        " THEN (sqrt(CAST(n_gaps * sum_sq_gap_s - sum_gap_s * sum_gap_s"
        "      AS DOUBLE)) - CAST(sum_gap_s AS DOUBLE))"
        "    / (sqrt(CAST(n_gaps * sum_sq_gap_s - sum_gap_s * sum_gap_s"
        "      AS DOUBLE)) + CAST(sum_gap_s AS DOUBLE)) END"
        " AS burstiness")


def interarrival_oracle_sql(events_sql: str) -> str:
    """EXACT ANSI replay of :func:`interarrival_stats` for DuckDB;
    ``events_sql`` must select (key, ts, id)."""
    return """
        WITH e AS ({sql}),
        g AS (
          SELECT key,
                 (epoch_us(ts) - LAG(epoch_us(ts)) OVER (
                    PARTITION BY key ORDER BY ts ASC, id ASC))
                 // 1000000 AS gap_s
          FROM e),
        agg AS (
          SELECT key, COUNT(*)::BIGINT AS n_events,
                 COUNT(gap_s)::BIGINT AS n_gaps,
                 COALESCE(SUM(gap_s), 0)::BIGINT AS sum_gap_s,
                 COALESCE(SUM(gap_s * gap_s), 0)::BIGINT AS sum_sq_gap_s,
                 MIN(gap_s)::BIGINT AS min_gap_s,
                 MAX(gap_s)::BIGINT AS max_gap_s
          FROM g GROUP BY key)
        SELECT key, n_events, n_gaps, sum_gap_s, sum_sq_gap_s,
               min_gap_s, max_gap_s,
               (n_gaps * sum_sq_gap_s - sum_gap_s * sum_gap_s)::BIGINT
                 AS b_num,
               CASE WHEN n_gaps > 0 AND
                 sqrt((n_gaps * sum_sq_gap_s
                       - sum_gap_s * sum_gap_s)::DOUBLE)
                   + sum_gap_s::DOUBLE > 0
                 THEN (sqrt((n_gaps * sum_sq_gap_s
                             - sum_gap_s * sum_gap_s)::DOUBLE)
                       - sum_gap_s::DOUBLE)
                    / (sqrt((n_gaps * sum_sq_gap_s
                             - sum_gap_s * sum_gap_s)::DOUBLE)
                       + sum_gap_s::DOUBLE) END AS burstiness
        FROM agg""".replace("{sql}", events_sql)
