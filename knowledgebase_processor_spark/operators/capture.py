"""Capture-recapture corpus coverage estimation (Lincoln-Petersen /
Chapman: two independent samples of an unknown population — two crawl
seeds, two search-engine result feeds, two days of a rate-limited
API — estimate the TOTAL population from the overlap:
N̂ = (n1+1)(n2+1)/(m+1) - 1.  The data-card question it answers is
'how big is the part of this domain we have NOT crawled?', which no
single-sample statistic can say).

Samples here are portable salted-md5 Bernoulli draws (split.py
idiom) so the whole experiment — membership, overlap, estimate — is
bit-replayable by the q228 oracle.  The Chapman estimator is exact
integer arithmetic end-to-end.

Scale shape: one conditional-aggregation pass.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

SPACE = 1_000_000


def _bucket(id_col: str, salt: str) -> str:
    return (f"CAST(conv(substring(md5(concat('{salt}|',"
            f" CAST({id_col} AS STRING))), 1, 15), 16, 10) AS BIGINT)"
            f" % {SPACE}")


def capture_recapture(df: DataFrame, id_col: str,
                      rate_ppm: int = 200000,
                      salt_a: str = "cap_a",
                      salt_b: str = "cap_b") -> DataFrame:
    """-> one row (n1, n2, m, chapman): sample twice at ``rate_ppm``
    with independent portable hashes, estimate the population via
    Chapman's bias-corrected Lincoln-Petersen."""
    in_a = F.expr(f"({_bucket(id_col, salt_a)}) < {rate_ppm}")
    in_b = F.expr(f"({_bucket(id_col, salt_b)}) < {rate_ppm}")
    agg = df.agg(
        F.sum(F.when(in_a, 1).otherwise(0)).cast("long").alias("n1"),
        F.sum(F.when(in_b, 1).otherwise(0)).cast("long").alias("n2"),
        F.sum(F.when(in_a & in_b, 1).otherwise(0)).cast("long")
        .alias("m"))
    return agg.withColumn(
        "chapman",
        F.expr("(n1 + 1) * (n2 + 1) DIV (m + 1) - 1").cast("long"))


def capture_oracle_sql(table: str, id_sql: str,
                       rate_ppm: int = 200000,
                       salt_a: str = "cap_a",
                       salt_b: str = "cap_b") -> str:
    def bucket(salt: str) -> str:
        return (f"((('0x' || substr(md5('{salt}|' ||"
                f" CAST({id_sql} AS VARCHAR)), 1, 15))::BIGINT)"
                f" % {SPACE})")

    a, b = bucket(salt_a), bucket(salt_b)
    return f"""
        WITH agg AS (
          SELECT CAST(SUM(CASE WHEN {a} < {rate_ppm} THEN 1 ELSE 0 END)
                      AS BIGINT) AS n1,
                 CAST(SUM(CASE WHEN {b} < {rate_ppm} THEN 1 ELSE 0 END)
                      AS BIGINT) AS n2,
                 CAST(SUM(CASE WHEN {a} < {rate_ppm}
                               AND {b} < {rate_ppm} THEN 1 ELSE 0 END)
                      AS BIGINT) AS m
          FROM {table})
        SELECT n1, n2, m,
               CAST((n1 + 1) * (n2 + 1) // (m + 1) - 1 AS BIGINT)
                   AS chapman
        FROM agg"""
