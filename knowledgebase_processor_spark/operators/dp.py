"""Differentially private count release (companion to the
k-anonymity / l-diversity audits (q139/q187): those MEASURE
re-identification risk; this MECHANISM bounds it — ε-DP noisy counts
via the discrete Laplace (two-sided geometric) mechanism, the
standard release primitive for per-language / per-source corpus
statistics that must not leak individual membership (Ghosh-
Roughgarden-Sundararajan: discrete Laplace is universally optimal
for counts under ε-DP).

Sampling is the difference of two geometrics — G = ⌊ln(u)/ln(p)⌋
with p = e^(-ε) — drawn from the PORTABLE salted-md5 uniforms
(split.py idiom), so the release is bit-reproducible by any ANSI
engine with md5: an auditor can replay the noise exactly (the q204
oracle does).  The float step (two ln's, a floor) is one shared SQL
string; everything else is BIGINT.

Determinism is a deliberate trade, stated plainly: replayable noise
means anyone holding the salt can denoise — operationally the salt
is a secret drawn per release, and the DP guarantee is standard;
with a public salt this is a noise-injection SIMULATION for testing
pipelines, not a privacy mechanism.

Scale shape: one partial-agg groupBy for the true counts, then
map-side noise on the (tiny) per-group frame.  No joins, no windows.
"""

from __future__ import annotations

import math

from pyspark.sql import DataFrame, functions as F


def _geometric_sql(u_sql: str, p: float) -> str:
    """floor(ln(u)/ln(p)) — geometric(1-p) on a uniform-in-(0,1) SQL
    expression; identical text on Spark and DuckDB."""
    return f"CAST(floor(ln({u_sql}) / ln({p!r})) AS BIGINT)"


def _uniform_from_bucket(bucket_sql: str) -> str:
    """(bucket + 0.5) / 1e6 — open-interval uniform from the portable
    md5 integer bucket (never exactly 0 or 1)."""
    return f"(({bucket_sql}) + 0.5) / 1000000.0"


def dp_group_counts(df: DataFrame, group_col: str,
                    epsilon_micro: int = 500000,
                    salt: str = "dp") -> DataFrame:
    """-> (group, n_true, noise, n_noisy): per-group counts with
    discrete-Laplace(ε) noise; ε = epsilon_micro / 1e6.  A real
    release publishes only (group, n_noisy) — n_true rides along here
    because the driver oracle and the tests verify the mechanism.
    """
    p = math.exp(-epsilon_micro / 1e6)
    counts = df.groupBy(F.col(group_col).alias("grp")).agg(
        F.count(F.lit(1)).cast("long").alias("n_true"))

    def bucket(tag: str) -> str:
        return (f"CAST(conv(substring(md5(concat('{salt}|{tag}|', "
                f"CAST(grp AS STRING))), 1, 15), 16, 10) AS BIGINT)"
                " % 1000000")

    g1 = _geometric_sql(_uniform_from_bucket(bucket("a")), p)
    g2 = _geometric_sql(_uniform_from_bucket(bucket("b")), p)
    noised = counts.withColumn("noise", F.expr(f"({g1}) - ({g2})"))
    return (noised
            .select(F.col("grp").alias(group_col), "n_true", "noise",
                    F.expr("n_true + noise").cast("long")
                    .alias("n_noisy")))


def dp_oracle_sql(table: str, group_sql: str,
                  epsilon_micro: int = 500000, salt: str = "dp",
                  group_name: str = "grp") -> str:
    """DuckDB replay: same md5 buckets, same shared geometric text."""
    p = math.exp(-epsilon_micro / 1e6)

    def bucket(tag: str) -> str:
        return (f"(('0x' || substr(md5('{salt}|{tag}|' ||"
                f" CAST(grp AS VARCHAR)), 1, 15))::BIGINT) % 1000000")

    g1 = _geometric_sql(_uniform_from_bucket(bucket("a")), p)
    g2 = _geometric_sql(_uniform_from_bucket(bucket("b")), p)
    return f"""
        WITH counts AS (SELECT {group_sql} AS grp,
                               CAST(COUNT(*) AS BIGINT) AS n_true
                        FROM {table} GROUP BY 1)
        SELECT grp AS {group_name}, n_true,
               CAST(({g1}) - ({g2}) AS BIGINT) AS noise,
               CAST(n_true + ({g1}) - ({g2}) AS BIGINT) AS n_noisy
        FROM counts ORDER BY grp"""
