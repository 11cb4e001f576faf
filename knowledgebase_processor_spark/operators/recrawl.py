"""Recrawl scheduling from observed change rates (beyond-reference
webtext surface; the freshness-policy companion to the politeness
scheduler (frontier.py) — Cho & Garcia-Molina's estimator, public:
a crawler that re-fetched a url V times and saw the content
fingerprint change C times estimates the page's change frequency as
C/(V-1) and revisits fast-changing pages more often).

Spark-first, cross-engine-exact: changes come from ONE ``lag`` window
per url over the visit history (short per-url partitions — crawl
histories are tens of rows, never skewed), the rate is exact integer
ppm, and the revisit tier is a CASE ladder over the ppm value shared
verbatim with the DuckDB oracle (:data:`REVISIT_CASE_SQL`).  One
window + one partial-agg groupBy; no Python, no collect.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window, functions as F

# Tier ladder over change_ppm — shared verbatim with the q170 oracle.
# Single-visit urls have no transition evidence: 'unknown'.
REVISIT_CASE_SQL = ("CASE WHEN visits < 2 THEN 'unknown' "
                    "WHEN change_ppm >= 500000 THEN 'daily' "
                    "WHEN change_ppm >= 100000 THEN 'weekly' "
                    "ELSE 'monthly' END")


def change_rate_schedule(snapshots: DataFrame) -> DataFrame:
    """(url, warc_ts, fingerprint) visit history -> one row per url:
    (url, visits, changes, change_ppm, revisit).

    ``changes`` counts fingerprint transitions between consecutive
    visits (warc_ts order, fingerprint as the deterministic tie),
    ``change_ppm = changes * 1e6 DIV (visits - 1)`` (0 for single-visit
    urls), and ``revisit`` is the :data:`REVISIT_CASE_SQL` tier."""
    w = Window.partitionBy("url").orderBy("warc_ts", "fingerprint")
    marked = snapshots.select(
        "url",
        F.when(F.lag("fingerprint").over(w).isNotNull()
               & (F.lag("fingerprint").over(w) != F.col("fingerprint")),
               1).otherwise(0).alias("chg"))
    per = (marked.groupBy("url")
           .agg(F.count(F.lit(1)).cast("long").alias("visits"),
                F.sum("chg").cast("long").alias("changes")))
    return (per.withColumn(
        "change_ppm",
        F.expr("CASE WHEN visits < 2 THEN 0 "
               "ELSE changes * 1000000 DIV (visits - 1) END")
        .cast("long"))
        .withColumn("revisit", F.expr(REVISIT_CASE_SQL)))


def recrawl_oracle_sql(snaps_sql: str) -> str:
    """EXACT ANSI replay of :func:`change_rate_schedule` for DuckDB.
    ``snaps_sql`` must select (url, warc_ts, fingerprint)."""
    return (r"""
        WITH s0 AS ({snaps_sql}),
        m AS (SELECT url,
                     CASE WHEN lag(fingerprint) OVER
                            (PARTITION BY url
                             ORDER BY warc_ts, fingerprint)
                            IS DISTINCT FROM fingerprint
                           AND lag(fingerprint) OVER
                            (PARTITION BY url
                             ORDER BY warc_ts, fingerprint)
                            IS NOT NULL
                     THEN 1 ELSE 0 END AS chg
              FROM s0),
        per AS (SELECT url, COUNT(*)::BIGINT AS visits,
                       SUM(chg)::BIGINT AS changes
                FROM m GROUP BY url),
        r AS (SELECT url, visits, changes,
                     (CASE WHEN visits < 2 THEN 0
                      ELSE changes * 1000000 // (visits - 1)
                      END)::BIGINT AS change_ppm
              FROM per)
        SELECT url, visits, changes, change_ppm,
               """ + REVISIT_CASE_SQL + """ AS revisit
        FROM r
        """).replace("{snaps_sql}", snaps_sql)
