"""UCB1 exploration scores for crawl probing (the bandit view of
recrawl: q170's tiers schedule hosts by OBSERVED change rate, which
under-probes hosts we rarely visit — the optimism-under-uncertainty
fix is UCB1 (Auer et al.): score = observed change rate + an
exploration bonus sqrt(2 ln N / n) that grows for under-sampled
hosts, giving the crawl budget allocator a regret bound instead of a
heuristic).

Exactness: pulls/changes are exact BIGINTs; the one float step (the
bonus + mean sum) is a module-level SQL string shared verbatim with
the q219 oracle, micro-quantized.  Unvisited hosts (n = 0) get
+infinity priority by convention — spelled as NULL-means-first so no
infinity literal crosses engines; the caller sorts NULLS FIRST.

Scale shape: one partial-agg groupBy(host) + one broadcast totals
row; ranking is on the HOST frame.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

UCB_MICRO_SQL = (
    "CASE WHEN n_pulls = 0 THEN NULL ELSE "
    "CAST(round(1000000 * (CAST(n_changed AS DOUBLE) / n_pulls"
    " + sqrt(2.0 * ln(CAST(n_total AS DOUBLE)) / n_pulls)))"
    " AS BIGINT) END")


def ucb_scores(probes: DataFrame, host_col: str = "host",
               changed_col: str = "changed") -> DataFrame:
    """-> (host, n_pulls, n_changed, ucb_micro) from a probe log with
    one row per fetch and a boolean change flag; NULL ucb_micro means
    never probed (rank it first)."""
    per = (probes.groupBy(F.col(host_col).alias("host"))
           .agg(F.count(F.lit(1)).cast("long").alias("n_pulls"),
                F.sum(F.when(F.col(changed_col), 1).otherwise(0))
                .cast("long").alias("n_changed")))
    tot = per.agg(F.sum("n_pulls").cast("long").alias("n_total"))
    return (per.crossJoin(F.broadcast(tot))
            .select("host", "n_pulls", "n_changed",
                    F.expr(UCB_MICRO_SQL).alias("ucb_micro")))


def ucb_oracle_sql(table: str, host_sql: str, changed_sql: str) -> str:
    return f"""
        WITH per AS (SELECT {host_sql} AS host,
                            CAST(COUNT(*) AS BIGINT) AS n_pulls,
                            CAST(SUM(CASE WHEN {changed_sql} THEN 1
                                     ELSE 0 END) AS BIGINT) AS n_changed
                     FROM {table} GROUP BY 1),
        tot AS (SELECT CAST(SUM(n_pulls) AS BIGINT) AS n_total FROM per)
        SELECT host, n_pulls, n_changed, {UCB_MICRO_SQL} AS ucb_micro
        FROM per CROSS JOIN tot ORDER BY host"""
