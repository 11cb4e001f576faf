"""PageRank over the knowledge-graph link structure (beyond-reference;
SURVEY.md §2 round-2 surface).

The reference stops at link *extraction* (wikilinks/references become
triples); ranking the resulting entity graph is the canonical next step
for a web-scale KG — crawl prioritisation, canonical-entity election
(prefer the highest-ranked member of a coreference cluster), and
quality-weighted sampling of training documents all consume it.

Spark-first design (power iteration on DataFrames, no GraphX/RDDs):

* the contribution base — ``edges ⋈ out_degree`` with a precomputed
  ``1/out_degree`` weight — is built ONCE, repartitioned on ``src`` and
  ``localCheckpoint``-ed, so each iteration's rank join shuffles only
  the (small) rank frame, never the edge list;
* an iteration is one join (on ``src``) + one groupBy (on ``dst``):
  ``sum`` is partial-aggregatable, so head-node in-degree skew (a page
  linked by millions) is absorbed by map-side combine before the
  shuffle, and AQE skew-join handles the join side;
* dangling mass (nodes with no out-edges) is folded back uniformly via
  one scalar aggregate per iteration — a single-row collect, the same
  driver-side convergence scalar every distributed PageRank uses;
* ``localCheckpoint`` per iteration truncates the exponentially growing
  lineage (mandatory for iterative DataFrame jobs, same as
  components.py / transitive_closure).

Fixed ``iterations`` (rather than an epsilon test) keeps the operator
deterministic and cross-engine replayable: the driver oracle (q49)
unrolls the same power iteration as chained SQL CTEs in DuckDB and
value-checks the ranks.  On the oracle's parent-chain graph every node
has in-degree ≤ 2 and out-degree ≤ 1, so each ``sum`` folds at most two
IEEE doubles — addition of two doubles is commutative bit-exactly,
making the ranks identical across engines, not merely close.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F


def pagerank(edges: DataFrame, iterations: int = 5, damping: float = 0.85,
             src: str = "src", dst: str = "dst") -> DataFrame:
    """edges(src, dst) -> (node, rank) after ``iterations`` rounds of the
    power method with uniform teleport.  Ranks sum to 1 (dangling mass is
    redistributed uniformly each round).  Duplicate edges are collapsed —
    PageRank is defined on the link *set*, matching the reference's
    deduplicated wikilink semantics (O4/O7)."""
    e = (edges.select(F.col(src).alias("src"), F.col(dst).alias("dst"))
         .filter(F.col("src").isNotNull() & F.col("dst").isNotNull())
         .distinct())
    nodes = (e.select(F.col("src").alias("node"))
             .union(e.select(F.col("dst").alias("node")))
             .distinct().localCheckpoint())
    n = nodes.count()
    if n == 0:
        return nodes.withColumn("rank", F.lit(0.0))

    out_deg = e.groupBy("src").agg(F.count("*").alias("out_deg"))
    # Contribution base: (src, dst, 1/out_deg) — static across
    # iterations, so partition it on the join key once and checkpoint.
    contrib_base = (e.join(out_deg, "src")
                    .select("src", "dst",
                            (F.lit(1.0) / F.col("out_deg")).alias("w"))
                    .repartition("src").localCheckpoint())
    dangling_nodes = (nodes.join(out_deg.withColumnRenamed("src", "node"),
                                 "node", "left_anti").localCheckpoint())

    ranks = nodes.withColumn("rank", F.lit(1.0) / F.lit(float(n)))
    teleport = (1.0 - damping) / float(n)
    for _ in range(iterations):
        # Single-row collect: the uniform share of this round's dangling
        # mass.  One scalar per iteration, not a hot-path collect.
        row = (dangling_nodes.join(ranks, "node")
               .agg(F.sum("rank").alias("m")).collect()[0])
        dangling_share = damping * float(row["m"] or 0.0) / float(n)
        summed = (contrib_base
                  .join(ranks.withColumnRenamed("node", "src"), "src")
                  .groupBy("dst")
                  .agg(F.sum(F.col("w") * F.col("rank")).alias("s")))
        ranks = (nodes.join(summed.withColumnRenamed("dst", "node"),
                            "node", "left")
                 .select("node",
                         (F.lit(teleport)
                          + F.lit(damping) * F.coalesce(F.col("s"), F.lit(0.0))
                          + F.lit(dangling_share)).alias("rank"))
                 .localCheckpoint())
    return ranks


def pagerank_oracle_sql(edges_sql: str, iterations: int = 5,
                        damping: float = 0.85) -> str:
    """The EXACT ANSI-SQL replay of :func:`pagerank` as chained CTEs
    (one per iteration — fixed iteration count makes recursion
    unnecessary), for DuckDB value-checking.  ``edges_sql`` must select
    columns ``src, dst``."""
    d = repr(damping)
    sql = [f"WITH e AS (SELECT DISTINCT src, dst FROM ({edges_sql})",
           "             WHERE src IS NOT NULL AND dst IS NOT NULL),",
           "  nodes AS (SELECT src AS node FROM e",
           "            UNION SELECT dst FROM e),",
           "  nn AS (SELECT COUNT(*)::DOUBLE AS n FROM nodes),",
           "  od AS (SELECT src, COUNT(*)::DOUBLE AS out_deg FROM e GROUP BY src),",
           "  cb AS (SELECT e.src, e.dst, 1.0::DOUBLE / od.out_deg AS w",
           "         FROM e JOIN od ON e.src = od.src),",
           "  r0 AS (SELECT node, 1.0::DOUBLE / nn.n AS rank FROM nodes, nn),"]
    for i in range(iterations):
        p, c = f"r{i}", f"r{i + 1}"
        sql += [
            f"  dang{i} AS (SELECT COALESCE(SUM(r.rank), 0.0::DOUBLE) AS m",
            f"              FROM {p} r LEFT JOIN od ON r.node = od.src",
            "               WHERE od.src IS NULL),",
            f"  s{i} AS (SELECT cb.dst, SUM(cb.w * r.rank) AS s",
            f"           FROM cb JOIN {p} r ON cb.src = r.node GROUP BY cb.dst),",
            f"  {c} AS (SELECT nodes.node,",
            f"            (1.0::DOUBLE - {d}::DOUBLE) / nn.n",
            f"            + {d}::DOUBLE * COALESCE(s{i}.s, 0.0::DOUBLE)",
            f"            + {d}::DOUBLE * dang{i}.m / nn.n AS rank",
            f"          FROM nodes CROSS JOIN nn CROSS JOIN dang{i}",
            f"          LEFT JOIN s{i} ON nodes.node = s{i}.dst),",
        ]
    body = "\n".join(sql).rstrip(",")
    return body + f"\nSELECT node, rank FROM r{iterations}"


def personalized_pagerank(edges: DataFrame, seeds: DataFrame,
                          iterations: int = 5, damping: float = 0.85,
                          src: str = "src", dst: str = "dst",
                          seed_col: str = "node") -> DataFrame:
    """Personalized PageRank: teleport lands ONLY on ``seeds`` (uniform
    over them), so ranks measure proximity to the seed set — entity
    salience relative to a query entity, seed-guided crawl frontiers,
    topic-conditioned document sampling.  Same power-iteration shape as
    :func:`pagerank` (one join + one partial-aggregatable groupBy per
    round, static contribution base checkpointed once); dangling mass
    also returns to the seeds, keeping total rank mass at exactly 1.

    Cross-engine exactness contract (q117 oracle): on graphs with
    in-degree <= 2 every per-node sum folds at most two IEEE doubles,
    so DuckDB's chained-CTE replay is bit-identical (same argument as
    q49; see module docstring).
    """
    e = (edges.select(F.col(src).alias("src"), F.col(dst).alias("dst"))
         .filter(F.col("src").isNotNull() & F.col("dst").isNotNull())
         .distinct())
    nodes = (e.select(F.col("src").alias("node"))
             .union(e.select(F.col("dst").alias("node")))
             .distinct().localCheckpoint())
    seed_nodes = (seeds.select(F.col(seed_col).alias("node")).distinct()
                  .join(nodes, "node").localCheckpoint())
    n_seeds = seed_nodes.count()
    if n_seeds == 0:
        return nodes.withColumn("rank", F.lit(0.0))

    out_deg = e.groupBy("src").agg(F.count("*").alias("out_deg"))
    contrib_base = (e.join(out_deg, "src")
                    .select("src", "dst",
                            (F.lit(1.0) / F.col("out_deg")).alias("w"))
                    .repartition("src").localCheckpoint())
    dangling_nodes = (nodes.join(out_deg.withColumnRenamed("src", "node"),
                                 "node", "left_anti").localCheckpoint())

    # teleport vector: 1/|S| on seeds, 0 elsewhere — also the start state
    tele = (nodes.join(seed_nodes.withColumn("is_seed", F.lit(True)),
                       "node", "left")
            .select("node",
                    F.when(F.col("is_seed"),
                           F.lit(1.0) / F.lit(float(n_seeds)))
                    .otherwise(F.lit(0.0)).alias("t"))
            .localCheckpoint())
    ranks = tele.withColumnRenamed("t", "rank")
    for _ in range(iterations):
        row = (dangling_nodes.join(ranks, "node")
               .agg(F.sum("rank").alias("m")).collect()[0])
        dangling_share = damping * float(row["m"] or 0.0)
        summed = (contrib_base
                  .join(ranks.withColumnRenamed("node", "src"), "src")
                  .groupBy("dst")
                  .agg(F.sum(F.col("w") * F.col("rank")).alias("s")))
        ranks = (tele.join(summed.withColumnRenamed("dst", "node"),
                           "node", "left")
                 .select("node",
                         ((F.lit(1.0 - damping)
                           + F.lit(dangling_share)) * F.col("t")
                          + F.lit(damping)
                          * F.coalesce(F.col("s"), F.lit(0.0))).alias("rank"))
                 .localCheckpoint())
    return ranks


def ppr_oracle_sql(edges_sql: str, seeds_sql: str, iterations: int = 5,
                   damping: float = 0.85) -> str:
    """EXACT ANSI-SQL replay of :func:`personalized_pagerank` as chained
    CTEs for DuckDB.  ``edges_sql`` selects ``src, dst``; ``seeds_sql``
    selects a single ``node`` column."""
    d = repr(damping)
    sql = [f"WITH e AS (SELECT DISTINCT src, dst FROM ({edges_sql})",
           "             WHERE src IS NOT NULL AND dst IS NOT NULL),",
           "  nodes AS (SELECT src AS node FROM e UNION SELECT dst FROM e),",
           f"  seeds AS (SELECT DISTINCT node FROM ({seeds_sql})",
           "             WHERE node IN (SELECT node FROM nodes)),",
           "  ns AS (SELECT COUNT(*)::DOUBLE AS n FROM seeds),",
           "  od AS (SELECT src, COUNT(*)::DOUBLE AS out_deg FROM e GROUP BY src),",
           "  cb AS (SELECT e.src, e.dst, 1.0::DOUBLE / od.out_deg AS w",
           "         FROM e JOIN od ON e.src = od.src),",
           "  tele AS (SELECT nodes.node,",
           "             CASE WHEN seeds.node IS NOT NULL THEN 1.0::DOUBLE / ns.n",
           "                  ELSE 0.0::DOUBLE END AS t",
           "           FROM nodes CROSS JOIN ns",
           "           LEFT JOIN seeds ON nodes.node = seeds.node),",
           "  r0 AS (SELECT node, t AS rank FROM tele),"]
    for i in range(iterations):
        p, c = f"r{i}", f"r{i + 1}"
        sql += [
            f"  dang{i} AS (SELECT COALESCE(SUM(r.rank), 0.0::DOUBLE) AS m",
            f"              FROM {p} r LEFT JOIN od ON r.node = od.src",
            "               WHERE od.src IS NULL),",
            f"  s{i} AS (SELECT cb.dst, SUM(cb.w * r.rank) AS s",
            f"           FROM cb JOIN {p} r ON cb.src = r.node GROUP BY cb.dst),",
            f"  {c} AS (SELECT tele.node,",
            f"            ((1.0::DOUBLE - {d}::DOUBLE)",
            f"             + {d}::DOUBLE * dang{i}.m) * tele.t",
            f"            + {d}::DOUBLE * COALESCE(s{i}.s, 0.0::DOUBLE) AS rank",
            f"          FROM tele CROSS JOIN dang{i}",
            f"          LEFT JOIN s{i} ON tele.node = s{i}.dst),",
        ]
    body = "\n".join(sql).rstrip(",")
    return body + f"\nSELECT node, rank FROM r{iterations}"
