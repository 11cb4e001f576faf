"""Community detection by synchronous label propagation (LPA).

Beyond-reference (SURVEY.md §2 round-2 surface): the reference's graph
analysis stops at find_related one-hop neighbours
(/root/reference/src/knowledgebase_processor/services/ — no clustering);
on a web-scale KG the next question after connected components ("which
nodes are REACHABLE") is community structure ("which nodes are DENSELY
linked") — topic clusters of documents, entity neighbourhoods, crawl
frontier grouping.  Connected components (operators/components.py) is
the degenerate threshold of this operator; LPA differs by electing the
MOST FREQUENT neighbour label, not the minimum reachable one.

Determinism.  Vanilla LPA is notoriously run-order dependent; this
implementation removes every source of nondeterminism so the result is
bit-reproducible and cross-engine checkable (q75's chained-CTE oracle):

* SYNCHRONOUS updates — round t+1 reads only round t's labels;
* a SELF-VOTE — each node votes once for its own current label, which
  both stabilises two-node oscillation (the classic sync-LPA failure)
  and anchors singletons;
* deterministic tie-break — highest vote count, then SMALLEST label.

Scale shape (per iteration, DataFrames only):

* one equi-join of the (node,label) frame onto the static undirected
  edge list — the edge list is repartitioned on the join key once and
  ``localCheckpoint``-ed, so iterations shuffle only the label frame;
* one ``groupBy(node, label).count()`` — partial-aggregatable, so a
  celebrity node's million votes fold map-side before the exchange;
* one top-1-per-node window — Catalyst's WindowGroupLimit forwards a
  single row per (partition, node) before the window shuffle;
* ``localCheckpoint`` per round truncates iterative lineage (same as
  pagerank.py / components.py).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window, functions as F


def _undirected(edges: DataFrame, src: str, dst: str) -> DataFrame:
    fwd = edges.select(F.col(src).alias("src"), F.col(dst).alias("dst"))
    rev = edges.select(F.col(dst).alias("src"), F.col(src).alias("dst"))
    return (fwd.union(rev)
            .filter(F.col("src").isNotNull() & F.col("dst").isNotNull()
                    & (F.col("src") != F.col("dst")))
            .distinct())


def label_propagation(edges: DataFrame, iterations: int = 4,
                      src: str = "src", dst: str = "dst") -> DataFrame:
    """edges(src, dst) -> (node, label) after ``iterations`` synchronous
    LPA rounds over the undirected simple graph (both directions added,
    self-loops and duplicate edges dropped).  Initial label = node id."""
    e = _undirected(edges, src, dst).repartition("src").localCheckpoint()
    nodes = e.select(F.col("src").alias("node")).distinct().localCheckpoint()
    labels = nodes.select("node", F.col("node").alias("label"))
    top1 = Window.partitionBy("node").orderBy(F.col("c").desc(),
                                              F.col("label").asc())
    for _ in range(iterations):
        nbr_votes = (e.join(labels.withColumnRenamed("node", "src"), "src")
                     .select(F.col("dst").alias("node"), "label"))
        votes = nbr_votes.unionByName(labels.select("node", "label"))
        counted = votes.groupBy("node", "label").agg(
            F.count(F.lit(1)).alias("c"))
        labels = (counted.withColumn("rn", F.row_number().over(top1))
                  .filter(F.col("rn") == 1)
                  .select("node", "label")
                  .localCheckpoint())
    return labels


def label_propagation_oracle_sql(edges_sql: str, iterations: int = 4) -> str:
    """EXACT ANSI-SQL replay of :func:`label_propagation` as chained CTEs
    for DuckDB value-checking.  ``edges_sql`` must select ``src, dst``;
    counts and the (count DESC, label ASC) row_number tie-break are
    integer/deterministic, so the labels match bit-for-bit."""
    sql = [f"WITH raw AS ({edges_sql}),",
           "  e AS (SELECT DISTINCT src, dst FROM (",
           "          SELECT src, dst FROM raw",
           "          UNION ALL SELECT dst AS src, src AS dst FROM raw)",
           "        WHERE src IS NOT NULL AND dst IS NOT NULL",
           "          AND src <> dst),",
           "  nodes AS (SELECT DISTINCT src AS node FROM e),",
           "  r0 AS (SELECT node, node AS label FROM nodes),"]
    for i in range(iterations):
        p, c = f"r{i}", f"r{i + 1}"
        sql += [
            f"  v{i} AS (SELECT e.dst AS node, r.label",
            f"           FROM e JOIN {p} r ON e.src = r.node",
            f"           UNION ALL SELECT node, label FROM {p}),",
            f"  c{i} AS (SELECT node, label, COUNT(*) AS c",
            f"           FROM v{i} GROUP BY node, label),",
            f"  {c} AS (SELECT node, label FROM (",
            f"            SELECT node, label, ROW_NUMBER() OVER (",
            "               PARTITION BY node ORDER BY c DESC, label ASC) AS rn",
            f"            FROM c{i}) WHERE rn = 1),",
        ]
    body = "\n".join(sql).rstrip(",")
    return body + f"\nSELECT node, label FROM r{iterations}"
