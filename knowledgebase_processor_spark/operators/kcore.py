"""k-core decomposition by synchronous peeling.

Beyond-reference (SURVEY.md §2 round-2 surface; complements
communities.py / triangles.py / pagerank.py in the KG graph-analysis
family).  The k-core — the maximal subgraph where every node keeps
degree >= k — is the standard "dense nucleus" extractor for a web-scale
entity graph: spam-farm detection (link farms survive high-k cores),
crawl-frontier prioritisation, and robust-seed selection for entity
linking all consume it.

Determinism & cross-engine checkability: peeling is SYNCHRONOUS — each
round computes degrees on the CURRENT surviving subgraph and drops every
node below k at once.  The peel sequence is therefore a pure function of
the graph (no visit order), and a fixed ``rounds`` unrolls to chained
SQL CTEs that DuckDB replays bit-identically (q78's oracle).  Peeling
converges in at most |V| rounds but in practice a handful; rounds beyond
convergence are no-ops (the CTE replay includes them too); a production
caller loops until the surviving edge count stops changing instead of
fixing ``rounds``.

Scale shape (per round):

* degree count = one partial-aggregatable groupBy over the surviving
  edge list (celebrity-node degree folds map-side);
* survivor filter = one broadcast-able semi-join of the (small) node
  frame onto each edge endpoint; Spark picks SHUFFLE_HASH/broadcast via
  AQE as the survivor frame shrinks;
* ``localCheckpoint`` truncates iterative lineage (pagerank.py /
  components.py contract).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

from knowledgebase_processor_spark.operators.communities import _undirected


def kcore(edges: DataFrame, k: int, rounds: int = 6,
          src: str = "src", dst: str = "dst") -> DataFrame:
    """edges(src, dst) -> (node, degree) of the subgraph surviving
    ``rounds`` synchronous peels at threshold ``k`` over the undirected
    simple graph.  With enough rounds this IS the k-core; ``degree`` is
    the node's degree inside the surviving subgraph."""
    e = _undirected(edges, src, dst).localCheckpoint()
    for _ in range(rounds):
        deg = e.groupBy("src").agg(F.count(F.lit(1)).alias("degree"))
        keep = deg.filter(F.col("degree") >= k).select("src")
        e = (e.join(keep, "src", "left_semi")
             .join(keep.withColumnRenamed("src", "dst"), "dst", "left_semi")
             .localCheckpoint())
    return e.groupBy("src").agg(F.count(F.lit(1)).alias("degree")) \
            .filter(F.col("degree") >= k) \
            .select(F.col("src").alias("node"), "degree")


def kcore_oracle_sql(edges_sql: str, k: int, rounds: int = 6) -> str:
    """EXACT chained-CTE replay of :func:`kcore` for DuckDB."""
    sql = [f"WITH raw AS ({edges_sql}),",
           "  e0 AS (SELECT DISTINCT src, dst FROM (",
           "           SELECT src, dst FROM raw",
           "           UNION ALL SELECT dst AS src, src AS dst FROM raw)",
           "         WHERE src IS NOT NULL AND dst IS NOT NULL",
           "           AND src <> dst),"]
    for i in range(rounds):
        p, c = f"e{i}", f"e{i + 1}"
        sql += [
            f"  d{i} AS (SELECT src, COUNT(*) AS degree FROM {p} GROUP BY src),",
            f"  s{i} AS (SELECT src FROM d{i} WHERE degree >= {k}),",
            f"  {c} AS (SELECT p.src, p.dst FROM {p} p",
            f"          JOIN s{i} a ON p.src = a.src",
            f"          JOIN s{i} b ON p.dst = b.src),",
        ]
    body = "\n".join(sql).rstrip(",")
    return (body + f"\nSELECT src AS node, COUNT(*) AS degree FROM e{rounds}"
            f"\nGROUP BY src HAVING COUNT(*) >= {k}")
