"""HITS hubs-and-authorities over the KG link graph (beyond-reference;
SURVEY.md §2 round-2 surface — companion to operators/pagerank.py).

Where PageRank scores global importance, HITS separates *hub* pages
(link out to many good sources — index/portal pages a crawler should
re-visit) from *authority* pages (linked by many good hubs — the pages
a KG should prefer as canonical entity sources).  Kleinberg 1999,
public algorithm.

Spark-first, cross-engine-exact design:

* an iteration is two (join + partial-aggregatable groupBy) passes —
  authorities sum in-neighbour hub scores, hubs sum out-neighbour
  authority scores; both sums map-side combine before their shuffle,
  so head-node in-degree skew collapses early, and AQE splits the join
  side of any residual hub key;
* scores are BIGINT micro-units normalized by the round MAX via
  integer division, never floats: a float `sum` over an unordered
  shuffle is not bit-reproducible, while BIGINT sums and `x*SCALE DIV
  max` are exact in ANY engine and ANY aggregation order — the q116
  DuckDB oracle replays every round bit-identically (the same
  fixed-point idiom as the q84 RRF / q106 anomaly operators);
* the per-round max is a 1-row aggregate frame cross-joined back
  (BroadcastNestedLoop on a single row) — nothing driver-side;
* `localCheckpoint` per round truncates the iterative lineage, the
  standard requirement for DataFrame power iterations (components.py).

Overflow bound: raw sums are <= max_degree * SCALE and the normalize
multiplies by SCALE (1e6), so BIGINT holds up to max_degree ~ 9e6 —
beyond that, lower SCALE or pre-cap degrees (the linkpred.py hub cap).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

SCALE = 1_000_000


def _normalize(nodes: DataFrame, raw: DataFrame, out_col: str) -> DataFrame:
    """(node, raw) -> (node, out_col) scaled so the max equals SCALE."""
    full = (nodes.join(raw, "node", "left")
            .select("node", F.coalesce(F.col("raw"), F.lit(0))
                    .cast("long").alias("raw")))
    mx = full.agg(F.max("raw").alias("mx"))
    return (full.crossJoin(mx)
            .select("node",
                    F.expr(f"CASE WHEN mx > 0 THEN raw * {SCALE} DIV mx "
                           "ELSE 0 END").cast("long").alias(out_col)))


def hits(edges: DataFrame, iterations: int = 4,
         src: str = "src", dst: str = "dst") -> DataFrame:
    """edges(src, dst) -> (node, hub, auth) after ``iterations`` rounds,
    fixed-point BIGINT micro-units max-normalized to SCALE.  Duplicate
    edges collapse first (HITS is defined on the link set)."""
    e = (edges.select(F.col(src).alias("src"), F.col(dst).alias("dst"))
         .filter(F.col("src").isNotNull() & F.col("dst").isNotNull())
         .distinct().localCheckpoint())
    nodes = (e.select(F.col("src").alias("node"))
             .union(e.select(F.col("dst").alias("node")))
             .distinct().localCheckpoint())

    hub = nodes.withColumn("hub", F.lit(SCALE).cast("long"))
    auth = None
    for _ in range(iterations):
        a_raw = (e.join(hub.withColumnRenamed("node", "src"), "src")
                 .groupBy("dst").agg(F.sum("hub").alias("raw"))
                 .withColumnRenamed("dst", "node"))
        auth = _normalize(nodes, a_raw, "auth").localCheckpoint()
        h_raw = (e.join(auth.withColumnRenamed("node", "dst"), "dst")
                 .groupBy("src").agg(F.sum("auth").alias("raw"))
                 .withColumnRenamed("src", "node"))
        hub = _normalize(nodes, h_raw, "hub").localCheckpoint()
    return nodes.join(hub, "node").join(auth, "node") \
                .select("node", "hub", "auth")


def hits_oracle_sql(edges_sql: str, iterations: int = 4) -> str:
    """EXACT ANSI-SQL replay of :func:`hits` as chained CTEs for DuckDB
    value-checking.  ``edges_sql`` must select columns ``src, dst``."""
    sql = [f"WITH e AS (SELECT DISTINCT src, dst FROM ({edges_sql})",
           "             WHERE src IS NOT NULL AND dst IS NOT NULL),",
           "  nodes AS (SELECT src AS node FROM e UNION SELECT dst FROM e),",
           f"  h0 AS (SELECT node, {SCALE}::BIGINT AS hub FROM nodes),"]
    for i in range(iterations):
        hp, a, h = f"h{i}", f"a{i + 1}", f"h{i + 1}"
        sql += [
            f"  {a}r AS (SELECT nodes.node, COALESCE(s.raw, 0)::BIGINT AS raw",
            "            FROM nodes LEFT JOIN (",
            f"              SELECT e.dst AS node, SUM(h.hub)::BIGINT AS raw",
            f"              FROM e JOIN {hp} h ON e.src = h.node",
            "               GROUP BY e.dst) s USING (node)),",
            f"  {a}m AS (SELECT MAX(raw) AS mx FROM {a}r),",
            f"  {a} AS (SELECT node, (CASE WHEN mx > 0",
            f"            THEN raw * {SCALE} // mx ELSE 0 END)::BIGINT AS auth",
            f"          FROM {a}r, {a}m),",
            f"  {h}r AS (SELECT nodes.node, COALESCE(s.raw, 0)::BIGINT AS raw",
            "            FROM nodes LEFT JOIN (",
            f"              SELECT e.src AS node, SUM(a.auth)::BIGINT AS raw",
            f"              FROM e JOIN {a} a ON e.dst = a.node",
            "               GROUP BY e.src) s USING (node)),",
            f"  {h}m AS (SELECT MAX(raw) AS mx FROM {h}r),",
            f"  {h} AS (SELECT node, (CASE WHEN mx > 0",
            f"            THEN raw * {SCALE} // mx ELSE 0 END)::BIGINT AS hub",
            f"          FROM {h}r, {h}m),",
        ]
    body = "\n".join(sql).rstrip(",")
    return (body + "\nSELECT node, h.hub, a.auth"
            f"\nFROM h{iterations} h JOIN a{iterations} a USING (node)")
