"""GNN-style neighbor feature propagation / mean message passing
(beyond-reference; SURVEY.md §2 round-2 surface — the feature-side
companion to operators/walks.py's structure-side embedding corpus).

Graph-augmented training data wants every node's embedding smoothed
with its neighborhood (one GCN mean-pooling layer == "SGC" simple graph
convolution, Wu et al. 2019, public): h_{t+1}(v) = mean of h_t over
{v} union in-neighbors(v).  Run for a few rounds this is feature
diffusion — no learned weights, pure data preparation, which is exactly
the part that belongs in the Spark pipeline rather than the trainer.

Spark-first, cross-engine-exact design:

* features live in LONG FORM (node, dim, val) — posexplode once, then
  every round is ONE edge join + ONE partial-aggregatable
  groupBy(node, dim) — the same skew-collapsing shape as
  hits.py/pagerank.py; no arrays are shuffled, and a 1000-executor
  cluster sees only (nodes x dims) tiny rows per exchange;
* values are BIGINT micro-units from ``FLOOR(1e6 * x)`` (floor, never
  round — round()'s half-mode is engine-dependent, quantize.py
  precedent); the mean is ``FLOOR(sum / count)`` where the division is
  an exact-dividend double over a BIGINT sum, so every round is
  bit-reproducible in any engine and any aggregation order — the q121
  DuckDB oracle replays all rounds identically;
* ``localCheckpoint`` per round truncates the iterative lineage.

Overflow bound: |val| <= 1e6 at t=0 and a mean never exceeds the max of
its inputs, so values stay within +-1e6 forever; per-(node, dim) sums
are bounded by (1 + in_degree) * 1e6 — BIGINT-safe to in-degree ~9e12.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

SCALE = 1_000_000


def explode_features(nodes: DataFrame, id_col: str = "vec_id",
                     vec_col: str = "embedding") -> DataFrame:
    """(id, vector) -> (node, dim, val) long form, dim 1-based,
    val = FLOOR(SCALE * x) BIGINT micro-units."""
    return (nodes.select(F.col(id_col).alias("node"),
                         F.posexplode(vec_col).alias("pos", "x"))
            .select("node", (F.col("pos") + 1).alias("dim"),
                    F.floor(F.lit(SCALE) * F.col("x").cast("double"))
                     .cast("long").alias("val")))


def propagate_features(nodes: DataFrame, edges: DataFrame,
                       rounds: int = 2, id_col: str = "vec_id",
                       vec_col: str = "embedding",
                       src: str = "src", dst: str = "dst") -> DataFrame:
    """One SGC mean-pooling layer per round over edges(src, dst): the
    DST node averages itself with its in-neighbors' current features.
    Returns (node, dim, val) after ``rounds`` rounds."""
    e = (edges.select(F.col(src).alias("src"), F.col(dst).alias("dst"))
         .filter(F.col("src").isNotNull() & F.col("dst").isNotNull())
         .distinct().localCheckpoint())
    state = explode_features(nodes, id_col, vec_col).localCheckpoint()
    for _ in range(rounds):
        msgs = (e.join(state.withColumnRenamed("node", "src"), "src")
                .select(F.col("dst").alias("node"), "dim", "val"))
        state = (state.unionByName(msgs)
                 .groupBy("node", "dim")
                 .agg(F.expr("CAST(FLOOR(SUM(val) / CAST(COUNT(*) AS "
                             "DOUBLE)) AS BIGINT)").alias("val"))
                 .localCheckpoint())
    return state


def gnnprop_oracle_sql(nodes_sql: str, edges_sql: str,
                       rounds: int = 2) -> str:
    """EXACT ANSI replay of :func:`propagate_features` for DuckDB.
    ``nodes_sql`` must select (node, e) with ``e`` a DOUBLE list;
    ``edges_sql`` must select (src, dst).  Returns long-form
    (node, dim, val)."""
    sql = [
        f"WITH nv AS ({nodes_sql}),",
        f"  e AS (SELECT DISTINCT src, dst FROM ({edges_sql})",
        "         WHERE src IS NOT NULL AND dst IS NOT NULL),",
        "  s0 AS (SELECT node, i AS dim,",
        f"           CAST(FLOOR({SCALE} * e[i]) AS BIGINT) AS val",
        "         FROM nv, unnest(range(1, len(e) + 1)) AS t(i)),",
    ]
    for i in range(rounds):
        sql += [
            f"  s{i + 1} AS (SELECT node, dim,",
            "      CAST(FLOOR(SUM(val) / CAST(COUNT(*) AS DOUBLE))"
            " AS BIGINT) AS val",
            "    FROM (",
            f"      SELECT node, dim, val FROM s{i}",
            "      UNION ALL",
            f"      SELECT e.dst AS node, s.dim, s.val",
            f"      FROM e JOIN s{i} s ON e.src = s.node",
            "    ) GROUP BY node, dim),",
        ]
    body = "\n".join(sql).rstrip(",")
    return body + f"\nSELECT node, dim, val FROM s{rounds}"
