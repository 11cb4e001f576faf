"""HyperANF: neighborhood function / reachable-set size per node via
HLL sketch propagation (Boldi, Rosa & Vigna, WWW 2011 — public
algorithm; beyond-reference, SURVEY.md §2 round-2 surface).

*How many pages can this page reach within t hops?* is the crawl-depth /
influence question on a web-scale link graph.  Exact answers need one
BFS per node (quadratic); HyperANF keeps ONE HyperLogLog sketch per node
and exploits that HLL union = register-wise max, so a whole BFS round is

    sketch_{t+1}(v) = max-merge( sketch_t(v),
                                 sketch_t(u) for each edge v -> u )

— a join + partial-aggregatable groupBy().max() per round, the exact
shape Spark executes best at 10^12 edges (map-side combine collapses
high-out-degree skew before the exchange; AQE splits residual hot keys).

Cross-engine-exact design (the repo's portable-HLL idiom,
sketches.py): registers live in LONG FORM as (node, bucket, rho) rows —
at most m rows per node — from the salted-md5 hash family, rho via the
shared ``hll_rho_sql`` ANSI text; merges are pure MAX so any engine
replays every round bit-identically; the final harmonic sum is BIGINT
fixed point (sum of 2^(nbits+1-rho), exact in any aggregation order)
and only the last division + small-range linear-counting correction
touch floats (rounded for the oracle hash).  ``localCheckpoint`` per
round truncates the iterative lineage (components.py requirement).

Reference anchor: none (the reference's graph never asks reachability);
this is the sketch-side scale path for the same link statistics family
as operators/stats.py.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

from .sketches import HEX_DIGITS, _hll_alpha, hll_rho_sql


def neighborhood_sketches(edges: DataFrame, rounds: int = 3,
                          p_nibbles: int = 1, salt: str = "anf",
                          src: str = "src", dst: str = "dst") -> DataFrame:
    """edges(src, dst) -> (node, bucket, rho) register rows of the HLL
    sketch of each node's <=``rounds``-hop FORWARD reachable set
    (including the node itself)."""
    e = (edges.select(F.col(src).alias("src"), F.col(dst).alias("dst"))
         .filter(F.col("src").isNotNull() & F.col("dst").isNotNull())
         .distinct().localCheckpoint())
    nodes = (e.select(F.col("src").alias("node"))
             .union(e.select(F.col("dst").alias("node")))
             .distinct())
    hx = F.substring(F.md5(F.concat(F.lit(salt + "|"),
                                    F.col("node").cast("string"))),
                     1, HEX_DIGITS)
    state = (nodes.withColumn("hx", hx)
             .selectExpr("node",
                         f"CAST(conv(substr(hx, 1, {p_nibbles}), 16, 10) "
                         "AS INT) AS bucket",
                         f"{hll_rho_sql('hx', p_nibbles)} AS rho")
             .localCheckpoint())
    for _ in range(rounds):
        msgs = (e.join(state.withColumnRenamed("node", "dst"), "dst")
                .select(F.col("src").alias("node"), "bucket", "rho"))
        state = (state.unionByName(msgs)
                 .groupBy("node", "bucket").agg(F.max("rho").alias("rho"))
                 .localCheckpoint())
    return state


def neighborhood_function(edges: DataFrame, rounds: int = 3,
                          p_nibbles: int = 1, salt: str = "anf",
                          src: str = "src", dst: str = "dst") -> DataFrame:
    """Per-node reachable-set estimate after ``rounds`` hops:
    (node, hll_sum_fixed, n_present, est) — ``hll_sum_fixed`` is the
    exact BIGINT the oracle equality rides on, ``est`` the standard
    HLL estimate with linear-counting small-range correction."""
    m = 16 ** p_nibbles
    nbits = 4 * (HEX_DIGITS - p_nibbles)
    regs = neighborhood_sketches(edges, rounds, p_nibbles, salt, src, dst)
    term = F.expr(f"shiftleft(cast(1 as bigint), {nbits + 1} - rho)")
    agg = regs.groupBy("node").agg(
        F.sum(term).cast("bigint").alias("present_sum"),
        F.count(F.lit(1)).alias("n_present"))
    two_nbits = 1 << (nbits + 1)
    sum_fixed = (F.col("present_sum")
                 + (F.lit(m) - F.col("n_present")) * F.lit(two_nbits))
    zeros = (F.lit(m) - F.col("n_present")).cast("bigint")
    alpha = _hll_alpha(m)
    raw = F.lit(alpha * m * m * float(two_nbits)) / sum_fixed.cast("double")
    lin = F.lit(float(m)) * F.log(F.lit(float(m)) / zeros.cast("double"))
    est = F.when((raw <= F.lit(2.5 * m)) & (zeros > 0), lin).otherwise(raw)
    return agg.select("node",
                      sum_fixed.cast("bigint").alias("hll_sum_fixed"),
                      F.col("n_present").cast("long").alias("n_present"),
                      F.round(est, 4).alias("est"))


def anf_oracle_sql(edges_sql: str, rounds: int = 3, p_nibbles: int = 1,
                   salt: str = "anf") -> str:
    """EXACT ANSI replay of :func:`neighborhood_function` as chained
    CTEs for DuckDB.  ``edges_sql`` must select ``src, dst``."""
    m = 16 ** p_nibbles
    nbits = 4 * (HEX_DIGITS - p_nibbles)
    two_nbits = 1 << (nbits + 1)
    alpha = _hll_alpha(m)
    sql = [
        f"WITH e AS (SELECT DISTINCT src, dst FROM ({edges_sql})",
        "            WHERE src IS NOT NULL AND dst IS NOT NULL),",
        "  nodes AS (SELECT src AS node FROM e UNION SELECT dst FROM e),",
        "  hx0 AS (SELECT node,",
        f"            substr(md5('{salt}|' || node::VARCHAR), 1,"
        f" {HEX_DIGITS}) AS hx",
        "          FROM nodes),",
        "  s0 AS (SELECT node,",
        f"           ('0x' || substr(hx, 1, {p_nibbles}))::BIGINT"
        "::INT AS bucket,",
        f"           {hll_rho_sql('hx', p_nibbles)} AS rho",
        "         FROM hx0),",
    ]
    for i in range(rounds):
        sql += [
            f"  s{i + 1} AS (SELECT node, bucket, MAX(rho) AS rho FROM (",
            f"      SELECT node, bucket, rho FROM s{i}",
            "      UNION ALL",
            f"      SELECT e.src AS node, s.bucket, s.rho",
            f"      FROM e JOIN s{i} s ON e.dst = s.node",
            "    ) GROUP BY node, bucket),",
        ]
    sql += [
        f"  agg AS (SELECT node,",
        f"            SUM((1::BIGINT << ({nbits + 1} - rho)))::BIGINT"
        "              AS present_sum,",
        "            COUNT(*)::BIGINT AS n_present",
        f"          FROM s{rounds} GROUP BY node)",
        "SELECT node,",
        f"  (present_sum + ({m} - n_present) * {two_nbits})::BIGINT"
        "    AS hll_sum_fixed,",
        "  n_present,",
        f"  round(CASE WHEN ({alpha!r} * {m} * {m} * {float(two_nbits)!r}",
        f"          / (present_sum + ({m} - n_present) * {two_nbits})::DOUBLE)"
        f" <= {2.5 * m}",
        f"         AND ({m} - n_present) > 0",
        f"        THEN {float(m)!r} * ln({float(m)!r}"
        f" / ({m} - n_present)::DOUBLE)",
        f"        ELSE {alpha!r} * {m} * {m} * {float(two_nbits)!r}",
        f"          / (present_sum + ({m} - n_present) * {two_nbits})::DOUBLE",
        "        END, 4) AS est",
        "FROM agg",
    ]
    return "\n".join(sql)
