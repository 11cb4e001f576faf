"""Whole-graph structure metrics: modularity of a community partition
and degree assortativity (beyond-reference; SURVEY.md §2 round-2
surface — the evaluation twin of operators/communities.py, the same
role agreement.py plays for operators/classifier.py).

A KG built by the extraction pipeline (wikilink graph, mention graph,
dedup pair graph) gets *partitioned* by label propagation / connected
components; these metrics say whether that partition — and the graph
itself — is structured or noise:

* ``modularity`` — Newman modularity Q of a (node, label) partition
  (Newman & Girvan 2004, public).  Exact integer core: with E the
  distinct symmetric directed edge set (|E| = 2m), per community
  q_num_c = |E| * intra_c - deg_sum_c^2 over the common denominator
  |E|^2, so Q = sum(q_num_c) / |E|^2.  Every per-community row carries
  BIGINT (n_nodes, intra_directed, deg_sum, q_num) — the value-checked
  payload — and only the final summary Q is a float (ONE double
  division of two exact integers, bit-identical in any engine).
  Exactness bound: |E| * intra_c < 2^63 (holds through ~3e9 directed
  edges per community — far past any single community we'd accept).

* ``assortativity`` — Pearson degree-degree correlation over edge
  endpoints (Newman 2002).  Moments n, sum_x, sum_xy, sum_x2 are exact
  BIGINTs over the symmetric edge set (sum_y == sum_x by symmetry);
  r_num = n*sum_xy - sum_x^2, r_den = n*sum_x2 - sum_x^2 are the
  value-checked integers, r = r_num / r_den one double division.

Scale shape: both are two partial-agg ``groupBy``s plus node-keyed
joins of the edge list to the degree/label tables — shuffles on the
node id only, no windows, no driver loops; the per-community /
one-row outputs are tiny.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

from .communities import _undirected

# The doubled symmetric edge CTE shared by every oracle here — the
# exact SQL twin of communities._undirected.
_E_SQL = """
  e AS (SELECT DISTINCT src, dst FROM (
          SELECT src, dst FROM raw
          UNION ALL SELECT dst AS src, src AS dst FROM raw)
        WHERE src IS NOT NULL AND dst IS NOT NULL
          AND src <> dst)"""


def modularity(edges: DataFrame, labels: DataFrame,
               src: str = "src", dst: str = "dst",
               node: str = "node", label: str = "label") -> DataFrame:
    """(edges, node->label partition) -> per-community rows
    (label, n_nodes, intra_directed, deg_sum, q_num) + a summary row
    ``label = -1`` with the totals and the float ``q``."""
    e = _undirected(edges, src, dst)
    lab = labels.select(F.col(node).alias("n"), F.col(label).alias("lb"))
    deg = e.groupBy("src").agg(F.count(F.lit(1)).cast("long").alias("deg"))
    two_m = e.agg(F.count(F.lit(1)).cast("long").alias("two_m"))

    el = (e.join(lab.withColumnRenamed("n", "src"), "src")
          .withColumnRenamed("lb", "ls")
          .join(lab.withColumnRenamed("n", "dst"), "dst")
          .withColumnRenamed("lb", "ld"))
    intra = (el.filter(F.col("ls") == F.col("ld"))
             .groupBy(F.col("ls").alias("lb"))
             .agg(F.count(F.lit(1)).cast("long").alias("intra_directed")))
    degsum = (deg.join(lab.withColumnRenamed("n", "src"), "src")
              .groupBy("lb")
              .agg(F.count(F.lit(1)).cast("long").alias("n_nodes"),
                   F.sum("deg").cast("long").alias("deg_sum")))
    per = (degsum.join(intra, "lb", "left")
           .na.fill({"intra_directed": 0})
           .crossJoin(F.broadcast(two_m))
           .select(F.col("lb").cast("long").alias("label"),
                   "n_nodes", "intra_directed", "deg_sum",
                   (F.col("two_m") * F.col("intra_directed")
                    - F.col("deg_sum") * F.col("deg_sum"))
                   .cast("long").alias("q_num"),
                   "two_m"))
    summary = per.agg(
        F.lit(-1).cast("long").alias("label"),
        F.sum("n_nodes").cast("long").alias("n_nodes"),
        F.sum("intra_directed").cast("long").alias("intra_directed"),
        F.sum("deg_sum").cast("long").alias("deg_sum"),
        F.sum("q_num").cast("long").alias("q_num"),
        F.max("two_m").alias("two_m"))
    out = per.unionByName(summary)
    # ONE double division of two exact integers — deterministic in any
    # engine; the integer columns stay the value-checked payload.
    return out.select(
        "label", "n_nodes", "intra_directed", "deg_sum", "q_num",
        (F.col("q_num").cast("double")
         / (F.col("two_m").cast("double") * F.col("two_m").cast("double")))
        .alias("q")).orderBy("label")


def modularity_oracle_sql(edges_sql: str, labels_sql: str) -> str:
    """EXACT ANSI replay of :func:`modularity`; ``labels_sql`` must
    select (node, label) — it may itself be a parenthesized WITH-query
    (e.g. the label-propagation oracle)."""
    return f"""
        WITH raw AS ({edges_sql}),{_E_SQL},
        lab AS (SELECT node AS n, label AS lb FROM ({labels_sql}) q),
        deg AS (SELECT src, COUNT(*)::BIGINT AS deg FROM e GROUP BY src),
        tm AS (SELECT COUNT(*)::BIGINT AS two_m FROM e),
        intra AS (
          SELECT l1.lb, COUNT(*)::BIGINT AS intra_directed
          FROM e JOIN lab l1 ON e.src = l1.n
                 JOIN lab l2 ON e.dst = l2.n
          WHERE l1.lb = l2.lb GROUP BY l1.lb),
        degsum AS (
          SELECT lb, COUNT(*)::BIGINT AS n_nodes,
                 SUM(deg)::BIGINT AS deg_sum
          FROM deg JOIN lab ON deg.src = lab.n GROUP BY lb),
        per AS (
          SELECT d.lb::BIGINT AS label, d.n_nodes,
                 COALESCE(i.intra_directed, 0)::BIGINT AS intra_directed,
                 d.deg_sum,
                 (tm.two_m * COALESCE(i.intra_directed, 0)
                  - d.deg_sum * d.deg_sum)::BIGINT AS q_num,
                 tm.two_m
          FROM degsum d LEFT JOIN intra i ON d.lb = i.lb CROSS JOIN tm),
        allrows AS (
          SELECT label, n_nodes, intra_directed, deg_sum, q_num, two_m
          FROM per
          UNION ALL
          SELECT -1::BIGINT, SUM(n_nodes)::BIGINT,
                 SUM(intra_directed)::BIGINT, SUM(deg_sum)::BIGINT,
                 SUM(q_num)::BIGINT, MAX(two_m) FROM per)
        SELECT label, n_nodes, intra_directed, deg_sum, q_num,
               q_num::DOUBLE / (two_m::DOUBLE * two_m::DOUBLE) AS q
        FROM allrows"""


def assortativity(edges: DataFrame,
                  src: str = "src", dst: str = "dst") -> DataFrame:
    """edges -> one row (n_edges_directed, sum_x, sum_xy, sum_x2,
    r_num, r_den, r): degree assortativity over the symmetric edge set.
    By symmetry the x- and y-marginals coincide, so three BIGINT
    moments determine Pearson's r exactly."""
    e = _undirected(edges, src, dst)
    deg = e.groupBy("src").agg(F.count(F.lit(1)).cast("long").alias("deg"))
    xy = (e.join(deg.withColumnRenamed("deg", "x"), "src")
          .join(deg.select(F.col("src").alias("dst"),
                           F.col("deg").alias("y")), "dst"))
    m = xy.agg(F.count(F.lit(1)).cast("long").alias("n_edges_directed"),
               F.sum("x").cast("long").alias("sum_x"),
               F.sum(F.col("x") * F.col("y")).cast("long").alias("sum_xy"),
               F.sum(F.col("x") * F.col("x")).cast("long").alias("sum_x2"))
    return m.select(
        "*",
        (F.col("n_edges_directed") * F.col("sum_xy")
         - F.col("sum_x") * F.col("sum_x")).cast("long").alias("r_num"),
        (F.col("n_edges_directed") * F.col("sum_x2")
         - F.col("sum_x") * F.col("sum_x")).cast("long").alias("r_den"),
    ).withColumn("r", F.col("r_num").cast("double")
                 / F.col("r_den").cast("double"))


def assortativity_oracle_sql(edges_sql: str) -> str:
    """EXACT ANSI replay of :func:`assortativity` for DuckDB."""
    return f"""
        WITH raw AS ({edges_sql}),{_E_SQL},
        deg AS (SELECT src, COUNT(*)::BIGINT AS deg FROM e GROUP BY src),
        xy AS (SELECT dx.deg AS x, dy.deg AS y
               FROM e JOIN deg dx ON e.src = dx.src
                      JOIN deg dy ON e.dst = dy.src),
        m AS (SELECT COUNT(*)::BIGINT AS n_edges_directed,
                     SUM(x)::BIGINT AS sum_x,
                     SUM(x * y)::BIGINT AS sum_xy,
                     SUM(x * x)::BIGINT AS sum_x2
              FROM xy)
        SELECT n_edges_directed, sum_x, sum_xy, sum_x2,
               (n_edges_directed * sum_xy - sum_x * sum_x)::BIGINT
                 AS r_num,
               (n_edges_directed * sum_x2 - sum_x * sum_x)::BIGINT
                 AS r_den,
               (n_edges_directed * sum_xy - sum_x * sum_x)::DOUBLE
                 / (n_edges_directed * sum_x2 - sum_x * sum_x)::DOUBLE
                 AS r
        FROM m"""


# ---------------------------------------------------------------------------
# Categorical homophily (Newman's assortativity for DISCRETE attributes
# — the degree version above answers "do hubs link hubs?"; this one
# answers "do English pages link English pages?", the signal that
# decides whether per-language crawl frontiers can be sharded cheaply).
# r = (sum_i e_ii - sum_i a_i b_i) / (1 - sum_i a_i b_i) over the edge
# mixing matrix; with exact integer counts this is
# (m*same - S) / (m^2 - S), S = sum_i row_i * col_i — BIGINT until the
# one shared float step (negative values make integer DIV engine-
# dependent, so the ratio goes through the shared round() formula).
HOMOPHILY_R_PPM_SQL = (
    "CASE WHEN m * m - s_prod = 0 THEN NULL ELSE "
    "CAST(round(1000000 * (CAST(m AS DOUBLE) * n_same - s_prod)"
    " / (CAST(m AS DOUBLE) * m - s_prod)) AS BIGINT) END")


def categorical_homophily(edges: DataFrame, labels: DataFrame,
                          src: str = "src", dst: str = "dst",
                          node_col: str = "node",
                          cat_col: str = "cat") -> DataFrame:
    """-> one row (m, n_same, s_prod, r_ppm): directed categorical
    assortativity of the label over the edge set.  Edges whose
    endpoint lacks a label are dropped (both ends must be labeled).

    Two broadcast-friendly label joins + three partial-agg groupBys
    over the (tiny) mixing matrix; no windows."""
    la = labels.select(F.col(node_col).alias(src),
                       F.col(cat_col).alias("ca"))
    lb = labels.select(F.col(node_col).alias(dst),
                       F.col(cat_col).alias("cb"))
    e = (edges.select(src, dst).join(la, src).join(lb, dst))
    cells = e.groupBy("ca", "cb").agg(
        F.count(F.lit(1)).cast("long").alias("c"))
    rows = cells.groupBy(F.col("ca").alias("cat")).agg(
        F.sum("c").cast("long").alias("row_c"))
    cols = cells.groupBy(F.col("cb").alias("cat")).agg(
        F.sum("c").cast("long").alias("col_c"))
    s = (rows.join(cols, "cat", "full")
         .select((F.coalesce("row_c", F.lit(0))
                  * F.coalesce("col_c", F.lit(0))).alias("p"))
         .agg(F.sum("p").cast("long").alias("s_prod")))
    tot = cells.agg(
        F.sum("c").cast("long").alias("m"),
        F.sum(F.when(F.col("ca") == F.col("cb"), F.col("c"))
              .otherwise(0)).cast("long").alias("n_same"))
    return (tot.crossJoin(F.broadcast(s))
            .select("m", "n_same", "s_prod",
                    F.expr(HOMOPHILY_R_PPM_SQL).alias("r_ppm")))


def homophily_oracle_sql(edges_sql: str, labels_sql: str) -> str:
    """DuckDB replay: same mixing-matrix counts, same shared formula."""
    return f"""
        WITH e0 AS ({edges_sql}), lab AS ({labels_sql}),
        e AS (SELECT la.cat AS ca, lb.cat AS cb
              FROM e0
              JOIN lab la ON la.node = e0.src
              JOIN lab lb ON lb.node = e0.dst),
        cells AS (SELECT ca, cb, CAST(COUNT(*) AS BIGINT) AS c
                  FROM e GROUP BY ca, cb),
        rows_ AS (SELECT ca AS cat, CAST(SUM(c) AS BIGINT) AS row_c
                  FROM cells GROUP BY ca),
        cols_ AS (SELECT cb AS cat, CAST(SUM(c) AS BIGINT) AS col_c
                  FROM cells GROUP BY cb),
        s AS (SELECT CAST(SUM(COALESCE(row_c, 0) * COALESCE(col_c, 0))
                          AS BIGINT) AS s_prod
              FROM rows_ FULL JOIN cols_ USING (cat)),
        tot AS (SELECT CAST(SUM(c) AS BIGINT) AS m,
                       CAST(SUM(CASE WHEN ca = cb THEN c ELSE 0 END)
                            AS BIGINT) AS n_same
                FROM cells)
        SELECT m, n_same, s_prod, {HOMOPHILY_R_PPM_SQL} AS r_ppm
        FROM tot CROSS JOIN s"""
