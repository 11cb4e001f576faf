"""Count-min sketch frequency estimation + heavy-hitter verification.

No reference anchor (the reference's stats service counts exact
frequencies on an in-memory corpus, cf.
/root/reference/src/knowledgebase_processor/services/ — kb-statistics
only) — this is the scale path for "how often does token/url/domain X
occur in a 10^12-row crawl" when the key space is too large to
countDistinct-and-sort: the sketch is a fixed (depth x width) counter
grid whose size is independent of both the row count and the key
cardinality.

Scale shape (why this is the 100 TB answer):

* The counter grid is an ALGEBRAIC aggregate: each partition folds its
  rows into at most depth*width local counters (map-side partial sum),
  and grids for disjoint slices MERGE by cell-wise addition — the
  exchange carries O(depth * width) rows total, not O(distinct keys).
  Same partial-rollup contract as ``operators/sketches.py`` (HLL/KMV).
* Point queries never rescan the data: estimating any key costs depth
  lookups against the (tiny, broadcastable) grid.
* The classic CM guarantee (Cormode & Muthukrishnan 2005): with width
  w = ceil(e/eps) and depth d = ceil(ln(1/delta)), the estimate
  overestimates the true count by at most eps * N with probability
  >= 1 - delta, and NEVER underestimates — the q73 oracle checks the
  one-sided bound row by row.

Portability: positions use the repo's salted-md5 60-bit family
(``conv(substr(md5('cms{row}|' || v), 1, 15), 16, 10) % width``,
cf. dedup.py portable formula) so DuckDB replays every grid cell and
every min-estimate bit-identically.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

HEX_DIGITS = 15  # 60-bit hash family shared with dedup.py / sketches.py


def _cms_pos(value_col, row: int, width: int):
    """Portable counter position of ``value_col`` in sketch row ``row``."""
    hv = F.conv(F.substring(F.md5(F.concat(F.lit(f"cms{row}|"),
                                           value_col.cast("string"))),
                            1, HEX_DIGITS), 16, 10).cast("bigint")
    return (hv % width).cast("int")


def cms_counters(df: DataFrame, value_col: str, depth: int = 4,
                 width: int = 256, weight_col: str | None = None) -> DataFrame:
    """The persistable sketch: one row per non-empty (row, pos) cell with
    its counter.  Cells for disjoint input slices merge with a further
    ``groupBy(row, pos).sum(cnt)``.

    The depth-way fan-out happens INSIDE the partial aggregation (posexplode
    feeding a groupBy), so the shuffle after map-side combine is bounded by
    depth * width rows per partition regardless of input size.
    """
    w = (F.col(weight_col).cast("bigint") if weight_col else F.lit(1))
    cells = df.select(
        F.posexplode(F.array(*[_cms_pos(F.col(value_col), r, width)
                               for r in range(depth)])).alias("row", "pos"),
        w.alias("w"))
    return cells.groupBy("row", "pos").agg(F.sum("w").alias("cnt"))


def cms_estimate(counters: DataFrame, items: DataFrame, item_col: str,
                 depth: int = 4, width: int = 256) -> DataFrame:
    """Point-query ``items[item_col]`` against a counter grid: the CM
    estimate is the MIN over the depth rows of the addressed cell (a
    missing cell is 0 — it was never touched, so the true count is 0 and
    min() collapses to 0 via coalesce).

    The grid is at most depth*width rows — Spark broadcasts it, so the
    probe is a shuffle-free map-side join however large ``items`` is.
    """
    probes = items.select(
        item_col,
        F.posexplode(F.array(*[_cms_pos(F.col(item_col), r, width)
                               for r in range(depth)])).alias("row", "pos"))
    joined = probes.join(F.broadcast(counters), ["row", "pos"], "left") \
                   .withColumn("cnt", F.coalesce(F.col("cnt"), F.lit(0)))
    return joined.groupBy(item_col).agg(
        F.min("cnt").cast("bigint").alias("cms_estimate"))


def heavy_hitters(df: DataFrame, value_col: str, threshold: int,
                  depth: int = 4, width: int = 256) -> DataFrame:
    """Keys whose CM estimate reaches ``threshold``, with their exact
    counts for verification.

    At sketch scale the candidate enumeration would run over the key
    DICTIONARY (distinct keys of a bounded vocabulary or a prior round's
    survivors), never the raw rows; here we take distinct keys of ``df``
    itself, which is the same partial-agg-bounded pass the exact count
    needs anyway.  Because CM never underestimates, every true heavy
    hitter is in the output (no false negatives); false positives carry
    exact_count < threshold and are visible in the result.
    """
    grid = cms_counters(df, value_col, depth, width)
    keys = df.groupBy(value_col).agg(F.count(F.lit(1)).alias("exact_count"))
    est = cms_estimate(grid, keys.select(value_col), value_col, depth, width)
    return (est.filter(F.col("cms_estimate") >= threshold)
               .join(keys, value_col)
               .select(value_col,
                       F.col("exact_count").cast("bigint").alias("exact_count"),
                       "cms_estimate"))


def cms_pos_sql(value_sql: str, row: int, width: int) -> str:
    """DuckDB SQL for the same position formula, generated from the same
    (row, width) constants as the Spark plan so the formula cannot drift.
    (The hex->int spelling differs per engine: Spark ``conv(x,16,10)``,
    DuckDB ``('0x'||x)::BIGINT`` — both exact on 60-bit values.)"""
    return (f"CAST(('0x' || substr(md5('cms{row}|' || {value_sql}), 1, "
            f"{HEX_DIGITS}))::BIGINT % {width} AS INT)")


def heavy_change(df_a: DataFrame, df_b: DataFrame, value_col: str,
                 min_change: int, depth: int = 4,
                 width: int = 256) -> DataFrame:
    """Heavy-CHANGE detection between two snapshots (Cormode-
    Muthukrishnan "what's new"): keys whose CM-estimated frequency
    moved by at least ``min_change`` between crawl A and crawl B — the
    sketch answer to "which hosts surged or vanished since
    yesterday?", computable from two PERSISTED counter grids without
    re-reading either crawl (grids merge/diff cell-wise; this
    convenience entry builds both grids in one pass each).

    -> (value, exact_a, exact_b, est_a, est_b, est_change), filtered
    on |est_change| >= min_change.  exact_* ride along for
    verification exactly as in :func:`heavy_hitters`; at sketch scale
    the candidate set is the key dictionary, here the distinct keys of
    both halves.  CM one-sided error makes est_change off by at most
    the collision mass of either grid — a true change of
    min_change + 2*eps*N is never missed.
    """
    grid_a = cms_counters(df_a, value_col, depth, width)
    grid_b = cms_counters(df_b, value_col, depth, width)
    ka = df_a.groupBy(value_col).agg(
        F.count(F.lit(1)).cast("bigint").alias("exact_a"))
    kb = df_b.groupBy(value_col).agg(
        F.count(F.lit(1)).cast("bigint").alias("exact_b"))
    keys = (ka.join(kb, value_col, "full")
            .select(value_col,
                    F.coalesce("exact_a", F.lit(0)).alias("exact_a"),
                    F.coalesce("exact_b", F.lit(0)).alias("exact_b")))
    ea = cms_estimate(grid_a, keys.select(value_col), value_col,
                      depth, width).withColumnRenamed("cms_estimate",
                                                      "est_a")
    eb = cms_estimate(grid_b, keys.select(value_col), value_col,
                      depth, width).withColumnRenamed("cms_estimate",
                                                      "est_b")
    out = (keys.join(ea, value_col).join(eb, value_col)
           .withColumn("est_change",
                       (F.col("est_a") - F.col("est_b")).cast("bigint")))
    return out.filter(F.abs(F.col("est_change")) >= min_change)


def heavy_change_oracle_sql(a_sql: str, b_sql: str, value_name: str,
                            min_change: int, depth: int = 4,
                            width: int = 256) -> str:
    """DuckDB replay of :func:`heavy_change`: same portable grid
    cells, same min-over-rows estimates.  ``a_sql``/``b_sql`` must
    each select one column named ``v``."""
    def grid(src: str) -> str:
        fans = " UNION ALL ".join(
            f"SELECT {r} AS row, {cms_pos_sql('v', r, width)} AS pos"
            f" FROM {src}" for r in range(depth))
        return f"SELECT row, pos, COUNT(*)::BIGINT AS cnt FROM ({fans}) GROUP BY row, pos"

    def probes() -> str:
        return " UNION ALL ".join(
            f"SELECT v, {r} AS row, {cms_pos_sql('v', r, width)} AS pos"
            " FROM keys" for r in range(depth))

    return f"""
        WITH ha AS ({a_sql}), hb AS ({b_sql}),
        grid_a AS ({grid('ha')}), grid_b AS ({grid('hb')}),
        ka AS (SELECT v, COUNT(*)::BIGINT AS exact_a FROM ha GROUP BY v),
        kb AS (SELECT v, COUNT(*)::BIGINT AS exact_b FROM hb GROUP BY v),
        keys AS (SELECT v, COALESCE(exact_a, 0) AS exact_a,
                        COALESCE(exact_b, 0) AS exact_b
                 FROM ka FULL JOIN kb USING (v)),
        pr AS ({probes()}),
        ea AS (SELECT pr.v, MIN(COALESCE(cnt, 0))::BIGINT AS est_a
               FROM pr LEFT JOIN grid_a USING (row, pos) GROUP BY pr.v),
        eb AS (SELECT pr.v, MIN(COALESCE(cnt, 0))::BIGINT AS est_b
               FROM pr LEFT JOIN grid_b USING (row, pos) GROUP BY pr.v)
        SELECT keys.v AS {value_name},
               CAST(exact_a AS BIGINT) AS exact_a,
               CAST(exact_b AS BIGINT) AS exact_b, est_a, est_b,
               (est_a - est_b)::BIGINT AS est_change
        FROM keys JOIN ea USING (v) JOIN eb USING (v)
        WHERE abs(est_a - est_b) >= {min_change}
        ORDER BY {value_name}"""
