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
