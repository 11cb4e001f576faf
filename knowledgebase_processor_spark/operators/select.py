"""Greedy coverage-based corpus selection (submodular data selection;
beyond-reference training-data surface).

Coverage-maximizing selection (facility location / greedy set cover) is
the classic "pick the k most informative documents" recipe: each round
selects the document adding the most NOT-yet-covered 3-gram shingles.
The greedy algorithm is within (1 - 1/e) of optimal for submodular
coverage (Nemhauser et al. 1978) and is what coreset/data-pruning
pipelines actually run.

Spark shape, per round:

* one left-anti join of the (doc, shingle) frame against the covered
  set (shuffle on the shingle key, AQE-splittable),
* one partial-agg groupBy(doc) count,
* one ``TakeOrdered(1)`` argmax (gain DESC, doc id ASC tie-break) —
  a driver-side collect of EXACTLY ONE row per round (the same
  legitimate pattern as the ANN query-vector collect);
* the covered set grows by the winner's shingles and is
  ``localCheckpoint``-ed so the anti-join lineage stays flat.

The shingle frame is built ONCE (the shared portable shingler from
functions/text.py — identical ANSI formula in the q146 oracle, and the
same frame MinHash dedup already materializes at production scale).
Determinism: counts + lexicographic tie-break, no RNG, no floats — any
engine replays the pick sequence exactly.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

from ..functions.text import shingles


def greedy_coverage_select(docs: DataFrame, k: int = 5, n: int = 3,
                           id_col: str = "doc_id",
                           text_col: str = "text") -> DataFrame:
    """Pick up to ``k`` docs greedily maximizing marginal shingle
    coverage.  Returns (round, doc_id, gain, covered_total) — one row
    per pick, in pick order; stops early when everything is covered."""
    spark = docs.sparkSession
    sh = (docs.select(F.col(id_col).alias("doc"),
                      F.explode(F.array_distinct(
                          shingles(F.col(text_col), n))).alias("s"))
          .localCheckpoint())

    covered = None          # DataFrame[s] of already-covered shingles
    picks, total = [], 0
    for rnd in range(1, k + 1):
        remaining = sh if covered is None else sh.join(covered, "s",
                                                       "left_anti")
        gains = remaining.groupBy("doc").agg(F.count(F.lit(1)).alias("gain"))
        # bounded collect: LIMIT 1 per greedy round (k driver rows
        # total), never corpus-sized
        top = gains.orderBy(F.col("gain").desc(), F.col("doc").asc()) \
                   .limit(1).collect()
        if not top:
            break
        doc, gain = top[0].doc, top[0].gain
        total += gain
        picks.append((rnd, doc, gain, total))
        won = sh.filter(F.col("doc") == doc).select("s")
        covered = (won if covered is None
                   else covered.unionByName(won).distinct()).localCheckpoint()

    return spark.createDataFrame(
        picks, "round int, doc_id long, gain long, covered_total long")


def greedy_coverage_oracle_sql(docs_sql: str, k: int = 5) -> str:
    """EXACT ANSI replay of :func:`greedy_coverage_select` for DuckDB,
    rounds unrolled (k is small by definition).  ``docs_sql`` must
    select (doc_id, text); n is fixed at 3 (the shared shingle
    formula, same text normalization as novelty_oracle_sql)."""
    parts = [r"""
        WITH d0 AS ({docs_sql}),
        words AS (
          SELECT doc_id,
                 list_filter(string_split_regex(lower(trim(text)),
                                                '[ \t\n\r\f]+'),
                             w -> w <> '') AS ws
          FROM d0),
        sh0 AS (
          SELECT doc_id, CASE WHEN len(ws) >= 3
            THEN list_transform(range(1, len(ws) - 1),
                   i -> ws[i] || ' ' || ws[i+1] || ' ' || ws[i+2])
            ELSE [array_to_string(ws, ' ')] END AS gs
          FROM words),
        sh AS (
          SELECT DISTINCT doc_id AS doc, UNNEST(gs) AS s FROM sh0)""".format(
        docs_sql=docs_sql)]
    prev_cov = None
    selects = []
    for r in range(1, k + 1):
        rem = ("sh" if prev_cov is None else
               f"(SELECT * FROM sh WHERE NOT EXISTS "
               f"(SELECT 1 FROM {prev_cov} c WHERE c.s = sh.s)) sh")
        parts.append(f"""
        g{r} AS (SELECT doc, COUNT(*) AS gain FROM {rem} GROUP BY doc),
        p{r} AS (SELECT doc, gain FROM g{r}
                 ORDER BY gain DESC, doc ASC LIMIT 1),
        c{r} AS ({"" if prev_cov is None else
                  f"SELECT s FROM {prev_cov} UNION "}
                 SELECT DISTINCT s FROM sh
                 WHERE doc = (SELECT doc FROM p{r}))""")
        selects.append(f"SELECT {r} AS round, doc, gain FROM p{r}")
        prev_cov = f"c{r}"
    union = "\n UNION ALL ".join(selects)
    return (",".join(parts)
            + f"""
        SELECT CAST(round AS INT) AS round, doc AS doc_id,
               CAST(gain AS BIGINT) AS gain,
               CAST(SUM(gain) OVER (ORDER BY round) AS BIGINT)
                 AS covered_total
        FROM ({union}) ORDER BY round""")
