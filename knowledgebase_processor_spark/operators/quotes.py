"""Cross-source quote mining — exact shared-n-gram attribution (the
provenance question the dedup family doesn't answer: near-dup
detection (q20/q33) asks "are these the same page?"; quote mining
asks "who copied WHOM?" — pairs of documents from DIFFERENT sources
sharing verbatim 8-grams, attributed to the earlier document.  At
corpus scale this is the syndication/plagiarism/citation map, and the
n-gram-bucket architecture is the exact-match sibling of the MinHash
band join).

Scale shape: explode distinct 8-gram hashes per doc (portable md5,
the split.py family), ONE groupBy(gram) with the mega-bucket count
guard applied BEFORE any member list materializes (a boilerplate
8-gram shared by 10^6 docs is a template, not a quote — the LSH
``max_bucket`` contract, count-first/anti-join/collect-second
ordering from the round-1 verdict fix), in-bucket pair expansion
restricted to CROSS-SOURCE pairs, then one partial-agg pair count.
Attribution = the pair is ordered (earlier doc, later doc) by the
caller-supplied timestamp column with id tie-break.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

from ..functions.text import portable_words


def _gram_hashes(docs: DataFrame, id_col: str, text_col: str,
                 n: int) -> DataFrame:
    ws = portable_words(F.col(text_col))
    parts = [ws] + [F.slice(ws, k + 1, F.greatest(F.size(ws), F.lit(1)))
                    for k in range(1, n)]
    joined = parts[0]
    for p in parts[1:]:
        joined = F.zip_with(joined, p,
                            lambda a, b: F.concat_ws(" ", a, b))
    grams = F.when(F.size(ws) >= n,
                   F.slice(joined, 1, F.size(ws) - n + 1)) \
        .otherwise(F.array().cast("array<string>"))
    return (docs.select(F.col(id_col).alias("doc"), grams.alias("g"))
            .select("doc", F.explode(F.array_distinct("g")).alias("gram"))
            .select("doc", F.expr(
                "CAST(conv(substring(md5(gram), 1, 15), 16, 10)"
                " AS BIGINT)").alias("gh")))


def quote_pairs(docs: DataFrame, id_col: str = "doc_id",
                text_col: str = "text", source_col: str = "source",
                ts_col: str = "doc_id", n: int = 8,
                max_bucket: int = 200,
                min_shared: int = 2) -> DataFrame:
    """-> (src_doc, quoting_doc, n_shared): cross-SOURCE document
    pairs sharing >= ``min_shared`` verbatim n-grams, ordered so
    ``src_doc`` is the earlier document by (ts, id).  Grams shared by
    more than ``max_bucket`` documents are template mass and are
    dropped before any list materializes."""
    meta = docs.select(F.col(id_col).alias("doc"),
                       F.col(source_col).alias("src"),
                       F.col(ts_col).alias("ts"))
    grams = _gram_hashes(docs, id_col, text_col, n).join(meta, "doc")
    big = (grams.groupBy("gh").agg(F.count(F.lit(1)).alias("c"))
           .filter(F.col("c") > max_bucket).select("gh"))
    kept = grams.join(F.broadcast(big), "gh", "left_anti")
    pairs = (kept.alias("a").join(kept.alias("b"), "gh")
             .filter((F.col("a.src") != F.col("b.src"))
                     & (F.struct(F.col("a.ts"), F.col("a.doc")) <
                        F.struct(F.col("b.ts"), F.col("b.doc"))))
             .select(F.col("a.doc").alias("src_doc"),
                     F.col("b.doc").alias("quoting_doc")))
    return (pairs.groupBy("src_doc", "quoting_doc")
            .agg(F.count(F.lit(1)).cast("long").alias("n_shared"))
            .filter(F.col("n_shared") >= min_shared))


def quotes_oracle_sql(docs_sql: str, n: int = 8, max_bucket: int = 200,
                      min_shared: int = 2) -> str:
    """DuckDB replay; ``docs_sql`` selects (doc, src, ts, text)."""
    gram = " || ' ' || ".join(f"ws[i+{k}]" for k in range(n))
    return rf"""
        WITH d AS ({docs_sql}),
        words AS (SELECT doc, src, ts,
                         list_filter(string_split_regex(
                             lower(trim(text)), '[ \t\n\r\f]+'),
                             w -> w <> '') AS ws
                  FROM d),
        grams AS (SELECT doc, src, ts,
                         unnest(list_distinct(CASE WHEN len(ws) >= {n}
                             THEN list_transform(
                                 range(1, len(ws) - {n - 2}),
                                 i -> {gram})
                             ELSE [] END)) AS gram
                  FROM words),
        hashed AS (SELECT doc, src, ts,
                          ('0x' || substr(md5(gram), 1, 15))::BIGINT
                              AS gh
                   FROM grams),
        big AS (SELECT gh FROM hashed GROUP BY gh
                HAVING COUNT(*) > {max_bucket}),
        kept AS (SELECT hashed.* FROM hashed
                 ANTI JOIN big ON big.gh = hashed.gh),
        pairs AS (SELECT a.doc AS src_doc, b.doc AS quoting_doc
                  FROM kept a JOIN kept b ON a.gh = b.gh
                  WHERE a.src <> b.src
                    AND (a.ts < b.ts OR (a.ts = b.ts AND a.doc < b.doc)))
        SELECT src_doc, quoting_doc,
               CAST(COUNT(*) AS BIGINT) AS n_shared
        FROM pairs GROUP BY src_doc, quoting_doc
        HAVING COUNT(*) >= {min_shared}
        ORDER BY src_doc, quoting_doc"""
