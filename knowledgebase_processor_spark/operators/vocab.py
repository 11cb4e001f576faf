"""Vocabulary coverage / out-of-vocabulary (OOV) rate per source
(beyond-reference; SURVEY.md §2 round-2 surface — the trainer-facing
diagnostic downstream of operators/bpe.py: once a tokenizer vocabulary
is fixed, which corpus slices will fragment into unknowns?).

Two passes, both Spark-shaped:

* ``build_vocab`` — global word counts (one explode + partial-agg
  groupBy) then top-k by (count DESC, word ASC).  The top-k is
  ``orderBy().limit(k)`` = TakeOrderedAndProject — distributed
  per-partition heaps, NO global sort and NO single-partition window
  even when the corpus has 10^9 distinct words; the rank column is a
  window over the k surviving rows only.

* ``oov_by_source`` — explode tokens, LEFT JOIN the (broadcast — k is
  small by construction) vocabulary, one partial-agg groupBy per
  source: (total_words, oov_words, oov_ppm).  Exact BIGINTs; the ppm
  is non-negative DIV, engine-portable.

Tokenization is the single-sourced portable splitter
(functions/text.py::portable_words) so DuckDB replays every count.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window, functions as F

from ..functions.text import portable_words

SCALE = 1_000_000

# DuckDB twin of portable_words (the shared oracle tokenizer).
WORDS_SQL = ("list_filter(string_split_regex(lower(trim({col})), "
             r"'[ \t\n\r\f]+'), w -> w <> '')")


def build_vocab(docs: DataFrame, k: int,
                text_col: str = "text") -> DataFrame:
    """docs -> top-``k`` (word, cnt, rank) by global frequency, ties by
    word ASC — the deterministic fixed vocabulary."""
    counts = (docs.select(F.explode(portable_words(F.col(text_col)))
                          .alias("word"))
              .groupBy("word")
              .agg(F.count(F.lit(1)).cast("long").alias("cnt")))
    top = counts.orderBy(F.col("cnt").desc(), F.col("word").asc()).limit(k)
    w = Window.orderBy(F.col("cnt").desc(), F.col("word").asc())
    return top.withColumn("rank", F.row_number().over(w).cast("long"))


def oov_by_source(docs: DataFrame, vocab: DataFrame,
                  group_col: str = "source",
                  text_col: str = "text") -> DataFrame:
    """docs + vocab(word) -> per-group (group, total_words, oov_words,
    oov_ppm)."""
    toks = docs.select(F.col(group_col).alias("grp"),
                       F.explode(portable_words(F.col(text_col)))
                       .alias("word"))
    joined = toks.join(F.broadcast(vocab.select(
        "word", F.lit(True).alias("in_vocab"))), "word", "left")
    return (joined.groupBy("grp")
            .agg(F.count(F.lit(1)).cast("long").alias("total_words"),
                 F.sum(F.when(F.col("in_vocab").isNull(), 1).otherwise(0))
                 .cast("long").alias("oov_words"))
            .withColumn("oov_ppm",
                        F.expr(f"oov_words * {SCALE} DIV total_words")
                        .cast("long"))
            .withColumnRenamed("grp", group_col))


def oov_oracle_sql(docs_sql: str, k: int, group_sql: str = "source",
                   text_sql: str = "text") -> str:
    """EXACT ANSI replay of ``oov_by_source(docs, build_vocab(docs, k))``
    for DuckDB; ``docs_sql`` must select (``group_sql``, ``text_sql``)."""
    words = WORDS_SQL.format(col=text_sql)
    return f"""
        WITH d AS ({docs_sql}),
        toks AS (SELECT {group_sql} AS grp, unnest({words}) AS word
                 FROM d),
        counts AS (SELECT word, COUNT(*)::BIGINT AS cnt
                   FROM toks GROUP BY word),
        vocab AS (SELECT word FROM (
                    SELECT word, ROW_NUMBER() OVER (
                      ORDER BY cnt DESC, word ASC) AS rn
                    FROM counts) WHERE rn <= {k})
        SELECT grp AS {group_sql},
               COUNT(*)::BIGINT AS total_words,
               SUM(CASE WHEN v.word IS NULL THEN 1 ELSE 0 END)::BIGINT
                 AS oov_words,
               (SUM(CASE WHEN v.word IS NULL THEN 1 ELSE 0 END)
                 * {SCALE} // COUNT(*))::BIGINT AS oov_ppm
        FROM toks t LEFT JOIN vocab v ON t.word = v.word
        GROUP BY grp"""
