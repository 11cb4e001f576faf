"""Readability scoring (beyond-reference text-quality surface; the
classic-formula companion to the Gopher/C4 quality gates (q40/q43) —
Flesch reading ease is public domain and still the most-read quality
number on any corpus data card).

Exactness contract: words come from the shared portable tokenizer,
sentences from a shared terminator regex, syllables from the standard
vowel-group heuristic (per word, count of ``[aeiouy]+`` runs, min 1 —
the textstat/public convention), and the ONE float step (the Flesch
formula over three exact integers) is micro-quantized SQL TEXT shared
verbatim with the DuckDB oracle (:data:`FLESCH_SQL`).

Plan shape: a single projection — tokenize, two regexp_extract_all
counts, one ``aggregate`` fold over the word array (element-local
lambda, no captured expression trees — the shingles O(n^2) trap
documented in functions/text.py) — all whole-stage codegen, no
shuffle, no Python.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

from ..functions.text import portable_words

# Flesch reading ease over exact integer (w, s, y) counts, micro-
# quantized; NULL guard for empty docs rides outside.  Shared verbatim
# with the q185 oracle.
FLESCH_SQL = ("CAST(round(1000000 * (206.835 "
              "- 1.015 * (w / CAST(s AS DOUBLE)) "
              "- 84.6 * (y / CAST(w AS DOUBLE)))) AS BIGINT)")

SENTENCE_RE = "[.!?]+"
VOWEL_RUN_RE = "[aeiouy]+"


def readability_report(docs: DataFrame, id_col: str = "doc_id",
                       text_col: str = "text") -> DataFrame:
    """-> (doc_id, n_words, n_sentences, n_syllables, flesch_micro)
    per document; flesch_micro is NULL for wordless documents,
    n_sentences floors at 1 whenever words exist (a fragment is one
    sentence)."""
    t = F.coalesce(F.col(text_col), F.lit(""))
    words = portable_words(t)
    syl = F.aggregate(
        F.transform(words,
                    lambda w: F.greatest(
                        F.lit(1),
                        F.size(F.regexp_extract_all(w, F.lit(VOWEL_RUN_RE),
                                                    0)))),
        F.lit(0), lambda acc, x: acc + x)
    out = docs.select(
        F.col(id_col).alias("doc_id"),
        F.size(words).cast("long").alias("w"),
        F.greatest(F.lit(1),
                   F.size(F.regexp_extract_all(F.lower(t),
                                               F.lit(SENTENCE_RE), 0)))
        .cast("long").alias("s"),
        syl.cast("long").alias("y"))
    return out.selectExpr(
        "doc_id", "w AS n_words", "s AS n_sentences",
        "y AS n_syllables",
        f"CASE WHEN w = 0 THEN NULL ELSE {FLESCH_SQL} END"
        " AS flesch_micro")


# --------------------------------------------------------------------------
# Tokenizer fertility: bytes/chars per subword token by language — the
# number a multilingual-corpus data card reports next to its language
# mix (CJK languages tokenize at several bytes per token, and a
# fertility outlier inside one language is a mojibake/encoding flag,
# the q153 gate's statistical twin).  Counting uses the shared
# token_count regex run VERBATIM by the DuckDB oracle; sums are exact
# BIGINTs, ratios exact integer ppm.  One partial-agg groupBy(lang).

TOKEN_RE = r"[A-Za-z]+|[0-9]+|[^A-Za-z0-9\s]"


def token_fertility(docs: DataFrame, lang_col: str = "lang",
                    text_col: str = "text") -> DataFrame:
    """-> (lang, n_docs, sum_bytes, sum_chars, sum_tokens,
    bytes_per_token_ppm, chars_per_token_ppm) per language."""
    from ..functions.text import token_count

    t = F.coalesce(F.col(text_col), F.lit(""))
    agg = (docs.groupBy(F.col(lang_col).alias("lang"))
           .agg(F.count(F.lit(1)).cast("long").alias("n_docs"),
                F.sum(F.octet_length(t)).cast("long").alias("sum_bytes"),
                F.sum(F.length(t)).cast("long").alias("sum_chars"),
                F.sum(token_count(t)).cast("long").alias("sum_tokens")))
    return agg.selectExpr(
        "lang", "n_docs", "sum_bytes", "sum_chars", "sum_tokens",
        "sum_bytes * 1000000 DIV nullif(sum_tokens, 0)"
        " AS bytes_per_token_ppm",
        "sum_chars * 1000000 DIV nullif(sum_tokens, 0)"
        " AS chars_per_token_ppm")


def fertility_oracle_sql(table: str = "documents") -> str:
    """DuckDB replay: same token regex, octet_length via encode()."""
    return rf"""
        WITH d AS (SELECT lang, COALESCE(text, '') AS t FROM {table})
        SELECT lang, CAST(COUNT(*) AS BIGINT) AS n_docs,
               CAST(SUM(octet_length(encode(t))) AS BIGINT) AS sum_bytes,
               CAST(SUM(length(t)) AS BIGINT) AS sum_chars,
               CAST(SUM(len(regexp_extract_all(t,
                   '{TOKEN_RE}'))) AS BIGINT) AS sum_tokens,
               CAST(SUM(octet_length(encode(t))) * 1000000
                    // nullif(SUM(len(regexp_extract_all(t,
                       '{TOKEN_RE}'))), 0) AS BIGINT)
                   AS bytes_per_token_ppm,
               CAST(SUM(length(t)) * 1000000
                    // nullif(SUM(len(regexp_extract_all(t,
                       '{TOKEN_RE}'))), 0) AS BIGINT)
                   AS chars_per_token_ppm
        FROM d GROUP BY lang ORDER BY lang"""


# --------------------------------------------------------------------------
# Unicode script mix: per-language counts of codepoints by script
# block — the statistical gate behind q181's lang-vs-content check and
# q153's mojibake detector (a page declared 'de' that is 40% CJK
# codepoints is mislabeled, scraped wrong, or spam; a corpus card
# reports this table next to the language mix).  Ranges are spelled as
# literal character-class ranges so the SAME pattern text compiles in
# Java regex and RE2.  Counts exact BIGINTs, one groupBy(lang).

SCRIPT_RANGES = (
    ("latin", "[A-Za-z]"),
    ("digit", "[0-9]"),
    ("cyrillic", "[Ѐ-ӿ]"),
    ("greek", "[Ͱ-Ͽ]"),
    ("cjk", "[一-鿿]"),
    ("arabic", "[؀-ۿ]"),
    ("hangul", "[가-힯]"),
)


def script_mix_report(docs: DataFrame, lang_col: str = "lang",
                      text_col: str = "text") -> DataFrame:
    """-> (lang, n_docs, n_chars, latin, digit, cyrillic, greek, cjk,
    arabic, hangul, other, latin_ppm) per language; ``other`` =
    everything not matched and not whitespace."""
    t = F.coalesce(F.col(text_col), F.lit(""))
    counts = {name: F.size(F.regexp_extract_all(t, F.lit(pat), 0))
              for name, pat in SCRIPT_RANGES}
    ws = F.size(F.regexp_extract_all(t, F.lit("[ \t\n\r\f]"), 0))
    agg = (docs.groupBy(F.col(lang_col).alias("lang"))
           .agg(F.count(F.lit(1)).cast("long").alias("n_docs"),
                F.sum(F.length(t)).cast("long").alias("n_chars"),
                *[F.sum(c).cast("long").alias(n)
                  for n, c in counts.items()],
                F.sum(ws).cast("long").alias("_ws")))
    known = " + ".join(n for n, _ in SCRIPT_RANGES)
    return (agg.withColumn("other", F.expr(
        f"n_chars - ({known}) - _ws").cast("long"))
        .withColumn("latin_ppm", F.expr(
            "latin * 1000000 DIV nullif(n_chars - _ws, 0)"))
        .drop("_ws"))


def script_mix_oracle_sql(table: str = "documents") -> str:
    """DuckDB replay — identical literal character-class patterns."""
    cols = ",\n               ".join(
        f"CAST(SUM(len(regexp_extract_all(t, '{pat}'))) AS BIGINT)"
        f" AS {name}" for name, pat in SCRIPT_RANGES)
    known = " + ".join(n for n, _ in SCRIPT_RANGES)
    col_list = ", ".join(n for n, _ in SCRIPT_RANGES)
    return f"""
        WITH d AS (SELECT lang, COALESCE(text, '') AS t FROM {table}),
        agg AS (
          SELECT lang, CAST(COUNT(*) AS BIGINT) AS n_docs,
               CAST(SUM(length(t)) AS BIGINT) AS n_chars,
               {cols},
               CAST(SUM(len(regexp_extract_all(t, '[ \t\n\r\f]')))
                    AS BIGINT) AS ws
          FROM d GROUP BY lang)
        SELECT lang, n_docs, n_chars, {col_list},
               CAST(n_chars - ({known}) - ws AS BIGINT) AS other,
               CAST(latin * 1000000 // nullif(n_chars - ws, 0)
                    AS BIGINT) AS latin_ppm
        FROM agg ORDER BY lang"""


# --------------------------------------------------------------------------
# Character-entropy quality gate: per-document Shannon entropy of the
# character distribution — the portable cousin of the classic
# compression-ratio gibberish detector (zlib isn't replayable across
# engines; char entropy is EXACTLY replayable and ranks the same
# pathologies: 'aaaa...' repetition ~0 bits, keyboard mash / base64
# blobs near the alphabet ceiling, natural language in between).
# Per-char contributions are nano-quantized BIGINTs summed as
# integers (order-proof); one explode + two partial-agg groupBys.

ENTROPY_TERM_NANO_SQL = (
    "CAST(round(-1000000000.0 * (CAST(c AS DOUBLE) / n)"
    " * ln(CAST(c AS DOUBLE) / n) / ln(2.0)) AS BIGINT)")


def char_entropy_report(docs: DataFrame, id_col: str = "doc_id",
                        text_col: str = "text") -> DataFrame:
    """-> (doc_id, n_chars, n_distinct, entropy_nano): Shannon bits
    per char, nano-quantized; empty/null docs report 0."""
    t = F.coalesce(F.col(text_col), F.lit(""))
    chars = (docs.select(F.col(id_col).alias("doc_id"),
                         F.explode(F.split(t, "")).alias("ch"))
             .filter(F.col("ch") != ""))
    counts = (chars.groupBy("doc_id", "ch")
              .agg(F.count(F.lit(1)).cast("long").alias("c")))
    per_doc = (counts.groupBy("doc_id")
               .agg(F.sum("c").cast("long").alias("n")))
    terms = (counts.join(per_doc, "doc_id")
             .select("doc_id", F.expr(ENTROPY_TERM_NANO_SQL)
                     .alias("e")))
    ent = (terms.groupBy("doc_id")
           .agg(F.sum("e").cast("long").alias("entropy_nano")))
    base = docs.select(F.col(id_col).alias("doc_id"))
    return (base
            .join(per_doc, "doc_id", "left")
            .join(counts.groupBy("doc_id")
                  .agg(F.count(F.lit(1)).cast("long")
                       .alias("n_distinct")), "doc_id", "left")
            .join(ent, "doc_id", "left")
            .select("doc_id",
                    F.coalesce("n", F.lit(0)).cast("long")
                    .alias("n_chars"),
                    F.coalesce("n_distinct", F.lit(0)).cast("long")
                    .alias("n_distinct"),
                    F.coalesce("entropy_nano", F.lit(0)).cast("long")
                    .alias("entropy_nano")))


def char_entropy_oracle_sql(table: str = "documents") -> str:
    """DuckDB replay: same split-to-chars, same nano terms."""
    return f"""
        WITH chars AS (
          SELECT doc_id, unnest(string_split(COALESCE(text, ''), ''))
                     AS ch
          FROM {table}),
        counts AS (SELECT doc_id, ch, CAST(COUNT(*) AS BIGINT) AS c
                   FROM chars WHERE ch <> '' GROUP BY doc_id, ch),
        per_doc AS (SELECT doc_id, CAST(SUM(c) AS BIGINT) AS n,
                           CAST(COUNT(*) AS BIGINT) AS n_distinct
                    FROM counts GROUP BY doc_id),
        ent AS (SELECT counts.doc_id,
                       CAST(SUM({ENTROPY_TERM_NANO_SQL}) AS BIGINT)
                           AS entropy_nano
                FROM counts JOIN per_doc USING (doc_id)
                GROUP BY counts.doc_id)
        SELECT d.doc_id,
               CAST(COALESCE(n, 0) AS BIGINT) AS n_chars,
               CAST(COALESCE(n_distinct, 0) AS BIGINT) AS n_distinct,
               CAST(COALESCE(entropy_nano, 0) AS BIGINT)
                   AS entropy_nano
        FROM {table} d
        LEFT JOIN per_doc ON per_doc.doc_id = d.doc_id
        LEFT JOIN ent ON ent.doc_id = d.doc_id
        ORDER BY d.doc_id"""
