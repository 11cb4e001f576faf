"""Text-analysis column functions (JVM-side, no Python UDFs).

Covers the reference's scalar/per-doc text operators (SURVEY.md §2.7, A5,
E3, E11) plus the training-data-pipeline text analyzers (language ID,
quality scoring, token counting, fingerprinting).  Everything here is a
pure ``pyspark.sql.functions`` composition so it rides whole-stage codegen
and has a line-for-line ANSI-SQL oracle in ``__spark_entry__.oracle_sql``.
"""

from __future__ import annotations

from pyspark.sql import Column, functions as F


# --- reference ops ---------------------------------------------------------

def char_count(text: Column) -> Column:
    """metadata_processor.py:101-119 character count."""
    return F.length(text)


def line_count(text: Column) -> Column:
    return F.size(F.split(text, "\n"))


def word_count(text: Column) -> Column:
    """len(content.split()) — whitespace-delimited tokens, empty-safe."""
    t = F.trim(F.regexp_replace(text, r"\s+", " "))
    return F.when(t == "", F.lit(0)).otherwise(F.size(F.split(t, " ")))


def topic(title: Column) -> Column:
    """analyzer/topics.py:20-43: lowercase title, spaces -> underscores."""
    return F.lower(F.regexp_replace(title, " ", "_"))


def hashtags(text: Column) -> Column:
    """extractor/tags.py:25 hashtag scan (array of tag strings).

    The reference masks code/links first (tags.py:35-42); on the plain-text
    web corpus that masking is a no-op, and the full masking variant lives
    in operators.metadata for markdown inputs.
    """
    return F.regexp_extract_all(text, F.lit(r"(^|\s)#([a-zA-Z0-9_]+)"), 2)


# --- training-data ops -----------------------------------------------------

# Tiny per-language stopword lists for the n-gram/stopword language-ID
# heuristic.  Deliberately small + deterministic: the point is the Spark
# plumbing (broadcastable dictionary scan, no UDF), not model quality.
LANG_STOPWORDS = {
    "en": ["the", "and", "of", "to", "is", "in", "that", "it", "was", "for"],
    "es": ["el", "la", "de", "que", "y", "en", "un", "por", "con", "los"],
    "de": ["der", "die", "und", "das", "ist", "von", "nicht", "mit", "ein", "zu"],
    "fr": ["le", "la", "et", "les", "des", "est", "pas", "que", "une", "dans"],
}


def _stopword_hits(words: Column, lang: str) -> Column:
    sw = F.array(*[F.lit(w) for w in LANG_STOPWORDS[lang]])
    return F.size(F.array_intersect(words, sw))


def lang_id(text: Column) -> Column:
    """Stopword-vote language ID: argmax over per-language hit counts,
    'und' when no stopwords match.  Ties break by language order."""
    words = F.split(F.lower(F.trim(text)), r"\s+")
    best_lang, best_hits = F.lit("und"), F.lit(0)
    for lang in LANG_STOPWORDS:
        hits = _stopword_hits(words, lang)
        better = hits > best_hits
        best_lang = F.when(better, F.lit(lang)).otherwise(best_lang)
        best_hits = F.when(better, hits).otherwise(best_hits)
    return best_lang


def token_count(text: Column) -> Column:
    """BPE-ish subword proxy: count of word/number/punct runs (same regex
    runs verbatim in the DuckDB oracle)."""
    return F.size(F.regexp_extract_all(
        text, F.lit(r"[A-Za-z]+|[0-9]+|[^A-Za-z0-9\s]"), 0))


def quality_score(text: Column) -> Column:
    """Length/punctuation/stopword heuristic quality in [0, 1].

    score = 0.4 * min(words/100, 1)
          + 0.3 * (1 - punct_ratio)
          + 0.3 * min(stopword_ratio * 5, 1)
    """
    words = word_count(text)
    chars = F.greatest(F.length(text), F.lit(1))
    punct = F.length(F.regexp_replace(text, r"[A-Za-z0-9\s]", ""))
    en_sw = _stopword_hits(F.split(F.lower(F.trim(text)), r"\s+"), "en")
    punct_ratio = punct.cast("double") / chars.cast("double")
    sw_ratio = en_sw.cast("double") / F.greatest(words, F.lit(1)).cast("double")
    return (
        0.4 * F.least(words.cast("double") / 100.0, F.lit(1.0))
        + 0.3 * (1.0 - punct_ratio)
        + 0.3 * F.least(sw_ratio * 5.0, F.lit(1.0))
    )


def fingerprint(text: Column) -> Column:
    """Deterministic document fingerprint: sha256 of the
    whitespace-normalized, lowercased text (utils/text.py normalize +
    hash, as a content-dedup key)."""
    return F.sha2(F.lower(F.trim(F.regexp_replace(text, r"\s+", " "))), 256)


def shingles(text: Column, n: int = 3) -> Column:
    """Array of n-gram (word) shingles for Jaccard/MinHash dedup."""
    words = F.filter(F.split(F.lower(F.trim(text)), r"\s+"), lambda x: x != "")
    idx = F.sequence(F.lit(0), F.greatest(F.size(words) - n, F.lit(0)))
    return F.when(F.size(words) < n, F.array(F.concat_ws(" ", words))).otherwise(
        F.transform(idx, lambda i: F.concat_ws(" ", F.slice(words, i + 1, n))))
