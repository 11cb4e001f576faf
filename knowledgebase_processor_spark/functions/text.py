"""Text-analysis column functions (JVM-side, no Python UDFs).

Covers the reference's scalar/per-doc text operators (SURVEY.md §2.7, A5,
E3, E11) plus the training-data-pipeline text analyzers (language ID,
quality scoring, token counting, fingerprinting).  Everything here is a
pure ``pyspark.sql.functions`` composition so it rides whole-stage codegen
and has a line-for-line ANSI-SQL oracle in ``__spark_entry__.oracle_sql``.
"""

from __future__ import annotations

from pyspark.sql import Column, functions as F

# The engine-wide PORTABLE whitespace class.  Spelled out — never \s —
# because Java regex counts \x0B (vertical tab) as whitespace and
# DuckDB's RE2 does not: one stray \x0B in a crawled page would make
# every cross-engine oracle hash-diverge.  This is the single most
# correctness-critical expression in the engine; every operator that is
# value-checked against DuckDB must tokenize through PORTABLE_WS /
# portable_words so the class is single-sourced.
PORTABLE_WS = r"[ \t\n\r\f]+"


def portable_words(text: Column) -> Column:
    """Non-empty lowercase whitespace tokens under ``PORTABLE_WS`` —
    the shared tokenizer for every DuckDB-verified operator (quality,
    BPE, span-dedup, decontamination, LM scoring, BM25, inverted index,
    set-similarity join, classifier, chunking, shingles)."""
    return F.filter(F.split(F.lower(F.trim(text)), PORTABLE_WS),
                    lambda w: w != F.lit(""))


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
    """Array of n-gram (word) shingles for Jaccard/MinHash dedup.

    The whitespace class is spelled out (no ``\\s``) because Java regex
    counts \\x0B as whitespace and RE2 does not — the explicit class
    keeps the DuckDB oracles (q29/q30) bit-identical."""
    words = portable_words(text)
    # zip_with over shifted copies, NOT transform(indices, i -> ...):
    # interpreted higher-order functions re-evaluate captured expression
    # trees per element, so referencing `words` inside the lambda makes
    # shingling O(doc^2) on crawl-scale pages (see quality._ngrams)
    grams = words
    for j in range(1, n):
        shifted = F.slice(words, j + 1, F.greatest(F.size(words), F.lit(1)))
        grams = F.zip_with(grams, shifted,
                           lambda a, b: F.concat_ws(" ", a, b))
    return F.when(F.size(words) < n, F.array(F.concat_ws(" ", words))).otherwise(
        F.slice(grams, 1, F.size(words) - (n - 1)))


# --- PII redaction (training-data hygiene) ---------------------------------

# RE2-compatible (no lookaround) so the exact same patterns run in the
# DuckDB oracle.  Ordering matters: emails before phones (an email local
# part can contain digit runs), IPs before phones.
# RFC-bounded quantifiers ({1,64} local part, {1,255} domain): the
# local-part class includes ".", so on a long dot/digit run every
# position is a match start and unbounded + re-scans the whole run
# per start (O(n^2), half of a measured 200s on 200KB runs).
PII_EMAIL = r"[A-Za-z0-9._%+-]{1,64}@[A-Za-z0-9.-]{1,255}\.[A-Za-z]{2,24}"
PII_IPV4 = r"\b[0-9]{1,3}\.[0-9]{1,3}\.[0-9]{1,3}\.[0-9]{1,3}\b"
# Bounded {7,20}, not {7,}: the class includes space, so on a page of
# space-separated digit runs every digit is a match start and an
# unbounded quantifier re-scans + backtracks the whole run per start —
# measured 228s on 500KB of digits. No phone number exceeds 22 chars.
PII_PHONE = r"\+?[0-9][0-9()\-. ]{7,20}[0-9]"
PII_SSN = r"\b[0-9]{3}-[0-9]{2}-[0-9]{4}\b"


def redact_pii(text: Column) -> Column:
    """Replace emails / IPv4s / SSNs / phone-like digit runs with typed
    placeholder tokens — the standard pre-training scrub pass.  Pure
    ``regexp_replace`` chain: whole-stage codegen, no Python."""
    out = F.regexp_replace(text, PII_EMAIL, "<EMAIL>")
    out = F.regexp_replace(out, PII_IPV4, "<IP>")
    out = F.regexp_replace(out, PII_SSN, "<SSN>")
    out = F.regexp_replace(out, PII_PHONE, "<PHONE>")
    return out


def pii_counts(text: Column) -> dict[str, Column]:
    """Per-kind PII match counts (for corpus audit aggregations)."""
    return {
        "n_emails": F.size(F.regexp_extract_all(text, F.lit(PII_EMAIL), 0)),
        "n_ips": F.size(F.regexp_extract_all(text, F.lit(PII_IPV4), 0)),
        "n_ssns": F.size(F.regexp_extract_all(text, F.lit(PII_SSN), 0)),
    }


# --- URL canonicalization (crawl dedup) ------------------------------------

# anchored at a parameter boundary ([?&]) so 'ref' does not fire inside
# longer names (href=, aref=) or path segments; the boundary char is kept
# via $1 and the separator cleanup rules below collapse the leftovers.
_TRACKING_QUERY = r"([?&])(utm_[a-z]+|fbclid|gclid|msclkid|ref|mc_cid|mc_eid)=[^&#]*"


def canonical_url(url: Column) -> Column:
    """Crawl-grade URL normalization: lowercase scheme+host, strip
    fragment, strip tracking query params, collapse duplicate slashes in
    the path, drop trailing '?'/'&' and trailing slash (except root).

    Canonicalizing BEFORE the url-hash partitioning/dedup stages means
    recrawls of the same logical page land in the same partition and
    collapse in `latest_snapshot` — at crawl scale this is the difference
    between deduplicating pages and deduplicating tracking-tag variants.
    """
    u = F.trim(url)
    head = F.regexp_extract(u, r"^[A-Za-z][A-Za-z0-9+.-]*://[^/?#]*", 0)
    tail = F.substring(u, F.length(head) + 1, F.lit(1 << 30))
    u2 = F.concat(F.lower(head), tail)
    u2 = F.regexp_replace(u2, r"#.*$", "")                      # fragment
    u2 = F.regexp_replace(u2, _TRACKING_QUERY, r"$1")           # tracking params
    u2 = F.regexp_replace(u2, r"&{2,}", "&")                    # separator debris
    u2 = F.regexp_replace(u2, r"\?&", "?")
    u2 = F.regexp_replace(u2, r"[?&]$", "")
    # slash normalization applies to the PATH only — query values may
    # legitimately carry slashes (redirect targets etc.)
    path = F.regexp_extract(u2, r"^[^?#]*", 0)
    query = F.substring(u2, F.length(path) + 1, F.lit(1 << 30))
    path = F.regexp_replace(path, r"([^:/])/{2,}", r"$1/")      # dup slashes
    path = F.regexp_replace(path, r"(://[^/]*/.+?)/$", r"$1")   # trailing slash
    return F.concat(path, query)
