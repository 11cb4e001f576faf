"""Crawl-health gates (beyond-reference webtext surface; the
fetch-side hygiene battery between the robots/politeness layer
(frontier.py, q155/q166) and the content filters (webclean.py,
q153/q156) — the three failure modes every production crawl budget
bleeds on: URL-space traps, soft-404 bodies, and mislabeled language
metadata).

All three reports follow the repo's exactness contract: RE2-safe
patterns and CASE ladders shared as SQL TEXT with the DuckDB oracles,
exact integer ppm, partial-agg groupBys only (no window over the page
stream, no Python).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

# --- crawl traps ----------------------------------------------------------

# Query-string split and path extraction shared with the q179 oracle.
PATH_RE = r"^[a-z]+://[^/?#]+([^?#]*)"


def crawl_trap_report(pages: DataFrame,
                      min_urls: int = 10) -> DataFrame:
    """Calendar/session-id URL-space explosion detector: a trapped host
    shows MANY distinct urls per distinct path+script surface (infinite
    query permutations over few real resources).

    (host, url) -> per host with >= min_urls urls:
    (host, n_urls, n_paths, n_with_query, urls_per_path_ppm,
    query_share_ppm) — ``urls_per_path_ppm = n_urls * 1e6 / n_paths``
    (1e6 = healthy, >> 1e6 = trap suspect) and the query-string share.
    One projection + one partial-agg groupBy."""
    p = pages.select(
        "host", F.col("url"),
        F.regexp_extract("url", PATH_RE, 1).alias("path"),
        F.col("url").contains("?").cast("long").alias("has_q"))
    return (p.groupBy("host")
            .agg(F.countDistinct("url").cast("long").alias("n_urls"),
                 F.countDistinct("path").cast("long").alias("n_paths"),
                 F.sum("has_q").cast("long").alias("n_with_query"))
            .filter(F.col("n_urls") >= min_urls)
            .selectExpr(
                "host", "n_urls", "n_paths", "n_with_query",
                "CASE WHEN n_paths = 0 THEN 0 ELSE "
                "n_urls * 1000000 DIV n_paths END AS urls_per_path_ppm",
                "n_with_query * 1000000 DIV n_urls AS query_share_ppm"))


# --- soft 404 -------------------------------------------------------------

# Error-template phrases, lowercase literal alternation (RE2-safe, no
# anchors so they match anywhere) — shared verbatim with the q180 oracle.
SOFT404_RE = ("(page not found|404 error|no longer available|"
              "does not exist|page cannot be found)")
SOFT404_MAX_CHARS = 2000


def soft404_report(pages: DataFrame) -> DataFrame:
    """Soft-404 gate: a 200-status page whose body is an error template
    (the crawler stored it, the index must not).  Flag = an error
    phrase present AND a short body (< {max} chars — long articles that
    merely mention '404 error' survive).

    (doc_id, host, text) -> (doc_id, host, n_chars, has_phrase,
    is_soft404); one projection, no shuffle — composes with the
    mojibake/tag-density gates into the keep-decision column."""
    t = F.coalesce(F.col("text"), F.lit(""))
    has = F.lower(t).rlike(SOFT404_RE)
    return pages.select(
        "doc_id", "host",
        F.length(t).cast("long").alias("n_chars"),
        has.alias("has_phrase"),
        (has & (F.length(t) < SOFT404_MAX_CHARS)).alias("is_soft404"))


# --- language consistency -------------------------------------------------

def lang_mismatch_report(pages: DataFrame) -> DataFrame:
    """Metadata-vs-content language audit per host: the declared
    ``lang`` column (HTTP header / html attribute at crawl time)
    against the stopword-vote language ID of the body
    (functions/text.lang_id).  Hosts serving wrong lang headers poison
    per-language corpus routing; 'und' predictions (no stopword
    evidence) are counted separately, not as mismatches.

    (host, lang, text) -> (host, n_pages, n_match, n_mismatch, n_und,
    mismatch_ppm) where mismatch_ppm is over decided pages only."""
    from ..functions.text import lang_id
    scored = pages.select(
        "host", "lang", lang_id(F.col("text")).alias("pred"))
    return (scored.groupBy("host")
            .agg(F.count(F.lit(1)).cast("long").alias("n_pages"),
                 F.sum(((F.col("pred") == F.col("lang"))
                        & (F.col("pred") != "und")).cast("long"))
                 .cast("long").alias("n_match"),
                 F.sum(((F.col("pred") != F.col("lang"))
                        & (F.col("pred") != "und")).cast("long"))
                 .cast("long").alias("n_mismatch"),
                 F.sum((F.col("pred") == "und").cast("long"))
                 .cast("long").alias("n_und"))
            .selectExpr(
                "host", "n_pages", "n_match", "n_mismatch", "n_und",
                "CASE WHEN n_match + n_mismatch = 0 THEN 0 ELSE "
                "n_mismatch * 1000000 DIV (n_match + n_mismatch) END "
                "AS mismatch_ppm"))
