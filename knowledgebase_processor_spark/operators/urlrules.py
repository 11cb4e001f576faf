"""Robots-style longest-prefix URL rule filtering.

Beyond-reference (crawl-hygiene family, next to
``functions/text.canonical_url`` and the domain cap): a production crawl
applies per-site allow/disallow rule sets (robots.txt semantics, plus
curated blocklists) to every fetched URL.  The match rule is the
google/RFC 9309 convention: the LONGEST matching prefix decides, and on
a length tie ``allow`` wins.

Scale shape: the ruleset is small configuration (thousands of rules) —
inlined as an array-of-struct LITERAL, so the decision is a pure
whole-stage-codegen fold per row (filter + aggregate higher-order
functions over the broadcast literal): zero joins, zero shuffles, zero
Python.  For per-HOST rulesets at web scale the same fold runs after a
broadcast join keyed on host (the wikilink_resolve.py broadcast
contract); the fold itself is unchanged.

Portability: the q86 oracle re-derives every decision in DuckDB through
the equivalent relational form (unnest rules -> prefix join -> best-rule
window) — same semantics, different physical shape, which doubles as a
cross-check that the fold implements the spec and not an artifact of
expression ordering.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, functions as F


def _rules_literal(rules: list[tuple[str, bool]]) -> Column:
    return F.array(*[
        F.struct(F.lit(p).alias("prefix"), F.lit(bool(a)).alias("allow"))
        for p, a in rules])


def url_allowed(path_col: Column, rules: list[tuple[str, bool]]) -> Column:
    """Boolean: does the longest matching rule (allow wins ties) permit
    ``path_col``?  No matching rule means allowed (robots default)."""
    lit = _rules_literal(rules)
    matches = F.filter(lit, lambda r: path_col.startswith(r["prefix"]))
    best = F.aggregate(
        matches,
        F.struct(F.lit(-1).alias("len"), F.lit(True).alias("allow")),
        lambda acc, r: F.when(
            (F.length(r["prefix"]) > acc["len"])
            | ((F.length(r["prefix"]) == acc["len"])
               & r["allow"] & ~acc["allow"]),
            F.struct(F.length(r["prefix"]).alias("len"),
                     r["allow"].alias("allow"))
        ).otherwise(acc))
    return best["allow"]


def apply_url_rules(df: DataFrame, path_col: str,
                    rules: list[tuple[str, bool]]) -> DataFrame:
    """Append an ``allowed`` boolean column per the rule set."""
    return df.withColumn("allowed", url_allowed(F.col(path_col), rules))


def url_rules_oracle_sql(paths_sql: str, rules: list[tuple[str, bool]]) -> str:
    """DuckDB replay via the relational form: ``paths_sql`` must select a
    column ``path``; returns (path, allowed)."""
    vals = ", ".join(f"('{p}', {'TRUE' if a else 'FALSE'})"
                     for p, a in rules)
    return f"""
        WITH paths AS ({paths_sql}),
        rules(prefix, allow) AS (VALUES {vals}),
        m AS (
          SELECT p.path, r.allow,
                 ROW_NUMBER() OVER (
                   PARTITION BY p.path
                   ORDER BY length(r.prefix) DESC, r.allow DESC) AS rn
          FROM paths p JOIN rules r
            ON substr(p.path, 1, length(r.prefix)) = r.prefix)
        SELECT p.path,
               COALESCE(MAX(CASE WHEN m.rn = 1 THEN m.allow END), TRUE)
                 AS allowed
        FROM paths p LEFT JOIN m ON p.path = m.path AND m.rn = 1
        GROUP BY p.path"""
