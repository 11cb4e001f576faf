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


def url_prefix_rollup(df: DataFrame, path_col: str,
                      max_depth: int = 3) -> DataFrame:
    """Crawl-inventory rollup over the URL path hierarchy: one row per
    (depth, path-prefix) with page counts — the "which sections of the
    site are we crawling" dashboard (beyond-reference web surface).

    ``/a/b/c`` contributes prefixes ``/a`` (depth 1), ``/a/b`` (2),
    ``/a/b/c`` (3, capped at ``max_depth``).  Pure codegen: one bounded
    posexplode of the prefix array (≤ max_depth rows per page — NOT the
    per-segment quadratic explode) and one partial-agg groupBy; the
    root-heavy key skew (every page hits depth 1) is absorbed by
    map-side combine.  Returns (depth, prefix, n_pages), exact counts.
    """
    # materialize the segment array as a COLUMN first: a lambda that
    # captures an expression tree re-evaluates it per element (the
    # shingles O(n^2) trap); capturing a bound column attribute doesn't.
    with_segs = df.select(F.slice(
        F.filter(F.split(F.col(path_col), "/"), lambda s: s != ""),
        1, max_depth).alias("__segs"))
    prefixes = F.transform(
        F.col("__segs"),
        lambda _, i: F.concat(F.lit("/"), F.array_join(
            F.slice(F.col("__segs"), 1, i + 1), "/")))
    ex = with_segs.select(F.posexplode(prefixes).alias("d", "prefix"))
    return (ex.groupBy((F.col("d") + 1).cast("int").alias("depth"), "prefix")
            .agg(F.count(F.lit(1)).alias("n_pages")))


def apply_robots(crawled: DataFrame, rules: DataFrame,
                 agent: str = "*") -> DataFrame:
    """Distributed robots compliance: evaluate every crawled url
    against its host's parsed robots rules (the frame
    ``webclean.parse_robots`` emits) under the standard
    LONGEST-PREFIX-MATCH-WINS semantics (Google's published robots.txt
    algorithm; allow beats disallow on equal length).  Hosts with no
    rules — or urls matching none — default to allowed.

    (host, url, path) x (host, agent, allow, path) ->
    (host, url, allowed, matched_rule) where matched_rule is the
    winning rule path (NULL when nothing matched).

    Plan shape: one equi-join on host (per-host rule sets are tens of
    rows — the join fans each url out to its host's rules only, never
    cross-host), a startswith filter, then ONE partial-agg struct-max
    per url picking (longest path, allow, path) — no window over the
    crawl, deterministic on equal-length allow/disallow twins.
    """
    r = (rules.filter(F.col("agent") == agent)
         .select("host", F.col("allow"),
                 F.col("path").alias("rule_path")))
    m = (crawled.join(r, "host", "left")
         .withColumn("__hit",
                     F.col("rule_path").isNotNull()
                     & F.col("path").startswith(F.col("rule_path"))))
    best = (m.groupBy("host", "url")
            .agg(F.max(F.when(F.col("__hit"),
                              F.struct(F.length("rule_path").alias("l"),
                                       F.col("allow"),
                                       F.col("rule_path"))))
                 .alias("__w")))
    return best.select(
        "host", "url",
        F.coalesce(F.col("__w.allow"), F.lit(True)).alias("allowed"),
        F.col("__w.rule_path").alias("matched_rule"))


# --------------------------------------------------------------------------
# Wildcard-aware robots matching: full parity with the published
# Google matcher — '*' matches any char run, a trailing '$' anchors
# the pattern at the path end, specificity = PATTERN length (the
# spec's tie metric; prefix rules keep their old behavior exactly
# since an escaped prefix is its own-length regex).  The plan shape
# is identical to apply_robots; only the hit predicate changes from
# startswith to a regexp built ONCE per rule row.

def robots_pattern_regex(path: str) -> str:
    """robots path pattern -> anchored regex, identical semantics in
    Java regex and RE2 (escaped literals, '.*' runs, optional '$')."""
    anchored = path.endswith("$")
    body = path[:-1] if anchored else path
    out = []
    for ch in body:
        if ch == "*":
            out.append(".*")
        elif ch in r"\.[]{}()+-?^$|":
            out.append("\\" + ch)
        else:
            out.append(ch)
    return "^" + "".join(out) + ("$" if anchored else "")


def apply_robots_wildcards(crawled: DataFrame, rules: DataFrame,
                           agent: str = "*") -> DataFrame:
    """Wildcard-aware variant of :func:`apply_robots`: same join /
    struct-max shape, hit = regexp match of the compiled rule pattern,
    specificity = raw pattern length (allow wins ties).
    """
    # pattern -> regex entirely JVM-side (no Python UDF): escape the
    # regex metacharacters, turn '*' runs into '.*', re-anchor a
    # trailing '$' (which the escape pass turned into '\$').  The
    # batch test asserts this expression equals robots_pattern_regex
    # character-for-character over a pattern matrix.
    esc = F.regexp_replace(F.col("rule_path"),
                           r"([\\.\[\]\{\}\(\)\+\-\?\^\$\|])",
                           r"\\$1")
    star = F.regexp_replace(esc, r"\*", ".*")
    rule_re = F.when(
        F.col("rule_path").endswith("$"),
        F.concat(F.lit("^"),
                 F.expr("substring(__star, 1, length(__star) - 2)"),
                 F.lit("$"))).otherwise(F.concat(F.lit("^"), star))
    r = (rules.filter(F.col("agent") == agent)
         .select("host", F.col("allow"),
                 F.col("path").alias("rule_path"))
         .withColumn("__star", star)
         .withColumn("rule_re", rule_re)
         .drop("__star"))
    m = (crawled.join(r, "host", "left")
         .withColumn("__hit",
                     F.col("rule_path").isNotNull()
                     & F.expr("path RLIKE rule_re")))
    best = (m.groupBy("host", "url")
            .agg(F.max(F.when(F.col("__hit"),
                              F.struct(F.length("rule_path").alias("l"),
                                       F.col("allow"),
                                       F.col("rule_path"))))
                 .alias("w")))
    return best.select(
        "host", "url",
        F.coalesce(F.col("w.allow"), F.lit(True)).alias("allowed"),
        F.col("w.rule_path").alias("matched_rule"))


def robots_wildcards_oracle_sql(crawl_sql: str, rules_rows: list,
                                agent: str = "*") -> str:
    """DuckDB replay with the rule set as literals (the schema side is
    tiny and known to the caller): same compiled regexes, same
    struct-max via window."""
    vals = ", ".join(
        f"('{h}', '{a}', {str(bool(al)).lower()}, '{p}',"
        f" '{robots_pattern_regex(p)}')"
        for h, a, al, p in rules_rows if a == agent)
    return f"""
        WITH crawl AS ({crawl_sql}),
        rules AS (SELECT * FROM (VALUES {vals})
                  AS t(host, agent, allow, rule_path, rule_re)),
        m AS (SELECT crawl.host, crawl.url, crawl.path,
                     rules.allow, rules.rule_path,
                     rules.rule_path IS NOT NULL
                     AND regexp_matches(crawl.path, rules.rule_re)
                         AS hit
              FROM crawl LEFT JOIN rules ON rules.host = crawl.host),
        ranked AS (SELECT host, url, allow, rule_path,
                          ROW_NUMBER() OVER (
                              PARTITION BY host, url
                              ORDER BY hit DESC, length(rule_path) DESC,
                                       allow DESC, rule_path DESC) AS rk,
                          hit
                   FROM m)
        SELECT host, url,
               CASE WHEN hit THEN allow ELSE true END AS allowed,
               CASE WHEN hit THEN rule_path ELSE NULL END
                   AS matched_rule
        FROM ranked WHERE rk = 1 ORDER BY url"""


# --------------------------------------------------------------------------
# URL path-template mining: generalize volatile path segments (digit
# runs, hex ids, uuids) and census the resulting templates per host —
# the constructive sibling of the q179 crawl-trap gate (that one
# flags infinite URL spaces; this one NAMES the generators: a host
# whose '/product/<n>/review/<n>' template carries 10^7 urls is a
# database, not content, and the template table is what a crawl
# budgeter allocates over).  Two regexp_replace passes + one groupBy;
# the patterns are RE2-safe (no backtracking classes) and shared
# verbatim with the q234 oracle.

URL_TPL_HEX_RE = "[0-9a-f]{8,}"   # long hex ids / uuids (pre-split)
URL_TPL_NUM_RE = "[0-9]+"


def url_templates(pages: DataFrame, host_col: str = "host",
                  path_col: str = "path") -> DataFrame:
    """-> (host, template, n_urls) with digit runs -> '<n>' and long
    hex runs -> '<x>' (hex first, so hex ids don't shred into digit
    fragments)."""
    tpl = F.regexp_replace(
        F.regexp_replace(F.lower(F.col(path_col)),
                         URL_TPL_HEX_RE, "<x>"),
        URL_TPL_NUM_RE, "<n>")
    return (pages.groupBy(F.col(host_col).alias("host"),
                          tpl.alias("template"))
            .agg(F.count(F.lit(1)).cast("long").alias("n_urls")))


def url_templates_oracle_sql(pages_sql: str) -> str:
    return f"""
        WITH p AS ({pages_sql})
        SELECT host,
               regexp_replace(regexp_replace(lower(path),
                   '{URL_TPL_HEX_RE}', '<x>', 'g'),
                   '{URL_TPL_NUM_RE}', '<n>', 'g') AS template,
               CAST(COUNT(*) AS BIGINT) AS n_urls
        FROM p GROUP BY 1, 2 ORDER BY host, template"""
