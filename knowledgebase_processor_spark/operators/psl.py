"""Public-suffix-aware registrable-domain (eTLD+1) extraction — the
host-normalization step every per-site rollup in this repo implicitly
assumes (q149's URL prefix rollup, q175's host reciprocity, q166's
politeness scheduler all key on "site"; raw hostnames over-split
(news.bbc.co.uk vs www.bbc.co.uk are one site) and naive last-two-
label slicing under-splits (user1.github.io vs user2.github.io are
DIFFERENT sites).  The Mozilla Public Suffix List is the standard
answer; a compact demo list ships here and a production run passes
the full PSL the same way).

Longest-matching-suffix semantics, evaluated as a fixed CASE ladder
over the last 1..3 labels — entirely JVM-side codegen against a
LITERAL set (the PSL is a few thousand entries; at that size an
array-contains ladder or a broadcast join are both map-side, and the
ladder keeps the whole thing in one projection).  A host that IS a
public suffix (or has no dot) yields NULL — unregistrable.

The DuckDB oracle replays the same ladder with the same list literal
(list slicing instead of substring_index — spelled per engine, the
constants shared from this module).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, functions as F

# Compact demo PSL: 2-label entries MUST be checked before 1-label
# ones (longest match wins).  A production deployment passes the full
# Mozilla list; the ladder shape is identical.
DEMO_PSL = (
    "com", "org", "net", "io", "dev", "edu", "gov", "uk", "jp", "au",
    "de", "fr", "cn", "br",
    "co.uk", "org.uk", "ac.uk", "gov.uk", "com.au", "net.au", "co.jp",
    "ac.jp", "com.br", "com.cn", "github.io", "gitlab.io",
    "blogspot.com",
)

HOST_RE = r"^[a-z][a-z0-9+.-]*://(?:[^/@]*@)?([^/:?#]+)"


def _labels(host: Column) -> Column:
    return F.split(host, r"\.")


def extract_host(url: Column) -> Column:
    """Lowercased hostname from a URL (scheme required, port/userinfo
    stripped) — NULL when the URL does not parse."""
    h = F.regexp_extract(F.lower(F.trim(url)), HOST_RE, 1)
    return F.when(h == "", F.lit(None).cast("string")).otherwise(h)


def registrable_domain(host: Column) -> Column:
    """eTLD+1 of a hostname under :data:`DEMO_PSL` — NULL when the
    host is itself a public suffix or has no matching suffix."""
    psl = sorted(DEMO_PSL, key=lambda s: -s.count("."))
    max_k = max(s.count(".") + 1 for s in DEMO_PSL)
    n = F.size(_labels(host))
    expr = F.lit(None).cast("string")
    # build the ladder from SHORTEST suffix up so the longest match
    # ends up outermost in the nested CASE
    for k in range(1, max_k + 1):
        in_k = [s for s in psl if s.count(".") + 1 == k]
        if not in_k:
            continue
        cand = F.substring_index(host, ".", -k)
        etld1 = F.substring_index(host, ".", -(k + 1))
        # the longest matching suffix DECIDES — a host equal to its
        # matching suffix is unregistrable and must NOT fall through
        # to a shorter rule ('co.uk' would wrongly register under 'uk')
        expr = F.when(cand.isin(*in_k),
                      F.when(n > k, etld1).otherwise(
                          F.lit(None).cast("string"))).otherwise(expr)
    return expr


def site_rollup(pages: DataFrame, url_col: str = "url") -> DataFrame:
    """-> (site, n_pages, n_hosts): per-registrable-domain page and
    distinct-host counts — the correct 'per site' key for politeness,
    quota and reciprocity rollups.  One projection + one partial-agg
    groupBy; unregistrable hosts group under NULL for visibility."""
    h = extract_host(F.col(url_col))
    lab = pages.select(h.alias("host"),
                       registrable_domain(h).alias("site"))
    return (lab.groupBy("site")
            .agg(F.count(F.lit(1)).cast("long").alias("n_pages"),
                 F.countDistinct("host").cast("long").alias("n_hosts")))


def site_rollup_oracle_sql(table: str, url_sql: str) -> str:
    """DuckDB replay: same PSL literal, same longest-match ladder
    (list-slice spelling; DuckDB regexp_extract group 1)."""
    psl_lit = ", ".join(f"'{s}'" for s in DEMO_PSL)
    max_k = max(s.count(".") + 1 for s in DEMO_PSL)
    ladder = "NULL"
    for k in range(1, max_k + 1):
        in_k = [s for s in sorted(DEMO_PSL, key=lambda s: -s.count("."))
                if s.count(".") + 1 == k]
        if not in_k:
            continue
        in_lit = ", ".join(f"'{s}'" for s in in_k)
        cand = f"array_to_string(parts[-{k}:], '.')"
        etld1 = f"array_to_string(parts[-{k + 1}:], '.')"
        ladder = (f"CASE WHEN {cand} IN ({in_lit})"
                  f" THEN (CASE WHEN len(parts) > {k}"
                  f" THEN {etld1} ELSE NULL END) ELSE {ladder} END")
    return f"""
        WITH h AS (
          SELECT CASE WHEN regexp_extract(lower(trim({url_sql})),
                        '{HOST_RE}', 1) = '' THEN NULL
                 ELSE regexp_extract(lower(trim({url_sql})),
                        '{HOST_RE}', 1) END AS host
          FROM {table}),
        lab AS (SELECT host, {ladder.replace("parts",
                                             "string_split(host, '.')")}
                       AS site
                FROM h)
        SELECT site, CAST(COUNT(*) AS BIGINT) AS n_pages,
               CAST(COUNT(DISTINCT host) AS BIGINT) AS n_hosts
        FROM lab GROUP BY site ORDER BY site NULLS FIRST
        -- psl literal (shared): {psl_lit}
        """
