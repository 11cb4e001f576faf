"""Web-text encoding hygiene + URL-structure bitext alignment + robots
parsing (beyond-reference webtext surface; companions to urlrules.py /
functions.text quality signals).

All three are pure-codegen column programs (regex counts, key joins,
one window) with exact integer outputs — no Python row path, and every
formula is replayed verbatim by the driver oracles.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window, functions as F

# Encoding-damage signals, each RE2-safe (no lookaround) so the exact
# pattern strings run in the DuckDB oracle:
#  * U+FFFD replacement chars — decode failures;
#  * UTF-8-read-as-Latin-1 artifacts: 'Ã'/'Â' followed by another
#    non-ASCII (the classic mojibake bigrams a£, Ã©, â€™ ...);
#  * C1 control block U+0080-U+009F — CP1252 bytes mis-mapped.
# Escaped code points (\\x{..} parses identically in Java regex and
# RE2/DuckDB) rather than raw bytes in the pattern literals.
_FFFD = "\\x{FFFD}"
_LATIN_ARTIFACT = "[\\x{00C2}\\x{00C3}\\x{00E2}][\\x{0080}-\\x{00BF}]"
_C1 = "[\\x{0080}-\\x{009F}]"

MOJIBAKE_BAD_PPM = 1_000   # >0.1% damaged chars -> reject


def mojibake_report(docs: DataFrame, id_col: str = "doc_id",
                    text_col: str = "text") -> DataFrame:
    """Per-doc encoding-damage report: counts of each artifact class,
    damaged chars per million (integer DIV — exact), and the keep flag.
    One projection over the corpus — the cheapest cleaning gate."""
    t = F.col(text_col)
    counted = docs.select(
        F.col(id_col).alias("doc_id"),
        F.greatest(F.length(t), F.lit(1)).cast("long").alias("__n"),
        F.size(F.regexp_extract_all(t, F.lit(_FFFD), F.lit(0)))
        .cast("long").alias("n_fffd"),
        F.size(F.regexp_extract_all(t, F.lit(_LATIN_ARTIFACT), F.lit(0)))
        .cast("long").alias("n_latin_artifacts"),
        F.size(F.regexp_extract_all(t, F.lit(_C1), F.lit(0)))
        .cast("long").alias("n_c1_controls"))
    return (counted
            .withColumn("n_damaged",
                        F.expr("n_fffd + n_latin_artifacts + n_c1_controls"))
            .withColumn("damaged_ppm", F.expr("n_damaged * 1000000 DIV __n"))
            .withColumn("keep",
                        F.expr(f"damaged_ppm <= {MOJIBAKE_BAD_PPM}"))
            .drop("__n"))


def url_align_pairs(pages: DataFrame, langs: tuple[str, str] = ("en", "fr"),
                    url_col: str = "url",
                    id_col: str = "doc_id") -> DataFrame:
    """URL-structure bitext alignment (the WMT16 document-alignment
    baseline, Buck & Koehn): pages whose URLs differ ONLY in a
    language path segment (``/en/`` vs ``/fr/``) pair up.

    Strip the segment to a language-neutral key, then one equi-join of
    the two language sides on the key — at crawl scale both sides
    shuffle-partition on the key; a host serving millions of pages per
    key is a data bug the ``distinct`` guards.  Complements
    `bitext.margin_mine` (structure-based recall, embedding-based
    precision).  Returns (key, <lang-a>_id, <lang-b>_id)."""
    a, b = langs

    def side(lang, out):
        marker = f"/{lang}/"
        return (pages.select(F.col(id_col).alias(out), F.col(url_col))
                .filter(F.col(url_col).contains(marker))
                .select(out, F.replace(F.col(url_col), F.lit(marker),
                                       F.lit("/")).alias("key"))
                .distinct())

    return (side(a, f"{a}_id").join(side(b, f"{b}_id"), "key")
            .select("key", f"{a}_id", f"{b}_id"))


def parse_robots(robots: DataFrame, host_col: str = "host",
                 text_col: str = "robots_txt") -> DataFrame:
    """Distributed robots.txt parse: one (host, robots body) row in,
    one (host, agent, rule_idx, allow, path) row per rule out — the
    rules frame `urlrules.apply_url_rules` consumes.

    Stateful line semantics ("rules attach to the most recent
    User-agent group") become a window running-count: explode lines
    with position, group id = count of User-agent lines seen so far in
    (host, line-order) — one spillable window per host, no Python.
    Comment (#...) and blank lines drop; unknown directives drop;
    multiple User-agent lines stacked on one group are normalized to
    one agent per rule row (the cross join inside the group).
    """
    lines = robots.select(
        F.col(host_col).alias("host"),
        F.posexplode(F.split(F.col(text_col), "\n")).alias("pos", "line"))
    lines = lines.select(
        "host", "pos",
        F.trim(F.regexp_replace("line", "#.*$", "")).alias("line")) \
        .filter(F.col("line") != "")
    parsed = lines.select(
        "host", "pos",
        F.lower(F.trim(F.regexp_extract("line", "^([^:]+):", 1)))
        .alias("directive"),
        F.trim(F.regexp_extract("line", "^[^:]+:(.*)$", 1)).alias("value"))
    # group boundary = a User-agent line NOT preceded by another
    # User-agent line ("User-agent: a\nUser-agent: b\nDisallow: /x"
    # is ONE group; both agents receive the rule via the group join).
    w = Window.partitionBy("host").orderBy("pos")
    grouped = parsed.withColumn("__prev", F.lag("directive").over(w)) \
        .withColumn(
            "grp", F.sum(F.when((F.col("directive") == "user-agent")
                                & (F.coalesce(F.col("__prev"), F.lit(""))
                                   != "user-agent"), 1)
                         .otherwise(0)).over(w))

    agents = (grouped.filter(F.col("directive") == "user-agent")
              .select("host", "grp", F.col("value").alias("agent")))
    rules = (grouped.filter(F.col("directive").isin("allow", "disallow")
                            & (F.col("value") != ""))
             .select("host", "grp", "pos",
                     (F.col("directive") == "allow").alias("allow"),
                     F.col("value").alias("path")))
    out = (agents.join(rules, ["host", "grp"])
           .withColumn("rule_idx",
                       F.row_number().over(
                           Window.partitionBy("host", "agent")
                           .orderBy("pos")).cast("int")))
    return out.select("host", "agent", "rule_idx", "allow", "path")


def tag_density_report(pages: DataFrame, id_col: str = "doc_id",
                       html_col: str = "html") -> DataFrame:
    """Markup-density profile per page (boilerplate signal: jusText /
    Readability both gate on text-to-tag ratio before anything else):
    tag count, anchor-tag count, visible-text length after tag strip,
    and text share in integer ppm.  One projection, RE2-safe patterns
    shared verbatim with the oracle.  `sources/html_extract` does the
    real boilerplate strip; this is the cheap pre-filter that decides
    whether a page is worth running it on."""
    t = F.col(html_col)
    n_tags = F.size(F.regexp_extract_all(t, F.lit("<[^>]*>"), F.lit(0)))
    n_anchor = F.size(F.regexp_extract_all(
        t, F.lit("<[aA][ >/]"), F.lit(0)))
    text_len = F.length(F.regexp_replace(t, "<[^>]*>", ""))
    counted = pages.select(
        F.col(id_col).alias("doc_id"),
        F.greatest(F.length(t), F.lit(1)).cast("long").alias("__n"),
        n_tags.cast("long").alias("n_tags"),
        n_anchor.cast("long").alias("n_anchor_tags"),
        text_len.cast("long").alias("text_chars"))
    return (counted
            .withColumn("text_ppm", F.expr("text_chars * 1000000 DIV __n"))
            .drop("__n"))


# Shared with the q164 oracle (the url_rules/tag_density idiom): blocks
# split on </url>, loc/lastmod pulled with the same regex text.
SITEMAP_LOC_RE = r"<loc>\s*([^<]+?)\s*</loc>"
SITEMAP_LASTMOD_RE = r"<lastmod>\s*([^<]+?)\s*</lastmod>"


def parse_sitemaps(sitemaps: DataFrame, host_col: str = "host",
                   xml_col: str = "sitemap_xml") -> DataFrame:
    """Distributed sitemap.xml parse: one (host, xml body) row in, one
    (host, loc, lastmod) row per ``<url>`` block out (lastmod NULL when
    the optional tag is absent).

    No XML library on the hot path (same stdlib-free stance as
    tag_density_report): sitemaps are machine-generated and flat, so
    splitting on ``</url>`` and extracting ``<loc>``/``<lastmod>`` with
    anchored non-greedy regexes — RE2-safe, shared verbatim with the
    DuckDB oracle — parses everything real generators emit; a block
    without a ``<loc>`` drops.  One explode + one projection, no
    shuffle, no Python.
    """
    blocks = sitemaps.select(
        F.col(host_col).alias("host"),
        F.explode(F.split(F.col(xml_col), "</url>")).alias("block"))
    return (blocks.select(
        "host",
        F.regexp_extract("block", SITEMAP_LOC_RE, 1).alias("loc"),
        F.nullif(F.regexp_extract("block", SITEMAP_LASTMOD_RE, 1),
                 F.lit("")).alias("lastmod"))
        .filter(F.col("loc") != ""))


def sitemap_coverage(sitemap_urls: DataFrame,
                     crawled: DataFrame) -> DataFrame:
    """Crawl-completeness report: per host, how much of the site's
    declared sitemap the crawl covered and how much of the crawl the
    sitemap never declared (discovery-only urls).

    -> (host, n_sitemap, n_crawled, n_both, coverage_ppm, orphan_ppm):
    coverage = both / sitemap, orphan = (crawled - both) / crawled,
    both exact integer ppm.  Inputs: (host, loc) from
    :func:`parse_sitemaps` (or any declared-url frame) and (host, url)
    crawled pages.  One full-outer join on the distinct url sets, one
    partial-agg groupBy host — no window, skew absorbed map-side.
    """
    s = sitemap_urls.select("host", F.col("loc").alias("u")).distinct() \
        .withColumn("in_s", F.lit(1))
    c = crawled.select("host", F.col("url").alias("u")).distinct() \
        .withColumn("in_c", F.lit(1))
    j = s.join(c, ["host", "u"], "full_outer")
    return (j.groupBy("host")
            .agg(F.sum(F.coalesce("in_s", F.lit(0))).alias("n_sitemap"),
                 F.sum(F.coalesce("in_c", F.lit(0))).alias("n_crawled"),
                 F.sum(F.when(F.col("in_s").isNotNull()
                              & F.col("in_c").isNotNull(), 1)
                       .otherwise(0)).alias("n_both"))
            .selectExpr(
                "host", "CAST(n_sitemap AS BIGINT) AS n_sitemap",
                "CAST(n_crawled AS BIGINT) AS n_crawled",
                "CAST(n_both AS BIGINT) AS n_both",
                "CASE WHEN n_sitemap = 0 THEN 0 ELSE "
                "n_both * 1000000 DIV n_sitemap END AS coverage_ppm",
                "CASE WHEN n_crawled = 0 THEN 0 ELSE "
                "(n_crawled - n_both) * 1000000 DIV n_crawled END "
                "AS orphan_ppm"))


def host_template_shingles(pages: DataFrame, min_share_ppm: int = 500_000,
                           min_pages: int = 2, n: int = 3) -> DataFrame:
    """Per-host boilerplate/template detection: the n-gram shingles that
    appear on at least ``min_share_ppm`` of a host's pages (nav bars,
    footers, cookie banners — the text a host stamps on every page).
    The output frame is the removal dictionary a template-stripping
    pass anti-joins against, and the per-host recall complement of the
    corpus-wide novelty report (novelty.py).

    -> (host, shingle, df, n_pages, share_ppm), hosts with fewer than
    ``min_pages`` pages skipped (no evidence).  Plan: ONE explode of
    per-page distinct shingles (the shared portable shingle formula,
    functions/text.py), one partial-agg groupBy (host, shingle), one
    tiny per-host page-count join — map-side combinable end-to-end, no
    window, no pair expansion.
    """
    from ..functions.text import shingles
    sh = pages.select(
        F.col("host"), F.col("doc_id").alias("__doc"),
        F.explode(F.array_distinct(shingles(F.col("text"), n)))
        .alias("shingle"))
    df_ = sh.groupBy("host", "shingle").agg(
        F.count(F.lit(1)).cast("long").alias("df"))
    sizes = (pages.groupBy("host")
             .agg(F.countDistinct("doc_id").cast("long").alias("n_pages"))
             .filter(F.col("n_pages") >= min_pages))
    return (df_.join(F.broadcast(sizes), "host")
            .withColumn("share_ppm",
                        F.expr("df * 1000000 DIV n_pages").cast("long"))
            .filter(F.col("share_ppm") >= min_share_ppm)
            .select("host", "shingle", "df", "n_pages", "share_ppm"))


def template_oracle_sql(pages_sql: str, min_share_ppm: int = 500_000,
                        min_pages: int = 2) -> str:
    """EXACT ANSI replay of :func:`host_template_shingles` (3-gram
    shared shingle formula) for DuckDB.  ``pages_sql`` must select
    (host, doc_id, text)."""
    return (r"""
        WITH d0 AS ({pages_sql}),
        words AS (
          SELECT host, doc_id,
                 list_filter(string_split_regex(lower(trim(text)),
                                                '[ \t\n\r\f]+'),
                             w -> w <> '') AS ws
          FROM d0),
        sh0 AS (
          SELECT host, doc_id, CASE WHEN len(ws) >= 3
            THEN list_transform(range(1, len(ws) - 1),
                   i -> ws[i] || ' ' || ws[i+1] || ' ' || ws[i+2])
            ELSE [array_to_string(ws, ' ')] END AS gs
          FROM words),
        sh AS (SELECT DISTINCT host, doc_id, unnest(gs) AS shingle
               FROM sh0),
        df_ AS (SELECT host, shingle, COUNT(*)::BIGINT AS df
                FROM sh GROUP BY host, shingle),
        sizes AS (SELECT host, COUNT(DISTINCT doc_id)::BIGINT AS n_pages
                  FROM d0 GROUP BY host
                  HAVING COUNT(DISTINCT doc_id) >= {min_pages})
        SELECT df_.host, shingle, df, n_pages,
               (df * 1000000 // n_pages)::BIGINT AS share_ppm
        FROM df_ JOIN sizes ON sizes.host = df_.host
        WHERE df * 1000000 // n_pages >= {min_share}
        """.replace("{pages_sql}", pages_sql)
           .replace("{min_pages}", str(min_pages))
           .replace("{min_share}", str(min_share_ppm)))
