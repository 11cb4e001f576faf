"""Vocabulary scaling statistics: Good-Turing smoothing counts and
the Zipf rank-frequency slope (the two classical numbers a corpus
language model card reports: GT's frequency-of-frequencies table
gives the unseen-mass estimate P0 = N1/N and the discounted counts
r* = (r+1)·N_{r+1}/N_r that the q80 stupid-backoff family would use
for proper smoothing; the Zipf log-log slope (~ -1 for natural text,
flatter for template/boilerplate corpora, steeper for tiny
vocabularies) is a one-number corpus-health signal that catches
synthetic or over-deduplicated text at a glance).

Exactness: term counts, frequency-of-frequencies and the GT ratio
are ENTIRELY integer (r* is exact ppm division); the Zipf regression
quantizes ln(rank)/ln(count) to milli-unit BIGINTs first so the
moment sums are exact integer arithmetic (reduction-order-proof; the
milli quantization also keeps Sxy within BIGINT at 10^6-term
vocabularies), leaving the slope's one float step as a shared SQL
string.

Scale shape: one explode + groupBy(term) (the postings/keyness pass),
then everything runs on the TERM frame: frequency-of-frequencies is
a second partial-agg groupBy; the Zipf rank is one window over terms
ordered by (count DESC, term).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window, functions as F

from ..functions.text import portable_words

# slope = (n*Sxy - Sx*Sy) / (n*Sxx - Sx*Sx) over milli-quantized
# (x=ln rank, y=ln count); micro output.  Shared verbatim.
ZIPF_SLOPE_MICRO_SQL = (
    "CASE WHEN n * sxx - sx * sx = 0 THEN NULL ELSE "
    "CAST(round(1000000 * (CAST(n AS DOUBLE) * sxy - CAST(sx AS DOUBLE)"
    " * sy) / (CAST(n AS DOUBLE) * sxx - CAST(sx AS DOUBLE) * sx))"
    " AS BIGINT) END")

_LNM = "CAST(round(1000 * ln(CAST({v} AS DOUBLE))) AS BIGINT)"


def _units(text_col: str, unit: str):
    ws = portable_words(F.col(text_col))
    if unit == "word":
        return ws
    # word bigrams (the dedup.py portable-shingle idiom): a far larger
    # vocabulary with a real low-frequency tail — the synthetic corpus'
    # ~40-word unigram vocabulary has NO rare terms, which makes GT
    # frequency-of-frequencies empty and the Zipf fit degenerate.
    g2 = F.zip_with(ws, F.slice(ws, 2, F.greatest(F.size(ws), F.lit(1))),
                    lambda a, b: F.concat_ws(" ", a, b))
    return F.when(F.size(ws) >= 2, F.slice(g2, 1, F.size(ws) - 1))         .otherwise(F.array().cast("array<string>"))


def _term_counts(docs: DataFrame, text_col: str,
                 unit: str = "bigram") -> DataFrame:
    return (docs.select(F.explode(_units(text_col, unit)).alias("term"))
            .groupBy("term")
            .agg(F.count(F.lit(1)).cast("long").alias("c")))


def good_turing(docs: DataFrame, text_col: str = "text",
                max_r: int = 10, unit: str = "bigram") -> DataFrame:
    """-> (r, n_r, r_star_ppm) for r = 1..max_r: frequency-of-
    frequencies with the Good-Turing discounted count
    r* = (r+1)·N_{r+1}/N_r in ppm (NULL when N_{r+1} is absent) —
    entirely integer arithmetic."""
    counts = _term_counts(docs, text_col, unit)
    nr = (counts.filter(F.col("c") <= max_r + 1)
          .groupBy(F.col("c").alias("r"))
          .agg(F.count(F.lit(1)).cast("long").alias("n_r")))
    nxt = nr.selectExpr("r - 1 AS r", "n_r AS n_r1")
    return (nr.join(nxt, "r", "left")
            .filter(F.col("r") <= max_r)
            .select("r", "n_r",
                    F.expr("(r + 1) * n_r1 * 1000000 DIV n_r")
                    .alias("r_star_ppm")))


def zipf_slope(docs: DataFrame, text_col: str = "text",
               min_count: int = 2, unit: str = "bigram") -> DataFrame:
    """-> one row (n, sx, sy, sxy, sxx, slope_micro): least-squares
    slope of ln(count) on ln(rank) over terms with count >=
    min_count; ranks by (count DESC, term) — exact moments, one
    shared float step."""
    counts = _term_counts(docs, text_col, unit).filter(
        F.col("c") >= min_count)
    ranked = counts.withColumn(
        "rank", F.row_number().over(
            Window.orderBy(F.col("c").desc(), F.col("term").asc())))
    pts = ranked.select(
        F.expr(_LNM.format(v="rank")).alias("x"),
        F.expr(_LNM.format(v="c")).alias("y"))
    agg = pts.agg(F.count(F.lit(1)).cast("long").alias("n"),
                  F.sum("x").cast("long").alias("sx"),
                  F.sum("y").cast("long").alias("sy"),
                  F.sum(F.col("x") * F.col("y")).cast("long")
                  .alias("sxy"),
                  F.sum(F.col("x") * F.col("x")).cast("long")
                  .alias("sxx"))
    return agg.select("n", "sx", "sy", "sxy", "sxx",
                      F.expr(ZIPF_SLOPE_MICRO_SQL).alias("slope_micro"))


_TOKS = r"""
          SELECT unnest(bg) AS term FROM (
            SELECT CASE WHEN len(ws) >= 2
                   THEN list_transform(range(1, len(ws)),
                          i -> ws[i] || ' ' || ws[i+1])
                   ELSE [] END AS bg
            FROM (SELECT list_filter(string_split_regex(
                      lower(trim(text)), '[ \t\n\r\f]+'),
                      w -> w <> '') AS ws
                  FROM {table}))"""


def good_turing_oracle_sql(table: str = "documents",
                           max_r: int = 10) -> str:
    return f"""
        WITH counts AS (SELECT term, CAST(COUNT(*) AS BIGINT) AS c
                        FROM ({_TOKS.format(table=table)})
                        GROUP BY term),
        nr AS (SELECT c AS r, CAST(COUNT(*) AS BIGINT) AS n_r
               FROM counts WHERE c <= {max_r + 1} GROUP BY c),
        nxt AS (SELECT r - 1 AS r, n_r AS n_r1 FROM nr)
        SELECT nr.r, nr.n_r,
               CAST((nr.r + 1) * nxt.n_r1 * 1000000 // nr.n_r
                    AS BIGINT) AS r_star_ppm
        FROM nr LEFT JOIN nxt ON nxt.r = nr.r
        WHERE nr.r <= {max_r} ORDER BY nr.r"""


def zipf_oracle_sql(table: str = "documents",
                    min_count: int = 2) -> str:
    lnx = _LNM.format(v="rank")
    lny = _LNM.format(v="c")
    return f"""
        WITH counts AS (SELECT term, CAST(COUNT(*) AS BIGINT) AS c
                        FROM ({_TOKS.format(table=table)})
                        GROUP BY term HAVING COUNT(*) >= {min_count}),
        ranked AS (SELECT c, ROW_NUMBER() OVER
                          (ORDER BY c DESC, term ASC) AS rank
                   FROM counts),
        pts AS (SELECT {lnx} AS x, {lny} AS y FROM ranked),
        agg AS (SELECT CAST(COUNT(*) AS BIGINT) AS n,
                       CAST(SUM(x) AS BIGINT) AS sx,
                       CAST(SUM(y) AS BIGINT) AS sy,
                       CAST(SUM(x * y) AS BIGINT) AS sxy,
                       CAST(SUM(x * x) AS BIGINT) AS sxx
                FROM pts)
        SELECT n, sx, sy, sxy, sxx,
               {ZIPF_SLOPE_MICRO_SQL} AS slope_micro
        FROM agg"""
