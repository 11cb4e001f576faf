"""Corpus keyness — log-odds ratio with informative Dirichlet prior
(Monroe, Colaresi & Quinn 2008, the standard "which words
characterize corpus A vs corpus B" statistic; raw frequency ratios
explode on rare terms and chi-square (q189) works at the
category level — keyness ranks individual TERMS, shrunk toward the
combined-corpus background so a 3-vs-0 fluke cannot outrank a
3000-vs-1000 signal.  The corpus-curation use: contrast a suspect
source against the rest and read the spam vocabulary right off the
top of the list).

    delta_w = ln((a_w+p_w)/(A+p0-a_w-p_w)) - ln((b_w+p_w)/(B+p0-b_w-p_w))
    var_w   = 1/(a_w+p_w) + 1/(b_w+p_w)
    z_w     = delta_w / sqrt(var_w),   p_w = strength * (a_w+b_w)/(A+B)

Counts are exact BIGINTs from the portable tokenizer; the z formula
is ONE module-level SQL string shared verbatim with the q211 oracle
(micro-quantized output).  Scale shape: explode + two partial-agg
groupBys + a broadcast totals row; ranking happens on the TERM frame.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

from ..functions.text import portable_words

# prior strength in pseudo-token units; shared with the oracle.
# Spelled CAST(.. AS DOUBLE) in SQL: Spark parses a bare `100.0` as
# DECIMAL(4,1), and decimal*bigint/bigint evaluates at decimal scale —
# a 4e-4 relative drift vs DuckDB's double path (caught by the q211
# oracle on first run).
PRIOR_STRENGTH = 100.0
_PS = f"CAST({PRIOR_STRENGTH!r} AS DOUBLE)"

_PW = f"({_PS} * (a_w + b_w) / (tot_a + tot_b))"
_DELTA = (f"(ln((a_w + {_PW}) / (tot_a + {_PS}"
          f" - a_w - {_PW}))"
          f" - ln((b_w + {_PW}) / (tot_b + {_PS}"
          f" - b_w - {_PW})))")
_VAR = f"(1.0 / (a_w + {_PW}) + 1.0 / (b_w + {_PW}))"
KEYNESS_Z_MICRO_SQL = (f"CAST(round(1000000 * {_DELTA} / sqrt({_VAR}))"
                       " AS BIGINT)")


def keyness(docs_a: DataFrame, docs_b: DataFrame,
            text_col: str = "text", min_count: int = 5) -> DataFrame:
    """-> (term, a_w, b_w, z_micro) for terms with combined count >=
    ``min_count``; positive z = characteristic of A."""
    def counts(d: DataFrame, name: str) -> DataFrame:
        return (d.select(F.explode(portable_words(F.col(text_col)))
                         .alias("term"))
                .groupBy("term")
                .agg(F.count(F.lit(1)).cast("long").alias(name)))

    ca, cb = counts(docs_a, "a_w"), counts(docs_b, "b_w")
    merged = (ca.join(cb, "term", "full")
              .select("term",
                      F.coalesce("a_w", F.lit(0)).cast("long")
                      .alias("a_w"),
                      F.coalesce("b_w", F.lit(0)).cast("long")
                      .alias("b_w")))
    totals = merged.agg(F.sum("a_w").cast("long").alias("tot_a"),
                        F.sum("b_w").cast("long").alias("tot_b"))
    return (merged.filter(F.col("a_w") + F.col("b_w") >= min_count)
            .crossJoin(F.broadcast(totals))
            .select("term", "a_w", "b_w",
                    F.expr(KEYNESS_Z_MICRO_SQL).alias("z_micro")))


def keyness_oracle_sql(a_sql: str, b_sql: str,
                       min_count: int = 5) -> str:
    """DuckDB replay: same portable tokenizer class, same shared z
    formula.  ``a_sql``/``b_sql`` each select one column ``text``."""
    def counts(src: str, name: str) -> str:
        return rf"""
        SELECT term, CAST(COUNT(*) AS BIGINT) AS {name}
        FROM (SELECT unnest(list_filter(string_split_regex(
                  lower(trim(text)), '[ \t\n\r\f]+'), w -> w <> ''))
                  AS term
              FROM ({src})) GROUP BY term"""

    return f"""
        WITH ca AS ({counts(a_sql, 'a_w')}), cb AS ({counts(b_sql, 'b_w')}),
        merged AS (SELECT term,
                          CAST(COALESCE(a_w, 0) AS BIGINT) AS a_w,
                          CAST(COALESCE(b_w, 0) AS BIGINT) AS b_w
                   FROM ca FULL JOIN cb USING (term)),
        tot AS (SELECT CAST(SUM(a_w) AS BIGINT) AS tot_a,
                       CAST(SUM(b_w) AS BIGINT) AS tot_b FROM merged)
        SELECT term, a_w, b_w, {KEYNESS_Z_MICRO_SQL} AS z_micro
        FROM merged CROSS JOIN tot
        WHERE a_w + b_w >= {min_count}
        ORDER BY term"""
