"""Distributed statistical inference over corpus metrics
(beyond-reference data-card surface; companions to the drift/agreement
reports — q119's PSI says "the distributions differ", these say *how
confidently*: Welch's t for a mean shift between two slices, a
chi-square homogeneity statistic for categorical drift, Poisson
bootstrap for confidence intervals that never replicate the data, and
a rank-sum ROC AUC for any binary quality gate).

Cross-engine exactness contract (the corrstats.py idiom): every
aggregate that feeds a formula is an exact BIGINT (counts, sums,
sums-of-squares of integer metrics), the one float step per statistic
is a module-level SQL string shared verbatim with the DuckDB oracles,
and outputs are micro/ppm-quantized BIGINTs.  The bootstrap's Poisson
weights come from the portable salted-md5 bucket (split.py idiom), so
any ANSI engine with md5 replays the exact resample.

Scale shape: everything here is a single partial-agg groupBy pass —
no windows over row streams, no self-joins.  The bootstrap fans each
row out B times map-side (explode of a literal sequence) and its
shuffle carries B rows per upstream partition after map-side combine;
the AUC's only window runs over DISTINCT score bins (bounded by the
score quantization, not the corpus), the q167 WindowGroupLimit-style
"reduce before you shuffle" discipline.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window, functions as F

# ---------------------------------------------------------------------------
# Welch's t-test.  Inputs: exact BIGINT (n, sum, sum-of-squares) per
# slice; these two strings are the ONLY float arithmetic and are shared
# verbatim with the q188 oracle.  Sample variance via the computational
# identity v = (ss - s^2/n) / (n-1); Welch-Satterthwaite df.
_VA = "((ss_a - CAST(sum_a AS DOUBLE) * sum_a / n_a) / (n_a - 1))"
_VB = "((ss_b - CAST(sum_b AS DOUBLE) * sum_b / n_b) / (n_b - 1))"
_SE2 = f"({_VA} / n_a + {_VB} / n_b)"
# Degenerate-slice guard: with n < 2 on either side the variance (and
# under ANSI mode the round(Infinity) cast) is undefined — NULL out, in
# identical text on both engines.
_WELCH_GUARD = "CASE WHEN n_a < 2 OR n_b < 2 THEN NULL ELSE "
WELCH_T_MICRO_SQL = (
    _WELCH_GUARD +
    "CAST(round(1000000 * ((CAST(sum_a AS DOUBLE) / n_a"
    f" - CAST(sum_b AS DOUBLE) / n_b) / sqrt({_SE2}))) AS BIGINT) END")
WELCH_DF_MICRO_SQL = (
    _WELCH_GUARD +
    f"CAST(round(1000000 * ({_SE2} * {_SE2}"
    f" / (({_VA} / n_a) * ({_VA} / n_a) / (n_a - 1)"
    f"  + ({_VB} / n_b) * ({_VB} / n_b) / (n_b - 1)))) AS BIGINT) END")

# Chi-square cell contribution for a lang row with two snapshot counts
# (n0, n1) against totals (tot0, tot1): expected e_k = rowtot*tot_k/tot,
# contribution nano-quantized so the final per-statistic sum is an
# exact BIGINT sum (addition order cannot change it).
_E0 = "(CAST(n0 + n1 AS DOUBLE) * tot0 / (tot0 + tot1))"
_E1 = "(CAST(n0 + n1 AS DOUBLE) * tot1 / (tot0 + tot1))"
CHI2_NANO_SQL = (
    f"CAST(round(1000000000 * ((n0 - {_E0}) * (n0 - {_E0}) / {_E0}"
    f" + (n1 - {_E1}) * (n1 - {_E1}) / {_E1})) AS BIGINT)")
EXPECTED0_MICRO_SQL = f"CAST(round(1000000 * {_E0}) AS BIGINT)"

# Poisson(1) inverse-CDF thresholds on a uniform u in [0, 1e6): the
# cumulative e^-1 * sum 1/k! table, floor-quantized.  Shared with the
# q190 oracle as a CASE ladder over the portable md5 bucket.
POISSON1_THRESHOLDS = (367879, 735758, 919698, 981011, 996340,
                       999405, 999916, 999989)


def poisson1_case_sql(u_sql: str) -> str:
    """CASE ladder mapping a uniform-in-[0,1e6) SQL expression to a
    Poisson(1) draw — identical text runs on Spark and DuckDB."""
    parts = [f"WHEN {u_sql} < {t} THEN {k}"
             for k, t in enumerate(POISSON1_THRESHOLDS)]
    return "CASE " + " ".join(parts) + " ELSE 8 END"


# ---------------------------------------------------------------------------
# DuckDB oracle builders (the recrawl.py idiom): same aggregates, same
# shared formula strings, integer division spelled `//` (DuckDB) where
# the Spark side uses `DIV` — the float formulas above are byte-shared.

def welch_oracle_sql(table: str, metric_sql: str, flag_sql: str) -> str:
    return f"""
        WITH a AS (
          SELECT CAST(SUM(CASE WHEN {flag_sql} THEN 1 ELSE 0 END) AS BIGINT) AS n_a,
                 CAST(SUM(CASE WHEN {flag_sql} THEN 0 ELSE 1 END) AS BIGINT) AS n_b,
                 CAST(SUM(CASE WHEN {flag_sql} THEN {metric_sql} ELSE 0 END) AS BIGINT) AS sum_a,
                 CAST(SUM(CASE WHEN {flag_sql} THEN 0 ELSE {metric_sql} END) AS BIGINT) AS sum_b,
                 CAST(SUM(CASE WHEN {flag_sql} THEN {metric_sql} * {metric_sql} ELSE 0 END) AS BIGINT) AS ss_a,
                 CAST(SUM(CASE WHEN {flag_sql} THEN 0 ELSE {metric_sql} * {metric_sql} END) AS BIGINT) AS ss_b
          FROM {table})
        SELECT n_a, n_b, sum_a, sum_b,
               CAST(sum_a * 1000000 // nullif(n_a, 0) AS BIGINT) AS mean_a_micro,
               CAST(sum_b * 1000000 // nullif(n_b, 0) AS BIGINT) AS mean_b_micro,
               {WELCH_T_MICRO_SQL} AS t_micro,
               {WELCH_DF_MICRO_SQL} AS df_micro
        FROM a"""


def chi2_oracle_sql(table: str, cat_sql: str, half_sql: str) -> str:
    return f"""
        WITH cells AS (
          SELECT {cat_sql} AS cat,
                 CAST(SUM(CASE WHEN {half_sql} = 0 THEN 1 ELSE 0 END) AS BIGINT) AS n0,
                 CAST(SUM(CASE WHEN {half_sql} <> 0 THEN 1 ELSE 0 END) AS BIGINT) AS n1
          FROM {table} GROUP BY 1),
        tot AS (SELECT CAST(SUM(n0) AS BIGINT) AS tot0,
                       CAST(SUM(n1) AS BIGINT) AS tot1 FROM cells)
        SELECT cat, n0, n1,
               {EXPECTED0_MICRO_SQL} AS expected0_micro,
               {CHI2_NANO_SQL} AS chi2_nano
        FROM cells CROSS JOIN tot ORDER BY cat"""


def bootstrap_oracle_sql(table: str, id_sql: str, metric_sql: str,
                         n_resamples: int = 32, salt: str = "boot") -> str:
    u = (f"((('0x' || substr(md5('{salt}|' || CAST(b AS VARCHAR) || '|' ||"
         f" CAST({id_sql} AS VARCHAR)), 1, 15))::BIGINT) % 1000000)")
    return f"""
        WITH fan AS (
          SELECT b, {poisson1_case_sql(u)} AS w,
                 CAST({metric_sql} AS BIGINT) AS x
          FROM {table}
          CROSS JOIN (SELECT unnest(generate_series(0, {n_resamples - 1}))
                      AS b) bs),
        agg AS (
          SELECT b,
                 CAST(SUM(CASE WHEN w > 0 THEN 1 ELSE 0 END) AS BIGINT) AS n_eff,
                 CAST(SUM(w) AS BIGINT) AS w_sum,
                 CAST(SUM(w * x) AS BIGINT) AS wx_sum
          FROM fan GROUP BY b)
        SELECT CAST(b AS BIGINT) AS b, n_eff, w_sum, wx_sum,
               CAST(wx_sum * 1000000 // nullif(w_sum, 0) AS BIGINT) AS mean_micro
        FROM agg ORDER BY b"""


def auc_oracle_sql(table: str, score_sql: str, label_sql: str) -> str:
    return f"""
        WITH bins AS (
          SELECT {score_sql} AS score,
                 CAST(SUM(CASE WHEN {label_sql} THEN 1 ELSE 0 END) AS BIGINT) AS pos,
                 CAST(SUM(CASE WHEN {label_sql} THEN 0 ELSE 1 END) AS BIGINT) AS neg
          FROM {table} GROUP BY 1),
        ranked AS (
          SELECT pos, neg,
                 2 * (SUM(pos + neg) OVER (ORDER BY score) - pos - neg)
                 + pos + neg + 1 AS midrank2
          FROM bins),
        agg AS (
          SELECT CAST(SUM(pos) AS BIGINT) AS n_pos,
                 CAST(SUM(neg) AS BIGINT) AS n_neg,
                 CAST(SUM(pos * midrank2) AS BIGINT) AS s2
          FROM ranked)
        SELECT n_pos, n_neg, s2,
               CAST((s2 - n_pos * (n_pos + 1)) * 1000000
                    // nullif(2 * n_pos * n_neg, 0) AS BIGINT) AS auc_ppm
        FROM agg"""


def welch_ttest(df: DataFrame, metric_col: str, flag_col: str) -> DataFrame:
    """-> one row (n_a, n_b, sum_a, sum_b, mean_a_micro, mean_b_micro,
    t_micro, df_micro): Welch's unequal-variance t-test of the integer
    metric between the flag=true slice (a) and the rest (b).

    One conditional-aggregation pass (partial-agg groupBy on nothing);
    the metric must be integral so n/sum/ss stay exact BIGINTs.
    """
    x = F.col(metric_col).cast("long")
    a = F.col(flag_col)
    agg = df.agg(
        F.sum(F.when(a, 1).otherwise(0)).cast("long").alias("n_a"),
        F.sum(F.when(~a, 1).otherwise(0)).cast("long").alias("n_b"),
        F.sum(F.when(a, x).otherwise(0)).cast("long").alias("sum_a"),
        F.sum(F.when(~a, x).otherwise(0)).cast("long").alias("sum_b"),
        F.sum(F.when(a, x * x).otherwise(0)).cast("long").alias("ss_a"),
        F.sum(F.when(~a, x * x).otherwise(0)).cast("long").alias("ss_b"))
    return agg.select(
        "n_a", "n_b", "sum_a", "sum_b",
        F.expr("sum_a * 1000000 DIV nullif(n_a, 0)").alias("mean_a_micro"),
        F.expr("sum_b * 1000000 DIV nullif(n_b, 0)").alias("mean_b_micro"),
        F.expr(WELCH_T_MICRO_SQL).alias("t_micro"),
        F.expr(WELCH_DF_MICRO_SQL).alias("df_micro"))


def chi_square_drift(df: DataFrame, cat_col: str,
                     half_col: str) -> DataFrame:
    """-> per category (cat, n0, n1, expected0_micro, chi2_nano):
    chi-square homogeneity contributions of the categorical column
    between two snapshot halves (half_col: 0/1).  The statistic is
    ``sum(chi2_nano)`` — an exact BIGINT sum over categories, so the
    total is reduction-order-proof; dof = n_categories - 1.

    Two partial-agg groupBys (per-cat counts, then the 1-row totals
    broadcast back with a cross join); no windows.
    """
    cells = (df.groupBy(F.col(cat_col).alias("cat"))
             .agg(F.sum(F.when(F.col(half_col) == 0, 1).otherwise(0))
                  .cast("long").alias("n0"),
                  F.sum(F.when(F.col(half_col) != 0, 1).otherwise(0))
                  .cast("long").alias("n1")))
    totals = cells.agg(F.sum("n0").cast("long").alias("tot0"),
                       F.sum("n1").cast("long").alias("tot1"))
    return (cells.crossJoin(F.broadcast(totals))
            .select("cat", "n0", "n1",
                    F.expr(EXPECTED0_MICRO_SQL).alias("expected0_micro"),
                    F.expr(CHI2_NANO_SQL).alias("chi2_nano")))


def poisson_bootstrap_mean(df: DataFrame, id_col: str, metric_col: str,
                           n_resamples: int = 32,
                           salt: str = "boot") -> DataFrame:
    """-> per resample (b, n_eff, w_sum, wx_sum, mean_micro): Poisson
    bootstrap of the metric's mean — the web-scale bootstrap (Chamandy
    et al.): instead of materializing B resampled copies, each row
    draws an independent Poisson(1) weight per resample from the
    portable salted-md5 uniform, so resamples are computed in ONE scan
    and any engine replays them bit-identically.

    mean_micro is the exact integer ratio wx_sum*1e6 DIV w_sum; the
    caller reads a CI off the B per-resample means (B is tiny).
    Scale shape: explode of a B-element literal sequence (map-side
    fan-out), one groupBy(b) with map-side combine — the shuffle
    carries B rows per upstream partition.
    """
    u_sql = (f"CAST(conv(substring(md5(concat('{salt}|', CAST(b AS STRING),"
             f" '|', CAST({id_col} AS STRING))), 1, 15), 16, 10) AS BIGINT)"
             " % 1000000")
    w_sql = poisson1_case_sql(u_sql)
    x = F.col(metric_col).cast("long")
    fanned = (df.select(F.col(id_col), x.alias("x"))
              .select("*", F.explode(F.sequence(
                  F.lit(0), F.lit(n_resamples - 1))).alias("b"))
              .withColumn("w", F.expr(w_sql).cast("long")))
    agg = (fanned.groupBy("b")
           .agg(F.sum(F.when(F.col("w") > 0, 1).otherwise(0))
                .cast("long").alias("n_eff"),
                F.sum("w").cast("long").alias("w_sum"),
                F.sum(F.col("w") * F.col("x")).cast("long").alias("wx_sum")))
    return (agg.withColumn(
        "mean_micro", F.expr("wx_sum * 1000000 DIV nullif(w_sum, 0)"))
        .select(F.col("b").cast("long").alias("b"), "n_eff", "w_sum",
                "wx_sum", "mean_micro"))


def binned_auc(df: DataFrame, score_col: str, label_col: str) -> DataFrame:
    """-> one row (n_pos, n_neg, s2, auc_ppm): exact ROC AUC of the
    integer score for the boolean label via the tie-aware rank-sum
    (Mann-Whitney) identity on score bins —

        AUC = (S2 - n_pos*(n_pos+1)) / (2 * n_pos * n_neg)

    where S2 = sum over positives of 2*midrank and midrank2 for a bin
    is 2*cum_count_below + count + 1.  ENTIRELY integer arithmetic —
    no float anywhere, so the ppm value is reduction-order- and
    engine-proof.

    Scale shape: one partial-agg groupBy(score) first (the corpus
    reduces to its distinct score bins before anything wide), then one
    window over those BINS ordered by score — bounded by the score
    quantization, not the row count.
    """
    bins = (df.groupBy(F.col(score_col).cast("long").alias("score"))
            .agg(F.sum(F.when(F.col(label_col), 1).otherwise(0))
                 .cast("long").alias("pos"),
                 F.sum(F.when(~F.col(label_col), 1).otherwise(0))
                 .cast("long").alias("neg")))
    w = Window.orderBy("score").rowsBetween(
        Window.unboundedPreceding, Window.currentRow)
    ranked = bins.select(
        "score", "pos", "neg",
        (2 * (F.sum(F.col("pos") + F.col("neg")).over(w)
              - F.col("pos") - F.col("neg"))
         + F.col("pos") + F.col("neg") + 1).alias("midrank2"))
    return (ranked.agg(
        F.sum("pos").cast("long").alias("n_pos"),
        F.sum("neg").cast("long").alias("n_neg"),
        F.sum(F.col("pos") * F.col("midrank2")).cast("long").alias("s2"))
        .select("n_pos", "n_neg", "s2",
                F.expr("(s2 - n_pos * (n_pos + 1)) * 1000000"
                       " DIV nullif(2 * n_pos * n_neg, 0)").alias("auc_ppm")))
