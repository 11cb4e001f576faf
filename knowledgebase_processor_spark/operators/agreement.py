"""Inter-rater agreement (Cohen's kappa) and calibration (reliability
bins / ECE) for label-quality audits (beyond-reference; SURVEY.md §2
round-2 surface — the evaluation-metrics family closing the loop on
operators/classifier.py and the q112 quality ensemble).

Curation pipelines label at scale with cheap rules/models and audit
them against each other or against a gold slice:

* ``cohen_kappa`` — chance-corrected agreement of two binary raters
  (Cohen 1960, public).  Everything is EXACT INTEGER arithmetic on the
  2x2 contingency counts: with n = total, a1/b1 the raters' positive
  marginals, kappa = (n*(n11+n00) - (a1*b1 + a0*b0))
  / (n^2 - (a1*b1 + a0*b0)) — numerator and denominator are emitted as
  BIGINTs (the value-checked payload) and only the final display ratio
  is a float.  One partial-agg pass; no shuffle wider than 4 counts.

* ``calibration_report`` — reliability diagram + expected calibration
  error.  Scores become probabilities by exact rank transform
  (rank.py::global_rank — distributed, no single-partition window):
  p_ppm = (rank-1) * 1e6 DIV (n-1).  Per decile bin the report carries
  (n, sum_p_ppm, n_pos, gap_abs = |sum_p_ppm - n_pos*1e6|) — all exact
  BIGINTs — and ECE_ppm = sum(gap_abs) DIV n, because
  (n_b/n)*|avg_p - pos_rate| = |sum_p - n_pos*1e6| / n.  The usual
  float-ECE pitfall (order-dependent double sums) never appears.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

from .rank import global_rank

SCALE = 1_000_000


def cohen_kappa(df: DataFrame, a_col: str, b_col: str) -> DataFrame:
    """Two boolean columns -> one row: (n11, n10, n01, n00, po_ppm,
    kappa_num, kappa_den, kappa)."""
    a = F.col(a_col).cast("boolean")
    b = F.col(b_col).cast("boolean")
    cnt = df.agg(
        F.sum(F.when(a & b, 1).otherwise(0)).cast("long").alias("n11"),
        F.sum(F.when(a & ~b, 1).otherwise(0)).cast("long").alias("n10"),
        F.sum(F.when(~a & b, 1).otherwise(0)).cast("long").alias("n01"),
        F.sum(F.when(~a & ~b, 1).otherwise(0)).cast("long").alias("n00"))
    num = ("(n11 + n10 + n01 + n00) * (n11 + n00)"
           " - ((n11 + n10) * (n11 + n01) + (n01 + n00) * (n10 + n00))")
    den = ("(n11 + n10 + n01 + n00) * (n11 + n10 + n01 + n00)"
           " - ((n11 + n10) * (n11 + n01) + (n01 + n00) * (n10 + n00))")
    return cnt.selectExpr(
        "n11", "n10", "n01", "n00",
        f"(n11 + n00) * {SCALE} DIV (n11 + n10 + n01 + n00) AS po_ppm",
        f"{num} AS kappa_num",
        f"{den} AS kappa_den",
        # exact integer milli-kappa (truncating DIV, identical in any
        # ANSI engine) — no float rounding anywhere in the row
        f"CAST(({num}) * 1000 DIV ({den}) AS BIGINT) AS kappa_milli")


def kappa_oracle_sql(rows_sql: str, a_sql: str, b_sql: str) -> str:
    """EXACT ANSI replay of :func:`cohen_kappa` for DuckDB;
    ``a_sql``/``b_sql`` are boolean expressions over ``rows_sql``."""
    return f"""
        WITH r AS (SELECT ({a_sql}) AS a, ({b_sql}) AS b
                   FROM ({rows_sql})),
        c AS (
          SELECT SUM(CASE WHEN a AND b THEN 1 ELSE 0 END)::BIGINT AS n11,
                 SUM(CASE WHEN a AND NOT b THEN 1 ELSE 0 END)::BIGINT
                   AS n10,
                 SUM(CASE WHEN NOT a AND b THEN 1 ELSE 0 END)::BIGINT
                   AS n01,
                 SUM(CASE WHEN NOT a AND NOT b THEN 1 ELSE 0 END)::BIGINT
                   AS n00
          FROM r)
        SELECT n11, n10, n01, n00,
               (n11 + n00) * {SCALE} // (n11 + n10 + n01 + n00) AS po_ppm,
               (n11 + n10 + n01 + n00) * (n11 + n00)
                 - ((n11 + n10) * (n11 + n01) + (n01 + n00) * (n10 + n00))
                 AS kappa_num,
               (n11 + n10 + n01 + n00) * (n11 + n10 + n01 + n00)
                 - ((n11 + n10) * (n11 + n01) + (n01 + n00) * (n10 + n00))
                 AS kappa_den,
               (((n11 + n10 + n01 + n00) * (n11 + n00)
                 - ((n11 + n10) * (n11 + n01) + (n01 + n00) * (n10 + n00)))
                * 1000
                // ((n11 + n10 + n01 + n00) * (n11 + n10 + n01 + n00)
                 - ((n11 + n10) * (n11 + n01) + (n01 + n00) * (n10 + n00)))
                )::BIGINT AS kappa_milli
        FROM c"""


def classification_report(df: DataFrame, truth_col: str,
                          pred_col: str) -> DataFrame:
    """Multi-class confusion summary: one row per class
    (class, tp, fp, fn, support, prec_ppm, rec_ppm, f1_ppm) + a
    ``class = '<micro>'`` row with the micro-averaged totals.

    Everything is exact BIGINT: prec = tp·1e6 DIV (tp+fp),
    rec = tp·1e6 DIV (tp+fn), f1 = 2·tp·1e6 DIV (2·tp+fp+fn) — the
    harmonic mean collapses to one integer division, so there is no
    float anywhere (the usual 2·p·r/(p+r) double-rounding never
    appears).  Scale shape: ONE partial-agg groupBy over (truth, pred)
    cells, then two tiny groupBys over the C^2-at-most cell frame."""
    cells = (df.groupBy(F.col(truth_col).alias("t"),
                        F.col(pred_col).alias("p"))
             .agg(F.count(F.lit(1)).cast("long").alias("c")))
    tp = (cells.filter(F.col("t") == F.col("p"))
          .select(F.col("t").alias("cls"), F.col("c").alias("tp")))
    support = cells.groupBy(F.col("t").alias("cls")).agg(
        F.sum("c").cast("long").alias("support"))
    predicted = cells.groupBy(F.col("p").alias("cls")).agg(
        F.sum("c").cast("long").alias("predicted"))
    per = (support.join(predicted, "cls", "full")
           .join(tp, "cls", "left")
           .na.fill({"tp": 0, "support": 0, "predicted": 0})
           .select(F.col("cls").cast("string").alias("class"),
                   F.col("tp").cast("long").alias("tp"),
                   (F.col("predicted") - F.col("tp")).cast("long")
                   .alias("fp"),
                   (F.col("support") - F.col("tp")).cast("long")
                   .alias("fn"),
                   F.col("support").cast("long").alias("support")))
    micro = per.agg(F.lit("<micro>").alias("class"),
                    F.sum("tp").cast("long").alias("tp"),
                    F.sum("fp").cast("long").alias("fp"),
                    F.sum("fn").cast("long").alias("fn"),
                    F.sum("support").cast("long").alias("support"))
    return per.unionByName(micro).selectExpr(
        "class", "tp", "fp", "fn", "support",
        f"CASE WHEN tp + fp > 0 THEN tp * {SCALE} DIV (tp + fp) END"
        " AS prec_ppm",
        f"CASE WHEN tp + fn > 0 THEN tp * {SCALE} DIV (tp + fn) END"
        " AS rec_ppm",
        f"CASE WHEN 2 * tp + fp + fn > 0"
        f" THEN 2 * tp * {SCALE} DIV (2 * tp + fp + fn) END AS f1_ppm")


def classification_oracle_sql(rows_sql: str) -> str:
    """EXACT ANSI replay of :func:`classification_report` for DuckDB;
    ``rows_sql`` must select (t, p)."""
    return f"""
        WITH cells AS (
          SELECT t, p, COUNT(*)::BIGINT AS c
          FROM ({rows_sql}) GROUP BY t, p),
        sup AS (SELECT t AS cls, SUM(c)::BIGINT AS support
                FROM cells GROUP BY t),
        prd AS (SELECT p AS cls, SUM(c)::BIGINT AS predicted
                FROM cells GROUP BY p),
        tpc AS (SELECT t AS cls, c AS tp FROM cells WHERE t = p),
        per AS (
          SELECT COALESCE(s.cls, pr.cls)::VARCHAR AS class,
                 COALESCE(tp, 0)::BIGINT AS tp,
                 (COALESCE(predicted, 0) - COALESCE(tp, 0))::BIGINT AS fp,
                 (COALESCE(support, 0) - COALESCE(tp, 0))::BIGINT AS fn,
                 COALESCE(support, 0)::BIGINT AS support
          FROM sup s
          FULL JOIN prd pr ON s.cls = pr.cls
          LEFT JOIN tpc ON COALESCE(s.cls, pr.cls) = tpc.cls),
        allrows AS (
          SELECT * FROM per
          UNION ALL
          SELECT '<micro>', SUM(tp)::BIGINT, SUM(fp)::BIGINT,
                 SUM(fn)::BIGINT, SUM(support)::BIGINT FROM per)
        SELECT class, tp, fp, fn, support,
               CASE WHEN tp + fp > 0
                    THEN (tp * {SCALE} // (tp + fp))::BIGINT END
                 AS prec_ppm,
               CASE WHEN tp + fn > 0
                    THEN (tp * {SCALE} // (tp + fn))::BIGINT END
                 AS rec_ppm,
               CASE WHEN 2 * tp + fp + fn > 0
                    THEN (2 * tp * {SCALE} // (2 * tp + fp + fn))::BIGINT
                 END AS f1_ppm
        FROM allrows"""


def calibration_report(df: DataFrame, score_col: str, label_col: str,
                       id_col: str, n_bins: int = 10) -> DataFrame:
    """Reliability bins over the rank-transformed score, plus a
    ``bin = -1`` summary row carrying ECE_ppm in ``gap_abs``.
    Columns: (bin, n, sum_p_ppm, n_pos, gap_abs)."""
    ranked = global_rank(
        df.select(F.col(id_col).alias("rid"),
                  F.col(score_col).alias("s"),
                  F.col(label_col).cast("boolean").alias("y")),
        ["s", "rid"], rank_col="__r")
    total = ranked.count()
    denom = max(total - 1, 1)
    p = F.expr(f"(__r - 1) * {SCALE} DIV {denom}")
    binned = ranked.withColumn("p_ppm", p.cast("long")).withColumn(
        "bin", F.least(F.expr(f"p_ppm * {n_bins} DIV {SCALE}"),
                       F.lit(n_bins - 1)).cast("long"))
    per_bin = (binned.groupBy("bin")
               .agg(F.count(F.lit(1)).cast("long").alias("n"),
                    F.sum("p_ppm").cast("long").alias("sum_p_ppm"),
                    F.sum(F.when(F.col("y"), 1).otherwise(0))
                    .cast("long").alias("n_pos"))
               .withColumn("gap_abs",
                           F.abs(F.col("sum_p_ppm")
                                 - F.col("n_pos") * SCALE).cast("long")))
    ece = per_bin.agg(
        F.lit(-1).cast("long").alias("bin"),
        F.sum("n").cast("long").alias("n"),
        F.sum("sum_p_ppm").cast("long").alias("sum_p_ppm"),
        F.sum("n_pos").cast("long").alias("n_pos"),
        F.expr(f"CAST(SUM(gap_abs) DIV {total} AS BIGINT)")
        .alias("gap_abs"))
    return per_bin.unionByName(ece)


def calibration_oracle_sql(rows_sql: str, n_bins: int = 10) -> str:
    """EXACT ANSI replay of :func:`calibration_report` for DuckDB.
    ``rows_sql`` must select (rid, s, y:boolean)."""
    return f"""
        WITH r AS (
          SELECT rid, y,
                 row_number() OVER (ORDER BY s, rid) AS rk,
                 COUNT(*) OVER () AS n_total
          FROM ({rows_sql})),
        b AS (
          SELECT rid, y, n_total,
                 (rk - 1) * {SCALE}
                   // GREATEST(n_total - 1, 1) AS p_ppm
          FROM r),
        binned AS (
          SELECT *, LEAST(p_ppm * {n_bins} // {SCALE},
                          {n_bins - 1})::BIGINT AS bin
          FROM b),
        per_bin AS (
          SELECT bin, COUNT(*)::BIGINT AS n,
                 SUM(p_ppm)::BIGINT AS sum_p_ppm,
                 SUM(CASE WHEN y THEN 1 ELSE 0 END)::BIGINT AS n_pos,
                 abs(SUM(p_ppm) - SUM(CASE WHEN y THEN 1 ELSE 0 END)
                     * {SCALE})::BIGINT AS gap_abs,
                 MAX(n_total) AS n_total
          FROM binned GROUP BY bin)
        SELECT bin, n, sum_p_ppm, n_pos, gap_abs FROM per_bin
        UNION ALL
        SELECT -1::BIGINT, SUM(n)::BIGINT, SUM(sum_p_ppm)::BIGINT,
               SUM(n_pos)::BIGINT,
               (SUM(gap_abs) // MAX(n_total))::BIGINT
        FROM per_bin"""


# --------------------------------------------------------------------------
# Murphy decomposition of the Brier score (the q130 calibration
# report's missing summary: BS = reliability - resolution +
# uncertainty.  Reliability (how far bin confidence sits from bin
# accuracy) is what recalibration can remove; resolution (how much
# the bins separate outcomes) is the score's real discriminative
# value; uncertainty is the base-rate floor no model can beat.  One
# triple says whether to recalibrate or retrain).
#
# Exactness: with ppm integer scores, per-bin sums are exact BIGINTs;
# each component is a nano-quantized per-bin contribution summed as
# integers (order-proof), the corrstats.py discipline.

BRIER_REL_NANO_SQL = (
    "CAST(round(1000000000.0 * n_b * (CAST(sum_p AS DOUBLE) / n_b / 1000000"
    " - CAST(sum_y AS DOUBLE) / n_b) * (CAST(sum_p AS DOUBLE) / n_b"
    " / 1000000 - CAST(sum_y AS DOUBLE) / n_b)) AS BIGINT)")
BRIER_RES_NANO_SQL = (
    "CAST(round(1000000000.0 * n_b * (CAST(sum_y AS DOUBLE) / n_b"
    " - CAST(y_tot AS DOUBLE) / n_tot) * (CAST(sum_y AS DOUBLE) / n_b"
    " - CAST(y_tot AS DOUBLE) / n_tot)) AS BIGINT)")


def brier_decomposition(df: DataFrame, score_col: str, label_col: str,
                        n_bins: int = 10) -> DataFrame:
    """-> one row (n, n_bins_used, reliability_nano, resolution_nano,
    uncertainty_nano): Murphy decomposition over equal-width bins of
    the ppm score (0..1e6).  *_nano values are per-row averages
    scaled 1e9 (so BS_nano ~= rel - res + unc)."""
    b = F.least(F.lit(n_bins - 1),
                F.expr(f"CAST({score_col} * {n_bins} DIV 1000001"
                       " AS INT)"))
    bins = (df.select(b.alias("bin"),
                      F.col(score_col).cast("long").alias("p"),
                      F.when(F.col(label_col), 1).otherwise(0)
                      .cast("long").alias("y"))
            .groupBy("bin")
            .agg(F.count(F.lit(1)).cast("long").alias("n_b"),
                 F.sum("p").cast("long").alias("sum_p"),
                 F.sum("y").cast("long").alias("sum_y")))
    tot = bins.agg(F.sum("n_b").cast("long").alias("n_tot"),
                   F.sum("sum_y").cast("long").alias("y_tot"))
    cells = (bins.crossJoin(F.broadcast(tot))
             .select("n_b",
                     F.expr(BRIER_REL_NANO_SQL).alias("rel"),
                     F.expr(BRIER_RES_NANO_SQL).alias("res")))
    agg = cells.agg(F.count(F.lit(1)).cast("long").alias("n_bins_used"),
                    F.sum("rel").cast("long").alias("rel_sum"),
                    F.sum("res").cast("long").alias("res_sum"))
    return (agg.crossJoin(F.broadcast(tot))
            .selectExpr(
                "n_tot AS n", "n_bins_used",
                "CAST(rel_sum DIV nullif(n_tot, 0) AS BIGINT)"
                " AS reliability_nano",
                "CAST(res_sum DIV nullif(n_tot, 0) AS BIGINT)"
                " AS resolution_nano",
                "CAST(round(1000000000.0 * (CAST(y_tot AS DOUBLE)"
                " / n_tot) * (1.0 - CAST(y_tot AS DOUBLE) / n_tot))"
                " AS BIGINT) AS uncertainty_nano"))


def brier_oracle_sql(rows_sql: str, n_bins: int = 10) -> str:
    """DuckDB replay; ``rows_sql`` selects (p ppm BIGINT, y boolean)."""
    return f"""
        WITH rows_ AS ({rows_sql}),
        bins AS (SELECT least({n_bins - 1},
                              CAST(p * {n_bins} // 1000001 AS INT))
                            AS bin,
                        CAST(COUNT(*) AS BIGINT) AS n_b,
                        CAST(SUM(p) AS BIGINT) AS sum_p,
                        CAST(SUM(CASE WHEN y THEN 1 ELSE 0 END)
                             AS BIGINT) AS sum_y
                 FROM rows_ GROUP BY 1),
        tot AS (SELECT CAST(SUM(n_b) AS BIGINT) AS n_tot,
                       CAST(SUM(sum_y) AS BIGINT) AS y_tot FROM bins),
        cells AS (SELECT n_b, {BRIER_REL_NANO_SQL} AS rel,
                         {BRIER_RES_NANO_SQL} AS res
                  FROM bins CROSS JOIN tot),
        agg AS (SELECT CAST(COUNT(*) AS BIGINT) AS n_bins_used,
                       CAST(SUM(rel) AS BIGINT) AS rel_sum,
                       CAST(SUM(res) AS BIGINT) AS res_sum FROM cells)
        SELECT n_tot AS n, n_bins_used,
               CAST(rel_sum // nullif(n_tot, 0) AS BIGINT)
                   AS reliability_nano,
               CAST(res_sum // nullif(n_tot, 0) AS BIGINT)
                   AS resolution_nano,
               CAST(round(1000000000.0 * (CAST(y_tot AS DOUBLE) / n_tot)
                    * (1.0 - CAST(y_tot AS DOUBLE) / n_tot)) AS BIGINT)
                   AS uncertainty_nano
        FROM agg CROSS JOIN tot"""
