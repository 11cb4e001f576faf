"""Population-stability-index (PSI) corpus drift report (beyond-reference;
SURVEY.md §2 round-2 surface — the release-gate companion to the
q100 data card and q60 snapshot delta).

A training-data pipeline re-crawls and re-filters continuously; before a
new corpus snapshot replaces the old one, the release gate asks *did the
distribution move?* — per language, per source, per length band.  PSI is
the standard drift statistic (credit-scoring literature; public):

    PSI(f) = sum over bins b of (p_b - q_b) * ln(p_b / q_b)

with ``p`` = the bin share in the NEW snapshot and ``q`` = in the OLD,
Laplace-smoothed so empty bins stay finite.  Rule-of-thumb thresholds:
< 0.1 stable, 0.1-0.25 moderate shift, > 0.25 action required.

Spark-first, cross-engine-exact design:

* ONE pass over the union of both snapshots: every feature's bin
  expression is evaluated in the same projection (a ``stack`` unpivot —
  pure codegen, no UDF, no per-feature re-scan), then a single
  partial-aggregatable groupBy(feature, bin) counts both snapshots via
  conditional sums.  At 100 TB this is one scan + one exchange whose
  payload is O(features x bins) rows, i.e. nothing.
* Feature bin expressions are ANSI SQL TEXT shared verbatim with the
  DuckDB oracle (the hll_rho_sql idiom from sketches.py), so the
  binning formula cannot drift between engines.
* The only float step is one ``ln`` + one multiply per BIN, quantized
  to micro-nats (``CAST(round(1e6 * term) AS BIGINT)`` — the
  decontaminate.py / bm25.py idf precedent); the per-FEATURE total is
  then an EXACT BIGINT sum of those terms, so it is aggregation-order
  independent and any engine replays it bit-identically.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

SCALE = 1_000_000

# Default feature set for the documents table: (name, ANSI bin expression).
# chars_band: 400-char fixed-width bands capped at band 9 — FLOOR over an
# exact-dividend double ratio, never engine-dependent integer division.
DOC_FEATURES: list[tuple[str, str]] = [
    ("lang", "lang"),
    ("source", "source"),
    ("chars_band",
     "CAST(CAST(LEAST(FLOOR(n_chars / 400.0), 9) AS BIGINT) AS STRING)"),
]


def _psi_term_sql(p: str, q: str) -> str:
    """Micro-nat PSI contribution of one bin, shared Spark/DuckDB."""
    return (f"CAST(round({SCALE} * ({p} - {q}) * ln(({p}) / ({q}))) "
            "AS BIGINT)")


def psi_report(old: DataFrame, new: DataFrame,
               features: list[tuple[str, str]] | None = None) -> DataFrame:
    """(old snapshot, new snapshot) -> one row per (feature, bin) with
    smoothed shares and the micro-nat PSI term, plus one ``bin='*'``
    summary row per feature whose ``psi_micro`` is the exact BIGINT sum
    of its bin terms.

    Columns: feature, bin, c_old, c_new, p_old_ppm, p_new_ppm,
    psi_micro.  Shares are also surfaced as exact parts-per-million
    BIGINTs (``count * SCALE DIV total`` — integer division) so the
    report itself is fixed-point end-to-end except inside the ln.
    """
    features = features or DOC_FEATURES
    stack = ", ".join(f"'{name}', CAST(({expr}) AS STRING)"
                      for name, expr in features)
    unpivot = (f"stack({len(features)}, {stack}) AS (feature, bin)")

    rows = (old.withColumn("snap", F.lit("old"))
            .unionByName(new.withColumn("snap", F.lit("new")))
            .selectExpr("snap", unpivot)
            .withColumn("bin", F.coalesce(F.col("bin"), F.lit("<null>"))))
    counts = rows.groupBy("feature", "bin").agg(
        F.sum(F.when(F.col("snap") == "old", 1).otherwise(0))
         .cast("long").alias("c_old"),
        F.sum(F.when(F.col("snap") == "new", 1).otherwise(0))
         .cast("long").alias("c_new"))
    totals = counts.groupBy("feature").agg(
        F.sum("c_old").cast("long").alias("n_old"),
        F.sum("c_new").cast("long").alias("n_new"),
        F.count(F.lit(1)).cast("long").alias("n_bins"))

    # Laplace smoothing: (c + 1) / (n + n_bins); exact-dividend doubles.
    p = "((c_new + 1) / CAST(n_new + n_bins AS DOUBLE))"
    q = "((c_old + 1) / CAST(n_old + n_bins AS DOUBLE))"
    per_bin = (counts.join(F.broadcast(totals), "feature")
               .selectExpr(
                   "feature", "bin", "c_old", "c_new",
                   f"CAST((c_old + 1) * {SCALE} DIV (n_old + n_bins) "
                   "AS BIGINT) AS p_old_ppm",
                   f"CAST((c_new + 1) * {SCALE} DIV (n_new + n_bins) "
                   "AS BIGINT) AS p_new_ppm",
                   f"{_psi_term_sql(p, q)} AS psi_micro"))
    summary = per_bin.groupBy("feature").agg(
        F.lit("*").alias("bin"),
        F.sum("c_old").cast("long").alias("c_old"),
        F.sum("c_new").cast("long").alias("c_new"),
        F.lit(SCALE).cast("long").alias("p_old_ppm"),
        F.lit(SCALE).cast("long").alias("p_new_ppm"),
        F.sum("psi_micro").cast("long").alias("psi_micro"))
    return per_bin.unionByName(summary)


def entropy_report(df: DataFrame, group_col: str,
                   value_col: str) -> DataFrame:
    """Shannon entropy of the ``value_col`` distribution within each
    group — the balance diagnostic behind corpus-mix dashboards ("how
    language-diverse is each source?").  Same exactness contract as
    :func:`psi_report`: one ln per observed (group, value) bin
    quantized to micro-nats, then EXACT BIGINT sums per group.

    Returns (group, n, n_bins, entropy_micro, balance): ``balance`` is
    the normalized entropy H / ln(n_bins) in [0, 1] (NULL for a single
    bin), the scale-free number to alert on.
    """
    counts = (df.select(F.col(group_col).alias("grp"),
                        F.coalesce(F.col(value_col).cast("string"),
                                   F.lit("<null>")).alias("bin"))
              .groupBy("grp", "bin")
              .agg(F.count(F.lit(1)).cast("long").alias("c")))
    totals = counts.groupBy("grp").agg(
        F.sum("c").cast("long").alias("n"),
        F.count(F.lit(1)).cast("long").alias("n_bins"))
    term = (f"CAST(round({SCALE} * (c / CAST(n AS DOUBLE)) "
            "* ln(CAST(n AS DOUBLE) / c)) AS BIGINT)")
    return (counts.join(F.broadcast(totals), "grp")
            .selectExpr("grp", "n", "n_bins", f"{term} AS t")
            .groupBy("grp", "n", "n_bins")
            .agg(F.sum("t").cast("long").alias("entropy_micro"))
            .withColumn(
                "balance",
                F.when(F.col("n_bins") > 1,
                       F.round(F.col("entropy_micro")
                               / (F.lit(float(SCALE))
                                  * F.log(F.col("n_bins")
                                          .cast("double"))), 6)))
            .select(F.col("grp").alias(group_col), "n", "n_bins",
                    "entropy_micro", "balance"))


def entropy_oracle_sql(rows_sql: str, group_col: str,
                       value_col: str) -> str:
    """EXACT ANSI replay of :func:`entropy_report` for DuckDB."""
    term = (f"CAST(round({SCALE} * (c / CAST(n AS DOUBLE)) "
            "* ln(CAST(n AS DOUBLE) / c)) AS BIGINT)")
    return f"""
        WITH rows_ AS ({rows_sql}),
        counts AS (
          SELECT {group_col} AS grp,
                 COALESCE(CAST({value_col} AS VARCHAR), '<null>') AS bin,
                 COUNT(*)::BIGINT AS c
          FROM rows_ GROUP BY 1, 2),
        totals AS (
          SELECT grp, SUM(c)::BIGINT AS n, COUNT(*)::BIGINT AS n_bins
          FROM counts GROUP BY grp),
        terms AS (
          SELECT grp, n, n_bins, {term} AS t
          FROM counts JOIN totals USING (grp))
        SELECT grp AS {group_col}, n, n_bins,
               SUM(t)::BIGINT AS entropy_micro,
               CASE WHEN n_bins > 1 THEN
                 round(SUM(t) / ({float(SCALE)!r} * ln(n_bins::DOUBLE)), 6)
               END AS balance
        FROM terms GROUP BY grp, n, n_bins"""


def psi_oracle_sql(old_sql: str, new_sql: str,
                   features: list[tuple[str, str]] | None = None) -> str:
    """EXACT ANSI replay of :func:`psi_report` for DuckDB value-checking.
    ``old_sql``/``new_sql`` select the snapshot rows with the feature
    source columns in scope."""
    features = features or DOC_FEATURES
    unions = []
    for name, expr in features:
        for snap, src in (("old", old_sql), ("new", new_sql)):
            unions.append(
                f"SELECT '{name}' AS feature, "
                f"COALESCE(CAST(({expr}) AS VARCHAR), '<null>') AS bin, "
                f"'{snap}' AS snap FROM ({src})")
    rows = "\nUNION ALL\n".join(unions)
    p = "((c_new + 1) / CAST(n_new + n_bins AS DOUBLE))"
    q = "((c_old + 1) / CAST(n_old + n_bins AS DOUBLE))"
    return f"""
        WITH rows_ AS ({rows}),
        counts AS (
          SELECT feature, bin,
                 SUM(CASE WHEN snap = 'old' THEN 1 ELSE 0 END)::BIGINT
                   AS c_old,
                 SUM(CASE WHEN snap = 'new' THEN 1 ELSE 0 END)::BIGINT
                   AS c_new
          FROM rows_ GROUP BY feature, bin),
        totals AS (
          SELECT feature, SUM(c_old)::BIGINT AS n_old,
                 SUM(c_new)::BIGINT AS n_new,
                 COUNT(*)::BIGINT AS n_bins
          FROM counts GROUP BY feature),
        per_bin AS (
          SELECT feature, bin, c_old, c_new,
                 ((c_old + 1) * {SCALE} // (n_old + n_bins))::BIGINT
                   AS p_old_ppm,
                 ((c_new + 1) * {SCALE} // (n_new + n_bins))::BIGINT
                   AS p_new_ppm,
                 {_psi_term_sql(p, q)} AS psi_micro
          FROM counts JOIN totals USING (feature)),
        summary AS (
          SELECT feature, '*' AS bin, SUM(c_old)::BIGINT AS c_old,
                 SUM(c_new)::BIGINT AS c_new,
                 {SCALE}::BIGINT AS p_old_ppm, {SCALE}::BIGINT AS p_new_ppm,
                 SUM(psi_micro)::BIGINT AS psi_micro
          FROM per_bin GROUP BY feature)
        SELECT * FROM per_bin UNION ALL SELECT * FROM summary"""
