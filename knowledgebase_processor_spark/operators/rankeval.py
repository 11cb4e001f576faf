"""Ranked-retrieval evaluation: precision/recall@k and nDCG@k over a
run + qrels pair (beyond-reference surface; the eval twin of the q95
BM25 / q96 phrase-search / q84 RRF retrieval operators — TREC
`trec_eval` semantics, re-expressed Spark-first).

Inputs follow the TREC shapes every IR toolkit shares (public):

* ``run``   — (query_id, doc_id, score): the system output, at most one
  row per (query, doc); rank is derived INSIDE the operator as
  ``row_number`` by (score desc, doc_id) so ties are deterministic and
  any engine replays them.
* ``qrels`` — (query_id, doc_id, rel): graded relevance, rel >= 1
  relevant (rel 0 rows are ignored, as trec_eval does).

Cross-engine exactness contract (the drift.py / bm25.py idiom): the
single float step — one ``log2`` per (hit, k) — is quantized to
micro-units via SQL TEXT shared verbatim with the DuckDB oracle
(:data:`DCG_TERM_SQL`); every aggregate on top is an exact BIGINT sum,
and the final ratios are integer ppm divisions.  nDCG here is therefore
"nDCG of the micro-quantized gains": bit-identical everywhere, within
1e-6 of the float definition.

Scale shape: run lists are bounded per query (a retrieval system
returns top-N), so the two ``row_number`` windows partition by
query_id over short lists — no global sort, no skew risk beyond a
degenerate single query; per-(query, k) metrics come from ONE
partial-agg groupBy after a k fan-out of the hit rows (|ks| copies of
only the HIT rows, not the corpus); the summary macro-average is a
second tiny aggregation.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window, functions as F

SCALE = 1_000_000

# Micro-quantized DCG gain of one hit at 1-based `rank` with graded
# `rel` — shared verbatim with the DuckDB oracle so the discounting
# formula cannot drift between engines.
DCG_TERM_SQL = ("CAST(round({scale} * CAST({rel} AS DOUBLE) "
                "/ log2({rank} + 1)) AS BIGINT)")


def _dcg_term(rel: str, rank: str) -> str:
    return DCG_TERM_SQL.format(scale=SCALE, rel=rel, rank=rank)


def retrieval_report(run: DataFrame, qrels: DataFrame,
                     ks: tuple[int, ...] = (5, 10)) -> DataFrame:
    """-> one row per (query_id, k): (query_id, k, n_rel, n_ret, hits,
    prec_ppm, recall_ppm, dcg_micro, idcg_micro, ndcg_ppm), plus one
    ``query_id='*'`` macro-average summary row per k whose ndcg_ppm /
    prec_ppm / recall_ppm are exact integer means of the per-query ppm
    values (queries with no relevant docs are excluded, as trec_eval
    does)."""
    rel = qrels.filter(F.col("rel") > 0).select("query_id", "doc_id",
                                                F.col("rel").cast("long"))
    ranked = run.select(
        "query_id", "doc_id",
        F.row_number().over(
            Window.partitionBy("query_id")
            .orderBy(F.col("score").desc(), F.col("doc_id"))).alias("rank"))
    # per-query totals: how many relevant exist / retrieved overall
    n_rel = rel.groupBy("query_id").agg(
        F.count(F.lit(1)).cast("long").alias("n_rel"))
    n_ret = ranked.groupBy("query_id").agg(
        F.count(F.lit(1)).cast("long").alias("n_ret"))

    kf = ranked.sparkSession.createDataFrame([(int(k),) for k in ks],
                                             "k int")
    hits = ranked.join(rel, ["query_id", "doc_id"]) \
                 .withColumn("dcg_t", F.expr(_dcg_term("rel", "rank")))
    hit_k = (hits.crossJoin(F.broadcast(kf))
             .filter(F.col("rank") <= F.col("k"))
             .groupBy("query_id", "k")
             .agg(F.count(F.lit(1)).cast("long").alias("hits"),
                  F.sum("dcg_t").cast("long").alias("dcg_micro")))
    # ideal DCG: qrels re-ranked by rel desc (deterministic doc_id tie)
    ideal = rel.select(
        "query_id",
        F.row_number().over(
            Window.partitionBy("query_id")
            .orderBy(F.col("rel").desc(), F.col("doc_id"))).alias("irank"),
        "rel")
    ideal_k = (ideal.crossJoin(F.broadcast(kf))
               .filter(F.col("irank") <= F.col("k"))
               .groupBy("query_id", "k")
               .agg(F.sum(F.expr(_dcg_term("rel", "irank")))
                    .cast("long").alias("idcg_micro")))

    base = (n_rel.crossJoin(F.broadcast(kf))
            .join(n_ret, "query_id", "left")
            .join(hit_k, ["query_id", "k"], "left")
            .join(ideal_k, ["query_id", "k"], "left")
            .select("query_id", "k", "n_rel",
                    F.coalesce("n_ret", F.lit(0)).alias("n_ret"),
                    F.coalesce("hits", F.lit(0)).alias("hits"),
                    F.coalesce("dcg_micro", F.lit(0)).alias("dcg_micro"),
                    F.coalesce("idcg_micro", F.lit(0))
                    .alias("idcg_micro")))
    per_q = base.selectExpr(
        "query_id", "k", "n_rel", "n_ret", "hits",
        f"hits * {SCALE} DIV k AS prec_ppm",
        f"hits * {SCALE} DIV n_rel AS recall_ppm",
        "dcg_micro", "idcg_micro",
        f"CASE WHEN idcg_micro = 0 THEN 0 "
        f"ELSE dcg_micro * {SCALE} DIV idcg_micro END AS ndcg_ppm")
    summary = (per_q.groupBy("k")
               .agg(F.count(F.lit(1)).alias("nq"),
                    F.sum("n_rel").alias("n_rel"),
                    F.sum("n_ret").alias("n_ret"),
                    F.sum("hits").alias("hits"),
                    F.sum("prec_ppm").alias("sp"),
                    F.sum("recall_ppm").alias("sr"),
                    F.sum("dcg_micro").alias("dcg_micro"),
                    F.sum("idcg_micro").alias("idcg_micro"),
                    F.sum("ndcg_ppm").alias("sn"))
               .selectExpr("'*' AS query_id", "k", "n_rel", "n_ret",
                           "hits", "sp DIV nq AS prec_ppm",
                           "sr DIV nq AS recall_ppm", "dcg_micro",
                           "idcg_micro", "sn DIV nq AS ndcg_ppm"))
    cols = ["query_id", "k", "n_rel", "n_ret", "hits", "prec_ppm",
            "recall_ppm", "dcg_micro", "idcg_micro", "ndcg_ppm"]
    out = per_q.select(*cols).unionByName(summary.select(*cols))
    return out.select(
        "query_id", F.col("k").cast("int").alias("k"),
        *[F.col(c).cast("long").alias(c) for c in cols[2:]])
