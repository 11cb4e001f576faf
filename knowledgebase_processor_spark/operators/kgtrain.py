"""KG-embedding training-data operators (beyond-reference surface;
companions to walks.py / negatives.py on the graph side).

`transe_negatives` builds the corrupted-triple negatives every
translational KG-embedding recipe (TransE, Bordes et al. 2013; DistMult,
RotatE) trains against: for each positive (s, p, o) and sample slot j,
replace the subject (even j) or object (odd j) with a pseudo-random
entity, then FILTER the corruptions that happen to be true triples
("filtered setting" — the standard evaluation protocol).

Determinism contract (shared with walks/shards/splits): the corrupt
pick is a HASH of (s, p, o, j) modulo the entity count, not an RNG —
re-runs, retries, and other engines replay the identical negative set
(the q143 oracle recomputes every pick in DuckDB).

Scale shape:

* the entity vocabulary rides in as a (ent_idx, ent_id) frame — dense
  indices come from the vocab builder (vocab.py) — and is BROADCAST
  into the pick join (vocabularies are millions of rows; triples are
  the 100 TB side);
* the false-negative filter is ONE left-anti join on the full triple
  key — shuffle-partitioned, partial-agg-free, AQE handles skew;
* no window, no collect, no per-row Python.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F


def _h60(col) -> "F.Column":
    return F.conv(F.substring(F.md5(col), 1, 15), 16, 10).cast("bigint")


def transe_negatives(triples: DataFrame, entities: DataFrame,
                     k: int = 2) -> DataFrame:
    """(subj, pred, obj) x entities(ent_idx, ent_id) -> one row per
    surviving corruption: (subj, pred, obj, sample, side, neg_subj,
    neg_obj), with side 's' on even sample slots and 'o' on odd ones and
    true-triple corruptions filtered out (the "filtered setting")."""
    n = entities.count()  # vocab cardinality: one small-side count
    ents = entities.select(F.col("ent_idx").alias("__idx"),
                           F.col("ent_id").alias("__ent"))

    slots = F.explode(F.sequence(F.lit(0), F.lit(k - 1))).alias("sample")
    t = triples.select("subj", "pred", "obj", slots)
    pick = _h60(F.concat_ws("|", F.col("subj"), F.col("pred"),
                            F.col("obj"), F.col("sample"))) % F.lit(n)
    t = t.withColumn("__idx", pick) \
         .withColumn("side", F.when(F.col("sample") % 2 == 0, "s")
                     .otherwise("o"))
    t = (t.join(F.broadcast(ents), "__idx")
         .withColumn("neg_subj", F.when(F.col("side") == "s", F.col("__ent"))
                     .otherwise(F.col("subj")))
         .withColumn("neg_obj", F.when(F.col("side") == "o", F.col("__ent"))
                     .otherwise(F.col("obj")))
         .drop("__idx", "__ent"))
    # degenerate corruptions (picked entity == the one it replaces) and
    # the filtered setting: corrupted triple must not be a true triple.
    t = t.filter((F.col("neg_subj") != F.col("subj")) |
                 (F.col("neg_obj") != F.col("obj")))
    truth = triples.select(F.col("subj").alias("neg_subj"), "pred",
                           F.col("obj").alias("neg_obj"))
    return t.join(truth, ["neg_subj", "pred", "neg_obj"], "left_anti") \
            .select("subj", "pred", "obj", "sample", "side",
                    "neg_subj", "neg_obj")


def ranking_eval(test: DataFrame, truth: DataFrame, entities: DataFrame,
                 sample_mod: int | None = None) -> DataFrame:
    """Filtered tail-ranking evaluation — the standard link-prediction
    protocol (Bordes et al. 2013 "filtered setting"; OGB's sampled
    variant): for each test triple (s, p, o), rank the true tail o
    against candidate entities under a deterministic score, after
    REMOVING candidates that form some *other* true triple (they are
    correct answers, not errors).

    -> (subj, pred, obj, n_cand, rank, mrr_micro) per test triple;
    rank is 1-based, ``mrr_micro = 1000000 DIV rank`` (exact integer,
    so downstream means are aggregation-order independent).

    Scoring is the hash stand-in shared with the q161 oracle —
    ``md5(s|p|cand)`` first 15 hex digits, higher = better, ties broken
    by candidate id — the same determinism contract as
    :func:`transe_negatives`; a trained model plugs in by replacing the
    score expression, the eval harness (candidate fan-out, filtering,
    partial-agg ranking) is the deliverable.

    Scale shape:

    * full protocol is |test| x |entities| — at web scale use
      ``sample_mod=m`` for the OGB-style sampled eval: a candidate
      survives iff ``hash(s|p|cand|'cand') % m == 0`` (expected
      |E|/m candidates per triple, replayable by any engine); the true
      tail is always kept so ranks stay well-defined;
    * entities BROADCAST into a nested-loop fan-out (vocabularies are
      millions; triples are the big side), the sampling predicate runs
      inside the join so only surviving candidates materialize;
    * the filtered-setting removal is ONE left-anti join on the triple
      key; the rank is a partial-agg groupBy (count of strictly-better
      candidates), never a window over the candidate stream.
    """
    t = test.select("subj", "pred", "obj")
    ents = entities.select(F.col("ent_id").alias("cand"))
    cand = t.crossJoin(F.broadcast(ents))
    if sample_mod is not None:
        keep = (_h60(F.concat_ws("|", F.col("subj"), F.col("pred"),
                                 F.col("cand"), F.lit("cand")))
                % F.lit(sample_mod) == 0)
        cand = cand.filter(keep | (F.col("cand") == F.col("obj")))
    # filtered setting: drop every candidate that is a true tail for
    # (s, p) — including o itself — then add o back exactly once.
    truth_k = truth.select("subj", "pred", F.col("obj").alias("cand"))
    cand = (cand.join(truth_k, ["subj", "pred", "cand"], "left_anti")
            .unionByName(t.withColumn("cand", F.col("obj"))))
    sc = _h60(F.concat_ws("|", F.col("subj"), F.col("pred"),
                          F.col("cand")))
    true_sc = _h60(F.concat_ws("|", F.col("subj"), F.col("pred"),
                               F.col("obj")))
    better = (sc > true_sc) | ((sc == true_sc) &
                               (F.col("cand") < F.col("obj")))
    return (cand.groupBy("subj", "pred", "obj")
            .agg(F.count(F.lit(1)).cast("long").alias("n_cand"),
                 (F.sum(better.cast("long")) + 1).cast("long")
                 .alias("rank"))
            .withColumn("mrr_micro", F.expr("1000000 DIV rank")))


def ranking_report(ranks: DataFrame,
                   ks: tuple[int, ...] = (1, 3, 10)) -> DataFrame:
    """Aggregate :func:`ranking_eval` rows into the headline metrics:
    one ``('hits', k, ppm)`` row per k plus ``('mrr', 0, micro)`` —
    both exact integer ratios of BIGINT sums (macro over test triples),
    so the report is bit-identical across engines and partitionings.
    One partial-agg pass, no window."""
    aggs = [F.count(F.lit(1)).alias("n"),
            F.sum("mrr_micro").alias("sum_mrr")]
    for k in ks:
        aggs.append(F.sum((F.col("rank") <= k).cast("long"))
                    .alias(f"h{k}"))
    row = ranks.agg(*aggs).filter(F.col("n") > 0)  # empty eval -> 0 rows
    pairs = ", ".join([f"'hits', {k}, h{k} * 1000000 DIV n" for k in ks]
                      + ["'mrr', 0, sum_mrr DIV n"])
    return (row.selectExpr(
        f"stack({len(ks) + 1}, {pairs}) AS (metric, k, value_micro)")
        .select("metric", F.col("k").cast("int").alias("k"),
                F.col("value_micro").cast("long").alias("value_micro")))
