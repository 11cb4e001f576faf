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
