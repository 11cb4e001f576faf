"""Incremental KG maintenance: assert/retract triple sets from a crawl
delta (north-rule core: "resumable" KG materialization means the graph
is MAINTAINED, not rebuilt).

Reference anchor: the reference re-processes documents one at a time and
replaces their triples wholesale (its SQLite sink deletes-then-inserts
per document, sinks.py S5; the SPARQL sink's per-doc upsert, S7).  At
10^12 documents a recrawl cannot re-extract the corpus: only the delta's
``added ∪ changed`` documents are re-extracted, and the graph update is
expressed as two statement sets

    retract = triples previously materialized for changed ∪ removed docs
    assert  = freshly extracted triples for added ∪ changed docs

which map 1:1 onto Iceberg MERGE / SPARQL ``DELETE WHERE { GRAPH doc }``
+ ``INSERT DATA`` (sinks_sparql.py already emits per-doc DELETE/INSERT —
this operator computes WHICH docs and WHICH triples, distributed).

Scale shape:

* change detection is `snapshot_delta` (one full-outer fingerprint
  join);
* extraction (the expensive Arrow/Python stage) runs ONLY on the
  added/changed slice — a broadcast-able semi-join prefilter, so an
  unchanged-heavy recrawl costs ~nothing;
* the retraction set is a semi-join of the OLD materialized triple
  table on the changed/removed doc keys — pure hash join keyed on the
  same ``source_doc`` the triple table is partitioned by (triples.py's
  dedup key), so it is partition-local;
* output statements are per-doc groups, matching the per-doc
  transactional unit the reference's sinks use.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

from knowledgebase_processor_spark.operators.delta import snapshot_delta


def incremental_kg_update(old_docs: DataFrame, new_docs: DataFrame,
                          old_triples: DataFrame,
                          extract=None) -> DataFrame:
    """-> (action, source_doc, subj, pred, obj, obj_is_uri) where action
    in {retract, assert}.

    ``old_triples`` is the previously materialized triple table (must
    carry ``source_doc``); ``extract`` maps a documents frame to fresh
    triples (defaults to the full pipeline's documents_to_triples).
    """
    if extract is None:
        from knowledgebase_processor_spark.pipeline import (
            documents_to_triples)
        extract = documents_to_triples

    delta = snapshot_delta(old_docs, new_docs)
    re_extract_keys = (delta.filter(F.col("status").isin("added", "changed"))
                       .select(F.col("doc_id")))
    retract_keys = (delta.filter(F.col("status").isin("changed", "removed"))
                    .select(F.col("doc_id").alias("source_doc")))

    fresh = extract(new_docs.join(F.broadcast(re_extract_keys), "doc_id",
                                  "left_semi"))
    retract = old_triples.join(F.broadcast(retract_keys), "source_doc",
                               "left_semi")
    cols = ["source_doc", "subj", "pred", "obj", "obj_is_uri"]
    return (retract.select(F.lit("retract").alias("action"), *cols)
            .unionByName(fresh.select(F.lit("assert").alias("action"),
                                      *cols)))
