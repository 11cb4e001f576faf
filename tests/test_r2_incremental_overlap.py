"""Round-2 additions, batch 4: incremental KG maintenance and KMV
corpus-overlap estimation."""

import hashlib

from pyspark.sql import functions as F

from knowledgebase_processor_spark.operators.incremental import (
    incremental_kg_update)
from knowledgebase_processor_spark.operators.sketches import kmv_overlap

HEX = 15


def _h60(s: str) -> int:
    return int(hashlib.md5(s.encode()).hexdigest()[:HEX], 16)


# ------------------------------------------------------- incremental ----

def test_incremental_update_covers_exactly_the_delta(spark):
    from knowledgebase_processor_spark.pipeline import documents_to_triples
    old_rows = [("d/keep", "# Keep\n\nsame text"),
                ("d/edit", "# Edit\n\nold body"),
                ("d/gone", "# Gone\n\nbye")]
    new_rows = [("d/keep", "# Keep\n\nsame text"),
                ("d/edit", "# Edit\n\nnew body with [[keep]]"),
                ("d/new", "# New\n\nhello #fresh")]
    old = spark.createDataFrame(old_rows, "doc_id string, text string")
    new = spark.createDataFrame(new_rows, "doc_id string, text string")
    old_triples = documents_to_triples(old)
    out = incremental_kg_update(old, new, old_triples).collect()

    retract_docs = {r["source_doc"] for r in out if r["action"] == "retract"}
    assert_docs = {r["source_doc"] for r in out if r["action"] == "assert"}
    # unchanged doc appears on NEITHER side; edited on both; removed only
    # retracted; added only asserted
    assert retract_docs == {"d/edit", "d/gone"}
    assert assert_docs == {"d/edit", "d/new"}
    assert "d/keep" not in retract_docs | assert_docs

    # the retract set is EXACTLY the old triples of the retracted docs
    old_by_doc = [((r["source_doc"], r["subj"], r["pred"], r["obj"]))
                  for r in old_triples.collect()
                  if r["source_doc"] in {"d/edit", "d/gone"}]
    got_retract = [(r["source_doc"], r["subj"], r["pred"], r["obj"])
                   for r in out if r["action"] == "retract"]
    assert sorted(got_retract) == sorted(old_by_doc)

    # the assert set equals a fresh full extraction of the new/changed docs
    fresh = documents_to_triples(
        new.filter(F.col("doc_id").isin("d/edit", "d/new")))
    exp_assert = [(r["source_doc"], r["subj"], r["pred"], r["obj"])
                  for r in fresh.collect()]
    got_assert = [(r["source_doc"], r["subj"], r["pred"], r["obj"])
                  for r in out if r["action"] == "assert"]
    assert sorted(got_assert) == sorted(exp_assert)


def test_incremental_update_noop_on_identical_snapshots(spark):
    from knowledgebase_processor_spark.pipeline import documents_to_triples
    rows = [("a", "# A\n\ntext"), ("b", "# B\n\nmore")]
    docs = spark.createDataFrame(rows, "doc_id string, text string")
    out = incremental_kg_update(docs, docs, documents_to_triples(docs))
    assert out.count() == 0


# -------------------------------------------------------- kmv overlap ----

def _py_overlap(a_vals, b_vals, k=64):
    ha = sorted({_h60(f"kmv|{v}") for v in a_vals})[:k]
    hb = sorted({_h60(f"kmv|{v}") for v in b_vals})[:k]
    merged = sorted(set(ha) | set(hb))[:k]
    kth = merged[k - 1] if len(merged) >= k else None
    shared = sum(1 for h in merged if h in set(ha) and h in set(hb))
    kept = len(merged)
    union_est = (127.0 * 0 if False else
                 ((k - 1) * float(1 << 60) / kth if kth else float(kept)))
    jac = shared / min(kept, k)
    return (kth if kth else -1, kept, shared, round(union_est, 4),
            round(jac, 6), round(jac * union_est, 4))


def test_kmv_overlap_bit_exact_vs_python(spark):
    a_vals = [f"tok{i}" for i in range(400)]
    b_vals = [f"tok{i}" for i in range(200, 700)]  # true J = 200/700
    a = spark.createDataFrame([(v,) for v in a_vals], "v string")
    b = spark.createDataFrame([(v,) for v in b_vals], "v string")
    r = kmv_overlap(a, b, "v", k=64).collect()[0]
    exp = _py_overlap(a_vals, b_vals, 64)
    got = (r["union_kth"], r["n_union_kept"], r["n_shared"],
           r["union_estimate"], r["jaccard_estimate"],
           r["intersection_estimate"])
    assert got == exp
    # estimator sanity: within a loose envelope of the truth
    assert abs(r["jaccard_estimate"] - 200 / 700) < 0.15
    assert abs(r["union_estimate"] - 700) / 700 < 0.35


def test_kmv_overlap_small_inputs_fall_back_to_exact(spark):
    a = spark.createDataFrame([("x",), ("y",)], "v string")
    b = spark.createDataFrame([("y",), ("z",)], "v string")
    r = kmv_overlap(a, b, "v", k=64).collect()[0]
    assert r["union_kth"] == -1
    assert r["n_union_kept"] == 3 and r["n_shared"] == 1
    assert r["union_estimate"] == 3.0
    assert r["jaccard_estimate"] == round(1 / 3, 6)


def test_kmv_overlap_plan_is_bottom_k_bounded(spark):
    # the global rank filter must compile to TakeOrderedAndProject BELOW
    # the window — per-partition heaps, never a full single-partition sort
    a = spark.createDataFrame([(f"a{i}",) for i in range(1000)], "v string")
    b = spark.createDataFrame([(f"b{i}",) for i in range(1000)], "v string")
    plan = kmv_overlap(a, b, "v", k=32)._jdf.queryExecution() \
        .executedPlan().toString()
    assert "TakeOrderedAndProject" in plan
