"""Batch-24 round-2 operators: entity summarization, predicate-domain
type inference, functional-conflict mining (operators/kgquality.py)."""

from knowledgebase_processor_spark.operators.kgquality import (
    entity_summaries, functional_conflicts, infer_types)
from knowledgebase_processor_spark.operators.rdfs import RDF_TYPE


def _t(spark, rows):
    return spark.createDataFrame(rows,
                                 "subj string, pred string, obj string")


# ---------------------------------------------------------- summaries ----

def test_entity_summaries_rare_pred_wins(spark):
    t = _t(spark, [
        ("a", "label", "A"), ("b", "label", "B"), ("c", "label", "C"),
        ("a", "birthPlace", "X"),          # only a uses it: rare
        ("a", RDF_TYPE, "Person"),         # type rows excluded
    ])
    out = entity_summaries(t, k=1).collect()
    rows = {r.subj: r for r in out}
    assert rows["a"].pred == "birthPlace"  # beats label
    # N_subjects=3; birthPlace used by 1 subject -> 3e6 ppm
    assert rows["a"].score_ppm == 3_000_000
    assert rows["b"].pred == "label" and rows["b"].score_ppm == 1_000_000
    assert all(r.rk == 1 for r in out)


def test_entity_summaries_k_and_tie_break(spark):
    t = _t(spark, [("a", "p", "v2"), ("a", "p", "v1"), ("a", "q", "w")])
    out = [(r.rk, r.pred, r.obj)
           for r in sorted(entity_summaries(t, k=2).collect(),
                           key=lambda r: r.rk)]
    # all three facts tie on score (each pred used by the 1 subject);
    # tie-break (pred, obj): p/v1 then p/v2; q/w truncated by k=2
    assert out == [(1, "p", "v1"), (2, "p", "v2")]


# ------------------------------------------------------ type inference ----

def test_infer_types_majority_and_typed_excluded(spark):
    schema = spark.createDataFrame(
        [("worksAt", "Person"), ("bornIn", "Person"), ("hq", "Org")],
        "pred string, domain_cls string")
    t = _t(spark, [
        ("u", "worksAt", "x"), ("u", "bornIn", "y"), ("u", "hq", "z"),
        ("v", "hq", "z"),
        ("w", "worksAt", "x"), ("w", RDF_TYPE, "Robot"),  # already typed
        ("n", "unknownPred", "q"),                        # no domain: no row
    ])
    out = {r.subj: r for r in infer_types(t, schema).collect()}
    assert out["u"].inferred_cls == "Person"
    assert (out["u"].votes, out["u"].n_votes_total) == (2, 3)
    assert out["v"].inferred_cls == "Org"
    assert "w" not in out and "n" not in out


def test_infer_types_tie_breaks_on_larger_class_name(spark):
    schema = spark.createDataFrame([("p", "Alpha"), ("q", "Beta")],
                                   "pred string, domain_cls string")
    t = _t(spark, [("s", "p", "1"), ("s", "q", "2")])
    row = infer_types(t, schema).collect()[0]
    assert row.inferred_cls == "Beta"      # struct-max: name desc on tie


# ------------------------------------------------- functional conflicts ----

def test_functional_conflicts_detects_double_assertion(spark):
    # pred 'dob': 9 clean subjects + 1 conflicted -> functionality
    # 10/11 = 909090ppm >= 900000 threshold
    rows = [(f"s{i}", "dob", f"d{i}") for i in range(9)]
    rows += [("bad", "dob", "1999"), ("bad", "dob", "2001")]
    # pred 'tag' is non-functional: every subject has 3 objects
    rows += [(f"s{i}", "tag", f"t{j}") for i in range(3) for j in range(3)]
    out = functional_conflicts(_t(spark, rows)).collect()
    assert len(out) == 1
    r = out[0]
    assert (r.pred, r.subj, r.n_obj) == ("dob", "bad", 2)
    assert (r.min_obj, r.max_obj) == ("1999", "2001")
    assert r.functionality_ppm == 10 * 1_000_000 // 11


def test_functional_conflicts_duplicate_assertions_not_conflicts(spark):
    # same (s, p, o) asserted twice is NOT a conflict (countDistinct)
    t = _t(spark, [("s", "dob", "x"), ("s", "dob", "x"),
                   ("r", "dob", "y")])
    assert functional_conflicts(_t(spark, []).unionByName(t)).collect() \
        == []
