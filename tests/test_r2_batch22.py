"""Batch-22 round-2 operators: filtered KG ranking eval
(operators/kgtrain.py::ranking_eval / ranking_report) and ranked-
retrieval metrics (operators/rankeval.py::retrieval_report)."""

import hashlib
import math

from knowledgebase_processor_spark.operators.kgtrain import (
    ranking_eval, ranking_report)
from knowledgebase_processor_spark.operators.rankeval import (
    retrieval_report)


def _h60(s: str) -> int:
    return int(hashlib.md5(s.encode()).hexdigest()[:15], 16)


def _score(subj, pred, cand):
    return _h60(f"{subj}|{pred}|{cand}")


# ------------------------------------------------------- ranking eval ----

def _frames(spark, truth_rows, test_rows, ents):
    truth = spark.createDataFrame(truth_rows,
                                  "subj string, pred string, obj string")
    test = spark.createDataFrame(test_rows,
                                 "subj string, pred string, obj string")
    entities = spark.createDataFrame([(e,) for e in ents], "ent_id string")
    return test, truth, entities


def test_ranking_eval_matches_python_bruteforce(spark):
    ents = [f"e{i}" for i in range(12)]
    truth_rows = [(f"e{i}", f"p{i % 2}", f"e{i // 2}") for i in range(12)]
    test, truth, entities = _frames(spark, truth_rows, truth_rows[:5], ents)
    got = {(r.subj, r.pred, r.obj): (r.n_cand, r.rank, r.mrr_micro)
           for r in ranking_eval(test, truth, entities).collect()}
    truth_set = set(truth_rows)
    for s, p, o in truth_rows[:5]:
        cands = [c for c in ents
                 if c == o or (s, p, c) not in truth_set]
        ts = _score(s, p, o)
        rank = 1 + sum(1 for c in cands if c != o and
                       (_score(s, p, c) > ts or
                        (_score(s, p, c) == ts and c < o)))
        assert got[(s, p, o)] == (len(cands), rank, 1_000_000 // rank)


def test_ranking_eval_filtered_setting_removes_true_tails(spark):
    # two true tails for (a, p): filtered candidates for (a,p,x) must
    # exclude y entirely (it is a correct answer, not an error).
    ents = ["x", "y", "z", "w"]
    truth_rows = [("a", "p", "x"), ("a", "p", "y")]
    test, truth, entities = _frames(spark, truth_rows,
                                    [("a", "p", "x")], ents)
    row = ranking_eval(test, truth, entities).collect()[0]
    assert row.n_cand == 3            # x itself + z + w, never y
    cands = ["z", "w"]
    ts = _score("a", "p", "x")
    exp = 1 + sum(1 for c in cands if _score("a", "p", c) > ts)
    assert row.rank == exp


def test_ranking_eval_sampled_keeps_true_tail_and_subsets(spark):
    ents = [f"e{i}" for i in range(40)]
    truth_rows = [(f"e{i}", "p", f"e{(i * 7) % 40}") for i in range(40)]
    test, truth, entities = _frames(spark, truth_rows, truth_rows[:8], ents)
    full = {(r.subj, r.obj): r for r in
            ranking_eval(test, truth, entities).collect()}
    samp = {(r.subj, r.obj): r for r in
            ranking_eval(test, truth, entities, sample_mod=4).collect()}
    assert set(samp) == set(full)     # true tail always survives
    for key, r in samp.items():
        assert 1 <= r.rank <= r.n_cand
        assert r.n_cand <= full[key].n_cand
        assert r.rank <= full[key].rank


def test_ranking_report_exact_means(spark):
    import pyspark.sql.functions as F
    rows = [(1,), (2,), (10,), (11,)]
    ranks = spark.createDataFrame(rows, "rank long").withColumn(
        "mrr_micro", F.expr("1000000 DIV rank"))
    out = {(r.metric, r.k): r.value_micro
           for r in ranking_report(ranks, ks=(1, 3, 10)).collect()}
    assert out[("hits", 1)] == 1 * 1_000_000 // 4
    assert out[("hits", 3)] == 2 * 1_000_000 // 4
    assert out[("hits", 10)] == 3 * 1_000_000 // 4
    assert out[("mrr", 0)] == (1_000_000 + 500_000 + 100_000 + 90_909) // 4


# --------------------------------------------------- retrieval report ----

def _dcg_term(rel: int, rank: int) -> int:
    # round-half-even matches both engines' round() on doubles
    v = 1_000_000 * rel / math.log2(rank + 1)
    return int(round(v))


def test_retrieval_report_hand_computed(spark):
    run = spark.createDataFrame(
        [("q1", "d1", 9.0), ("q1", "d2", 8.0), ("q1", "d3", 7.0),
         ("q2", "d1", 5.0), ("q2", "d9", 4.0)],
        "query_id string, doc_id string, score double")
    qrels = spark.createDataFrame(
        [("q1", "d1", 2), ("q1", "d3", 1), ("q1", "d7", 1),
         ("q2", "d9", 3), ("q2", "d0", 0)],   # rel=0 ignored
        "query_id string, doc_id string, rel int")
    out = {(r.query_id, r.k): r
           for r in retrieval_report(run, qrels, ks=(2, 3)).collect()}
    r = out[("q1", 2)]
    assert (r.n_rel, r.n_ret, r.hits) == (3, 3, 1)       # d1 only
    assert r.prec_ppm == 1_000_000 // 2
    assert r.recall_ppm == 1_000_000 // 3
    assert r.dcg_micro == _dcg_term(2, 1)
    # ideal@2: rel 2 at rank1, rel 1 at rank2
    assert r.idcg_micro == _dcg_term(2, 1) + _dcg_term(1, 2)
    assert r.ndcg_ppm == r.dcg_micro * 1_000_000 // r.idcg_micro
    r3 = out[("q1", 3)]
    assert r3.hits == 2                                   # + d3 at rank 3
    assert r3.dcg_micro == _dcg_term(2, 1) + _dcg_term(1, 3)
    # q2: single relevant retrieved at rank 2
    r2 = out[("q2", 2)]
    assert (r2.n_rel, r2.hits) == (1, 1)
    assert r2.recall_ppm == 1_000_000
    assert r2.ndcg_ppm == (_dcg_term(3, 2) * 1_000_000
                           // _dcg_term(3, 1))
    # summary row = exact integer macro-average
    s = out[("*", 2)]
    assert s.ndcg_ppm == (r.ndcg_ppm + r2.ndcg_ppm) // 2
    assert s.hits == r.hits + r2.hits


def test_retrieval_report_perfect_run_ndcg_is_1(spark):
    run = spark.createDataFrame(
        [("q", "a", 3.0), ("q", "b", 2.0), ("q", "c", 1.0)],
        "query_id string, doc_id string, score double")
    qrels = spark.createDataFrame(
        [("q", "a", 3), ("q", "b", 2), ("q", "c", 1)],
        "query_id string, doc_id string, rel int")
    out = retrieval_report(run, qrels, ks=(3,)).collect()
    for r in out:
        assert r.ndcg_ppm == 1_000_000
        assert r.recall_ppm == 1_000_000


def test_retrieval_report_no_hits_and_empty_run(spark):
    run = spark.createDataFrame([("q1", "d1", 1.0)],
                                "query_id string, doc_id string, score double")
    qrels = spark.createDataFrame([("q1", "dX", 1), ("q2", "dY", 2)],
                                  "query_id string, doc_id string, rel int")
    out = {(r.query_id, r.k): r
           for r in retrieval_report(run, qrels, ks=(5,)).collect()}
    assert out[("q1", 5)].hits == 0
    assert out[("q1", 5)].ndcg_ppm == 0
    # q2 never retrieved anything: still reported, n_ret 0
    assert out[("q2", 5)].n_ret == 0 and out[("q2", 5)].recall_ppm == 0


def test_ranking_report_empty_is_empty(spark):
    import pyspark.sql.functions as F
    empty = spark.createDataFrame([], "rank long, mrr_micro long")
    assert ranking_report(empty).collect() == []
