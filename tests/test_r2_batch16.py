"""Batch-16 round-2 operators: TransE filtered negative sampling
(operators/kgtrain.py), KG predicate profiling
(operators/stats.py::predicate_profile), latest-assertion-wins snapshot
merge (operators/delta.py::latest_assertions)."""

import datetime as dt
import hashlib

from pyspark.sql import functions as F

from knowledgebase_processor_spark.operators.delta import latest_assertions
from knowledgebase_processor_spark.operators.kgtrain import transe_negatives
from knowledgebase_processor_spark.operators.stats import predicate_profile


def _md5_60(s: str) -> int:
    return int(hashlib.md5(s.encode()).hexdigest()[:15], 16)


# --------------------------------------------------- transe negatives ----

def test_transe_negatives_match_python_replay(spark):
    n = 10
    trips = [(f"e{i}", f"p{i % 2}", f"e{(i * 3 + 1) % n}") for i in range(n)]
    triples = spark.createDataFrame(trips, "subj string, pred string, obj string")
    ents = spark.createDataFrame([(i, f"e{i}") for i in range(n)],
                                 "ent_idx long, ent_id string")
    got = {(r.subj, r.pred, r.obj, r.sample, r.side, r.neg_subj, r.neg_obj)
           for r in transe_negatives(triples, ents, k=4).collect()}

    truth = set(trips)
    want = set()
    for (s, p, o) in trips:
        for j in range(4):
            idx = _md5_60(f"{s}|{p}|{o}|{j}") % n
            ent = f"e{idx}"
            if j % 2 == 0:
                ns, no, side = ent, o, "s"
            else:
                ns, no, side = s, ent, "o"
            if (ns, no) == (s, o):
                continue                      # degenerate pick
            if (ns, p, no) in truth:
                continue                      # filtered setting
            want.add((s, p, o, j, side, ns, no))
    assert got == want and want


def test_transe_negatives_filtered_setting_removes_true_triples(spark):
    # two entities, fully-connected p-graph: EVERY corruption is a true
    # triple or degenerate, so nothing survives.
    trips = [("a", "p", "b"), ("b", "p", "a"),
             ("a", "p", "a"), ("b", "p", "b")]
    triples = spark.createDataFrame(trips, "subj string, pred string, obj string")
    ents = spark.createDataFrame([(0, "a"), (1, "b")],
                                 "ent_idx long, ent_id string")
    assert transe_negatives(triples, ents, k=6).count() == 0


# -------------------------------------------------- predicate profile ----

def test_predicate_profile_functional_and_literal_shares(spark):
    rows = [
        # p1: functional (one obj per subj), all URIs
        ("s1", "p1", "o1", True, None),
        ("s2", "p1", "o1", True, None),
        # p2: one subj, three objs, 2 literals with datatypes
        ("s1", "p2", "lit1", False, "xsd:string"),
        ("s1", "p2", "lit2", False, "xsd:int"),
        ("s1", "p2", "o2", True, None),
        ("s9", "p2", "lit3", False, "xsd:int"),
    ]
    t = spark.createDataFrame(
        rows, "subj string, pred string, obj string, obj_is_uri boolean, "
              "obj_datatype string")
    out = {r.pred: r for r in predicate_profile(t).collect()}
    p1, p2 = out["p1"], out["p2"]
    assert (p1.n_triples, p1.n_subj, p1.n_obj) == (2, 2, 1)
    assert p1.functionality_ppm == 1_000_000
    assert p1.inv_functionality_ppm == 500_000
    assert p1.literal_ppm == 0 and p1.max_fanout == 1
    assert p1.top_datatype is None
    assert (p2.n_triples, p2.max_fanout) == (4, 3)
    assert p2.literal_ppm == 750_000
    assert p2.top_datatype == "xsd:int"      # count 2 beats 1


def test_predicate_profile_defaults_without_meta_columns(spark):
    t = spark.createDataFrame([("s", "p", "o")],
                              "subj string, pred string, obj string")
    r = predicate_profile(t).collect()[0]
    assert r.literal_ppm == 0 and r.top_datatype is None


# -------------------------------------------------- latest assertions ----

def _ts(m):
    return dt.datetime(2024, 1, 1, 0, m)


def test_latest_assertions_latest_wins_and_tombstones(spark):
    rows = [
        ("e1", "name", "Alice", _ts(1), "upsert"),
        ("e1", "name", "Alicia", _ts(5), "upsert"),   # newest wins
        ("e1", "age", "30", _ts(1), "upsert"),
        ("e1", "age", "31", _ts(9), "delete"),        # tombstone removes
        ("e2", "name", "Bob", _ts(2), "upsert"),
        ("e2", "name", "Robert", _ts(2), "delete"),   # tie: upsert > delete
    ]
    t = spark.createDataFrame(
        rows, "subj string, pred string, obj string, ts timestamp, op string")
    got = {(r.subj, r.pred, r.obj) for r in latest_assertions(t).collect()}
    assert got == {("e1", "name", "Alicia"), ("e2", "name", "Bob")}


def test_latest_assertions_equals_window_formulation(spark):
    import random
    rng = random.Random(7)
    rows = []
    for i in range(300):
        rows.append((f"e{rng.randrange(20)}", f"p{rng.randrange(3)}",
                     f"v{rng.randrange(50)}", _ts(rng.randrange(50)),
                     "delete" if rng.random() < 0.2 else "upsert"))
    t = spark.createDataFrame(
        rows, "subj string, pred string, obj string, ts timestamp, op string")
    got = {(r.subj, r.pred, r.obj, r.ts)
           for r in latest_assertions(t).collect()}

    best = {}
    for s, p, o, ts, op in rows:
        k = (s, p)
        v = (ts, op, o)
        if k not in best or v > best[k]:
            best[k] = v
    want = {(s, p, o, ts) for (s, p), (ts, op, o) in best.items()
            if op != "delete"}
    assert got == want
