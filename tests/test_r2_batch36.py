"""Batch-36 round-2: k-truss peeling (operators/ktruss.py), robust
median/MAD outliers (operators/robust.py), rule-based KB completion
(operators/rulemine.py::apply_rules)."""

import random
from itertools import combinations

from knowledgebase_processor_spark.operators.ktruss import ktruss
from knowledgebase_processor_spark.operators.robust import robust_outliers
from knowledgebase_processor_spark.operators.rulemine import (
    apply_rules, mine_path_rules)


# ---------------------------------------------------------------- k-truss ----

def _ktruss_brute(edges, k):
    es = {tuple(sorted(e)) for e in edges if e[0] != e[1]}
    while True:
        nbr = {}
        for a, b in es:
            nbr.setdefault(a, set()).add(b)
            nbr.setdefault(b, set()).add(a)
        drop = {e for e in es
                if len(nbr[e[0]] & nbr[e[1]]) < k - 2}
        if not drop:
            return es
        es -= drop


def test_ktruss_clique_plus_tail(spark):
    # K5 with a pendant chain: 4-truss keeps exactly the clique
    edges = list(combinations(range(5), 2)) + [(4, 5), (5, 6)]
    df = spark.createDataFrame(edges, "src long, dst long")
    got = sorted((r.a, r.b) for r in ktruss(df, 4).collect())
    assert got == sorted(combinations(range(5), 2))
    # 5-truss of K5 is still K5; 6-truss is empty
    assert len(ktruss(df, 5).collect()) == 10
    assert ktruss(df, 6).collect() == []


def test_ktruss_peeling_cascade(spark):
    # triangle fan where removing one edge cascades: K4 minus an edge
    # has all edges at support 1 -> 4-truss empty, 3-truss keeps it
    edges = [(0, 1), (0, 2), (0, 3), (1, 2), (1, 3)]  # K4 minus (2,3)
    df = spark.createDataFrame(edges, "src long, dst long")
    assert ktruss(df, 4).collect() == []
    assert len(ktruss(df, 3).collect()) == 5


def test_ktruss_differential_random(spark):
    rng = random.Random(5)
    for trial in range(3):
        n = 18
        edges = list({tuple(sorted((rng.randrange(n), rng.randrange(n))))
                      for _ in range(60)})
        edges = [e for e in edges if e[0] != e[1]]
        df = spark.createDataFrame(edges, "src long, dst long")
        for k in (3, 4):
            got = sorted((r.a, r.b) for r in ktruss(df, k).collect())
            assert got == sorted(_ktruss_brute(edges, k)), (trial, k)


def test_ktruss_mixed_degree_triangle(spark):
    # regression for the orientation bug: a triangle whose endpoints
    # have DIFFERENT degrees (id order != degree order) must be found
    edges = [(2, 3), (2, 9), (3, 9), (9, 1), (9, 0), (9, 4), (3, 5)]
    df = spark.createDataFrame(edges, "src long, dst long")
    got = sorted((r.a, r.b) for r in ktruss(df, 3).collect())
    assert got == [(2, 3), (2, 9), (3, 9)]


# ---------------------------------------------------------- robust outliers ----

def test_robust_outliers_hand_computed(spark):
    rows = ([("s", v) for v in [10, 10, 11, 12, 12, 13, 14, 1000]])
    df = spark.createDataFrame(rows, "source string, x long")
    r = robust_outliers(df, "source", "x").collect()[0]
    # sorted: 10,10,11,12,12,13,14,1000; median = (12+12)/2 = 12
    assert r.median_micro == 12_000_000
    # |x-12|: 2,2,1,0,0,1,2,988 -> sorted 0,0,1,1,2,2,2,988; MAD=1.5
    assert r.mad_micro == 1_500_000
    # outlier: |x-12|e6 > 4.5e6 -> only 1000
    assert r.n_outliers == 1


def test_robust_outliers_constant_group(spark):
    df = spark.createDataFrame([("s", 5)] * 6 + [("s", 6)],
                               "source string, x long")
    r = robust_outliers(df, "source", "x").collect()[0]
    # median 5, MAD 0 -> ANY deviation flags
    assert (r.median_micro, r.mad_micro, r.n_outliers) == (5_000_000, 0, 1)


# ------------------------------------------------------------- apply rules ----

def test_apply_rules_completes_missing_heads(spark):
    rows = []
    for i in range(10):
        org, city = f"o{i % 2}", f"c{i % 2}"
        rows.append((f"p{i}", "worksAt", org))
        rows.append((org, "locatedIn", city))
        if i >= 2:  # p0, p1 missing their basedIn
            rows.append((f"p{i}", "basedIn", city))
    t = spark.createDataFrame(rows, "subj string, pred string, obj string")
    rules = mine_path_rules(t, min_support=2, max_fanout=None)
    inferred = apply_rules(t, rules, min_conf_ppm=600000,
                           max_fanout=None).collect()
    basedin = {(r.subj, r.obj) for r in inferred if r.pred == "basedIn"}
    assert basedin == {("p0", "c0"), ("p1", "c1")}
    for r in inferred:
        if r.pred == "basedIn":
            assert r.conf_ppm == 800_000


def test_apply_rules_confidence_floor(spark):
    rows = []
    for i in range(10):
        rows.append((f"p{i}", "a", "m"))
        rows.append(("m", "b", "z"))
        if i < 3:  # conf 0.3 < floor
            rows.append((f"p{i}", "h", "z"))
    t = spark.createDataFrame(rows, "subj string, pred string, obj string")
    rules = mine_path_rules(t, min_support=2, max_fanout=None)
    inferred = apply_rules(t, rules, min_conf_ppm=600000,
                           max_fanout=None).collect()
    assert not [r for r in inferred if r.pred == "h"]
