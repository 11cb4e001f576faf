"""Batch-34 round-2: AMIE-lite rule mining (operators/rulemine.py),
embedding covariance / PCA prep (operators/covariance.py), and
strongly connected components (operators/scc.py) — differential
against brute-force Python (Tarjan, numpy.cov, pair counting)."""

import random

import numpy as np

from pyspark.sql import functions as F

from knowledgebase_processor_spark.operators.covariance import (
    embedding_covariance, principal_axes)
from knowledgebase_processor_spark.operators.rulemine import (
    mine_path_rules)
from knowledgebase_processor_spark.operators.scc import (
    scc_summary, strongly_connected_components)


# ------------------------------------------------------------ rule mining ----

def test_rule_mining_hand_computed(spark):
    # worksAt(p_i, o_{i%4}); locatedIn(o_k, c_{k%2});
    # basedIn(p_i, c) asserted for 8 of 10 people -> conf 800000 ppm
    rows = []
    for i in range(10):
        org, city = f"o{i % 4}", f"c{(i % 4) % 2}"
        rows.append((f"p{i}", "worksAt", org))
        rows.append((org, "locatedIn", city))
        if i % 5 != 0:
            rows.append((f"p{i}", "basedIn", city))
    t = spark.createDataFrame(rows, "subj string, pred string, obj string")
    got = {(r.p1, r.p2, r.p3): r
           for r in mine_path_rules(t, min_support=2).collect()}
    key = ("worksAt", "locatedIn", "basedIn")
    assert key in got
    r = got[key]
    # body = 10 distinct (person, city); heads(basedIn) = 8; support = 8
    assert (r.support, r.body_size, r.head_size) == (8, 10, 8)
    assert r.conf_ppm == 800_000
    assert r.hc_ppm == 1_000_000


def test_rule_mining_set_semantics_dedups_witnesses(spark):
    # two middle nodes witness the same (x, z) -> body counts it ONCE
    rows = [("x", "a", "m1"), ("x", "a", "m2"),
            ("m1", "b", "z"), ("m2", "b", "z"),
            ("x", "h", "z"), ("x2", "h", "z2"),  # head support floor
            ("x2", "a", "m3"), ("m3", "b", "z2")]
    t = spark.createDataFrame(rows, "subj string, pred string, obj string")
    got = {(r.p1, r.p2, r.p3): r
           for r in mine_path_rules(t, min_support=1).collect()}
    r = got[("a", "b", "h")]
    assert (r.support, r.body_size) == (2, 2)
    assert r.conf_ppm == 1_000_000


def test_rule_mining_fanout_cap_drops_hub(spark):
    # hub entity 'hub' has out-degree 50 on pred b; cap 10 removes it
    rows = [("x", "a", "hub")] + [("hub", "b", f"z{i}") for i in range(50)]
    rows += [("x", "a", "m"), ("m", "b", "z0"), ("x", "h", "z0")]
    t = spark.createDataFrame(rows, "subj string, pred string, obj string")
    capped = {(r.p1, r.p2, r.p3): r
              for r in mine_path_rules(t, min_support=1,
                                       max_fanout=10).collect()}
    r = capped[("a", "b", "h")]
    # only the m-witnessed body pair survives; the hub's 50 are gone
    assert (r.support, r.body_size) == (1, 1)
    full = {(r.p1, r.p2, r.p3): r
            for r in mine_path_rules(t, min_support=1,
                                     max_fanout=None).collect()}
    assert full[("a", "b", "h")].body_size == 50


# ------------------------------------------------------------- covariance ----

def test_covariance_matches_numpy(spark):
    rng = random.Random(7)
    vecs = [[rng.uniform(-1, 1) for _ in range(8)] for _ in range(60)]
    df = spark.createDataFrame([(v,) for v in vecs],
                               "embedding array<float>")
    rows = embedding_covariance(df, "embedding", dims=8).collect()
    assert len(rows) == 8 * 9 // 2
    # replicate the quantization exactly, then compare to numpy cov
    q = np.array([[round(float(np.float32(x)) * 1e6) for x in v]
                  for v in vecs], dtype=np.int64)
    exp = ((q.T @ q) / len(q) -
           np.outer(q.mean(axis=0), q.mean(axis=0))) / 1e6
    for r in rows:
        # biased (population) covariance in micro-units, rounded
        got, want = r.cov_micro, exp[r.i, r.j]
        assert abs(got - want) <= 1, (r.i, r.j, got, want)


def test_covariance_ragged_rows_dropped(spark):
    df = spark.createDataFrame(
        [([1.0, 2.0, 3.0],), ([1.0],)], "embedding array<float>")
    rows = embedding_covariance(df, "embedding", dims=3).collect()
    assert all(r.n == 1 for r in rows)


def test_principal_axes_recovers_dominant_direction(spark):
    # points along (1, 1)/sqrt(2) with small noise in 2-D
    rng = random.Random(3)
    vecs = []
    for _ in range(200):
        t, eps = rng.gauss(0, 1), rng.gauss(0, 0.05)
        vecs.append([t + eps, t - eps])
    df = spark.createDataFrame([(v,) for v in vecs],
                               "embedding array<float>")
    rows = [r.asDict() for r in
            embedding_covariance(df, "embedding", dims=2).collect()]
    vals, axes = principal_axes(rows, dims=2)
    assert vals[0] > 10 * vals[1]
    v = axes[0] / np.linalg.norm(axes[0])
    assert abs(abs(float(v @ np.array([1, 1]) / np.sqrt(2))) - 1) < 0.01


# -------------------------------------------------------------------- SCC ----

def _tarjan(n, edges):
    import sys
    sys.setrecursionlimit(10000)
    adj = [[] for _ in range(n)]
    for a, b in edges:
        adj[a].append(b)
    idx, low, on, st = {}, {}, set(), []
    out, cnt = {}, [0]

    def strong(v):
        idx[v] = low[v] = cnt[0]; cnt[0] += 1
        st.append(v); on.add(v)
        for w in adj[v]:
            if w not in idx:
                strong(w); low[v] = min(low[v], low[w])
            elif w in on:
                low[v] = min(low[v], idx[w])
        if low[v] == idx[v]:
            comp = []
            while True:
                w = st.pop(); on.discard(w); comp.append(w)
                if w == v:
                    break
            rep = max(comp)
            for w in comp:
                out[w] = rep

    for v in range(n):
        if v not in idx:
            strong(v)
    return out


def test_scc_hand_graph(spark):
    # ring 0->1->2->0, chain 2->3->4, ring 4->5->4
    edges = [(0, 1), (1, 2), (2, 0), (2, 3), (3, 4), (4, 5), (5, 4)]
    df = spark.createDataFrame(edges, "src long, dst long")
    got = {r.node: r.scc
           for r in strongly_connected_components(df).collect()}
    assert got == {0: 2, 1: 2, 2: 2, 3: 3, 4: 5, 5: 5}
    sizes = {r.scc_size: r.n_sccs for r in scc_summary(
        strongly_connected_components(df)).collect()}
    assert sizes == {3: 1, 1: 1, 2: 1}


def test_scc_differential_random_digraphs(spark):
    rng = random.Random(11)
    for trial in range(3):
        n = 40
        edges = list({(rng.randrange(n), rng.randrange(n))
                      for _ in range(70)})
        edges = [(a, b) for a, b in edges if a != b]
        exp = _tarjan(n, edges)
        df = spark.createDataFrame(edges, "src long, dst long")
        got = {r.node: r.scc
               for r in strongly_connected_components(df).collect()}
        # only nodes appearing in edges are in the frame
        touched = {a for a, _ in edges} | {b for _, b in edges}
        assert got == {v: exp[v] for v in touched}, f"trial {trial}"


def test_scc_dag_all_singletons_one_round(spark):
    edges = [(i, i + 1) for i in range(20)]
    df = spark.createDataFrame(edges, "src long, dst long")
    got = strongly_connected_components(df).collect()
    assert all(r.node == r.scc for r in got)
    assert len(got) == 21
