"""Batch-15 round-2 operators: RDFS entailment closure
(operators/rdfs.py), owl:sameAs canonicalization (operators/sameas.py),
deterministic k-hop neighbor sampling (operators/neighbors.py)."""

import hashlib

from pyspark.sql import functions as F

from knowledgebase_processor_spark.operators.neighbors import (
    sample_neighbors)
from knowledgebase_processor_spark.operators.rdfs import (
    RDF_TYPE, RDFS_DOMAIN, RDFS_RANGE, RDFS_SUBCLASS, RDFS_SUBPROP,
    rdfs_closure)
from knowledgebase_processor_spark.operators.sameas import (
    canonicalize_triples, sameas_labels)


def _triples(spark, rows):
    return spark.createDataFrame(rows, "subj string, pred string, obj string")


# -------------------------------------------------------- rdfs closure ----

def _closure_set(spark, rows):
    return {(r.subj, r.pred, r.obj)
            for r in rdfs_closure(_triples(spark, rows)).collect()}


def test_rdfs_subclass_transitive_and_type_inheritance(spark):
    got = _closure_set(spark, [
        ("C1", RDFS_SUBCLASS, "C2"), ("C2", RDFS_SUBCLASS, "C3"),
        ("x", RDF_TYPE, "C1")])
    # rdfs11 closes the chain, rdfs9 lifts the instance through it.
    assert ("C1", RDFS_SUBCLASS, "C3") in got
    assert {("x", RDF_TYPE, c) for c in ("C1", "C2", "C3")} <= got


def test_rdfs_subproperty_domain_range(spark):
    got = _closure_set(spark, [
        ("p", RDFS_SUBPROP, "q"),
        ("q", RDFS_DOMAIN, "D"), ("q", RDFS_RANGE, "R"),
        ("a", "p", "b")])
    assert ("a", "q", "b") in got            # rdfs7
    assert ("a", RDF_TYPE, "D") in got       # rdfs2 via effective domain
    assert ("b", RDF_TYPE, "R") in got       # rdfs3 via effective range
    assert ("a", "p", "b") in got            # original kept


def test_rdfs_range_skips_literals_and_is_idempotent(spark):
    rows = [("p", RDFS_RANGE, "R"), ("p", RDFS_DOMAIN, "D"),
            ("a", "p", "lit-1")]
    t = _triples(spark, rows).withColumn("obj_is_uri",
                                         F.col("obj") != "lit-1")
    got = {(r.subj, r.pred, r.obj) for r in rdfs_closure(t).collect()}
    assert ("a", RDF_TYPE, "D") in got
    assert ("lit-1", RDF_TYPE, "R") not in got
    # idempotence: closing the closure (same literal flag) adds nothing.
    again = rdfs_closure(
        _triples(spark, [(s, p, o) for (s, p, o) in got])
        .withColumn("obj_is_uri", F.col("obj") != "lit-1"))
    assert {(r.subj, r.pred, r.obj) for r in again.collect()} == got


def test_rdfs_python_replication_on_random_ontology(spark):
    # brute-force fixpoint in python vs the one-pass broadcast plan.
    rows = [(f"C{i}", RDFS_SUBCLASS, f"C{i // 2}") for i in range(1, 8)]
    rows += [(f"p{i}", RDFS_SUBPROP, f"p{i // 2}") for i in range(1, 4)]
    rows += [(f"p{i}", RDFS_DOMAIN, f"C{i}") for i in range(4)]
    rows += [(f"p{i}", RDFS_RANGE, f"C{i + 3}") for i in range(4)]
    for i in range(20):
        rows.append((f"e{i}", f"p{i % 4}", f"e{(i * 7 + 1) % 20}"))
        rows.append((f"e{i}", RDF_TYPE, f"C{i % 8}"))

    want = set(rows)
    changed = True
    while changed:
        changed = False
        snap = list(want)
        sc = {(s, o) for s, p, o in snap if p == RDFS_SUBCLASS}
        sp = {(s, o) for s, p, o in snap if p == RDFS_SUBPROP}
        new = set()
        new |= {(a, RDFS_SUBCLASS, c) for a, b in sc for b2, c in sc if b == b2}
        new |= {(a, RDFS_SUBPROP, c) for a, b in sp for b2, c in sp if b == b2}
        for s, p, o in snap:
            if p in (RDFS_SUBCLASS, RDFS_SUBPROP, RDFS_DOMAIN, RDFS_RANGE):
                continue
            for p1, p2 in sp:
                if p == p1:
                    new.add((s, p2, o))
            for pp, c in {(s2, o2) for s2, p2, o2 in snap
                          if p2 == RDFS_DOMAIN}:
                if p == pp:
                    new.add((s, RDF_TYPE, c))
            for pp, c in {(s2, o2) for s2, p2, o2 in snap
                          if p2 == RDFS_RANGE}:
                if p == pp and p != RDF_TYPE:
                    new.add((o, RDF_TYPE, c))
            if p == RDF_TYPE:
                for c1, c2 in sc:
                    if o == c1:
                        new.add((s, RDF_TYPE, c2))
        if not new <= want:
            want |= new
            changed = True

    assert _closure_set(spark, rows) == want


# ------------------------------------------------ sameAs canonicalize ----

def test_sameas_chain_elects_min_and_rewrites_both_positions(spark):
    edges = spark.createDataFrame(
        [("e3", "e4"), ("e4", "e5")], "src string, dst string")
    labels = {r.node: r.canonical for r in sameas_labels(edges).collect()}
    assert labels == {"e3": "e3", "e4": "e3", "e5": "e3"}

    t = _triples(spark, [
        ("e4", "knows", "e9"), ("e5", "knows", "e9"),   # coalesce to one
        ("e9", "knows", "e5"),                           # object rewrite
        ("e1", "knows", "e2")])                          # untouched
    got = {(r.subj, r.pred, r.obj)
           for r in canonicalize_triples(t, edges).collect()}
    assert got == {("e3", "knows", "e9"), ("e9", "knows", "e3"),
                   ("e1", "knows", "e2")}


def test_sameas_literals_never_rewrite(spark):
    edges = spark.createDataFrame([("lit", "e1")], "src string, dst string")
    t = spark.createDataFrame([("e9", "label", "lit", False)],
                              "subj string, pred string, obj string, "
                              "obj_is_uri boolean")
    got = canonicalize_triples(t, edges).collect()
    assert [(r.subj, r.obj) for r in got] == [("e9", "lit")]


# ------------------------------------------------- neighbor sampling ----

def _md5_60(s: str) -> int:
    return int(hashlib.md5(s.encode()).hexdigest()[:15], 16)


def test_sample_neighbors_matches_python_replay_and_caps_fanout(spark):
    n = 40
    pairs = []
    for i in range(n):
        for j in (7, 11, 13, 17):
            pairs.append((i, (i * j + 1) % n))
    edges = spark.createDataFrame(sorted(set(pairs)), "src long, dst long")
    seeds = spark.createDataFrame([(i,) for i in range(5)], "seed long")
    got = sample_neighbors(edges, seeds, fanout=(3, 2))
    rows = {(r.seed, r.hop, r.src, r.dst) for r in got.collect()}

    adj = {}
    for s, d in sorted(set(pairs)):
        adj.setdefault(s, []).append(d)

    def pick(node, k):
        return sorted(adj.get(node, []),
                      key=lambda d: (_md5_60(f"{node}|{d}"), d))[:k]

    want = set()
    for seed in range(5):
        hop1 = pick(seed, 3)
        want |= {(seed, 1, seed, d) for d in hop1}
        for nd in sorted(set(hop1)):
            want |= {(seed, 2, nd, d) for d in pick(nd, 2)}
    assert rows == want
    # fan-out bound: <= 3 + 3*2 edges per seed.
    per_seed = {}
    for s, h, a, b in rows:
        per_seed[s] = per_seed.get(s, 0) + 1
    assert all(v <= 9 for v in per_seed.values())


def test_sample_neighbors_full_fanout_equals_ego_net(spark):
    edges = spark.createDataFrame(
        [(1, 2), (1, 3), (2, 4)], "src long, dst long")
    seeds = spark.createDataFrame([(1,)], "seed long")
    rows = {(r.hop, r.src, r.dst)
            for r in sample_neighbors(edges, seeds, fanout=(10, 10)).collect()}
    assert rows == {(1, 1, 2), (1, 1, 3), (2, 2, 4)}
