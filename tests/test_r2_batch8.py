"""Round-2 additions, batch 8: leakage-safe cluster splits, HITS
hubs/authorities, personalized PageRank, KMV hierarchical rollup —
each against its defining invariant (no cross-split near-dup pair,
fixed-point determinism + hand-computed tiny graph, all-seeds PPR ==
uniform PageRank, sketch-merge == recompute)."""

import hashlib

import pytest
from pyspark.sql import functions as F

from knowledgebase_processor_spark.operators.hits import SCALE, hits
from knowledgebase_processor_spark.operators.pagerank import (
    pagerank, personalized_pagerank)
from knowledgebase_processor_spark.operators.sketches import (
    kmv_distinct, kmv_rollup)
from knowledgebase_processor_spark.operators.split import (
    cluster_safe_split, split_column)


# ----------------------------------------------- cluster-safe split ----

def _docs(spark, rows):
    return spark.createDataFrame(rows, "doc_id long, n_chars long")


def test_cluster_safe_split_groups_stay_together(spark):
    # components {1,2,3} (chained, NOT a clique — CC must close the
    # transitive chain), {10, 11}; 20/21 singletons
    docs = _docs(spark, [(i, 100) for i in (1, 2, 3, 10, 11, 20, 21)])
    pairs = spark.createDataFrame(
        [(1, 2), (2, 3), (10, 11)], "doc_a long, doc_b long")
    out = cluster_safe_split(docs, pairs).collect()
    by_id = {r.doc_id: r for r in out}
    assert {by_id[i].split for i in (1, 2, 3)} == {by_id[1].split}
    assert {by_id[i].cluster for i in (1, 2, 3)} == {1}
    assert by_id[10].split == by_id[11].split
    assert by_id[10].cluster == 10
    # singletons: cluster is the doc itself, split is the plain hash
    # split of the doc id under the same salt
    expected = docs.filter(F.col("doc_id") >= 20).select(
        "doc_id", split_column(F.col("doc_id").cast("string"),
                               {"train": 0.8, "val": 0.1, "test": 0.1},
                               "css")).collect()
    for r in expected:
        assert by_id[r.doc_id].split == r.split
        assert by_id[r.doc_id].cluster == r.doc_id


def test_cluster_safe_split_zero_leakage_on_random_graph(spark):
    import random
    rng = random.Random(8)
    n = 300
    docs = _docs(spark, [(i, 10) for i in range(n)])
    edges = [(rng.randrange(n), rng.randrange(n)) for _ in range(120)]
    edges = [(a, b) for a, b in edges if a != b]
    pairs = spark.createDataFrame(edges, "doc_a long, doc_b long")
    assigned = cluster_safe_split(docs, pairs)
    sp = assigned.select("doc_id", "split")
    leaked = (pairs
              .join(sp.withColumnRenamed("doc_id", "doc_a")
                      .withColumnRenamed("split", "sa"), "doc_a")
              .join(sp.withColumnRenamed("doc_id", "doc_b")
                      .withColumnRenamed("split", "sb"), "doc_b")
              .filter(F.col("sa") != F.col("sb")).count())
    assert leaked == 0


# --------------------------------------------------------------- HITS ----

def test_hits_star_graph(spark):
    # hub 0 -> {1..4}; node 5 -> 1 as a weaker hub.  Authority mass
    # concentrates on 1 (two in-links), hub mass on 0 (four out-links).
    edges = spark.createDataFrame(
        [(0, 1), (0, 2), (0, 3), (0, 4), (5, 1)], "src long, dst long")
    out = {r.node: (r.hub, r.auth) for r in hits(edges, iterations=3).collect()}
    assert out[0][0] == SCALE                  # best hub, max-normalized
    assert out[1][1] == SCALE                  # best authority
    assert out[5][0] < out[0][0]
    assert out[2][1] < out[1][1]
    assert out[0][1] == 0 and out[1][0] == 0   # pure hub / pure authority
    # deterministic across independent runs (fixed-point arithmetic)
    again = {r.node: (r.hub, r.auth)
             for r in hits(edges, iterations=3).collect()}
    assert out == again


def test_hits_hand_computed_two_rounds(spark):
    # a->c, b->c, c->d : auth(c)=2 hubs, auth(d)=1 hub after round 1
    edges = spark.createDataFrame(
        [("a", "c"), ("b", "c"), ("c", "d")], "src string, dst string")
    out = {r.node: (r.hub, r.auth) for r in hits(edges, iterations=1).collect()}
    # round 1: auth raw c=2M, d=1M -> norm c=SCALE, d=SCALE//2
    assert out["c"][1] == SCALE and out["d"][1] == SCALE // 2
    # hubs from those auths: a=b=auth(c)=SCALE, c=auth(d)=SCALE//2
    assert out["a"][0] == SCALE and out["b"][0] == SCALE
    assert out["c"][0] == SCALE // 2 and out["d"][0] == 0


# ------------------------------------------------ personalized PR ----

def test_ppr_all_seeds_equals_uniform_pagerank(spark):
    edges = spark.createDataFrame(
        [(i, i // 2) for i in range(1, 40)], "src long, dst long")
    nodes = (edges.select(F.col("src").alias("node"))
             .union(edges.select(F.col("dst").alias("node"))).distinct())
    pr = {r.node: r["rank"] for r in pagerank(edges, iterations=4).collect()}
    ppr = {r.node: r["rank"]
           for r in personalized_pagerank(edges, nodes,
                                          iterations=4).collect()}
    assert pr.keys() == ppr.keys()
    for n in pr:
        assert abs(pr[n] - ppr[n]) < 1e-12


def test_ppr_mass_conserved_and_localized(spark):
    edges = spark.createDataFrame(
        [(i, i // 2) for i in range(1, 40)], "src long, dst long")
    seeds = spark.createDataFrame([(19,)], "node long")
    rows = personalized_pagerank(edges, seeds, iterations=6).collect()
    ranks = {r.node: r["rank"] for r in rows}
    assert abs(sum(ranks.values()) - 1.0) < 1e-9
    # teleport goes only to the seed: nodes not reachable FROM the seed
    # (e.g. 38, a leaf on another branch) have exactly zero rank
    assert ranks[38] == 0.0
    # the seed's ancestors (19 -> 9 -> 4 -> 2 -> 1 -> 0) carry rank
    for n in (19, 9, 4, 2, 1, 0):
        assert ranks[n] > 0.0


def test_ppr_empty_seed_set(spark):
    edges = spark.createDataFrame([(1, 0)], "src long, dst long")
    seeds = spark.createDataFrame([], "node long")
    rows = personalized_pagerank(edges, seeds, iterations=2).collect()
    assert {r["rank"] for r in rows} == {0.0}


# ------------------------------------------------------ KMV rollup ----

def test_kmv_rollup_merge_equals_recompute(spark):
    # the mergeability theorem: rolled-up sketch levels must EXACTLY
    # equal sketches computed directly from the data at that grain
    rows = [(f"s{i % 5}", f"l{i % 3}", f"value-{i % 211}")
            for i in range(2000)]
    df = spark.createDataFrame(rows, "source string, lang string, v string")
    rolled = kmv_rollup(df, ["source", "lang"], "v", k=16)
    direct_src = {r.source: (r.kmv_kth, r.kmv_estimate)
                  for r in kmv_distinct(df, ["source"], "v", k=16).collect()}
    got_src = {r.source: (r.kmv_kth, r.kmv_estimate)
               for r in rolled.filter(F.col("level") == "source").collect()}
    assert got_src == direct_src
    tot = rolled.filter(F.col("level") == "total").collect()[0]
    direct_tot = kmv_distinct(df.withColumn("g", F.lit(1)), ["g"], "v",
                              k=16).collect()[0]
    assert (tot.kmv_kth, tot.kmv_estimate) == \
        (direct_tot.kmv_kth, direct_tot.kmv_estimate)


def test_kmv_rollup_small_groups_exact(spark):
    # groups under k: estimate is the exact distinct count at every level
    rows = [("a", "x", f"v{i}") for i in range(5)] + \
           [("a", "y", f"v{i}") for i in range(3, 10)] + \
           [("b", "x", f"w{i}") for i in range(4)]
    df = spark.createDataFrame(rows, "source string, lang string, v string")
    out = {(r.level, r.source, r.lang): r.kmv_estimate
           for r in kmv_rollup(df, ["source", "lang"], "v", k=64).collect()}
    assert out[("source|lang", "a", "x")] == 5.0
    assert out[("source|lang", "a", "y")] == 7.0
    assert out[("source", "a", "*")] == 10.0   # v0..v9 union, deduped
    assert out[("source", "b", "*")] == 4.0
    assert out[("total", "*", "*")] == 14.0
