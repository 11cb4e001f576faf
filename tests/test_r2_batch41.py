"""Batch-41 round-2: A-priori frequent triples (operators/itemsets.py)
and the full Broder taxonomy (operators/bowtie.py::bowtie_full)."""

import random
from itertools import combinations

from knowledgebase_processor_spark.operators.bowtie import bowtie_full
from knowledgebase_processor_spark.operators.itemsets import (
    frequent_triples)


# ---------------------------------------------------------------- itemsets ----

def _triples_brute(txs, min_support):
    from collections import Counter
    c = Counter()
    for items in txs:
        for tri in combinations(sorted(set(items)), 3):
            c[tri] += 1
    return {t: n for t, n in c.items() if n >= min_support}


def test_itemsets_hand_computed(spark):
    txs = [["a", "b", "c"]] * 5 + [["a", "b", "d"]] * 3 + [["a"]] * 10
    rows = [(i, it) for i, items in enumerate(txs) for it in items]
    df = spark.createDataFrame(rows, "doc long, item string")
    got = {(r.i1, r.i2, r.i3): r.support
           for r in frequent_triples(df, min_support=4).collect()}
    assert got == {("a", "b", "c"): 5}


def test_itemsets_differential_random(spark):
    rng = random.Random(13)
    items = [f"i{k}" for k in range(8)]
    txs = [rng.sample(items, rng.randint(2, 5)) for _ in range(60)]
    rows = [(i, it) for i, t in enumerate(txs) for it in t]
    df = spark.createDataFrame(rows, "doc long, item string")
    for s in (3, 6):
        got = {(r.i1, r.i2, r.i3): r.support
               for r in frequent_triples(df, min_support=s).collect()}
        assert got == _triples_brute(txs, s), s


def test_itemsets_dedups_transaction_items(spark):
    rows = [(0, "a"), (0, "a"), (0, "b"), (0, "c")] * 2
    df = spark.createDataFrame(rows, "doc long, item string")
    got = frequent_triples(df, min_support=1).collect()
    assert [(r.i1, r.i2, r.i3, r.support) for r in got] == \
        [("a", "b", "c", 1)]


def test_itemsets_max_items_cap_drops_mega_doc(spark):
    rows = [(0, f"i{k}") for k in range(40)]
    rows += [(d, it) for d in (1, 2, 3) for it in ("p", "q", "r")]
    df = spark.createDataFrame(rows, "doc long, item string")
    got = {(r.i1, r.i2, r.i3)
           for r in frequent_triples(df, min_support=2,
                                     max_items=10).collect()}
    assert got == {("p", "q", "r")}


# -------------------------------------------------------------- full bowtie ----

def test_bowtie_full_taxonomy(spark):
    #   0 -> 1 -> [2 <-> 3] -> 4 -> 5      (in, core, out)
    #   1 -> 6 -> 4                        (tube around the core)
    #   1 -> 7                             (tendril off IN)
    #   8 -> 5                             (tendril into OUT)
    #   10 -> 11                           (disconnected)
    edges = [(0, 1), (1, 2), (2, 3), (3, 2), (3, 4), (4, 5),
             (1, 6), (6, 4), (1, 7), (8, 5), (10, 11)]
    df = spark.createDataFrame(edges, "src long, dst long")
    got = {r.node: r.region for r in bowtie_full(df).collect()}
    assert got == {0: "in", 1: "in", 2: "core", 3: "core",
                   4: "out", 5: "out", 6: "tube", 7: "tendril",
                   8: "tendril", 10: "disconnected",
                   11: "disconnected"}


def test_bowtie_full_no_other_label_remains(spark):
    edges = [(0, 1), (1, 0), (2, 3)]
    df = spark.createDataFrame(edges, "src long, dst long")
    regions = {r.region for r in bowtie_full(df).collect()}
    assert "other" not in regions
