"""Batch-44 round-2: UCB1 crawl probing (operators/ucb.py) and
incremental connected components (operators/components.py)."""

import math
import random

from knowledgebase_processor_spark.operators.components import (
    connected_components, incremental_components)
from knowledgebase_processor_spark.operators.ucb import ucb_scores


# -------------------------------------------------------------------- UCB1 ----

def test_ucb_hand_computed(spark):
    rows = ([("a", True)] * 3 + [("a", False)] * 7
            + [("b", True)] * 1 + [("b", False)] * 1)
    df = spark.createDataFrame(rows, "host string, changed boolean")
    got = {r.host: r for r in ucb_scores(df).collect()}
    n_total = 12
    for h, pulls, ch in (("a", 10, 3), ("b", 2, 1)):
        exp = ch / pulls + math.sqrt(2 * math.log(n_total) / pulls)
        assert got[h].ucb_micro == round(1e6 * exp)
    # the under-sampled host outranks the well-sampled one despite
    # similar change rates — the exploration bonus at work
    assert got["b"].ucb_micro > got["a"].ucb_micro


def test_ucb_exploration_shrinks_with_pulls(spark):
    rows = [("h", False)] * 100 + [("rare", False)] * 2
    df = spark.createDataFrame(rows, "host string, changed boolean")
    got = {r.host: r.ucb_micro for r in ucb_scores(df).collect()}
    assert got["rare"] > got["h"]


# ---------------------------------------------------------- incremental CC ----

def _assign(spark, edges):
    df = spark.createDataFrame(edges, "src long, dst long")
    return connected_components(df)


def test_incremental_matches_full_rerun_random(spark):
    rng = random.Random(23)
    n = 60
    old = list({(rng.randrange(n), rng.randrange(n)) for _ in range(50)})
    new = list({(rng.randrange(n), rng.randrange(n)) for _ in range(12)})
    old = [(a, b) for a, b in old if a != b]
    new = [(a, b) for a, b in new if a != b]
    old_df = spark.createDataFrame(old, "src long, dst long")
    new_df = spark.createDataFrame(new, "src long, dst long")
    assignment = connected_components(old_df)
    inc = {r.node: r.component for r in incremental_components(
        assignment, old_df, new_df).collect()}
    full = {r.node: r.component for r in connected_components(
        old_df.unionByName(new_df)).collect()}
    # nodes only in old edges keep old labels; incremental must agree
    # with the full re-run on every node the full run knows about
    for node, comp in full.items():
        assert inc[node] == comp, node
    # and untouched old nodes must still be present
    old_nodes = {a for a, _ in old} | {b for _, b in old}
    assert old_nodes <= set(inc)


def test_incremental_untouched_components_pass_through(spark):
    old = [(0, 1), (10, 11)]
    new = [(1, 2)]
    old_df = spark.createDataFrame(old, "src long, dst long")
    new_df = spark.createDataFrame(new, "src long, dst long")
    assignment = connected_components(old_df)
    inc = {r.node: r.component for r in incremental_components(
        assignment, old_df, new_df).collect()}
    assert inc == {0: 0, 1: 0, 2: 0, 10: 10, 11: 10}


def test_incremental_merges_two_old_components(spark):
    old = [(0, 1), (5, 6)]
    new = [(1, 5)]
    old_df = spark.createDataFrame(old, "src long, dst long")
    new_df = spark.createDataFrame(new, "src long, dst long")
    inc = {r.node: r.component for r in incremental_components(
        connected_components(old_df), old_df, new_df).collect()}
    assert inc == {0: 0, 1: 0, 5: 0, 6: 0}
