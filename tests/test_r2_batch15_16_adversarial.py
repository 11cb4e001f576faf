"""Adversarial / corner shapes for the batch-15/16 operators (the
round-1 bug-class lane: degenerate graphs, empty frames, cycles,
tombstone-only logs, literal guards)."""

import datetime as dt

from pyspark.sql import functions as F

from knowledgebase_processor_spark.operators.delta import latest_assertions
from knowledgebase_processor_spark.operators.kgtrain import transe_negatives
from knowledgebase_processor_spark.operators.neighbors import sample_neighbors
from knowledgebase_processor_spark.operators.rdfs import (
    RDF_TYPE, RDFS_SUBCLASS, rdfs_closure)
from knowledgebase_processor_spark.operators.sameas import canonicalize_triples
from knowledgebase_processor_spark.operators.stats import predicate_profile


def test_rdfs_closure_survives_subclass_cycle(spark):
    # A subClassOf B, B subClassOf A: the doubling closure saturates
    # instead of looping; both classes type the instance.
    t = spark.createDataFrame(
        [("C1", RDFS_SUBCLASS, "C2"), ("C2", RDFS_SUBCLASS, "C1"),
         ("x", RDF_TYPE, "C1")],
        "subj string, pred string, obj string")
    got = {(r.subj, r.pred, r.obj) for r in rdfs_closure(t).collect()}
    assert ("x", RDF_TYPE, "C2") in got
    assert ("C1", RDFS_SUBCLASS, "C1") in got  # cycle closes reflexively


def test_rdfs_closure_no_schema_is_identity(spark):
    t = spark.createDataFrame([("a", "p", "b")],
                              "subj string, pred string, obj string")
    assert [(r.subj, r.pred, r.obj) for r in rdfs_closure(t).collect()] \
        == [("a", "p", "b")]


def test_sameas_empty_edges_passthrough(spark):
    t = spark.createDataFrame([("a", "p", "b")],
                              "subj string, pred string, obj string")
    edges = spark.createDataFrame([], "src string, dst string")
    assert [(r.subj, r.obj)
            for r in canonicalize_triples(t, edges).collect()] == [("a", "b")]


def test_sample_neighbors_isolated_seed_and_empty_fanout_tail(spark):
    edges = spark.createDataFrame([(1, 2)], "src long, dst long")
    seeds = spark.createDataFrame([(99,), (1,)], "seed long")
    rows = {(r.seed, r.hop, r.src, r.dst)
            for r in sample_neighbors(edges, seeds, fanout=(3, 2)).collect()}
    # isolated seed contributes nothing; hop 2 dies at the sink node 2.
    assert rows == {(1, 1, 1, 2)}


def test_transe_negatives_single_entity_vocab_all_degenerate(spark):
    t = spark.createDataFrame([("a", "p", "a")],
                              "subj string, pred string, obj string")
    ents = spark.createDataFrame([(0, "a")], "ent_idx long, ent_id string")
    assert transe_negatives(t, ents, k=3).count() == 0


def test_predicate_profile_empty_frame(spark):
    t = spark.createDataFrame([], "subj string, pred string, obj string")
    assert predicate_profile(t).count() == 0


def test_latest_assertions_tombstone_only_log_empties(spark):
    a = spark.createDataFrame(
        [("s", "p", "o", dt.datetime(2024, 1, 1), "delete")],
        "subj string, pred string, obj string, ts timestamp, op string")
    assert latest_assertions(a).count() == 0


def test_latest_assertions_resurrection_after_tombstone(spark):
    rows = [("s", "p", "o1", dt.datetime(2024, 1, 1), "upsert"),
            ("s", "p", "o1", dt.datetime(2024, 1, 2), "delete"),
            ("s", "p", "o2", dt.datetime(2024, 1, 3), "upsert")]
    a = spark.createDataFrame(
        rows, "subj string, pred string, obj string, ts timestamp, op string")
    got = [(r.subj, r.pred, r.obj) for r in latest_assertions(a).collect()]
    assert got == [("s", "p", "o2")]
