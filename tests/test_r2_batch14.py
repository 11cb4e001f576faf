"""Batch-14 round-2 operators: local clustering coefficient
(operators/triangles.py::node_clustering), classification report
(operators/agreement.py), inter-arrival burstiness
(operators/arrival.py), k-anonymity audit (operators/kanon.py)."""

import datetime as dt
import math
from collections import Counter

from knowledgebase_processor_spark.operators.agreement import (
    classification_report)
from knowledgebase_processor_spark.operators.arrival import (
    interarrival_stats)
from knowledgebase_processor_spark.operators.kanon import (
    class_size_histogram, k_anonymity_report)
from knowledgebase_processor_spark.operators.triangles import (
    node_clustering)

PPM = 1_000_000


def _edges(spark, pairs):
    return spark.createDataFrame(pairs, "src long, dst long")


# ---------------------------------------------------- node clustering ----

def test_lcc_triangle_is_one_path_is_zero(spark):
    out = {r.node: r for r in node_clustering(
        _edges(spark, [(1, 2), (2, 3), (1, 3)])).collect()}
    for n in (1, 2, 3):
        assert (out[n].deg, out[n].n_triangles, out[n].lcc) == (2, 1, 1.0)
    assert out[-1].lcc == 1.0  # transitivity of K3
    path = {r.node: r for r in node_clustering(
        _edges(spark, [(1, 2), (2, 3)])).collect()}
    assert path[2].n_triangles == 0 and path[2].lcc == 0.0
    assert path[1].lcc is None  # degree-1: undefined
    assert path[-1].lcc == 0.0


def test_lcc_matches_python(spark):
    pairs = [(1, 2), (2, 3), (1, 3), (3, 4), (4, 5), (3, 5), (5, 6),
             (1, 4)]
    out = {r.node: r for r in node_clustering(_edges(spark, pairs))
           .collect()}
    adj = {}
    for a, b in pairs:
        adj.setdefault(a, set()).add(b)
        adj.setdefault(b, set()).add(a)
    tri_total = 0
    for n, nb in adj.items():
        nb = sorted(nb)
        t = sum(1 for i, x in enumerate(nb) for y in nb[i + 1:]
                if y in adj[x])
        tri_total += t
        d = len(nb)
        assert (out[n].deg, out[n].n_triangles) == (d, t), n
        assert out[n].lcc_num == 2 * t
        assert out[n].lcc_den == d * (d - 1)
        if d > 1:
            assert out[n].lcc == 2 * t / (d * (d - 1))
    wedges2 = sum(len(nb) * (len(nb) - 1) for nb in adj.values())
    assert out[-1].n_triangles == tri_total  # == 3 * #triangles
    assert out[-1].lcc == 2 * tri_total / wedges2  # transitivity


# ----------------------------------------------- classification report ----

def _preds(spark, rows):
    return spark.createDataFrame(rows, "truth string, pred string")


def test_classification_report_hand_computed(spark):
    rows = ([("a", "a")] * 8 + [("a", "b")] * 2       # a: tp 8, fn 2
            + [("b", "b")] * 5 + [("b", "a")] * 3     # b: tp 5, fn 3
            + [("b", "c")] * 1)                       # c appears pred-only
    out = {r["class"]: r for r in classification_report(
        _preds(spark, rows), "truth", "pred").collect()}
    a = out["a"]
    assert (a.tp, a.fp, a.fn, a.support) == (8, 3, 2, 10)
    assert a.prec_ppm == 8 * PPM // 11
    assert a.rec_ppm == 8 * PPM // 10
    assert a.f1_ppm == 16 * PPM // (16 + 3 + 2)
    c = out["c"]
    assert (c.tp, c.fp, c.fn, c.support) == (0, 1, 0, 0)
    assert c.prec_ppm == 0 and c.rec_ppm is None
    m = out["<micro>"]
    assert m.tp == 13 and m.fp == m.fn == 6  # micro: fp total == fn total
    assert m.prec_ppm == m.rec_ppm == m.f1_ppm == 13 * PPM // 19


def test_classification_perfect_prediction(spark):
    rows = [("x", "x")] * 4 + [("y", "y")] * 6
    out = {r["class"]: r for r in classification_report(
        _preds(spark, rows), "truth", "pred").collect()}
    for c in ("x", "y", "<micro>"):
        assert out[c].f1_ppm == PPM and out[c].fp == out[c].fn == 0


# ----------------------------------------------------- inter-arrival ----

def _events(spark, rows):
    return spark.createDataFrame(rows, "event_id long, user_id long, "
                                       "ts timestamp_ntz")


def _ts(s):
    return dt.datetime(2024, 1, 1) + dt.timedelta(seconds=s)


def test_interarrival_hand_computed(spark):
    rows = [(1, 7, _ts(0)), (2, 7, _ts(10)), (3, 7, _ts(40)),
            (4, 9, _ts(5))]
    out = {r.key: r for r in interarrival_stats(
        _events(spark, rows)).collect()}
    u = out[7]
    assert (u.n_events, u.n_gaps, u.sum_gap_s) == (3, 2, 40)
    assert u.sum_sq_gap_s == 100 + 900
    assert (u.min_gap_s, u.max_gap_s) == (10, 30)
    assert u.b_num == 2 * 1000 - 1600
    mean, var = 20.0, (2 * 1000 - 1600) / 4
    sigma = math.sqrt(var)
    assert abs(u.burstiness - (sigma - mean) / (sigma + mean)) < 1e-12
    lone = out[9]
    assert (lone.n_events, lone.n_gaps, lone.sum_gap_s) == (1, 0, 0)
    assert lone.burstiness is None and lone.min_gap_s is None


def test_interarrival_regular_process_is_minus_one(spark):
    rows = [(i, 1, _ts(60 * i)) for i in range(10)]
    out = interarrival_stats(_events(spark, rows)).collect()[0]
    # sigma = 0 -> B = (0 - mu)/(0 + mu) = -1 exactly
    assert out.b_num == 0 and out.burstiness == -1.0


def test_interarrival_subsecond_gaps_floor_to_zero(spark):
    rows = [(i, 1, dt.datetime(2024, 1, 1, 0, 0, 0, 300_000 * i))
            for i in range(4)]
    out = interarrival_stats(_events(spark, rows)).collect()[0]
    assert out.sum_gap_s == 0 and out.n_gaps == 3


# ------------------------------------------------------- k-anonymity ----

def _tbl(spark, rows):
    return spark.createDataFrame(rows, "a string, b long")


def test_k_anonymity_hand_computed(spark):
    rows = ([("x", 1)] * 5 + [("x", 2)] * 2 + [("y", 1)] * 1)
    out = {r.k: r for r in k_anonymity_report(
        _tbl(spark, rows), ["a", "b"], ks=[2, 3]).collect()}
    k2 = out[2]
    assert (k2.n_rows, k2.n_groups, k2.min_group_size) == (8, 3, 1)
    assert (k2.n_violating_groups, k2.rows_at_risk) == (1, 1)
    assert k2.risk_ppm == 1 * PPM // 8
    k3 = out[3]
    assert (k3.n_violating_groups, k3.rows_at_risk) == (2, 3)


def test_class_size_histogram(spark):
    rows = ([("x", 1)] * 4 + [("y", 1)] * 4 + [("z", 1)] * 2)
    out = {r.size: r for r in class_size_histogram(
        _tbl(spark, rows), ["a"]).collect()}
    assert (out[4].n_groups, out[4].n_rows) == (2, 8)
    assert (out[2].n_groups, out[2].n_rows) == (1, 2)


def test_k_anonymity_all_unique_everything_at_risk(spark):
    rows = [(f"u{i}", i) for i in range(10)]
    out = k_anonymity_report(_tbl(spark, rows), ["a"], ks=[2]).collect()[0]
    assert out.rows_at_risk == 10 and out.risk_ppm == PPM
