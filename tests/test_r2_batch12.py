"""Batch-12 round-2 operators: training-shard layout (operators/shards.py)
and label-audit metrics (operators/agreement.py)."""

import hashlib
import math

import pytest

from knowledgebase_processor_spark.operators.agreement import (
    SCALE, calibration_report, cohen_kappa)
from knowledgebase_processor_spark.operators.shards import (
    shard_layout, shard_summary)


# ------------------------------------------------------------ shards ----

def _docs(spark, n=40):
    return spark.createDataFrame(
        [(f"doc{i:04d}", 100 + i) for i in range(n)],
        "doc_id string, n_chars long")


def test_shard_layout_matches_python_md5_order(spark):
    n, s = 40, 4
    out = {r.doc_id: (r.shard, r.position)
           for r in shard_layout(_docs(spark, n), s).collect()}
    ids = [f"doc{i:04d}" for i in range(n)]
    order = sorted(ids, key=lambda d: (
        hashlib.md5(f"shard|{d}".encode()).hexdigest(), d))
    for rk, d in enumerate(order):
        assert out[d] == (rk % s, rk // s), d


def test_shard_layout_balanced_and_disjoint(spark):
    laid = shard_layout(_docs(spark, 41), 8).collect()
    # 41 docs over 8 shards -> shard 0 gets 6, the rest 5
    by_shard = {}
    for r in laid:
        by_shard.setdefault(r.shard, []).append(r.position)
    assert sorted(len(v) for v in by_shard.values()) == [5] * 7 + [6]
    for sh, pos in by_shard.items():
        assert sorted(pos) == list(range(len(pos))), sh
    # layout is a permutation: every doc exactly once
    assert len({(r.shard, r.position) for r in laid}) == 41


def test_shard_layout_deterministic_and_salt_sensitive(spark):
    a = sorted((r.doc_id, r.shard, r.position)
               for r in shard_layout(_docs(spark), 4).collect())
    b = sorted((r.doc_id, r.shard, r.position)
               for r in shard_layout(_docs(spark), 4).collect())
    assert a == b
    c = sorted((r.doc_id, r.shard, r.position)
               for r in shard_layout(_docs(spark), 4, salt="v2").collect())
    assert a != c  # different salt -> different permutation


def test_shard_summary_head_doc_pins_position_zero(spark):
    laid = {(r.shard, r.position): r.doc_id
            for r in shard_layout(_docs(spark), 4).collect()}
    summ = {r.shard: r for r in shard_summary(_docs(spark), 4).collect()}
    assert set(summ) == {0, 1, 2, 3}
    for sh, r in summ.items():
        assert r.head_doc == laid[(sh, 0)]
        assert r.n_docs == 10 and r.max_position == 9


# --------------------------------------------------------- agreement ----

def _raters(spark, rows):
    return spark.createDataFrame(rows, "a boolean, b boolean")


def test_cohen_kappa_hand_computed(spark):
    # classic textbook 2x2: n11=20 n10=5 n01=10 n00=15, n=50
    rows = ([(True, True)] * 20 + [(True, False)] * 5
            + [(False, True)] * 10 + [(False, False)] * 15)
    r = cohen_kappa(_raters(spark, rows), "a", "b").collect()[0]
    assert (r.n11, r.n10, r.n01, r.n00) == (20, 5, 10, 15)
    n, a1, b1, a0, b0 = 50, 25, 30, 25, 20
    num = n * 35 - (a1 * b1 + a0 * b0)
    den = n * n - (a1 * b1 + a0 * b0)
    assert r.po_ppm == 35 * SCALE // 50
    assert (r.kappa_num, r.kappa_den) == (num, den)
    assert r.kappa_milli == num * 1000 // den
    # and the float identity holds
    po, pe = 35 / 50, (a1 * b1 + a0 * b0) / (n * n)
    assert abs(r.kappa_milli / 1000 - (po - pe) / (1 - pe)) < 2e-3


def test_cohen_kappa_perfect_and_chance(spark):
    perfect = [(True, True)] * 7 + [(False, False)] * 13
    r = cohen_kappa(_raters(spark, perfect), "a", "b").collect()[0]
    assert r.kappa_milli == 1000 and r.po_ppm == SCALE
    # independent raters: po == pe -> kappa 0 (exact with these counts)
    chance = ([(True, True)] * 1 + [(True, False)] * 1
              + [(False, True)] * 1 + [(False, False)] * 1)
    r = cohen_kappa(_raters(spark, chance), "a", "b").collect()[0]
    assert r.kappa_num == 0 and r.kappa_milli == 0


def test_calibration_bins_and_ece_exact(spark):
    # 20 rows, score = i, label = top half -> perfectly calibrated-ish
    rows = [(f"r{i:02d}", float(i), i >= 10) for i in range(20)]
    df = spark.createDataFrame(rows, "rid string, s double, y boolean")
    out = {r.bin: r for r in
           calibration_report(df, "s", "y", "rid", n_bins=10).collect()}
    assert set(out) == set(range(10)) | {-1}
    n = 20
    # replicate: p_ppm = (rank-1)*SCALE DIV (n-1); bin = p*10 DIV SCALE
    bins = {}
    for i in range(n):
        p = i * SCALE // (n - 1)
        b = min(p * 10 // SCALE, 9)
        e = bins.setdefault(b, [0, 0, 0])
        e[0] += 1
        e[1] += p
        e[2] += 1 if i >= 10 else 0
    for b, (cnt, sp, npos) in bins.items():
        assert (out[b].n, out[b].sum_p_ppm, out[b].n_pos) == (cnt, sp, npos)
        assert out[b].gap_abs == abs(sp - npos * SCALE)
    ece = sum(abs(sp - npos * SCALE) for _, sp, npos in bins.values()) // n
    assert out[-1].gap_abs == ece
    assert out[-1].n == n


def test_calibration_ece_is_order_independent(spark):
    rows = [(f"r{i:03d}", float((i * 37) % 101), i % 3 == 0)
            for i in range(101)]
    df = spark.createDataFrame(rows, "rid string, s double, y boolean")
    a = sorted(map(tuple, calibration_report(
        df, "s", "y", "rid").collect()))
    b = sorted(map(tuple, calibration_report(
        df.repartition(7), "s", "y", "rid").collect()))
    assert a == b
