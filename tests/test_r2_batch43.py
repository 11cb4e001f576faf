"""Batch-43 round-2: WL color refinement (operators/wl.py),
conductance sweep (operators/conductance.py), streaming EWMA twin
(streaming/stateful.py)."""

import pandas as pd

from knowledgebase_processor_spark.operators.conductance import (
    conductance_sweep)
from knowledgebase_processor_spark.operators.ewma import ewma_flags
from knowledgebase_processor_spark.operators.wl import (
    wl_colors, wl_histogram)
from knowledgebase_processor_spark.streaming.stateful import (
    apply_ewma_state)


# ---------------------------------------------------------------------- WL ----

def test_wl_distinguishes_star_from_path(spark):
    # star K1,3 vs path P4: same degree SEQUENCE histograms after
    # round 1 differ already (center deg 3)
    star = spark.createDataFrame([(0, 1), (0, 2), (0, 3)],
                                 "src long, dst long")
    path = spark.createDataFrame([(0, 1), (1, 2), (2, 3)],
                                 "src long, dst long")
    hs = {r.color: r.n_nodes for r in wl_histogram(
        wl_colors(star, rounds=2, max_degree=None)).collect()}
    hp = {r.color: r.n_nodes for r in wl_histogram(
        wl_colors(path, rounds=2, max_degree=None)).collect()}
    assert hs != hp
    assert sorted(hs.values()) == [1, 3]     # center vs 3 leaves
    assert sorted(hp.values()) == [2, 2]     # ends vs middles


def test_wl_symmetric_ring_single_color(spark):
    ring = spark.createDataFrame(
        [(i, (i + 1) % 6) for i in range(6)], "src long, dst long")
    h = wl_histogram(wl_colors(ring, rounds=3, max_degree=None)).collect()
    assert len(h) == 1 and h[0].n_nodes == 6


def test_wl_isomorphic_graphs_same_histogram(spark):
    g1 = spark.createDataFrame([(0, 1), (1, 2), (2, 0), (2, 3)],
                               "src long, dst long")
    g2 = spark.createDataFrame([(10, 21), (21, 32), (32, 10), (32, 43)],
                               "src long, dst long")
    h1 = sorted((r.color, r.n_nodes) for r in wl_histogram(
        wl_colors(g1, rounds=3, max_degree=None)).collect())
    h2 = sorted((r.color, r.n_nodes) for r in wl_histogram(
        wl_colors(g2, rounds=3, max_degree=None)).collect())
    assert h1 == h2


def test_wl_max_degree_drops_hub(spark):
    edges = [(0, i) for i in range(1, 20)] + [(30, 31)]
    df = spark.createDataFrame(edges, "src long, dst long")
    got = {r.node for r in wl_colors(df, rounds=1,
                                     max_degree=5).collect()}
    assert got == {30, 31}


# -------------------------------------------------------------- conductance ----

def test_conductance_two_cliques_bridge(spark):
    from itertools import combinations
    edges = (list(combinations(range(4), 2))
             + [(a + 10, b + 10) for a, b in combinations(range(4), 2)]
             + [(3, 10)])
    df = spark.createDataFrame(edges, "src long, dst long")
    scores = spark.createDataFrame(
        [(n, -n) for n in list(range(4)) + list(range(10, 14))],
        "node long, score long")
    rows = {r.rank: r for r in conductance_sweep(df, scores).collect()}
    # prefix of 4 = clique A: cut 1, vol 3*3+4=13, phi = 1/13
    assert rows[4].cut == 1
    assert rows[4].cond_ppm == 1_000_000 // 13
    assert rows[4].cond_ppm == min(
        r.cond_ppm for r in rows.values() if r.cond_ppm is not None)
    # full prefix: cut 0
    assert rows[8].cut == 0


def test_conductance_isolated_scored_node(spark):
    # a scored node with no edges: deg 0, contributes nothing
    df = spark.createDataFrame([(0, 1)], "src long, dst long")
    scores = spark.createDataFrame([(0, 2), (1, 1), (9, 0)],
                                   "node long, score long")
    rows = {r.rank: r for r in conductance_sweep(df, scores).collect()}
    assert rows[1].cut == 1 and rows[1].cond_ppm == 1_000_000
    assert rows[3].cut == 0 and rows[3].vol == 2


# ----------------------------------------------------------- streaming EWMA ----

class _FakeState:
    def __init__(self):
        self.exists = False
        self._v = None

    @property
    def get(self):
        return self._v

    def update(self, v):
        self._v = tuple(v)
        self.exists = True


def test_streaming_ewma_state_continues_across_batches():
    xs1, xs2 = [100] * 10, [300] * 5
    state = _FakeState()
    out1 = list(apply_ewma_state(
        (1,), iter([pd.DataFrame({"o": range(10), "t": range(10),
                                  "x": xs1})]), state))
    out2 = list(apply_ewma_state(
        (1,), iter([pd.DataFrame({"o": range(5), "t": range(5),
                                  "x": xs2})]), state))
    # the two-batch run must equal the single-sequence batch kernel
    n, f, last = ewma_flags(xs1 + xs2, 200000, 500000)
    r = out2[0].iloc[0]
    assert (r.n, r.n_flags, r.last_ewma_micro) == (n, f, last)
    assert out1[0].iloc[0].n == 10
