"""Round-2 additions, batch 9: PSI corpus drift, HyperANF neighborhood
function, SGC feature propagation — each against its defining invariant
(identical snapshots -> PSI 0 / planted shift detected, sketch equals
the HLL of the python-BFS reachable set, floor-mean diffusion equals a
python replication and never escapes the input range)."""

import hashlib
import math

from pyspark.sql import functions as F

from knowledgebase_processor_spark.operators.drift import (
    SCALE as PSI_SCALE, psi_report)
from knowledgebase_processor_spark.operators.gnnprop import (
    SCALE as GNN_SCALE, propagate_features)
from knowledgebase_processor_spark.operators.hyperanf import (
    neighborhood_function, neighborhood_sketches)
from knowledgebase_processor_spark.operators.sketches import HEX_DIGITS


# ------------------------------------------------------ PSI drift ----

def _snap(spark, rows):
    return spark.createDataFrame(
        rows, "doc_id long, lang string, source string, n_chars long")


def test_psi_zero_on_identical_snapshots(spark):
    rows = [(i, "en" if i % 3 else "de", f"s{i % 2}", 100 * i)
            for i in range(1, 40)]
    out = psi_report(_snap(spark, rows), _snap(spark, rows)).collect()
    assert all(r.psi_micro == 0 for r in out)
    assert all(r.p_old_ppm == r.p_new_ppm for r in out)


def test_psi_detects_planted_language_shift(spark):
    old = [(i, "en", "s", 10) for i in range(200)]
    new = ([(i, "en", "s", 10) for i in range(100)]
           + [(i, "xx", "s", 10) for i in range(100, 200)])
    out = psi_report(_snap(spark, old), _snap(spark, new)).collect()
    lang = {r.bin: r for r in out if r.feature == "lang"}
    # half the corpus moved en -> xx: a massive shift (PSI >> 0.25)
    assert lang["*"].psi_micro > 250_000
    # chars_band did not move: only smoothing noise, far under 0.1
    chars = {r.bin: r for r in out if r.feature == "chars_band"}
    assert abs(chars["*"].psi_micro) < 100_000


def test_psi_summary_is_exact_sum_of_bins(spark):
    rows_a = [(i, "en" if i % 5 else "fr", f"s{i % 3}", 37 * i)
              for i in range(1, 120)]
    rows_b = [(i, "en" if i % 4 else "es", f"s{i % 2}", 53 * i)
              for i in range(1, 90)]
    out = psi_report(_snap(spark, rows_a), _snap(spark, rows_b)).collect()
    for feat in {r.feature for r in out}:
        bins = [r for r in out if r.feature == feat and r.bin != "*"]
        star = next(r for r in out if r.feature == feat and r.bin == "*")
        assert star.psi_micro == sum(r.psi_micro for r in bins)
        assert star.c_old == sum(r.c_old for r in bins)
        assert star.c_new == sum(r.c_new for r in bins)


def test_psi_matches_python_formula(spark):
    old = [(i, "en" if i % 2 else "de", "s", 10) for i in range(60)]
    new = [(i, "en" if i % 3 else "de", "s", 10) for i in range(45)]
    out = psi_report(_snap(spark, old), _snap(spark, new)).collect()
    lang = [r for r in out if r.feature == "lang" and r.bin != "*"]
    n_old = sum(r.c_old for r in lang)
    n_new = sum(r.c_new for r in lang)
    b = len(lang)
    for r in lang:
        p = (r.c_new + 1) / (n_new + b)
        q = (r.c_old + 1) / (n_old + b)
        exp = round(PSI_SCALE * (p - q) * math.log(p / q))
        assert r.psi_micro == exp


# ------------------------------------------------------- HyperANF ----

def _edges(spark, pairs):
    return spark.createDataFrame(pairs, "src long, dst long")


def _hll_register(value, p_nibbles=1, salt="anf"):
    hx = hashlib.md5(f"{salt}|{value}".encode()).hexdigest()[:HEX_DIGITS]
    bucket = int(hx[:p_nibbles], 16)
    rest = hx[p_nibbles:]
    stripped = rest.lstrip("0")
    zn = len(rest) - len(stripped)
    if zn == len(rest):
        rho = 4 * len(rest) + 1
    else:
        extra = {"1": 3, "2": 2, "3": 2}.get(stripped[0], 1
                                             if stripped[0] in "4567" else 0)
        rho = 4 * zn + extra + 1
    return bucket, rho


def _python_reach(edges, node, rounds):
    frontier = {node}
    seen = {node}
    for _ in range(rounds):
        frontier = {d for s, d in edges if s in frontier}
        seen |= frontier
    return seen


def test_sketches_equal_hll_of_python_reachable_set(spark):
    # small DAG with shared descendants (tests max-merge, not just copy)
    edges = [(8, 4), (8, 5), (4, 2), (5, 2), (2, 1), (9, 4), (7, 1)]
    regs = neighborhood_sketches(_edges(spark, edges), rounds=3).collect()
    got = {}
    for r in regs:
        got.setdefault(r.node, {})[r.bucket] = r.rho
    nodes = {s for s, _ in edges} | {d for _, d in edges}
    for n in nodes:
        reach = _python_reach(edges, n, 3)
        exp = {}
        for v in reach:
            b, rho = _hll_register(v)
            exp[b] = max(exp.get(b, 0), rho)
        assert got[n] == exp, f"node {n}"


def test_neighborhood_function_monotone_in_rounds(spark):
    # a chain: estimates must be non-decreasing as rounds grow
    edges = [(i, i - 1) for i in range(2, 12)]
    by_round = {}
    for rounds in (0, 1, 3):
        out = neighborhood_function(_edges(spark, edges), rounds=rounds)
        by_round[rounds] = {r.node: r.hll_sum_fixed for r in out.collect()}
    for n in by_round[0]:
        # the fixed-point harmonic sum DECREASES as the set grows
        assert by_round[1][n] <= by_round[0][n]
        assert by_round[3][n] <= by_round[1][n]


def test_neighborhood_estimate_sane_on_star(spark):
    # hub -> 40 leaves: hub reaches 41 nodes in 1 hop, leaves reach 1
    edges = [(0, i) for i in range(1, 41)]
    out = {r.node: r for r in
           neighborhood_function(_edges(spark, edges), rounds=1).collect()}
    assert out[0].est > out[1].est
    # m=16 linear counting keeps small counts tight (within 50%)
    assert 20 <= out[0].est <= 80
    for i in range(1, 41):
        assert 1 <= out[i].est <= 3


# ------------------------------------------- SGC feature diffusion ----

def _emb(spark, rows):
    return spark.createDataFrame(rows, "vec_id long, embedding array<float>")


def test_gnnprop_matches_python_replication(spark):
    rows = [(1, [0.5, -0.25]), (2, [1.0, 0.0]), (3, [-0.5, 0.75]),
            (4, [0.125, 0.125])]
    edges = [(1, 3), (2, 3), (3, 4), (2, 4)]
    out = propagate_features(_emb(spark, rows), _edges(spark, edges),
                             rounds=2)
    got = {(r.node, r.dim): r.val for r in out.collect()}
    state = {(v, d + 1): math.floor(GNN_SCALE * x)
             for v, vec in rows for d, x in enumerate(vec)}
    for _ in range(2):
        nxt = {}
        for (v, d), val in state.items():
            inc = [state[(s, d)] for s, t in edges if t == v]
            nxt[(v, d)] = math.floor(sum([val] + inc) / (1 + len(inc)))
        state = nxt
    assert got == state


def test_gnnprop_no_edges_is_identity(spark):
    import numpy as np
    rows = [(1, [0.3, -0.7]), (2, [0.0, 1.0])]
    empty = spark.createDataFrame([], "src long, dst long")
    out = propagate_features(_emb(spark, rows), empty, rounds=3)
    got = {(r.node, r.dim): r.val for r in out.collect()}
    # parquet/arrays store float32: replicate the cast before flooring
    f32 = lambda x: float(np.float32(x))  # noqa: E731
    assert got == {(1, 1): math.floor(GNN_SCALE * f32(0.3)),
                   (1, 2): math.floor(GNN_SCALE * f32(-0.7)),
                   (2, 1): 0, (2, 2): GNN_SCALE}


def test_gnnprop_values_stay_bounded(spark):
    import random
    rng = random.Random(9)
    rows = [(i, [rng.uniform(-1, 1) for _ in range(4)]) for i in range(30)]
    edges = [(rng.randrange(30), rng.randrange(30)) for _ in range(60)]
    edges = [(a, b) for a, b in edges if a != b]
    out = propagate_features(_emb(spark, rows), _edges(spark, edges),
                             rounds=3)
    vals = [r.val for r in out.collect()]
    assert all(-GNN_SCALE - 1 <= v <= GNN_SCALE for v in vals)
