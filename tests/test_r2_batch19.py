"""Batch-19 round-2 operators: margin-based bitext mining and hubness
diagnostics (operators/bitext.py)."""

import math

from knowledgebase_processor_spark.operators.bitext import (
    hubness_report, margin_mine)


def _vecs(spark, rows):
    return spark.createDataFrame(rows, "vec_id long, embedding array<float>")


def test_margin_mine_matches_python_replay(spark):
    import random
    rng = random.Random(11)
    src_rows = [(i, [rng.uniform(-1, 1) for _ in range(8)])
                for i in range(12)]
    tgt_rows = [(i, [rng.uniform(-1, 1) for _ in range(8)])
                for i in range(15)]
    got = {(r.src_id, r.tgt_id, r.c_micro, r.margin_ppm)
           for r in margin_mine(_vecs(spark, src_rows),
                                _vecs(spark, tgt_rows), k=4,
                                min_margin_ppm=0).collect()}

    def cos_micro(a, b):
        d = sum(x * y for x, y in zip(a, b))
        n = max(math.sqrt(sum(x * x for x in a))
                * math.sqrt(sum(y * y for y in b)), 1e-12)
        return round(round(d / n, 6) * 1_000_000)

    c = {(s, t): cos_micro(sv, tv)
         for s, sv in src_rows for t, tv in tgt_rows}
    sum_s = {}
    for s, _ in src_rows:
        top = sorted(((c[(s, t)], -t) for t, _ in tgt_rows),
                     reverse=True)[:4]
        sum_s[s] = sum(v for v, _ in top)
    sum_t = {}
    for t, _ in tgt_rows:
        top = sorted(((c[(s, t)], -s) for s, _ in src_rows),
                     reverse=True)[:4]
        sum_t[t] = sum(v for v, _ in top)

    want = set()
    for s, _ in src_rows:
        best = None
        for t, _ in tgt_rows:
            den = sum_s[s] + sum_t[t]
            if den <= 0:
                continue
            # python // floors toward -inf; Spark/DuckDB DIV truncates
            # toward zero — emulate truncation for negative numerators
            num = c[(s, t)] * 8 * 1_000_000
            m = abs(num) // den * (1 if num >= 0 else -1)
            key = (m, c[(s, t)], -t)
            if best is None or key > best[0]:
                best = (key, (s, t, c[(s, t)], m))
        want.add(best[1])
    assert got == want


def test_margin_mine_threshold_and_hub_suppression(spark):
    # hub target t0 ~ similar to both sources; t1 aligned only with s0.
    src = _vecs(spark, [(0, [1.0, 0.0]), (1, [0.0, 1.0])])
    tgt = _vecs(spark, [(0, [0.7, 0.7]), (1, [1.0, 0.05])])
    out = {r.src_id: r for r in
           margin_mine(src, tgt, k=2, min_margin_ppm=1_000_000).collect()}
    # s0's best by margin is the exclusive t1, not the hub t0.
    assert out[0].tgt_id == 1
    # s1 only clears the threshold with the hub (its only good match).
    assert 1 not in out or out[1].tgt_id == 0


def test_hubness_counts_and_antihubs(spark):
    # all sources point to t0; t1/t2 split the rest; t3 is an anti-hub.
    src = _vecs(spark, [(i, [1.0, 0.0, 0.0]) for i in range(3)])
    tgt = _vecs(spark, [(0, [1.0, 0.0, 0.0]), (1, [0.9, 0.1, 0.0]),
                        (2, [0.0, 1.0, 0.0]), (3, [0.0, 0.0, 1.0])])
    out = {r.tgt_id: r.n_k for r in
           hubness_report(src, tgt, k=2).collect()}
    assert out == {0: 3, 1: 3, 2: 0, 3: 0}
    assert sum(out.values()) == 3 * 2      # sum n_k == n_src * k


def test_margin_mine_orthogonal_corpus_mines_nothing(spark):
    src = _vecs(spark, [(0, [1.0, 0.0])])
    tgt = _vecs(spark, [(0, [0.0, 1.0])])
    assert margin_mine(src, tgt, k=1).count() == 0
