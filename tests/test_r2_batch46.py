"""Batch-46 round-2: Good-Turing smoothing and Zipf slope
(operators/zipf.py)."""

import math

from knowledgebase_processor_spark.operators.zipf import (
    good_turing, zipf_slope)


def test_good_turing_hand_computed(spark):
    # bigram counts by construction: 'a b' x3, 'b a' x2, unique tails
    docs = [("a b a b a b x1 y1",), ("p q p q r1 s1",)]
    # doc1 bigrams: ab,ba,ab,ba,ab,bx1,x1y1 -> ab:3, ba:2, +2 singles
    # doc2 bigrams: pq,qp,pq,qr1,r1s1 -> pq:2, qp:1, +2 singles
    df = spark.createDataFrame(docs, "text string")
    got = {r.r: r for r in good_turing(df, max_r=5).collect()}
    assert got[1].n_r == 5     # b x1, x1 y1, q p, q r1, r1 s1
    assert got[2].n_r == 2     # b a, p q
    assert got[3].n_r == 1     # a b
    # r* for r=1: 2 * N2 / N1 = 2*2/5
    assert got[1].r_star_ppm == 2 * 2 * 1_000_000 // 5
    assert got[2].r_star_ppm == 3 * 1 * 1_000_000 // 2
    assert got[3].r_star_ppm is None   # no N4


def test_zipf_slope_matches_python(spark):
    # synthetic exact-Zipf bigram counts: term_i repeated ~C/i times
    rows = []
    for i in range(1, 30):
        for _ in range(max(2, 120 // i)):
            rows.append((f"w{i} z{i}",))
    df = spark.createDataFrame(rows, "text string")
    r = zipf_slope(df, min_count=2).collect()[0]
    # replicate the milli-quantized regression in python
    from collections import Counter
    c = Counter()
    for (t,) in rows:
        a, b = t.split()
        c[f"{a} {b}"] += 1
    terms = sorted(((n, t) for t, n in c.items() if n >= 2),
                   key=lambda x: (-x[0], x[1]))
    pts = [(round(1000 * math.log(i + 1)), round(1000 * math.log(n)))
           for i, (n, _) in enumerate(terms)]
    n = len(pts)
    sx = sum(x for x, _ in pts); sy = sum(y for _, y in pts)
    sxy = sum(x * y for x, y in pts); sxx = sum(x * x for x, _ in pts)
    exp = round(1e6 * (n * sxy - sx * sy) / (n * sxx - sx * sx))
    assert (r.n, r.sx, r.sy) == (n, sx, sy)
    assert r.slope_micro == exp
    # near-perfect Zipf -> slope close to -1
    assert -1_300_000 < r.slope_micro < -700_000


def test_zipf_degenerate_single_term_null(spark):
    df = spark.createDataFrame([("a b a b",)] * 3, "text string")
    # only terms 'a b' and 'b a' -> 2 points; slope defined
    r = zipf_slope(df, min_count=2).collect()[0]
    assert r.n == 2
    df1 = spark.createDataFrame([("a b",)] * 5, "text string")
    r1 = zipf_slope(df1, min_count=2).collect()[0]
    # single point: denominator zero -> NULL
    assert r1.n == 1 and r1.slope_micro is None
