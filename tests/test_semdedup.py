"""SemDeDup (operators/semdedup.py): planted-duplicate recall, exemplar
choice, the mega-cluster cap, partitioning invariance, and a pure-python
replication of the full cluster→pair→drop decision."""

import math

from pyspark.sql import functions as F

from knowledgebase_processor_spark.operators.semdedup import semdedup

# two well-separated blobs + planted semantic duplicates inside each:
# 10 is an exact copy of 0, 11 is 1 scaled by 2 (cosine exactly 1),
# 12 is a slightly rotated copy of 4 (cosine ~0.9996)
VECS = [
    (0, [1.0, 0.0]), (1, [0.0, 1.0]), (2, [0.9, 0.1]), (3, [0.1, 0.9]),
    (4, [0.95, 0.05]), (5, [0.05, 0.95]),
    (10, [1.0, 0.0]), (11, [0.0, 2.0]), (12, [0.95, 0.06]),
]


def _df(spark, rows=VECS, parts=1):
    df = spark.createDataFrame(rows, "vec_id long, embedding array<float>")
    return df.repartition(parts) if parts > 1 else df


def _q(v):
    x = float(f"{v:.32g}") * 1e6
    f = math.floor(x)
    return int(f + 1) if x - f >= 0.5 else int(f)


def _py_semdedup(rows, k, iters, threshold):
    """Replicate the whole decision in pure python: exact fixed-point
    k-means (same rules as test_kmeans) then the exact-integer cosine
    test with the fixed-order IEEE chain."""
    qvs = {i: [_q(x) for x in v] for i, v in rows}
    cent = [qvs[i][:] for i in sorted(qvs)[:k]]

    def assign():
        out = {}
        for i, qv in qvs.items():
            d = [sum((a - b) ** 2 for a, b in zip(qv, c)) for c in cent]
            out[i] = d.index(min(d))
        return out

    for _ in range(iters):
        a = assign()
        for c in range(k):
            members = [qvs[i] for i, ci in a.items() if ci == c]
            if members:
                cent[c] = [int(math.floor(sum(col) / len(members)))
                           for col in zip(*members)]
    a = assign()
    t2 = float(threshold) * float(threshold)
    dropped = set()
    ids = sorted(qvs)
    for i in ids:
        for j in ids:
            if i < j and a[i] == a[j]:
                dot = sum(x * y for x, y in zip(qvs[i], qvs[j]))
                na = sum(x * x for x in qvs[i])
                nb = sum(x * x for x in qvs[j])
                if dot > 0 and float(dot) * float(dot) >= \
                        (t2 * float(na)) * float(nb):
                    dropped.add(j)
    return a, dropped


def _run(spark, parts=1, **kw):
    out = semdedup(_df(spark, parts=parts), k=2, iters=3, **kw)
    return {r["vec_id"]: (r["cluster"], r["keep"], r["capped"])
            for r in out.collect()}


def test_planted_duplicates_dropped_lowest_id_kept(spark):
    got = _run(spark, threshold=0.95)
    # exact copy, scaled copy, rotated copy all dropped
    assert not got[10][1] and not got[11][1] and not got[12][1]
    # the lowest-id exemplar of each blob survives
    assert got[0][1] and got[1][1]
    # the full decision (2-5 are also within 0.95 of the exemplars)
    # matches the pure-python replication exactly
    exp_assign, exp_dropped = _py_semdedup(VECS, 2, 3, 0.95)
    assert {i: v[0] for i, v in got.items()} == exp_assign
    assert {i for i, v in got.items() if not v[1]} == exp_dropped
    assert all(not v[2] for v in got.values())      # nothing capped


def test_matches_pure_python_across_thresholds(spark):
    for t in (0.5, 0.9, 0.99, 0.999999):
        got = _run(spark, parts=4, threshold=t)
        _, exp_dropped = _py_semdedup(VECS, 2, 3, t)
        assert {i for i, v in got.items() if not v[1]} == exp_dropped, t


def test_threshold_one_boundary_keeps_nonidentical(spark):
    # at threshold 1.0 only cosine == 1 pairs drop: the exact copy (10)
    # and the scaled copy (11) still go; the rotated copy (12) survives
    got = _run(spark, threshold=1.0)
    assert not got[10][1] and not got[11][1]
    assert got[12][1]


def test_max_cluster_cap_exempts_and_flags(spark):
    # cap below the blob size: every member capped, all kept, nothing
    # materializes pairs
    got = _run(spark, threshold=0.95, max_cluster=2)
    assert all(v[2] for v in got.values())
    assert all(v[1] for v in got.values())


def test_partitioning_invariance(spark):
    a = _run(spark, parts=1, threshold=0.95)
    b = _run(spark, parts=7, threshold=0.95)
    assert a == b


def test_negative_similarity_never_drops(spark):
    # antipodal vectors land in one cluster with k=1-ish geometry; dot<0
    # must never count as similar even though dot^2 is large
    rows = [(0, [1.0, 0.0]), (1, [-1.0, 0.0])]
    out = semdedup(_df(spark, rows), k=1, iters=2, threshold=0.9)
    got = {r["vec_id"]: r["keep"] for r in out.collect()}
    assert got == {0: True, 1: True}
