"""Exact fixed-point k-means (operators/kmeans.py): pure-python
replication, tie/empty-cluster rules, partitioning invariance."""

import math

from knowledgebase_processor_spark.operators.kmeans import (
    assign_clusters, kmeans, kmeans_summary,
)

VECS = [
    (0, [0.0, 0.0]), (1, [1.0, 1.0]), (2, [0.1, -0.1]), (3, [0.9, 1.2]),
    (4, [0.05, 0.02]), (5, [1.1, 0.8]), (6, [-0.2, 0.1]), (7, [2.0, 2.0]),
]


def _df(spark, rows=VECS, parts=1):
    df = spark.createDataFrame(rows, "vec_id long, embedding array<float>")
    return df.repartition(parts) if parts > 1 else df


def _q(v):
    # replicate Spark round(double, 0): HALF_UP (ties away from zero)
    x = float(f"{v:.32g}") * 1e6
    f = math.floor(x)
    return int(f + 1) if x - f >= 0.5 else int(f)


def _py_kmeans(rows, k, iters):
    qvs = {i: [_q(x) for x in v] for i, v in rows}
    cent = [qvs[i][:] for i in sorted(qvs)[:k]]

    def assign():
        out = {}
        for i, qv in qvs.items():
            d = [sum((a - b) ** 2 for a, b in zip(qv, c)) for c in cent]
            out[i] = d.index(min(d))          # first minimum = lowest id
        return out

    for _ in range(iters):
        a = assign()
        for c in range(k):
            members = [qvs[i] for i, ci in a.items() if ci == c]
            if members:
                cent[c] = [int(math.floor(sum(col) / len(members)))
                           for col in zip(*members)]
    return assign(), cent


def test_matches_pure_python_exactly(spark):
    got_assign, got_cent = kmeans(_df(spark, parts=4), k=2, iters=3)
    exp_assign, exp_cent = _py_kmeans(VECS, 2, 3)
    rows = {r["vec_id"]: r["cluster"] for r in got_assign.collect()}
    assert rows == exp_assign
    assert got_cent == exp_cent
    # the two planted blobs separate
    assert rows[0] == rows[2] == rows[4] == rows[6]
    assert rows[1] == rows[3] == rows[5] == rows[7]
    assert rows[0] != rows[1]


def test_partitioning_invariance(spark):
    a = kmeans_summary(_df(spark, parts=1), k=2, iters=3).collect()
    b = kmeans_summary(_df(spark, parts=7), k=2, iters=3).collect()
    assert [tuple(r) for r in a] == [tuple(r) for r in b]


def test_argmin_tie_breaks_to_lowest_cluster(spark):
    rows = [(0, [0.0]), (1, [2.0]), (2, [1.0])]   # vec 2 equidistant
    df = spark.createDataFrame(rows, "vec_id long, embedding array<float>")
    got = {r["vec_id"]: r["cluster"] for r in
           assign_clusters(df, [[0], [2_000_000]]).collect()}
    assert got[2] == 0


def test_empty_cluster_keeps_centroid(spark):
    # both init centroids sit in one blob; k=3's third centroid (vec 2)
    # may empty out — summary must still report it with its old centroid
    rows = [(0, [0.0]), (1, [0.1]), (2, [0.05])]
    df = spark.createDataFrame(rows, "vec_id long, embedding array<float>")
    out = kmeans_summary(df, k=3, iters=2).collect()
    assert [r["cluster"] for r in out] == [0, 1, 2]
    assert sum(r["n_vecs"] for r in out) == 3
