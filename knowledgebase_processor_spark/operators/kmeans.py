"""Exact fixed-point k-means over embedding columns (corpus clustering).

Training-data pipelines cluster document embeddings to balance topics,
pick deduplication strata and build IVF indexes.  Lloyd's algorithm is
normally float-summation-order dependent (a groupBy sum of doubles is
not associative), so distributed runs are irreproducible.  This
implementation quantizes once to MICRO-UNITS (``round(x * 1e6)`` as
bigint) and then runs every step — squared-L2 distances, argmin,
centroid sums, the floor-divided means — in exact integer arithmetic:

* bit-identical under any partitioning, any aggregation order, and any
  engine (the q69 oracle replays all iterations in DuckDB CTEs);
* ties in the argmin break to the lowest cluster index; empty clusters
  keep their previous centroid; init = the vectors of the k smallest
  ids.  Every choice is total-ordered, so the whole trajectory is a
  pure function of the input.

Scale shape: per iteration one codegen projection computes k distances
and the argmin (centroids ride as literals — k x dim x 8 bytes, KBs),
and one map-side-combinable groupBy over (cluster, dim) reduces the
corpus to k*dim rows; only that tiny table reaches the driver.  The
quantized vectors are re-derived per iteration (a cast per element)
rather than cached — at 100 TB recomputation from the column store is
cheaper than materializing a second copy of the corpus.

Magnitude bound: |x| <= ~2000 after quantization of unit-ish embeddings
gives squared diffs ~1e12 * dim ~ 1e14 << 2^63, and centroid sums stay
under 2^53 (exact in the DOUBLE division) up to ~10^9 members/cluster;
both documented limits of the fixed-point contract.
"""

from __future__ import annotations

import math

import pandas as pd
from pyspark.sql import DataFrame, functions as F

MICRO = 1_000_000.0


def quantize(vec_col) -> "F.Column":
    """float array -> exact micro-unit bigint array.  try_cast: a NaN
    or +-inf element quantizes to a NULL element instead of throwing
    under ANSI mode (the assignment kernels then give the row its
    NULL-cluster / -1 sentinel)."""
    return F.transform(vec_col,
                       lambda x: F.round(x.cast("double") * MICRO)
                       .try_cast("bigint"))


def assign_clusters(vecs: DataFrame, centroids: list[list[int]],
                    id_col: str = "vec_id",
                    vec_col: str = "embedding") -> DataFrame:
    """-> (vec_id, qv, cluster): nearest centroid by exact squared L2,
    ties to the lowest cluster index (``np.argmin`` picks the FIRST
    minimum, same winner as the ``array_position(array_min)`` chain this
    replaces).

    The distance argmin runs as an Arrow-batched numpy kernel over the
    exact micro-unit int64s: a k-way argmin of flat per-dimension
    expression chains is k*dim terms inside one whole-stage-codegen
    method, which trips Janino's 64 KB limit at k=32 x dim=64 and
    silently degrades the stage to interpreted execution (same pathology
    as similarity.ivf_assign, fixed the same way).  Integer arithmetic
    is associative, so the kernel is bit-identical to the expression
    form by construction — the q69 all-iterations DuckDB replay stays
    the witness.  Rows whose vector is NULL or shorter than the centroid
    dim keep the NULL cluster the old NULL-propagating chain produced.
    """
    q = vecs.select(F.col(id_col).alias("vec_id"),
                    quantize(F.col(vec_col)).alias("qv"))
    if not centroids:
        return q.select("vec_id", "qv",
                        F.lit(None).cast("int").alias("cluster"))
    dim = max(len(c) for c in centroids)
    C = [[int(v) for v in c] + [0] * (dim - len(c)) for c in centroids]

    @F.pandas_udf("int")
    def _cluster_of(col: pd.Series) -> pd.Series:
        import numpy as np
        out = pd.array([None] * len(col), dtype="Int32")
        # pyarrow hands a list<bigint> chunk containing NULL ELEMENTS
        # over as a float64 ndarray with NaN in the null slots — never
        # Python None (round-4 ADVICE; an `e is None` scan is dead
        # code, and int64-casting the NaN would assign a garbage
        # cluster).  Detect bad rows on the float view; clean rows cast
        # back to exact int64 (quantized micro-units, far below 2^53).
        ok, rows = [], []
        for i, x in enumerate(col):
            if x is None or len(x) < dim:
                continue
            a = np.asarray(x[:dim])
            if a.dtype == object:        # defensive: None-bearing chunk
                a = np.array([np.nan if e is None else float(e)
                              for e in a])
            if a.dtype.kind == "f" and np.isnan(a).any():
                continue                 # null/NaN element -> NULL cluster
            ok.append(i)
            rows.append(a.astype(np.int64))
        if not ok:
            return pd.Series(out)
        V = np.stack(rows)                           # n x dim
        best = None
        bestk = np.zeros(len(ok), dtype=np.int32)
        for ki in range(len(C)):                     # k passes, n x dim each
            diff = V - np.asarray(C[ki], dtype=np.int64)
            dist = (diff * diff).sum(axis=1)         # exact int64
            if best is None:
                best = dist
            else:
                upd = dist < best                    # first minimum wins
                best = np.where(upd, dist, best)
                bestk = np.where(upd, ki, bestk).astype(np.int32)
        out[ok] = bestk
        return pd.Series(out)

    return q.select("vec_id", "qv", _cluster_of("qv").alias("cluster"))


def update_centroids(assigned: DataFrame, centroids: list[list[int]],
                     ) -> tuple[list[list[int]], dict[int, int]]:
    """One exact Lloyd's update: floor(sum/count) per (cluster, dim)
    from a map-side-combinable groupBy; empty clusters keep their
    previous centroid.  Returns (new centroids, cluster sizes)."""
    rows = (assigned.filter(F.col("cluster").isNotNull())
            .select("cluster", F.posexplode("qv").alias("d", "v"))
            .groupBy("cluster", "d")
            .agg(F.sum("v").alias("s"), F.count("*").alias("n"))
            .collect())
    # size contract: the grouped frame is at most k x n_dims rows
    # (cluster ids come from `centroids`), never corpus-sized
    assert len(rows) <= len(centroids) * max(
        (len(c) for c in centroids), default=0)
    new = [list(c) for c in centroids]
    sizes: dict[int, int] = {}
    for r in rows:
        sizes[r["cluster"]] = r["n"]
        # n*|v| stays < 2^53, so the double division is exact
        new[r["cluster"]][r["d"]] = int(math.floor(r["s"] / r["n"]))
    return new, sizes


def kmeans(vecs: DataFrame, k: int = 4, iters: int = 3,
           id_col: str = "vec_id", vec_col: str = "embedding",
           ) -> tuple[DataFrame, list[list[int]]]:
    """Exact k-means: ``iters`` (assign, update) rounds; returns the
    final assignment frame (vec_id, qv, cluster) — computed with the
    final centroids — and those centroids (micro-units)."""
    init = (vecs.orderBy(id_col).limit(k)
            .select(quantize(F.col(vec_col)).alias("qv")).collect())
    centroids = [[int(v) for v in r["qv"]] for r in init]
    assigned = None
    for _ in range(iters):
        assigned = assign_clusters(vecs, centroids, id_col, vec_col)
        centroids, _sizes = update_centroids(assigned, centroids)
    return (assign_clusters(vecs, centroids, id_col, vec_col), centroids)


def kmeans_summary(vecs: DataFrame, k: int = 4, iters: int = 3,
                   id_col: str = "vec_id",
                   vec_col: str = "embedding") -> DataFrame:
    """Per-cluster (cluster, n_vecs, centroid_l1): sizes of the final
    assignment plus the exact L1 norm of each final centroid — a compact
    bit-exact witness of the whole trajectory."""
    assigned, centroids = kmeans(vecs, k, iters, id_col, vec_col)
    spark = vecs.sparkSession
    l1 = spark.createDataFrame(
        [(i, int(sum(abs(v) for v in c))) for i, c in enumerate(centroids)],
        "cluster int, centroid_l1 bigint")
    return (assigned.groupBy("cluster")
            .agg(F.count("*").alias("n_vecs"))
            .join(l1, "cluster", "right")
            .select("cluster",
                    F.coalesce("n_vecs", F.lit(0)).alias("n_vecs"),
                    "centroid_l1")
            .orderBy("cluster"))
