"""Similarity search over embedding columns (array<float>).

* ``cosine_topk`` — brute-force exact top-k: one pass, JVM-side dot
  products via ``zip_with``/``aggregate``, no UDF.  The baseline and the
  verify step for everything else.
* ``cosine_lsh_buckets`` / ``lsh_topk`` — random-hyperplane LSH: sign-bit
  sketches bucket the corpus so the query only joins its own bucket(s).
  The scale path: bucket cardinality ~ n / 2^bits, and the join is an
  equi-join on the bucket key.
* ``ivf_topk`` — IVF-style coarse quantization: assign each vector to the
  nearest of K seeded centroids, probe the query's ``nprobe`` closest
  cells (nprobe=K == exact brute force, tested).

All hyperplanes/centroids derive from a fixed seed — deterministic across
runs and executors.
"""

from __future__ import annotations

import random

from pyspark.sql import Column, DataFrame, functions as F


def dot(a: Column, b: Column) -> Column:
    return F.aggregate(F.zip_with(a, b, lambda x, y: x * y),
                       F.lit(0.0), lambda acc, x: acc + x)


def l2norm(a: Column) -> Column:
    return F.sqrt(F.aggregate(F.transform(a, lambda x: x * x),
                              F.lit(0.0), lambda acc, x: acc + x))


def cosine_sim(a: Column, b: Column) -> Column:
    return dot(a, b) / F.greatest(l2norm(a) * l2norm(b), F.lit(1e-12))


def cosine_topk(vecs: DataFrame, query_vec: list[float], k: int = 10,
                id_col: str = "vec_id", vec_col: str = "embedding") -> DataFrame:
    """Exact top-k by cosine similarity to a literal query vector."""
    q = F.lit([float(x) for x in query_vec]).cast("array<double>")
    return (vecs.select(F.col(id_col).alias("vec_id"),
                        F.round(cosine_sim(F.col(vec_col).cast("array<double>"), q), 6)
                        .alias("cosine"))
            .orderBy(F.desc("cosine"), F.asc("vec_id"))
            .limit(k))


def _hyperplanes(dim: int, bits: int, seed: int = 42) -> list[list[float]]:
    rnd = random.Random(seed)
    return [[rnd.gauss(0, 1) for _ in range(dim)] for _ in range(bits)]


def lsh_bucket_expr(vec: Column, planes: list[list[float]]) -> Column:
    """Sign-bit sketch: bucket id from the signs of <v, plane_i>."""
    bucket = F.lit(0).cast("long")
    for i, plane in enumerate(planes):
        # one list-literal call per plane, not dim F.lit round-trips
        p = F.lit([float(x) for x in plane]).cast("array<double>")
        bit = F.when(dot(vec.cast("array<double>"), p) >= 0,
                     F.shiftleft(F.lit(1).cast("long"), i)).otherwise(F.lit(0).cast("long"))
        bucket = bucket.bitwiseOR(bit)
    return bucket


def cosine_lsh_buckets(vecs: DataFrame, dim: int, bits: int = 8,
                       id_col: str = "vec_id", vec_col: str = "embedding",
                       seed: int = 42) -> DataFrame:
    planes = _hyperplanes(dim, bits, seed)
    return vecs.select(F.col(id_col).alias("vec_id"), F.col(vec_col).alias("v"),
                       lsh_bucket_expr(F.col(vec_col), planes).alias("bucket"))


def lsh_topk(vecs: DataFrame, query_vec: list[float], dim: int, k: int = 10,
             bits: int = 8, id_col: str = "vec_id",
             vec_col: str = "embedding", seed: int = 42,
             probes: int = 4) -> DataFrame:
    """Approximate top-k: exact rescoring restricted to the query's
    bucket(s).

    MULTI-PROBE (Lv et al. 2007): besides the query's own bucket, probe
    the buckets reached by flipping SUBSETS of sign bits in increasing
    total-margin order (smallest |<q, plane>| first — near-boundary
    planes are where true neighbors land on the other side; subsets via
    a k-smallest-subset-sums heap so probes=2^bits is genuinely
    exhaustive and reproduces brute force exactly, tested).  ``probes``
    buckets total; probes=1 is classic single-bucket LSH.  Recall is
    monotone in ``probes`` and data-dependent: near-random vectors (the
    synthetic testdata) gain roughly the probed corpus fraction, while
    clustered real embeddings gain much more per probe.
    """
    import heapq

    planes = _hyperplanes(dim, bits, seed)
    bucketed = cosine_lsh_buckets(vecs, dim, bits, id_col, vec_col, seed)
    q = F.lit([float(x) for x in query_vec]).cast("array<double>")
    # bucket + margins depend only on the literal vector + seeded planes:
    # plain python, no Spark job, and no crash on an empty corpus
    qbucket = 0
    margins: list[tuple[float, int]] = []
    for i, plane in enumerate(planes):
        d = sum(float(a) * b for a, b in zip(query_vec, plane))
        if d >= 0:
            qbucket |= 1 << i
        margins.append((abs(d), i))
    margins.sort()
    costs = [c for c, _ in margins]
    masks = [1 << i for _, i in margins]
    # Enumerate flip SUBSETS in nondecreasing total-margin order (k
    # smallest subset sums via heap), so multi-bit flips are reachable
    # and probes=2^bits is genuinely exhaustive.
    probe_buckets = [qbucket]
    if costs and probes > 1:
        heap = [(costs[0], (0,))]
        while heap and len(probe_buckets) < min(probes, 1 << bits):
            c, subset = heapq.heappop(heap)
            b = qbucket
            for p in subset:
                b ^= masks[p]
            probe_buckets.append(b)
            last = subset[-1]
            if last + 1 < len(costs):
                heapq.heappush(heap, (c + costs[last + 1], subset + (last + 1,)))
                heapq.heappush(heap, (c - costs[last] + costs[last + 1],
                                      subset[:-1] + (last + 1,)))
    return (bucketed.filter(F.col("bucket").isin(probe_buckets))
            .select("vec_id",
                    F.round(cosine_sim(F.col("v").cast("array<double>"), q), 6)
                    .alias("cosine"))
            .orderBy(F.desc("cosine"), F.asc("vec_id"))
            .limit(k))


def ivf_centroids(vecs: DataFrame, dim: int, k_cells: int = 16,
                  vec_col: str = "embedding", seed: int = 42) -> list[list[float]]:
    """Seeded random projection of the first k_cells sample rows as
    centroids (one-pass, deterministic; good enough as a coarse quantizer
    skeleton — swap in k-means at scale)."""
    sample = [r[0] for r in
              vecs.select(vec_col).orderBy(F.xxhash64(F.col(vec_col).cast("string")))
              .limit(k_cells).collect()]
    rnd = random.Random(seed)
    while len(sample) < k_cells:
        sample.append([rnd.gauss(0, 1) for _ in range(dim)])
    return [list(map(float, v)) for v in sample]


def ivf_assign(vecs: DataFrame, centroids: list[list[float]],
               id_col: str = "vec_id", vec_col: str = "embedding") -> DataFrame:
    """Nearest-centroid cell id per vector, as a pure column expression."""
    v = F.col(vec_col).cast("array<double>")
    best_cell, best_sim = F.lit(-1), F.lit(-2.0)
    for i, c in enumerate(centroids):
        # one list-literal call per centroid, not dim F.lit round-trips
        cc = F.lit([float(x) for x in c]).cast("array<double>")
        sim = cosine_sim(v, cc)
        better = sim > best_sim
        best_cell = F.when(better, F.lit(i)).otherwise(best_cell)
        best_sim = F.when(better, sim).otherwise(best_sim)
    return vecs.select(F.col(id_col).alias("vec_id"), F.col(vec_col).alias("v"),
                       best_cell.alias("cell"))


def ivf_topk(vecs: DataFrame, query_vec: list[float],
             centroids: list[list[float]], k: int = 10,
             id_col: str = "vec_id", vec_col: str = "embedding",
             nprobe: int = 2) -> DataFrame:
    """IVF approximate top-k: exact rescoring restricted to the
    ``nprobe`` cells whose centroids are most cosine-similar to the
    query (the classic IVF nprobe knob).  nprobe=len(centroids) probes
    every cell and reproduces the brute-force top-k exactly.

    Cell assignment is one broadcast-free column expression per vector
    (``ivf_assign``); the query's cell ranking is plain Python over the
    centroid list — no Spark job before the probe filter.
    """
    def _cos(a: list[float], b: list[float]) -> float:
        d = sum(x * y for x, y in zip(a, b))
        na = sum(x * x for x in a) ** 0.5
        nb = sum(x * x for x in b) ** 0.5
        return d / max(na * nb, 1e-12)

    ranked = sorted(range(len(centroids)),
                    key=lambda i: -_cos(query_vec, centroids[i]))
    probe_cells = ranked[:max(1, nprobe)]
    assigned = ivf_assign(vecs, centroids, id_col, vec_col)
    q = F.lit([float(x) for x in query_vec]).cast("array<double>")
    return (assigned.filter(F.col("cell").isin(probe_cells))
            .select("vec_id",
                    F.round(cosine_sim(F.col("v").cast("array<double>"), q), 6)
                    .alias("cosine"))
            .orderBy(F.desc("cosine"), F.asc("vec_id"))
            .limit(k))
