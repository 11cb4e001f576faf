"""SemDeDup: semantic deduplication over an embedding column.

The embedding-space member of the dedup family (exact → MinHash/SimHash
→ embedding): cluster the corpus with k-means, then compare only
within-cluster pairs and drop every vector that is cosine-similar to a
lower-id vector in its cluster (Abbas et al. 2023, "SemDeDup: Data-
efficient learning at web-scale through semantic deduplication").  The
reference engine has no embedding path; this slots beside
``dedup.embedding_near_dups`` as its sub-quadratic scale path.

Scale shape
-----------
k-means cuts the candidate space from O(n²) to Σ_c |c|² — the paper's
trade (pick k ≈ n/50k so one cluster's self-join fits an executor
comfortably).  The pair stage is a hash equi-join on the cluster id
(shuffled both sides, AQE-skew-splittable); nothing is ever
whole-corpus quadratic.  ``max_cluster`` guards degenerate clusterings the same way
the LSH paths guard mega-buckets: oversized clusters skip pair
generation (members all kept) instead of OOMing an executor — dropped
coverage is explicit in the ``capped`` column, never silent.

Determinism
-----------
Decisions are exact: vectors ride as the k-means micro-unit bigint
quantization (``kmeans.quantize``), dot products and norms are bigint
sums (|x|≤10 ⇒ |q|≤1e7 ⇒ 64-term dot ≤ 6.4e15 < 2⁵³≈9.0e15, exactly
double-representable — real embedding components are ≪1), and the
threshold test

    dot > 0  AND  double(dot)·double(dot) ≥ (t²·double(‖a‖²))·double(‖b‖²)

is a fixed-order chain of IEEE multiplies — bit-identical on any
engine, any partitioning (the q71 oracle replays it in DuckDB on top of
the q69 k-means CTE trajectory).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

from .kmeans import kmeans


def _int_dot(a, b) -> "F.Column":
    return F.aggregate(F.zip_with(a, b, lambda x, y: x * y),
                       F.lit(0).cast("bigint"), lambda acc, x: acc + x)


def _int_dot_flat(a_sql: str, b_sql: str, dim: int) -> "F.Column":
    """Same exact BIGINT dot as one flat codegen chain (integer sums
    have no ordering concerns; NULL semantics match the fold)."""
    return F.expr("(" + " + ".join(
        f"try_element_at({a_sql}, {i + 1}) * try_element_at({b_sql}, {i + 1})"
        for i in range(dim)) + ")")


def semdedup(vecs: DataFrame, k: int = 4, iters: int = 3,
             threshold: float = 0.95, id_col: str = "vec_id",
             vec_col: str = "embedding",
             max_cluster: int | None = None,
             dim: int | None = None) -> DataFrame:
    """-> (vec_id, cluster, keep, capped).

    ``keep`` is False iff some lower-id vector in the same cluster has
    cosine similarity ≥ ``threshold`` (the paper keeps one exemplar per
    semantic-duplicate group; lowest id is the total-ordered choice).
    ``capped`` marks members of clusters larger than ``max_cluster``,
    which are exempted from pair generation (all kept) — the explicit
    no-silent-caps flag.
    """
    assigned, _centroids = kmeans(vecs, k, iters, id_col, vec_col)
    _nrm = (_int_dot_flat("qv", "qv", dim) if dim
            else _int_dot(F.col("qv"), F.col("qv")))
    m = assigned.select("vec_id", "cluster", "qv", _nrm.alias("nrm"))

    if max_cluster is not None:
        sizes = m.groupBy("cluster").agg(F.count("*").alias("_cn"))
        m = m.join(F.broadcast(sizes), "cluster").withColumn(
            "capped", F.col("_cn") > max_cluster).drop("_cn")
    else:
        m = m.withColumn("capped", F.lit(False))
    m = m.localCheckpoint()  # consumed by both join sides + the result

    pairable = m.filter(~F.col("capped"))
    a = pairable.select(F.col("cluster"),
                        F.col("vec_id").alias("id_a"),
                        F.col("qv").alias("qa"),
                        F.col("nrm").alias("na"))
    b = pairable.select(F.col("cluster"),
                        F.col("vec_id").alias("id_b"),
                        F.col("qv").alias("qb"),
                        F.col("nrm").alias("nb"))
    t2 = float(threshold) * float(threshold)
    dot = (_int_dot_flat("qa", "qb", dim) if dim
           else _int_dot(F.col("qa"), F.col("qb")))
    dropped = (a.join(b, "cluster")
               .filter(F.col("id_a") < F.col("id_b"))
               .withColumn("_dot", dot)
               # fixed-order IEEE chain; mirrors the oracle literally
               .filter((F.col("_dot") > 0) &
                       (F.col("_dot").cast("double")
                        * F.col("_dot").cast("double")
                        >= (F.lit(t2) * F.col("na").cast("double"))
                        * F.col("nb").cast("double")))
               .select(F.col("id_b").alias("vec_id"))
               .distinct()
               .withColumn("_dup", F.lit(True)))

    return (m.join(dropped, "vec_id", "left")
            .select("vec_id", "cluster",
                    F.col("_dup").isNull().alias("keep"), "capped"))
