"""Embedding covariance / Gram accumulation — the distributed half of
PCA (beyond-reference embedding surface; the JL projection (q102), PQ
(q46) and k-means (q69) operators all consume dense vectors — PCA's
d×d second-moment matrix is the remaining classical primitive, and at
web scale it is ONE partial-agg pass: the O(n·d²) products reduce
map-side to d(d+1)/2 cells, the eigen step on the driver is O(d³) on a
matrix that fits in L1 cache).

Cross-engine exactness contract: embedding components are quantized to
micro-units (BIGINT) FIRST, so all sums are exact integer arithmetic;
the one float step (the covariance normalization) is a module-level
SQL string shared verbatim with the q193 oracle.  sum(qi*qj) over n
rows is bounded by n·(1e6·|e|max)² — BIGINT-safe through corpus scale
(10^5 rows × unit vectors ≈ 6e16 < 2^63); beyond that the caller drops
``scale`` a digit, the documented trade.

Scale shape: slice + quantize map-side, explode the d(d+1)/2 literal
pair list map-side, ONE groupBy(i, j) with map-side combine — the
shuffle carries |pairs| rows per upstream partition.  No windows, no
joins, no driver collect (the eigen helper consumes the returned
SMALL frame).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

# cov_ij in micro-units of the ORIGINAL embedding scale: q values carry
# 1e6 each, so the raw second moment carries 1e12 — dividing the
# centered sum by n and then by 1e6 leaves micro-units.  Shared
# verbatim with the q193 oracle.
COV_MICRO_SQL = ("CAST(round((sum_qq - CAST(sum_qi AS DOUBLE) * sum_qj / n)"
                 " / n / 1000000) AS BIGINT)")


def embedding_covariance(df: DataFrame, vec_col: str = "embedding",
                         dims: int = 16) -> DataFrame:
    """-> (i, j, n, sum_qi, sum_qj, sum_qq, cov_micro) for the upper
    triangle 0 <= i <= j < dims over the first ``dims`` components.
    Rows with fewer than ``dims`` components are dropped (counted into
    no cell) — ragged vectors can't contribute a full outer product.
    """
    q = (df.filter(F.size(F.col(vec_col)) >= dims)
         .select(F.transform(
             F.slice(F.col(vec_col), 1, dims),
             # double BEFORE the multiply: float32 * int stays float32
             # in Spark and loses sub-micro precision at the 1e6 scale,
             # while DuckDB promotes to double — the cast aligns them.
             lambda e: F.round(e.cast("double") * 1000000)
             .cast("long")).alias("q")))
    pairs = [(i, j) for i in range(dims) for j in range(i, dims)]
    cells = q.select(F.explode(F.array(*[
        F.struct(F.lit(i).cast("long").alias("i"),
                 F.lit(j).cast("long").alias("j"),
                 F.element_at("q", i + 1).alias("qi"),
                 F.element_at("q", j + 1).alias("qj"))
        for i, j in pairs])).alias("c")).select("c.*")
    agg = (cells.groupBy("i", "j")
           .agg(F.count(F.lit(1)).cast("long").alias("n"),
                F.sum("qi").cast("long").alias("sum_qi"),
                F.sum("qj").cast("long").alias("sum_qj"),
                F.sum(F.col("qi") * F.col("qj")).cast("long")
                .alias("sum_qq")))
    return agg.select("i", "j", "n", "sum_qi", "sum_qj", "sum_qq",
                      F.expr(COV_MICRO_SQL).alias("cov_micro"))


def covariance_oracle_sql(table: str = "embeddings",
                          vec_col: str = "embedding",
                          dims: int = 16) -> str:
    """DuckDB replay: same micro-quantization, same shared float step."""
    return f"""
        WITH q AS (
          SELECT list_transform({vec_col}[1:{dims}],
                                e -> CAST(round(CAST(e AS DOUBLE)
                                           * 1000000) AS BIGINT)) AS q
          FROM {table} WHERE len({vec_col}) >= {dims}),
        p AS (SELECT a.i, b.j
              FROM (SELECT unnest(generate_series(0, {dims - 1})) AS i) a,
                   (SELECT unnest(generate_series(0, {dims - 1})) AS j) b
              WHERE b.j >= a.i),
        cells AS (SELECT p.i, p.j, q.q[p.i + 1] AS qi, q.q[p.j + 1] AS qj
                  FROM q CROSS JOIN p),
        agg AS (SELECT i, j, CAST(COUNT(*) AS BIGINT) AS n,
                       CAST(SUM(qi) AS BIGINT) AS sum_qi,
                       CAST(SUM(qj) AS BIGINT) AS sum_qj,
                       CAST(SUM(qi * qj) AS BIGINT) AS sum_qq
                FROM cells GROUP BY i, j)
        SELECT CAST(i AS BIGINT) AS i, CAST(j AS BIGINT) AS j, n,
               sum_qi, sum_qj, sum_qq,
               {COV_MICRO_SQL} AS cov_micro
        FROM agg ORDER BY i, j"""


def principal_axes(cov_rows: list, dims: int) -> tuple:
    """Driver-side eigen step (numpy, O(dims^3)): rebuild the symmetric
    covariance matrix from the collected cell rows (micro-units) and
    return (eigenvalues desc, eigenvectors as rows) — the caller
    broadcasts the top-k axes back into a projection expression."""
    import numpy as np

    m = np.zeros((dims, dims))
    for r in cov_rows:
        m[r["i"], r["j"]] = m[r["j"], r["i"]] = r["cov_micro"] / 1e6
    vals, vecs = np.linalg.eigh(m)
    order = np.argsort(vals)[::-1]
    return vals[order], vecs[:, order].T
