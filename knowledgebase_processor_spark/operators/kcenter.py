"""Greedy k-center coreset selection over embeddings (Gonzalez
farthest-point traversal — the 2-approximation that underlies
coreset-based data selection: pick the point farthest from everything
picked so far, k times.  Where q146's greedy coverage maximizes
SHINGLE coverage and k-means (q69) averages, k-center maximizes
SPREAD — the selection a labeling or eval set wants so no embedding
region is unrepresented).

Distributed shape (the q69/q17 discipline): the corpus-sized work per
round is ONE narrow projection (update running min-distance against
the single newest center, broadcast as a literal) + ONE TakeOrdered(1)
argmax — k rounds, k small (tens), no quadratic distance matrix, no
driver-side loop over rows.  Distances are micro-quantized integer
arithmetic over the quantized embeddings (covariance.py contract), so
ties break deterministically by (distance DESC, id ASC) on exact
BIGINTs and the selection replays bit-identically — the q215 oracle
pins the PURE-PYTHON reference's selection on the sf0.01 parquet.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F


def _quantize(df: DataFrame, vec_col: str, id_col: str,
              dims: int) -> DataFrame:
    return (df.filter(F.size(F.col(vec_col)) >= dims)
            .select(F.col(id_col).alias("vid"),
                    F.transform(
                        F.slice(F.col(vec_col), 1, dims),
                        lambda e: F.round(e.cast("double") * 1000)
                        .cast("long")).alias("q")))


def kcenter_select(df: DataFrame, k: int, vec_col: str = "embedding",
                   id_col: str = "vec_id", dims: int = 16) -> list:
    """-> [(vid, dist_from_selected)] of length k in selection order:
    Gonzalez traversal seeded at the minimum id (deterministic).
    The returned distance is the squared L2 (milli-quantized units)
    from the previously-selected set at pick time (0 for the seed)."""
    q = _quantize(df, vec_col, id_col, dims).localCheckpoint()
    # bounded collect: LIMIT 1 -> exactly one row (TakeOrdered on the
    # executors; only the winner reaches the driver)
    seed = q.orderBy("vid").limit(1).collect()[0]
    picked = [(seed.vid, 0)]
    cur = q.select("vid", F.lit(None).cast("long").alias("d"))
    center = list(seed.q)
    for _ in range(k - 1):
        carr = F.array(*[F.lit(int(c)).cast("long") for c in center])
        d_new = F.aggregate(
            F.zip_with(F.col("q"), carr, lambda a, b: (a - b) * (a - b)),
            F.lit(0).cast("long"), lambda acc, x: acc + x)
        cur = cur.join(q, "vid").select(
            "vid", F.least(F.coalesce("d", d_new), d_new).alias("d"),
        ).localCheckpoint()
        # bounded collect: LIMIT 1 per Gonzalez round (k driver rows
        # total), never corpus-sized
        far = (cur.join(q, "vid")
               .orderBy(F.col("d").desc(), F.col("vid").asc())
               .limit(1).collect()[0])
        picked.append((far.vid, far.d))
        center = list(far.q)
    return picked


def _half_up(x: float) -> int:
    """Spark round() is HALF_UP (away from zero); Python round() is
    banker's — spell it out so the pinned reference cannot drift."""
    import math
    return int(math.floor(x + 0.5) if x >= 0 else math.ceil(x - 0.5))


def kcenter_python(vecs: dict, k: int) -> list:
    """Pure-Python reference (pins the q215 oracle): vecs maps
    id -> list of floats already sliced to dims."""
    q = {i: [_half_up(float(x) * 1000) for x in v]
         for i, v in vecs.items()}
    seed = min(q)
    picked = [(seed, 0)]
    dist = {i: None for i in q}
    center = q[seed]
    for _ in range(k - 1):
        for i, v in q.items():
            d = sum((a - b) * (a - b) for a, b in zip(v, center))
            if dist[i] is None or d < dist[i]:
                dist[i] = d
        far = max(q, key=lambda i: (dist[i], -i))
        picked.append((far, dist[far]))
        center = q[far]
    return picked
