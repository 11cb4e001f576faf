"""Random-projection (Johnson–Lindenstrauss) dimensionality reduction
for embedding columns (beyond-reference; SURVEY.md §2 round-2 surface).

The standard cheap lever before ANN / clustering at corpus scale:
project ``array<float>[in_dim]`` to ``array<double>[out_dim]`` with a
seeded Gaussian matrix R — pairwise distances are preserved within
(1±ε) for out_dim = O(log n / ε²) (JL lemma), and the projected table
is out_dim/in_dim the size of the original, which is the difference
between an in-memory and a spilling ANN index build.

Spark shape: the matrix is DRIVER-side literals folded into ONE
projection expression per output dimension — whole-stage codegen, no
UDF, no join, no shuffle; the scan stays a scan.  Each output dim is a
LEFT-FOLD sum of in_dim products, built as a single SQL expr string
(py4j-cheap, see pq._sub_d2) with repr()+'D' double literals, so DuckDB
replays every multiply-add in the same order and the q102 oracle
matches to the ulp.

The matrix derives from ``random.Random(seed).gauss`` — deterministic
across runs, executors, and engines (the literals ARE the matrix; no
runtime RNG anywhere).
"""

from __future__ import annotations

import random

from pyspark.sql import DataFrame, functions as F


def jl_matrix(in_dim: int, out_dim: int, seed: int = 42) -> list[list[float]]:
    """out_dim rows of in_dim seeded N(0,1) weights (plain literals)."""
    rnd = random.Random(seed)
    return [[rnd.gauss(0.0, 1.0) for _ in range(in_dim)]
            for _ in range(out_dim)]


def _dot_sql(vec_col: str, weights: list[float]) -> str:
    """Left-fold Σ_i vec[i]·w_i as SQL text (see pq._sub_d2 rationale)."""
    acc = None
    for i, w in enumerate(weights):
        term = (f"(CAST(element_at(`{vec_col}`, {i + 1}) AS DOUBLE)"
                f" * ({float(w)!r}D))")
        acc = term if acc is None else f"({acc} + {term})"
    return acc


def project(vecs: DataFrame, matrix: list[list[float]],
            id_col: str = "vec_id", vec_col: str = "embedding",
            keep: tuple[str, ...] = ()) -> DataFrame:
    """(id, *keep, projected array<double>[len(matrix)]) — one codegen
    projection, no Python in the row path."""
    proj = F.expr("array(" + ", ".join(
        _dot_sql(vec_col, row) for row in matrix) + ")")
    return vecs.select(F.col(id_col), *[F.col(c) for c in keep],
                       proj.alias("projected"))
