"""Int8 embedding quantization (beyond-reference; SURVEY.md §2 round-2
surface).

The production memory lever for vector columns that must stay
re-rankable (unlike PQ codes, int8 vectors still support exact-ish dot
products): per-vector symmetric affine quantization to [-127, 127] with
one double ``scale`` per row — 4x smaller than float32, 8x smaller than
the float64 Spark works in.

Determinism/portability contract (q103 oracle replays every step):

* ``scale`` = array_max(|v|) / 127 — max is exact, one IEEE division.
* ``code_i`` = clamp(floor(v_i / scale), -127, 127).  FLOOR of one IEEE
  division, never round(): round-half semantics differ across engines
  (HALF_UP vs banker's), floor does not.  The clamp exists because
  v_i = -max(|v|) can divide to -127.000…1 (two rounded float ops) and
  floor would emit -128.
* ``sse_fold`` — the reconstruction error Σ (v_i - code_i·scale)², as a
  LEFT-FOLD so DuckDB's list_reduce reproduces the float sum exactly.

All pure column expressions fused into the scan: no UDF, no shuffle,
no Python in the row path.  Zero vectors get scale NULL / codes all 0 /
sse 0.0 (guarded division).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F


def quantize_int8(vecs: DataFrame, id_col: str = "vec_id",
                  vec_col: str = "embedding") -> DataFrame:
    """(id, n_dims, scale, codes array<int>, sum_codes, sse) per row."""
    v = F.col(vec_col).cast("array<double>")
    maxabs = F.array_max(F.transform(v, lambda x: F.abs(x)))
    scale = F.when(maxabs > 0, maxabs / F.lit(127.0))
    base = vecs.select(F.col(id_col), v.alias("v"), scale.alias("scale"))
    # codes are built over the MATERIALIZED v/scale columns of `base`
    codes = F.transform(
        F.col("v"), lambda x: F.when(F.col("scale").isNull(), F.lit(0))
        .otherwise(F.greatest(
            F.lit(-127),
            F.least(F.lit(127),
                    F.floor(x / F.col("scale")).cast("int"))).cast("int")))
    enc = base.select(id_col, "v", "scale", codes.alias("codes"))
    # left-fold reconstruction error: 0.0-seeded aggregate, same order
    # as DuckDB list_reduce over the zipped lists (squares are >= +0.0,
    # so the 0.0 seed is exact)
    err = F.aggregate(
        F.zip_with("v", "codes",
                   lambda x, c: (x - c.cast("double")
                                 * F.coalesce(F.col("scale"), F.lit(0.0)))
                   * (x - c.cast("double")
                      * F.coalesce(F.col("scale"), F.lit(0.0)))),
        F.lit(0.0), lambda acc, t: acc + t)
    return enc.select(
        F.col(id_col),
        F.size("v").alias("n_dims"),
        "scale",
        "codes",
        F.aggregate("codes", F.lit(0).cast("bigint"),
                    lambda acc, c: acc + c.cast("bigint")).alias("sum_codes"),
        err.alias("sse"))
