"""Z-order (Morton) interleaving keys for multi-dimensional data layout.

Beyond-reference (storage-layout family, next to the url-hash bucketed
writes in sinks.py): at 100 TB, scan pruning on TWO correlated
dimensions (e.g. crawl time x domain hash, or partkey x suppkey) needs a
locality-preserving clustering key — writing files sorted by the Morton
code gives every file a tight min/max box in BOTH dimensions, which is
exactly what Delta/Iceberg ``OPTIMIZE ZORDER BY`` does.  This operator
computes the key; the existing bucketed writers consume it.

The interleave is a STATIC expression (one shift/mask term per bit,
unrolled in the plan — whole-stage codegen, no loops, no UDF), and the
identical expression is emitted as ANSI SQL for the q98 oracle, so the
keys are bit-identical across engines.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, functions as F


def z_value(x: Column, y: Column, bits: int = 16) -> Column:
    """Morton code of two ``bits``-bit non-negative ints: x takes the
    even bit positions, y the odd."""
    xm = x.cast("bigint") % (1 << bits)
    ym = y.cast("bigint") % (1 << bits)
    z = F.lit(0).cast("bigint")
    for b in range(bits):
        z = (z
             + F.shiftleft(F.shiftrightunsigned(xm, b) % 2, 2 * b)
             + F.shiftleft(F.shiftrightunsigned(ym, b) % 2, 2 * b + 1))
    return z


def z_value_sql(x_sql: str, y_sql: str, bits: int = 16) -> str:
    """The same Morton interleave as ANSI SQL (DuckDB oracle twin)."""
    terms = []
    for b in range(bits):
        terms.append(f"((({x_sql}) % {1 << bits} >> {b}) % 2 << {2 * b})")
        terms.append(f"((({y_sql}) % {1 << bits} >> {b}) % 2 << {2 * b + 1})")
    return "(" + " + ".join(terms) + ")"


def zorder_layout(df: DataFrame, x_col: str, y_col: str,
                  file_bits: int = 8, bits: int = 16) -> DataFrame:
    """Assign each row its Morton code and target file
    (top ``file_bits`` of the code) — the write-layout frame: sorting by
    ``z`` within ``file_id`` is the ZORDER BY file order.  Returns the
    per-file min/max box of BOTH dimensions (the pruning statistics a
    reader would exploit)."""
    z = z_value(F.col(x_col), F.col(y_col), bits)
    rows = df.select(F.col(x_col).alias("x"), F.col(y_col).alias("y"),
                     z.alias("z"))
    fid = F.shiftrightunsigned(F.col("z"), 2 * bits - file_bits)
    return (rows.groupBy(fid.cast("bigint").alias("file_id"))
            .agg(F.count(F.lit(1)).alias("n_rows"),
                 F.min("x").cast("bigint").alias("x_min"),
                 F.max("x").cast("bigint").alias("x_max"),
                 F.min("y").cast("bigint").alias("y_min"),
                 F.max("y").cast("bigint").alias("y_max")))
