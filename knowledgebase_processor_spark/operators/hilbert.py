"""Hilbert-curve file layout (companion to the Z-order clustering of
q98/zorder.py: the Hilbert curve has strictly better locality — every
unit step on the curve is a unit step in (x, y) space, so a range of
curve positions always covers a compact tile, where Z-order takes
long diagonal jumps at power-of-two boundaries.  Writing a 10^12-row
table sorted by hilbert(host_bucket, time_bucket) gives min/max
zone-map pruning on BOTH dimensions for typical host+time scans —
Delta/Iceberg OPTIMIZE offer exactly this curve for the same reason).

The index is the textbook xy2d bit-interleave-with-rotation, unrolled
into one chained-CTE SQL text built here ONCE and executed VERBATIM
by both Spark and DuckDB (the q197 oracle): per bit level s —

    quadrant q = f(rx, ry);  d += s*s*q;  reflect+swap (x, y)

using only `&`, CASE and arithmetic (no `//` vs `DIV`, no engine
shift/xor spellings — `(3*rx) XOR ry` is spelled as its 4-case
table).  Entirely map-side: the layout column is one projection; the
only wide op a writer adds is its range partitioner over ``hilbert``.
"""

from __future__ import annotations

from pyspark.sql import DataFrame

ORDER_DEFAULT = 8  # 8 bits per dimension -> 16-bit curve positions


def _stage_sql(s: int, n: int, x: str = "x", y: str = "y",
               d: str = "d") -> tuple[str, str, str]:
    """(new_x, new_y, d_increment) expressions for bit level s, over
    working-variable column names (x, y, d)."""
    rx, ry = f"(({x} & {s}) > 0)", f"(({y} & {s}) > 0)"
    quad = (f"CASE WHEN {rx} AND {ry} THEN 2"
            f" WHEN {rx} THEN 3"
            f" WHEN {ry} THEN 1 ELSE 0 END")
    new_x = (f"CASE WHEN NOT {ry} THEN"
             f" (CASE WHEN {rx} THEN {n - 1} - {y} ELSE {y} END)"
             f" ELSE {x} END")
    new_y = (f"CASE WHEN NOT {ry} THEN"
             f" (CASE WHEN {rx} THEN {n - 1} - {x} ELSE {x} END)"
             f" ELSE {y} END")
    return new_x, new_y, f"{d} + {s * s} * ({quad})"


def hilbert_sql(table_sql: str, id_sql: str, x_sql: str, y_sql: str,
                order: int = ORDER_DEFAULT) -> str:
    """The full portable query text: -> (id, x, y, hilbert) rows.
    ``x_sql``/``y_sql`` must already be in [0, 2^order).

    ``id_sql`` MUST be unique per row of ``table_sql``: the final
    stage re-joins the (id, x, y) echo back to the folded CTE chain on
    ``id`` alone, so a duplicated id silently multiplies rows
    (id-uniqueness is the caller's contract; q197 uses unique doc_id).
    """
    n = 1 << order
    ctes = [f"h0 AS (SELECT {id_sql} AS id, {x_sql} AS x,"
            f" {y_sql} AS y, 0 AS d FROM {table_sql})"]
    prev = "h0"
    for k in range(order):
        s = n >> (k + 1)
        nx, ny, nd = _stage_sql(s, n)
        ctes.append(f"h{k + 1} AS (SELECT id, {nx} AS x, {ny} AS y,"
                    f" {nd} AS d FROM {prev})")
        prev = f"h{k + 1}"
    return (f"WITH {', '.join(ctes)},"
            f" src AS (SELECT {id_sql} AS id, {x_sql} AS x,"
            f" {y_sql} AS y FROM {table_sql})"
            f" SELECT CAST(src.id AS BIGINT) AS id,"
            f" CAST(src.x AS BIGINT) AS x, CAST(src.y AS BIGINT) AS y,"
            f" CAST({prev}.d AS BIGINT) AS hilbert"
            f" FROM src JOIN {prev} ON src.id = {prev}.id"
            f" ORDER BY id")


def hilbert_index(df: DataFrame, x_col: str, y_col: str,
                  order: int = ORDER_DEFAULT,
                  out_col: str = "hilbert") -> DataFrame:
    """DataFrame path: append the curve position — the same unrolled
    stages as the SQL text, as a chain of narrow projections (one
    whole-stage-codegen span, zero shuffles)."""
    n = 1 << order
    base = list(df.columns)
    out = df.selectExpr(*base, f"CAST({x_col} AS BIGINT) AS __hx",
                        f"CAST({y_col} AS BIGINT) AS __hy", "0 AS __hd")
    for k in range(order):
        s = n >> (k + 1)
        # collision-proof internal working names: the input frame may
        # itself carry columns called x/y/d
        nx, ny, nd = _stage_sql(s, n, "__hx", "__hy", "__hd")
        out = out.selectExpr(*base, f"{nx} AS __hx", f"{ny} AS __hy",
                             f"{nd} AS __hd")
    return out.selectExpr(*base, f"CAST(__hd AS BIGINT) AS {out_col}")


def hilbert_xy2d(order: int, x: int, y: int) -> int:
    """Pure-Python reference (tests differentiate the SQL against it)."""
    n = 1 << order
    d = 0
    s = n // 2
    while s > 0:
        rx = 1 if (x & s) > 0 else 0
        ry = 1 if (y & s) > 0 else 0
        d += s * s * ((3 * rx) ^ ry)
        if ry == 0:
            if rx == 1:
                x, y = n - 1 - x, n - 1 - y
            x, y = y, x
        s //= 2
    return d
