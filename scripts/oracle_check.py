#!/usr/bin/env python
"""Driver-style correctness self-check: run every `__spark_entry__.queries()`
entry on Spark AND its `oracle_sql()` in DuckDB over the same parquet
tables, then compare row count + column names + order-insensitive value
hash (columns sorted by name, rows sorted, floats rounded) — the same
protocol the round driver records in CORRECTNESS_r{N}.json.

The driver's canonicalizer loads both result sets into pandas and
sorts across ALL columns, so any array/map/struct output column crashes
it (`TypeError: unhashable type: 'list'` — the round-2 q37 failure).
Every compared query is therefore also shape-gated here: a non-scalar
column in the Spark result schema is a FAIL even if values match.

Usage: python scripts/oracle_check.py [sf_dir] [only_csv]
       python scripts/oracle_check.py --shapes [sf_dir]
           schema-only sweep of EVERY query (builds each DataFrame
           lazily, no execution): flags non-driver-sortable columns.
"""

from __future__ import annotations

import hashlib
import math
import os
import sys

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, ROOT)

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]


def _norm(v):
    if v is None:
        return "\0"
    if isinstance(v, bool):
        return "t" if v else "f"
    if isinstance(v, float):
        if math.isnan(v):
            return "nan"
        return f"{v:.6g}"
    if isinstance(v, (list, tuple)):
        return "[" + ",".join(_norm(x) for x in v) + "]"
    if isinstance(v, bytes):
        return v.hex()
    return str(v)


def _hash(rows: list[dict], cols: list[str]) -> str:
    cols = sorted(cols)
    lines = sorted("\x1f".join(_norm(r[c]) for c in cols) for r in rows)
    h = hashlib.sha256()
    for ln in lines:
        h.update(ln.encode("utf-8", "surrogatepass"))
        h.update(b"\n")
    return h.hexdigest()[:16]


def _bad_shape_cols(schema) -> list[str]:
    """Columns the driver's pandas canonicalizer cannot sort/hash."""
    from pyspark.sql.types import ArrayType, MapType, StructType
    return [f.name for f in schema.fields
            if isinstance(f.dataType, (ArrayType, MapType, StructType))]


def _shapes_sweep(sf: str) -> None:
    """Build every queries() DataFrame (lazy — no job runs) and flag any
    whose output schema contains a non-driver-sortable column."""
    import __spark_entry__ as entry
    from knowledgebase_processor_spark.pipeline import session

    spark = session("shape-check", cpus=4, shuffle_partitions=4)
    bad = []
    try:
        for name, fn in entry.queries().items():
            try:
                cols = _bad_shape_cols(fn(spark, sf).schema)
            except Exception as exc:  # build error is itself a failure
                bad.append((name, f"build error: {exc}"))
                continue
            if cols:
                bad.append((name, f"non-scalar cols: {cols}"))
        for name, why in bad:
            print(f"{name:<34} SHAPE-FAIL  {why}")
        print(f"\n{'ALL SHAPES OK' if not bad else f'{len(bad)} SHAPE FAILURES'}")
    finally:
        spark.stop()
    sys.exit(1 if bad else 0)


def main() -> None:
    import duckdb

    import __spark_entry__ as entry
    from knowledgebase_processor_spark.pipeline import session

    argv = [a for a in sys.argv[1:] if a != "--shapes"]
    if "--shapes" in sys.argv[1:]:
        _shapes_sweep(argv[0] if argv else "/root/testdata/sf0.01")
        return
    sf = argv[0] if argv else "/root/testdata/sf0.01"
    only = set(argv[1].split(",")) if len(argv) > 1 else None
    qs, oracles = entry.queries(), entry.oracle_sql()
    if only:
        qs = {k: v for k, v in qs.items() if k in only}

    con = duckdb.connect()
    for t in TABLES:
        p = os.path.join(sf, f"{t}.parquet")
        if os.path.exists(p):
            con.execute(
                f"create view {t} as select * from read_parquet('{p}')")

    spark = session("oracle-check", cpus=8, shuffle_partitions=8)
    failures = []
    try:
        pinned = getattr(entry, "ORACLE_SF001_PINNED", set())
        at_sf001 = sf.rstrip("/").endswith("sf0.01")
        for name, fn in qs.items():
            if name in pinned and not at_sf001:
                print(f"{name:<34} skipped (oracle pinned to sf0.01)")
                continue
            sdf = fn(spark, sf)
            shape_bad = _bad_shape_cols(sdf.schema)
            if shape_bad:
                print(f"{name:<34} FAIL  non-driver-sortable cols: "
                      f"{shape_bad}")
                failures.append(name)
                continue
            srows = [r.asDict() for r in sdf.collect()]
            scols = sdf.columns
            if name not in oracles:
                print(f"{name:<34} rows-only  n={len(srows)}")
                continue
            rel = con.execute(oracles[name])
            ocols = [d[0] for d in rel.description]
            orows = [dict(zip(ocols, row)) for row in rel.fetchall()]
            ok_n = len(srows) == len(orows)
            ok_c = sorted(scols) == sorted(ocols)
            ok_v = ok_n and ok_c and _hash(srows, scols) == _hash(orows, ocols)
            status = "OK" if (ok_n and ok_c and ok_v) else "FAIL"
            print(f"{name:<34} {status}  n={len(srows)}/{len(orows)} "
                  f"cols={'=' if ok_c else 'DIFF'} vals={'=' if ok_v else 'DIFF'}")
            if status == "FAIL":
                failures.append(name)
                if not ok_c:
                    print(f"    spark cols: {sorted(scols)}")
                    print(f"    duck  cols: {sorted(ocols)}")
    finally:
        spark.stop()
    print(f"\n{'ALL OK' if not failures else 'FAILURES: ' + ', '.join(failures)}")
    sys.exit(1 if failures else 0)


if __name__ == "__main__":
    main()
