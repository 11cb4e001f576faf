#!/usr/bin/env python
"""Wall-time profile of every `__spark_entry__.queries()` entry at a
given sf dir (default sf0.1) — the feedback loop for finding the slow
tail.  Each query is timed as plan+execute to a count() (matching what
the driver's bench measures).  Prints one sorted line per query.

Usage: python scripts/profile_queries.py [sf_dir] [only,csv]
"""

from __future__ import annotations

import os
import sys
import time

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, ROOT)


def main() -> None:
    import __spark_entry__ as entry
    from knowledgebase_processor_spark.pipeline import session

    sf = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    only = set(sys.argv[2].split(",")) if len(sys.argv) > 2 else None
    spark = session(app="profile", cpus=int(os.environ.get("SPARK_GRAFT_CPUS", "32")))
    qs = entry.queries()
    timings = []
    for name, fn in qs.items():
        if only and name not in only:
            continue
        t0 = time.monotonic()
        try:
            n = fn(spark, sf).count()
            err = ""
        except Exception as e:  # keep profiling the rest
            n, err = -1, f"{type(e).__name__}: {e}"[:80]
        dt = time.monotonic() - t0
        timings.append((dt, name, n, err))
        print(f"{dt:7.2f}s  {name:40s} n={n} {err}", flush=True)
    print("\n== slowest ==")
    for dt, name, n, err in sorted(timings, reverse=True)[:15]:
        print(f"{dt:7.2f}s  {name:40s} n={n} {err}")
    print(f"total {sum(t for t, *_ in timings):.1f}s over {len(timings)} queries")
    spark.stop()


if __name__ == "__main__":
    main()
