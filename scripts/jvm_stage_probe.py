#!/usr/bin/env python
"""Decompose the local[N] pipeline into extract-only vs full, with JVM GC
time — quantifies the shared-JVM serial fraction that bounds the 8->32
scaling pair (BENCH/BASELINE.md).  Run ALONE (host-noise discipline):

    python scripts/jvm_stage_probe.py 8
    python scripts/jvm_stage_probe.py 32
    python scripts/jvm_stage_probe.py 8 --explode-only
    python scripts/jvm_stage_probe.py 32 --explode-only

Prints one JSON line per invocation; compare gc_ms and the
full-vs-extract gap across levels.  ``--explode-only`` times the JVM
triple explosion in ISOLATION over pre-extracted merged entities
(materialized once to $KGP_MERGED_CORPUS) — this is how we separated
"the explosion doesn't scale" (false: 1.63 s @8 -> 0.84 s @32) from
"the explosion doesn't scale while sharing pinned cores with N
saturated Python workers" (true; local-mode 2x oversubscription).
"""

from __future__ import annotations

import json
import os
import sys
import time

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, ROOT)

CORPUS = os.environ.get("KGP_SCALE_CORPUS", "/tmp/kgp_bench_webpages_2400")
MERGED = os.environ.get("KGP_MERGED_CORPUS", "/tmp/kgp_merged_2400")


def _ensure_merged(spark) -> None:
    """Materialize the extraction output once so --explode-only times the
    JVM stage against parquet, with no Python workers in the process."""
    if os.path.exists(os.path.join(MERGED, "_SUCCESS")):
        return
    from pyspark.sql import functions as F
    from knowledgebase_processor_spark.operators.extract_udf import (
        extract_merged_entities_df,
    )
    from knowledgebase_processor_spark.operators.wikilink_resolve import (
        documents_dimension, resolve_wikilinks_merged,
    )
    pages = spark.read.parquet(CORPUS)
    docs = pages.select(
        F.col("url").alias("doc_id"), "text",
        F.regexp_extract("url", r"([^/]+)$", 1).alias("path"),
        F.lit(None).cast("string").alias("title"))
    merged = extract_merged_entities_df(docs, "doc_id", "text", "path", "title")
    dim = documents_dimension(docs, "doc_id", "path")
    resolve_wikilinks_merged(merged, dim) \
        .repartition(128).write.mode("overwrite").parquet(MERGED)


def _explode_only(cpus: int) -> None:
    import json as _json

    from knowledgebase_processor_spark.operators.triples import explode_merged
    from knowledgebase_processor_spark.pipeline import session

    spark = session(f"explode-only-{cpus}", cpus=cpus)
    try:
        _ensure_merged(spark)
        m = spark.read.parquet(MERGED)
        explode_merged(m).count()  # warm
        best = float("inf")
        for _ in range(3):
            t0 = time.perf_counter()
            n = explode_merged(m).count()
            best = min(best, time.perf_counter() - t0)
        print(_json.dumps({"cpus": cpus, "explode_sec": round(best, 2),
                           "triples": n}))
    finally:
        spark.stop()


def _gc_ms(spark) -> int:
    beans = (spark._jvm.java.lang.management.ManagementFactory
             .getGarbageCollectorMXBeans())
    return sum(beans.get(i).getCollectionTime() for i in range(beans.size()))


def main() -> None:
    cpus = int(sys.argv[1])
    if "--explode-only" in sys.argv:
        _explode_only(cpus)
        return
    from pyspark.sql import functions as F
    from knowledgebase_processor_spark.operators.extract_udf import (
        extract_merged_entities_df,
    )
    from knowledgebase_processor_spark.operators.triples import explode_merged
    from knowledgebase_processor_spark.operators.wikilink_resolve import (
        documents_dimension, resolve_wikilinks_merged,
    )
    from knowledgebase_processor_spark.pipeline import session, web_pages_to_triples

    spark = session(f"stage-probe-{cpus}", cpus=cpus)
    try:
        pages = spark.read.parquet(CORPUS)
        docs = pages.select(
            F.col("url").alias("doc_id"), F.col("text"),
            F.regexp_extract(F.col("url"), r"([^/]+)$", 1).alias("path"),
            F.regexp_replace(F.regexp_extract(F.col("url"), r"([^/]+)$", 1),
                             r"\.[^.]*$", "").alias("title"))

        def extract_only():
            merged = extract_merged_entities_df(docs, "doc_id", "text",
                                                "path", "title")
            dim = documents_dimension(docs, "doc_id", "path")
            return resolve_wikilinks_merged(merged, dim).count()

        def full():
            return web_pages_to_triples(pages).count()

        out = {"cpus": cpus}
        for name, fn in (("extract", extract_only), ("full", full)):
            fn()  # warm
            best, gc_best = float("inf"), 0
            for _ in range(3):
                g0, t0 = _gc_ms(spark), time.perf_counter()
                n = fn()
                dt = time.perf_counter() - t0
                if dt < best:
                    best, gc_best = dt, _gc_ms(spark) - g0
            out[f"{name}_sec"] = round(best, 2)
            out[f"{name}_gc_ms"] = gc_best
            out[f"{name}_n"] = n
        out["jvm_overhead_sec"] = round(out["full_sec"] - out["extract_sec"], 2)
        print(json.dumps(out))
    finally:
        spark.stop()


if __name__ == "__main__":
    main()
