#!/usr/bin/env python
"""Benchmark runner (driver contract).

Runs the headline queries at $SPARK_GRAFT_SF_DIR (default
/root/testdata/sf0.1) on local[$SPARK_GRAFT_CPUS] and prints ONE JSON
line: {"metric", "value" (total headline seconds), "unit": "sec",
"queries": {name: sec}, "sf", plus informational extras
(triples, triples_per_sec, cpus)}.

`python bench.py --scaling` additionally runs the KG pipeline at two
parallelism levels (local[8] vs local[32]) in fresh sessions and reports
throughput + scaling efficiency (the sandbox proxy for N vs 4N executors,
see BENCH/BASELINE.md).
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
CPUS = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))

HEADLINE = [
    "q22_triples_by_kind",   # the KG-construction pipeline (flagship)
    "q01_pricing_summary",
    "q02_top_customers",
    "q08_related_by_shared_key",
    "q12_lang_id",
    "q17_ann_topk",
    "q20_minhash_lsh",
]


def _run_queries(spark):
    import __spark_entry__ as entry_mod
    qs = entry_mod.queries()
    timings: dict[str, float] = {}
    for name in HEADLINE:
        t0 = time.perf_counter()
        df = qs[name](spark, SF_DIR)
        df.collect()
        timings[name] = round(time.perf_counter() - t0, 3)
    return timings


def _pipeline_throughput(spark) -> tuple[int, float]:
    """(n_triples, seconds) for the full documents->triples pipeline."""
    from pyspark.sql import functions as F
    from knowledgebase_processor_spark.pipeline import documents_to_triples

    docs = spark.read.parquet(f"{SF_DIR}/documents.parquet").select(
        F.concat(F.lit("corpus/doc-"), F.col("doc_id").cast("string")).alias("doc_id"),
        "text")
    t0 = time.perf_counter()
    n = documents_to_triples(docs, resolve_links=True).count()
    return n, time.perf_counter() - t0


def main() -> None:
    from knowledgebase_processor_spark.pipeline import session

    scaling = "--scaling" in sys.argv
    spark = session("kgp-bench", cpus=CPUS)
    try:
        # warm the JVM/Python workers so timings measure the queries
        spark.range(1000).selectExpr("sum(id)").collect()
        timings = _run_queries(spark)
        n_triples, pipe_sec = _pipeline_throughput(spark)
    finally:
        spark.stop()

    result = {
        "metric": "headline_queries_total",
        "value": round(sum(timings.values()), 3),
        "unit": "sec",
        "queries": timings,
        "sf": SF_DIR.rstrip("/").rsplit("sf", 1)[-1],
        "cpus": CPUS,
        "triples": n_triples,
        "pipeline_sec": round(pipe_sec, 3),
        "triples_per_sec": round(n_triples / pipe_sec, 1),
    }

    if scaling:
        scale_runs = {}
        for cpus in (8, 32):
            s = session(f"kgp-scale-{cpus}", cpus=cpus)
            try:
                s.range(1000).selectExpr("sum(id)").collect()
                n, sec = _pipeline_throughput(s)
            finally:
                s.stop()
            scale_runs[cpus] = {"sec": round(sec, 3),
                                "triples_per_sec": round(n / sec, 1)}
        eff = (scale_runs[32]["triples_per_sec"]
               / scale_runs[8]["triples_per_sec"]) / 4.0
        result["scaling"] = {"local8": scale_runs[8], "local32": scale_runs[32],
                             "efficiency_8_to_32": round(eff, 3)}

    print(json.dumps(result))


if __name__ == "__main__":
    main()
