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
    # warm pass (untimed): spins up the Python worker pool, compiles the
    # whole-stage-codegen for each plan, and builds the cached triple-CASE
    # expression — one-time costs a long-lived cluster job never re-pays.
    for name in HEADLINE:
        qs[name](spark, SF_DIR).collect()
    # Best-of-2 timed passes per query, plus a third pass for queries
    # whose two timings disagree by > 50%: this host freezes individual
    # vCPUs for tens of seconds at a time (diagnosed in BENCH/BASELINE.md
    # "host-migration note": stalled queries show idle CPU, zero GC, and
    # pure-Python multiprocess loops on the same box run dead stable — a
    # frozen scheduler-thread vCPU stalls the whole job).  Noise only
    # ever adds time, so min() over passes filters it — the same
    # methodology the --scaling lane has used since round 1.
    def _timed(name: str) -> float:
        t0 = time.perf_counter()
        qs[name](spark, SF_DIR).collect()
        return round(time.perf_counter() - t0, 3)

    timings: dict[str, float] = {}
    for name in HEADLINE:
        # BENCH_r04's phantom +39% survived best-of-2..4 (a host freeze
        # spanned every pass of several queries); round 5 strengthens
        # the lane to three base passes and a tighter 30% agreement
        # between the TWO SMALLEST readings (cap 6) — the minimum is
        # the only estimator unbiased under pause-injection noise, and
        # requiring its runner-up to corroborate it rejects a single
        # lucky/unlucky draw in either direction.
        runs = [_timed(name) for _ in range(3)]
        while (len(runs) < 6
               and sorted(runs)[1] > 1.3 * min(runs)):
            runs.append(_timed(name))
        timings[name] = min(runs)
    return timings


def _pipeline_throughput(spark, cpus: int) -> tuple[int, float]:
    """(n_triples, seconds) for the full documents->triples pipeline.

    The testdata ships as one parquet file = one input split, so the read
    is repartitioned to cpus — at production scale the table has thousands
    of splits and this repartition disappears.
    """
    from pyspark.sql import functions as F
    from knowledgebase_processor_spark.pipeline import documents_to_triples

    docs = spark.read.parquet(f"{SF_DIR}/documents.parquet").select(
        F.concat(F.lit("corpus/doc-"), F.col("doc_id").cast("string")).alias("doc_id"),
        "text").repartition(cpus)
    documents_to_triples(docs, resolve_links=True).count()   # warm pass
    best = float("inf")
    for _ in range(3):                                       # best-of-3 steady state
        t0 = time.perf_counter()
        n = documents_to_triples(docs, resolve_links=True).count()
        best = min(best, time.perf_counter() - t0)
    return n, best


def _materialize_corpus(spark, copies: int) -> str:
    """Write the tiled Common-Crawl-style corpus to parquet once (outside
    any timed region) — a driver-local createDataFrame re-serializes every
    job and single-threads the source, masking executor scaling."""
    import tempfile
    from knowledgebase_processor_spark.sources.web_pages import fixture_pages

    path = os.path.join(tempfile.gettempdir(), f"kgp_bench_webpages_{copies}")
    if not os.path.exists(os.path.join(path, "_SUCCESS")):
        fixture_pages(spark, copies=copies).repartition(128) \
            .write.mode("overwrite").parquet(path)
    return path


def _scaling_throughput(spark, corpus_path: str) -> tuple[int, float]:
    """Scaling probe: the web_pages corpus (real markdown, the
    BASELINE.json metric) through the full pipeline, parquet-sourced."""
    from knowledgebase_processor_spark.pipeline import web_pages_to_triples

    pages = spark.read.parquet(corpus_path)
    t0 = time.perf_counter()
    n = web_pages_to_triples(pages).count()
    return n, time.perf_counter() - t0


def _scale_worker(cpus: int, corpus: str) -> None:
    """Run one scaling level (invoked in a taskset-pinned subprocess so
    local[N] really only has N machine cores, like an N-core cluster
    would — otherwise the JVM/GC of a local[8] run borrows the other 24
    cores and the 8->32 efficiency is understated)."""
    from knowledgebase_processor_spark.pipeline import session

    s = session(f"kgp-scale-{cpus}", cpus=cpus)
    try:
        _scaling_throughput(s, corpus)        # warm pass
        n, sec = min((_scaling_throughput(s, corpus) for _ in range(3)),
                     key=lambda r: r[1])      # best-of-3 steady state
    finally:
        s.stop()
    print(json.dumps({"cpus": cpus, "n": n, "sec": round(sec, 3)}))


def _run_scale_level(cpus: int, corpus: str, repeats: int = 2) -> dict:
    """Run one pinned level in a fresh process, `repeats` times, best-of.

    The sandbox host has heavy noisy-neighbor variance (identical
    back-to-back runs measured 2.5x apart); noise only ever ADDS time, so
    best-of-process-repeats on top of the worker's best-of-3 filters it.
    """
    import shutil
    import subprocess
    cmd = [sys.executable, os.path.abspath(__file__),
           "--_scale-worker", str(cpus), corpus]
    if shutil.which("taskset"):
        cmd = ["taskset", "-c", f"0-{cpus - 1}"] + cmd
    best = None
    for _ in range(repeats):
        out = subprocess.run(cmd, capture_output=True, text=True, check=True)
        rec = json.loads(out.stdout.strip().splitlines()[-1])
        if best is None or rec["sec"] < best["sec"]:
            best = rec
    return {"sec": best["sec"],
            "triples_per_sec": round(best["n"] / best["sec"], 1)}


def main() -> None:
    from knowledgebase_processor_spark.pipeline import session

    if "--_scale-worker" in sys.argv:
        i = sys.argv.index("--_scale-worker")
        _scale_worker(int(sys.argv[i + 1]), sys.argv[i + 2])
        return

    scaling = "--scaling" in sys.argv
    spark = session("kgp-bench", cpus=CPUS)
    try:
        # warm the JVM/Python workers so timings measure the queries
        spark.range(1000).selectExpr("sum(id)").collect()
        timings = _run_queries(spark)
        n_triples, pipe_sec = _pipeline_throughput(spark, CPUS)
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
        copies = int(os.environ.get("SPARK_GRAFT_SCALE_COPIES", "2400"))
        levels = [int(x) for x in
                  os.environ.get("SPARK_GRAFT_SCALE_LEVELS", "2,8,32").split(",")]
        prep = session("kgp-scale-prep", cpus=8)
        try:
            corpus = _materialize_corpus(prep, copies)
        finally:
            prep.stop()
        scale_runs = {cpus: _run_scale_level(cpus, corpus) for cpus in levels}
        result["scaling"] = {f"local{c}": scale_runs[c] for c in levels}
        for lo, hi in zip(levels, levels[1:]):
            eff = (scale_runs[hi]["triples_per_sec"]
                   / scale_runs[lo]["triples_per_sec"]) / (hi / lo)
            result["scaling"][f"efficiency_{lo}_to_{hi}"] = round(eff, 3)

    print(json.dumps(result))


if __name__ == "__main__":
    main()
