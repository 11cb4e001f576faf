#!/usr/bin/env python
"""spark-submit entry point for the KG-construction pipeline.

Production invocation (north rule: "runs via spark-submit --py-files on a
multi-executor cluster"):

    python scripts/package_pyfiles.py            # -> dist/kgp_spark.zip
    spark-submit \\
        --master <cluster> \\
        --py-files dist/kgp_spark.zip \\
        --conf spark.sql.adaptive.enabled=true \\
        --conf spark.sql.adaptive.skewJoin.enabled=true \\
        --conf spark.sql.execution.arrow.pyspark.enabled=true \\
        scripts/run_pipeline.py \\
        --input  <web_pages parquet/iceberg path> \\
        --output <work dir>

Local sandbox run (same code path):

    python scripts/run_pipeline.py --fixture-corpus --output /tmp/kgrun
"""

from __future__ import annotations

import argparse
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--input", help="web_pages table path (url, warc_ts, html, text, lang)")
    ap.add_argument("--output", required=True, help="work/output directory")
    ap.add_argument("--fixture-corpus", action="store_true",
                    help="use the synthesized fixture corpus instead of --input")
    ap.add_argument("--copies", type=int, default=1)
    ap.add_argument("--force", action="store_true", help="ignore checkpoints")
    args = ap.parse_args()

    from pyspark.sql import SparkSession

    from knowledgebase_processor_spark import kg_job
    from knowledgebase_processor_spark.sources.web_pages import (
        fixture_pages, latest_snapshot,
    )

    # Under spark-submit the session/config comes from the submit command;
    # getOrCreate attaches to it.  Standalone, fall back to a local session.
    spark = SparkSession.builder.appName("kgp-pipeline").getOrCreate()

    if args.fixture_corpus:
        pages = fixture_pages(spark, copies=args.copies)
    elif args.input:
        pages = spark.read.parquet(args.input)
    else:
        ap.error("--input or --fixture-corpus required")

    pages = latest_snapshot(pages)
    metrics = kg_job.run(spark, pages, args.output, force=args.force)
    print(json.dumps(metrics))
    spark.stop()


if __name__ == "__main__":
    main()
