"""End-to-end spark-submit --py-files smoke: the EXACT production
invocation shape from the north rule, against a fresh JVM — catches
packaging bugs (missing vendored deps in the zip, imports that only
work from the repo cwd) that in-process tests mask."""

import json
import os
import subprocess
import sys

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def test_spark_submit_pyfiles_end_to_end(tmp_path):
    zip_path = os.path.join(ROOT, "dist", "kgp_spark.zip")
    subprocess.run([sys.executable,
                    os.path.join(ROOT, "scripts", "package_pyfiles.py")],
                   check=True, capture_output=True)
    assert os.path.exists(zip_path)

    out = str(tmp_path / "kgrun")
    env = dict(os.environ)
    env.pop("PYTHONPATH", None)          # the zip must be self-sufficient
    r = subprocess.run(
        ["spark-submit", "--master", "local[4]",
         "--py-files", zip_path,
         "--conf", "spark.sql.adaptive.enabled=true",
         "--conf", "spark.sql.execution.arrow.pyspark.enabled=true",
         "--conf", "spark.sql.shuffle.partitions=4",
         os.path.join(ROOT, "scripts", "run_pipeline.py"),
         "--fixture-corpus", "--output", out],
        capture_output=True, text=True, timeout=900, env=env,
        cwd=str(tmp_path))               # NOT the repo cwd
    assert r.returncode == 0, r.stderr[-3000:]
    metrics = json.loads(r.stdout.strip().splitlines()[-1])
    assert metrics["n_triples"] > 0 and metrics["n_entities"] > 0
    # the materialized table is on disk and readable
    assert os.path.exists(os.path.join(out, "kg_triples"))
