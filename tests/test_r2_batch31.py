"""Batch-31 round-2: Levenshtein pair verification
(operators/dedup.py::edit_distance_pairs) and streaming runs of the
stateless crawl-health gates."""

from knowledgebase_processor_spark.operators.dedup import (
    edit_distance_pairs)


def _docs(spark, rows):
    return spark.createDataFrame(rows, "doc_id long, text string")


def _cands(spark, pairs):
    return spark.createDataFrame(pairs, "doc_a long, doc_b long")


def test_edit_distance_pairs_exact_values(spark):
    docs = _docs(spark, [
        (1, "the quick brown fox"),
        (2, "the quick browny fox"),     # one insertion: dist 1
        (3, "completely different words entirely"),
        (4, None)])
    out = {(r.doc_a, r.doc_b): r for r in edit_distance_pairs(
        docs, _cands(spark, [(1, 2), (1, 3), (1, 4)]),
        max_dist=25).collect()}
    assert out[(1, 2)].dist == 1
    assert out[(1, 2)].dist_ppm == 1_000_000 // len("the quick browny fox")
    assert (1, 3) not in out             # dist > 25
    assert out[(1, 4)].dist == len("the quick brown fox")  # vs empty


def test_edit_distance_truncation_bounds_cost(spark):
    a = "x" * 10_000
    b = "x" * 9_000 + "y" * 1_000
    docs = _docs(spark, [(1, a), (2, b)])
    r = edit_distance_pairs(docs, _cands(spark, [(1, 2)]),
                            max_dist=10_000, max_chars=500).collect()[0]
    assert r.dist == 0                   # prefixes identical post-cap


def test_crawlhealth_gates_run_as_streams(spark, tmp_path):
    import pyspark.sql.functions as F
    from knowledgebase_processor_spark.operators.crawlhealth import (
        soft404_report)
    src = tmp_path / "in"
    src.mkdir()
    batch = spark.createDataFrame(
        [(1, "h", "page not found"), (2, "h", "real article text")],
        "doc_id long, host string, text string")
    batch.write.parquet(str(src / "b0"))
    stream = (spark.readStream.schema(batch.schema)
              .parquet(str(src / "*")))
    out = soft404_report(stream)
    assert out.isStreaming
    q = (out.writeStream.format("memory").queryName("soft404_mem")
         .trigger(availableNow=True).start())
    q.awaitTermination(60)
    got = {r.doc_id: r.is_soft404
           for r in spark.sql("SELECT * FROM soft404_mem").collect()}
    assert got == {1: True, 2: False}
