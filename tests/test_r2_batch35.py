"""Batch-35 round-2: hreflang translation clusters
(operators/hreflang.py), token fertility (operators/textstats.py),
Hilbert-curve layout (operators/hilbert.py)."""

import duckdb

from knowledgebase_processor_spark.operators.hilbert import (
    hilbert_index, hilbert_sql, hilbert_xy2d)
from knowledgebase_processor_spark.operators.hreflang import (
    translation_clusters, translation_report)
from knowledgebase_processor_spark.operators.textstats import (
    token_fertility)


# ---------------------------------------------------------------- hreflang ----

def test_translation_clusters_partial_chains(spark):
    # cluster 1: a->b, b->c (c declares nothing); cluster 2: x<->y;
    # page z has no alternates -> absent
    edges = spark.createDataFrame(
        [("a", "b"), ("b", "c"), ("x", "y"), ("y", "x")],
        "src string, dst string")
    langs = spark.createDataFrame(
        [("a", "en"), ("b", "de"), ("c", "fr"), ("x", "en"),
         ("y", "en"), ("z", "zh")], "url string, lang string")
    got = {r.cluster: (r.size, r.n_langs)
           for r in translation_clusters(edges, langs).collect()}
    assert len(got) == 2
    assert (3, 3) in got.values()   # a,b,c with 3 langs
    assert (2, 1) in got.values()   # x,y duplicate-language pair
    rep = {(r.size, r.n_langs): r.n_clusters
           for r in translation_report(
               translation_clusters(edges, langs)).collect()}
    assert rep == {(3, 3): 1, (2, 1): 1}


def test_translation_clusters_unlabeled_member(spark):
    # a member url missing from page_langs still counts toward size
    edges = spark.createDataFrame([("a", "b")], "src string, dst string")
    langs = spark.createDataFrame([("a", "en")], "url string, lang string")
    r = translation_clusters(edges, langs).collect()[0]
    assert (r.size, r.n_langs) == (2, 1)


# --------------------------------------------------------------- fertility ----

def test_token_fertility_hand_computed(spark):
    df = spark.createDataFrame(
        [("en", "ab cd!"), ("en", "x1"), ("zh", "中文")],
        "lang string, text string")
    got = {r.lang: r for r in token_fertility(df).collect()}
    # en: "ab cd!" -> tokens [ab, cd, !] ; "x1" -> [x, 1]; 5 tokens
    en = got["en"]
    assert (en.n_docs, en.sum_tokens) == (2, 5)
    assert en.sum_chars == 8 and en.sum_bytes == 8
    assert en.chars_per_token_ppm == 8 * 1_000_000 // 5
    # zh: 2 chars, 6 utf-8 bytes, 2 punct-class tokens
    zh = got["zh"]
    assert (zh.sum_chars, zh.sum_bytes, zh.sum_tokens) == (2, 6, 2)
    assert zh.bytes_per_token_ppm == 3_000_000


def test_token_fertility_null_and_empty(spark):
    df = spark.createDataFrame([("en", None), ("en", "")],
                               "lang string, text string")
    r = token_fertility(df).collect()[0]
    assert (r.sum_tokens, r.bytes_per_token_ppm) == (0, None)


# ----------------------------------------------------------------- Hilbert ----

def test_hilbert_index_matches_python_reference(spark):
    order = 6
    pts = [(i, x, y) for i, (x, y) in enumerate(
        (x, y) for x in range(0, 64, 3) for y in range(0, 64, 5))]
    df = spark.createDataFrame(pts, "id long, x long, y long")
    rows = hilbert_index(df, "x", "y", order=order).collect()
    for r in rows:
        assert r.hilbert == hilbert_xy2d(order, r.x, r.y), (r.x, r.y)


def test_hilbert_is_a_bijection_with_unit_steps():
    # full order-4 grid: curve positions are a permutation of 0..255
    # and consecutive positions are Manhattan-adjacent cells
    order, n = 4, 16
    pos = {}
    for x in range(n):
        for y in range(n):
            pos[hilbert_xy2d(order, x, y)] = (x, y)
    assert sorted(pos) == list(range(n * n))
    for d in range(n * n - 1):
        (x1, y1), (x2, y2) = pos[d], pos[d + 1]
        assert abs(x1 - x2) + abs(y1 - y2) == 1


def test_hilbert_sql_text_is_engine_portable(spark):
    # the SAME generated text runs on Spark and DuckDB bit-identically
    con = duckdb.connect()
    con.execute("CREATE TABLE pts AS SELECT unnest(generate_series(0, 99))"
                " AS doc_id")
    sql = hilbert_sql("pts", "doc_id", "doc_id % 16", "(doc_id * 3) % 16",
                      order=4)
    duck = con.execute(sql).fetchall()
    spark.range(0, 100).selectExpr("id AS doc_id") \
        .createOrReplaceTempView("pts")
    spk = [tuple(r) for r in spark.sql(sql).collect()]
    assert spk == duck
    for _, x, y, h in spk:
        assert h == hilbert_xy2d(4, x, y)
