"""Batch-45 round-2: within-block HAC (operators/hac.py) and Unicode
script-mix gate (operators/textstats.py::script_mix_report)."""

from knowledgebase_processor_spark.operators.hac import (
    _lev, hac_blocks, hac_cluster)
from knowledgebase_processor_spark.operators.textstats import (
    script_mix_report)


# --------------------------------------------------------------------- HAC ----

def test_lev_kernel():
    assert _lev("kitten", "sitting") == 3
    assert _lev("", "abc") == 3
    assert _lev("same", "same") == 0


def test_hac_does_not_chain():
    # A-B dist 1, B-C dist 1, A-C dist 2: after merging {A,B}, the
    # average distance to C is 1.5 -> merges at threshold 2.0...
    keys = {1: "smith", 2: "smitx", 3: "smixx"}
    assign = hac_cluster(keys, 2000)
    assert len(set(assign.values())) == 1
    # ...but NOT at threshold 1.2: CC-style transitive closure WOULD
    # merge all three (every adjacent pair is dist 1) — average
    # linkage stops, which is the whole point
    assign2 = hac_cluster(keys, 1200)
    assert len(set(assign2.values())) == 2


def test_hac_cluster_label_is_min_member():
    keys = {7: "abc", 3: "abc", 9: "zzzzzz"}
    assign = hac_cluster(keys, 1000)
    assert assign[7] == assign[3] == 3
    assert assign[9] == 9


def test_hac_blocks_spark_matches_kernel(spark):
    rows = [("b1", 1, "alpha"), ("b1", 2, "alphx"), ("b1", 3, "zzzz"),
            ("b2", 10, "beta"), ("b2", 11, "beta")]
    df = spark.createDataFrame(rows, "block string, rec_id long, key string")
    got = {r.rec_id: (r.cluster, r.oversized)
           for r in hac_blocks(df, threshold_milli=2000).collect()}
    assert got == {1: (1, False), 2: (1, False), 3: (3, False),
                   10: (10, False), 11: (10, False)}


def test_hac_oversized_block_passes_through(spark):
    rows = [("big", i, "k") for i in range(6)] + [("ok", 99, "x")]
    df = spark.createDataFrame(rows, "block string, rec_id long, key string")
    got = {r.rec_id: (r.cluster, r.oversized)
           for r in hac_blocks(df, threshold_milli=2000,
                               max_block=5).collect()}
    for i in range(6):
        assert got[i] == (i, True)   # singletons, flagged
    assert got[99] == (99, False)


# -------------------------------------------------------------- script mix ----

def test_script_mix_counts_unicode_blocks(spark):
    rows = [("mix", "abc 123 Привет 中文 مرحبا 한글 αβ !?")]
    df = spark.createDataFrame(rows, "lang string, text string")
    r = script_mix_report(df).collect()[0]
    assert r.latin == 3 and r.digit == 3
    assert r.cyrillic == 6 and r.cjk == 2
    assert r.arabic == 5 and r.hangul == 2 and r.greek == 2
    assert r.other == 2  # '!' and '?'
    non_ws = r.n_chars - (len("abc 123 Привет 中文 مرحبا 한글 αβ !?")
                          - len("abc123Привет中文مرحبا한글αβ!?"))
    assert r.latin_ppm == 3 * 1_000_000 // non_ws


def test_script_mix_ascii_corpus_all_latin(spark):
    df = spark.createDataFrame([("en", "plain words only")],
                               "lang string, text string")
    r = script_mix_report(df).collect()[0]
    assert r.cjk == r.cyrillic == r.arabic == r.other == 0
    assert r.latin == 14


def test_script_mix_null_text(spark):
    df = spark.createDataFrame([("en", None)], "lang string, text string")
    r = script_mix_report(df).collect()[0]
    assert (r.n_chars, r.latin, r.latin_ppm) == (0, 0, None)
