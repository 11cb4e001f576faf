"""Positional postings / phrase search and z-order layout keys."""

import random

from pyspark.sql import functions as F

from knowledgebase_processor_spark.operators.index import (
    build_postings, phrase_hits)
from knowledgebase_processor_spark.operators.zorder import (
    z_value, zorder_layout)


# ------------------------------------------------------------- index ----

def test_phrase_hits_adjacency_semantics(spark):
    docs = [(1, "a b c a b c"),          # two hits of "a b c"
            (2, "a x b c"),              # a..b not adjacent -> no hit
            (3, "b c a"),                # wrapped order -> no hit
            (4, "a b"),                  # incomplete phrase
            (5, "a a b c")]              # one hit, extra 'a' before
    df = spark.createDataFrame(docs, "doc_id long, text string")
    got = {r["doc_id"]: r["n_hits"]
           for r in phrase_hits(df, ["a", "b", "c"]).collect()}
    assert got == {1: 2, 5: 1}


def test_phrase_hits_overlapping_repeats(spark):
    df = spark.createDataFrame([(1, "x x x x")], "doc_id long, text string")
    got = {r["doc_id"]: r["n_hits"]
           for r in phrase_hits(df, ["x", "x"]).collect()}
    assert got == {1: 3}  # starts at positions 1, 2, 3


def test_build_postings_positions_and_cap(spark):
    df = spark.createDataFrame([(1, "a b a b a"), (2, "a z")],
                               "doc_id long, text string")
    rows = {(r["term"], r["doc_id"]): r
            for r in build_postings(df, max_positions=2).collect()}
    a1 = rows[("a", 1)]
    assert a1["tf"] == 3 and a1["df"] == 2
    assert a1["positions"] == [1, 3] and a1["positions_capped"]
    b1 = rows[("b", 1)]
    assert b1["positions"] == [2, 4] and not b1["positions_capped"]
    assert rows[("z", 2)]["df"] == 1


# ------------------------------------------------------------ zorder ----

def _py_z(x, y, bits=16):
    z = 0
    for b in range(bits):
        z |= ((x % (1 << bits)) >> b & 1) << (2 * b)
        z |= ((y % (1 << bits)) >> b & 1) << (2 * b + 1)
    return z


def test_z_value_matches_python(spark):
    rng = random.Random(3)
    pts = [(rng.randrange(1 << 16), rng.randrange(1 << 16))
           for _ in range(300)]
    df = spark.createDataFrame(pts, "x long, y long")
    got = [r["z"] for r in
           df.select(z_value(F.col("x"), F.col("y")).alias("z"))
           .collect()]
    assert got == [_py_z(x, y) for x, y in pts]


def test_zorder_files_have_tight_boxes(spark):
    # uniform grid: every z-file's box must cover far less than the
    # whole domain in BOTH dimensions (the locality property a plain
    # sort by x cannot give for y)
    pts = [(x * 257 % 4096, y * 263 % 4096)
           for x in range(80) for y in range(80)]
    df = spark.createDataFrame(pts, "x long, y long")
    files = zorder_layout(df, "x", "y", file_bits=4, bits=12).collect()
    assert len(files) == 16
    for f in files:
        assert (f["x_max"] - f["x_min"]) <= 4096 // 2
        assert (f["y_max"] - f["y_min"]) <= 4096 // 4
