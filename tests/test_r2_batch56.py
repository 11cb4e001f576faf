"""Batch-56 round-2: character-entropy quality gate
(operators/textstats.py::char_entropy_report)."""

import math

from knowledgebase_processor_spark.operators.textstats import (
    char_entropy_report)


def _ent_bits(s):
    from collections import Counter
    n = len(s)
    return -sum((c / n) * math.log2(c / n)
                for c in Counter(s).values())


def test_entropy_hand_computed(spark):
    rows = [(1, "aaaa"), (2, "abab"), (3, "abcd"), (4, ""), (5, None)]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    got = {r.doc_id: r for r in char_entropy_report(df).collect()}
    assert got[1].entropy_nano == 0              # degenerate
    assert got[2].entropy_nano == 1_000_000_000  # 1 bit exactly
    assert got[3].entropy_nano == 2_000_000_000  # 2 bits exactly
    assert (got[4].n_chars, got[4].entropy_nano) == (0, 0)
    assert (got[5].n_chars, got[5].entropy_nano) == (0, 0)
    assert got[3].n_distinct == 4


def test_entropy_matches_python_within_quantization(spark):
    s = "the quick brown fox jumps over the lazy dog"
    df = spark.createDataFrame([(1, s)], "doc_id long, text string")
    r = char_entropy_report(df).collect()[0]
    exp = _ent_bits(s)
    # per-term nano rounding: error bounded by n_distinct/2 nano units
    assert abs(r.entropy_nano - round(exp * 1e9)) <= r.n_distinct


def test_entropy_ranks_gibberish_classes(spark):
    rows = [(1, "a" * 500),                           # repetition
            (2, "the cat sat on the mat again and again "* 10),
            (3, "q8Zx!kP2mW9vLr4Tj7Yb0NcE5uGdAfHs" * 12)]  # mash
    df = spark.createDataFrame(rows, "doc_id long, text string")
    got = {r.doc_id: r.entropy_nano
           for r in char_entropy_report(df).collect()}
    assert got[1] < got[2] < got[3]
