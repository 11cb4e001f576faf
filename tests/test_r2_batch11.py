"""Round-2 additions, batch 11: posting-list varint sizing, corpus
novelty rate, per-group entropy — each against its defining invariant
(hand-computed LEB128 byte costs, first-occurrence attribution on a
crafted corpus, uniform==max/point-mass==zero entropy)."""

import math

from knowledgebase_processor_spark.operators.drift import (
    SCALE, entropy_report)
from knowledgebase_processor_spark.operators.novelty import (
    novelty_by_group)
from knowledgebase_processor_spark.operators.postings import posting_sizes


# ---------------------------------------------------- posting sizes ----

def _docs(spark, rows):
    return spark.createDataFrame(rows, "doc_id long, text string")


def test_posting_varint_costs_hand_computed(spark):
    # term "a" in docs 1, 2, 130: postings 1, +1, +128 -> 1+1+2 = 4 bytes
    # term "b" only in doc 300: absolute id 300 -> 2 bytes (df 1, cut by
    # min_df=2)
    rows = [(1, "a x"), (2, "a y"), (130, "a z"), (300, "b")]
    out = {r.term: r for r in
           posting_sizes(_docs(spark, rows), min_df=1).collect()}
    assert out["a"].df == 3
    assert out["a"].varint_bytes == 4
    assert out["a"].raw_bytes == 24
    assert out["a"].ratio_ppm == 4 * 1_000_000 // 24
    assert out["b"].varint_bytes == 2
    cut = posting_sizes(_docs(spark, rows), min_df=2).collect()
    assert {r.term for r in cut} == {"a"}


def test_posting_duplicate_terms_in_doc_count_once(spark):
    rows = [(7, "w w w w"), (8, "w")]
    out = posting_sizes(_docs(spark, rows), min_df=1).collect()
    assert len(out) == 1 and out[0].df == 2
    # postings 7, +1 -> 2 bytes
    assert out[0].varint_bytes == 2


def test_posting_dense_terms_compress_better(spark):
    # dense term in every doc (gap 1 everywhere) vs sparse term with
    # huge gaps: dense ratio must be strictly better
    rows = [(i * 300, "dense" + (" sparse" if i % 60 == 0 else ""))
            for i in range(1, 200)]
    out = {r.term: r for r in
           posting_sizes(_docs(spark, rows), min_df=2).collect()}
    assert out["dense"].ratio_ppm < out["sparse"].ratio_ppm


# ------------------------------------------------------ novelty rate ----

def _src_docs(spark, rows):
    return spark.createDataFrame(
        rows, "doc_id long, source string, text string")


def test_novelty_first_occurrence_attribution(spark):
    # doc 1 (src A) coins both shingles; doc 2 (src B) repeats one of
    # them and coins nothing; doc 3 (src B) coins its own
    rows = [(1, "A", "w1 w2 w3 w4"),          # shingles: w1w2w3, w2w3w4
            (2, "B", "w1 w2 w3"),             # w1w2w3 (seen)
            (3, "B", "x1 x2 x3")]             # x1x2x3 (new)
    out = {r.source: r for r in
           novelty_by_group(_src_docs(spark, rows)).collect()}
    assert out["A"].total_shingles == 2
    assert out["A"].novel_shingles == 2
    assert out["A"].novelty_ppm == 1_000_000
    assert out["B"].total_shingles == 2
    assert out["B"].novel_shingles == 1
    assert out["B"].novelty_ppm == 500_000


def test_novelty_ties_go_to_earliest_doc_id(spark):
    # same shingle in two sources: the LOWER doc id owns it
    rows = [(10, "B", "p q r"), (5, "A", "p q r")]
    out = {r.source: r for r in
           novelty_by_group(_src_docs(spark, rows)).collect()}
    assert out["A"].novel_shingles == 1
    assert out["B"].novel_shingles == 0


def test_novelty_exact_duplicate_corpus_decays_to_zero(spark):
    rows = [(i, "feed", "same old text again") for i in range(1, 30)]
    out = novelty_by_group(_src_docs(spark, rows)).collect()
    assert len(out) == 1
    r = out[0]
    # every doc contributes the same 2 shingles; only the first is novel
    assert r.total_shingles == 2 * 29
    assert r.novel_shingles == 2
    assert r.novelty_ppm == 2 * 1_000_000 // (2 * 29)


# ---------------------------------------------------------- entropy ----

def _ev(spark, rows):
    return spark.createDataFrame(rows, "grp string, v string")


def test_entropy_point_mass_is_zero_uniform_is_max(spark):
    rows = ([("point", "a")] * 50
            + [("unif", x) for x in "abcd" * 25])
    out = {r.grp: r for r in
           entropy_report(_ev(spark, rows), "grp", "v").collect()}
    assert out["point"].entropy_micro == 0
    assert out["point"].balance is None  # single bin
    # uniform over 4 bins: H = ln 4, balance = 1
    exp = 4 * round(SCALE * 0.25 * math.log(4.0))
    assert out["unif"].entropy_micro == exp
    # per-bin micro-nat rounding: balance lands within 1e-5 of 1
    assert abs(out["unif"].balance - 1.0) < 1e-5


def test_entropy_matches_python_formula(spark):
    rows = [("g", v) for v in
            ["a"] * 7 + ["b"] * 2 + ["c"] * 1 + [None] * 3]
    out = entropy_report(_ev(spark, rows), "grp", "v").collect()[0]
    n = 13
    counts = {"a": 7, "b": 2, "c": 1, "<null>": 3}
    exp = sum(round(SCALE * (c / n) * math.log(n / c))
              for c in counts.values())
    assert out.n == n and out.n_bins == 4
    assert out.entropy_micro == exp
    assert out.balance == round(exp / (SCALE * math.log(4.0)), 6)
