"""Batch-30 round-2 operators: distributed robots compliance
(operators/urlrules.py::apply_robots) and Flesch readability
(operators/textstats.py)."""

import math

from knowledgebase_processor_spark.operators.textstats import (
    readability_report)
from knowledgebase_processor_spark.operators.urlrules import apply_robots


def _crawl(spark, rows):
    return spark.createDataFrame(rows, "host string, url string, path string")


def _rules(spark, rows):
    return spark.createDataFrame(
        rows, "host string, agent string, allow boolean, path string")


def test_apply_robots_longest_match_wins(spark):
    rules = _rules(spark, [
        ("h", "*", False, "/private"),
        ("h", "*", True, "/private/pub"),      # longer allow carve-out
        ("h", "googlebot", True, "/private")])  # other agent: ignored
    crawl = _crawl(spark, [
        ("h", "u1", "/private/secret"),
        ("h", "u2", "/private/pub/page"),
        ("h", "u3", "/open"),
        ("g", "u4", "/anything")])             # host without rules
    out = {r.url: r for r in apply_robots(crawl, rules).collect()}
    assert (out["u1"].allowed, out["u1"].matched_rule) == (False, "/private")
    assert (out["u2"].allowed, out["u2"].matched_rule) \
        == (True, "/private/pub")
    assert (out["u3"].allowed, out["u3"].matched_rule) == (True, None)
    assert out["u4"].allowed is True


def test_apply_robots_allow_beats_disallow_on_tie(spark):
    rules = _rules(spark, [("h", "*", False, "/a"), ("h", "*", True, "/a")])
    out = apply_robots(_crawl(spark, [("h", "u", "/a/x")]), rules) \
        .collect()[0]
    assert out.allowed is True


def test_readability_hand_computed(spark):
    text = "The cat sat. The dog ran fast!"
    docs = spark.createDataFrame([(1, text), (2, ""), (3, None),
                                  (4, "word")],
                                 "doc_id long, text string")
    out = {r.doc_id: r for r in readability_report(docs).collect()}
    r = out[1]
    assert (r.n_words, r.n_sentences) == (7, 2)
    # syllables: the(1) cat(1) sat.(1) the(1) dog(1) ran(1) fast!(1)
    assert r.n_syllables == 7
    w, s, y = 7, 2, 7
    exp = round(1_000_000 * (206.835 - 1.015 * (w / s) - 84.6 * (y / w)))
    assert r.flesch_micro == exp
    assert out[2].flesch_micro is None and out[2].n_words == 0
    assert out[3].flesch_micro is None
    assert (out[4].n_words, out[4].n_sentences) == (1, 1)


def test_readability_polysyllables(spark):
    docs = spark.createDataFrame([(1, "extraordinary bureaucracy")],
                                 "doc_id long, text string")
    r = readability_report(docs).collect()[0]
    # e-xtrao-rdi-na-ry -> runs: e,ao,i,a,y = 5; bu,eau,a,y = 4
    assert r.n_syllables == 9
    assert r.n_sentences == 1
    assert not math.isnan(r.flesch_micro)
