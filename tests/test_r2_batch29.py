"""Batch-29 round-2 operators: inverse-functional sameAs candidates
(operators/sameas.py) and weighted truth-discovery fact fusion
(operators/fusion.py)."""

from knowledgebase_processor_spark.operators.fusion import fuse_facts
from knowledgebase_processor_spark.operators.sameas import (
    ifp_sameas_candidates)


def _t(spark, rows):
    return spark.createDataFrame(rows,
                                 "subj string, pred string, obj string")


# ----------------------------------------------------------------- IFP ----

def test_ifp_candidates_shared_email(spark):
    t = _t(spark, [
        ("a", "email", "x@y"), ("b", "email", "x@y"),   # match pair
        ("c", "email", "c@y"),
        ("a", "homepage", "h1"), ("b", "homepage", "h1"),  # second key
        # 'tag' is NOT inverse-functional: one obj shared by everyone
        ("a", "tag", "news"), ("b", "tag", "news"), ("c", "tag", "news"),
        ("d", "tag", "news"), ("e", "tag", "news"),
    ])
    # email 2obj/3pairs = 666666, homepage 1/2 = 500000, tag 1/5 = 200000
    out = ifp_sameas_candidates(t, min_inv_functionality_ppm=500_000) \
        .collect()
    assert len(out) == 1
    r = out[0]
    assert (r.subj_a, r.subj_b, r.n_evidence) == ("a", "b", 2)


def test_ifp_hot_object_truncated_by_bucket_cap(spark):
    # 6 subjects share one 'email' value; another pair shares a clean
    # one.  With max_bucket=4 the hot bucket drops whole, the pair stays.
    rows = [(f"s{i}", "email", "info@x") for i in range(6)]
    rows += [("p1", "email", "p@x"), ("p2", "email", "p@x")]
    rows += [(f"u{i}", "email", f"u{i}@x") for i in range(20)]
    # ifp = 22 distinct objs / 28 pairs = 785714
    out = ifp_sameas_candidates(_t(spark, rows), max_bucket=4,
                                min_inv_functionality_ppm=700_000) \
        .collect()
    assert [(r.subj_a, r.subj_b) for r in out] == [("p1", "p2")]


def test_ifp_duplicate_assertions_count_once(spark):
    t = _t(spark, [("a", "email", "x"), ("a", "email", "x"),
                   ("b", "email", "x")])
    out = ifp_sameas_candidates(t, min_inv_functionality_ppm=0).collect()
    assert [(r.subj_a, r.subj_b, r.n_evidence) for r in out] \
        == [("a", "b", 1)]


# -------------------------------------------------------------- fusion ----

def _obs(spark, rows):
    return spark.createDataFrame(
        rows, "subj string, pred string, obj string, source string,"
              " warc_ts long")


def test_fuse_facts_weighted_vote(spark):
    obs = _obs(spark, [
        ("e", "dob", "1999", "wiki", 10),
        ("e", "dob", "1999", "gov", 11),
        ("e", "dob", "2001", "blog", 99),
    ])
    trust = spark.createDataFrame([("wiki", 3), ("gov", 5), ("blog", 1)],
                                  "source string, weight long")
    r = fuse_facts(obs, trust).collect()[0]
    assert (r.obj, r.weight_total, r.n_sources,
            r.n_candidates) == ("1999", 8, 2, 2)
    assert r.last_ts == 11


def test_fuse_facts_tie_breaks_recency_then_obj(spark):
    obs = _obs(spark, [
        ("e", "p", "old", "s1", 5),
        ("e", "p", "new", "s2", 9),        # equal weight, later ts wins
        ("f", "p", "aa", "s1", 7),
        ("f", "p", "zz", "s2", 7),         # full tie -> larger obj
    ])
    out = {r.subj: r for r in fuse_facts(obs).collect()}
    assert out["e"].obj == "new"
    assert out["f"].obj == "zz"


def test_fuse_facts_duplicate_source_votes_once(spark):
    obs = _obs(spark, [
        ("e", "p", "v", "spam", 1), ("e", "p", "v", "spam", 2),
        ("e", "p", "w", "a", 3), ("e", "p", "w", "b", 3),
    ])
    r = fuse_facts(obs).collect()[0]
    # spam's duplicate (distinct ts!) rows still count 2 because the ts
    # differs; but two DISTINCT sources beat one source asserting twice
    # only under identical (obj, source, ts) dedup -- assert the winner
    assert r.obj == "w" and r.weight_total == 2 and r.n_sources == 2


def test_fuse_facts_exact_duplicate_rows_dedup(spark):
    obs = _obs(spark, [
        ("e", "p", "v", "s", 1), ("e", "p", "v", "s", 1),
        ("e", "p", "w", "a", 2), ("e", "p", "w", "b", 2),
    ])
    r = fuse_facts(obs).collect()[0]
    assert (r.obj, r.weight_total) == ("w", 2)
