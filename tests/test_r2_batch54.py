"""Batch-54 round-2: URL path-template census (operators/urlrules.py)
and k-anonymity generalization ladder (operators/kanon.py)."""

from knowledgebase_processor_spark.operators.kanon import (
    kanon_generalization_ladder)
from knowledgebase_processor_spark.operators.urlrules import (
    url_templates)


def test_url_templates_generalize(spark):
    rows = [("h", "/product/123/view"), ("h", "/product/99999/view"),
            ("h", "/u/deadbeef1234/profile"),
            ("h", "/u/cafe01234567/profile"),
            ("h", "/about"), ("h", "/v2/api")]
    df = spark.createDataFrame(rows, "host string, path string")
    got = {r.template: r.n_urls for r in url_templates(df).collect()}
    assert got["/product/<n>/view"] == 2
    assert got["/u/<x>/profile"] == 2
    assert got["/about"] == 1
    # short digit runs still template; short hex words do NOT
    assert got["/v<n>/api"] == 1


def test_url_templates_hex_before_digits(spark):
    # a 12-char all-digit run is a hex-class match -> ONE <x>, never
    # shredded into digit fragments
    df = spark.createDataFrame([("h", "/id/123456789012/x")],
                               "host string, path string")
    got = [r.template for r in url_templates(df).collect()]
    assert got == ["/id/<x>/x"]


def test_kanon_ladder_monotone(spark):
    rows = [(f"s{i % 10}", f"l{i % 4}", f"b{i % 3}")
            for i in range(200)]
    df = spark.createDataFrame(rows, "source string, lang string,"
                                     " bucket string")
    out = {r.level: r for r in kanon_generalization_ladder(
        df, ["source", "lang", "bucket"], ks=[5]).collect()}
    assert len(out) == 4
    # generalizing can only grow groups: min size monotone, groups
    # shrink, suppression cost falls
    for lv in range(3):
        assert out[lv + 1].min_group >= out[lv].min_group
        assert out[lv + 1].n_groups <= out[lv].n_groups
        assert out[lv + 1].below_k5 <= out[lv].below_k5
    # full suppression level: one group, nothing below k
    assert out[3].n_groups == 1 and out[3].below_k5 == 0


def test_kanon_ladder_hand_computed(spark):
    rows = [("a", "x")] * 6 + [("a", "y")] * 2 + [("b", "x")] * 4
    df = spark.createDataFrame(rows, "source string, lang string")
    out = {r.level: r for r in kanon_generalization_ladder(
        df, ["source", "lang"], ks=[3, 5]).collect()}
    l0 = out[0]
    assert (l0.n_groups, l0.min_group) == (3, 2)
    assert l0.below_k3 == 2        # the (a, y) pair
    assert l0.below_k5 == 6        # (a,y)=2 + (b,x)=4
    l1 = out[1]                    # drop lang: a=8, b=4
    assert (l1.n_groups, l1.min_group, l1.below_k5) == (2, 4, 4)
