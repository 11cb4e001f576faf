"""Batch-52 round-2: wildcard robots matching (operators/urlrules.py
::apply_robots_wildcards)."""

from pyspark.sql import functions as F

from knowledgebase_processor_spark.operators.urlrules import (
    apply_robots_wildcards, robots_pattern_regex)


def test_pattern_regex_compiler():
    assert robots_pattern_regex("/a/*/b$") == "^/a/.*/b$"
    assert robots_pattern_regex("/plain") == "^/plain"
    assert robots_pattern_regex("/*.pdf$") == r"^/.*\.pdf$"
    assert robots_pattern_regex("$") == "^$"
    assert robots_pattern_regex("/q?x") == r"^/q\?x"


def test_jvm_compiler_equals_python(spark):
    pats = ["/a/*/b$", "/plain", "/*.pdf$", "$", "/q?x", "/(y)+{z}",
            "/end$", "/mid$dle", "/a**b", "/^caret", "/pipe|or"]
    rules = spark.createDataFrame(
        [("h", "*", True, p) for p in pats],
        "host string, agent string, allow boolean, path string")
    crawl = spark.createDataFrame([("h", "u", "/x")],
                                  "host string, url string, path string")
    # reach into the plan: recompute rule_re column by reusing the
    # operator on a dummy crawl, then compare per-pattern via a probe
    # frame built the same way the operator builds it
    esc = F.regexp_replace(F.col("path"),
                           r"([\\.\[\]\{\}\(\)\+\-\?\^\$\|])", r"\\$1")
    star = F.regexp_replace(esc, r"\*", ".*")
    rule_re = F.when(
        F.col("path").endswith("$"),
        F.concat(F.lit("^"),
                 F.expr("substring(__star, 1, length(__star) - 2)"),
                 F.lit("$"))).otherwise(F.concat(F.lit("^"), star))
    probe = (rules.withColumn("__star", star)
             .withColumn("re", rule_re).collect())
    for r in probe:
        assert r.re == robots_pattern_regex(r.path), r.path
    # and the operator itself runs on the full rule set
    assert apply_robots_wildcards(crawl, rules).count() == 1


def test_wildcard_semantics(spark):
    rules = spark.createDataFrame(
        [("h", "*", False, "/a/*/private"),
         ("h", "*", True, "/a/*/private/ok$"),
         ("h", "*", False, "/*.pdf$")],
        "host string, agent string, allow boolean, path string")
    crawl = spark.createDataFrame(
        [("h", "u1", "/a/x/private"), ("h", "u2", "/a/x/private/ok"),
         ("h", "u3", "/file.pdf"), ("h", "u4", "/file.pdfx"),
         ("h", "u5", "/open")],
        "host string, url string, path string")
    got = {r.url: (r.allowed, r.matched_rule)
           for r in apply_robots_wildcards(crawl, rules).collect()}
    assert got["u1"] == (False, "/a/*/private")
    assert got["u2"] == (True, "/a/*/private/ok$")   # longer allow wins
    assert got["u3"] == (False, "/*.pdf$")
    assert got["u4"] == (True, None)                 # $ anchor misses
    assert got["u5"] == (True, None)


def test_wildcard_prefix_rules_unchanged_semantics(spark):
    # plain prefix rules behave exactly like apply_robots
    rules = spark.createDataFrame(
        [("h", "*", False, "/b"), ("h", "*", True, "/b/pub")],
        "host string, agent string, allow boolean, path string")
    crawl = spark.createDataFrame(
        [("h", "u1", "/b/x"), ("h", "u2", "/b/pub/y")],
        "host string, url string, path string")
    got = {r.url: r.allowed
           for r in apply_robots_wildcards(crawl, rules).collect()}
    assert got == {"u1": False, "u2": True}
