"""Batch-20 round-2 operators: mojibake/encoding-damage report,
URL-structure bitext alignment, distributed robots.txt parsing
(operators/webclean.py)."""

from knowledgebase_processor_spark.operators.webclean import (
    mojibake_report, parse_robots, url_align_pairs)


# ----------------------------------------------------------- mojibake ----

def test_mojibake_counts_each_artifact_class(spark):
    clean = "A perfectly fine sentence with accents: café naïve."
    damaged = ("bad \ufffd char "
               + "\u00c3\u00a9" * 3      # '\u00c3\u00a9' mojibake x3
               + " ctrl \u0085\u0092 end")  # two C1 controls
    docs = spark.createDataFrame([(1, clean), (2, damaged)],
                                 "doc_id long, text string")
    out = {r.doc_id: r for r in mojibake_report(docs).collect()}
    c, d = out[1], out[2]
    assert (c.n_fffd, c.n_latin_artifacts, c.n_c1_controls) == (0, 0, 0)
    assert c.keep is True
    assert d.n_fffd == 1
    assert d.n_latin_artifacts == 3
    assert d.n_c1_controls == 2
    assert d.n_damaged == 6 and d.keep is False


def test_mojibake_empty_text_keeps(spark):
    docs = spark.createDataFrame([(1, "")], "doc_id long, text string")
    r = mojibake_report(docs).collect()[0]
    assert (r.n_damaged, r.damaged_ppm, r.keep) == (0, 0, True)


# ---------------------------------------------------------- url align ----

def test_url_align_pairs_basic_and_no_false_pairs(spark):
    pages = spark.createDataFrame([
        (1, "http://h/en/a/b"), (2, "http://h/fr/a/b"),     # pair
        (3, "http://h/en/only"),                             # unpaired
        (4, "http://h/fr/other"),                            # unpaired
        (5, "http://h/de/a/b"),                              # wrong lang
        (6, "http://h2/en/a/b"), (7, "http://h2/fr/a/b"),    # host-scoped
    ], "doc_id long, url string")
    got = {(r.key, r.en_id, r.fr_id)
           for r in url_align_pairs(pages).collect()}
    assert got == {("http://h/a/b", 1, 2), ("http://h2/a/b", 6, 7)}


def test_url_align_multiple_matches_cross_join(spark):
    pages = spark.createDataFrame([
        (1, "http://h/en/x"), (2, "http://h/fr/x"), (3, "http://h/fr/x"),
    ], "doc_id long, url string")
    # duplicate URLs on one side pair with every counterpart: candidate
    # recall, downstream scoring disambiguates
    got = {(r.en_id, r.fr_id) for r in url_align_pairs(pages).collect()}
    assert got == {(1, 2), (1, 3)}


# -------------------------------------------------------- robots parse ----

ROBOTS = """# comment line
User-agent: *
Disallow: /private/
Allow: /private/ok

User-agent: goodbot
User-agent: nicebot
Disallow: /tmp/
Crawl-delay: 5
Disallow:
"""


def test_parse_robots_groups_and_rule_order(spark):
    df = spark.createDataFrame([("h1", ROBOTS)],
                               "host string, robots_txt string")
    rows = {(r.agent, r.rule_idx, r.allow, r.path)
            for r in parse_robots(df).collect()}
    assert rows == {
        ("*", 1, False, "/private/"),
        ("*", 2, True, "/private/ok"),
        # stacked agents share the group's rules; empty-value Disallow
        # and unknown Crawl-delay directives drop
        ("goodbot", 1, False, "/tmp/"),
        ("nicebot", 1, False, "/tmp/"),
    }


def test_parse_robots_feeds_apply_url_rules(spark):
    from knowledgebase_processor_spark.operators.urlrules import (
        apply_url_rules)
    df = spark.createDataFrame([("h1", ROBOTS)],
                               "host string, robots_txt string")
    rules = [(r.path, r.allow) for r in
             parse_robots(df).filter("agent = '*'")
             .orderBy("rule_idx").collect()]
    pages = spark.createDataFrame(
        [("/private/secret",), ("/private/ok",), ("/public",)],
        "path string")
    kept = {r.path for r in
            apply_url_rules(pages, "path", rules).collect() if r.allowed}
    assert kept == {"/private/ok", "/public"}


def test_parse_robots_rules_before_any_agent_drop(spark):
    df = spark.createDataFrame([("h1", "Disallow: /orphan\n")],
                               "host string, robots_txt string")
    assert parse_robots(df).count() == 0
