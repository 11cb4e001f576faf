"""Batch-23 round-2 operators: redirect-chain resolution
(operators/redirects.py), sitemap parse + crawl coverage
(operators/webclean.py), politeness frontier schedule
(operators/frontier.py)."""

from knowledgebase_processor_spark.operators.frontier import (
    politeness_schedule)
from knowledgebase_processor_spark.operators.redirects import (
    resolve_redirects)
from knowledgebase_processor_spark.operators.webclean import (
    parse_sitemaps, sitemap_coverage)


# ---------------------------------------------------------- redirects ----

def _edges(spark, rows):
    return spark.createDataFrame(rows, "src string, dst string")


def test_redirects_chain_and_terminal(spark):
    e = _edges(spark, [("a", "b"), ("b", "c"), ("c", "d")])
    out = {r.url: r for r in resolve_redirects(e, rounds=3).collect()}
    assert (out["a"].final_url, out["a"].n_hops,
            out["a"].resolved) == ("d", 3, True)
    assert (out["b"].final_url, out["b"].n_hops) == ("d", 2)
    assert (out["c"].final_url, out["c"].n_hops) == ("d", 1)
    assert "d" not in out             # d never redirects: not a row


def test_redirects_cycle_flagged_unresolved(spark):
    e = _edges(spark, [("x", "y"), ("y", "z"), ("z", "x"),  # 3-loop
                       ("in", "x"),                          # feeds loop
                       ("s", "s"),                           # self-loop
                       ("ok", "t")])
    out = {r.url: r for r in resolve_redirects(e, rounds=4).collect()}
    for u in ("x", "y", "z", "in", "s"):
        assert not out[u].resolved
        assert out[u].final_url is None and out[u].n_hops is None
    assert (out["ok"].final_url, out["ok"].resolved) == ("t", True)


def test_redirects_budget_and_exact_power_chain(spark):
    # chain of length 8 resolves with rounds=3 (2^3), not rounds=2
    chain = [(f"u{i}", f"u{i + 1}") for i in range(8)]
    e = _edges(spark, chain)
    ok = {r.url: r for r in resolve_redirects(e, rounds=3).collect()}
    assert (ok["u0"].final_url, ok["u0"].n_hops) == ("u8", 8)
    short = {r.url: r for r in resolve_redirects(e, rounds=2).collect()}
    assert not short["u0"].resolved   # 8 hops > 2^2 budget
    assert short["u4"].resolved       # 4 hops fits exactly


def test_redirects_duplicate_src_normalized_to_min_dst(spark):
    e = _edges(spark, [("a", "z"), ("a", "b")])   # recrawl drift
    out = {r.url: r for r in resolve_redirects(e, rounds=2).collect()}
    assert out["a"].final_url == "b"              # min dst wins


# ----------------------------------------------------------- sitemaps ----

_XML = ("<urlset>"
        "<url><loc>https://h/a</loc>"
        "<lastmod>2026-01-02</lastmod></url>"
        "<url><loc> https://h/b </loc></url>"          # ws-trim, no lastmod
        "<url><lastmod>2026-01-03</lastmod></url>"     # no loc: drops
        "</urlset>")


def test_parse_sitemaps(spark):
    sm = spark.createDataFrame([("h", _XML), ("empty", "<urlset></urlset>")],
                               "host string, sitemap_xml string")
    rows = {(r.host, r.loc): r.lastmod
            for r in parse_sitemaps(sm).collect()}
    assert rows == {("h", "https://h/a"): "2026-01-02",
                    ("h", "https://h/b"): None}


def test_sitemap_coverage_counts(spark):
    s = spark.createDataFrame(
        [("h", "u1"), ("h", "u2"), ("h", "u2"),   # dup declared once
         ("g", "v1")],
        "host string, loc string")
    c = spark.createDataFrame(
        [("h", "u2"), ("h", "u9"),                # u9 = orphan crawl
         ("k", "w1")],                            # host with no sitemap
        "host string, url string")
    out = {r.host: r for r in sitemap_coverage(s, c).collect()}
    assert (out["h"].n_sitemap, out["h"].n_crawled,
            out["h"].n_both) == (2, 2, 1)
    assert out["h"].coverage_ppm == 500_000
    assert out["h"].orphan_ppm == 500_000
    assert (out["g"].n_crawled, out["g"].coverage_ppm) == (0, 0)
    assert (out["k"].n_sitemap, out["k"].orphan_ppm) == (0, 1_000_000)


# ----------------------------------------------------------- frontier ----

def test_politeness_schedule_slots_and_delays(spark):
    f = spark.createDataFrame(
        [("h", "u_low", 1), ("h", "u_hi", 9), ("h", "u_mid", 5),
         ("g", "g1", 1)],
        "host string, url string, priority long")
    d = spark.createDataFrame([("h", 2000)], "host string, delay_ms long")
    out = {(r.host, r.url): (r.slot, r.fetch_at_ms)
           for r in politeness_schedule(f, d,
                                        default_delay_ms=500).collect()}
    assert out[("h", "u_hi")] == (0, 0)
    assert out[("h", "u_mid")] == (1, 2000)
    assert out[("h", "u_low")] == (2, 4000)
    assert out[("g", "g1")] == (0, 0)             # default delay, slot 0


def test_politeness_schedule_tie_break_and_cap(spark):
    f = spark.createDataFrame(
        [("h", f"u{i}", 7) for i in range(5)],    # all same priority
        "host string, url string, priority long")
    out = politeness_schedule(f, max_per_host=3,
                              default_delay_ms=100).collect()
    got = sorted((r.slot, r.url, r.fetch_at_ms) for r in out)
    assert got == [(0, "u0", 0), (1, "u1", 100), (2, "u2", 200)]
