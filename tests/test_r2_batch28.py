"""Batch-28 round-2 operators: crawl-trap, soft-404 and language-
consistency gates (operators/crawlhealth.py)."""

from knowledgebase_processor_spark.operators.crawlhealth import (
    crawl_trap_report, lang_mismatch_report, soft404_report)


def test_crawl_trap_report(spark):
    trap = [("t", f"https://t/cal?d=2026-01-{i:02d}") for i in range(1, 13)]
    healthy = [("h", f"https://h/art{i}") for i in range(12)]
    small = [("s", "https://s/only")]
    pages = spark.createDataFrame(trap + healthy + small,
                                  "host string, url string")
    out = {r.host: r for r in crawl_trap_report(pages,
                                                min_urls=10).collect()}
    t = out["t"]
    assert (t.n_urls, t.n_paths, t.n_with_query) == (12, 1, 12)
    assert t.urls_per_path_ppm == 12_000_000
    assert t.query_share_ppm == 1_000_000
    h = out["h"]
    assert (h.n_paths, h.urls_per_path_ppm,
            h.query_share_ppm) == (12, 1_000_000, 0)
    assert "s" not in out                      # below min_urls


def test_crawl_trap_path_extraction_edge_cases(spark):
    pages = spark.createDataFrame(
        [("x", "https://x"),                   # no path at all
         ("x", "https://x/"),
         ("x", "https://x/a#frag"),
         ("x", "https://x/a?q=1")] * 3,
        "host string, url string")
    r = crawl_trap_report(pages, min_urls=1).collect()[0]
    # distinct urls 4; paths: '', '/', '/a' (frag and query both cut)
    assert (r.n_urls, r.n_paths) == (4, 3)


def test_soft404_report(spark):
    long_mention = "404 error " + "word " * 600
    pages = spark.createDataFrame(
        [(1, "h", "Sorry, this Page Not Found."),
         (2, "h", long_mention),               # long: phrase but no flag
         (3, "h", "perfectly fine article"),
         (4, "h", None)],
        "doc_id long, host string, text string")
    out = {r.doc_id: r for r in soft404_report(pages).collect()}
    assert (out[1].has_phrase, out[1].is_soft404) == (True, True)
    assert (out[2].has_phrase, out[2].is_soft404) == (True, False)
    assert (out[3].has_phrase, out[3].is_soft404) == (False, False)
    assert (out[4].n_chars, out[4].is_soft404) == (0, False)


def test_lang_mismatch_report(spark):
    en = "the quick and the lazy with of to in it"
    de = "der hund und die katze mit von das ist"
    pages = spark.createDataFrame(
        [("h", "en", en), ("h", "en", de),      # one match, one mismatch
         ("h", "en", "zzz qqq xxx"),            # und: excluded from rate
         ("g", "de", de)],
        "host string, lang string, text string")
    out = {r.host: r for r in lang_mismatch_report(pages).collect()}
    h = out["h"]
    assert (h.n_pages, h.n_match, h.n_mismatch, h.n_und) == (3, 1, 1, 1)
    assert h.mismatch_ppm == 500_000
    assert (out["g"].n_mismatch, out["g"].mismatch_ppm) == (0, 0)
