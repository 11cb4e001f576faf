"""Adversarial-scale probes for the final-session operators (the
round-1 bug-class lanes: quadratic blowups, unbounded buffers,
degenerate inputs)."""

import time

import pyspark.sql.functions as F

from knowledgebase_processor_spark.operators.dedup import (
    edit_distance_pairs)
from knowledgebase_processor_spark.operators.kgquality import (
    entity_summaries)
from knowledgebase_processor_spark.operators.redirects import (
    resolve_redirects)
from knowledgebase_processor_spark.operators.sameas import (
    ifp_sameas_candidates)
from knowledgebase_processor_spark.operators.urlrules import apply_robots
from knowledgebase_processor_spark.operators.webclean import (
    host_template_shingles, parse_sitemaps)


def test_redirects_long_chain_and_huge_fanin(spark):
    # 10k urls all redirecting into one 3-cycle: bounded rounds, no
    # explosion; plus one 16-hop chain at the budget boundary.
    rows = [(f"u{i}", "c0") for i in range(10_000)]
    rows += [("c0", "c1"), ("c1", "c2"), ("c2", "c0")]
    rows += [(f"w{i}", f"w{i + 1}") for i in range(16)]
    e = spark.createDataFrame(rows, "src string, dst string")
    t0 = time.time()
    out = resolve_redirects(e, rounds=4).cache()
    n_unresolved = out.filter(~F.col("resolved")).count()
    assert n_unresolved == 10_000 + 3          # fan-in + the cycle
    w0 = out.filter(F.col("url") == "w0").collect()[0]
    assert w0.resolved and w0.n_hops == 16
    assert time.time() - t0 < 120


def test_ifp_mega_bucket_never_expands(spark):
    # 50k subjects share ONE object under a perfect-IFP-looking pred
    # mix: the capped bucket must drop it whole, output stays tiny.
    rows = [(f"s{i}", "email", "shared@x") for i in range(50_000)]
    rows += [(f"t{i}", "email", f"t{i}@x") for i in range(5_000)]
    t = spark.createDataFrame(rows, "subj string, pred string, obj string")
    t0 = time.time()
    out = ifp_sameas_candidates(t, min_inv_functionality_ppm=0,
                                max_bucket=100)
    assert out.count() == 0                    # only the mega bucket pairs
    assert time.time() - t0 < 120


def test_template_shingles_10mb_page(spark):
    big = ("lorem ipsum dolor sit amet " * 80_000)       # ~2M chars
    pages = spark.createDataFrame(
        [("h", 1, big), ("h", 2, big[:5000])],
        "host string, doc_id long, text string")
    t0 = time.time()
    n = host_template_shingles(pages, min_share_ppm=900_000).count()
    assert n > 0                                # shared template found
    assert time.time() - t0 < 120


def test_sitemap_parse_pathological_xml(spark):
    # unterminated tags, nested <loc>, enormous block counts
    many = "".join(f"<url><loc>https://h/p{i}</loc></url>"
                   for i in range(20_000))
    rows = [("h", many), ("g", "<url><loc><loc>x</loc></loc></url>"),
            ("k", "<loc>" + "a" * 100_000)]
    sm = spark.createDataFrame(rows, "host string, sitemap_xml string")
    t0 = time.time()
    out = parse_sitemaps(sm)
    assert out.filter(F.col("host") == "h").count() == 20_000
    # nested <loc> matches the inner non-'<' run only; unterminated drops
    ks = out.filter(F.col("host") != "h").collect()
    assert all(r.loc == "x" for r in ks)
    assert time.time() - t0 < 120


def test_apply_robots_many_rules_per_host(spark):
    rules = spark.createDataFrame(
        [("h", "*", i % 2 == 0, f"/p{i}") for i in range(5_000)],
        "host string, agent string, allow boolean, path string")
    crawl = spark.createDataFrame(
        [("h", f"u{i}", f"/p{i % 5000}/x") for i in range(2_000)],
        "host string, url string, path string")
    t0 = time.time()
    out = apply_robots(crawl, rules)
    assert out.count() == 2_000
    assert time.time() - t0 < 150


def test_edit_distance_adversarial_lengths(spark):
    # 100k-char docs: the max_chars cap bounds the O(a*b) kernel
    docs = spark.createDataFrame(
        [(1, "a" * 100_000), (2, "a" * 99_000 + "b" * 1_000)],
        "doc_id long, text string")
    cands = spark.createDataFrame([(1, 2)], "doc_a long, doc_b long")
    t0 = time.time()
    out = edit_distance_pairs(docs, cands, max_dist=10**9,
                              max_chars=2_000).collect()
    assert out[0].dist == 0
    assert time.time() - t0 < 60


def test_entity_summaries_million_fact_hub(spark):
    rows = spark.range(300_000).selectExpr(
        "CASE WHEN id % 3 = 0 THEN 'hub' ELSE 'e' || CAST(id AS STRING)"
        " END AS subj",
        "'p' || CAST(id % 40 AS STRING) AS pred",
        "'o' || CAST(id AS STRING) AS obj")
    t0 = time.time()
    out = entity_summaries(rows, k=3)
    hub = out.filter(F.col("subj") == "hub").count()
    assert hub == 3                             # capped, not 100k
    assert time.time() - t0 < 150
