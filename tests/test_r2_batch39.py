"""Batch-39 round-2: categorical homophily (graphmetrics.py), CMS
heavy-change (heavy.py), public-suffix eTLD+1 rollup (psl.py)."""

from pyspark.sql import functions as F

from knowledgebase_processor_spark.operators.graphmetrics import (
    categorical_homophily)
from knowledgebase_processor_spark.operators.heavy import heavy_change
from knowledgebase_processor_spark.operators.psl import (
    extract_host, registrable_domain, site_rollup)


# --------------------------------------------------------------- homophily ----

def test_homophily_perfect_assortative(spark):
    edges = spark.createDataFrame(
        [(1, 2), (2, 1), (3, 4), (4, 3)], "src long, dst long")
    labels = spark.createDataFrame(
        [(1, "en"), (2, "en"), (3, "de"), (4, "de")],
        "node string, cat string").selectExpr(
            "CAST(node AS LONG) node", "cat")
    r = categorical_homophily(edges, labels).collect()[0]
    assert (r.m, r.n_same) == (4, 4)
    assert r.r_ppm == 1_000_000


def test_homophily_perfect_disassortative(spark):
    # bipartite en<->de, equal marginals: r = -1
    edges = spark.createDataFrame(
        [(1, 3), (3, 1), (2, 4), (4, 2)], "src long, dst long")
    labels = spark.createDataFrame(
        [(1, "en"), (2, "en"), (3, "de"), (4, "de")],
        "node long, cat string")
    r = categorical_homophily(edges, labels).collect()[0]
    assert r.n_same == 0
    assert r.r_ppm == -1_000_000


def test_homophily_single_category_null(spark):
    edges = spark.createDataFrame([(1, 2)], "src long, dst long")
    labels = spark.createDataFrame([(1, "en"), (2, "en")],
                                   "node long, cat string")
    r = categorical_homophily(edges, labels).collect()[0]
    assert r.r_ppm is None  # m^2 == S: undefined by convention


def test_homophily_unlabeled_endpoints_dropped(spark):
    edges = spark.createDataFrame([(1, 2), (1, 99)], "src long, dst long")
    labels = spark.createDataFrame([(1, "a"), (2, "b")],
                                   "node long, cat string")
    r = categorical_homophily(edges, labels).collect()[0]
    assert r.m == 1


# ------------------------------------------------------------- heavy change ----

def test_heavy_change_detects_shift(spark):
    a = spark.createDataFrame([("x",)] * 50 + [("y",)] * 5, "v string")
    b = spark.createDataFrame([("x",)] * 10 + [("z",)] * 30, "v string")
    got = {r.v: r for r in heavy_change(a, b, "v",
                                        min_change=8).collect()}
    assert set(got) == {"x", "z"}  # y moved by only 5
    assert (got["x"].exact_a, got["x"].exact_b) == (50, 10)
    assert got["z"].est_change <= -8
    # CM never underestimates: estimate >= exact on each side
    for r in got.values():
        assert r.est_a >= r.exact_a and r.est_b >= r.exact_b


def test_heavy_change_deterministic(spark):
    df = spark.createDataFrame([(f"k{i % 9}",) for i in range(90)],
                               "v string")
    a = heavy_change(df, df, "v", min_change=0).orderBy("v").collect()
    b = heavy_change(df, df, "v", min_change=0).orderBy("v").collect()
    assert [r.asDict() for r in a] == [r.asDict() for r in b]
    assert all(r.est_change == 0 for r in a)  # identical halves


# --------------------------------------------------------------------- PSL ----

def _site(spark, host):
    df = spark.createDataFrame([(host,)], "h string")
    return df.select(registrable_domain(F.col("h")).alias("s")) \
        .collect()[0].s


def test_registrable_domain_ladder(spark):
    assert _site(spark, "news.bbc.co.uk") == "bbc.co.uk"
    assert _site(spark, "www.bbc.co.uk") == "bbc.co.uk"
    assert _site(spark, "bbc.co.uk") == "bbc.co.uk"
    assert _site(spark, "alice.github.io") == "alice.github.io"
    assert _site(spark, "deep.sub.alice.github.io") == "alice.github.io"
    assert _site(spark, "example.com") == "example.com"
    assert _site(spark, "a.b.example.com") == "example.com"
    # a bare public suffix (or unknown tld) is unregistrable
    assert _site(spark, "co.uk") is None
    assert _site(spark, "com") is None
    assert _site(spark, "localhost") is None


def test_extract_host(spark):
    rows = [("https://User@WWW.Ex.COM:8080/p?q=1#f",),
            ("http://a.de/x",), ("not a url",), (None,)]
    df = spark.createDataFrame(rows, "url string")
    got = [r.h for r in df.select(
        extract_host(F.col("url")).alias("h")).collect()]
    assert got == ["www.ex.com:8080".split(":")[0] if False
                   else "www.ex.com", "a.de", None, None]


def test_site_rollup_groups_hosts(spark):
    urls = ["https://www.shop.co.uk/a", "https://api.shop.co.uk/b",
            "https://shop.co.uk/c", "https://u1.github.io/",
            "https://u2.github.io/", "https://com/x"]
    df = spark.createDataFrame([(u,) for u in urls], "url string")
    got = {r.site: (r.n_pages, r.n_hosts)
           for r in site_rollup(df).collect()}
    assert got["shop.co.uk"] == (3, 3)
    assert got["u1.github.io"] == (1, 1)
    assert got["u2.github.io"] == (1, 1)
    assert got[None] == (1, 1)
