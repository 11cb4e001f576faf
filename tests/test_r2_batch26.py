"""Batch-26 round-2 operators: host link-graph rollup + reciprocity
(operators/hostgraph.py), Spearman rank correlation and Gini
concentration (operators/corrstats.py)."""

from knowledgebase_processor_spark.operators.corrstats import (
    gini_by_group, spearman_by_group)
from knowledgebase_processor_spark.operators.hostgraph import (
    host_link_graph, host_reciprocity)


# ----------------------------------------------------------- hostgraph ----

def test_host_link_graph_rollup(spark):
    links = spark.createDataFrame(
        [("a", "b", "p1"), ("a", "b", "p1"), ("a", "b", "p2"),
         ("a", "c", "p1"), ("b", "a", "p9")],
        "src_host string, dst_host string, src_page string")
    out = {(r.src_host, r.dst_host): (r.n_links, r.n_src_pages)
           for r in host_link_graph(links).collect()}
    assert out[("a", "b")] == (3, 2)
    assert out[("a", "c")] == (1, 1)
    assert out[("b", "a")] == (1, 1)


def test_host_reciprocity(spark):
    edges = spark.createDataFrame(
        [("a", "b"), ("b", "a"),            # mutual pair
         ("a", "c"),                        # one-way out of a
         ("d", "a"),                        # one-way into a
         ("c", "c")],                       # self-loop: excluded
        "src_host string, dst_host string")
    out = {r.host: r for r in host_reciprocity(edges).collect()}
    a = out["a"]
    assert (a.out_hosts, a.in_hosts, a.mutual_hosts) == (2, 2, 1)
    assert a.reciprocity_ppm == 500_000
    assert (out["b"].out_hosts, out["b"].mutual_hosts,
            out["b"].reciprocity_ppm) == (1, 1, 1_000_000)
    assert (out["c"].out_hosts, out["c"].in_hosts) == (0, 1)
    assert out["c"].reciprocity_ppm == 0
    assert (out["d"].out_hosts, out["d"].mutual_hosts) == (1, 0)


# ------------------------------------------------------------ spearman ----

def test_spearman_perfect_and_reversed(spark):
    rows = ([("up", i, float(i), float(i * 10)) for i in range(5)]
            + [("down", i, float(i), float(-i)) for i in range(5)]
            + [("tiny", 0, 1.0, 1.0)])        # n=1: filtered out
    df = spark.createDataFrame(rows, "g string, id long, x double, y double")
    out = {r.g: r for r in spearman_by_group(df, "g", "id",
                                             "x", "y").collect()}
    assert (out["up"].sum_d2, out["up"].rho_ppm) == (0, 1_000_000)
    assert out["down"].rho_ppm == -1_000_000
    assert "tiny" not in out


def test_spearman_matches_python_formula(spark):
    xs = [3.0, 1.0, 4.0, 1.5, 5.0, 9.0, 2.0]
    ys = [2.0, 7.0, 1.0, 8.0, 2.5, 0.5, 9.0]
    df = spark.createDataFrame(
        [("g", i, xs[i], ys[i]) for i in range(7)],
        "g string, id long, x double, y double")
    r = spearman_by_group(df, "g", "id", "x", "y").collect()[0]
    rx = {i: rank + 1 for rank, i in enumerate(
        sorted(range(7), key=lambda i: (xs[i], i)))}
    ry = {i: rank + 1 for rank, i in enumerate(
        sorted(range(7), key=lambda i: (ys[i], i)))}
    d2 = sum((rx[i] - ry[i]) ** 2 for i in range(7))
    assert r.sum_d2 == d2
    n = 7
    assert r.rho_ppm == round(1_000_000 * (1 - 6 * d2 / (n * (n * n - 1))))


# ---------------------------------------------------------------- gini ----

def test_gini_extremes(spark):
    rows = ([("even", i, 10) for i in range(4)]
            + [("onehot", 0, 0), ("onehot", 1, 0), ("onehot", 2, 0),
               ("onehot", 3, 100)]
            + [("zero", 0, 0), ("zero", 1, 0)])
    df = spark.createDataFrame(rows, "g string, id long, x long")
    out = {r.g: r for r in gini_by_group(df, "g", "id", "x").collect()}
    assert out["even"].gini_ppm == 0
    # one holder of everything among n=4: G = (n-1)/n = 0.75
    assert out["onehot"].gini_ppm == 750_000
    assert (out["zero"].total, out["zero"].gini_ppm) == (0, 0)


def test_gini_matches_python_formula_and_tie_invariance(spark):
    xs = [5, 1, 1, 8, 3, 1, 12]
    df = spark.createDataFrame([("g", i, xs[i]) for i in range(7)],
                               "g string, id long, x long")
    r = gini_by_group(df, "g", "id", "x").collect()[0]
    s = sorted(xs)
    n, tot = len(s), sum(s)
    num = 2 * sum((i + 1) * v for i, v in enumerate(s)) - (n + 1) * tot
    assert r.gini_ppm == num * 1_000_000 // (n * tot)
    # permuting equal values (different ids) cannot change the result
    df2 = spark.createDataFrame(
        [("g", 100 - i, xs[i]) for i in range(7)],
        "g string, id long, x long")
    r2 = gini_by_group(df2, "g", "id", "x").collect()[0]
    assert r2.gini_ppm == r.gini_ppm
