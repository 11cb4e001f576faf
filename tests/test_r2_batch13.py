"""Batch-13 round-2 operators: graph structure metrics
(operators/graphmetrics.py), FD-violation audit (operators/audit.py),
largest-remainder quotas (operators/quota.py), vocabulary/OOV coverage
(operators/vocab.py)."""

from collections import Counter

from pyspark.sql import functions as F

from knowledgebase_processor_spark.operators.audit import fd_violations
from knowledgebase_processor_spark.operators.graphmetrics import (
    assortativity, modularity)
from knowledgebase_processor_spark.operators.quota import (
    largest_remainder_quota)
from knowledgebase_processor_spark.operators.vocab import (
    build_vocab, oov_by_source)


def _edges(spark, pairs):
    return spark.createDataFrame(pairs, "src long, dst long")


def _labels(spark, lab):
    return spark.createDataFrame(list(lab.items()), "node long, label long")


# -------------------------------------------------------- modularity ----

# two triangles joined by one bridge edge: the classic 2-community graph
TWO_TRI = [(1, 2), (2, 3), (1, 3), (4, 5), (5, 6), (4, 6), (3, 4)]


def test_modularity_two_triangles_hand_computed(spark):
    labels = {1: 1, 2: 1, 3: 1, 4: 4, 5: 4, 6: 4}
    out = {r.label: r for r in modularity(
        _edges(spark, TWO_TRI), _labels(spark, labels)).collect()}
    # |E| = 14 (7 undirected edges doubled), per community:
    # intra_directed = 6, deg_sum = 7 -> q_num = 14*6 - 49 = 35
    for c in (1, 4):
        assert (out[c].n_nodes, out[c].intra_directed,
                out[c].deg_sum, out[c].q_num) == (3, 6, 7, 35)
    assert out[-1].q_num == 70
    assert abs(out[-1].q - 70 / 196) < 1e-12  # Q = 5/14


def test_modularity_single_community_is_zero(spark):
    labels = {n: 0 for n in range(1, 7)}
    out = {r.label: r for r in modularity(
        _edges(spark, TWO_TRI), _labels(spark, labels)).collect()}
    assert out[0].q_num == 0 and out[-1].q == 0.0


def test_modularity_singletons_matches_formula(spark):
    labels = {n: n for n in range(1, 7)}
    rows = modularity(_edges(spark, TWO_TRI),
                      _labels(spark, labels)).collect()
    per = {r.label: r for r in rows if r.label != -1}
    deg = Counter()
    for a, b in TWO_TRI:
        deg[a] += 1
        deg[b] += 1
    for n, d in deg.items():
        assert per[n].intra_directed == 0
        assert per[n].q_num == -d * d
    total = next(r for r in rows if r.label == -1)
    assert total.q_num == -sum(d * d for d in deg.values())


# ----------------------------------------------------- assortativity ----

def test_assortativity_star_is_minus_one(spark):
    star = [(0, i) for i in range(1, 6)]
    r = assortativity(_edges(spark, star)).collect()[0]
    # star: every edge joins deg-5 hub to deg-1 leaf -> r = -1 exactly
    assert r.r_num == -r.r_den and r.r == -1.0


def test_assortativity_matches_python(spark):
    pairs = [(1, 2), (2, 3), (3, 4), (4, 1), (1, 3), (5, 1), (6, 2)]
    r = assortativity(_edges(spark, pairs)).collect()[0]
    sym = set()
    for a, b in pairs:
        sym.add((a, b))
        sym.add((b, a))
    deg = Counter(a for a, _ in sym)
    xs = [(deg[a], deg[b]) for a, b in sym]
    n = len(xs)
    sx = sum(x for x, _ in xs)
    sxy = sum(x * y for x, y in xs)
    sx2 = sum(x * x for x, _ in xs)
    assert (r.n_edges_directed, r.sum_x, r.sum_xy, r.sum_x2) == (
        n, sx, sxy, sx2)
    assert r.r_num == n * sxy - sx * sx
    assert r.r_den == n * sx2 - sx * sx
    assert r.r == r.r_num / r.r_den


# ----------------------------------------------------------- FD audit ----

def test_fd_violations_hand_computed(spark):
    rows = [("a", "x"), ("a", "x"), ("a", "y"),  # a: 3 rows, maj 2
            ("b", "x"), ("b", "x"),              # b: clean
            ("c", "z")]                          # c: clean
    df = spark.createDataFrame(rows, "k string, v string")
    out = {r.fd: r for r in
           fd_violations(df, [("k", "v"), ("v", "k")]).collect()}
    kv = out["k->v"]
    assert (kv.n_groups, kv.n_violating_groups, kv.violating_rows,
            kv.total_rows) == (3, 1, 1, 6)
    assert kv.violation_ppm == 1_000_000 // 6
    vk = out["v->k"]
    # x determines k? x -> {a:3(2+..), b:2} wait: x rows: a,a,b,b -> maj 2
    assert (vk.n_groups, vk.n_violating_groups, vk.violating_rows) == (
        3, 1, 2)


def test_fd_holds_gives_zero(spark):
    rows = [(i, i % 3, f"g{i % 3}") for i in range(30)]
    df = spark.createDataFrame(rows, "id long, b long, g string")
    out = fd_violations(df, [("b", "g")]).collect()[0]
    assert out.n_violating_groups == 0 and out.violating_rows == 0
    assert out.violation_ppm == 0


# -------------------------------------------------------------- quota ----

def _strata(spark, counts):
    rows = [(g,) for g, n in counts.items() for _ in range(n)]
    return spark.createDataFrame(rows, "grp string")


def test_quota_sums_to_budget_and_is_proportional(spark):
    counts = {"a": 50, "b": 30, "c": 17, "d": 3}
    out = {r.group: r for r in largest_remainder_quota(
        _strata(spark, counts), "grp", budget=23).collect()}
    assert sum(r.quota for r in out.values()) == 23
    n_tot = sum(counts.values())
    for g, n in counts.items():
        assert out[g].n == n
        assert out[g].base == 23 * n // n_tot
        assert out[g].quota in (out[g].base, out[g].base + 1)
        # never over-apportioned past the exact share by more than 1
        assert abs(out[g].quota - 23 * n / n_tot) < 1


def test_quota_largest_remainder_tiebreak(spark):
    # equal remainders -> group name ASC wins the spare unit
    counts = {"x": 1, "y": 1, "z": 1}
    out = {r.group: r.quota for r in largest_remainder_quota(
        _strata(spark, counts), "grp", budget=4).collect()}
    assert out == {"x": 2, "y": 1, "z": 1}


def test_quota_matches_python_replication(spark):
    counts = {f"s{i:02d}": (i * 7) % 13 + 1 for i in range(12)}
    budget = 29
    out = {r.group: r.quota for r in largest_remainder_quota(
        _strata(spark, counts), "grp", budget).collect()}
    n_tot = sum(counts.values())
    base = {g: budget * n // n_tot for g, n in counts.items()}
    rem = {g: budget * n % n_tot for g, n in counts.items()}
    spare = budget - sum(base.values())
    order = sorted(counts, key=lambda g: (-rem[g], g))
    exp = {g: base[g] + (1 if i < spare else 0)
           for i, g in enumerate(order)}
    assert out == exp


# ---------------------------------------------------------- vocab/OOV ----

def _docs(spark, rows):
    return spark.createDataFrame(rows, "doc_id long, source string, "
                                       "text string")


def test_build_vocab_topk_ties_by_word(spark):
    docs = _docs(spark, [(1, "s", "b b a a c")])
    v = build_vocab(docs, k=2).collect()
    assert [(r.word, r.cnt, r.rank) for r in v] == [
        ("a", 2, 1), ("b", 2, 2)]


def test_oov_by_source_hand_computed(spark):
    docs = _docs(spark, [
        (1, "s1", "the the the cat"),        # cat OOV if k=1
        (2, "s2", "the dog dog"),
    ])
    vocab = build_vocab(docs, k=2)  # the(4), dog(2)
    out = {r.source: r for r in oov_by_source(docs, vocab).collect()}
    assert (out["s1"].total_words, out["s1"].oov_words) == (4, 1)
    assert (out["s2"].total_words, out["s2"].oov_words) == (3, 0)
    assert out["s1"].oov_ppm == 1_000_000 // 4
    assert out["s2"].oov_ppm == 0


def test_oov_full_vocab_is_zero_everywhere(spark):
    docs = _docs(spark, [(i, f"s{i % 2}", f"w{i} w{i % 5}")
                         for i in range(20)])
    vocab = build_vocab(docs, k=1000)
    out = oov_by_source(docs, vocab).collect()
    assert all(r.oov_words == 0 and r.oov_ppm == 0 for r in out)
