"""Batch-17 round-2 operators: greedy coverage corpus selection
(operators/select.py), entity disambiguation with prior + context
(operators/linking.py), anchor-text profiles (operators/anchors.py)."""

from knowledgebase_processor_spark.operators.anchors import anchor_profile
from knowledgebase_processor_spark.operators.linking import disambiguate
from knowledgebase_processor_spark.operators.select import (
    greedy_coverage_select)


# ---------------------------------------------- greedy coverage select ----

def test_greedy_coverage_matches_python_greedy(spark):
    texts = {
        1: "a b c d e f",          # shingles: abc bcd cde def (4)
        2: "a b c d e f",          # duplicate of 1 -> zero gain later
        3: "x y z w",              # xyz yzw (2)
        4: "c d e f g",            # cde def efg (1 new after 1)
        5: "p q r",                # pqr (1)
    }
    docs = spark.createDataFrame(
        [(k, v) for k, v in texts.items()], "doc_id long, text string")
    got = [(r.round, r.doc_id, r.gain, r.covered_total)
           for r in greedy_coverage_select(docs, k=5).collect()]

    # python greedy replay on 3-gram shingles
    def sh(t):
        w = t.split()
        if len(w) < 3:
            return {" ".join(w)}
        return {" ".join(w[i:i + 3]) for i in range(len(w) - 2)}

    remaining = {k: sh(v) for k, v in texts.items()}
    covered, want, total = set(), [], 0
    for rnd in range(1, 6):
        # zero-gain docs vanish from the anti-joined frame: greedy stops
        # once every shingle is covered (same early-exit as the operator).
        gains = {d: len(s - covered) for d, s in remaining.items()
                 if len(s - covered) > 0}
        if not gains:
            break
        d, g = max(gains.items(), key=lambda kv: (kv[1], -kv[0]))
        total += g
        want.append((rnd, d, g, total))
        covered |= remaining[d]
    assert got == sorted(got)  # pick order
    assert got == want


def test_greedy_coverage_stops_when_no_docs_left(spark):
    docs = spark.createDataFrame([(1, "a b c")], "doc_id long, text string")
    out = greedy_coverage_select(docs, k=4).collect()
    # one doc covers everything; later rounds still pick SOME doc (gain
    # counts only uncovered shingles — fully-covered docs vanish), so
    # exactly one pick remains.
    assert [(r.round, r.doc_id, r.gain) for r in out] == [(1, 1, 1)]


def test_greedy_oracle_sql_matches_operator(spark):
    import duckdb
    from knowledgebase_processor_spark.operators.select import (
        greedy_coverage_oracle_sql)
    rows = [(i, f"w{i % 4} w{i % 3} w{i % 5} w{i % 7} w{i % 2}")
            for i in range(30)]
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    got = [(r.round, r.doc_id, r.gain, r.covered_total)
           for r in greedy_coverage_select(docs, k=4).collect()]
    con = duckdb.connect()
    con.execute("CREATE TABLE d (doc_id BIGINT, text VARCHAR)")
    con.executemany("INSERT INTO d VALUES (?, ?)", rows)
    want = con.execute(greedy_coverage_oracle_sql(
        "SELECT doc_id, text FROM d", k=4)).fetchall()
    assert got == want


# ------------------------------------------------------- disambiguate ----

def _m(spark, rows):
    return spark.createDataFrame(
        rows, "mention_id long, alias string, ctx array<string>")


def _c(spark, rows):
    return spark.createDataFrame(
        rows, "alias string, entity string, ctx array<string>, "
              "prior_ppm long")


def test_disambiguate_prior_vs_context_tradeoff(spark):
    m = _m(spark, [(1, "jaguar", ["x1", "y2", "z3"])])
    c = _c(spark, [
        ("jaguar", "Cat", ["x1", "y2"], 100_000),      # jac 2/3 ppm
        ("jaguar", "Car", ["q0", "q1"], 900_000),      # jac 0
    ])
    out = disambiguate(m, c).collect()[0]
    # Cat: 100000 + 2*666666 = 1433332; Car: 900000 + 0.
    assert (out.entity, out.score) == ("Cat", 100_000 + 2 * 666_666)
    assert out.jaccard_ppm == 666_666      # 2*1e6 DIV 3, truncated


def test_disambiguate_tie_breaks_to_last_entity_and_drops_nolink(spark):
    m = _m(spark, [(1, "a", ["t"]), (2, "unknown", ["t"])])
    c = _c(spark, [("a", "E1", ["t"], 5), ("a", "E2", ["t"], 5)])
    out = disambiguate(m, c).collect()
    assert len(out) == 1                      # mention 2 dropped
    assert out[0].entity == "E2"              # struct-max tie-break


def test_disambiguate_empty_contexts_score_prior_only(spark):
    m = _m(spark, [(1, "a", [])])
    c = _c(spark, [("a", "E", [], 7)])
    out = disambiguate(m, c).collect()[0]
    assert (out.jaccard_ppm, out.score) == (0, 7)


# ------------------------------------------------------ anchor profile ----

def test_anchor_profile_counts_and_mode(spark):
    links = spark.createDataFrame(
        [("d1", "t1", "home"), ("d1", "t1", "home"), ("d2", "t1", "start"),
         ("d3", "t2", "misc")],
        "src_doc string, target string, anchor string")
    out = {r.target: r for r in anchor_profile(links).collect()}
    t1 = out["t1"]
    assert (t1.n_links, t1.n_sources, t1.n_anchors) == (3, 2, 2)
    assert (t1.top_anchor, t1.top_anchor_n) == ("home", 2)
    t2 = out["t2"]
    assert (t2.n_links, t2.top_anchor) == (1, "misc")


def test_anchor_profile_tie_breaks_lexicographically_last(spark):
    links = spark.createDataFrame(
        [("d1", "t", "alpha"), ("d2", "t", "beta")],
        "src_doc string, target string, anchor string")
    assert anchor_profile(links).collect()[0].top_anchor == "beta"
