"""Round-2 additions, batch 6: link prediction, JL random projection,
int8 quantization, SCD2 snapshot history — each against a pure-python
replication plus its defining invariants (hub guard, known-edge
exclusion; distance-preservation direction of the projection; clamp /
floor / zero-vector edges; run splitting incl. ties and null values)."""

import datetime as dt
import math
import random
from collections import defaultdict

from pyspark.sql import functions as F

from knowledgebase_processor_spark.operators.linkpred import (
    RA_MICRO, link_prediction)
from knowledgebase_processor_spark.operators.projection import (
    jl_matrix, project)
from knowledgebase_processor_spark.operators.quantize import quantize_int8
from knowledgebase_processor_spark.operators.scd import scd2_history


# ---------------------------------------------------- link prediction ----

def _py_linkpred(edges, max_hub=1000, min_common=1):
    und = {tuple(sorted(e)) for e in edges if e[0] != e[1]}
    adj = defaultdict(set)
    for a, b in und:
        adj[a].add(b)
        adj[b].add(a)
    deg = {n: len(s) for n, s in adj.items()}
    scores = defaultdict(lambda: [0, 0])
    for w, nbrs in adj.items():
        if deg[w] > max_hub:
            continue
        ns = sorted(nbrs)
        for i, u in enumerate(ns):
            for v in ns[i + 1:]:
                s = scores[(u, v)]
                s[0] += 1
                s[1] += RA_MICRO // deg[w]
    out = {}
    for (u, v), (cn, ra) in scores.items():
        if cn >= min_common and (u, v) not in und:
            jac = cn / (deg[u] + deg[v] - cn)
            out[(u, v)] = (cn, ra, jac)
    return out


def test_link_prediction_matches_python_bruteforce(spark):
    rnd = random.Random(11)
    edges = {(rnd.randrange(40), rnd.randrange(40)) for _ in range(160)}
    edges = [e for e in edges if e[0] != e[1]]
    df = spark.createDataFrame(edges, "src long, dst long")
    got = {(r.u, r.v): (r.common_neighbors, r.ra_micro, r.jaccard)
           for r in link_prediction(df).collect()}
    exp = _py_linkpred(edges)
    assert set(got) == set(exp)
    for k, (cn, ra, jac) in exp.items():
        gcn, gra, gjac = got[k]
        assert (gcn, gra) == (cn, ra), k
        assert abs(gjac - jac) < 1e-12, k


def test_link_prediction_excludes_known_edges_and_hubs(spark):
    # star hub 0 -- {1..6} plus a path 1-2: the hub exceeds the guard,
    # so the ONLY wedges run through nodes 1 and 2 (degree 2 each)
    edges = [(0, i) for i in range(1, 7)] + [(1, 2)]
    df = spark.createDataFrame(edges, "src long, dst long")
    rows = link_prediction(df, max_hub_degree=5).collect()
    got = {(r.u, r.v): r for r in rows}
    # wedge through 1: (0,2) is a KNOWN edge? no — 0-2 IS an edge (hub
    # spoke), so it is excluded; nothing else shares a small neighbor
    assert got == {}
    # raising the guard admits the hub: spokes pair through it, but
    # known edges (1,2) and spokes never appear
    rows = link_prediction(df, max_hub_degree=6).collect()
    pairs = {(r.u, r.v) for r in rows}
    assert (1, 2) not in pairs          # existing edge stays excluded
    assert (3, 4) in pairs              # spoke pair via the hub
    for r in rows:
        if (r.u, r.v) == (3, 4):
            assert r.common_neighbors == 1
            assert r.ra_micro == RA_MICRO // 6


# ------------------------------------------------------ JL projection ----

def test_jl_projection_matches_numpy(spark):
    import numpy as np
    rnd = random.Random(3)
    vecs = [(i, [rnd.uniform(-1, 1) for _ in range(16)]) for i in range(20)]
    df = spark.createDataFrame(vecs, "vec_id long, embedding array<double>")
    mat = jl_matrix(16, 4, seed=9)
    got = {r.vec_id: r.projected for r in project(df, mat).collect()}
    m = np.array(mat)
    for i, v in vecs:
        exp = m @ np.array(v)
        assert np.allclose(got[i], exp, rtol=1e-12), i


def test_jl_projection_preserves_distances_statistically(spark):
    # JL direction check on clustered data: a pair of identical vectors
    # projects to identical images; far pairs stay far on average
    base = [1.0] * 64
    rows = [(0, base), (1, list(base)),
            (2, [x + 10.0 for x in base])]
    df = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    mat = jl_matrix(64, 8, seed=7)
    got = {r.vec_id: r.projected for r in project(df, mat).collect()}
    assert got[0] == got[1]
    d_close = sum((a - b) ** 2 for a, b in zip(got[0], got[1]))
    d_far = sum((a - b) ** 2 for a, b in zip(got[0], got[2]))
    assert d_close == 0.0 and d_far > 0.0


# ---------------------------------------------------- int8 quantization ----

def test_quantize_int8_matches_python(spark):
    rnd = random.Random(5)
    vecs = [(i, [rnd.uniform(-2, 2) for _ in range(8)]) for i in range(30)]
    vecs.append((97, [0.0] * 8))                       # zero vector
    vecs.append((98, [-1.5] + [0.25] * 7))             # max at a negative
    df = spark.createDataFrame(vecs, "vec_id long, embedding array<double>")
    got = {r.vec_id: r for r in quantize_int8(df).collect()}
    for i, v in vecs:
        r = got[i]
        maxabs = max(abs(x) for x in v)
        if maxabs == 0:
            assert r.scale is None and r.codes == [0] * len(v)
            assert r.sse == 0.0 and r.sum_codes == 0
            continue
        scale = maxabs / 127.0
        codes = [max(-127, min(127, math.floor(x / scale))) for x in v]
        assert r.codes == codes, i
        assert r.sum_codes == sum(codes)
        sse = 0.0
        for x, c in zip(v, codes):
            d = x - c * scale
            sse = sse + d * d
        assert r.sse == sse, i                          # bit-exact fold
        # codes are a faithful quantization: one step of the grid
        assert all(abs(x - c * scale) <= scale + 1e-12
                   for x, c in zip(v, codes))


def test_quantize_int8_negative_extreme_clamps(spark):
    # v = -maxabs divides to exactly/near -127; the clamp guarantees the
    # code never escapes [-127, 127] whatever the rounding did
    df = spark.createDataFrame(
        [(1, [-3.0, 3.0, 1.0])], "vec_id long, embedding array<double>")
    r = quantize_int8(df).collect()[0]
    assert r.codes[0] == -127 and r.codes[1] == 127
    assert -127 <= min(r.codes) and max(r.codes) <= 127


# ------------------------------------------------------- SCD2 history ----

def test_scd2_history_runs_and_currency(spark):
    t = lambda m: dt.datetime(2024, 1, 1, 0, m)
    rows = [
        (1, t(0), "a", 1), (1, t(1), "a", 2), (1, t(2), "b", 3),
        (1, t(3), "a", 4),                     # a reappears: NEW run
        (2, t(0), "x", 5),
        (3, t(0), None, 6), (3, t(1), None, 7), (3, t(2), "y", 8),
    ]
    df = spark.createDataFrame(
        rows, "user_id long, ts timestamp, event_type string, event_id long")
    hist = scd2_history(df, key="user_id", ts="ts", value="event_type",
                        tiebreak="event_id").collect()
    by_key = defaultdict(list)
    for r in sorted(hist, key=lambda r: (r.key, r.effective_from)):
        by_key[r.key].append(r)
    u1 = by_key[1]
    assert [(r.value, r.n_obs, r.is_current) for r in u1] == [
        ("a", 2, False), ("b", 1, False), ("a", 1, True)]
    # ranges tile: each run's effective_to == next run's effective_from
    assert u1[0].effective_to == u1[1].effective_from
    assert u1[1].effective_to == u1[2].effective_from
    assert u1[2].effective_to is None
    assert [(r.value, r.is_current) for r in by_key[2]] == [("x", True)]
    # null runs group together via null-safe comparison
    assert [(r.value, r.n_obs) for r in by_key[3]] == [(None, 2), ("y", 1)]


def test_er_scores_match_python_bruteforce(spark):
    from knowledgebase_processor_spark.operators.er import (
        er_candidate_scores)
    recs = [(1, "Acme Corp"), (2, "acme corp."), (3, "ACME  Corporation"),
            (4, "Zeta Ltd"), (5, "zeta ltd"), (6, "Wholly Different")]
    df = spark.createDataFrame(recs, "rid long, name string")
    rows = er_candidate_scores(df, "rid", "name", w=2,
                               sim_threshold=0.8).collect()
    got = {(r.id_a, r.id_b): r for r in rows}

    def norm(s):
        import re
        return re.sub(" +", " ",
                      re.sub("[^a-z0-9 ]", "", s.lower())).strip()

    keys = {i: norm(n) for i, n in recs}
    ranked = sorted(keys, key=lambda i: (keys[i], i))
    exp_pairs = {(ranked[i], ranked[j])
                 for i in range(len(ranked))
                 for j in range(i + 1, min(i + 3, len(ranked)))}
    assert set(got) == exp_pairs
    import itertools
    for (a, b), r in got.items():
        ka, kb = keys[a], keys[b]
        assert (r.key_a, r.key_b) == (ka, kb)
        # python Levenshtein
        la, lb = len(ka), len(kb)
        prev = list(range(lb + 1))
        for i in range(1, la + 1):
            cur = [i] + [0] * lb
            for j in range(1, lb + 1):
                cur[j] = min(prev[j] + 1, cur[j - 1] + 1,
                             prev[j - 1] + (ka[i - 1] != kb[j - 1]))
            prev = cur
        assert r.lev == prev[lb], (a, b)
        ta, tb_ = set(ka.split()) - {""}, set(kb.split()) - {""}
        un = len(ta | tb_)
        jac = 1.0 if un == 0 else len(ta & tb_) / un
        assert abs(r.tok_jaccard - jac) < 1e-12
    # the exact duplicates match, the unrelated name does not match acme
    assert got[(1, 2)].is_match and got[(4, 5)].is_match


def test_er_key_normalizes_to_ascii(spark):
    from knowledgebase_processor_spark.operators.er import er_key
    df = spark.createDataFrame(
        [("  Héllo,  WORLD!! 42 ",)], "s string")
    out = df.select(er_key(F.col("s")).alias("k")).collect()[0].k
    assert out == "hllo world 42"          # non-ascii stripped, squeezed


def test_rolling_zscore_flags_match_python(spark):
    from knowledgebase_processor_spark.operators.anomaly import (
        rolling_zscore_flags)
    rnd = random.Random(17)
    rows = []
    eid = 0
    for u in range(4):
        for m in range(30):
            val = round(rnd.uniform(1, 20), 2)
            if m == 20:
                val = 500.0                          # planted spike
            rows.append((u, dt.datetime(2024, 1, 1, 0, m), eid, val))
            eid += 1
    df = spark.createDataFrame(
        rows, "user_id long, ts timestamp, event_id long, value double")
    got = {(r.key, r.tb): r for r in rolling_zscore_flags(
        df, key="user_id", ts="ts", value="value", tiebreak="event_id",
        window=8, k_sigma=3, min_prior=4).collect()}
    assert len(got) == len(rows)
    per_user = defaultdict(list)
    for u, ts, eid_, val in rows:
        per_user[u].append((ts, eid_, round(val * 100)))
    n_flagged = 0
    for u, evs in per_user.items():
        evs.sort()
        for i, (ts, eid_, c) in enumerate(evs):
            prior = [x[2] for x in evs[max(0, i - 8):i]]
            r = got[(u, eid_)]
            assert r.cents == c
            assert r.n_prior == len(prior)
            assert r.sum_prior == sum(prior)
            assert r.ss_prior == sum(x * x for x in prior)
            if len(prior) < 4:
                assert r.is_anomaly is None
            else:
                n, s = len(prior), sum(prior)
                ss = sum(x * x for x in prior)
                exp = (c * n - s) ** 2 > 9 * (n * ss - s * s)
                assert r.is_anomaly == exp, (u, i)
                n_flagged += r.is_anomaly
    # every planted spike is flagged (4 users), background mostly quiet
    spikes = [r for r in got.values() if r.cents == 50000]
    assert all(r.is_anomaly for r in spikes) and len(spikes) == 4


def test_scd2_history_tie_timestamps_are_deterministic(spark):
    t0 = dt.datetime(2024, 1, 1)
    rows = [(1, t0, "b", 2), (1, t0, "a", 1), (1, t0, "c", 3)]
    df = spark.createDataFrame(
        rows, "user_id long, ts timestamp, event_type string, event_id long")
    hist = sorted(scd2_history(df, key="user_id", ts="ts",
                               value="event_type", tiebreak="event_id")
                  .collect(), key=lambda r: r.run_order
                  if hasattr(r, "run_order") else (r.effective_from, r.value))
    # tiebreak=event_id orders a,b,c -> three runs, last one current
    vals = {r.value for r in hist}
    assert vals == {"a", "b", "c"}
    assert sum(1 for r in hist if r.is_current) == 1


# ----------------------------------------------------- shortest paths ----

def _py_bf(edges, seeds, rounds):
    dist = {s: 0 for s in seeds}
    for _ in range(rounds):
        new = dict(dist)
        for s, d_, w in edges:
            if s in dist and (d_ not in new or dist[s] + w < new[d_]):
                new[d_] = min(new.get(d_, 1 << 60), dist[s] + w)
        if new == dist:
            break
        dist = new
    return dist


def test_shortest_paths_match_python_bellman_ford(spark):
    from knowledgebase_processor_spark.operators.shortest_path import (
        shortest_paths)
    rnd = random.Random(23)
    edges = [(rnd.randrange(30), rnd.randrange(30), rnd.randrange(1, 6))
             for _ in range(70)]
    seeds = [0, 7]
    e = spark.createDataFrame(edges, "src long, dst long, w long")
    s = spark.createDataFrame([(x,) for x in seeds], "node long")
    got = {r.node: r.dist
           for r in shortest_paths(e, s, weight="w", rounds=40).collect()}
    assert got == _py_bf(edges, seeds, 40)


def test_shortest_paths_horizon_is_exact(spark):
    # a pure path graph: after R rounds only the first R nodes past the
    # seed hold distances — the horizon is semantics, not approximation
    from knowledgebase_processor_spark.operators.shortest_path import (
        shortest_paths)
    edges = [(i, i + 1, 2) for i in range(10)]
    e = spark.createDataFrame(edges, "src long, dst long, w long")
    s = spark.createDataFrame([(0,)], "node long")
    got = {r.node: r.dist
           for r in shortest_paths(e, s, weight="w", rounds=3).collect()}
    assert got == {0: 0, 1: 2, 2: 4, 3: 6}
    # hop-count mode (weight omitted): every edge costs 1
    got = {r.node: r.dist for r in shortest_paths(e, s, rounds=3).collect()}
    assert got == {0: 0, 1: 1, 2: 2, 3: 3}


# ------------------------------------------------ adversarial corners ----

def test_link_prediction_complete_graph_is_empty(spark):
    # every pair already linked -> anti-join leaves nothing
    from knowledgebase_processor_spark.operators.linkpred import (
        link_prediction)
    edges = [(a, b) for a in range(6) for b in range(a + 1, 6)]
    df = spark.createDataFrame(edges, "src long, dst long")
    assert link_prediction(df).count() == 0


def test_link_prediction_ignores_self_loops_and_nulls(spark):
    from knowledgebase_processor_spark.operators.linkpred import (
        link_prediction)
    df = spark.createDataFrame(
        [(1, 1), (1, None), (None, 2), (1, 2), (2, 3)],
        "src long, dst long")
    rows = link_prediction(df).collect()
    assert {(r.u, r.v) for r in rows} == {(1, 3)}
    r = rows[0]
    assert (r.common_neighbors, r.ra_micro) == (1, RA_MICRO // 2)
    assert abs(r.jaccard - 1.0) < 1e-12       # deg1=1, deg3=1, cn=1


def test_anomaly_constant_series_never_flags(spark):
    # zero variance: rhs == 0, lhs == 0 for the same value -> False;
    # any deviation flags immediately (lhs > 0 = rhs)
    from knowledgebase_processor_spark.operators.anomaly import (
        rolling_zscore_flags)
    rows = [(1, dt.datetime(2024, 1, 1, 0, m), m, 5.0) for m in range(10)]
    rows.append((1, dt.datetime(2024, 1, 1, 0, 10), 10, 5.01))
    df = spark.createDataFrame(
        rows, "user_id long, ts timestamp, event_id long, value double")
    out = {r.tb: r.is_anomaly for r in rolling_zscore_flags(
        df, key="user_id", ts="ts", value="value",
        tiebreak="event_id").collect()}
    assert out[9] is False                    # same value: not anomalous
    assert out[10] is True                    # 1-cent deviation at sigma=0
    assert out[0] is None and out[3] is None  # cold start


def test_anomaly_null_value_rows_flow_through(spark):
    from knowledgebase_processor_spark.operators.anomaly import (
        rolling_zscore_flags)
    rows = [(1, dt.datetime(2024, 1, 1, 0, m), m,
             None if m == 5 else float(m)) for m in range(8)]
    df = spark.createDataFrame(
        rows, "user_id long, ts timestamp, event_id long, value double")
    out = {r.tb: r for r in rolling_zscore_flags(
        df, key="user_id", ts="ts", value="value",
        tiebreak="event_id").collect()}
    assert len(out) == 8
    assert out[5].cents is None and out[5].is_anomaly is None
    # the null row contributes nothing to later windows (count skips it)
    assert out[7].n_prior == 6                # 7 predecessors minus null


def test_scd2_single_and_empty_inputs(spark):
    df = spark.createDataFrame(
        [], "user_id long, ts timestamp, event_type string, event_id long")
    assert scd2_history(df, key="user_id", ts="ts", value="event_type",
                        tiebreak="event_id").count() == 0
    one = spark.createDataFrame(
        [(1, dt.datetime(2024, 1, 1), "a", 1)],
        "user_id long, ts timestamp, event_type string, event_id long")
    r = scd2_history(one, key="user_id", ts="ts", value="event_type",
                     tiebreak="event_id").collect()[0]
    assert (r.value, r.effective_to, r.is_current, r.n_obs) == \
        ("a", None, True, 1)


def test_er_scores_empty_keys_do_not_crash(spark):
    from knowledgebase_processor_spark.operators.er import (
        er_candidate_scores)
    df = spark.createDataFrame(
        [(1, "!!!"), (2, "???"), (3, "abc")], "rid long, name string")
    rows = er_candidate_scores(df, "rid", "name", w=2).collect()
    got = {(r.id_a, r.id_b): r for r in rows}
    # the two all-symbol names normalize to "" and match each other
    empty_pair = [r for r in rows if r.key_a == "" and r.key_b == ""]
    assert empty_pair and all(r.lev == 0 and r.lev_sim == 1.0
                              and r.tok_jaccard == 1.0 and r.is_match
                              for r in empty_pair)


def test_shortest_paths_negative_weight_edges_are_dropped(spark):
    from knowledgebase_processor_spark.operators.shortest_path import (
        shortest_paths)
    e = spark.createDataFrame([(0, 1, 5), (0, 1, -3), (1, 2, 1)],
                              "src long, dst long, w long")
    s = spark.createDataFrame([(0,)], "node long")
    got = {r.node: r.dist for r in shortest_paths(e, s, weight="w",
                                                  rounds=5).collect()}
    assert got == {0: 0, 1: 5, 2: 6}          # the -3 edge never relaxes


# --------------------------------------- chunk dedup / token-budget mix ----

def test_dedup_chunks_keeps_one_canonical_copy(spark):
    from knowledgebase_processor_spark.operators.chunking import (
        chunk_documents, dedup_chunks)
    boiler = " ".join(f"w{i}" for i in range(64))
    docs = [(1, boiler + " tail one"), (2, boiler + " tail two"),
            (3, "completely different text " * 20)]
    df = spark.createDataFrame(docs, "doc_id long, text string")
    all_chunks = chunk_documents(df).collect()
    kept = dedup_chunks(df).collect()
    # the shared 64-word boilerplate chunk appears once, from doc 1
    shared = [r for r in kept if r.chunk_text == boiler.lower()]
    assert len(shared) == 1
    assert shared[0].doc_id == 1 and shared[0].n_copies == 2
    # every fingerprint survives exactly once and nothing is invented
    assert len(kept) == len({r.chunk_text for r in all_chunks})
    assert sum(r.n_copies for r in kept) == len(all_chunks)


def test_token_budget_mix_rates_and_determinism(spark):
    from knowledgebase_processor_spark.operators.mix import (
        sampled_docs, token_budget_mix)
    rnd = random.Random(31)
    rows = [(i, f"s{i % 3}", "tok " * rnd.randrange(5, 40))
            for i in range(300)]
    df = spark.createDataFrame(rows, "doc_id long, source string, text string")
    weights = {"s0": 0.5, "s1": 0.5}          # s2 excluded
    out = {r.source: r for r in
           token_budget_mix(df, weights, budget_tokens=500).collect()}
    assert set(out) == {"s0", "s1"}           # weight-0 source dropped
    for s, r in out.items():
        assert r.target_tokens == 250
        assert 0 < r.rate <= 1.0
        assert r.kept_docs <= r.total_docs
        # the sample lands in the right neighborhood of the quota
        assert r.kept_tokens < 2.5 * r.target_tokens
    # a source under quota keeps everything (rate clamps at 1)
    tiny = spark.createDataFrame(
        [(1, "s0", "only a few tokens here")], "doc_id long, source string, text string")
    t = token_budget_mix(tiny, {"s0": 1.0}, budget_tokens=10**6).collect()[0]
    assert t.rate == 1.0 and t.kept_docs == 1
    # membership is deterministic and matches the summary counts
    s1 = {r.doc_id for r in sampled_docs(df, weights, 500).collect()}
    s2 = {r.doc_id for r in sampled_docs(df, weights, 500).collect()}
    assert s1 == s2
    assert len(s1) == sum(r.kept_docs for r in out.values())


# --------------------------------------------------- hard negatives ----

def test_hard_negatives_bucketed_subset_of_bruteforce(spark):
    from knowledgebase_processor_spark.operators.negatives import (
        hard_negatives, hard_negatives_bruteforce)
    rnd = random.Random(41)
    vecs = [(i, [rnd.gauss(0, 1) for _ in range(16)], i % 3)
            for i in range(60)]
    df = spark.createDataFrame(
        vecs, "vec_id long, embedding array<double>, label int")
    lsh = hard_negatives(df, dim=16, k=3, bits=2).collect()
    bf = hard_negatives_bruteforce(df, k=60).collect()
    bf_scores = {(r.anchor_id, r.neg_id): r.cosine for r in bf}
    for r in lsh:
        # label constraint holds and the score equals the exact cosine
        assert r.anchor_label != r.neg_label
        assert bf_scores[(r.anchor_id, r.neg_id)] == r.cosine
    # bits=0 = one bucket = brute force exactly
    one = {(r.anchor_id, r.neg_id, r.rank)
           for r in hard_negatives(df, dim=16, k=3, bits=0).collect()}
    exact = {(r.anchor_id, r.neg_id, r.rank)
             for r in hard_negatives_bruteforce(df, k=3).collect()}
    assert one == exact


def test_hard_negatives_megabucket_guard_drops_whole_bucket(spark):
    from knowledgebase_processor_spark.operators.negatives import (
        hard_negatives)
    rnd = random.Random(7)
    vecs = [(i, [rnd.gauss(0, 1) for _ in range(8)], i % 2)
            for i in range(30)]
    df = spark.createDataFrame(
        vecs, "vec_id long, embedding array<double>, label int")
    # bits=0: everything lands in bucket 0; cap below corpus size drops
    # the lone bucket whole -> empty result, never a quadratic join
    assert hard_negatives(df, dim=8, k=3, bits=0, max_bucket=10).count() == 0


# ----------------------------------------------------- random walks ----

def _py_walks(edges, seeds, walk_len):
    import hashlib
    adj = defaultdict(set)
    for s, d_ in edges:
        adj[s].add(d_)
    nbrs = {n: sorted(v) for n, v in adj.items()}
    rows = []
    for w in seeds:
        cur = w
        rows.append((w, 0, w))
        for step in range(walk_len):
            ns = nbrs.get(cur)
            if not ns:
                break
            h = int(hashlib.md5(f"{w}|{step}|{cur}".encode())
                    .hexdigest()[:15], 16)
            cur = ns[h % len(ns)]
            rows.append((w, step + 1, cur))
    return set(rows)


def test_random_walks_match_python_replication(spark):
    from knowledgebase_processor_spark.operators.walks import random_walks
    rnd = random.Random(13)
    edges = list({(rnd.randrange(25), rnd.randrange(25))
                  for _ in range(60)})
    seeds = list(range(10))
    e = spark.createDataFrame(edges, "src long, dst long")
    s = spark.createDataFrame([(x,) for x in seeds], "node long")
    got = {(r.walk_id, r.step, r.node)
           for r in random_walks(e, s, walk_len=5).collect()}
    assert got == _py_walks(edges, seeds, 5)
    # determinism across runs
    again = {(r.walk_id, r.step, r.node)
             for r in random_walks(e, s, walk_len=5).collect()}
    assert again == got


def test_random_walks_stop_at_sinks(spark):
    from knowledgebase_processor_spark.operators.walks import random_walks
    e = spark.createDataFrame([(0, 1), (1, 2)], "src long, dst long")
    s = spark.createDataFrame([(0,), (2,)], "node long")
    got = sorted((r.walk_id, r.step, r.node)
                 for r in random_walks(e, s, walk_len=9).collect())
    # walk 0 deterministically follows the path and stops at sink 2;
    # walk 2 emits only its seed row
    assert got == [(0, 0, 0), (0, 1, 1), (0, 2, 2), (2, 0, 2)]


def test_quality_ensemble_is_integer_exact_and_complete(spark):
    # the fixed-point RRF sum is aggregation-order independent by
    # construction: recompute it from the three component rankings
    import __spark_entry__ as entry
    df = entry.queries()["q112_quality_ensemble"](
        spark, "/root/testdata/sf0.001")
    rows = df.collect()
    assert rows and all(r.n_lists == 3 for r in rows)
    assert all(isinstance(r.rrf_micro, int) for r in rows)
    # descending, deterministic tie-break
    scores = [(r.rrf_micro, -r.doc_id) for r in rows]
    assert scores == sorted(scores, reverse=True)


# ----------------------------------------------- KMV overlap matrix ----

def test_kmv_overlap_matrix_matches_pairwise_operator(spark):
    # the grouped matrix must equal kmv_overlap run on each pair
    from knowledgebase_processor_spark.operators.sketches import (
        kmv_overlap, kmv_overlap_matrix)
    rnd = random.Random(19)
    vocab = [f"tok{i}" for i in range(300)]
    rows = []
    for g, (lo, hi) in (("a", (0, 150)), ("b", (100, 250)),
                        ("c", (200, 300))):
        for _ in range(400):
            rows.append((g, vocab[rnd.randrange(lo, hi)]))
    df = spark.createDataFrame(rows, "g string, v string")
    got = {(r.group_a, r.group_b): r
           for r in kmv_overlap_matrix(df, "g", "v", k=32).collect()}
    assert set(got) == {("a", "b"), ("a", "c"), ("b", "c")}
    for (ga, gb), r in got.items():
        solo = kmv_overlap(df.filter(F.col("g") == ga),
                           df.filter(F.col("g") == gb),
                           "v", k=32).collect()[0]
        assert (r.union_kth, r.n_union_kept, r.n_shared) == \
            (solo.union_kth, solo.n_union_kept, solo.n_shared), (ga, gb)
    # overlap structure is sane: a-b and b-c overlap, a-c do not
    assert got[("a", "b")].n_shared > 0
    assert got[("b", "c")].n_shared > 0
    assert got[("a", "c")].n_shared == 0
