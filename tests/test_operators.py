"""Unit behavior of the training-data + linking operators."""

from pyspark.sql import functions as F

from knowledgebase_processor_spark.operators.components import (
    canonical_entities, connected_components, coreference_edges,
)
from knowledgebase_processor_spark.operators.dedup import (
    exact_duplicates, minhash_lsh_pairs, minhash_signatures,
    ngram_jaccard_pairs, simhash_near_dups,
)
from knowledgebase_processor_spark.operators.mentions import (
    detect_mentions, mentions_to_entities,
)
from knowledgebase_processor_spark.operators.metadata import (
    doc_links_df, doc_metadata_df, doc_tags_df,
)
from knowledgebase_processor_spark.operators.similarity import (
    cosine_topk, ivf_assign, ivf_centroids, lsh_topk,
)


def _docs(spark):
    base = "the quick brown fox jumps over the lazy dog " * 5
    return spark.createDataFrame(
        [("d1", base),
         ("d2", base),                               # exact dup of d1
         ("d3", base + "with a tiny extra suffix"),  # near dup
         ("d4", "completely different content about spark dataframes and shuffles")],
        "doc_id string, text string")


def test_exact_duplicates(spark):
    groups = exact_duplicates(_docs(spark)).collect()
    assert len(groups) == 1
    assert sorted(groups[0]["doc_ids"]) == ["d1", "d2"]


def test_minhash_identical_signatures_for_identical_docs(spark):
    sigs = {r["doc_id"]: r["sig"] for r in minhash_signatures(_docs(spark)).collect()}
    assert sigs["d1"] == sigs["d2"]
    assert sigs["d1"] != sigs["d4"]


def test_minhash_lsh_finds_near_dups_and_jaccard_verifies(spark):
    docs = _docs(spark)
    pairs = minhash_lsh_pairs(docs, num_hashes=16, bands=8)
    found = {(r["doc_a"], r["doc_b"]) for r in pairs.collect()}
    assert ("d1", "d2") in found
    verified = ngram_jaccard_pairs(docs, pairs, threshold=0.8).collect()
    vpairs = {(r["doc_a"], r["doc_b"]): r["jaccard"] for r in verified}
    assert vpairs[("d1", "d2")] == 1.0


def test_simhash_near_dups(spark):
    found = {(r["doc_a"], r["doc_b"]): r["hamming"]
             for r in simhash_near_dups(_docs(spark), max_hamming=10).collect()}
    assert found.get(("d1", "d2")) == 0


def test_simhash_band_recall_guarantee(spark):
    """Pigeonhole recall: with max_hamming+1 bands any pair differing in
    <= max_hamming bits shares an intact band and MUST be found —
    including pairs whose differing bits fall in the top 16 bits, which
    the old single-prefix16 bucketing silently missed.  Verified
    exhaustively against brute force on deterministic pseudo-random
    64-bit values."""
    import random

    from knowledgebase_processor_spark.operators.dedup import simhash_band_pairs

    def signed(u):
        return u - (1 << 64) if u >= (1 << 63) else u

    rnd = random.Random(7)
    uvals = {f"r{i:02d}": rnd.getrandbits(64) for i in range(40)}
    # planted pairs: flips confined to the TOP-16 prefix (old blind spot)
    base = rnd.getrandbits(64)
    uvals["p0"] = base
    uvals["p1"] = base ^ (1 << 63) ^ (1 << 55)         # 2 bits, both in prefix
    uvals["p2"] = base ^ (7 << 48)                      # 3 bits, all in prefix
    vals = {k: signed(u) for k, u in uvals.items()}
    sims = spark.createDataFrame(list(vals.items()), "doc_id string, simhash long")

    def ham(a, b):
        return bin((vals[a] ^ vals[b]) & ((1 << 64) - 1)).count("1")

    expected = {(a, b) for a in vals for b in vals
                if a < b and ham(a, b) <= 3}
    got = {(r.doc_a, r.doc_b): r.hamming
           for r in simhash_band_pairs(sims, max_hamming=3).collect()}
    assert set(got) == expected
    assert ("p0", "p1") in got and got[("p0", "p1")] == 2
    assert ("p0", "p2") in got and got[("p0", "p2")] == 3
    for (a, b), h in got.items():
        assert h == ham(a, b)


def test_bucket_guard_runs_before_materialization(spark):
    """Mega-bucket boundedness: (a) an oversized bucket is dropped whole
    (degenerate corpus of identical simhashes yields no pairs instead of
    O(n^2)); (b) the physical plan truncates buckets with a
    row_number-window filter BEFORE the collect_list aggregate, so the
    aggregation buffer never holds an unbounded member list (the window's
    per-group buffer is a spillable external sorter)."""
    from pyspark.sql import functions as F

    from knowledgebase_processor_spark.operators.dedup import (
        minhash_lsh_pairs, simhash_band_pairs)

    degenerate = spark.range(5_000).select(
        F.concat(F.lit("z"), F.col("id")).alias("doc_id"),
        F.lit(0).cast("long").alias("simhash"))
    assert simhash_band_pairs(degenerate, max_hamming=3,
                              max_bucket=100).count() == 0

    boiler = spark.range(500).select(
        F.concat(F.lit("b"), F.col("id")).alias("doc_id"),
        F.lit("same boilerplate page body repeated verbatim " * 5).alias("text"))
    pairs = minhash_lsh_pairs(boiler, max_bucket=100)
    assert pairs.count() == 0  # bucket of 500 identical sigs > cap -> dropped

    plan = pairs._jdf.queryExecution().executedPlan().toString()
    assert "row_number" in plan
    agg_at = plan.index("collect_list")
    win_at = plan.index("row_number")
    # executed plans print top-down: the window (and its rn filter) must
    # sit BELOW (after, in print order) the collecting aggregate
    assert win_at > agg_at
    filt_at = plan.index("(rn#", agg_at) if "(rn#" in plan else plan.find("rn#")
    assert agg_at < filt_at


def test_winnowed_fingerprints_guarantee(spark):
    """Winnowing guarantee: documents sharing any substring of length
    >= k + window - 1 share at least one fingerprint; disjoint content
    shares none; identical docs have identical fingerprint sets."""
    from knowledgebase_processor_spark.operators.dedup import (
        winnowed_fingerprints)
    k, w = 8, 4
    shared = "x" * 0 + "the stolen paragraph appears verbatim here"  # 42 chars >= k+w-1
    docs = spark.createDataFrame(
        [("a", "unique preamble alpha. " + shared + " unique tail one."),
         ("b", "totally different intro! " + shared + " other ending two."),
         ("c", "no overlap with anything else at all, honestly."),
         ("d", "unique preamble alpha. " + shared + " unique tail one.")],
        "doc_id string, text string")
    fps = {}
    for r in winnowed_fingerprints(docs, k=k, window=w).collect():
        fps.setdefault(r.doc_id, set()).add(r.fp)
    assert fps["a"] & fps["b"]            # shared substring detected
    assert not (fps["a"] & fps["c"])      # disjoint content: no collision
    assert fps["a"] == fps["d"]           # identical docs: identical sets


def test_embedding_near_dups_lsh_matches_brute_force(spark):
    """The bucketed scale path must (a) report EXACTLY the brute-force
    cosine for every pair it emits, (b) find all planted near-identical
    pairs (multi-table recall), (c) stay bounded on a degenerate corpus
    of identical vectors."""
    import random

    from pyspark.sql import functions as F

    from knowledgebase_processor_spark.operators.dedup import (
        embedding_near_dups, embedding_near_dups_lsh)

    rnd = random.Random(3)
    dim = 16
    rows = []
    for i in range(30):
        base = [rnd.gauss(0, 1) for _ in range(dim)]
        rows.append((2 * i, base))
        # planted near-dup: tiny perturbation -> cosine ~0.999
        rows.append((2 * i + 1, [x + rnd.gauss(0, 0.02) for x in base]))
    vecs = spark.createDataFrame(rows, "vec_id long, embedding array<double>")

    exact = {(r.vec_a, r.vec_b): r.cosine
             for r in embedding_near_dups(vecs, threshold=0.95).collect()}
    approx = {(r.vec_a, r.vec_b): r.cosine
              for r in embedding_near_dups_lsh(vecs, dim=dim,
                                               threshold=0.95).collect()}
    # every reported pair carries the exact brute-force value
    for pair, cos in approx.items():
        assert exact[pair] == cos
    # all planted pairs found
    planted = {(2 * i, 2 * i + 1) for i in range(30)} & set(exact)
    assert planted <= set(approx)
    assert len(planted) >= 25        # sanity: perturbation kept them similar

    degenerate = spark.range(5_000).select(
        F.col("id").alias("vec_id"),
        F.array(*[F.lit(1.0)] * 4).alias("embedding"))
    assert embedding_near_dups_lsh(degenerate, dim=4,
                                   max_bucket=100).count() == 0


def test_cosine_topk_and_lsh(spark):
    vecs = spark.createDataFrame(
        [(0, [1.0, 0.0, 0.0]), (1, [0.9, 0.1, 0.0]),
         (2, [0.0, 1.0, 0.0]), (3, [1.0, 0.01, 0.0])],
        "vec_id long, embedding array<double>")
    top = cosine_topk(vecs.filter("vec_id != 0"), [1.0, 0.0, 0.0], k=2).collect()
    assert [r["vec_id"] for r in top] == [3, 1]
    approx = lsh_topk(vecs, [1.0, 0.0, 0.0], dim=3, k=2, bits=4)
    ids = [r["vec_id"] for r in approx.collect()]
    assert 3 in ids  # the near-identical vector lands in the query bucket


def test_ivf_assign_covers_all(spark):
    vecs = spark.createDataFrame(
        [(i, [float(i), 1.0]) for i in range(10)],
        "vec_id long, embedding array<double>")
    cents = ivf_centroids(vecs, dim=2, k_cells=3)
    assigned = ivf_assign(vecs, cents)
    assert assigned.count() == 10
    assert assigned.filter(F.col("cell") < 0).count() == 0


def test_connected_components_two_clusters(spark):
    edges = spark.createDataFrame(
        [("b", "a"), ("c", "b"), ("z", "y")], "src string, dst string")
    labels = {r["node"]: r["component"]
              for r in connected_components(edges).collect()}
    assert labels == {"a": "a", "b": "a", "c": "a", "y": "y", "z": "y"}


def test_coreference_and_canonicalization(spark):
    docs = spark.createDataFrame(
        [("u1", "Alice Smith works with alice smith and Bob.")],
        "doc_id string, text string")
    ents = mentions_to_entities(detect_mentions(
        docs, {"Alice Smith": ("person", []), "alice smith": ("person", []),
               "Bob": ("person", [])}))
    edges = coreference_edges(ents)
    assert edges.count() >= 1  # the two alice variants share a lowered label
    labels = connected_components(edges)
    canon = canonical_entities(ents, labels)
    alice = canon.filter(F.lower(F.col("label")) == "alice smith") \
                 .select("canonical_id").distinct().collect()
    assert len(alice) == 1  # both surface forms share one canonical id


def test_doc_metadata_frontmatter_and_links(spark):
    md = ("---\ntitle: My Doc\ntags: [a, b]\ndate: 2024-11-07\nextra: 1\n---\n"
          "# H\nSee [link](http://x.org) and [[Wiki]] #tag1 @cat/tag2\n"
          "`#nottag` [ref]: http://r.org\n")
    docs = spark.createDataFrame([("d1", md, "notes/my_doc.md")],
                                 "doc_id string, text string, path string")
    meta = doc_metadata_df(docs, path_col="path").collect()[0]
    assert meta["title"] == "My Doc"
    assert meta["fm_format"] == "yaml"
    # typed date parse (reference format list), ISO-8601 normalized
    assert meta["fm_date"] == "2024-11-07T00:00:00"
    tags = {r["tag"] for r in doc_tags_df(doc_metadata_df(docs, path_col="path")).collect()}
    assert {"a", "b", "tag1", "tag2"} <= tags
    assert "nottag" not in tags
    links = doc_links_df(doc_metadata_df(docs, path_col="path")).collect()
    kinds = {r["link_kind"] for r in links}
    assert "inline" in kinds
    urls = {r["url"] for r in links}
    assert "http://x.org" in urls


def test_doc_metadata_title_precedence(spark):
    docs = spark.createDataFrame(
        [("d1", "# First Heading\nbody", "notes/readme.md"),
         ("d2", "# Ignored\nbody", "notes/real_name.md")],
        "doc_id string, text string, path string")
    titles = {r["doc_id"]: r["title"]
              for r in doc_metadata_df(docs, path_col="path").collect()}
    assert titles["d1"] == "First Heading"     # generic stem -> first heading
    assert titles["d2"] == "real name"         # stem with _ -> space


def test_wikilink_resolution_cascade(spark):
    from knowledgebase_processor_spark.pipeline import documents_to_triples
    from pyspark.sql import functions as F
    docs = spark.createDataFrame(
        [("docs/alpha", "See [[notes/alpha.md]] and [[notes/alpha]] and [[alpha]] and [[nope]]",
          "notes/alpha.md", "Alpha"),
         ("docs/beta", "plain", "notes/beta.md", "Beta")],
        "doc_id string, text string, path string, title string")
    t = documents_to_triples(docs, "doc_id", "text", "path", "title",
                             resolve_links=True)
    resolved = {r["subj"]: r["obj"] for r in
                t.filter(F.col("pred").endswith("resolvedDocument")).collect()}
    # exact path, path-sans-ext, and basename all resolve to docs/alpha
    assert len(resolved) == 3
    assert set(resolved.values()) == {"http://example.org/kb/vocab#/docs/alpha"}
    # [[nope]] stays unresolved: its wikilink node has no resolvedDocument
    labels = {r["obj"] for r in t.filter(
        F.col("pred").endswith("targetPath")).collect()}
    assert "nope" in labels


def test_merged_equals_shuffle_dedup(spark):
    """triples_from_merged must equal dropDuplicates triple sets."""
    from knowledgebase_processor_spark.operators.extract_udf import extract_entities_df
    from knowledgebase_processor_spark.operators.triples import (
        triples_from_entities, triples_from_merged)
    docs = spark.createDataFrame(
        [("d1", "# A\n- [ ] t\n[[X]]\n```py\nc\n```\n> q\n| a | b |\n|---|---|\n| 1 | 2 |\n")],
        "doc_id string, text string")
    ents = extract_entities_df(docs)
    def key(r):
        return (r.subj, r.pred, r.obj, r.obj_is_uri, r.obj_datatype)
    a = {key(r) for r in triples_from_entities(ents, dedup=True).collect()}
    b = {key(r) for r in triples_from_merged(ents).collect()}
    assert a == b


def test_skew_utilities(spark):
    from knowledgebase_processor_spark.operators.skew import (
        replicated_join, salted_collect_set, salted_count)
    # hot key 'h' with 500 rows, cold keys with 1 each
    rows = [("h", f"v{i}") for i in range(500)] + [("c1", "x"), ("c2", "y")]
    df = spark.createDataFrame(rows, "k string, v string")
    counts = {r["k"]: r["n"] for r in salted_count(df, "k", salt=8).collect()}
    assert counts == {"h": 500, "c1": 1, "c2": 1}
    sets = {r["k"]: set(r["values"]) for r in
            salted_collect_set(df, "k", "v", salt=8).collect()}
    assert len(sets["h"]) == 500 and sets["c1"] == {"x"}
    dim = spark.createDataFrame([("h", 1), ("c1", 2)], "k string, attr int")
    j = replicated_join(df, dim, "k")
    assert j.count() == 501  # 500 hot + 1 cold (c2 unmatched, inner)
    assert j.filter("k = 'h'").select("attr").distinct().collect()[0][0] == 1


def test_salted_coreference_edges_equal_unsalted(spark):
    """The kg_job main path wires the north rule's explicit head-entity
    salt into the coreference member->rep join (components.py); the edge
    set must be identical for any salt, including the head alias that
    carries most of the rows."""
    # head alias 'ada lovelace' with 400 mention rows, plus cold aliases
    rows = [("person", f"kb:m{i:04d}", f"kb:doc{i}", None, "Ada Lovelace")
            for i in range(400)]
    rows += [("person", "kb:x1", "kb:d1", None, "Grace Hopper"),
             ("person", "kb:x2", "kb:d2", None, "grace hopper"),
             ("organization", "kb:o1", "kb:d3", None, "ACME"),
             ("wikilink", "kb:w1", "kb:d4", "kb:Document/home", None)]
    ents = spark.createDataFrame(
        rows, "kind string, kb_id string, source_document_uri string, "
              "resolved_document_uri string, label string")
    plain = {(r.src, r.dst) for r in coreference_edges(ents).collect()}
    for s in (4, 16):
        salted = {(r.src, r.dst)
                  for r in coreference_edges(ents, salt=s).collect()}
        assert salted == plain
    # the head alias fans out as a star from its min representative
    assert sum(1 for s, d in plain if s == "kb:m0000") == 399


def test_cc_long_chain_converges(spark):
    """31-node chain: pointer jumping must converge in O(log n) rounds
    (plain 1-hop propagation returned 10 wrong components here)."""
    from knowledgebase_processor_spark.operators.components import connected_components
    edges = spark.createDataFrame(
        [(f"n{i:02d}", f"n{i+1:02d}") for i in range(30)], "src string, dst string")
    labels = connected_components(edges, max_iterations=10)
    comps = {r["component"] for r in labels.collect()}
    assert comps == {"n00"}


def test_mentions_empty_dict_and_nonword_aliases(spark):
    from knowledgebase_processor_spark.operators.mentions import detect_mentions
    docs = spark.createDataFrame(
        [("d", "we use C++ and @handle and Rust daily; pseudo-Rusty too")],
        "doc_id string, text string")
    assert detect_mentions(docs, {}).count() == 0
    found = {r["alias"] for r in detect_mentions(docs, {
        "C++": ("organization", []), "@handle": ("person", []),
        "Rust": ("organization", []),
    }).collect()}
    assert found == {"C++", "@handle", "Rust"}  # Rusty NOT matched


def test_bgp_repeated_variable_constraint(spark):
    from knowledgebase_processor_spark.operators.graph_query import match_bgp
    triples = spark.createDataFrame(
        [("s1", "p", "s1", True, None, "d"), ("s2", "p", "other", True, None, "d")],
        "subj string, pred string, obj string, obj_is_uri boolean, "
        "obj_datatype string, source_doc string")
    out = match_bgp(triples, [("?x", "p", "?x")])
    assert out.columns == ["x"]
    assert [r["x"] for r in out.collect()] == ["s1"]


def test_lsh_topk_empty_corpus(spark):
    from knowledgebase_processor_spark.operators.similarity import lsh_topk
    empty = spark.createDataFrame([], "vec_id long, embedding array<double>")
    assert lsh_topk(empty, [1.0, 0.0], dim=2, k=3).count() == 0


def test_dimension_tiebreak_deterministic(spark):
    from knowledgebase_processor_spark.operators.wikilink_resolve import documents_dimension
    docs = spark.createDataFrame(
        [("docA", "a/readme.md"), ("docB", "b/readme.md")],
        "doc_id string, path string")
    for parts in (1, 7):
        dim = documents_dimension(docs.repartition(parts), path_col="path")
        win = dim.filter("match_key = 'readme'").collect()
        assert len(win) == 1 and win[0]["t2"] == "docB"  # max kb_id, stable


def test_pii_redaction_and_counts(spark):
    from knowledgebase_processor_spark.functions.text import pii_counts, redact_pii
    from pyspark.sql import functions as F
    df = spark.createDataFrame(
        [("a", "mail a.b+c@ex.co.uk or +1 (555) 123-4567"),
         ("b", "ip 10.0.0.255 ssn 123-45-6789"),
         ("c", "clean text 42")],
        "id string, text string")
    c = pii_counts(F.col("text"))
    rows = {r.id: r for r in df.select(
        "id", redact_pii(F.col("text")).alias("t"),
        c["n_emails"].alias("e"), c["n_ips"].alias("i"),
        c["n_ssns"].alias("s")).collect()}
    assert rows["a"].t == "mail <EMAIL> or <PHONE>"
    assert rows["b"].t == "ip <IP> ssn <SSN>"
    assert rows["c"].t == "clean text 42"
    assert (rows["a"].e, rows["b"].i, rows["b"].s) == (1, 1, 1)


def test_canonical_url_rules(spark):
    from knowledgebase_processor_spark.functions.text import canonical_url
    from pyspark.sql import functions as F
    cases = {
        "HTTPS://Ex.COM/A/B/?utm_source=x&q=1#f": "https://ex.com/A/B?q=1",
        "http://a.b//x///y/": "http://a.b/x/y",
        "https://site.org/": "https://site.org/",      # root slash kept
        "https://x.y/p?a=1&utm_b=2&c=3": "https://x.y/p?a=1&c=3",
    }
    df = spark.createDataFrame([(k,) for k in cases], "url string")
    got = [r.c for r in df.select(canonical_url(F.col("url")).alias("c")).collect()]
    assert got == list(cases.values())


def test_canonical_url_review_cases(spark):
    # regression: anchored tracking params + path-only slash collapse
    from knowledgebase_processor_spark.functions.text import canonical_url
    from pyspark.sql import functions as F
    cases = {
        "https://x.y/p?href=https://other": "https://x.y/p?href=https://other",
        "https://a.com/item?aref=1": "https://a.com/item?aref=1",
        "https://x.y/p?next=/a//b": "https://x.y/p?next=/a//b",
        "https://x.y/ref=sr_1_1/item": "https://x.y/ref=sr_1_1/item",
        "https://x.y/p?utm_a=1&utm_b=2": "https://x.y/p",
    }
    df = spark.createDataFrame([(k,) for k in cases], "url string")
    got = [r.c for r in df.select(canonical_url(F.col("url")).alias("c")).collect()]
    assert got == list(cases.values())


def test_wikilink_resolution_shuffle_fallback(spark):
    """Above the broadcast cap the dimension join must flip to a shuffled
    hash join (the 10^12-doc registry cannot broadcast) with identical
    resolution results."""
    from pyspark.sql import functions as F
    from knowledgebase_processor_spark.operators.extract_udf import (
        extract_merged_entities_df)
    from knowledgebase_processor_spark.operators.triples import explode_merged
    from knowledgebase_processor_spark.operators.wikilink_resolve import (
        documents_dimension, resolve_wikilinks_merged)

    docs = spark.createDataFrame(
        [("docs/alpha", "See [[notes/alpha.md]] and [[alpha]] and [[nope]]",
          "notes/alpha.md", "Alpha"),
         ("docs/beta", "plain [[notes/alpha]]", "notes/beta.md", "Beta")],
        "doc_id string, text string, path string, title string")
    merged = extract_merged_entities_df(docs, "doc_id", "text", "path", "title")
    dim = documents_dimension(docs, "doc_id", "path")

    def resolved_set(cap):
        t = explode_merged(resolve_wikilinks_merged(merged, dim, broadcast_cap=cap))
        return {(r.subj, r.obj) for r in
                t.filter(F.col("pred").endswith("resolvedDocument")).collect()}

    broadcast_res = resolved_set(256 << 20)
    shuffle_res = resolved_set(0)          # force the at-scale path
    assert broadcast_res == shuffle_res and len(broadcast_res) == 3

    plan = resolve_wikilinks_merged(merged, dim, broadcast_cap=0) \
        ._jdf.queryExecution().executedPlan().toString()
    assert "ShuffledHashJoin" in plan
    assert "BroadcastHashJoin" not in plan


def test_cc_skewed_hub_and_chains(spark):
    """Head-entity skew + diameter together: a 50k-degree hub (absorbed
    by map-side partial min) and 300 disjoint 34-node chains (exercise
    pointer jumping) must produce exactly 301 components."""
    from pyspark.sql import functions as F
    from knowledgebase_processor_spark.operators.components import (
        connected_components)
    hub = spark.range(50_000).select(
        F.lit("hub").alias("src"), F.concat(F.lit("s"), F.col("id")).alias("dst"))
    chain = spark.range(300 * 33).select(
        F.concat(F.lit("c"), (F.col("id") / 33).cast("long"), F.lit("-"),
                 F.pmod(F.col("id"), 33)).alias("src"),
        F.concat(F.lit("c"), (F.col("id") / 33).cast("long"), F.lit("-"),
                 F.pmod(F.col("id"), 33) + 1).alias("dst"))
    labels = connected_components(hub.unionByName(chain))
    assert labels.select("component").distinct().count() == 301
    assert labels.count() == 50_001 + 300 * 34


def test_blank_label_fallback_does_not_throw(spark):
    """An entity whose label fallback candidates are all blank used to hit
    ANSI element_at on an empty array (goldens never exercise it): a bare
    '>' blockquote has empty text, so the filtered fallback array is []."""
    from knowledgebase_processor_spark.pipeline import documents_to_triples
    from pyspark.sql import functions as F
    docs = spark.createDataFrame([("d1", ">"), ("d2", "> \n>")],
                                 "doc_id string, text string")
    t = documents_to_triples(docs)
    kinds = {r.obj for r in t.filter(F.col("pred").endswith("#type")).collect()}
    assert any(k.endswith("Blockquote") for k in kinds)


def test_large_document_is_linear():
    """The extraction kernel must stay ~linear in document size: two
    quadratic regressions (per-match prefix newline counts, list-membership
    dedup of massively-duplicated URIs) once made multi-MB docs take
    minutes.  3MB of markdown with 100k+ duplicate-URI elements must
    extract in seconds."""
    import time
    from knowledgebase_processor_spark.extract.core import extract_entities_merged
    unit = ("# Heading\n\ntext with [[Link]]\n\n- [ ] todo\n\n"
            "```py\nc()\n```\n\n> q\n")
    text = unit * (3_000_000 // len(unit))
    t0 = time.perf_counter()
    ents = extract_entities_merged("big", text)
    dt = time.perf_counter() - t0
    assert len(ents) > 100_000
    # 120s, not 60: this sandbox host injects multi-10s vCPU freezes
    # (BENCH/BASELINE.md host-migration note) that spuriously tripped the
    # tighter bound under concurrent load; the regressions this guards
    # against took MINUTES, so detection power is unchanged.
    assert dt < 120, f"3MB extraction took {dt:.0f}s — quadratic regression?"


def test_null_doc_id_rows_are_dropped(spark):
    """A null document id has no KG identity (every URI embeds it); such
    rows must be dropped, not minted as 'None/...' nodes."""
    from knowledgebase_processor_spark.pipeline import documents_to_triples
    docs = spark.createDataFrame(
        [(None, "# null id"), ("ok", "# fine"), (None, None)],
        "doc_id string, text string")
    t = documents_to_triples(docs, resolve_links=True)
    assert t.filter(t.source_doc.isNull()).count() == 0
    assert not [r for r in t.collect() if "None" in r.subj]
    assert t.filter(t.source_doc == "ok").count() > 0


def test_lsh_multiprobe_monotone_and_exhaustive(spark):
    """Multi-probe LSH: probing more buckets can only add candidates
    (recall monotone in `probes`), and probing all 2^bits buckets must
    reproduce the exact brute-force top-k."""
    from knowledgebase_processor_spark.operators.similarity import (
        cosine_topk, lsh_topk)
    vecs = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    q = [float(x) for x in vecs.first().embedding]
    dim, bits = len(q), 4
    exact = [(r.vec_id, r.cosine) for r in cosine_topk(vecs, q, k=10).collect()]
    exhaustive = [(r.vec_id, r.cosine) for r in
                  lsh_topk(vecs, q, dim=dim, k=10, bits=bits,
                           probes=2 ** bits).collect()]
    assert exhaustive == exact
    exact_ids = {i for i, _ in exact}
    prev = -1.0
    for probes in (1, 4, 16):
        got = {r.vec_id for r in lsh_topk(vecs, q, dim=dim, k=10, bits=bits,
                                          probes=probes).collect()}
        recall = len(got & exact_ids) / len(exact_ids)
        assert recall >= prev
        prev = recall


def test_ivf_topk_nprobe_monotone_and_exhaustive(spark):
    """IVF top-k: probing every cell reproduces brute force exactly, and
    recall is monotone in nprobe."""
    from knowledgebase_processor_spark.operators.similarity import (
        cosine_topk, ivf_centroids, ivf_topk)
    vecs = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    q = [float(x) for x in vecs.first().embedding]
    cents = ivf_centroids(vecs, dim=len(q), k_cells=8)
    exact = [(r.vec_id, r.cosine) for r in cosine_topk(vecs, q, k=10).collect()]
    exhaustive = [(r.vec_id, r.cosine) for r in
                  ivf_topk(vecs, q, cents, k=10, nprobe=len(cents)).collect()]
    assert exhaustive == exact
    exact_ids = {i for i, _ in exact}
    prev = -1.0
    for nprobe in (1, 2, 4, 8):
        got = {r.vec_id for r in
               ivf_topk(vecs, q, cents, k=10, nprobe=nprobe).collect()}
        recall = len(got & exact_ids) / len(exact_ids)
        assert recall >= prev
        prev = recall


def test_dedup_corpus_pipeline(spark):
    """End-to-end corpus dedup: exact groups collapse to min doc_id,
    near-dup CHAINS close transitively through connected components, and
    unique docs survive as their own canonical."""
    from knowledgebase_processor_spark.operators.dedup import dedup_corpus
    base = "the quick brown fox jumps over the lazy dog " * 8
    rows = [
        ("e1", base), ("e2", base), ("e3", base),          # exact group
        ("n1", base + "alpha"), ("n2", base + "beta"),     # near dups of e*
        ("u1", "completely different text " + " ".join(f"w{i}" for i in range(40))),
    ]
    out = {r.doc_id: (r.canonical_id, r.reason)
           for r in dedup_corpus(spark.createDataFrame(rows, "doc_id string, text string"),
                                 num_hashes=16, bands=8,
                                 jaccard_threshold=0.5).collect()}
    assert len(out) == 6
    # one canonical for the whole exact+near cluster, the min id "e1"
    assert out["e1"] == ("e1", "kept")
    assert out["e2"] == ("e1", "exact") and out["e3"] == ("e1", "exact")
    assert out["n1"][0] == "e1" and out["n1"][1] == "near"
    assert out["n2"][0] == "e1" and out["n2"][1] == "near"
    assert out["u1"] == ("u1", "kept")
    keep = [d for d, (c, _) in out.items() if d == c]
    assert sorted(keep) == ["e1", "u1"]


def test_winnowed_fingerprints_linear_on_big_doc(spark):
    """Round-1 bug class (quadratic kernels on multi-MB docs) applied to
    the new operator: the substr(t, i, k) form re-scanned the string from
    byte 0 per position (O(n^2), 85s at 200k chars); the char-array slice
    form must fingerprint a 10MB doc (capped at 1M chars) in seconds."""
    import time

    from knowledgebase_processor_spark.operators.dedup import (
        winnowed_fingerprints)
    big = spark.createDataFrame([("b", "lorem ipsum dolor " * 600_000)],
                                "doc_id string, text string")
    t0 = time.perf_counter()
    n = winnowed_fingerprints(big).count()
    dt = time.perf_counter() - t0
    assert n > 0
    assert dt < 60, f"10MB winnowing took {dt:.0f}s — quadratic regression?"


def test_winnow_overlap_pairs_containment(spark):
    """A document that is a contiguous substring of another shares ALL its
    winnowed fingerprints (its hash array is a slice of the host's, so its
    windows are a subset of the host's windows): containment must be
    exactly 1.0.  A disjoint-alphabet document shares no 8-char run with
    either, so it must produce no pair at all."""
    from knowledgebase_processor_spark.operators.dedup import (
        winnow_overlap_pairs)
    base = ("the quick brown fox jumps over the lazy dog and runs far "
            "away into the deep dark woods tonight without any warning")
    docs = spark.createDataFrame(
        [("A", base),
         ("B", base[12:72]),                       # exact substring of A
         ("C", "zzzz qqqq ffff gggg hhhh kkkk vvvv xxxx jjjj wwww")],
        "doc_id string, text string")
    out = {(r.doc_a, r.doc_b): r
           for r in winnow_overlap_pairs(docs, min_shared=1).collect()}
    assert ("A", "B") in out
    assert out[("A", "B")].containment == 1.0
    assert not any("C" in k for k in out)


def test_winnow_overlap_pairs_megabucket_guard(spark):
    """A fingerprint shared by more than max_bucket documents is
    boilerplate: its bucket must be dropped whole (no pair explosion),
    same guard as the MinHash LSH path."""
    from knowledgebase_processor_spark.operators.dedup import (
        winnow_overlap_pairs)
    rows = [(f"d{i}", "identical boilerplate navigation chrome sentence")
            for i in range(6)]
    docs = spark.createDataFrame(rows, "doc_id string, text string")
    # every bucket holds all 6 docs: oversized at max_bucket=3 -> zero pairs
    assert winnow_overlap_pairs(docs, max_bucket=3).count() == 0
    # at max_bucket=10 the same corpus yields all 15 identical-pair rows
    full = winnow_overlap_pairs(docs, max_bucket=10).collect()
    assert len(full) == 15
    assert all(r.containment == 1.0 for r in full)


def test_dedup_incremental_against_index(spark):
    """Incremental dedup probes a stored lsh_index without corpus text:
    an exact re-crawl scores 1.0, a light edit clears the threshold, a
    novel page is absent; the argmax dup_of is deterministic."""
    from knowledgebase_processor_spark.operators.dedup import (
        dedup_incremental, lsh_index)
    base = ("the quick brown fox jumps over the lazy dog while the rain "
            "falls softly on the quiet gray town all through the night")
    corpus = spark.createDataFrame(
        [("c1", base),
         ("c2", "completely different page about spark shuffles and "
                "partition pruning strategies for columnar scans"),
         ("c3", "third page with its own unrelated content on audio "
                "codecs and raster decoding in pure python")],
        "doc_id string, text string")
    idx = lsh_index(corpus)
    new = spark.createDataFrame(
        [("n1", base),                              # exact re-crawl of c1
         ("n2", base.replace("gray", "grey")),      # near-dup of c1
         ("n3", "a genuinely novel page never seen before about "
                "watermarked streaming joins and state stores")],
        "doc_id string, text string")
    out = {r.doc_id: r for r in dedup_incremental(new, idx, threshold=0.5)
           .collect()}
    assert out["n1"].dup_of == "c1" and out["n1"].est_jaccard == 1.0
    assert out["n2"].dup_of == "c1" and out["n2"].est_jaccard >= 0.5
    assert "n3" not in out


def test_lsh_index_megabucket_guard_at_build(spark):
    """Boilerplate buckets are dropped when the index is BUILT, so a
    probe batch joining a boilerplate page finds no candidates instead
    of exploding."""
    from knowledgebase_processor_spark.operators.dedup import (
        dedup_incremental, lsh_index)
    boiler = "identical navigation chrome footer sentence for every page"
    corpus = spark.createDataFrame([(f"c{i}", boiler) for i in range(8)],
                                   "doc_id string, text string")
    idx = lsh_index(corpus, max_bucket=4)
    assert idx.count() == 0            # every bucket oversized -> dropped
    new = spark.createDataFrame([("n1", boiler)], "doc_id string, text string")
    assert dedup_incremental(new, idx, max_bucket=4).count() == 0
    # under the cap the same corpus indexes and matches normally
    idx2 = lsh_index(corpus.limit(3), max_bucket=10)
    got = dedup_incremental(new, idx2, max_bucket=10).collect()
    assert len(got) == 1 and got[0].est_jaccard == 1.0
    assert got[0].dup_of == "c2"       # deterministic tie-break: max id


def test_transitive_closure_diamond_and_cycle(spark):
    from knowledgebase_processor_spark.operators.graph_query import (
        transitive_closure)
    # diamond a->b, a->c, b->d, c->d (+ tail d->e)
    edges = spark.createDataFrame(
        [("a", "b"), ("a", "c"), ("b", "d"), ("c", "d"), ("d", "e")],
        "src string, dst string")
    pairs = {(r["src"], r["dst"]) for r in transitive_closure(edges).collect()}
    assert pairs == {("a", "b"), ("a", "c"), ("a", "d"), ("a", "e"),
                     ("b", "d"), ("b", "e"), ("c", "d"), ("c", "e"),
                     ("d", "e")}
    # a cycle must terminate (pair space is finite), not loop forever
    cyc = spark.createDataFrame([("x", "y"), ("y", "z"), ("z", "x")],
                                "src string, dst string")
    got = {(r["src"], r["dst"]) for r in transitive_closure(cyc).collect()}
    assert got == {(a, b) for a in "xyz" for b in "xyz"}


def test_property_path_pairs_filters_pred_and_literals(spark):
    from knowledgebase_processor_spark.operators.graph_query import (
        property_path_pairs)
    t = spark.createDataFrame(
        [("u:a", "p:link", "u:b", True, None),
         ("u:b", "p:link", "u:c", True, None),
         ("u:b", "p:link", "lit", False, "xsd:string"),   # literal: no chain
         ("u:a", "p:other", "u:z", True, None)],          # other predicate
        "subj string, pred string, obj string, obj_is_uri boolean, "
        "obj_datatype string")
    pairs = {(r["src"], r["dst"])
             for r in property_path_pairs(t, "p:link").collect()}
    assert pairs == {("u:a", "u:b"), ("u:b", "u:c"), ("u:a", "u:c")}


def test_pagerank_matches_power_iteration(spark):
    """General graph (cycles, dangling node, multi-in-degree) vs an
    independent numpy power iteration with identical semantics."""
    import numpy as np
    from knowledgebase_processor_spark.operators.pagerank import pagerank
    edges = [(0, 1), (0, 2), (1, 2), (2, 0), (3, 2), (3, 2)]  # dup edge; 4=isolated sink via (2,4)? no - add dangling
    edges.append((1, 4))  # node 4 has no out-edges (dangling)
    df = spark.createDataFrame(edges, "src int, dst int")
    got = {r.node: r.rank for r in pagerank(df, iterations=12).collect()}

    n, d, iters = 5, 0.85, 12
    out = {0: [1, 2], 1: [2, 4], 2: [0], 3: [2]}
    r = {i: 1.0 / n for i in range(n)}
    for _ in range(iters):
        dang = sum(v for k, v in r.items() if k not in out)
        nxt = {i: (1 - d) / n + d * dang / n for i in range(n)}
        for s, ds in out.items():
            for t in ds:
                nxt[t] += d * r[s] / len(ds)
        r = nxt
    assert set(got) == set(r)
    for k in r:
        assert abs(got[k] - r[k]) < 1e-12, (k, got[k], r[k])
    assert abs(sum(got.values()) - 1.0) < 1e-9


def test_pagerank_empty_and_null_edges(spark):
    from knowledgebase_processor_spark.operators.pagerank import pagerank
    empty = spark.createDataFrame([], "src string, dst string")
    assert pagerank(empty).count() == 0
    nulls = spark.createDataFrame([("a", None), (None, "b"), ("a", "b")],
                                  "src string, dst string")
    got = {r.node: r.rank for r in pagerank(nulls, iterations=3).collect()}
    assert set(got) == {"a", "b"}


def test_sessionize_gap_splits(spark):
    import datetime as dt
    from knowledgebase_processor_spark.operators.sessions import sessionize
    t0 = dt.datetime(2024, 1, 1, 12, 0, 0)
    rows = [
        (1, 100, t0),                                   # u1 s1
        (1, 101, t0 + dt.timedelta(minutes=10)),        # u1 s1 (gap 10m)
        (1, 102, t0 + dt.timedelta(minutes=41)),        # u1 s2 (gap 31m)
        (2, 200, t0),                                   # u2 s1
        (2, 201, t0 + dt.timedelta(minutes=30)),        # u2 s1 (gap == 30m
        #   is absorbed — session_window merge semantics, strictly >)
    ]
    df = spark.createDataFrame(rows, "user_id int, event_id int, ts timestamp")
    got = {(r.user_id, r.session_id): (r.n_events, r.duration_us)
           for r in sessionize(df, gap_minutes=30).collect()}
    assert got == {(1, 1): (2, 600_000_000), (1, 2): (1, 0),
                   (2, 1): (2, 1_800_000_000)}


def test_sessionize_equals_session_window(spark):
    """The batch operator must agree with F.session_window on session
    membership — including gaps exactly at the threshold."""
    import datetime as dt
    from knowledgebase_processor_spark.operators.sessions import sessionize
    from knowledgebase_processor_spark.streaming.jobs import session_event_stats
    t0 = dt.datetime(2024, 3, 1)
    rows, eid = [], 0
    for u in range(6):
        t = t0
        for step_min in (0, 5, 30, 29, 31, 30, 1, 60, 0):
            t = t + dt.timedelta(minutes=(step_min + u) % 61)
            rows.append((u, eid, t)); eid += 1
    df = spark.createDataFrame(rows, "user_id int, event_id int, ts timestamp")
    batch = {(r.user_id, r.session_start, r.n_events)
             for r in sessionize(df, gap_minutes=30).collect()}
    sw = {(r.user_id, r.session_start, r.n_events)
          for r in session_event_stats(df, gap="30 minutes").collect()}
    assert batch == sw


def test_sessionize_tiebreak_deterministic(spark):
    import datetime as dt
    from knowledgebase_processor_spark.operators.sessions import sessionize
    t0 = dt.datetime(2024, 1, 1)
    rows = [(1, i, t0) for i in range(50)]  # 50 simultaneous events
    df = spark.createDataFrame(rows, "user_id int, event_id int, ts timestamp")
    out = sessionize(df.repartition(7), gap_minutes=1).collect()
    assert len(out) == 1 and out[0].n_events == 50 and out[0].session_id == 1


def test_tfidf_top_terms_ranks_rare_terms_first(spark):
    from knowledgebase_processor_spark.operators.keywords import tfidf_top_terms
    rows = [("a", "common rare common zebra"),
            ("b", "common common common"),
            ("c", "common plain")]
    df = spark.createDataFrame(rows, "doc_id string, text string")
    got = {(r.doc_id, r.rank): (r.term, r.tf, r.df) for r in
           tfidf_top_terms(df, k=2).collect()}
    # doc a: rare/zebra (df=1) beat common (tf=2 but df=3): 1*(3/1)=3 > 2*(3/3)=2
    assert got[("a", 1)] == ("rare", 1, 1)
    assert got[("a", 2)] == ("zebra", 1, 1)   # tie with rare -> term asc
    assert got[("b", 1)] == ("common", 3, 3)
    assert got[("c", 1)] == ("plain", 1, 1)


def test_tfidf_broadcast_vocab_same_result(spark):
    from knowledgebase_processor_spark.operators.keywords import tfidf_top_terms
    rows = [(str(i), f"w{i % 7} shared tail{i % 3}") for i in range(40)]
    df = spark.createDataFrame(rows, "doc_id string, text string")
    a = sorted(map(tuple, tfidf_top_terms(df, k=3).collect()))
    b = sorted(map(tuple, tfidf_top_terms(df, k=3,
                                          broadcast_vocab=True).collect()))
    assert a == b and len(a) == 120


def test_term_cooccurrence_lift_and_guards(spark):
    from knowledgebase_processor_spark.operators.cooccur import term_cooccurrence
    rows = [("a", "salt pepper bread"), ("b", "salt pepper water"),
            ("c", "salt pepper"), ("d", "bread water jam jam"),
            ("e", "filler filler"), ("f", "bread salt")]
    df = spark.createDataFrame(rows, "doc_id string, text string")
    out = {(r.term_a, r.term_b): r for r in
           term_cooccurrence(df, min_df=2, max_df_frac=1.0,
                             max_terms_per_doc=64,
                             min_pair_count=2).collect()}
    sp = out[("pepper", "salt")]
    # pepper df=3, salt df=4, together 3 times, N=6: lift = 3*6/(3*4)
    assert (sp.n_docs_both, sp.df_a, sp.df_b) == (3, 3, 4)
    assert abs(sp.lift - 1.5) < 1e-15
    # hapax (jam appears in 1 doc) and sub-threshold pairs are absent
    assert all("jam" not in k for k in out)
    assert ("bread", "water") not in out  # co-occur once < min_pair_count


def test_term_cooccurrence_head_doc_is_bounded(spark):
    """A pathological document with a huge vocabulary must not go
    quadratic: the per-doc cap bounds its pair fan-out."""
    from knowledgebase_processor_spark.operators.cooccur import term_cooccurrence
    big = " ".join(f"tok{i}" for i in range(5000))
    rows = [("big1", big), ("big2", big)]  # df=2 so terms survive min_df
    df = spark.createDataFrame(rows, "doc_id string, text string")
    out = term_cooccurrence(df, min_df=2, max_df_frac=1.0,
                            max_terms_per_doc=64, min_pair_count=2)
    assert out.count() == 64 * 63 // 2  # C(64,2), not C(5000,2)


def test_asof_join_backward_inclusive_and_tolerance(spark):
    import datetime as dt
    from knowledgebase_processor_spark.operators.asof import asof_join
    t = lambda m: dt.datetime(2024, 1, 1, 0, m)
    left = spark.createDataFrame(
        [(1, t(10), "p1"), (1, t(20), "p2"), (1, t(5), "p0"),
         (2, t(10), "p3"), (3, t(10), "p4")],
        "user_id int, ts timestamp, tag string")
    right = spark.createDataFrame(
        [(1, t(10), 100), (1, t(15), 150), (2, t(11), 200)],
        "user_id int, ts timestamp, snap int")
    got = {r.tag: (r.snap, r.ts_right and r.ts_right.minute)
           for r in asof_join(left, right, on="user_id", ts="ts").collect()}
    assert got["p1"] == (100, 10)     # equal ts matches (inclusive)
    assert got["p2"] == (150, 15)     # latest prior wins
    assert got["p0"] == (None, None)  # nothing at-or-before
    assert got["p3"] == (None, None)  # right row is AFTER left ts
    assert got["p4"] == (None, None)  # key never appears on right
    tol = {r.tag: r.snap for r in
           asof_join(left, right, on="user_id", ts="ts",
                     tolerance_us=3 * 60_000_000).collect()}
    assert tol["p1"] == 100           # 0 min old, within 3 min
    assert tol["p2"] is None          # 5 min old > 3 min tolerance


def test_asof_join_null_ts_rows(spark):
    import datetime as dt
    from knowledgebase_processor_spark.operators.asof import asof_join
    t0 = dt.datetime(2024, 1, 1)
    left = spark.createDataFrame([(1, None, "x"), (1, t0, "y")],
                                 "user_id int, ts timestamp, tag string")
    right = spark.createDataFrame([(1, None, 5), (1, t0, 7)],
                                  "user_id int, ts timestamp, snap int")
    got = {r.tag: r.snap for r in
           asof_join(left, right, on="user_id", ts="ts").collect()}
    assert got == {"x": None, "y": 7}  # null-ts right row never matches


def test_asof_join_null_field_does_not_mix_rows(spark):
    """The matched right row must arrive ATOMICALLY: when the latest
    right row carries a NULL in a value column, that NULL is the answer
    — a per-column forward-fill would resurrect the value from an OLDER
    right row (a row that never existed) and let it survive a tolerance
    it actually violates.  Regression for the round-2 review finding."""
    import datetime as dt
    from knowledgebase_processor_spark.operators.asof import asof_join
    t = lambda s: dt.datetime(2024, 1, 1, 0, 0, s)
    left = spark.createDataFrame([(1, t(10), "L")],
                                 "user_id int, ts timestamp, tag string")
    right = spark.createDataFrame(
        [(1, t(1), 7, "a"), (1, t(5), None, "b")],
        "user_id int, ts timestamp, val int, note string")
    row = asof_join(left, right, on="user_id", ts="ts").collect()[0]
    # latest right row is (t=5, val=NULL, note='b') — all three columns
    # must come from THAT row, not val=7 from the t=1 row
    assert (row.val, row.note, row.ts_right.second) == (None, "b", 5)
    # tolerance: the t=1 row is 9 s stale; with a 6 s tolerance the
    # match (t=5, 5 s old) survives and still reports val=NULL
    tol = asof_join(left, right, on="user_id", ts="ts",
                    tolerance_us=6_000_000).collect()[0]
    assert (tol.val, tol.note) == (None, "b")


def test_interval_join_grid_equals_naive(spark):
    """Grid-bucketized result must equal the naive BETWEEN join on a
    corpus with boundary hits, nested/overlapping intervals, cross-grid
    spans, and foreign keys."""
    import datetime as dt
    from knowledgebase_processor_spark.operators.rangejoin import interval_join
    t = lambda m: dt.datetime(2024, 1, 1) + dt.timedelta(minutes=m)
    pts = spark.createDataFrame(
        [(u, i, t(m)) for i, (u, m) in enumerate(
            [(1, 0), (1, 59), (1, 60), (1, 61), (1, 200), (2, 30), (3, 30)])],
        "user_id int, pid int, ts timestamp")
    ivs = spark.createDataFrame(
        [(1, 10, t(0), t(60)),      # boundary-inclusive both ends
         (1, 11, t(30), t(240)),    # spans multiple 1h grid cells
         (1, 12, t(50), t(55)),     # nested, no points
         (2, 20, t(0), t(29)),      # ends just before the point
         (4, 40, t(0), t(300))],    # key with no points
        "user_id int, iid int, s timestamp, e timestamp")
    matched, rejected = interval_join(pts, ivs, on="user_id", ts="ts",
                                      start="s", end="e")
    got = {(r.pid, r.iid) for r in matched.collect()}
    naive = {(p.pid, i.iid)
             for p in pts.collect() for i in ivs.collect()
             if p.user_id == i.user_id and i.s <= p.ts <= i.e}
    assert got == naive and len(got) == 7
    assert rejected.count() == 0


def test_interval_join_mega_interval_guard(spark):
    import datetime as dt
    from knowledgebase_processor_spark.operators.rangejoin import interval_join
    t0 = dt.datetime(2024, 1, 1)
    pts = spark.createDataFrame([(1, 1, t0)], "user_id int, pid int, ts timestamp")
    ivs = spark.createDataFrame(
        [(1, 10, t0, t0 + dt.timedelta(days=4000)),  # ~96k hourly cells
         (1, 11, t0, t0 + dt.timedelta(hours=1))],
        "user_id int, iid int, s timestamp, e timestamp")
    matched, rejected = interval_join(pts, ivs, on="user_id", ts="ts",
                                      start="s", end="e")
    assert [r.iid for r in rejected.collect()] == [10]
    assert {r.iid for r in matched.collect()} == {11}


def test_hypertable_rollup_partials_equal_direct(spark):
    """The continuous-aggregate invariant: every coarser level built
    from partials equals direct aggregation of raw."""
    import datetime as dt
    from knowledgebase_processor_spark.operators.rollup import hypertable_rollup
    t0 = dt.datetime(2024, 1, 1, 22, 58)
    rows = []
    for i in range(200):  # crosses minute, hour, AND day boundaries
        rows.append((t0 + dt.timedelta(minutes=i), "a" if i % 3 else "b",
                     float((i * 7) % 13)))
    df = spark.createDataFrame(rows, "ts timestamp, event_type string, value double")
    got = hypertable_rollup(df).collect()
    by_level = {}
    for r in got:
        by_level.setdefault(r.level, {})[(r.bucket_start, r.event_type)] = \
            (r.n_events, r.min_value, r.max_value)
    import collections
    for lvl, trunc in (("minute", "minute"), ("hour", "hour"), ("day", "day")):
        direct = collections.defaultdict(lambda: [0, None, None])
        for ts, et, v in rows:
            if trunc == "minute":
                b = ts.replace(second=0, microsecond=0)
            elif trunc == "hour":
                b = ts.replace(minute=0, second=0, microsecond=0)
            else:
                b = ts.replace(hour=0, minute=0, second=0, microsecond=0)
            d = direct[(b, et)]
            d[0] += 1
            d[1] = v if d[1] is None else min(d[1], v)
            d[2] = v if d[2] is None else max(d[2], v)
        assert by_level[lvl] == {k: tuple(v) for k, v in direct.items()}, lvl


def test_asof_join_hot_key_linear_one_exchange(spark):
    """A bot user with 60k left + 60k right rows must stream through the
    forward-fill window (running frame, O(cols) state) — and the plan
    must contain exactly ONE hash exchange on the key (plus none from a
    range join's fallback nested loop)."""
    import time
    from pyspark.sql import functions as F
    from knowledgebase_processor_spark.operators.asof import asof_join
    left = spark.range(60_000).select(
        F.lit(7).alias("user_id"),
        F.timestamp_seconds(F.lit(1_700_000_000) + F.col("id") * 2).alias("ts"),
        F.col("id").alias("pid"))
    right = spark.range(60_000).select(
        F.lit(7).alias("user_id"),
        F.timestamp_seconds(F.lit(1_700_000_000) + F.col("id") * 2 + 1).alias("ts"),
        F.col("id").alias("snap"))
    out = asof_join(left, right, on="user_id", ts="ts")
    t0 = time.perf_counter()
    n = out.count()
    dt = time.perf_counter() - t0
    assert n == 60_000 and dt < 60, dt
    # pid p matches snap p-1 (right at +1s sorts after left's same-id ts)
    sample = {r.pid: r.snap for r in out.filter(F.col("pid").isin(0, 1, 59_999)).collect()}
    assert sample == {0: None, 1: 0, 59_999: 59_998}
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert plan.count("hashpartitioning(user_id") == 1
    assert "NestedLoop" not in plan and "CartesianProduct" not in plan


def test_hash_split_deterministic_and_proportional(spark):
    from pyspark.sql import functions as F
    from knowledgebase_processor_spark.operators.split import hash_split
    df = spark.range(20_000).select(F.col("id").alias("doc_id"))
    a = hash_split(df, weights={"train": 0.8, "val": 0.1, "test": 0.1})
    counts = {r.split: r.n for r in
              a.groupBy("split").agg(F.count("*").alias("n")).collect()}
    assert set(counts) == {"train", "val", "test"}
    assert abs(counts["train"] / 20_000 - 0.8) < 0.01
    assert abs(counts["val"] / 20_000 - 0.1) < 0.01
    # rerun + repartition -> identical assignment (pure function of key)
    b = hash_split(df.repartition(13),
                   weights={"train": 0.8, "val": 0.1, "test": 0.1})
    assert (a.select("doc_id", "split").exceptAll(
        b.select("doc_id", "split")).count() == 0)
    # different salt -> a different (but still complete) split
    c = hash_split(df, weights={"train": 0.8, "val": 0.1, "test": 0.1},
                   salt="other")
    moved = (a.alias("a").join(c.alias("c"), "doc_id")
             .filter(F.col("a.split") != F.col("c.split")).count())
    assert moved > 1000


def test_asof_and_interval_join_randomized_vs_naive(spark):
    """300 seeded random keys x ~20 timestamps each, duplicates and
    boundary collisions included, run ONCE through both join operators
    and compared against naive Python references."""
    import datetime as dt
    import random
    from knowledgebase_processor_spark.operators.asof import asof_join
    from knowledgebase_processor_spark.operators.rangejoin import interval_join
    rnd = random.Random(42)
    t0 = dt.datetime(2024, 6, 1)
    lrows, rrows, ivrows = [], [], []
    pid = iid = sid = 0
    for k in range(300):
        # coarse grid (minutes 0..120 step 7) forces equal-ts collisions
        for _ in range(rnd.randint(0, 8)):
            lrows.append((k, pid, t0 + dt.timedelta(minutes=7 * rnd.randint(0, 17)))); pid += 1
        seen = set()
        for _ in range(rnd.randint(0, 8)):
            m = 7 * rnd.randint(0, 17)
            if m in seen:  # keep right unique per (key, ts): the contract
                continue
            seen.add(m)
            rrows.append((k, sid, t0 + dt.timedelta(minutes=m))); sid += 1
        for _ in range(rnd.randint(0, 3)):
            a = 7 * rnd.randint(0, 17); b = a + rnd.randint(0, 200)
            ivrows.append((k, iid, t0 + dt.timedelta(minutes=a),
                           t0 + dt.timedelta(minutes=b))); iid += 1
    left = spark.createDataFrame(lrows, "k int, pid int, ts timestamp")
    right = spark.createDataFrame(rrows, "k int, sid int, ts timestamp")
    ivs = spark.createDataFrame(ivrows, "k int, iid int, s timestamp, e timestamp")

    got_asof = {r.pid: r.sid for r in
                asof_join(left, right, on="k", ts="ts").collect()}
    by_key = {}
    for k, sid_, ts in rrows:
        by_key.setdefault(k, []).append((ts, sid_))
    exp_asof = {}
    for k, pid_, ts in lrows:
        cands = [(t, s) for (t, s) in by_key.get(k, []) if t <= ts]
        exp_asof[pid_] = max(cands)[1] if cands else None
    assert got_asof == exp_asof

    matched, rejected = interval_join(left, ivs, on="k", ts="ts",
                                      start="s", end="e")
    got_iv = {(r.pid, r.iid) for r in matched.collect()}
    exp_iv = {(p, i) for (k, p, ts) in lrows for (k2, i, s, e) in ivrows
              if k == k2 and s <= ts <= e}
    assert got_iv == exp_iv
    assert rejected.count() == 0


def test_triangle_count_known_graphs(spark):
    from knowledgebase_processor_spark.operators.triangles import triangle_count
    # K4: 4 triangles, every node in exactly 3
    k4 = [(a, b) for a in range(4) for b in range(4) if a < b]
    got = {r.node: r.n_triangles for r in triangle_count(
        spark.createDataFrame(k4, "src int, dst int")).collect()}
    assert got == {0: 3, 1: 3, 2: 3, 3: 3}
    # star hub: zero triangles regardless of degree; dup/reversed/self
    # edges must not create phantom triangles
    star = [(0, i) for i in range(1, 50)] + [(i, 0) for i in range(1, 50)]
    star += [(7, 7), (0, 1), (1, 0)]
    assert triangle_count(
        spark.createDataFrame(star, "src int, dst int")).count() == 0
    # triangle + pendant edge
    g = [(1, 2), (2, 3), (3, 1), (3, 4)]
    got = {r.node: r.n_triangles for r in triangle_count(
        spark.createDataFrame(g, "src int, dst int")).collect()}
    assert got == {1: 1, 2: 1, 3: 1}


def test_triangle_count_matches_brute_force_random(spark):
    import itertools
    import random
    from knowledgebase_processor_spark.operators.triangles import triangle_count
    rnd = random.Random(11)
    nodes = list(range(40))
    edges = [(a, b) for a in nodes for b in nodes
             if a < b and rnd.random() < 0.15]
    und = set(edges)
    expected = {}
    for a, b, c in itertools.combinations(nodes, 3):
        if (a, b) in und and (b, c) in und and (a, c) in und:
            for n in (a, b, c):
                expected[n] = expected.get(n, 0) + 1
    got = {r.node: r.n_triangles for r in triangle_count(
        spark.createDataFrame(edges, "src int, dst int")).collect()}
    assert got == expected


def test_bigram_coverage_scores(spark):
    from knowledgebase_processor_spark.operators.lm_score import bigram_coverage
    fluent = "the quick brown fox jumps"            # bigrams shared 3x
    rows = [("a", fluent), ("b", fluent), ("c", fluent),
            ("d", "zxqj vwpk mmtr unique gibberish"),   # all bigrams unique
            ("e", "the quick zzz yyy"),              # 1 of 3 bigrams common
            ("f", "single"), ("g", ""), ("h", None)]
    df = spark.createDataFrame(rows, "doc_id string, text string")
    got = {r.doc_id: (r.n_bigrams, r.n_common, r.coverage)
           for r in bigram_coverage(df, min_count=3).collect()}
    assert got["a"] == (4, 4, 1.0) == got["b"] == got["c"]
    assert got["d"] == (4, 0, 0.0)
    assert got["e"] == (3, 1, 1 / 3)
    assert got["f"] == (0, 0, None)
    assert got["g"] == (0, 0, None)
    assert got["h"] == (0, 0, None)


def test_snapshot_delta_statuses(spark):
    from knowledgebase_processor_spark.operators.delta import snapshot_delta
    old = spark.createDataFrame(
        [("a", "same text"), ("b", "will change"), ("c", "to be removed"),
         ("d", "Spaced   Out")],
        "doc_id string, text string")
    new = spark.createDataFrame(
        [("a", "same text"), ("b", "now different"), ("e", "brand new"),
         ("d", "  spaced out ")],   # whitespace/case only -> unchanged
        "doc_id string, text string")
    got = {r.doc_id: r.status for r in snapshot_delta(old, new).collect()}
    assert got == {"a": "unchanged", "b": "changed", "c": "removed",
                   "d": "unchanged", "e": "added"}
