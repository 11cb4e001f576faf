"""Gopher-style quality/repetition filters: differential vs a pure-Python
recompute, plus rule-level behavior on planted documents."""

import random
import re

import pytest


# --- pure-Python reference implementations (definitions, not the Spark
# expression tree — an independent recompute for the differential) -----------

def _py_words(text):
    return [w for w in re.split(r"[ \t\n\r\f]+", text.strip().lower()) if w]


def _py_units(text, sep):
    # edge-whitespace class matches the operator (space/tab/CR/FF only)
    return [u.strip(" \t\r\f") for u in re.split(sep, text) if u.strip(" \t\r\f")]


def _py_dup(units):
    seen, dups, dupchars = set(), 0, 0
    for u in sorted(units):
        if u in seen:
            dups += 1
            dupchars += len(u)
        seen.add(u)
    return dups, dupchars


def _py_top_ngram(words, n):
    grams = [" ".join(words[i:i + n]) for i in range(len(words) - n + 1)]
    if not grams:
        return 0, None
    counts = {}
    for g in grams:
        counts[g] = counts.get(g, 0) + 1
    # tie-break: max count, lexicographically smallest gram
    bestc = max(counts.values())
    bestg = min(g for g, c in counts.items() if c == bestc)
    return bestc, bestg


def _frac(num, den):
    return round(num / max(den, 1), 6)


def _py_repetition(text):
    lines = _py_units(text, r"\n")
    paras = _py_units(text, r"\n[ \t]*\n")
    words = _py_words(text)
    word_chars = sum(len(w) for w in words)
    ld, ldc = _py_dup(lines)
    pd, pdc = _py_dup(paras)
    out = {
        "n_lines": len(lines), "n_paras": len(paras),
        "dup_line_frac": _frac(ld, len(lines)),
        "dup_line_char_frac": _frac(ldc, sum(len(x) for x in lines)),
        "dup_para_frac": _frac(pd, len(paras)),
        "dup_para_char_frac": _frac(pdc, sum(len(x) for x in paras)),
    }
    for n in (2, 3, 4):
        cnt, gram = _py_top_ngram(words, n)
        cov = cnt * (len(gram) - (n - 1)) if gram else 0
        out[f"top_{n}gram_char_frac"] = _frac(cov, word_chars)
    return out


VOCAB = ["the", "data", "spark", "join", "merge", "row", "and", "of",
         "table", "quick", "#tag", "...", "a-b"]


def _fuzz_doc(rng):
    lines = []
    for _ in range(rng.randint(1, 12)):
        line = " ".join(rng.choice(VOCAB) for _ in range(rng.randint(0, 8)))
        lines.append(line)
        if rng.random() < 0.3:
            lines.append(line)          # planted duplicate line
        if rng.random() < 0.2:
            lines.append("")            # paragraph boundary
    return "\n".join(lines)


def test_repetition_stats_differential(spark):
    from knowledgebase_processor_spark.operators.quality import repetition_stats
    rng = random.Random(7)
    docs = [(str(i), _fuzz_doc(rng)) for i in range(30)]
    docs += [
        ("e1", ""), ("e2", "   \n \n "), ("e3", "one"),
        ("e4", "x y\nx y\nx y"), ("e5", "p\n\np\n\t\np"),
        ("e6", "a a a a a a"),
    ]
    df = spark.createDataFrame(docs, "doc_id string, text string")
    got = {r["doc_id"]: r.asDict() for r in repetition_stats(df).collect()}
    for doc_id, text in docs:
        exp = _py_repetition(text)
        g = got[doc_id]
        for k, v in exp.items():
            assert g[k] == pytest.approx(v, abs=1e-9), (doc_id, k, g[k], v, text)


def test_gopher_flags_planted(spark):
    from knowledgebase_processor_spark.operators.quality import (
        gopher_filter, gopher_quality_flags)
    good = ("the data pipeline reads the table and writes the merged rows "
            "for the report that it was built for in the first iteration "
            "and the second iteration of the scan phase with more words "
            "to clear the minimum threshold of fifty words in total here "
            "now that is plenty of words for the little check to pass")
    too_short = "the quick one"
    bullets = "\n".join(f"- item {i} of the listing" for i in range(20))
    dup_lines = "\n".join(["the same line of text appears here"] * 30)
    symbols = " ".join(["word"] * 60) + " " + " ".join(["#"] * 30)
    rows = [("good", good), ("short", too_short), ("bullets", bullets),
            ("dups", dup_lines), ("syms", symbols)]
    df = spark.createDataFrame(rows, "doc_id string, text string")
    flags = {r["doc_id"]: r.asDict() for r in gopher_quality_flags(df).collect()}

    assert flags["good"]["keep"] is True
    assert flags["short"]["ok_word_count"] is False
    assert flags["bullets"]["ok_bullet_lines"] is False
    assert flags["dups"]["ok_dup_lines"] is False
    assert flags["dups"]["ok_dup_line_chars"] is False
    assert flags["syms"]["ok_symbol_ratio"] is False
    for d in ("short", "bullets", "dups", "syms"):
        assert flags[d]["keep"] is False

    kept = [r["doc_id"] for r in gopher_filter(df).select("doc_id").collect()]
    assert kept == ["good"]


def test_gopher_plan_is_narrow(spark):
    """The whole flag evaluation must be one narrow projection — no
    Exchange in the plan (scale invariant: embarrassingly parallel)."""
    from knowledgebase_processor_spark.operators.quality import gopher_quality_flags
    df = spark.createDataFrame([("a", "x")], "doc_id string, text string")
    plan = gopher_quality_flags(df)._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan, plan


def test_c4_line_filter_planted(spark):
    from knowledgebase_processor_spark.operators.quality import c4_line_filter
    good = ("This is a proper sentence that survives the filter.\n"
            "Another good line ends with a question mark?\n"
            "And a third one right here makes three.\n"
            "no terminal punctuation on this line\n"
            "Uses javascript for menus.\n"
            "Too short.\n")
    rows = [("ok", good),
            ("brace", good + "code = {1}.\n"),
            ("lorem", good + "Lorem Ipsum dolor sit amet.\n"),
            ("thin", "Just the one surviving line right here.\n")]
    df = spark.createDataFrame(rows, "doc_id string, text string")
    out = {r["doc_id"]: r.asDict() for r in c4_line_filter(df).collect()}

    assert out["ok"]["n_lines_kept"] == 3 and out["ok"]["page_keep"] is True
    assert "javascript" not in out["ok"]["clean_text"]
    assert "no terminal" not in out["ok"]["clean_text"]
    assert "Too short." not in out["ok"]["clean_text"]
    assert out["brace"]["page_keep"] is False     # '{' on page
    assert out["lorem"]["page_keep"] is False     # lorem ipsum
    assert out["thin"]["n_lines_kept"] == 1 and out["thin"]["page_keep"] is False


def test_line_dedup_first_occurrence_wins(spark):
    from knowledgebase_processor_spark.operators.dedup import line_dedup
    boiler = "Subscribe to our newsletter today."
    rows = [(1, f"{boiler}\nunique one here\nab"),
            (2, f"another unique line\n{boiler}\nab"),
            (3, boiler)]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    for portable in (False, True):
        out = {r["doc_id"]: r.asDict()
               for r in line_dedup(df, portable=portable).collect()}
        # first occurrence (doc 1, pos 0) keeps the boilerplate line
        assert boiler in out[1]["text"]
        assert boiler not in out[2]["text"]
        # short line 'ab' is exempt from dedup, kept in both docs
        assert out[1]["text"].endswith("ab") and out[2]["text"].endswith("ab")
        assert out[1]["n_lines_kept"] == 3 and out[2]["n_lines_kept"] == 2
        # doc 3 was ONLY the boilerplate -> drops out entirely
        assert 3 not in out


def test_line_dedup_within_doc(spark):
    from knowledgebase_processor_spark.operators.dedup import line_dedup
    df = spark.createDataFrame(
        [(1, "repeated body line here\nmiddle text\nrepeated body line here")],
        "doc_id long, text string")
    out = line_dedup(df).collect()[0]
    assert out["n_lines_kept"] == 2
    assert out["text"] == "repeated body line here\nmiddle text"


def test_prepare_corpus_stage_semantics(spark):
    from knowledgebase_processor_spark.operators.prepare import prepare_corpus
    sent_a = ["The quick brown fox jumps over the lazy dog near the old barn.",
              "It then runs away into the forest and hides there for a while.",
              "Nobody in the village can find it for the rest of that day.",
              "The search party walks along the river bank until the light fades.",
              "In the morning the fox is seen again at the edge of the field.",
              "Children wave at it from the road and it watches them calmly."]
    sent_b = ["A completely different report describes the harvest in autumn.",
              "The farmers gather wheat and store it in the tall wooden silos.",
              "Markets in the town sell the grain through the winter months.",
              "Bread from the mill is carried to the city twice in a week.",
              "The price of flour stays steady because the stores are full.",
              "Everyone agrees that it was the best season in many years."]
    sent_c = ["This third page talks about sailing boats on the open water.",
              "The crew adjusts the sails whenever the wind starts shifting.",
              "Every voyage ends with the boat returning to the small harbor."]
    boiler = "Subscribe to our newsletter today and stay informed."
    rows = [
        ("a", "\n".join(sent_a + [boiler])),
        ("a2", "\n".join(sent_a + [boiler])),   # exact dup of a -> collapsed
        ("b", "\n".join(sent_b + [boiler]) + "\nMail me at who@example.com."),
        ("short", "tiny."),                     # fails C4 min-kept-lines
        ("brace", "\n".join(sent_c) + "\ncode = {x}."),  # fails C4 page rule
    ]
    docs = spark.createDataFrame(rows, "doc_id string, text string")
    out, stats = prepare_corpus(docs)
    s = {r["stage"]: r["n_docs"] for r in stats.collect()}
    assert s["input"] == 5
    assert s["deduped"] == 4                  # a2 collapsed into a
    assert s["line_cleaned"] == 2             # short+brace pages dropped
    assert s["quality_kept"] == 2
    texts = {r["doc_id"]: r["text"] for r in out.collect()}
    assert set(texts) == {"a", "b"}
    # boilerplate line survives only in its first occurrence ('a' < 'b')
    assert boiler in texts["a"] and boiler not in texts["b"]
    # PII scrubbed
    assert "who@example.com" not in texts["b"] and "<EMAIL>" in texts["b"]


def test_prepare_corpus_optin_stages(spark):
    """span_dedup_n + benchmark extend the chain (RefinedWeb/GPT-3
    shape) without touching the default stages."""
    from knowledgebase_processor_spark.operators.prepare import prepare_corpus
    span = "alpha beta gamma delta epsilon zeta eta theta iota kappa."
    leak = "The secret eval answer names zebra quagga okapi tapir gnu eland."
    pad_a = ["The quick brown fox jumps over the lazy dog near the old barn.",
             "It then runs away into the forest and hides there for a while.",
             "Nobody in the village can find it for the rest of that day.",
             "The search party walks along the river bank until the light fades.",
             "In the morning the fox is seen again at the edge of the field.",
             "Children wave at it from the road and it watches them calmly."]
    pad_b = ["A completely different report describes the harvest in autumn.",
             "The farmers gather wheat and store it in the tall wooden silos.",
             "Markets in the town sell the grain through the winter months.",
             "Bread from the mill is carried to the city twice in a week.",
             "The price of flour stays steady because the stores are full.",
             "Everyone agrees that it was the best season in many years."]
    pad_c = ["This third page talks about sailing boats on the open water.",
             "The crew adjusts the sails whenever the wind starts shifting.",
             "Every voyage ends with the boat returning to the small harbor.",
             "The lighthouse keeper logs each arrival in a heavy leather book.",
             "Fishermen trade their morning catch beside the wooden pier.",
             "At night the bay is quiet and the lanterns sway in the breeze."]
    rows = [
        ("a", "\n".join(pad_a + [f"Page a says {span}"])),
        ("b", "\n".join(pad_b + [f"Page b says {span}"])),
        ("c", "\n".join(pad_c + [leak])),
    ]
    docs = spark.createDataFrame(rows, "doc_id string, text string")
    bench = spark.createDataFrame([(leak,)], "text string")
    out, stats = prepare_corpus(docs, span_dedup_n=8, benchmark=bench)
    s = {r["stage"]: r["n_docs"] for r in stats.collect()}
    assert set(s) == {"input", "deduped", "line_cleaned", "quality_kept",
                      "line_deduped", "span_deduped", "decontaminated",
                      "scrubbed"}
    texts = {r["doc_id"]: r["text"] for r in out.collect()}
    # the shared 10-word span is cut from both carriers by ExactSubstr
    assert all("gamma" not in t for t in texts.values())
    # the leaked doc is dropped by strict decontamination
    assert "c" not in texts and s["decontaminated"] == s["span_deduped"] - 1


def test_pack_sequences_semantics(spark):
    from knowledgebase_processor_spark.operators.packing import (
        pack_sequences, packing_stats)
    # one bucket so the greedy scan order (string-sorted ids) is total
    rows = [("a", 300), ("b", 300), ("c", 500), ("d", 100), ("e", 9000)]
    df = spark.createDataFrame(rows, "doc_id string, n_tokens long")
    out = {r["doc_id"]: r.asDict()
           for r in pack_sequences(df, seq_len=512, buckets=1).collect()}
    # a(300) -> seq0 off0; b(300) overflows -> seq1 off0; c(500) -> seq2;
    # d(100) overflows 500+100 -> seq3; e(9000) truncated -> seq4
    assert (out["a"]["seq_id"], out["a"]["offset"]) == (0, 0)
    assert (out["b"]["seq_id"], out["b"]["offset"]) == (1, 0)
    assert (out["c"]["seq_id"], out["c"]["offset"]) == (2, 0)
    assert (out["d"]["seq_id"], out["d"]["offset"]) == (3, 0)
    assert out["e"]["seq_id"] == 4 and out["e"]["truncated"] is True
    # two small docs co-pack
    df2 = spark.createDataFrame([("a", 200), ("b", 200), ("c", 200)],
                                "doc_id string, n_tokens long")
    out2 = {r["doc_id"]: r.asDict()
            for r in pack_sequences(df2, seq_len=512, buckets=1).collect()}
    assert (out2["a"]["seq_id"], out2["a"]["offset"]) == (0, 0)
    assert (out2["b"]["seq_id"], out2["b"]["offset"]) == (0, 200)
    assert (out2["c"]["seq_id"], out2["c"]["offset"]) == (1, 0)
    st = packing_stats(pack_sequences(df2, seq_len=512, buckets=1),
                       seq_len=512).collect()[0]
    assert st["n_sequences"] == 2 and st["n_docs"] == 3
    assert st["fill_ratio"] == round(600 / 1024, 6)


def test_pack_sequences_partition_invariant(spark):
    from knowledgebase_processor_spark.operators.packing import pack_sequences
    rows = [(str(i), 50 + (i * 37) % 400) for i in range(200)]
    df = spark.createDataFrame(rows, "doc_id string, n_tokens long")
    a = sorted(map(tuple, pack_sequences(df, seq_len=512, buckets=8)
                   .collect()))
    b = sorted(map(tuple, pack_sequences(df.repartition(13), seq_len=512,
                                         buckets=8).collect()))
    assert a == b


def test_quality_ops_linear_on_huge_docs(spark):
    """Crawl-scale pages must not blow up the sorted-array folds: a ~3MB
    page with 500k words / 100k lines through the full Gopher evaluation,
    C4 cleaning, and packing tokenization in bounded time (the regression
    class this guards against is quadratic, i.e. minutes-to-hours)."""
    import time
    from knowledgebase_processor_spark.operators.quality import (
        c4_line_filter, gopher_quality_flags)
    big_line = "the quick brown fox jumps over the lazy dog today. "
    # ~2.5MB / 10k duplicate lines: ~20s healthy, MINUTES if quadratic —
    # sized so host-freeze noise + a concurrently running suite can't
    # push a healthy run over the bound (it did at 20k lines).
    huge = "\n".join([big_line * 5] * 10_000)
    df = spark.createDataFrame([("h", huge)], "doc_id string, text string")
    t0 = time.perf_counter()
    flags = gopher_quality_flags(df).collect()[0]
    c4 = c4_line_filter(df).collect()[0]
    dt = time.perf_counter() - t0
    assert flags["ok_dup_lines"] is False            # all lines identical
    assert c4["n_lines_kept"] == 10_000
    assert dt < 120, f"huge-doc quality pass took {dt:.0f}s"
