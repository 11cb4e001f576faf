"""Round-5 batch 1: LM-family id contract (any id type), KN rung
projection, and prepare_corpus opt-in stage hardening.

Round-4 VERDICT item 1 / ADVICE: the trained-LM family keyed its
train/held split and the prepare_corpus bucket-assign join on
``cast(doc_id as long)``, so a string/url-keyed corpus silently lost
every row.  The split is now ``nglm._split_bucket`` — try_cast-first
(numeric ids keep the historical ``% train_mod`` membership) with a
salted-md5 fallback (operators/split.py idiom) — and every join keeps
the id's ORIGINAL type.
"""

import pytest
from pyspark.sql import functions as F

from knowledgebase_processor_spark.operators.nglm import (
    backoff_lm_report, kneser_ney_n_report, kn_rung_sqls,
    kn_token_nano_from_rung, kn_token_nano_sql_n, ppl_bucket_assign)
from knowledgebase_processor_spark.operators.prepare import prepare_corpus


def _sentences(i: int) -> str:
    # distinct per-doc fluency so ntile never depends on the id-type
    # tiebreak: doc i repeats a common phrase i times plus i unique rare
    # words -> strictly distinct perplexities across the corpus
    common = "the quick brown fox jumps over the lazy dog . "
    rare = " ".join(f"zq{i}x{k}" for k in range(i + 1))
    return common * (i + 2) + rare


@pytest.fixture(scope="module")
def int_docs(spark):
    return spark.createDataFrame(
        [(i, _sentences(i)) for i in range(30)],
        "doc_id long, text string").cache()


def test_lm_string_ids_match_int_ids(spark, int_docs):
    """'7' and 7 land in the same split and score identically — the
    VERDICT done-criterion (string-keyed corpus == int-keyed twin)."""
    str_docs = int_docs.select(
        F.col("doc_id").cast("string").alias("doc_id"), "text")
    got_int = {(str(r["doc_id"]), r["n_tokens"], r["nll_nano"])
               for r in backoff_lm_report(int_docs).collect()}
    got_str = {(r["doc_id"], r["n_tokens"], r["nll_nano"])
               for r in backoff_lm_report(str_docs).collect()}
    assert got_int == got_str and got_int


def test_ppl_bucket_assign_string_ids_same_keepset(spark, int_docs):
    str_docs = int_docs.select(
        F.col("doc_id").cast("string").alias("doc_id"), "text")
    a = {(str(r["doc_id"]), r["bucket"])
         for r in ppl_bucket_assign(int_docs, buckets=3).collect()}
    b = {(r["doc_id"], r["bucket"])
         for r in ppl_bucket_assign(str_docs, buckets=3).collect()}
    assert a == b and len(a) == 30


def test_lm_url_ids_not_dropped(spark):
    """Non-numeric ids (the production `url string` schema) split via
    the salted-md5 fallback instead of silently dropping everything."""
    docs = spark.createDataFrame(
        [(f"https://example.com/page/{i}", _sentences(i))
         for i in range(40)],
        "doc_id string, text string")
    rep = backoff_lm_report(docs).collect()
    assert 0 < len(rep) < 40          # held-out split is a proper subset
    assert all(r["n_tokens"] > 0 for r in rep)
    assigned = ppl_bucket_assign(docs, buckets=3)
    assert assigned.count() == 40     # score-all shape: nothing dropped


def test_lm_null_id_dropped_not_fatal(spark):
    docs = spark.createDataFrame(
        [("a1", _sentences(1)), (None, _sentences(2)),
         ("a3", _sentences(3))],
        "doc_id string, text string")
    ids = {r["doc_id"] for r in ppl_bucket_assign(docs).collect()}
    assert None not in ids and ids <= {"a1", "a3"}


# Fluent-page generator (the proven test_r4 pattern): 8 DISTINCT
# sentence templates per page so no within-doc n-gram dominates
# (Gopher), one doc-unique token per sentence so cross-doc shingle
# Jaccard stays far under the 0.6 dedup threshold, templates shared
# ACROSS docs so the in-corpus LM finds their n-grams fluent.
_TEMPS = [
    "The {w} report covers central fields and results thoroughly.",
    "A detailed survey of the {w} region appeared in print today.",
    "Researchers described the {w} valley with careful attention.",
    "Local readers praised the {w} chronicle for balanced coverage.",
    "The council reviewed the {w} findings during an open session.",
    "Several experts compared the {w} data against annual records.",
    "A final summary placed the {w} results above expected ranges.",
    "The archive stored every {w} document beside old collections.",
]


def _fluent_page(i: int) -> str:
    return "\n".join(t.format(w=f"zone{i}{j}")
                     for j, t in enumerate(_TEMPS))


def test_prepare_corpus_lm_stage_url_ids(spark):
    """prepare_corpus(lm_head_buckets=...) on a url-keyed corpus keeps
    a non-empty head slice — the exact silent-zero-drop path ADVICE
    flagged (prepare.py joined survivors on cast-to-long)."""
    docs = spark.createDataFrame(
        [(f"https://ex.com/{i}", _fluent_page(i)) for i in range(1, 13)],
        "doc_id string, text string")
    out, stats = prepare_corpus(docs, lm_head_buckets=2, lm_buckets=3)
    st = {r["stage"]: r["n_docs"] for r in stats.collect()}
    assert st["lm_head_kept"] > 0
    assert st["lm_head_kept"] < st["quality_kept"]


def test_prepare_corpus_optin_stages_string_and_null_ids(spark):
    """Every opt-in stage (LM screen, span dedup, decontamination)
    operates on string ids with a NULL-id row present — no crash, no
    silent full drop."""
    rows = [(f"u{i}", _fluent_page(i)) for i in range(1, 13)]
    rows.append((None, _fluent_page(99)))
    docs = spark.createDataFrame(rows, "doc_id string, text string")
    bench = spark.createDataFrame(
        [("b1", "benchmark only phrase never in corpus")],
        "doc_id string, text string")
    out, stats = prepare_corpus(docs, lm_head_buckets=2,
                                span_dedup_n=12, benchmark=bench)
    st = {r["stage"]: r["n_docs"] for r in stats.collect()}
    assert st["lm_head_kept"] > 0
    assert st["scrubbed"] > 0


def test_kn_rung_chain_equals_flat_expansion(spark):
    """The rung-projection form (kn_rung_sqls) computes bit-identical
    values to the legacy flat expansion (kn_token_nano_sql_n) — the
    hoist changes plan size, never the float."""
    cols = ("pos int, c2 long, c1prev long, n1p_prev long, n1p_w long, "
            "t_big long, v_uni long, c3 long, ctx3 long, n1pctx3 long, "
            "c4 long, ctx4 long, n1pctx4 long")
    rows = [
        (0, 0, 0, 0, 2, 50, 20, 0, 0, 0, 0, 0, 0),
        (1, 3, 7, 4, 2, 50, 20, 0, 0, 0, 0, 0, 0),
        (2, 3, 7, 4, 2, 50, 20, 2, 5, 3, 0, 0, 0),
        (3, 3, 7, 4, 2, 50, 20, 2, 5, 3, 1, 2, 2),
        (3, 0, 7, 4, 2, 50, 20, 0, 5, 3, 0, 0, 0),
        (3, 1, 0, 0, 0, 50, 20, 0, 0, 0, 0, 0, 0),
    ]
    df = spark.createDataFrame(rows, cols)
    flat = df.selectExpr(f"{kn_token_nano_sql_n(4)} AS v").collect()
    rung = df
    for name, sql in kn_rung_sqls(4):
        rung = rung.withColumn(name, F.expr(sql))
    hoisted = rung.selectExpr(
        f"{kn_token_nano_from_rung(4)} AS v").collect()
    assert [r["v"] for r in flat] == [r["v"] for r in hoisted]


def test_kn_n5_plan_linear(spark, int_docs):
    """Plan contract for the order-n ladder (round-4 VERDICT item 2):
    each extra order adds EXACTLY three equi-joins (c_m probe, ctx_m
    probe, N1+ context probe), and the optimized plan grows linearly —
    the flat expansion doubled per order."""
    joins, sizes = {}, {}
    for n in (2, 3, 4, 5):
        plan = (kneser_ney_n_report(int_docs, n)
                ._jdf.queryExecution().optimizedPlan().toString())
        joins[n] = plan.count("Join")
        sizes[n] = len(plan)
    assert joins[3] - joins[2] == 3
    assert joins[4] - joins[3] == 3
    assert joins[5] - joins[4] == 3
    # linear, not doubling: each order's increment stays within 2x of
    # the first increment (the flat form's top-level text alone grew
    # 2^(n-2) bigram-rung copies)
    d1 = sizes[3] - sizes[2]
    assert sizes[5] - sizes[4] < 2 * d1
