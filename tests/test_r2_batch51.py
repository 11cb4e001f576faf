"""Batch-51 round-2: cross-source quote mining (operators/quotes.py)."""

from knowledgebase_processor_spark.operators.quotes import quote_pairs


def _df(spark, rows):
    return spark.createDataFrame(
        rows, "doc_id long, source string, ts long, text string")


PHRASE = "one two three four five six seven eight"  # exactly 8 words


def test_quote_attributed_to_earlier_doc(spark):
    rows = [(1, "sa", 10, f"intro {PHRASE} outro-a extra words here"),
            (2, "sb", 20, f"start {PHRASE} ending-b more words too")]
    df = _df(spark, rows)
    got = quote_pairs(df, source_col="source", ts_col="ts",
                      min_shared=1).collect()
    assert [(r.src_doc, r.quoting_doc, r.n_shared) for r in got] == \
        [(1, 2, 1)]


def test_quote_same_source_excluded(spark):
    rows = [(1, "s", 10, f"a {PHRASE} b"),
            (2, "s", 20, f"c {PHRASE} d")]
    assert quote_pairs(_df(spark, rows), source_col="source",
                       ts_col="ts", min_shared=1).collect() == []


def test_quote_template_bucket_guard(spark):
    # the phrase appears in 30 docs -> gram bucket 30 > max_bucket 10
    rows = [(i, f"s{i % 5}", i, f"x{i} {PHRASE} y{i}")
            for i in range(30)]
    got = quote_pairs(_df(spark, rows), source_col="source",
                      ts_col="ts", max_bucket=10,
                      min_shared=1).collect()
    assert got == []
    # with the guard open the cross-source pairs appear
    full = quote_pairs(_df(spark, rows), source_col="source",
                       ts_col="ts", max_bucket=1000,
                       min_shared=1).collect()
    assert len(full) > 0


def test_quote_tie_break_by_id_on_equal_ts(spark):
    rows = [(5, "sa", 10, f"k {PHRASE} m"),
            (3, "sb", 10, f"n {PHRASE} o")]
    got = quote_pairs(_df(spark, rows), source_col="source",
                      ts_col="ts", min_shared=1).collect()[0]
    assert (got.src_doc, got.quoting_doc) == (3, 5)


def test_quote_short_docs_no_grams(spark):
    rows = [(1, "sa", 1, "only five words in here"),
            (2, "sb", 2, "only five words in here")]
    assert quote_pairs(_df(spark, rows), source_col="source",
                       ts_col="ts", min_shared=1).collect() == []
