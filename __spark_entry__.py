"""Driver contract for the spark-graft builder (PySpark target).

``entry(spark)`` runs the flagship KG-construction pipeline on sf0.001;
``queries()`` exposes one entry per implemented operator family from
SURVEY.md §2 plus the training-data operators (dedup, similarity, text
analysis); ``oracle_sql()`` gives the DuckDB-equivalent SQL for every
SQL-expressible query (same aliases, same rounding, decimal-exact sums).

Non-SQL-expressible entries (the KG pipeline itself, MinHash/SimHash whose
hash functions are engine-specific) intentionally omit oracles — the
driver records rows-only checks for them.
"""

from __future__ import annotations

import os
import sys
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession, functions as F

_REPO = os.path.dirname(os.path.abspath(__file__))
sys.path.insert(0, _REPO)

# Executor workers must import this package + vendored markdown-it.  When
# the harness imports this module BEFORE creating its SparkSession (the
# normal flow), exporting PYTHONPATH here covers local-mode workers; on a
# real cluster ship the same dirs via spark-submit --py-files.
_parts = [_REPO, os.path.join(_REPO, "vendor")]
_existing = os.environ.get("PYTHONPATH", "")
_missing = [p for p in _parts if p not in _existing.split(os.pathsep)]
if _missing:
    os.environ["PYTHONPATH"] = os.pathsep.join(
        _missing + ([_existing] if _existing else []))

SF001 = "/root/testdata/sf0.001"


_SPLITS_CACHE: dict[str, int] = {}


def _parquet_splits(path: str) -> int:
    """Row-group count from the parquet footers (driver-local, ~ms).

    This is the scan's real max parallelism: Spark splits parquet by byte
    range but a row group is read whole by one task.  (Do NOT probe via
    df.rdd.getNumPartitions() — materializing the .rdd costs seconds.)
    """
    if path not in _SPLITS_CACHE:
        import pyarrow.parquet as pq
        files = ([path] if os.path.isfile(path) else
                 [os.path.join(path, f) for f in os.listdir(path)
                  if f.endswith(".parquet")])
        _SPLITS_CACHE[path] = sum(
            pq.ParquetFile(f).metadata.num_row_groups for f in files)
    return _SPLITS_CACHE[path]


def _t(spark: SparkSession, sf_dir: str, name: str,
       spread: bool = False) -> DataFrame:
    """Read a testdata table; `spread=True` for queries whose map-side work
    (extraction UDFs, shingle explodes) dominates.

    The test parquet ships as ONE row group, so the scan is one task and
    map-side work single-threads no matter the cluster size.  Spreading
    repartitions to the cluster's slot count when the scan has fewer
    splits; at production scale the table has thousands of row groups and
    the gate makes it a no-op.  Explicit numPartitions so AQE does not
    coalesce the tiny exchange back down to one partition.  Kept opt-in:
    for cheap scans the extra exchange costs more than it buys.
    """
    path = f"{sf_dir}/{name}.parquet"
    df = spark.read.parquet(path)
    slots = spark.sparkContext.defaultParallelism
    if spread and _parquet_splits(path) < slots:
        df = df.repartition(slots)
    return df


# ---------------------------------------------------------------------------
# flagship: documents -> KG triples, counted per entity kind
# ---------------------------------------------------------------------------

def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on sf0.001: full extraction -> triple emission ->
    dedup -> triples per entity class."""
    from knowledgebase_processor_spark.pipeline import documents_to_triples

    docs = _t(spark, SF001, "documents").select(
        F.concat(F.lit("corpus/doc-"), F.col("doc_id").cast("string")).alias("doc_id"),
        "text")
    triples = documents_to_triples(docs, resolve_links=True)
    return (triples.groupBy("pred")
            .agg(F.count("*").alias("n_triples"),
                 F.countDistinct("subj").alias("n_subjects"))
            .orderBy("pred"))


# ---------------------------------------------------------------------------
# queries
# ---------------------------------------------------------------------------

def _q01_pricing_summary(spark, sf):
    # A-family aggregations (SURVEY §2.4): TPC-H-Q1-shaped partial+final agg.
    li = _t(spark, sf, "lineitem").filter(F.col("l_shipdate") <= F.lit("1998-09-02"))
    return (li.groupBy("l_returnflag", "l_linestatus")
            .agg(F.sum(F.col("l_quantity").cast("decimal(18,2)")).cast("double").alias("sum_qty"),
                 F.sum(F.col("l_extendedprice").cast("decimal(18,2)")).cast("double").alias("sum_base_price"),
                 F.count("*").alias("count_order"))
            .orderBy("l_returnflag", "l_linestatus"))


def _q02_top_customers(spark, sf):
    # O2 top-k (orderBy+limit) over a join (J5-shape).
    o, c = _t(spark, sf, "orders"), _t(spark, sf, "customer")
    return (o.join(c, o.o_custkey == c.c_custkey)
            .groupBy("c_custkey", "c_name")
            .agg(F.sum(F.col("o_totalprice").cast("decimal(18,2)")).cast("double").alias("revenue"),
                 F.count("*").alias("n_orders"))
            .orderBy(F.desc("revenue"), F.asc("c_custkey"))
            .limit(10))


def _q03_orders_by_nation(spark, sf):
    # J5 multi-join reassembly: customer -> nation -> orders.
    o, c, n = _t(spark, sf, "orders"), _t(spark, sf, "customer"), _t(spark, sf, "nation")
    return (o.join(c, o.o_custkey == c.c_custkey)
            .join(F.broadcast(n), c.c_nationkey == n.n_nationkey)
            .groupBy("n_name")
            .agg(F.count("*").alias("n_orders"),
                 F.sum(F.col("o_totalprice").cast("decimal(18,2)")).cast("double").alias("total_revenue"))
            .orderBy("n_name"))


def _q04_region_nations(spark, sf):
    # J4-shape broadcast dimension join + group count.
    n, r = _t(spark, sf, "nation"), _t(spark, sf, "region")
    return (n.join(F.broadcast(r), n.n_regionkey == r.r_regionkey)
            .groupBy("r_name").agg(F.count("*").alias("n_nations"))
            .orderBy("r_name"))


def _q05_search(spark, sf):
    # Q1 search: substring filter + deterministic top-20 (O2).
    d = _t(spark, sf, "documents")
    return (d.filter(F.col("text").contains("query"))
            .select("doc_id", "n_chars")
            .orderBy("doc_id").limit(20))


def _q06_find_by_tag(spark, sf):
    # Q2/J4 find-by-tag: word-token containment, counted per source.
    d = _t(spark, sf, "documents")
    words = d.select("doc_id", "source",
                     F.explode(F.split(F.col("text"), " ")).alias("w"))
    return (words.filter(F.col("w") == "spark")
            .groupBy("source")
            .agg(F.countDistinct("doc_id").alias("n_docs"))
            .orderBy("source"))


def _q07_find_by_topic(spark, sf):
    # Q3/E11 topic filter: lower/underscore normalization.
    from knowledgebase_processor_spark.functions.text import topic
    d = _t(spark, sf, "documents")
    return (d.select(topic(F.col("source")).alias("topic"))
            .groupBy("topic").agg(F.count("*").alias("n_docs"))
            .orderBy("topic"))


def _q08_related_by_shared_key(spark, sf):
    # J6 shared-key self-join: event-type pairs co-occurring per user.
    e = _t(spark, sf, "events").select("user_id", "event_type").distinct()
    a, b = e.alias("a"), e.alias("b")
    return (a.join(b, (F.col("a.user_id") == F.col("b.user_id"))
                   & (F.col("a.event_type") < F.col("b.event_type")))
            .groupBy(F.col("a.event_type").alias("type_a"),
                     F.col("b.event_type").alias("type_b"))
            .agg(F.countDistinct(F.col("a.user_id")).alias("n_users"))
            .orderBy("type_a", "type_b"))


def _q09_completion_stats(spark, sf):
    # A1/A2-shape completion stats: total / completed / rate.
    e = _t(spark, sf, "events")
    return (e.groupBy("event_type")
            .agg(F.count("*").alias("total"),
                 F.sum(F.when(F.col("value") > 0, 1).otherwise(0)).alias("completed"))
            .withColumn("completion_rate",
                        F.round(F.col("completed") / F.col("total"), 4))
            .orderBy("event_type"))


def _q10_content_stats(spark, sf):
    # A5 content statistics per language.
    from knowledgebase_processor_spark.functions.text import word_count
    d = _t(spark, sf, "documents")
    return (d.groupBy("lang")
            .agg(F.count("*").alias("n_docs"),
                 F.sum(F.length("text")).alias("sum_chars"),
                 F.round(F.avg(word_count(F.col("text"))), 4).alias("avg_words"))
            .orderBy("lang"))


def _q11_token_counts(spark, sf):
    # §2.7 scalar text functions: word + token counting per doc.
    from knowledgebase_processor_spark.functions.text import token_count, word_count
    d = _t(spark, sf, "documents")
    return (d.select("doc_id",
                     word_count(F.col("text")).alias("words"),
                     token_count(F.col("text")).alias("tokens"))
            .orderBy("doc_id").limit(50))


def _q12_lang_id(spark, sf):
    # training-data op: stopword-vote language ID, counted by prediction.
    from knowledgebase_processor_spark.functions.text import lang_id
    d = _t(spark, sf, "documents")
    return (d.select(lang_id(F.col("text")).alias("pred_lang"))
            .groupBy("pred_lang").agg(F.count("*").alias("n_docs"))
            .orderBy("pred_lang"))


def _q13_quality_buckets(spark, sf):
    # training-data op: quality-score histogram (0.1 buckets).
    from knowledgebase_processor_spark.functions.text import quality_score
    d = _t(spark, sf, "documents")
    return (d.select((F.floor(quality_score(F.col("text")) * 10) / 10).alias("bucket"))
            .groupBy("bucket").agg(F.count("*").alias("n_docs"))
            .orderBy("bucket"))


def _q14_fingerprints(spark, sf):
    # dedup/exact: distinct content fingerprints per source.
    from knowledgebase_processor_spark.functions.text import fingerprint
    d = _t(spark, sf, "documents")
    return (d.groupBy("source")
            .agg(F.count("*").alias("n_docs"),
                 F.countDistinct(fingerprint(F.col("text"))).alias("n_distinct"))
            .orderBy("source"))


def _q15_exact_dup_groups(spark, sf):
    # dedup/exact: duplicate groups (hash-groupBy on fingerprint).
    from knowledgebase_processor_spark.operators.dedup import exact_duplicates
    d = _t(spark, sf, "documents")
    return (exact_duplicates(d).select("fp", "n_dups").orderBy("fp"))


def _q16_hashtags(spark, sf):
    # E3 tag extraction over text (regexp_extract_all, masked variant in
    # operators.metadata for markdown).
    from knowledgebase_processor_spark.functions.text import hashtags
    d = _t(spark, sf, "documents")
    return (d.select(F.explode(hashtags(F.col("text"))).alias("tag"))
            .groupBy("tag").agg(F.count("*").alias("n"))
            .orderBy("tag"))


def _q17_ann_topk(spark, sf):
    # similarity search: brute-force cosine top-k vs vec_id=0's embedding.
    from knowledgebase_processor_spark.operators.similarity import cosine_topk
    v = _t(spark, sf, "embeddings")
    qvec = v.filter(F.col("vec_id") == 0).select("embedding").collect()[0][0]
    return cosine_topk(v.filter(F.col("vec_id") != 0), [float(x) for x in qvec], k=10) \
        .select("vec_id", F.round(F.col("cosine"), 4).alias("cosine"))


def _q18_embedding_near_dups(spark, sf):
    # dedup/embedding-cosine near-dup pairs above 0.55 (synthetic vectors
    # cluster by label; 0.55 keeps the result non-trivial but bounded).
    from knowledgebase_processor_spark.operators.dedup import embedding_near_dups
    v = _t(spark, sf, "embeddings").filter(F.col("vec_id") < 500)
    return (embedding_near_dups(v, threshold=0.55)
            .select("vec_a", "vec_b", F.round(F.col("cosine"), 4).alias("cosine"))
            .orderBy("vec_a", "vec_b"))


def _q19_event_windows(spark, sf):
    # S3/streaming-shape: tumbling 1h windows (batch equivalent of the
    # structured-streaming job in streaming/jobs.py).
    e = _t(spark, sf, "events")
    return (e.groupBy(F.date_trunc("hour", F.col("ts")).alias("window_start"), "event_type")
            .agg(F.count("*").alias("n_events"),
                 F.sum(F.col("value").cast("decimal(18,4)")).cast("double").alias("sum_value"))
            .orderBy("window_start", "event_type"))


def _q20_minhash_lsh(spark, sf):
    # dedup/minhash+LSH candidate pairs (rows-only: engine-specific hashes).
    from knowledgebase_processor_spark.operators.dedup import minhash_lsh_pairs
    d = _t(spark, sf, "documents", spread=True)
    return (minhash_lsh_pairs(d, num_hashes=16, bands=4)
            .orderBy("doc_a", "doc_b"))


def _q21_simhash_near_dups(spark, sf):
    # dedup/simhash near-dup pairs (rows-only: engine-specific hashes).
    from knowledgebase_processor_spark.operators.dedup import simhash_near_dups
    d = _t(spark, sf, "documents", spread=True)
    return simhash_near_dups(d, max_hamming=16).orderBy("doc_a", "doc_b")


def _q22_triples_by_kind(spark, sf):
    # flagship KG pipeline (rows-only: extraction not SQL-expressible).
    from knowledgebase_processor_spark.pipeline import documents_to_triples
    docs = _t(spark, sf, "documents", spread=True).select(
        F.concat(F.lit("corpus/doc-"), F.col("doc_id").cast("string")).alias("doc_id"),
        "text")
    return (documents_to_triples(docs, resolve_links=True)
            .groupBy("pred").agg(F.count("*").alias("n_triples"))
            .orderBy("pred"))


def _q23_related_documents(spark, sf):
    # E12/J6 relationship enrichment: shared-key document pairs (the key
    # here is the exact char count — deterministic small groups).
    from knowledgebase_processor_spark.operators.stats import related_documents
    d = _t(spark, sf, "documents").select(
        "doc_id", F.col("n_chars").cast("string").alias("tag"))
    return (related_documents(d)
            .groupBy("tag").agg(F.count("*").alias("n_pairs"))
            .orderBy("tag"))


def _q24_todo_stats(spark, sf):
    # A1 todo statistics over the extracted entity frame (rows-only:
    # extraction not SQL-expressible).
    from knowledgebase_processor_spark.operators.extract_udf import extract_entities_df
    from knowledgebase_processor_spark.operators.stats import todo_statistics
    docs = _t(spark, sf, "documents", spread=True).select(
        F.col("doc_id").cast("string").alias("doc_id"), "text")
    return todo_statistics(extract_entities_df(docs))


def _q25_content_stats(spark, sf):
    # A5 full content statistics incl. paragraphs/empty lines.
    from knowledgebase_processor_spark.operators.stats import content_statistics
    d = _t(spark, sf, "documents").select("doc_id", "text")
    return (content_statistics(d)
            .select("doc_id", "char_count", "line_count", "word_count",
                    "paragraph_count", "empty_line_count")
            .orderBy("doc_id").limit(50))


_OIE_NP = r"(?:table|customer|query|part|spark|window|column|row|data|stream)"
_OIE_REL = r"(?:join|merge|scan|filter|group|sort|order)"
_OIE_PATTERN = rf"\b({_OIE_NP}) ({_OIE_REL}) ({_OIE_NP})\b"


def _q26_openie_relations(spark, sf):
    # North-star OpenIE-style SVO extraction (operators/openie.py) —
    # pure JVM regexp path; lexicon matched to the synthetic vocabulary.
    from knowledgebase_processor_spark.operators.openie import openie_triples
    d = _t(spark, sf, "documents").select(
        F.col("doc_id").cast("long").alias("doc_id"), "text")
    return (openie_triples(d, np=_OIE_NP, rel=_OIE_REL)
            .groupBy("subj", "rel", "obj")
            .agg(F.count("*").alias("n_matches"),
                 F.countDistinct("doc_id").alias("n_docs"))
            .orderBy("subj", "rel", "obj"))


def _q27_pii_scrub(spark, sf):
    # PII redaction (functions/text.redact_pii): deterministic PII is
    # injected into a slice of rows (the corpus itself is synthetic word
    # soup), then redacted; output proves every injected token is caught.
    from knowledgebase_processor_spark.functions.text import pii_counts, redact_pii
    d = _t(spark, sf, "documents")
    salted = d.select(
        "doc_id",
        F.concat(
            F.col("text"),
            F.when(F.col("doc_id") % 7 == 0,
                   F.concat(F.lit(" contact user"), F.col("doc_id").cast("string"),
                            F.lit("@example.com")))
             .when(F.col("doc_id") % 11 == 0, F.lit(" host 10.0.0.1"))
             .otherwise(F.lit(""))).alias("text"))
    counts = pii_counts(F.col("text"))
    red = salted.select(
        "doc_id",
        counts["n_emails"].alias("n_emails"),
        counts["n_ips"].alias("n_ips"),
        F.length(redact_pii(F.col("text"))).alias("redacted_len"))
    return (red.groupBy()
            .agg(F.sum("n_emails").alias("total_emails"),
                 F.sum("n_ips").alias("total_ips"),
                 F.sum("redacted_len").alias("total_redacted_len")))


def _q28_canonical_urls(spark, sf):
    # URL canonicalization (functions/text.canonical_url): synthesize the
    # messy crawl-url variants from doc_id, canonicalize, count collisions.
    from knowledgebase_processor_spark.functions.text import canonical_url
    d = _t(spark, sf, "documents")
    variants = d.select(
        F.col("doc_id"),
        F.explode(F.array(
            F.concat(F.lit("https://Example.COM/docs//d"),
                     F.col("doc_id").cast("string"), F.lit("/?utm_source=feed")),
            F.concat(F.lit("https://example.com/docs/d"),
                     F.col("doc_id").cast("string")),
            F.concat(F.lit("https://example.com/docs/d"),
                     F.col("doc_id").cast("string"), F.lit("#section")),
        )).alias("url"))
    return (variants.select(canonical_url(F.col("url")).alias("curl"))
            .groupBy("curl").agg(F.count("*").alias("n_variants"))
            .groupBy("n_variants").agg(F.count("*").alias("n_urls"))
            .orderBy("n_variants"))


def _q29_minhash_portable(spark, sf):
    # Portable MinHash (dedup family, fully oracle-checked): same salted
    # md5 formula is recomputed by DuckDB, so the signature VALUES — not
    # just row counts — are verified cross-engine.  q20 stays the faster
    # engine-native xxhash64 variant.
    from knowledgebase_processor_spark.operators.dedup import (
        minhash_signatures_portable)
    d = _t(spark, sf, "documents", spread=True)
    s = minhash_signatures_portable(d)
    cols = [F.element_at(F.col("sig"), i).alias(f"h{i}") for i in range(1, 9)]
    return s.select("doc_id", *cols).orderBy("doc_id")


def _q30_ngram_jaccard(spark, sf):
    # Exact n-gram Jaccard verification (dedup family), value-checked:
    # candidates = same-n_chars pairs (deterministic small groups), scored
    # with the shared shingle formula DuckDB recomputes exactly.
    from knowledgebase_processor_spark.operators.dedup import ngram_jaccard_pairs
    d = _t(spark, sf, "documents")
    keyed = d.select("doc_id", "n_chars")
    a, b = keyed.alias("a"), keyed.alias("b")
    cand = (a.join(b, (F.col("a.n_chars") == F.col("b.n_chars"))
                   & (F.col("a.doc_id") < F.col("b.doc_id")))
            .select(F.col("a.doc_id").alias("doc_a"),
                    F.col("b.doc_id").alias("doc_b")))
    return (ngram_jaccard_pairs(d, cand, threshold=0.0)
            .orderBy("doc_a", "doc_b"))


def _q31_simhash_portable(spark, sf):
    # Portable SimHash (dedup family, fully oracle-checked): same md5 word
    # hashes + bit sign-sums recomputed by DuckDB, so the 60-bit hash
    # VALUES verify cross-engine.  q21 stays the engine-native scale path.
    from knowledgebase_processor_spark.operators.dedup import simhash_portable
    d = _t(spark, sf, "documents", spread=True)
    return simhash_portable(d).orderBy("doc_id")


def _q32_ann_ivf(spark, sf):
    # ANN scale path (rows-only: centroid sampling is engine-internal):
    # IVF cell assignment + nprobe probing, exact rescoring inside cells.
    from knowledgebase_processor_spark.operators.similarity import (
        ivf_centroids, ivf_topk)
    v = _t(spark, sf, "embeddings")
    first = v.orderBy("vec_id").first()
    q = [float(x) for x in first.embedding]
    cents = ivf_centroids(v, dim=len(q), k_cells=8)
    return ivf_topk(v, q, cents, k=10, nprobe=2)


def _q33_dedup_corpus(spark, sf):
    # The composed training-data dedup pipeline (rows-only: minhash LSH
    # is engine-internal): exact fingerprint collapse -> LSH candidates
    # over survivors -> exact Jaccard verify -> connected components ->
    # canonical election.  Returns every doc's (canonical_id, reason).
    from knowledgebase_processor_spark.operators.dedup import dedup_corpus
    d = _t(spark, sf, "documents", spread=True).select(
        F.col("doc_id").cast("string").alias("doc_id"), "text")
    return (dedup_corpus(d, num_hashes=16, bands=8, jaccard_threshold=0.6)
            .groupBy("reason").agg(F.count("*").alias("n_docs"))
            .orderBy("reason"))


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    return {
        "q01_pricing_summary": _q01_pricing_summary,
        "q02_top_customers": _q02_top_customers,
        "q03_orders_by_nation": _q03_orders_by_nation,
        "q04_region_nations": _q04_region_nations,
        "q05_search": _q05_search,
        "q06_find_by_tag": _q06_find_by_tag,
        "q07_find_by_topic": _q07_find_by_topic,
        "q08_related_by_shared_key": _q08_related_by_shared_key,
        "q09_completion_stats": _q09_completion_stats,
        "q10_content_stats": _q10_content_stats,
        "q11_token_counts": _q11_token_counts,
        "q12_lang_id": _q12_lang_id,
        "q13_quality_buckets": _q13_quality_buckets,
        "q14_fingerprints": _q14_fingerprints,
        "q15_exact_dup_groups": _q15_exact_dup_groups,
        "q16_hashtags": _q16_hashtags,
        "q17_ann_topk": _q17_ann_topk,
        "q18_embedding_near_dups": _q18_embedding_near_dups,
        "q19_event_windows": _q19_event_windows,
        "q20_minhash_lsh": _q20_minhash_lsh,
        "q21_simhash_near_dups": _q21_simhash_near_dups,
        "q22_triples_by_kind": _q22_triples_by_kind,
        "q23_related_documents": _q23_related_documents,
        "q24_todo_stats": _q24_todo_stats,
        "q25_content_stats": _q25_content_stats,
        "q26_openie_relations": _q26_openie_relations,
        "q27_pii_scrub": _q27_pii_scrub,
        "q28_canonical_urls": _q28_canonical_urls,
        "q29_minhash_portable": _q29_minhash_portable,
        "q30_ngram_jaccard": _q30_ngram_jaccard,
        "q31_simhash_portable": _q31_simhash_portable,
        "q32_ann_ivf": _q32_ann_ivf,
        "q33_dedup_corpus": _q33_dedup_corpus,
    }


_EN_SW = "['the','and','of','to','is','in','that','it','was','for']"
_ES_SW = "['el','la','de','que','y','en','un','por','con','los']"
_DE_SW = "['der','die','und','das','ist','von','nicht','mit','ein','zu']"
_FR_SW = "['le','la','et','les','des','est','pas','que','une','dans']"

_WORDS = r"string_split(trim(regexp_replace(text, '\s+', ' ', 'g')), ' ')"
_WCOUNT = (r"case when trim(regexp_replace(text, '\s+', ' ', 'g')) = '' then 0 "
           r"else len(string_split(trim(regexp_replace(text, '\s+', ' ', 'g')), ' ')) end")
_FPRINT = r"sha256(lower(trim(regexp_replace(text, '\s+', ' ', 'g'))))"
_QUALITY = (
    "0.4 * least(({w})::double / 100.0, 1.0)"
    " + 0.3 * (1.0 - length(regexp_replace(text, '[A-Za-z0-9\\s]', '', 'g'))::double"
    "              / greatest(length(text), 1)::double)"
    " + 0.3 * least((len(list_intersect({lw}, {sw}))::double"
    "              / greatest({w}, 1)::double) * 5.0, 1.0)"
).format(w=_WCOUNT, sw=_EN_SW,
         lw=r"string_split(regexp_replace(lower(trim(text)), '\s+', ' ', 'g'), ' ')")


def oracle_sql() -> dict[str, str]:
    _lw = r"string_split(regexp_replace(lower(trim(text)), '\s+', ' ', 'g'), ' ')"
    hits = {k: f"len(list_intersect({_lw}, {sw}))"
            for k, sw in [("en", _EN_SW), ("es", _ES_SW), ("de", _DE_SW), ("fr", _FR_SW)]}
    # argmax with strictly-greater updates, in dict order en,es,de,fr
    lang_case = f"""
        case
          when {hits['fr']} > greatest({hits['en']}, {hits['es']}, {hits['de']})
               then 'fr'
          when {hits['de']} > greatest({hits['en']}, {hits['es']})
               and {hits['de']} >= {hits['fr']} then 'de'
          when {hits['es']} > {hits['en']} and {hits['es']} >= {hits['de']}
               and {hits['es']} >= {hits['fr']} then 'es'
          when {hits['en']} > 0 and {hits['en']} >= {hits['es']}
               and {hits['en']} >= {hits['de']} and {hits['en']} >= {hits['fr']} then 'en'
          else 'und'
        end"""
    return {
        "q01_pricing_summary": """
            SELECT l_returnflag, l_linestatus,
                   CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS sum_qty,
                   CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) AS sum_base_price,
                   COUNT(*) AS count_order
            FROM lineitem WHERE l_shipdate <= TIMESTAMP '1998-09-02'
            GROUP BY l_returnflag, l_linestatus
            ORDER BY l_returnflag, l_linestatus""",
        "q02_top_customers": """
            SELECT c_custkey, c_name,
                   CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS revenue,
                   COUNT(*) AS n_orders
            FROM orders JOIN customer ON o_custkey = c_custkey
            GROUP BY c_custkey, c_name
            ORDER BY revenue DESC, c_custkey ASC LIMIT 10""",
        "q03_orders_by_nation": """
            SELECT n_name, COUNT(*) AS n_orders,
                   CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS total_revenue
            FROM orders JOIN customer ON o_custkey = c_custkey
                        JOIN nation ON c_nationkey = n_nationkey
            GROUP BY n_name ORDER BY n_name""",
        "q04_region_nations": """
            SELECT r_name, COUNT(*) AS n_nations
            FROM nation JOIN region ON n_regionkey = r_regionkey
            GROUP BY r_name ORDER BY r_name""",
        "q05_search": """
            SELECT doc_id, n_chars FROM documents
            WHERE text LIKE '%query%' ORDER BY doc_id LIMIT 20""",
        "q06_find_by_tag": """
            SELECT source, COUNT(DISTINCT doc_id) AS n_docs
            FROM (SELECT doc_id, source, UNNEST(string_split(text, ' ')) AS w
                  FROM documents)
            WHERE w = 'spark' GROUP BY source ORDER BY source""",
        "q07_find_by_topic": """
            SELECT lower(replace(source, ' ', '_')) AS topic, COUNT(*) AS n_docs
            FROM documents GROUP BY topic ORDER BY topic""",
        "q08_related_by_shared_key": """
            WITH ut AS (SELECT DISTINCT user_id, event_type FROM events)
            SELECT a.event_type AS type_a, b.event_type AS type_b,
                   COUNT(DISTINCT a.user_id) AS n_users
            FROM ut a JOIN ut b
              ON a.user_id = b.user_id AND a.event_type < b.event_type
            GROUP BY type_a, type_b ORDER BY type_a, type_b""",
        "q09_completion_stats": """
            SELECT event_type, COUNT(*) AS total,
                   CAST(SUM(CASE WHEN value > 0 THEN 1 ELSE 0 END) AS BIGINT) AS completed,
                   ROUND(SUM(CASE WHEN value > 0 THEN 1 ELSE 0 END)::DOUBLE
                         / COUNT(*), 4) AS completion_rate
            FROM events GROUP BY event_type ORDER BY event_type""",
        "q10_content_stats": f"""
            SELECT lang, COUNT(*) AS n_docs, CAST(SUM(length(text)) AS BIGINT) AS sum_chars,
                   ROUND(AVG({_WCOUNT}), 4) AS avg_words
            FROM documents GROUP BY lang ORDER BY lang""",
        "q11_token_counts": rf"""
            SELECT doc_id, {_WCOUNT} AS words,
                   len(regexp_extract_all(text, '[A-Za-z]+|[0-9]+|[^A-Za-z0-9\s]')) AS tokens
            FROM documents ORDER BY doc_id LIMIT 50""",
        "q12_lang_id": f"""
            SELECT {lang_case} AS pred_lang, COUNT(*) AS n_docs
            FROM documents GROUP BY pred_lang ORDER BY pred_lang""",
        "q13_quality_buckets": f"""
            SELECT FLOOR(({_QUALITY}) * 10) / 10 AS bucket, COUNT(*) AS n_docs
            FROM documents GROUP BY bucket ORDER BY bucket""",
        "q14_fingerprints": f"""
            SELECT source, COUNT(*) AS n_docs,
                   COUNT(DISTINCT {_FPRINT}) AS n_distinct
            FROM documents GROUP BY source ORDER BY source""",
        "q15_exact_dup_groups": f"""
            SELECT {_FPRINT} AS fp, COUNT(*) AS n_dups
            FROM documents GROUP BY fp HAVING COUNT(*) > 1 ORDER BY fp""",
        "q16_hashtags": r"""
            SELECT tag, COUNT(*) AS n
            FROM (SELECT UNNEST(regexp_extract_all(text, '(^|\s)#([a-zA-Z0-9_]+)', 2)) AS tag
                  FROM documents)
            GROUP BY tag ORDER BY tag""",
        "q17_ann_topk": """
            SELECT vec_id,
                   ROUND(ROUND(list_cosine_similarity(
                       embedding::DOUBLE[],
                       (SELECT embedding::DOUBLE[] FROM embeddings WHERE vec_id = 0)), 6), 4)
                   AS cosine
            FROM embeddings WHERE vec_id != 0
            ORDER BY ROUND(list_cosine_similarity(
                       embedding::DOUBLE[],
                       (SELECT embedding::DOUBLE[] FROM embeddings WHERE vec_id = 0)), 6) DESC,
                     vec_id ASC
            LIMIT 10""",
        "q18_embedding_near_dups": """
            SELECT a.vec_id AS vec_a, b.vec_id AS vec_b,
                   ROUND(ROUND(list_cosine_similarity(a.embedding::DOUBLE[],
                                                      b.embedding::DOUBLE[]), 6), 4) AS cosine
            FROM embeddings a JOIN embeddings b ON a.vec_id < b.vec_id
            WHERE a.vec_id < 500 AND b.vec_id < 500
              AND ROUND(list_cosine_similarity(a.embedding::DOUBLE[],
                                               b.embedding::DOUBLE[]), 6) >= 0.55
            ORDER BY vec_a, vec_b""",
        "q19_event_windows": """
            SELECT date_trunc('hour', ts) AS window_start, event_type,
                   COUNT(*) AS n_events,
                   CAST(SUM(CAST(value AS DECIMAL(18,4))) AS DOUBLE) AS sum_value
            FROM events GROUP BY window_start, event_type
            ORDER BY window_start, event_type""",
        "q23_related_documents": """
            WITH dt AS (SELECT doc_id, CAST(n_chars AS VARCHAR) AS tag FROM documents)
            SELECT tag, COUNT(*) AS n_pairs
            FROM (SELECT DISTINCT a.doc_id, b.doc_id AS related_doc_id, a.tag
                  FROM dt a JOIN dt b
                    ON a.tag = b.tag AND a.doc_id != b.doc_id)
            GROUP BY tag ORDER BY tag""",
        "q25_content_stats": r"""
            SELECT doc_id, length(text) AS char_count,
                   len(string_split(text, chr(10))) AS line_count,
                   CASE WHEN trim(regexp_replace(text, '\s+', ' ', 'g')) = '' THEN 0
                        ELSE len(string_split(trim(regexp_replace(text, '\s+', ' ', 'g')), ' '))
                   END AS word_count,
                   len(list_filter(regexp_split_to_array(text, '\n\s*\n'),
                                   p -> trim(p) != '')) AS paragraph_count,
                   len(list_filter(string_split(text, chr(10)),
                                   l -> trim(l) = '')) AS empty_line_count
            FROM documents ORDER BY doc_id LIMIT 50""",
        "q26_openie_relations": f"""
            WITH m AS (
              SELECT doc_id,
                     unnest(regexp_extract_all(
                       regexp_replace(text, '\\s+', ' ', 'g'),
                       '{_OIE_PATTERN}')) AS match
              FROM documents)
            SELECT regexp_extract(match, '{_OIE_PATTERN}', 1) AS subj,
                   regexp_extract(match, '{_OIE_PATTERN}', 2) AS rel,
                   regexp_extract(match, '{_OIE_PATTERN}', 3) AS obj,
                   COUNT(*) AS n_matches,
                   COUNT(DISTINCT doc_id) AS n_docs
            FROM m GROUP BY subj, rel, obj ORDER BY subj, rel, obj""",
        "q27_pii_scrub": r"""
            WITH salted AS (
              SELECT doc_id,
                     concat(text,
                       CASE WHEN doc_id % 7 = 0
                            THEN concat(' contact user', CAST(doc_id AS VARCHAR),
                                        '@example.com')
                            WHEN doc_id % 11 = 0 THEN ' host 10.0.0.1'
                            ELSE '' END) AS text
              FROM documents)
            SELECT
              CAST(SUM(len(regexp_extract_all(text,
                  '[A-Za-z0-9._%+-]{1,64}@[A-Za-z0-9.-]{1,255}\.[A-Za-z]{2,24}'))) AS BIGINT) AS total_emails,
              CAST(SUM(len(regexp_extract_all(text,
                  '\b[0-9]{1,3}\.[0-9]{1,3}\.[0-9]{1,3}\.[0-9]{1,3}\b'))) AS BIGINT) AS total_ips,
              SUM(length(
                regexp_replace(
                 regexp_replace(
                  regexp_replace(
                   regexp_replace(text,
                    '[A-Za-z0-9._%+-]{1,64}@[A-Za-z0-9.-]{1,255}\.[A-Za-z]{2,24}', '<EMAIL>', 'g'),
                   '\b[0-9]{1,3}\.[0-9]{1,3}\.[0-9]{1,3}\.[0-9]{1,3}\b', '<IP>', 'g'),
                  '\b[0-9]{3}-[0-9]{2}-[0-9]{4}\b', '<SSN>', 'g'),
                 '\+?[0-9][0-9()\-. ]{7,20}[0-9]', '<PHONE>', 'g'))) :: BIGINT AS total_redacted_len
            FROM salted""",
        "q28_canonical_urls": r"""
            WITH variants AS (
              SELECT unnest([
                concat('https://Example.COM/docs//d', CAST(doc_id AS VARCHAR),
                       '/?utm_source=feed'),
                concat('https://example.com/docs/d', CAST(doc_id AS VARCHAR)),
                concat('https://example.com/docs/d', CAST(doc_id AS VARCHAR),
                       '#section')]) AS url
              FROM documents),
            cleaned AS (
              SELECT regexp_replace(
                      regexp_replace(
                       regexp_replace(
                        regexp_replace(
                         regexp_replace(
                          concat(lower(regexp_extract(trim(url),
                                  '^[A-Za-z][A-Za-z0-9+.-]*://[^/?#]*', 0)),
                                 substring(trim(url),
                                  length(regexp_extract(trim(url),
                                   '^[A-Za-z][A-Za-z0-9+.-]*://[^/?#]*', 0)) + 1)),
                          '#.*$', ''),
                         '([?&])(utm_[a-z]+|fbclid|gclid|msclkid|ref|mc_cid|mc_eid)=[^&#]*',
                         '\1', 'g'),
                        '&{2,}', '&', 'g'),
                       '\?&', '?'),
                      '[?&]$', '') AS u2
              FROM variants),
            canon AS (
              SELECT concat(
                regexp_replace(
                 regexp_replace(regexp_extract(u2, '^[^?#]*', 0),
                  '([^:/])/{2,}', '\1/', 'g'),
                 '(://[^/]*/.+?)/$', '\1'),
                substring(u2, length(regexp_extract(u2, '^[^?#]*', 0)) + 1)) AS curl
              FROM cleaned),
            per_url AS (
              SELECT curl, COUNT(*) AS n_variants FROM canon GROUP BY curl)
            SELECT n_variants, COUNT(*) AS n_urls
            FROM per_url GROUP BY n_variants ORDER BY n_variants""",
        "q29_minhash_portable": r"""
            WITH words AS (
              SELECT doc_id,
                     list_filter(string_split_regex(lower(trim(text)), '[ \t\n\r\f]+'),
                                 w -> w <> '') AS ws
              FROM documents),
            sh AS (
              SELECT doc_id, CASE WHEN len(ws) >= 3
                THEN list_transform(range(1, len(ws)-1),
                       i -> ws[i] || ' ' || ws[i+1] || ' ' || ws[i+2])
                ELSE [array_to_string(ws, ' ')] END AS shingles
              FROM words),
            sig AS (
              SELECT doc_id,
                     list_transform(range(1, 9), s ->
                       list_min(list_transform(shingles, g ->
                         ('0x' || substr(md5(s::VARCHAR || '|' || g), 1, 15))::BIGINT
                       ))) AS sg
              FROM sh)
            SELECT doc_id, sg[1] AS h1, sg[2] AS h2, sg[3] AS h3, sg[4] AS h4,
                   sg[5] AS h5, sg[6] AS h6, sg[7] AS h7, sg[8] AS h8
            FROM sig ORDER BY doc_id""",
        "q30_ngram_jaccard": r"""
            WITH ws AS (
              SELECT doc_id, n_chars,
                     list_filter(string_split_regex(lower(trim(text)), '[ \t\n\r\f]+'),
                                 w -> w <> '') AS w
              FROM documents),
            sh AS (
              SELECT doc_id, n_chars, CASE WHEN len(w) >= 3
                THEN list_distinct(list_transform(range(1, len(w)-1),
                       i -> w[i] || ' ' || w[i+1] || ' ' || w[i+2]))
                ELSE [array_to_string(w, ' ')] END AS s
              FROM ws),
            cand AS (
              SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, a.s AS sa, b.s AS sb
              FROM sh a JOIN sh b
                ON a.n_chars = b.n_chars AND a.doc_id < b.doc_id)
            SELECT doc_a, doc_b,
                   round(len(list_intersect(sa, sb))::DOUBLE
                         / greatest(len(list_distinct(sa || sb)), 1)::DOUBLE,
                         6) AS jaccard
            FROM cand ORDER BY doc_a, doc_b""",
        "q31_simhash_portable": r"""
            WITH w AS (
              SELECT doc_id,
                     unnest(list_filter(string_split_regex(lower(trim(text)),
                                                           '[ \t\n\r\f]+'),
                                        x -> x <> '')) AS word
              FROM documents),
            h AS (
              SELECT doc_id,
                     ('0x' || substr(md5(word), 1, 15))::BIGINT AS hv
              FROM w),
            bits AS (
              SELECT doc_id, b, SUM(((hv >> b) % 2) * 2 - 1) AS score
              FROM h, unnest(range(0, 60)) AS r(b)
              GROUP BY doc_id, b)
            SELECT doc_id,
                   CAST(SUM(CASE WHEN score > 0 THEN (1::BIGINT << b)
                       ELSE 0 END) AS BIGINT) AS simhash
            FROM bits GROUP BY doc_id ORDER BY doc_id""",
        # q20, q21, q22, q24, q32, q33: rows-only (engine-specific hashing /
        # the KG extraction pipeline / engine-internal centroid sampling,
        # not SQL-expressible).
    }


if __name__ == "__main__":
    from knowledgebase_processor_spark.pipeline import session
    spark = session("entry-smoke", cpus=8, shuffle_partitions=8)
    entry(spark).show(10, truncate=False)
    spark.stop()
