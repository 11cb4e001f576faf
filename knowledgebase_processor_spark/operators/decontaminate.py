"""Benchmark decontamination + DSIR-style importance weighting.

Two corpus-preparation operators with no reference anchor (the reference
has no training-data surface) but first-class in the large-scale
pipeline family this engine targets:

* ``contamination`` — the n-gram-overlap decontamination test used for
  LLM training corpora (the GPT-3/PaLM-style rule "a document is dirty
  if it shares a length-n token n-gram with an eval example", reported
  fractionally so callers pick their own threshold).
* ``dsir_weights`` — hashed-bigram importance weights in the style of
  DSIR (Data Selection via Importance Resampling, Xie et al. 2023):
  per-document sum of log(p_target/p_raw) over a hashed bag-of-bigrams
  multinomial with add-1 smoothing.

Scale shape (the reason these are cheap at 100 TB):

* Eval suites are MBs while the corpus is TBs — the benchmark side
  collapses to a DISTINCT 60-bit-hash set joined BROADCAST; the corpus
  side is never shuffled as data rows.  The only exchange carries one
  row per (doc, hit) — hits are rare by construction.
* DSIR reduces both corpora to ``buckets``-row histograms (map-side
  combinable aggregates over a bounded key space), and the per-document
  score is a broadcast lookup + integer sum: no data-row shuffle at all
  beyond the per-doc combine.

Everything is JVM-side column expressions on the PORTABLE salted-md5
formula family (same 60-bit ``conv(substr(md5(..),1,15),16,10)`` as the
q29 MinHash oracle), so DuckDB recomputes grams, hashes, histograms and
weights bit-identically.  The DSIR log-ratios are fixed-point
(micro-nats, rounded to integers BEFORE the per-document sum) so the
final weight is exact integer arithmetic — deterministic under any
aggregation order and bit-identical cross-engine.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

from ..functions.text import portable_words as _words  # single-sourced
# tokenizer (explicit whitespace class, not \s — see functions/text.py)


def _word_ngrams(text, n: int) -> "F.Column":
    """Distinct word n-grams of ``text``; [] when fewer than n words.

    zip_with over shifted copies, NOT transform(indices, i ->
    element_at(ws, ...)): interpreted higher-order functions re-evaluate
    captured expression trees per element, so referencing ``ws`` inside
    the lambda is O(doc^2) on crawl-scale pages (the
    functions/text.py::shingles lesson; span_dedup hit it live)."""
    ws = _words(text)
    grams = ws
    for k in range(1, n):
        shifted = F.slice(ws, k + 1, F.greatest(F.size(ws), F.lit(1)))
        # concat_ws skips the NULL tail padding; entries past size-n+1
        # are sliced off, so only exact n-word joins survive
        grams = F.zip_with(grams, shifted,
                           lambda a, b: F.concat_ws(" ", a, b))
    return F.when(F.size(ws) < n, F.array().cast("array<string>")) \
        .otherwise(F.array_distinct(F.slice(grams, 1,
                                            F.size(ws) - (n - 1))))


def _h60(col) -> "F.Column":
    """Portable 60-bit hash (the q29 family formula)."""
    return F.conv(F.substring(F.md5(col), 1, 15), 16, 10).cast("bigint")


def contamination(docs: DataFrame, benchmark: DataFrame, n: int = 8,
                  id_col: str = "doc_id", text_col: str = "text",
                  bench_text_col: str = "text") -> DataFrame:
    """n-gram-overlap contamination of ``docs`` against ``benchmark``.

    Returns (doc_id, n_grams, n_hits, frac): ``n_grams`` distinct word
    n-grams in the document, ``n_hits`` of them appearing anywhere in
    the benchmark corpus, ``frac`` = hits/grams (NULL for gram-less
    docs).  Callers threshold ``n_hits >= 1`` for the strict GPT-3 rule
    or ``frac`` for a softer one.

    Plan: benchmark -> explode -> distinct hash set (tiny: eval suites
    are MBs) -> BROADCAST inner join against the exploded corpus grams;
    only matching (doc, gram) rows reach the per-doc count shuffle.
    ``n_grams`` is computed inline on the scan side — no join needed.
    """
    bench = (benchmark
             .select(F.explode(_word_ngrams(F.col(bench_text_col), n))
                     .alias("g"))
             .select(_h60(F.col("g")).alias("gh"))
             .distinct())
    base = docs.select(F.col(id_col).alias("doc_id"),
                       _word_ngrams(F.col(text_col), n).alias("grams"))
    # ONE pass over the gram chain: n_grams rides each exploded row (a
    # constant int per doc), the broadcast probe is a LEFT join with a
    # hit marker, and one per-doc aggregate finishes — the previous
    # two-consumer form evaluated the whole tokenize+n-gram+md5 chain
    # twice and shuffled a doc_id-keyed join back together.
    # explode_outer keeps gram-less docs (null gh matches nothing, and
    # count() of the null marker is 0), so no restore join is needed.
    rows = base.select("doc_id", F.size("grams").alias("n_grams"),
                       F.explode_outer("grams").alias("g")) \
               .select("doc_id", "n_grams", _h60(F.col("g")).alias("gh"))
    marked = rows.join(
        F.broadcast(bench.withColumn("__hit", F.lit(1))), "gh", "left")
    return (marked.groupBy("doc_id")
            .agg(F.max("n_grams").alias("n_grams"),
                 F.count("__hit").alias("n_hits"))
            .select("doc_id", "n_grams", "n_hits",
                    F.when(F.col("n_grams") == 0,
                           F.lit(None).cast("double"))
                    .otherwise(F.col("n_hits").cast("double")
                               / F.col("n_grams").cast("double"))
                    .alias("frac")))


def _bigram_buckets(docs: DataFrame, id_col: str, text_col: str,
                    buckets: int) -> DataFrame:
    """One row per word-bigram OCCURRENCE: (doc_id, bucket)."""
    ws = _words(F.col(text_col))
    shifted = F.slice(ws, 2, F.greatest(F.size(ws), F.lit(1)))
    grams = F.zip_with(ws, shifted, lambda a, b: F.concat_ws(" ", a, b))
    bg = F.when(F.size(ws) < 2, F.array().cast("array<string>")) \
        .otherwise(F.slice(grams, 1, F.size(ws) - 1))
    return docs.select(F.col(id_col).alias("doc_id"),
                       F.explode(bg).alias("g")) \
               .select("doc_id", F.pmod(_h60(F.col("g")),
                                        F.lit(buckets)).alias("b"))


def dsir_weights(docs: DataFrame, target: DataFrame, buckets: int = 256,
                 id_col: str = "doc_id", text_col: str = "text",
                 target_text_col: str = "text") -> DataFrame:
    """DSIR-style importance weights of ``docs`` toward ``target``.

    Hashed bag-of-bigrams multinomial, add-1 smoothing: per bucket b,
    ratio(b) = ln((ct_t[b]+1)/(T_t+B)) - ln((ct_r[b]+1)/(T_r+B)),
    fixed-pointed to MICRO-NATS (``round(ratio*1e6)`` as BIGINT) before
    any per-document summation, so the returned ``weight_micro`` =
    sum over the document's bigram occurrences of the scaled ratio is
    exact integer arithmetic — order-independent and cross-engine
    reproducible.  Returns (doc_id, n_bigrams, weight_micro); docs with
    no bigrams get weight 0.

    Both corpora reduce to B-row histograms before anything meets
    anything: two bounded-key aggregates, one B-row broadcast join.
    """
    raw = _bigram_buckets(docs, id_col, text_col, buckets)
    # the target side needs no id — only its histogram is used
    tgt = _bigram_buckets(
        target.select(F.lit(0).alias("__tid"),
                      F.col(target_text_col).alias("__t")),
        "__tid", "__t", buckets)
    # histograms are <= buckets rows: localCheckpoint so deriving the
    # totals from them costs nothing and each corpus is scanned exactly
    # twice overall (histogram pass + scoring pass), never three times
    ct_r = raw.groupBy("b").agg(F.count("*").alias("c_r")).localCheckpoint()
    ct_t = tgt.groupBy("b").agg(F.count("*").alias("c_t")).localCheckpoint()
    tot_r = ct_r.agg(F.sum("c_r")).collect()[0][0] or 0
    tot_t = ct_t.agg(F.sum("c_t")).collect()[0][0] or 0
    spark = docs.sparkSession
    ratio = (spark.range(buckets).select(F.col("id").alias("b"))
             .join(ct_r, "b", "left").join(ct_t, "b", "left")
             .select("b", F.round(
                 (F.log((F.coalesce("c_t", F.lit(0)) + 1).cast("double")
                        / F.lit(float(tot_t + buckets)))
                  - F.log((F.coalesce("c_r", F.lit(0)) + 1).cast("double")
                          / F.lit(float(tot_r + buckets)))) * 1e6)
                 .cast("bigint").alias("r_micro")))
    scored = (raw.join(F.broadcast(ratio), "b")
              .groupBy("doc_id")
              .agg(F.count("*").alias("n_bigrams"),
                   F.sum("r_micro").alias("weight_micro")))
    return (docs.select(F.col(id_col).alias("doc_id"))
            .join(scored, "doc_id", "left")
            .select("doc_id",
                    F.coalesce("n_bigrams", F.lit(0)).alias("n_bigrams"),
                    F.coalesce("weight_micro", F.lit(0)).alias("weight_micro")))
