"""Structured-Streaming surface.

The reference's only streaming feature is ``--watch`` re-scan-on-change
(cli/commands/scan.py:15,23 — processing-time only, no watermarks/windows,
SURVEY.md §2.8 S3).  Two idiomatic Spark equivalents:

* ``watch_documents``  — file-source stream over a directory of documents;
  each micro-batch runs the same extraction -> triples transform and
  upserts by source document (checkpointed, exactly-once per batch).
* ``windowed_event_counts`` — the event-table analytics as a real
  event-time windowed aggregation with a watermark, for late data — the
  capability the reference lacks but a web-scale crawl feed needs.

Both return the DataStreamWriter unstarted so tests/benchmarks control the
trigger; they run identically against a real cluster.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, functions as F

from ..pipeline import documents_to_triples


def watch_documents(spark: SparkSession, input_dir: str, output_dir: str,
                    checkpoint_dir: str):
    """Re-process documents as files appear (S3 'watch' semantics).

    Input: text files, one document per file (wholetext).  Each batch is
    the batch pipeline applied to the new files only; the sink upserts by
    source_doc so re-emitted documents replace their old triples —
    matching the reference's per-file reprocess-on-change.
    """
    stream = (spark.readStream.format("text")
              .option("wholetext", "true")
              .load(input_dir)
              .select(F.input_file_name().alias("doc_id"),
                      F.col("value").alias("text")))

    def process_batch(batch_df: DataFrame, batch_id: int) -> None:
        from ..sinks import merge_upsert
        triples = documents_to_triples(batch_df)
        merge_upsert(batch_df.sparkSession, triples, output_dir)

    return (stream.writeStream
            .foreachBatch(process_batch)
            .option("checkpointLocation", checkpoint_dir)
            .trigger(availableNow=True))


def dedup_crawl_stream(pages: DataFrame, watermark: str = "24 hours") -> DataFrame:
    """Streaming exact-dedup of a crawl feed: drop re-crawls whose content
    fingerprint was already seen within the watermark horizon.

    ``dropDuplicatesWithinWatermark`` bounds the dedup state by event time
    — the at-scale answer to "the same page arrives from N crawler shards
    within hours of each other": state for a fingerprint is released once
    the watermark passes it, so the store never grows unboundedly the way
    a plain streaming ``dropDuplicates`` would.  Works identically on a
    batch frame (where it degenerates to dropDuplicates on the keys).
    """
    fp = F.sha2(F.regexp_replace(F.lower(F.coalesce(F.col("text"), F.lit(""))),
                                 r"\s+", " "), 256)
    keyed = pages.withColumn("fingerprint", fp).withWatermark("warc_ts", watermark)
    deduped = (keyed.dropDuplicatesWithinWatermark(["url", "fingerprint"])
               if keyed.isStreaming
               else keyed.dropDuplicates(["url", "fingerprint"]))
    # preserve the caller's pages schema — the fingerprint is internal
    return deduped.select(*pages.columns)


def windowed_event_counts(events: DataFrame, window: str = "1 hour",
                          watermark: str = "2 hours") -> DataFrame:
    """Event-time tumbling-window counts with late-data watermark.

    ``events`` may be a streaming DataFrame (rate/kafka/file source) or a
    batch one — the expression is identical, which is how the batch
    oracle in __spark_entry__ (q19) validates the streaming logic.
    """
    return (events.withWatermark("ts", watermark)
            .groupBy(F.window("ts", window).alias("w"), "event_type")
            .agg(F.count("*").alias("n_events"),
                 F.sum("value").alias("sum_value"))
            .select(F.col("w.start").alias("window_start"), "event_type",
                    "n_events", "sum_value"))


def screen_crawl_stream(docs_stream: DataFrame, index: DataFrame,
                        matches_dir: str, novel_dir: str,
                        checkpoint_dir: str, threshold: float = 0.8):
    """Streaming near-dedup of a crawl feed against the PERSISTED corpus
    LSH index (``operators.dedup.lsh_index``): each micro-batch is probed
    with ``dedup_incremental`` — near-duplicates of already-indexed pages
    land in ``matches_dir`` (doc_id, dup_of, est_jaccard), novel pages
    append to ``novel_dir`` for downstream extraction.

    ``foreachBatch`` is the right shape here: the probe is a
    stream-static join plus a per-batch argmax aggregation, and the
    batch function reuses the EXACT batch operator, so streaming and
    batch screening cannot drift apart.  The static index side is read
    once per micro-batch from its (band, bucket)-bucketed storage —
    at web scale the join is co-located and only the (small) batch
    shuffles, the same plan as the batch path.
    """
    def process_batch(batch_df: DataFrame, batch_id: int) -> None:
        from ..operators.dedup import dedup_incremental
        dups = dedup_incremental(batch_df, index, threshold=threshold)
        dups.persist()
        dups.write.mode("append").parquet(matches_dir)
        (batch_df.join(dups.select("doc_id"), "doc_id", "left_anti")
         .write.mode("append").parquet(novel_dir))
        dups.unpersist()

    return (docs_stream.writeStream
            .foreachBatch(process_batch)
            .option("checkpointLocation", checkpoint_dir)
            .trigger(availableNow=True))


def session_event_stats(events: DataFrame, gap: str = "30 minutes",
                        watermark: str = "2 hours") -> DataFrame:
    """Streaming twin of ``operators.sessions.sessionize``: gap-based
    session aggregation via ``F.session_window`` with a late-data
    watermark, so state for a session is dropped once the watermark
    passes its close.  Works identically on a batch frame (no watermark
    semantics there), which is how the equivalence test pins it to the
    batch operator: both split a user's events only when the inter-event
    gap EXCEEDS ``gap`` — an event landing exactly at the previous
    window's end is absorbed into that session (verified empirically
    against ``F.session_window`` and pinned by the equivalence test's
    exactly-30-minute gaps; same strictly-greater rule as
    ``operators/sessions.py``).
    """
    return (events.withWatermark("ts", watermark)
            .groupBy(F.session_window("ts", gap).alias("w"), "user_id")
            .agg(F.count("*").alias("n_events"))
            .select("user_id", F.col("w.start").alias("session_start"),
                    F.col("w.end").alias("session_close"), "n_events"))


def hopping_event_stats(events: DataFrame, window: str = "1 hour",
                        slide: str = "30 minutes",
                        watermark: str = "2 hours") -> DataFrame:
    """Streaming twin of ``operators.windows.hopping_window_stats``:
    the SAME overlapping-window expression under a watermark, so each
    window's state is dropped once the watermark passes its end.
    Hopping windows are watermark-friendly because window starts are a
    pure function of event time — no session-merge state.  The
    equivalence test runs this on a file-source stream and pins it to
    the batch operator's output row-for-row.
    """
    from ..operators.windows import hopping_window_stats
    return hopping_window_stats(events.withWatermark("ts", watermark),
                                window, slide)


def decontaminate_crawl_stream(docs_stream: DataFrame, benchmark: DataFrame,
                               clean_dir: str, flagged_dir: str,
                               checkpoint_dir: str, n: int = 8):
    """Streaming benchmark decontamination of a crawl feed: each
    micro-batch is scored by the EXACT batch operator
    (``operators.decontaminate.contamination``) against the static eval
    set — clean pages append to ``clean_dir`` for downstream prep,
    contaminated ones to ``flagged_dir`` with their (n_grams, n_hits,
    frac) evidence for audit.

    ``foreachBatch`` keeps streaming and batch semantics identical; the
    benchmark side is a stream-static BROADCAST join (eval suites are
    MBs), so at web scale only the micro-batch is ever shuffled — the
    same plan as the batch path.
    """
    def process_batch(batch_df: DataFrame, batch_id: int) -> None:
        from ..operators.decontaminate import contamination
        scored = contamination(batch_df, benchmark, n=n)
        scored.persist()
        (scored.filter(F.col("n_hits") > 0)
         .write.mode("append").parquet(flagged_dir))
        (batch_df.join(scored.filter(F.col("n_hits") > 0).select("doc_id"),
                       "doc_id", "left_anti")
         .write.mode("append").parquet(clean_dir))
        scored.unpersist()

    return (docs_stream.writeStream
            .foreachBatch(process_batch)
            .option("checkpointLocation", checkpoint_dir)
            .trigger(availableNow=True))


def lm_screen_stream(docs_stream: DataFrame, train_docs: DataFrame,
                     clean_dir: str, flagged_dir: str,
                     checkpoint_dir: str, max_avg_nll_micro: int,
                     id_col: str = "doc_id", text_col: str = "text"):
    """Streaming CCNet-style LM fluency screen of a crawl feed: the
    stupid-backoff model is trained ONCE from the static ``train_docs``
    frame (count tables persisted — the deployment shape: CCNet ships
    one Wikipedia-trained KenLM to every worker), then every
    micro-batch is scored by the EXACT batch scorer
    (``operators.nglm.backoff_lm_score_with_model``).  Pages at or
    under the ``max_avg_nll_micro`` perplexity ceiling append to
    ``clean_dir``; the high-perplexity tail appends to ``flagged_dir``
    with its (n_tokens, nll_nano, avg_nll_micro) evidence.  Token-less
    pages have no perplexity and are flagged (CCNet drops them).

    ``foreachBatch`` keeps stream and batch semantics identical (the
    equivalence test pins keep-set equality against
    ``backoff_lm_score``); the count tables are stream-static joins —
    a pruned production LM broadcasts, so at web scale only the
    micro-batch is ever shuffled.
    """
    from ..operators.nglm import (_tokens, backoff_lm_model,
                                  backoff_lm_score_with_model)
    model = backoff_lm_model(_tokens(train_docs, id_col, text_col),
                             persist=True)

    def process_batch(batch_df: DataFrame, batch_id: int) -> None:
        scored = backoff_lm_score_with_model(
            model, _tokens(batch_df, id_col, text_col))
        scored.persist()
        keep = (F.col("avg_nll_micro").isNotNull()
                & (F.col("avg_nll_micro") <= max_avg_nll_micro))
        (scored.filter(~keep)
         .write.mode("append").parquet(flagged_dir))
        keep_ids = (scored.filter(keep)
                    .select(F.col("doc_id").alias("_keep_id")))
        (batch_df.join(keep_ids,
                       F.col(id_col) == F.col("_keep_id"), "left_semi")
         .write.mode("append").parquet(clean_dir))
        scored.unpersist()

    return (docs_stream.writeStream
            .foreachBatch(process_batch)
            .option("checkpointLocation", checkpoint_dir)
            .trigger(availableNow=True))


def correlate_event_streams(left: DataFrame, right: DataFrame,
                            key: str = "user_id", ts: str = "ts",
                            id_col: str = "event_id",
                            within: str = "5 minutes",
                            watermark: str = "10 minutes") -> DataFrame:
    """Stream-stream INNER interval join: each left event pairs with the
    right events of the same key that happen strictly after it but
    within ``within`` — the click->error correlation / attribution
    primitive, as a true two-stream join rather than a foreachBatch
    lookup.

    Both sides carry a watermark so Spark can BOUND the join state: a
    buffered left row is dropped once the right watermark passes
    l_ts + within, and vice versa — without the time-range condition in
    the join predicate the state store grows with the full history,
    which is the standard stream-stream-join OOM.  Inner-join matches
    emit as soon as both sides arrive (no close-of-window latency).

    Works identically on batch frames (watermarks are no-ops there),
    which is how the equivalence test pins it to the plain interval
    join.  Returns (key, l_event, l_ts, r_event, r_ts).
    """
    l = left.select(F.col(key).alias("key"),
                    F.col(id_col).alias("l_event"),
                    F.col(ts).alias("l_ts")).withWatermark("l_ts", watermark)
    r = right.select(F.col(key).alias("r_key"),
                     F.col(id_col).alias("r_event"),
                     F.col(ts).alias("r_ts")).withWatermark("r_ts", watermark)
    cond = ((F.col("key") == F.col("r_key"))
            & (F.col("r_ts") > F.col("l_ts"))
            & (F.col("r_ts") <= F.col("l_ts") + F.expr(f"INTERVAL {within}")))
    return l.join(r, cond).select("key", "l_event", "l_ts",
                                  "r_event", "r_ts")


def correlate_event_streams_outer(left: DataFrame, right: DataFrame,
                                  key: str = "user_id", ts: str = "ts",
                                  id_col: str = "event_id",
                                  within: str = "5 minutes",
                                  watermark: str = "10 minutes") -> DataFrame:
    """LEFT OUTER twin of :func:`correlate_event_streams`: left events
    with no right match within the window still emit (null right side) —
    the "click with NO follow-up error" anti-pattern detector.

    Outer semantics change the state story: an unmatched left row can
    only be declared unmatched once the right watermark has passed
    ``l_ts + within``, so null-padded rows emit with watermark latency
    (inner matches still emit immediately).  Spark requires the
    time-interval condition + both watermarks for exactly this reason —
    without them the unmatched set is unknowable and the query is
    rejected.  Identical call works on batch frames (plain left join).

    Returns (key, l_event, l_ts, r_event, r_ts) with null r_* for
    unmatched lefts.
    """
    l = left.select(F.col(key).alias("key"),
                    F.col(id_col).alias("l_event"),
                    F.col(ts).alias("l_ts")).withWatermark("l_ts", watermark)
    r = right.select(F.col(key).alias("r_key"),
                     F.col(id_col).alias("r_event"),
                     F.col(ts).alias("r_ts")).withWatermark("r_ts", watermark)
    cond = ((F.col("key") == F.col("r_key"))
            & (F.col("r_ts") > F.col("l_ts"))
            & (F.col("r_ts") <= F.col("l_ts") + F.expr(f"INTERVAL {within}")))
    return l.join(r, cond, "left_outer").select("key", "l_event", "l_ts",
                                                "r_event", "r_ts")


def join_fetch_stream(requests: DataFrame, responses: DataFrame,
                      watermark: str = "2 hours",
                      max_lag_minutes: int = 60) -> DataFrame:
    """STREAM-STREAM inner join — the crawl-ops request/response
    matcher: each fetch request joins the response for the same url
    arriving within ``max_lag_minutes`` of it.  Both sides carry
    watermarks and the join condition bounds event time in BOTH
    directions, so Spark can prove state expiry: a request older than
    the watermark + lag window is dropped from the join state — the
    state-boundedness argument is the same as
    ``dedup_crawl_stream``'s, but for the classic two-stream case
    (impressions⋈clicks in ad tech; request⋈response here).

    Batch twin: operators/rangejoin's interval join (q54) — the
    streaming test asserts row-level equality between the two on the
    same data.  ``requests``: (url, req_ts); ``responses``:
    (r_url, resp_ts, status).
    """
    req = requests.withWatermark("req_ts", watermark)
    resp = responses.withWatermark("resp_ts", watermark)
    cond = F.expr(
        "url = r_url AND resp_ts >= req_ts AND "
        f"resp_ts <= req_ts + INTERVAL {max_lag_minutes} MINUTES")
    return (req.join(resp, cond)
            .select("url", "req_ts", "resp_ts", "status",
                    (F.unix_timestamp("resp_ts")
                     - F.unix_timestamp("req_ts")).cast("long")
                    .alias("lag_s")))
