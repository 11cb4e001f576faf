"""Gap-based sessionization of event streams (beyond-reference;
SURVEY.md §2 round-2 surface).

The reference's processing endpoint ingests documents; a web-scale
deployment also ingests *interaction/crawl event logs*, and the first
analytic over those is sessionization: split each user's event sequence
wherever the inter-event gap exceeds a threshold, then aggregate per
session.  (The streaming twin of this operator is the watermarked
session window in ``streaming/jobs.py``; this is the batch/backfill
form over the historical log.)

Spark-first design:

* ONE shuffle on ``user_id`` serves the whole operator: the lag window,
  the running break-count (both over the same partitionBy), and the
  final per-(user, session) aggregation — whose map-side partial
  aggregation sees all rows of a group co-located and pre-sorted, so
  the second exchange carries only finished session rows;
* per-user event counts are bounded in practice (one browser/crawler),
  so the window state never approaches executor memory even at 100 TB
  of log — the skew risk lives on bot-like head users, which AQE's
  skew handling splits because the window itself never needs the whole
  user in one task generation (rows stream through the running frame);
* all outputs are exact integer/timestamp arithmetic (epoch
  microseconds), deliberately avoiding order-dependent float sums so
  the DuckDB oracle (q50) value-checks bit-identically.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window, functions as F


def sessionize(events: DataFrame, gap_minutes: int = 30,
               user: str = "user_id", ts: str = "ts",
               order_tiebreak: str = "event_id") -> DataFrame:
    """events(user_id, ts, event_id, ...) -> one row per (user, session):
    ``(user_id, session_id, n_events, session_start, session_end,
    duration_us)``.  A new session starts at the first event and after
    any gap STRICTLY greater than ``gap_minutes`` — the same merge rule
    as Spark's ``F.session_window`` (whose windows are [t, t+gap] for
    merging purposes: an event landing exactly on the previous window's
    end is absorbed, verified empirically), so this batch operator is
    the exact backfill twin of ``streaming.jobs.session_event_stats``;
    equivalence is pinned by ``test_sessionize_equals_session_window``
    including boundary-equal gaps."""
    gap_us = int(gap_minutes) * 60_000_000
    w = Window.partitionBy(user).orderBy(ts, order_tiebreak)
    # Epoch micros for BOTH timestamp and timestamp_ntz inputs (parquet
    # event logs read as NTZ; unix_micros only accepts LTZ): micros since
    # the NTZ epoch via timestampdiff, matching DuckDB's epoch_us on
    # naive timestamps.
    tus = F.expr(
        f"timestampdiff(MICROSECOND, TIMESTAMP_NTZ '1970-01-01 00:00:00', "
        f"cast({ts} as timestamp_ntz))")
    prev = F.lag(tus).over(w)
    brk = F.when(prev.isNull() | ((tus - prev) > F.lit(gap_us)), 1).otherwise(0)
    run = Window.partitionBy(user).orderBy(ts, order_tiebreak) \
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    tagged = (events
              .withColumn("__tus", tus)
              .withColumn("__brk", brk)
              .withColumn("session_id", F.sum("__brk").over(run)))
    return (tagged.groupBy(F.col(user).alias("user_id"), "session_id")
            .agg(F.count("*").alias("n_events"),
                 F.min(ts).alias("session_start"),
                 F.max(ts).alias("session_end"),
                 (F.max("__tus") - F.min("__tus")).alias("duration_us")))
