"""Hopping (sliding) time-window aggregates — the overlapping-window
twin of q19's tumbling windows and q50's gap sessions.

Beyond-reference (streaming/analytics family; SURVEY.md §2 round-2
surface): crawl-rate and event-rate dashboards want smoothed windows
("events per hour, every 30 minutes"), which is exactly Spark's
``F.window(ts, window, slide)`` — each row is assigned to
window/slide overlapping windows by pure codegen arithmetic (no
explode-join; Catalyst expands the window set inline), then a plain
partial-aggregatable groupBy.

Scale shape: the row multiplication factor is window/slide (2 here),
constant and explicit; aggregation is map-side combinable on
(window, type) keys, so the exchange carries the (tiny) window grid,
not the events.  The same expression drives the structured-streaming
twin (`streaming/jobs.py`'s watermarked aggregations) — hopping windows
are watermark-compatible because window starts are a pure function of
event time.

Determinism / portability: Spark aligns window starts to the epoch grid
(floor(epoch/slide)*slide); the DuckDB oracle (q82) reproduces the
same grid with integer epoch arithmetic, and sums are decimal-exact
before the final double cast (the q01/q19 convention).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F


def hopping_window_stats(events: DataFrame, window: str = "1 hour",
                         slide: str = "30 minutes",
                         ts_col: str = "ts",
                         type_col: str = "event_type",
                         value_col: str = "value") -> DataFrame:
    """(window_start, window_end, event_type, n_events, sum_value) over
    hopping windows; sum is decimal-exact then cast to double."""
    w = F.window(F.col(ts_col), window, slide)
    return (events.groupBy(w.alias("w"), F.col(type_col).alias("event_type"))
            .agg(F.count(F.lit(1)).alias("n_events"),
                 F.sum(F.col(value_col).cast("decimal(18,4)"))
                  .cast("double").alias("sum_value"))
            .select(F.col("w.start").alias("window_start"),
                    F.col("w.end").alias("window_end"),
                    "event_type", "n_events", "sum_value"))
