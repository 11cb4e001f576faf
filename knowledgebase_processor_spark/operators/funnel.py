"""Ordered funnel analysis and retention cohorts over the event log.

Beyond-reference (event-analytics family, next to sessions.py /
windows.py / rollup.py): the two queries every product/crawl event
pipeline runs daily.

* ``funnel_steps`` — STRICT ordered funnels (Amplitude/Mixpanel
  semantics): a user converts step k only with an event of type k
  STRICTLY AFTER their step-(k-1) conversion time; the conversion time
  is the earliest such event.  Expressed as one aggregate per step on
  the user key: step 1 is min(ts | type=s1); step k is a join of the
  (one-row-per-user) step-(k-1) frame back onto the events filtered to
  type s_k with ts > prev — every join is on the same user key, so AQE
  reuses one exchange layout, and each aggregate is
  partial-aggregatable min().
* ``retention_cohorts`` — the weekly cohort/offset triangle: cohort =
  the user's first-activity week, one row per (cohort_week,
  offset_weeks) with distinct active users.  Two partial-aggregatable
  groupBys on the user key; offsets are integer epoch-week arithmetic
  so the q91 oracle replays exactly.

Both are pure timestamp min/count integer-exact computations — no
floats anywhere — so DuckDB value-checks them bit-for-bit (q91/q92).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

WEEK_SECONDS = 7 * 24 * 3600


def funnel_steps(events: DataFrame, steps: list[str],
                 user_col: str = "user_id", ts_col: str = "ts",
                 type_col: str = "event_type") -> DataFrame:
    """One row per user who completed step 1, with nullable conversion
    timestamps ``t1..tn`` for each funnel step."""
    e = events.select(F.col(user_col).alias("u"),
                      F.col(ts_col).alias("ts"),
                      F.col(type_col).alias("et"))
    cur = (e.filter(F.col("et") == steps[0])
           .groupBy("u").agg(F.min("ts").alias("t1")))
    for i, step in enumerate(steps[1:], start=2):
        nxt = (cur.join(e.filter(F.col("et") == step), "u")
               .filter(F.col("ts") > F.col(f"t{i-1}"))
               .groupBy("u").agg(F.min("ts").alias(f"t{i}")))
        cur = cur.join(nxt, "u", "left")
    return cur.select(F.col("u").alias(user_col),
                      *[f"t{i}" for i in range(1, len(steps) + 1)])


def funnel_summary(events: DataFrame, steps: list[str],
                   user_col: str = "user_id", ts_col: str = "ts",
                   type_col: str = "event_type") -> DataFrame:
    """(step, step_name, n_users) — users converting each step, in
    order; the classic funnel report."""
    per_user = funnel_steps(events, steps, user_col, ts_col, type_col)
    aggs = [F.count(F.col(f"t{i}")).cast("bigint").alias(f"n{i}")
            for i in range(1, len(steps) + 1)]
    wide = per_user.agg(*aggs)
    parts = None
    for i, name in enumerate(steps, start=1):
        row = wide.select(F.lit(i).alias("step"),
                          F.lit(name).alias("step_name"),
                          F.col(f"n{i}").alias("n_users"))
        parts = row if parts is None else parts.unionByName(row)
    return parts


def retention_cohorts(events: DataFrame, user_col: str = "user_id",
                      ts_col: str = "ts") -> DataFrame:
    """(cohort_week, offset_weeks, n_users): distinct users of cohort w
    active in week w + offset.  Weeks are Monday-truncated; offsets are
    exact integer epoch arithmetic."""
    e = events.select(F.col(user_col).alias("u"),
                      F.date_trunc("week", F.col(ts_col)).alias("wk"))
    first = e.groupBy("u").agg(F.min("wk").alias("cohort_week"))
    active = e.distinct()
    j = active.join(first, "u")
    off = ((F.unix_timestamp("wk") - F.unix_timestamp("cohort_week"))
           / WEEK_SECONDS).cast("bigint")
    return (j.select("u", "cohort_week", off.alias("offset_weeks"))
            .groupBy("cohort_week", "offset_weeks")
            .agg(F.countDistinct("u").cast("bigint").alias("n_users")))
