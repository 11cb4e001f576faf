"""Funnel and retention-cohort operators vs pure-python replications,
including the strict-order semantics corner cases."""

import datetime
import random

from knowledgebase_processor_spark.operators.funnel import (
    funnel_steps, funnel_summary, retention_cohorts)

T0 = datetime.datetime(2024, 1, 1)


def _t(minutes):
    return T0 + datetime.timedelta(minutes=minutes)


def test_funnel_strict_order_semantics(spark):
    rows = [
        # u1 completes all three in order
        (1, _t(0), "a"), (1, _t(10), "b"), (1, _t(20), "c"),
        # u2 has b BEFORE a only -> stops after a
        (2, _t(5), "b"), (2, _t(9), "a"),
        # u3: a, then c, then b, then c -> b counts, and the FIRST c
        # after b (t=40) is the conversion, not the earlier c
        (3, _t(0), "a"), (3, _t(1), "c"), (3, _t(2), "b"), (3, _t(40), "c"),
        # u4 never does a -> excluded entirely
        (4, _t(0), "b"), (4, _t(1), "c"),
        # u5: b at exactly t(a) -> strictly-after excludes it
        (5, _t(7), "a"), (5, _t(7), "b"),
    ]
    df = spark.createDataFrame(rows, "user_id long, ts timestamp, event_type string")
    got = {r["user_id"]: (r["t1"], r["t2"], r["t3"])
           for r in funnel_steps(df, ["a", "b", "c"]).collect()}
    assert set(got) == {1, 2, 3, 5}
    assert got[1] == (_t(0), _t(10), _t(20))
    assert got[2] == (_t(9), None, None)
    assert got[3] == (_t(0), _t(2), _t(40))
    assert got[5] == (_t(7), None, None)

    summary = {r["step_name"]: r["n_users"]
               for r in funnel_summary(df, ["a", "b", "c"]).collect()}
    assert summary == {"a": 4, "b": 2, "c": 2}


def _py_funnel(rows, steps):
    by_u = {}
    for u, ts, et in rows:
        by_u.setdefault(u, []).append((ts, et))
    out = {}
    for u, evs in by_u.items():
        ts_list = []
        prev = None
        for s in steps:
            cands = [t for t, et in evs if et == s
                     and (prev is None or t > prev)]
            if not cands:
                break
            prev = min(cands)
            ts_list.append(prev)
        if ts_list:
            out[u] = tuple(ts_list + [None] * (len(steps) - len(ts_list)))
    return out


def test_funnel_random_matches_python(spark):
    rng = random.Random(31)
    rows = [(rng.randrange(40), _t(rng.randrange(5000)),
             rng.choice("abcd")) for _ in range(800)]
    df = spark.createDataFrame(rows, "user_id long, ts timestamp, event_type string")
    got = {r["user_id"]: (r["t1"], r["t2"], r["t3"])
           for r in funnel_steps(df, ["a", "b", "c"]).collect()}
    assert got == _py_funnel(rows, ["a", "b", "c"])


def test_retention_cohorts_matches_python(spark):
    rng = random.Random(13)
    rows = [(rng.randrange(30), _t(rng.randrange(60 * 24 * 70)))
            for _ in range(1000)]
    df = spark.createDataFrame(rows, "user_id long, ts timestamp")
    got = {(r["cohort_week"], r["offset_weeks"]): r["n_users"]
           for r in retention_cohorts(df).collect()}

    def wk(ts):
        d = ts.date()
        monday = d - datetime.timedelta(days=d.weekday())
        return datetime.datetime(monday.year, monday.month, monday.day)
    first = {}
    for u, ts in rows:
        w = wk(ts)
        first[u] = min(first.get(u, w), w)
    cells = {}
    for u, ts in set((u, wk(ts)) for u, ts in rows):
        off = int((ts - first[u]).total_seconds() // (7 * 24 * 3600))
        cells.setdefault((first[u], off), set()).add(u)
    assert got == {k: len(v) for k, v in cells.items()}


# -------------------------------------------------------- record merge ----

def test_merge_records_survivorship_and_lineage(spark):
    from pyspark.sql import functions as F
    from knowledgebase_processor_spark.operators.recordmerge import (
        merge_records)
    a = spark.createDataFrame(
        [(1, "en", 10), (2, None, 20), (3, "de", None)],
        "k long, lang string, n long")
    b = spark.createDataFrame(
        [(2, "fr", 99), (3, "es", 30), (4, "it", 40)],
        "k long, lang string, n long")
    got = {r["k"]: r.asDict()
           for r in merge_records([("a", a), ("b", b)], "k",
                                  ["lang", "n"]).collect()}
    assert got[1] == {"k": 1, "lang": "en", "lang__src": "a",
                      "n": 10, "n__src": "a", "present_in": "a"}
    # a's NULL lang loses to b's value; a's n wins by priority
    assert got[2] == {"k": 2, "lang": "fr", "lang__src": "b",
                      "n": 20, "n__src": "a", "present_in": "a,b"}
    assert got[3] == {"k": 3, "lang": "de", "lang__src": "a",
                      "n": 30, "n__src": "b", "present_in": "a,b"}
    assert got[4] == {"k": 4, "lang": "it", "lang__src": "b",
                      "n": 40, "n__src": "b", "present_in": "b"}
