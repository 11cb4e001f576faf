"""Round-2 additions, batch 3: hopping windows, distributed global rank,
sorted-neighborhood blocking, RRF fusion, URL rule filtering."""

import datetime
import itertools
import random

from pyspark.sql import functions as F

from knowledgebase_processor_spark.operators.rank import (
    global_rank, rrf_fuse, sorted_neighborhood_pairs)
from knowledgebase_processor_spark.operators.urlrules import (
    apply_url_rules, url_allowed)
from knowledgebase_processor_spark.operators.windows import (
    hopping_window_stats)


# ------------------------------------------------------------ windows ----

def test_hopping_windows_cover_each_event_twice(spark):
    base = datetime.datetime(2024, 1, 1)
    rows = [(base + datetime.timedelta(minutes=7 * i), "t", 1.0)
            for i in range(100)]
    df = spark.createDataFrame(rows, "ts timestamp, event_type string, value double")
    out = hopping_window_stats(df, "1 hour", "30 minutes").collect()
    # every event lands in exactly window/slide = 2 windows
    assert sum(r["n_events"] for r in out) == 200
    for r in out:
        assert (r["window_end"] - r["window_start"]).total_seconds() == 3600
        assert r["window_start"].minute in (0, 30)
        assert r["window_start"].second == 0


def test_hopping_window_membership_is_correct(spark):
    ts = datetime.datetime(2024, 1, 1, 10, 42, 13)
    df = spark.createDataFrame([(ts, "x", 2.5)],
                               "ts timestamp, event_type string, value double")
    got = sorted((r["window_start"], r["sum_value"])
                 for r in hopping_window_stats(df).collect())
    assert got == [(datetime.datetime(2024, 1, 1, 10, 0), 2.5),
                   (datetime.datetime(2024, 1, 1, 10, 30), 2.5)]


# -------------------------------------------------------- global rank ----

def test_global_rank_is_contiguous_and_order_correct(spark):
    rng = random.Random(9)
    rows = [(i, rng.randrange(1000)) for i in range(500)]
    df = spark.createDataFrame(rows, "id long, key long").repartition(7)
    got = global_rank(df, ["key", "id"]).collect()
    expect = {i: r + 1 for r, (i, _) in
              enumerate(sorted(rows, key=lambda t: (t[1], t[0])))}
    assert {r["id"]: r["rank"] for r in got} == expect
    # no single-partition exchange: plan must NOT contain a global sort
    # window (the whole point); spot-check the plan string
    plan = global_rank(df, ["key", "id"])._jdf.queryExecution() \
        .executedPlan().toString()
    assert "SinglePartition" not in plan


def test_sorted_neighborhood_equals_naive(spark):
    rng = random.Random(4)
    rows = [(i, rng.randrange(50)) for i in range(120)]
    df = spark.createDataFrame(rows, "id long, key long").repartition(5)
    got = {(r["id_a"], r["id_b"]) for r in
           sorted_neighborhood_pairs(df, "id", ["key", "id"], w=4).collect()}
    order = sorted(rows, key=lambda t: (t[1], t[0]))
    naive = {(order[i][0], order[j][0])
             for i in range(len(order))
             for j in range(i + 1, min(i + 5, len(order)))}
    assert got == naive
    assert len(got) > 0


# ---------------------------------------------------------------- RRF ----

def test_rrf_fusion_matches_python(spark):
    r1 = spark.createDataFrame([(i, i + 1) for i in range(10)],
                               "id long, rank long")
    r2 = spark.createDataFrame([(i, 10 - i) for i in range(10)],
                               "id long, rank long")
    got = [(r["id"], r["rrf_score"], r["n_lists"])
           for r in rrf_fuse([r1, r2], "id", k=60).collect()]
    exp = sorted(((i, 1.0 / (60 + i + 1) + 1.0 / (60 + 10 - i), 2)
                  for i in range(10)),
                 key=lambda t: (-t[1], t[0]))
    assert got == exp


def test_rrf_missing_from_one_list_contributes_nothing(spark):
    r1 = spark.createDataFrame([(1, 1), (2, 2)], "id long, rank long")
    r2 = spark.createDataFrame([(2, 1)], "id long, rank long")
    got = {r["id"]: (r["rrf_score"], r["n_lists"])
           for r in rrf_fuse([r1, r2], "id").collect()}
    assert got[1] == (1.0 / 61, 1)
    assert got[2] == (1.0 / 62 + 1.0 / 61, 2)


# ---------------------------------------------------------- URL rules ----

def test_url_rules_longest_match_and_allow_tiebreak(spark):
    rules = [("/a", False), ("/a/b", True), ("/a/b/c", False),
             ("/t", False), ("/t", True)]
    cases = [("/a/x", False),        # only /a matches
             ("/a/b/x", True),       # /a/b beats /a
             ("/a/b/c/x", False),    # /a/b/c beats /a/b
             ("/t/q", True),         # same-length tie: allow wins
             ("/zzz", True)]         # no rule: default allow
    df = spark.createDataFrame([(p,) for p, _ in cases], "path string")
    got = {r["path"]: r["allowed"]
           for r in apply_url_rules(df, "path", rules).collect()}
    assert got == dict(cases)


def test_url_rules_prefix_is_bytewise_not_segment(spark):
    # robots prefix semantics: /src1 also blocks /src12 (documented spec)
    df = spark.createDataFrame([("/src12/doc",), ("/src1/doc",)],
                               "path string")
    got = {r["path"]: r["allowed"]
           for r in apply_url_rules(df, "path", [("/src1", False)])
           .collect()}
    assert got == {"/src12/doc": False, "/src1/doc": False}


# ------------------------------------------------- streaming hopping ----

def test_hopping_stream_matches_batch(spark, tmp_path):
    import datetime
    from knowledgebase_processor_spark.streaming.jobs import (
        hopping_event_stats)
    base = datetime.datetime(2024, 1, 1)
    rows = [(base + datetime.timedelta(minutes=11 * i),
             "t" if i % 3 else "u", float(i)) for i in range(60)]
    batch = spark.createDataFrame(
        rows, "ts timestamp, event_type string, value double")
    src = str(tmp_path / "ev")
    batch.write.parquet(src)
    stream = spark.readStream.schema(batch.schema).parquet(src)
    out_dir = str(tmp_path / "out")
    q = (hopping_event_stats(stream, watermark="0 seconds").writeStream
         .outputMode("append")
         .option("checkpointLocation", str(tmp_path / "ckpt"))
         .trigger(availableNow=True)
         .start(out_dir))
    q.awaitTermination(120)
    got = {(str(r["window_start"]), r["event_type"]):
           (r["n_events"], r["sum_value"])
           for r in spark.read.parquet(out_dir).collect()}
    # append mode emits only windows CLOSED by the final watermark
    # (= max event time with a 0s delay); trailing open windows stay in
    # state — the defined streaming semantics, so pin exactly that set
    max_ts = max(r[0] for r in rows)
    exp = {(str(r["window_start"]), r["event_type"]):
           (r["n_events"], r["sum_value"])
           for r in hopping_window_stats(batch).collect()
           if r["window_end"] <= max_ts}
    assert got == exp and len(got) > 4


def test_correlate_event_streams_matches_batch_join(spark, tmp_path):
    """Stream-stream interval join == the batch interval join on the
    same inputs: inner matches emit as both sides arrive, the watermark
    only bounds state, so an availableNow run over finite sources must
    produce the complete match set."""
    import datetime
    from knowledgebase_processor_spark.streaming.jobs import (
        correlate_event_streams)
    base = datetime.datetime(2024, 1, 1)
    clicks, errors = [], []
    for i in range(40):
        clicks.append((i % 5, 1000 + i, base + datetime.timedelta(minutes=3 * i)))
        if i % 2:
            errors.append((i % 5, 2000 + i,
                           base + datetime.timedelta(minutes=3 * i + 4)))
    schema = "user_id long, event_id long, ts timestamp"
    cdf = spark.createDataFrame(clicks, schema)
    edf = spark.createDataFrame(errors, schema)
    csrc, esrc = str(tmp_path / "c"), str(tmp_path / "e")
    cdf.write.parquet(csrc)
    edf.write.parquet(esrc)
    cs = spark.readStream.schema(cdf.schema).parquet(csrc)
    es = spark.readStream.schema(edf.schema).parquet(esrc)
    out = str(tmp_path / "out")
    q = (correlate_event_streams(cs, es).writeStream
         .outputMode("append")
         .option("checkpointLocation", str(tmp_path / "ckpt"))
         .trigger(availableNow=True)
         .start(out))
    q.awaitTermination(180)
    got = {(r.key, r.l_event, r.r_event)
           for r in spark.read.parquet(out).collect()}
    exp = {(c[0], c[1], e[1])
           for c in clicks for e in errors
           if c[0] == e[0] and c[2] < e[2]
           and e[2] <= c[2] + datetime.timedelta(minutes=5)}
    assert got == exp and len(exp) > 10
    # batch equivalence: same function on static frames, same rows
    batch = {(r.key, r.l_event, r.r_event)
             for r in correlate_event_streams(cdf, edf).collect()}
    assert batch == exp
