"""Batch-50 round-2: stream-stream watermarked join
(streaming/jobs.py::join_fetch_stream)."""

import datetime as dt

from knowledgebase_processor_spark.streaming.jobs import (
    join_fetch_stream)


def _ts(minute):
    return (dt.datetime(2026, 1, 1, 12, 0, 0)
            + dt.timedelta(minutes=minute))


def test_stream_stream_join_matches_within_lag(spark, tmp_path):
    req_rows = [("A", _ts(0)), ("B", _ts(0)), ("C", _ts(0)),
                ("D", _ts(30))]
    resp_rows = [("A", _ts(10), 200),      # within the 60-min lag
                 ("B", _ts(0 + 59), 200),  # just inside
                 ("B", _ts(0) - dt.timedelta(minutes=5), 500),  # early
                 ("E", _ts(5), 404),       # no request
                 ("D", _ts(95), 200)]      # 65 min late -> dropped
    req_df = spark.createDataFrame(req_rows, "url string, req_ts timestamp")
    resp_df = spark.createDataFrame(
        resp_rows, "r_url string, resp_ts timestamp, status int")
    req_dir, resp_dir = str(tmp_path / "req"), str(tmp_path / "resp")
    req_df.write.parquet(req_dir)
    resp_df.write.parquet(resp_dir)

    req_s = spark.readStream.schema(req_df.schema).parquet(req_dir)
    resp_s = spark.readStream.schema(resp_df.schema).parquet(resp_dir)
    out = join_fetch_stream(req_s, resp_s, max_lag_minutes=60)
    q = (out.writeStream.format("memory").queryName("fetchjoin")
         .outputMode("append").trigger(availableNow=True).start())
    q.awaitTermination(120)
    got = {(r.url, r.status, r.lag_s)
           for r in spark.sql("SELECT * FROM fetchjoin").collect()}
    assert got == {("A", 200, 600), ("B", 200, 59 * 60)}

    # batch twin: the same join condition in plain SQL agrees
    req_df.createOrReplaceTempView("rq")
    resp_df.createOrReplaceTempView("rs")
    batch = {(r.url, r.status) for r in spark.sql(
        "SELECT url, status FROM rq JOIN rs ON url = r_url"
        " AND resp_ts >= req_ts"
        " AND resp_ts <= req_ts + INTERVAL 60 MINUTES").collect()}
    assert batch == {(u, s) for u, s, _ in got}
