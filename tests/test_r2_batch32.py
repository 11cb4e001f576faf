"""Batch-32 round-2: l-diversity audit (operators/kanon.py) and the
stateful streaming politeness scheduler (streaming/stateful.py)."""

import pandas as pd

from knowledgebase_processor_spark.operators.kanon import (
    l_diversity_report)
from knowledgebase_processor_spark.streaming.stateful import (
    apply_politeness_state, schedule_frontier_stream)


# ---------------------------------------------------------- l-diversity ----

def test_l_diversity_hand_computed(spark):
    rows = [
        # class (us, en): 3 rows, 3 distinct diagnoses -> diverse
        ("us", "en", "a"), ("us", "en", "b"), ("us", "en", "c"),
        # class (de, de): 4 rows, ONE diagnosis -> violates l>=2
        ("de", "de", "x"), ("de", "de", "x"),
        ("de", "de", "x"), ("de", "de", "x"),
        # class (fr, fr): 2 rows, 2 values
        ("fr", "fr", "p"), ("fr", "fr", "q"),
    ]
    df = spark.createDataFrame(rows, "geo string, lang string, diag string")
    out = {r.l: r for r in l_diversity_report(
        df, ["geo", "lang"], "diag", ls=[2, 3]).collect()}
    l2 = out[2]
    assert (l2.n_rows, l2.n_groups, l2.min_diversity) == (9, 3, 1)
    assert (l2.n_violating_groups, l2.rows_at_risk) == (1, 4)
    assert l2.risk_ppm == 4 * 1_000_000 // 9
    l3 = out[3]
    assert (l3.n_violating_groups, l3.rows_at_risk) == (2, 6)


def test_l_diversity_all_diverse_zero_risk(spark):
    rows = [("g", f"s{i}") for i in range(5)]
    df = spark.createDataFrame(rows, "qi string, s string")
    r = l_diversity_report(df, ["qi"], "s", ls=[5]).collect()[0]
    assert (r.n_violating_groups, r.risk_ppm) == (0, 0)


# --------------------------------------------------- streaming politeness ----

class _FakeState:
    def __init__(self):
        self.exists = False
        self._v = None

    @property
    def get(self):
        return self._v

    def update(self, v):
        self._v = tuple(v)
        self.exists = True


def test_apply_politeness_state_continues_across_batches():
    st = _FakeState()
    b1 = pd.DataFrame({"host": ["h"] * 2, "url": ["u_b", "u_a"],
                       "priority": [5, 5], "delay_ms": [100, 100]})
    out1 = next(apply_politeness_state(("h",), iter([b1]), st))
    assert list(out1.url) == ["u_a", "u_b"]        # url tie-break
    assert list(out1.slot) == [0, 1]
    b2 = pd.DataFrame({"host": ["h"], "url": ["u_c"],
                       "priority": [9], "delay_ms": [100]})
    out2 = next(apply_politeness_state(("h",), iter([b2]), st))
    assert list(out2.slot) == [2]                  # continues, no reset
    assert list(out2.fetch_at_ms) == [200]


def test_schedule_frontier_stream_end_to_end(spark, tmp_path):
    src = tmp_path / "in"
    src.mkdir()
    b = spark.createDataFrame(
        [("h", "u1", 9, 500), ("h", "u2", 1, 500), ("g", "g1", 1, 100)],
        "host string, url string, priority long, delay_ms long")
    b.write.parquet(str(src / "b0"))
    stream = spark.readStream.schema(b.schema).parquet(str(src / "*"))
    q = (schedule_frontier_stream(stream)
         .writeStream.format("memory").queryName("polite_mem")
         .option("checkpointLocation", str(tmp_path / "ckpt"))
         .trigger(availableNow=True).start())
    q.awaitTermination(120)
    got = {r.url: (r.slot, r.fetch_at_ms)
           for r in spark.sql("SELECT * FROM polite_mem").collect()}
    assert got == {"u1": (0, 0), "u2": (1, 500), "g1": (0, 0)}
