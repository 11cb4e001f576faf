"""Round-2 additions, batch 10: TPC-H-Q5-shaped star join (plan shape),
Hill tail-index, small-file compaction planner — each against its
defining invariant (dims broadcast, estimator recovers a planted Pareto
alpha / python replication, bins contiguous with bounded overshoot)."""

import math
import random

from pyspark.sql import functions as F

from knowledgebase_processor_spark.operators.compaction import (
    compaction_plan, compaction_summary)
from knowledgebase_processor_spark.operators.tailindex import (
    SCALE, hill_tail_index)


# ------------------------------------------------- star join plan ----

def test_q122_broadcasts_the_dimensions(spark):
    import __spark_entry__ as entry
    df = entry.queries()["q122_regional_revenue"](
        spark, "/root/testdata/sf0.001")
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert plan.count("BroadcastHashJoin") >= 2
    df.collect()  # and it runs


# --------------------------------------------------- Hill estimator ----

def _vals(spark, xs):
    return spark.createDataFrame(
        [(i, float(x)) for i, x in enumerate(xs)], "rid long, x double")


def test_hill_recovers_planted_pareto_alpha(spark):
    # inverse-CDF Pareto(alpha=2): x = (1-u)^(-1/2); 4000 samples ->
    # the top-100 Hill estimate lands near 2
    rng = random.Random(10)
    xs = [(1.0 - rng.random()) ** -0.5 for _ in range(4000)]
    out = hill_tail_index(_vals(spark, xs), "x", "rid",
                          ks=[50, 100]).collect()
    for r in out:
        assert 1.4 <= r.alpha <= 2.8, r


def test_hill_matches_python_replication(spark):
    rng = random.Random(11)
    xs = [rng.uniform(1, 1000) for _ in range(200)]
    out = {r.k: r for r in hill_tail_index(
        _vals(spark, xs), "x", "rid", ks=[10, 25]).collect()}
    ranked = sorted(enumerate(xs), key=lambda p: (-p[1], p[0]))
    for k in (10, 25):
        x_tail = ranked[k][1]
        s = sum(round(SCALE * math.log(x / x_tail))
                for _, x in ranked[:k])
        assert out[k].x_tail == x_tail
        assert out[k].sum_ln_micro == s
        assert out[k].alpha == round(k * float(SCALE) / s, 6)


def test_hill_omits_k_beyond_data(spark):
    out = hill_tail_index(_vals(spark, [5.0, 4.0, 3.0]), "x", "rid",
                          ks=[2, 50]).collect()
    assert {r.k for r in out} == {2}


# ------------------------------------------------------ compaction ----

def _files(spark, sizes):
    return spark.createDataFrame(
        [(i, s) for i, s in enumerate(sizes)], "file_id long, bytes long")


def test_compaction_matches_python_replication(spark):
    rng = random.Random(12)
    sizes = [rng.randrange(1, 5000) for _ in range(500)]
    target = 20_000
    got = {r.file_id: r for r in
           compaction_plan(_files(spark, sizes), target).collect()}
    cum = 0
    for i, s in enumerate(sizes):
        assert got[i].cum_before == cum
        assert got[i].bin == cum // target
        cum += s
    assert len(got) == len(sizes)


def test_compaction_bins_contiguous_and_bounded(spark):
    rng = random.Random(13)
    sizes = [rng.randrange(1, 8000) for _ in range(400)]
    target = 25_000
    rows = sorted(compaction_summary(_files(spark, sizes), target)
                  .collect(), key=lambda r: r.bin)
    # bins cover the file range contiguously in commit order
    assert rows[0].first_file == 0
    for a, b in zip(rows, rows[1:]):
        assert b.first_file == a.last_file + 1
    assert rows[-1].last_file == len(sizes) - 1
    assert sum(r.n_files for r in rows) == len(sizes)
    # bounded overshoot: a group never exceeds target + max_file - 1
    mx = max(sizes)
    for r in rows:
        assert r.group_bytes <= target + mx - 1
        # and every non-final group reaches the target boundary
        if r.bin != rows[-1].bin:
            assert r.group_bytes + mx > target


def test_compaction_single_giant_file_gets_own_bins_row(spark):
    rows = compaction_summary(_files(spark, [100, 90_000, 100]),
                              target_bytes=50_000).collect()
    by_bin = {r.bin: r for r in rows}
    # the giant file starts in bin 0 (cum_before=100) and pushes the
    # next file to bin (100+90000)//50000 = 1
    assert by_bin[0].n_files == 2
    assert by_bin[1].n_files == 1
    assert by_bin[1].first_file == 2
