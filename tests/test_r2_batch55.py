"""Batch-55 round-2: consistent-hash migration cost and salting
simulation (operators/sharding.py)."""

from knowledgebase_processor_spark.operators.sharding import (
    migration_cost, ring_positions, salting_simulation)


def test_ring_positions_deterministic_and_sorted():
    a, b = ring_positions(4, 8), ring_positions(4, 8)
    assert a == b
    assert [p for _, p in a] == sorted(p for _, p in a)
    assert len(a) == 32
    assert {s for s, _ in a} == set(range(4))


def test_migration_ring_far_cheaper_than_mod(spark):
    df = spark.range(0, 2000).selectExpr(
        "'k' || CAST(id AS STRING) AS key")
    r = migration_cost(df, "key", n_from=8, n_to=9).collect()[0]
    assert r.n_keys == 2000
    # theory: ring ~ 1/9 (11%) within slack, mod ~ 8/9 (89%)
    assert r.moved_ring_ppm < 250_000
    assert r.moved_mod_ppm > 700_000
    assert r.moved_ring_ppm < r.moved_mod_ppm // 3


def test_migration_same_n_moves_nothing(spark):
    df = spark.range(0, 300).selectExpr("CAST(id AS STRING) AS key")
    r = migration_cost(df, "key", n_from=8, n_to=8).collect()[0]
    assert (r.moved_ring, r.moved_mod) == (0, 0)


def test_salting_splits_hot_key(spark):
    # 90% of rows on one key: plain max load ~ all of it; salt=9
    # splits the hot key across ~9 reducers
    rows = [(i, "hot" if i % 10 != 0 else f"c{i}")
            for i in range(3000)]
    df = spark.createDataFrame(rows, "id long, key string")
    r = salting_simulation(df, "key", "id", n_reducers=16,
                           salt=9).collect()[0]
    assert r.n_rows == 3000
    assert r.max_load_plain >= 2700        # the hot reducer
    assert r.max_load_salted < 900         # split ~9 ways (+ noise)
    assert r.speedup_ppm > 3_000_000


def test_salting_uniform_keys_no_regression(spark):
    df = spark.range(0, 3200).selectExpr(
        "id", "'k' || CAST(id % 64 AS STRING) AS key")
    r = salting_simulation(df, "key", "id", n_reducers=16,
                           salt=8).collect()[0]
    # already-balanced loads must not blow up under salting
    assert r.max_load_salted <= r.max_load_plain * 2
