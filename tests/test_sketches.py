"""Distinct-count sketches: bit-exact vs a pure-python HLL/KMV, merge
property, accuracy envelope, and the partial-aggregation plan shape."""

import hashlib
import math

import pytest
from pyspark.sql import functions as F

from knowledgebase_processor_spark.operators.sketches import (
    HEX_DIGITS, _hll_alpha, hll_distinct, hll_registers, kmv_distinct)

M = 256          # p_nibbles=2
NBITS = 52


def _py_hll(values, salt="hll"):
    regs = {}
    for v in values:
        hx = hashlib.md5(f"{salt}|{v}".encode()).hexdigest()[:HEX_DIGITS]
        b = int(hx[:2], 16)
        rest = int(hx[2:], 16)
        rho = (NBITS - rest.bit_length()) + 1 if rest > 0 else NBITS + 1
        regs[b] = max(regs.get(b, 0), rho)
    sum_fixed = (sum(2 ** (NBITS + 1 - r) for r in regs.values())
                 + (M - len(regs)) * 2 ** (NBITS + 1))
    zeros = M - len(regs)
    raw = _hll_alpha(M) * M * M * float(2 ** (NBITS + 1)) / sum_fixed
    est = (M * math.log(M / zeros) if (raw <= 2.5 * M and zeros > 0)
           else raw)
    return regs, sum_fixed, zeros, round(est, 4)


def _py_kmv(values, k=64, salt="kmv"):
    hs = sorted({int(hashlib.md5(f"{salt}|{v}".encode())
                     .hexdigest()[:HEX_DIGITS], 16) for v in values})
    if len(hs) >= k:
        return hs[k - 1], round((k - 1) * float(1 << 60) / hs[k - 1], 4)
    return -1, round(float(len(hs)), 4)


@pytest.fixture(scope="module")
def sketch_df(spark):
    rows = ([("a", f"tok{i}") for i in range(5000)]
            + [("a", f"tok{i}") for i in range(500)]      # duplicates
            + [("b", f"w{i}") for i in range(300)]
            + [("c", f"u{i}") for i in range(40)])        # < k distinct
    return spark.createDataFrame(rows, "g string, v string")


def test_hll_bit_exact_vs_python(spark, sketch_df):
    got = {r.g: r for r in hll_distinct(sketch_df, ["g"], "v").collect()}
    for g, values in [("a", [f"tok{i}" for i in range(5000)]),
                      ("b", [f"w{i}" for i in range(300)])]:
        _, sum_fixed, zeros, est = _py_hll(values)
        assert got[g].hll_sum_fixed == sum_fixed
        assert got[g].hll_zero_registers == zeros
        assert got[g].hll_estimate == pytest.approx(est, abs=1e-9)


def test_kmv_bit_exact_vs_python(spark, sketch_df):
    got = {r.g: r for r in kmv_distinct(sketch_df, ["g"], "v").collect()}
    for g, values in [("a", [f"tok{i}" for i in range(5000)]),
                      ("b", [f"w{i}" for i in range(300)])]:
        kth, est = _py_kmv(values)
        assert got[g].kmv_kth == kth
        assert got[g].kmv_estimate == pytest.approx(est, abs=1e-9)


def test_estimates_within_envelope(spark, sketch_df):
    # m=256 -> ~6.5% HLL std error; k=64 -> ~12.5% KMV std error.
    h = {r.g: r.hll_estimate
         for r in hll_distinct(sketch_df, ["g"], "v").collect()}
    k = {r.g: r.kmv_estimate
         for r in kmv_distinct(sketch_df, ["g"], "v").collect()}
    assert abs(h["a"] - 5000) / 5000 < 0.25
    assert abs(k["a"] - 5000) / 5000 < 0.40
    # mid group: linear-counting HLL branch, estimating KMV branch
    assert abs(h["b"] - 300) / 300 < 0.25
    assert abs(k["b"] - 300) / 300 < 0.40
    # tiny group (< k distinct): KMV falls back to the exact count
    assert k["c"] == 40.0


def test_hll_registers_merge(spark, sketch_df):
    """Sketches of disjoint slices merged register-wise == whole sketch —
    the property that lets per-partition sketches be persisted and rolled
    up without rescanning."""
    half1 = sketch_df.filter(F.crc32(F.col("v")) % 2 == 0)
    half2 = sketch_df.filter(F.crc32(F.col("v")) % 2 == 1)
    merged = (hll_registers(half1, ["g"], "v")
              .unionByName(hll_registers(half2, ["g"], "v"))
              .groupBy("g", "bucket").agg(F.max("rho").alias("rho")))
    whole = hll_registers(sketch_df, ["g"], "v")
    assert (merged.exceptAll(whole).isEmpty()
            and whole.exceptAll(merged).isEmpty())


def test_hll_all_zero_suffix_register_is_integer(spark):
    """rho = nbits+1 (all-zero 52-bit suffix) must stay exact integer
    fixed point — the 2^(nbits+1-rho) scaling exists for this row."""
    df = spark.createDataFrame([("g", "x")], "g string, v string")
    # fabricate the degenerate register by checking the formula directly:
    # a register with rho = 53 contributes 2^0 = 1
    from knowledgebase_processor_spark.operators.sketches import (
        hll_rho_sql)
    row = spark.sql(
        "SELECT " + hll_rho_sql("hx", 2).replace(
            "hx", "'ff0000000000000'") + " AS rho").collect()[0]
    assert row.rho == NBITS + 1


def test_hll_partial_aggregation_plan(spark, sketch_df):
    """The register reduction must be algebraic: two HashAggregate spans
    (partial map-side, final after one exchange) — the sketch's whole
    scale story."""
    plan = hll_distinct(sketch_df, ["g"], "v")._jdf.queryExecution() \
                                               .executedPlan().toString()
    assert "HashAggregate" in plan


def test_kmv_window_group_limit_plan(spark, sketch_df):
    """rank <= k must compile to WindowGroupLimit so partitions forward
    at most k rows per group before the shuffle."""
    plan = kmv_distinct(sketch_df, ["g"], "v")._jdf.queryExecution() \
                                              .executedPlan().toString()
    assert "WindowGroupLimit" in plan
