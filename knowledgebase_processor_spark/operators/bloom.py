"""Bloom-filter semi-join: distributed build, broadcast-literal probe.

Beyond-reference (SURVEY.md §2 round-2 surface).  The classic 100 TB
join problem: filter a huge fact table (lineitem, a crawl log) down to
the rows whose key appears in a *selective* subset of a dimension —
an exact semi-join shuffles the full fact table on the key.  A Bloom
prefilter removes the guaranteed-absent rows MAP-SIDE, so the exact
join (needed because Bloom admits false positives) only shuffles the
tiny surviving fraction.  Spark's own runtime bloom pushdown
(``spark.sql.optimizer.runtime.bloomFilter.enabled``) does this opaquely
inside AQE; this operator makes the filter explicit, persistable, and
PORTABLE — the bit array derives from the repo's salted-md5 family, so
an external engine can rebuild and re-probe it bit-identically (q76's
DuckDB oracle replays every word and every membership verdict).

Scale shape:

* BUILD is one partial-aggregatable pass over the (distinct) build
  keys: k positions per key, ``groupBy(word_idx).agg(bit_or(mask))`` —
  the exchange carries at most m/32 rows however many keys flow in, and
  filters for disjoint key slices MERGE by further bit_or (same
  partial-rollup contract as sketches.py).
* PROBE is shuffle-free: the finished filter is m/32 32-bit words — a
  few KB — collected once and inlined as an array literal, so the
  membership test is pure whole-stage-codegen column arithmetic
  (``element_at`` + bit masks), exactly the centroid-literal pattern of
  similarity.py's IVF.
* No false negatives (every build key probes true), so prefilter +
  exact join on survivors is semantics-preserving; the false-positive
  rate is the standard (1 - e^{-kn/m})^k.

Words are 32-bit (bits 0..31 in a BIGINT) so ``1 << bit`` stays far from
sign overflow in every ANSI engine.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, functions as F

HEX_DIGITS = 15          # 60-bit salted-md5 family shared with dedup.py
WORD_BITS = 32


def _bit_pos(key_col: Column, i: int, m_bits: int) -> Column:
    hv = F.conv(F.substring(F.md5(F.concat(F.lit(f"bf{i}|"),
                                           key_col.cast("string"))),
                            1, HEX_DIGITS), 16, 10).cast("bigint")
    return (hv % m_bits).cast("int")


def _mask(bit_col: Column) -> Column:
    """``1 << bit`` for a COLUMN bit count via a 32-entry literal lookup
    (``shiftleft``'s Python API takes only a static shift)."""
    masks = F.array(*[F.lit(1 << b).cast("bigint") for b in range(WORD_BITS)])
    return F.element_at(masks, bit_col + F.lit(1))


def bloom_build(keys: DataFrame, key_col: str, m_bits: int = 4096,
                k: int = 3) -> DataFrame:
    """Distinct build keys -> sparse filter rows (word_idx, word).

    Mergeable: filters over disjoint slices combine with a further
    ``groupBy(word_idx).agg(bit_or(word))``.
    """
    kc = F.col(key_col)
    pos = keys.select(kc.alias("k")).distinct().select(
        F.explode(F.array(*[_bit_pos(F.col("k"), i, m_bits)
                            for i in range(k)])).alias("pos"))
    return (pos.select((F.col("pos") / WORD_BITS).cast("int").alias("word_idx"),
                       _mask(F.col("pos") % WORD_BITS).alias("mask"))
            .groupBy("word_idx")
            .agg(F.bit_or("mask").alias("word")))


def bloom_words(bloom_df: DataFrame, m_bits: int = 4096) -> list[int]:
    """Densify the sparse filter to a word list (driver-side; the filter
    is m/32 rows — a one-time few-KB collect, the broadcast step)."""
    words = [0] * (m_bits // WORD_BITS)
    rows = bloom_df.collect()
    # size contract: one row per distinct word_idx, i.e. <= m/32 rows
    assert len(rows) <= m_bits // WORD_BITS
    for r in rows:
        words[int(r["word_idx"])] = int(r["word"])
    return words


def bloom_member(key_col: Column, words: list[int], m_bits: int = 4096,
                 k: int = 3) -> Column:
    """Pure-codegen membership test against an inlined word array.

    The literal is created with ONE ``F.lit(list)`` call — building it
    as 2048 individual ``F.lit`` columns costs seconds of py4j
    round-trips at plan-construction time (measured 5.5 s for m=65536)."""
    arr = F.lit([int(w) for w in words]).cast("array<bigint>")
    # deliberately a plain AND-chain of k conjuncts, NOT forall(): the
    # higher-order functions are interpreted per row while the conjunct
    # chain stays inside whole-stage codegen (measured ~2x runtime)
    cond = F.lit(True)
    for i in range(k):
        pos = _bit_pos(key_col, i, m_bits)
        word = F.element_at(arr, (pos / WORD_BITS).cast("int") + F.lit(1))
        cond = cond & (word.bitwiseAND(_mask(pos % WORD_BITS)) != 0)
    return cond


def bloom_semi_join(fact: DataFrame, fact_key: str, build: DataFrame,
                    build_key: str, m_bits: int = 4096, k: int = 3,
                    exact: bool = True) -> DataFrame:
    """Semi-join ``fact`` to ``build`` keys via Bloom prefilter.

    ``exact=True`` (default) removes the false positives with a real
    semi-join ON THE SURVIVORS — the join's shuffle now carries only the
    prefiltered fraction.  ``exact=False`` returns the raw prefilter
    (useful when a later stage re-verifies anyway, e.g. dedup verify)."""
    words = bloom_words(bloom_build(build, build_key, m_bits, k), m_bits)
    pre = fact.filter(bloom_member(F.col(fact_key), words, m_bits, k))
    if not exact:
        return pre
    dim = build.select(F.col(build_key).alias(fact_key)).distinct()
    return pre.join(dim, fact_key, "left_semi")
