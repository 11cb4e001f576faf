"""Mergeable distinct-count sketches: HyperLogLog and KMV (k-minimum-values).

No reference anchor (the reference never counts distincts beyond exact
``len(set(...))`` in its stats service, kb statistics only) — these are
the scale path for the same statistics family (`operators/stats.py`)
when "distinct urls per domain" is asked of a 10^12-row crawl where an
exact ``countDistinct`` shuffles every key.

Scale shape (why these are the 100 TB answer):

* Both sketches are ALGEBRAIC aggregates: HLL reduces a partition to at
  most m=2^p register maxima and KMV to k hash minima, combined by
  max/min — Spark's partial aggregation does the heavy lifting map-side,
  so the exchange carries O(groups * m) tiny rows instead of the data.
  (Spark's own ``approx_count_distinct`` is HLL++; this operator exists
  because its binary sketch is not portable — the whole point here is a
  formula an external ANSI engine can replay bit-identically.)
* Sketches for disjoint inputs MERGE (register-wise max / union-min-k),
  so per-partition sketches can be persisted and rolled up later without
  rescanning — the same partial-rollup contract as
  ``operators/rollup.py``.

Portability: hashes are the repo's salted-md5 60-bit family
(``conv(substr(md5(x),1,15),16,10)``, cf. dedup.py:398).  HLL registers
are derived from the md5 HEX STRING (bucket = first p/4 nibbles, rho =
leading-zero nibbles of the rest + a 15-way nibble CASE), so no engine
needs a bit_length primitive; the harmonic sum is FIXED-POINT
(sum of 2^(nbits+1-rho) as BIGINT — exact integer arithmetic, order-free),
and only the final estimate division happens in floats.  DuckDB replays
every register, sum, and estimate bit-identically (q72's oracle).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

HEX_DIGITS = 15          # 60-bit hash family (dedup.py portable formula)

# extra leading zero BITS contributed by the first non-zero nibble
_NIBBLE_EXTRA = {"1": 3, "2": 2, "3": 2, "4": 1, "5": 1, "6": 1, "7": 1,
                 "8": 0, "9": 0, "a": 0, "b": 0, "c": 0, "d": 0, "e": 0,
                 "f": 0}


def _nibble_extra_sql(col_sql: str) -> str:
    """CASE mapping a hex nibble to its leading-zero-bit count (ANSI)."""
    whens = " ".join(f"WHEN '{c}' THEN {n}" for c, n in _NIBBLE_EXTRA.items())
    return f"(CASE {col_sql} {whens} END)"


def hll_rho_sql(hex_col: str, p_nibbles: int) -> str:
    """ANSI SQL for the HLL rank: 1 + count of leading zero bits in the
    (60 - 4*p_nibbles)-bit suffix of ``hex_col``.  Shared verbatim by the
    Spark plan and the DuckDB oracle so the formula cannot drift."""
    rest = f"substr({hex_col}, {p_nibbles + 1}, {HEX_DIGITS - p_nibbles})"
    zn = f"length(regexp_extract({rest}, '^0*', 0))"
    first = f"substr({rest}, {zn} + 1, 1)"
    nbits = 4 * (HEX_DIGITS - p_nibbles)
    return (f"(CASE WHEN {zn} = {HEX_DIGITS - p_nibbles} THEN {nbits} + 1 "
            f"ELSE 4 * {zn} + {_nibble_extra_sql(first)} + 1 END)")


def _hll_alpha(m: int) -> float:
    if m == 16:
        return 0.673
    if m == 32:
        return 0.697
    if m == 64:
        return 0.709
    return 0.7213 / (1.0 + 1.079 / m)


def hll_registers(df: DataFrame, group_cols: list[str], value_col: str,
                  p_nibbles: int = 2, salt: str = "hll") -> DataFrame:
    """One row per (group, bucket) with the register maximum ``rho``.

    This is the persistable sketch: registers for disjoint slices merge
    with a further groupBy(bucket).max(rho).
    """
    hx = F.substring(F.md5(F.concat(F.lit(salt + "|"),
                                    F.col(value_col).cast("string"))),
                     1, HEX_DIGITS)
    bucket = F.conv(F.substring(F.col("hx"), 1, p_nibbles), 16, 10).cast("int")
    rows = df.select(*group_cols, hx.alias("hx")) \
             .select(*group_cols, bucket.alias("bucket"),
                     F.expr(hll_rho_sql("hx", p_nibbles)).alias("rho"))
    return rows.groupBy(*group_cols, "bucket").agg(F.max("rho").alias("rho"))


def hll_distinct(df: DataFrame, group_cols: list[str], value_col: str,
                 p_nibbles: int = 2, salt: str = "hll") -> DataFrame:
    """HyperLogLog distinct estimate per group (Flajolet et al. 2007).

    Returns (group..., hll_sum_fixed, hll_zero_registers, hll_estimate)
    where ``hll_sum_fixed`` = sum over all m registers of
    2^(nbits + 1 - rho) in exact BIGINT fixed point (absent register:
    rho = 0; the +1 keeps the rho = nbits+1 all-zero-suffix case an
    integer) — the integer the oracle equality really rides on — and
    the estimate applies the standard small-range linear-counting
    correction.
    """
    m = 16 ** p_nibbles
    nbits = 4 * (HEX_DIGITS - p_nibbles)
    regs = hll_registers(df, group_cols, value_col, p_nibbles, salt)
    # fixed-point harmonic term per present register: 2^(nbits + 1 - rho);
    # rho ranges over [1, nbits+1] so the shift stays in [0, nbits]
    term = F.expr(f"shiftleft(cast(1 as bigint), {nbits + 1} - rho)")
    agg = regs.groupBy(*group_cols).agg(
        F.sum(term).cast("bigint").alias("present_sum"),
        F.count(F.lit(1)).alias("n_present"))
    two_nbits = 1 << (nbits + 1)
    sum_fixed = (F.col("present_sum")
                 + (F.lit(m) - F.col("n_present")) * F.lit(two_nbits))
    zeros = (F.lit(m) - F.col("n_present")).cast("bigint")
    alpha = _hll_alpha(m)
    raw = F.lit(alpha * m * m * float(two_nbits)) / sum_fixed.cast("double")
    lin = F.lit(float(m)) * F.log(F.lit(float(m)) / zeros.cast("double"))
    est = F.when((raw <= F.lit(2.5 * m)) & (zeros > 0), lin).otherwise(raw)
    return agg.select(*group_cols,
                      sum_fixed.cast("bigint").alias("hll_sum_fixed"),
                      zeros.alias("hll_zero_registers"),
                      F.round(est, 4).alias("hll_estimate"))


def kmv_overlap(df_a: DataFrame, df_b: DataFrame, value_col: str,
                k: int = 128, salt: str = "kmv") -> DataFrame:
    """Corpus-overlap estimation from two KMV sketches (Beyer et al.
    2007): how much vocabulary / how many shingles do two corpora share,
    WITHOUT joining them — each side reduces to its k minimum hashes.

    Estimators (all from the two bottom-k sets alone):
      * union kth minimum U_k  ->  distinct(A ∪ B) ≈ (k-1)·2^60 / U_k
      * Jaccard ≈ |{bottom-k of the union} ∩ A-sketch ∩ B-sketch| / k
      * distinct(A ∩ B) ≈ Jaccard · union-estimate
    Degenerate small inputs (union sketch not full) fall back to the
    exact distinct of the merged minima, mirroring ``kmv_distinct``.

    Everything up to the two final float estimates is integer (hash
    minima, shared counts), so the q88 oracle replays it bit-exactly.
    Scale shape: each bottom-k pass is rewritten by Catalyst to a
    TakeOrderedAndProject(limit=k) below the rank window (per-partition
    heaps forward <= k rows each; plan-asserted in tests), then the
    estimator runs on <= 2k rows in one tiny union frame — the corpora
    are never joined.
    """
    def sketch(df: DataFrame, side: str) -> DataFrame:
        hv = F.conv(F.substring(
            F.md5(F.concat(F.lit(salt + "|"),
                           F.col(value_col).cast("string"))),
            1, HEX_DIGITS), 16, 10).cast("bigint")
        hashes = df.select(hv.alias("hv")).distinct()
        from pyspark.sql import Window
        w = Window.orderBy("hv")
        # bottom-k of ONE global sketch: Catalyst's
        # LimitPushDownThroughWindow rewrites this rank filter to a
        # TakeOrderedAndProject(limit=k) BELOW the window (plan-asserted
        # in tests) — per-partition heaps forward <= k rows each, so the
        # single-partition window sees at most k rows, never the data.
        return (hashes.withColumn("rn", F.row_number().over(w))
                .filter(F.col("rn") <= k)
                .select("hv", F.lit(side).alias("side")))

    a, b = sketch(df_a, "a"), sketch(df_b, "b")
    merged = (a.unionByName(b)
              .groupBy("hv")
              .agg(F.count(F.lit(1)).alias("sides")))
    from pyspark.sql import Window
    w = Window.orderBy("hv")
    ranked = merged.withColumn("rn", F.row_number().over(w)) \
                   .filter(F.col("rn") <= k)
    agg = ranked.agg(
        F.max(F.when(F.col("rn") == k, F.col("hv"))).alias("union_kth"),
        F.count(F.lit(1)).alias("n_union_kept"),
        F.sum(F.when(F.col("sides") == 2, 1).otherwise(0))
         .cast("bigint").alias("n_shared"))
    union_est = F.when(
        F.col("union_kth").isNotNull(),
        F.lit(float(k - 1)) * F.lit(float(1 << 60))
        / F.col("union_kth").cast("double")) \
        .otherwise(F.col("n_union_kept").cast("double"))
    jac = F.col("n_shared").cast("double") / \
        F.least(F.col("n_union_kept"), F.lit(k)).cast("double")
    return agg.select(
        F.coalesce(F.col("union_kth"), F.lit(-1)).alias("union_kth"),
        F.col("n_union_kept").cast("bigint").alias("n_union_kept"),
        "n_shared",
        F.round(union_est, 4).alias("union_estimate"),
        F.round(jac, 6).alias("jaccard_estimate"),
        F.round(jac * union_est, 4).alias("intersection_estimate"))


def kmv_distinct(df: DataFrame, group_cols: list[str], value_col: str,
                 k: int = 64, salt: str = "kmv") -> DataFrame:
    """KMV (k-minimum-values / bottom-k) distinct estimate per group
    (Bar-Yossef et al. 2002): keep the k smallest distinct 60-bit hashes;
    if the k-th exists the estimate is (k-1) * 2^60 / kth, else the
    group's exact distinct count (it all fit in the sketch).

    The rank filter compiles to Spark's WindowGroupLimit, so each
    partition forwards at most k rows per group before the single
    group shuffle.
    """
    hv = F.conv(F.substring(F.md5(F.concat(F.lit(salt + "|"),
                                           F.col(value_col).cast("string"))),
                            1, HEX_DIGITS), 16, 10).cast("bigint")
    hashes = df.select(*group_cols, hv.alias("hv")).distinct()
    from pyspark.sql import Window
    w = Window.partitionBy(*group_cols).orderBy("hv")
    ranked = hashes.withColumn("rn", F.row_number().over(w)) \
                   .filter(F.col("rn") <= k)
    agg = ranked.groupBy(*group_cols).agg(
        F.max(F.when(F.col("rn") == k, F.col("hv"))).alias("kth"),
        F.count(F.lit(1)).alias("n_kept"))
    est = F.when(F.col("kth").isNotNull(),
                 F.lit(float(k - 1)) * F.lit(float(1 << 60))
                 / F.col("kth").cast("double")) \
           .otherwise(F.col("n_kept").cast("double"))
    return agg.select(*group_cols,
                      F.coalesce(F.col("kth"), F.lit(-1)).alias("kmv_kth"),
                      F.round(est, 4).alias("kmv_estimate"))


def kmv_overlap_matrix(df: DataFrame, group_col: str, value_col: str,
                       k: int = 128, salt: str = "kmv") -> DataFrame:
    """Pairwise corpus-overlap matrix over a grouping tag (source,
    snapshot, shard): every group reduces to ONE bottom-k sketch in a
    single pass, then all G·(G-1)/2 pair estimates run on the G·k-row
    sketch frame — the corpora are never joined, whatever their size.
    The curation question this answers: "which sources duplicate each
    other" before mixing them (q109) or deduping across them.

    Estimators per pair follow ``kmv_overlap`` exactly (union kth
    minimum, shared fraction of the union bottom-k, intersection =
    product) — integers until the two final float expressions, so the
    q114 oracle replays every pair bit-exactly.

    Scale shape: the per-group bottom-k is a rank-filter window on
    (group) — WindowGroupLimit pushes the k-limit into per-partition
    per-group heaps — and everything after runs on G·k rows.
    """
    from pyspark.sql import Window

    hv = F.conv(F.substring(
        F.md5(F.concat(F.lit(salt + "|"),
                       F.col(value_col).cast("string"))),
        1, HEX_DIGITS), 16, 10).cast("bigint")
    hashes = df.select(F.col(group_col).alias("g"), hv.alias("hv")) \
               .distinct()
    wg = Window.partitionBy("g").orderBy("hv")
    sk = (hashes.withColumn("rn", F.row_number().over(wg))
          .filter(F.col("rn") <= k).select("g", "hv")
          .localCheckpoint())

    groups = sk.select("g").distinct()
    pairs = (groups.select(F.col("g").alias("g1"))
             .crossJoin(groups.select(F.col("g").alias("g2")))
             .filter(F.col("g1") < F.col("g2")))
    rows_a = pairs.join(sk.withColumnRenamed("g", "g1"), "g1") \
                  .select("g1", "g2", "hv")
    rows_b = pairs.join(sk.withColumnRenamed("g", "g2"), "g2") \
                  .select("g1", "g2", "hv")
    merged = (rows_a.unionByName(rows_b)
              .groupBy("g1", "g2", "hv")
              .agg(F.count(F.lit(1)).alias("sides")))
    wp = Window.partitionBy("g1", "g2").orderBy("hv")
    ranked = merged.withColumn("rn", F.row_number().over(wp)) \
                   .filter(F.col("rn") <= k)
    agg = ranked.groupBy("g1", "g2").agg(
        F.max(F.when(F.col("rn") == k, F.col("hv"))).alias("union_kth"),
        F.count(F.lit(1)).cast("bigint").alias("n_union_kept"),
        F.sum(F.when(F.col("sides") == 2, 1).otherwise(0))
         .cast("bigint").alias("n_shared"))
    union_est = F.when(
        F.col("union_kth").isNotNull(),
        F.lit(float(k - 1)) * F.lit(float(1 << 60))
        / F.col("union_kth").cast("double")) \
        .otherwise(F.col("n_union_kept").cast("double"))
    jac = F.col("n_shared").cast("double") / \
        F.least(F.col("n_union_kept"), F.lit(k)).cast("double")
    return agg.select(
        F.col("g1").alias("group_a"), F.col("g2").alias("group_b"),
        F.coalesce(F.col("union_kth"), F.lit(-1)).alias("union_kth"),
        "n_union_kept", "n_shared",
        F.round(jac, 6).alias("jaccard_est"),
        F.round(union_est, 4).alias("union_est"),
        F.round(jac * union_est, 4).alias("intersection_est"))


def kmv_rollup(df: DataFrame, group_cols: list[str], value_col: str,
               k: int = 64, salt: str = "kmv") -> DataFrame:
    """Hierarchical distinct-count rollup by MERGING KMV sketches, never
    re-scanning: the leaf level computes one bottom-k sketch per full
    group key, and every coarser level re-bottom-k's the UNION OF THE
    CHILD SKETCH ROWS (G·k rows, tiny) — the property that makes KMV
    the right sketch for a 100 TB hypertable: day sketches merge into
    month/source/global synopses without touching the data again, and
    the merge is EXACT (bottom-k of a union of per-child bottom-ks over
    distinct hash sets equals bottom-k of the union, since any hash in
    the union's bottom-k is within its own child's bottom-k).

    That exact-merge property is also the oracle contract (q118):
    DuckDB recomputes each level directly from the raw data and must
    agree bit-for-bit with Spark's sketch-merge path — the equality IS
    the theorem being value-checked.

    Returns one row per group per level: rolled-up columns are
    ``'*'``, plus (kmv_kth, kmv_estimate) — estimate formula and
    portable salted-md5 hash identical to :func:`kmv_distinct`.

    Scale shape: the leaf bottom-k is a WindowGroupLimit rank filter
    (per-partition per-group heaps forward <= k rows each); every merge
    level runs on at most (#child groups)·k rows.
    """
    from pyspark.sql import Window

    hv = F.conv(F.substring(F.md5(F.concat(F.lit(salt + "|"),
                                           F.col(value_col).cast("string"))),
                            1, HEX_DIGITS), 16, 10).cast("bigint")

    def bottom_k(rows: DataFrame, cols: list[str]) -> DataFrame:
        w = (Window.partitionBy(*cols) if cols else
             Window.partitionBy(F.lit(1))).orderBy("hv")
        return (rows.distinct()
                .withColumn("rn", F.row_number().over(w))
                .filter(F.col("rn") <= k))

    def estimate(ranked: DataFrame, cols: list[str],
                 level: str) -> DataFrame:
        agg = ranked.groupBy(*cols).agg(
            F.max(F.when(F.col("rn") == k, F.col("hv"))).alias("kth"),
            F.count(F.lit(1)).alias("n_kept")) if cols else ranked.agg(
            F.max(F.when(F.col("rn") == k, F.col("hv"))).alias("kth"),
            F.count(F.lit(1)).alias("n_kept"))
        est = F.when(F.col("kth").isNotNull(),
                     F.lit(float(k - 1)) * F.lit(float(1 << 60))
                     / F.col("kth").cast("double")) \
               .otherwise(F.col("n_kept").cast("double"))
        sel = [F.lit(level).alias("level")]
        for g in group_cols:
            sel.append((F.col(g) if g in cols else F.lit("*"))
                       .cast("string").alias(g))
        return agg.select(*sel,
                          F.coalesce(F.col("kth"), F.lit(-1)).alias("kmv_kth"),
                          F.round(est, 4).alias("kmv_estimate"))

    leaf_rows = df.select(*group_cols, hv.alias("hv"))
    ranked = bottom_k(leaf_rows, group_cols)
    frames = [estimate(ranked, group_cols, "|".join(group_cols))]
    cols = list(group_cols)
    while cols:
        cols = cols[:-1]
        # merge: child sketch rows only — never back to the data
        ranked = bottom_k(ranked.select(*cols, "hv"), cols)
        frames.append(estimate(ranked, cols,
                               "|".join(cols) if cols else "total"))
    out = frames[0]
    for f2 in frames[1:]:
        out = out.unionByName(f2)
    return out
