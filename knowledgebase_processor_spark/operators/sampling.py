"""Per-domain capping / downsampling (web-corpus balancing).

Large crawls are dominated by a handful of hosts; training-data pipelines
cap documents per registered domain before anything else sees the data
(C4 and successors).  Two shapes:

* ``cap_per_domain`` — EXACT top-``cap`` per domain, deterministic order
  (portable md5 of the doc id, then id).  Window-based: one shuffle on
  domain.  At 10^12 pages a head domain's window partition is a
  straggler — AQE skew-split does not split windows — so this form is
  for moderate skew / exact-quota needs.
* ``downsample_per_domain`` — skew-immune rate sampler: per-domain counts
  (map-side-combinable aggregation) joined back, then a pure filter
  ``hash < cap/count · 2^60``.  Every stage is either narrow or an
  AQE-splittable shuffle; no per-domain serialization point, so this is
  the 100 TB path.  The quota is hit in expectation (binomial around
  ``cap``), which is what web-scale pipelines actually use.

Both are deterministic functions of the input (portable 60-bit md5 id
hash, no RNG), so DuckDB recomputes the exact kept set (q41/q42).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window, functions as F

_HASH_RANGE = float(1 << 60)


def portable_id_hash(col: Column) -> Column:
    """60-bit md5 hash of the id — the cross-engine twin of xxhash64
    (same formula as the portable MinHash family: md5 hex → bigint)."""
    return F.conv(F.substring(F.md5(col.cast("string")), 1, 15),
                  16, 10).cast("bigint")


def domain_of(url: Column) -> Column:
    """Registered-host extraction: lowercase authority minus any
    ``www.`` prefix, empty string for non-URLs AND null urls — a null
    domain would silently drop rows in the downsampler's count join
    (null never equi-joins), so malformed input must land in a real
    group instead."""
    return F.coalesce(
        F.regexp_extract(F.lower(url),
                         r"^[a-z][a-z0-9+.-]*://(?:www\.)?([^/:?#]+)", 1),
        F.lit(""))


def cap_per_domain(df: DataFrame, url_col: str = "url",
                   id_col: str = "doc_id", cap: int = 1000,
                   salts: int | None = None) -> DataFrame:
    """Keep at most ``cap`` docs per domain, chosen by portable id hash
    (then id, for hash ties).  Adds a ``domain`` column.

    ``salts=S`` turns on the two-level exact tournament for head-domain
    skew: round 1 takes the top ``cap`` per (domain, hash%S) — S
    independent window partitions instead of one, so a 10^9-page domain
    splits S ways — and round 2 re-ranks the ≤ S·cap survivors per
    domain.  Exact: every global top-``cap`` row is top-``cap`` within
    its own salt bucket (its rank there can only be better), so round 1
    never discards a winner.  Default off: two shuffles instead of one,
    worth paying only when domains are heavy.
    """
    d = df.withColumn("domain", domain_of(F.col(url_col)))
    h = portable_id_hash(F.col(id_col))
    if salts:
        w1 = (Window.partitionBy("domain", F.pmod(h, F.lit(salts)))
              .orderBy(h, F.col(id_col)))
        d = (d.withColumn("_rn", F.row_number().over(w1))
             .filter(F.col("_rn") <= cap).drop("_rn"))
    w = Window.partitionBy("domain").orderBy(h, F.col(id_col))
    return (d.withColumn("_rn", F.row_number().over(w))
            .filter(F.col("_rn") <= cap).drop("_rn"))


def downsample_per_domain(df: DataFrame, url_col: str = "url",
                          id_col: str = "doc_id",
                          cap: int = 1000) -> DataFrame:
    """Deterministic rate-sampling to ~``cap`` docs per domain.

    keep ⇔ h(id) < (cap / n_domain) · 2^60 — domains at or under the cap
    keep everything (threshold ≥ 2^60).  Deterministic: re-runs and
    retries keep the same rows, and adding documents to a domain only
    flips rows from keep to drop (monotone), never resurrects dropped
    ones with new neighbors' ids.
    """
    d = df.withColumn("domain", domain_of(F.col(url_col)))
    counts = d.groupBy("domain").agg(F.count("*").alias("_n"))
    thresh = (F.lit(float(cap)) / F.col("_n").cast("double")) * F.lit(_HASH_RANGE)
    return (d.join(counts, "domain")
            .filter(portable_id_hash(F.col(id_col)).cast("double") < thresh)
            .drop("_n"))
