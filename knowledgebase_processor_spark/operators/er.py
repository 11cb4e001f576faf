"""Entity-resolution candidate scoring (beyond-reference; SURVEY.md §2
round-2 surface).

The pairwise-match stage that sits between blocking and the merge
(record linkage à la Fellegi–Sunter, the rule-based tier): candidates
come from SORTED-NEIGHBORHOOD blocking (rank.sorted_neighborhood_pairs
— exactly N·w pairs however skewed the keys), each pair is scored with

* ``lev``       — Levenshtein edit distance over the NORMALIZED keys,
* ``lev_sim``   — 1 - lev / max(len_a, len_b) (one exact division),
* ``tok_jaccard`` — token-SET Jaccard of the normalized keys (distinct
                    whitespace tokens; integer intersection/union),
* ``is_match``  — lev_sim >= threshold OR tok_jaccard >= threshold.

Normalization contract: ``er_key`` lowercases and strips everything
outside [a-z0-9 ] then squeezes whitespace.  This is standard ER key
hygiene — and it is also what makes the q105 oracle exact: Spark's
levenshtein counts CODEPOINTS while DuckDB's counts BYTES, so the two
agree only on ASCII, which the normalization guarantees.

Scale shape: blocking emits N·w pairs (never quadratic); the two key
lookups join back on the id (hash joins, AQE-splittable); scoring is
pure codegen string/array expressions.  No UDF, no collect.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, functions as F

from .rank import sorted_neighborhood_pairs
from ..functions.text import PORTABLE_WS


def er_key(col: Column) -> Column:
    """Lowercase, strip non-[a-z0-9 ], squeeze/trim whitespace."""
    return F.trim(F.regexp_replace(
        F.regexp_replace(F.lower(col), "[^a-z0-9 ]", ""), " +", " "))


def er_candidate_scores(records: DataFrame, id_col: str, key_col: str,
                        w: int = 3, sim_threshold: float = 0.8
                        ) -> DataFrame:
    """(id_a, id_b, key_a, key_b, lev, lev_sim, tok_jaccard, is_match)
    for every sorted-neighborhood candidate pair (ranks within ``w``
    under (normalized key, id))."""
    base = records.select(F.col(id_col).alias("rid"),
                          er_key(F.col(key_col)).alias("k"))
    cand = sorted_neighborhood_pairs(base, "rid", ["k", "rid"], w=w) \
        .select("id_a", "id_b")
    ka = base.select(F.col("rid").alias("id_a"), F.col("k").alias("key_a"))
    kb = base.select(F.col("rid").alias("id_b"), F.col("k").alias("key_b"))
    paired = cand.join(ka, "id_a").join(kb, "id_b")

    lev = F.levenshtein("key_a", "key_b")
    maxlen = F.greatest(F.length("key_a"), F.length("key_b"))
    lev_sim = F.when(maxlen == 0, F.lit(1.0)).otherwise(
        F.lit(1.0) - lev.cast("double") / maxlen.cast("double"))
    ta = F.array_distinct(F.filter(F.split(F.col("key_a"), PORTABLE_WS),
                                   lambda x: x != F.lit("")))
    tb = F.array_distinct(F.filter(F.split(F.col("key_b"), PORTABLE_WS),
                                   lambda x: x != F.lit("")))
    inter = F.size(F.array_intersect(ta, tb))
    union = F.size(ta) + F.size(tb) - inter
    jac = F.when(union == 0, F.lit(1.0)).otherwise(
        inter.cast("double") / union.cast("double"))
    thr = F.lit(float(sim_threshold))
    return (paired.select(
        "id_a", "id_b", "key_a", "key_b",
        lev.cast("bigint").alias("lev"),
        lev_sim.alias("lev_sim"),
        jac.alias("tok_jaccard"),
        ((lev_sim >= thr) | (jac >= thr)).alias("is_match")))
