"""AMIE-style Horn-rule mining over the emitted triple store
(beyond-reference KG surface: after extraction (q22/q26), linking and
canonicalization (kg_job), the classic next step for a web-scale KG is
mining path rules  p1(x,y) ∧ p2(y,z) ⇒ p3(x,z)  with support /
confidence / head-coverage — AMIE (Galárraga et al., WWW'13) semantics
restricted to length-2 closed paths, the workhorse shape.

Semantics (set-based, like the RDF store): the body instantiation set
is the DISTINCT (p1, p2, x, z) reachable through any y; support is the
number of those (x, z) pairs that also appear as a p3 head triple;
confidence = support / |body|; head coverage = support / |heads(p3)|.
All counts are exact BIGINTs; the ppm ratios are integer division —
no float anywhere, so results are engine- and reduction-order-proof.

Scale shape: one self-join on the shared variable y (shuffle on the
entity key — the same key kg_job already salts for head-entity skew),
with a DISTINCT immediately after to collapse multi-witness bodies
BEFORE the head join, then two partial-agg groupBys and one broadcast
of the tiny per-predicate head-size frame.  ``max_fanout`` guards the
join against hub entities (an entity appearing in 10^6 triples would
otherwise contribute 10^12 body rows): entities whose per-predicate
degree exceeds the cap are dropped from the BODY join only — the same
disclosed-truncation contract as the LSH ``max_bucket`` guard
(dedup.py); pass None to disable (the driver query does, its synthetic
graph is bounded by construction).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F


def mine_path_rules(triples: DataFrame, min_support: int = 2,
                    max_fanout: int | None = 1000) -> DataFrame:
    """-> (p1, p2, p3, support, body_size, head_size, conf_ppm,
    hc_ppm) for every length-2 path rule with support >= min_support.

    ``triples`` needs (subj, pred, obj) columns; rows are deduplicated
    to set semantics first (a repeated assertion is one fact).
    """
    t = (triples.select("subj", "pred", "obj")
         .filter(F.col("subj").isNotNull() & F.col("obj").isNotNull())
         .dropDuplicates(["subj", "pred", "obj"]))

    left, right = t, t
    if max_fanout is not None:
        # per-(pred, entity) degree caps, applied to the body join
        # sides only: out-degree of the shared var for the p2 leg,
        # in-degree for the p1 leg.
        in_deg = (t.groupBy(F.col("pred").alias("p"),
                            F.col("obj").alias("e"))
                  .count().filter(F.col("count") > max_fanout))
        out_deg = (t.groupBy(F.col("pred").alias("p"),
                             F.col("subj").alias("e"))
                   .count().filter(F.col("count") > max_fanout))
        left = t.join(F.broadcast(in_deg),
                      (t.pred == in_deg.p) & (t.obj == in_deg.e),
                      "left_anti")
        right = t.join(F.broadcast(out_deg),
                       (t.pred == out_deg.p) & (t.subj == out_deg.e),
                       "left_anti")

    body = (left.alias("a")
            .join(right.alias("b"), F.col("a.obj") == F.col("b.subj"))
            .select(F.col("a.pred").alias("p1"),
                    F.col("b.pred").alias("p2"),
                    F.col("a.subj").alias("x"),
                    F.col("b.obj").alias("z"))
            .dropDuplicates(["p1", "p2", "x", "z"]))

    body_sizes = body.groupBy("p1", "p2").agg(
        F.count(F.lit(1)).cast("long").alias("body_size"))
    head_sizes = t.groupBy(F.col("pred").alias("p3")).agg(
        F.count(F.lit(1)).cast("long").alias("head_size"))

    heads = t.select(F.col("pred").alias("p3"),
                     F.col("subj").alias("x"), F.col("obj").alias("z"))
    support = (body.join(heads, ["x", "z"])
               .groupBy("p1", "p2", "p3")
               .agg(F.count(F.lit(1)).cast("long").alias("support"))
               .filter(F.col("support") >= min_support))

    return (support
            .join(body_sizes, ["p1", "p2"])
            .join(F.broadcast(head_sizes), ["p3"])
            .select("p1", "p2", "p3", "support", "body_size", "head_size",
                    F.expr("support * 1000000 DIV body_size")
                    .alias("conf_ppm"),
                    F.expr("support * 1000000 DIV head_size")
                    .alias("hc_ppm")))


def apply_rules(triples: DataFrame, rules: DataFrame,
                min_conf_ppm: int = 600000,
                max_fanout: int | None = 1000) -> DataFrame:
    """Rule-based KB completion: -> (subj, pred, obj, p1, p2, conf_ppm)
    — the body instantiations of every rule at or above the confidence
    floor whose head triple is NOT yet asserted.  This is the AMIE
    prediction step: the classic cheap KG densifier before any learned
    link predictor (q101/q143 operate on the same triple frame).

    Same join shape as mining (one shuffle on the shared variable,
    DISTINCT before the head anti-join); the rule frame is tiny and
    rides a broadcast.
    """
    t = (triples.select("subj", "pred", "obj")
         .filter(F.col("subj").isNotNull() & F.col("obj").isNotNull())
         .dropDuplicates(["subj", "pred", "obj"]))
    r = (rules.filter(F.col("conf_ppm") >= min_conf_ppm)
         .select("p1", "p2", "p3", "conf_ppm"))
    left = right = t
    if max_fanout is not None:
        in_deg = (t.groupBy(F.col("pred").alias("p"),
                            F.col("obj").alias("e"))
                  .count().filter(F.col("count") > max_fanout))
        out_deg = (t.groupBy(F.col("pred").alias("p"),
                             F.col("subj").alias("e"))
                   .count().filter(F.col("count") > max_fanout))
        left = t.join(F.broadcast(in_deg),
                      (t.pred == in_deg.p) & (t.obj == in_deg.e),
                      "left_anti")
        right = t.join(F.broadcast(out_deg),
                       (t.pred == out_deg.p) & (t.subj == out_deg.e),
                       "left_anti")
    body = (left.alias("a")
            .join(right.alias("b"), F.col("a.obj") == F.col("b.subj"))
            .select(F.col("a.pred").alias("p1"),
                    F.col("b.pred").alias("p2"),
                    F.col("a.subj").alias("x"),
                    F.col("b.obj").alias("z"))
            .dropDuplicates(["p1", "p2", "x", "z"]))
    cand = body.join(F.broadcast(r), ["p1", "p2"])
    asserted = t.select(F.col("pred").alias("p3"),
                        F.col("subj").alias("x"), F.col("obj").alias("z"))
    return (cand.join(asserted, ["p3", "x", "z"], "left_anti")
            .select(F.col("x").alias("subj"), F.col("p3").alias("pred"),
                    F.col("z").alias("obj"), "p1", "p2", "conf_ppm"))


def rules_oracle_sql(triples_sql: str, min_support: int = 2) -> str:
    """DuckDB replay (no fan-out cap — callers pass bounded graphs):
    identical set semantics, identical integer ppm division."""
    return f"""
        WITH t AS (SELECT DISTINCT subj, pred, obj FROM ({triples_sql})
                   WHERE subj IS NOT NULL AND obj IS NOT NULL),
        body AS (SELECT DISTINCT a.pred AS p1, b.pred AS p2,
                                 a.subj AS x, b.obj AS z
                 FROM t a JOIN t b ON a.obj = b.subj),
        bsize AS (SELECT p1, p2, CAST(COUNT(*) AS BIGINT) AS body_size
                  FROM body GROUP BY p1, p2),
        hsize AS (SELECT pred AS p3, CAST(COUNT(*) AS BIGINT) AS head_size
                  FROM t GROUP BY pred),
        sup AS (SELECT p1, p2, h.pred AS p3,
                       CAST(COUNT(*) AS BIGINT) AS support
                FROM body JOIN t h ON h.subj = body.x AND h.obj = body.z
                GROUP BY p1, p2, h.pred
                HAVING COUNT(*) >= {min_support})
        SELECT sup.p1, sup.p2, sup.p3, support, body_size, head_size,
               CAST(support * 1000000 // body_size AS BIGINT) AS conf_ppm,
               CAST(support * 1000000 // head_size AS BIGINT) AS hc_ppm
        FROM sup
        JOIN bsize ON bsize.p1 = sup.p1 AND bsize.p2 = sup.p2
        JOIN hsize ON hsize.p3 = sup.p3
        ORDER BY sup.p1, sup.p2, sup.p3"""


def apply_rules_oracle_sql(triples_sql: str, min_support: int = 2,
                           min_conf_ppm: int = 600000) -> str:
    """DuckDB replay of mine(min_support) |> apply(min_conf_ppm)."""
    return f"""
        WITH t AS (SELECT DISTINCT subj, pred, obj FROM ({triples_sql})
                   WHERE subj IS NOT NULL AND obj IS NOT NULL),
        body AS (SELECT DISTINCT a.pred AS p1, b.pred AS p2,
                                 a.subj AS x, b.obj AS z
                 FROM t a JOIN t b ON a.obj = b.subj),
        bsize AS (SELECT p1, p2, CAST(COUNT(*) AS BIGINT) AS body_size
                  FROM body GROUP BY p1, p2),
        sup AS (SELECT p1, p2, h.pred AS p3,
                       CAST(COUNT(*) AS BIGINT) AS support
                FROM body JOIN t h ON h.subj = body.x AND h.obj = body.z
                GROUP BY p1, p2, h.pred
                HAVING COUNT(*) >= {min_support}),
        rules AS (SELECT sup.p1, sup.p2, sup.p3,
                         CAST(support * 1000000 // body_size AS BIGINT)
                             AS conf_ppm
                  FROM sup JOIN bsize
                    ON bsize.p1 = sup.p1 AND bsize.p2 = sup.p2
                  WHERE support * 1000000 // body_size
                        >= {min_conf_ppm})
        SELECT body.x AS subj, rules.p3 AS pred, body.z AS obj,
               rules.p1, rules.p2, rules.conf_ppm
        FROM body
        JOIN rules ON rules.p1 = body.p1 AND rules.p2 = body.p2
        ANTI JOIN t ON t.pred = rules.p3 AND t.subj = body.x
                   AND t.obj = body.z
        ORDER BY subj, pred, obj, rules.p1"""
