"""OWL-lite property-axiom materialization — inverseOf, symmetric,
transitive (the property-algebra half of lightweight reasoning: the
RDFS closure (q140) inherits TYPES; these axioms complete EDGES —
``contains owl:inverseOf partOf`` materializes the containment view a
query planner can scan forward, ``adjacentTo`` symmetrizes, and
``partOf+`` closes the part hierarchy so containment queries stop
being recursive.  Together with the IFP sameAs candidates (q182) and
functional conflicts (q169) this covers the OWL property axioms that
matter for web KGs without a tableau reasoner in sight).

Scale shape: the schema side is tiny (collected once, the kmeans-
centroid discipline); inverse/symmetric materialization is ONE
projection + union each; transitive predicates close by pointer-
doubling keyed on (pred, node) — O(log diameter) self-joins with
``localCheckpoint`` per round (graph_query.transitive_closure
generalized to carry the predicate).  Derived minus asserted via one
anti-join; output is DISTINCT new triples only.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

OWL = "http://www.w3.org/2002/07/owl#"
RDF_TYPE = "http://www.w3.org/1999/02/22-rdf-syntax-ns#type"
OWL_INVERSE = OWL + "inverseOf"
# driver-side cap on the collected schema frame (ontologies are KBs,
# not corpora — even DBpedia's is ~10^4 axioms)
_MAX_SCHEMA_AXIOMS = 1_000_000
OWL_SYMMETRIC = OWL + "SymmetricProperty"
OWL_TRANSITIVE = OWL + "TransitiveProperty"


def owl_property_closure(instance: DataFrame, schema: DataFrame,
                         max_rounds: int = 20) -> DataFrame:
    """-> (subj, pred, obj) DERIVED triples (asserted ones excluded):
    inverseOf both directions, symmetric flips, transitive closure.
    ``schema`` rows: (subj, pred, obj) axioms.  The schema side is a
    broadcast-sized ontology (axioms about PROPERTIES, not instances)
    — collected to the driver under an explicit cap so an instance
    frame passed by mistake fails fast instead of OOMing."""
    sch_rows = schema.limit(_MAX_SCHEMA_AXIOMS + 1).collect()
    assert len(sch_rows) <= _MAX_SCHEMA_AXIOMS, (
        "owl_property_closure: schema frame exceeds "
        f"{_MAX_SCHEMA_AXIOMS} axioms — was an instance frame passed?")
    sch = [(r.subj, r.pred, r.obj) for r in sch_rows]
    inv_pairs = [(s, o) for s, p, o in sch if p == OWL_INVERSE]
    symmetric = {s for s, p, o in sch
                 if p == RDF_TYPE and o == OWL_SYMMETRIC}
    transitive = {s for s, p, o in sch
                  if p == RDF_TYPE and o == OWL_TRANSITIVE}

    t = (instance.select("subj", "pred", "obj")
         .filter(F.col("subj").isNotNull() & F.col("obj").isNotNull())
         .dropDuplicates(["subj", "pred", "obj"]).localCheckpoint())
    parts = []
    for p, q in inv_pairs:
        parts.append(t.filter(F.col("pred") == p).select(
            F.col("obj").alias("subj"), F.lit(q).alias("pred"),
            F.col("subj").alias("obj")))
        parts.append(t.filter(F.col("pred") == q).select(
            F.col("obj").alias("subj"), F.lit(p).alias("pred"),
            F.col("subj").alias("obj")))
    if symmetric:
        sym = t.filter(F.col("pred").isin(*sorted(symmetric)))
        parts.append(sym.select(F.col("obj").alias("subj"), "pred",
                                F.col("subj").alias("obj")))
    if transitive:
        # base for the closure INCLUDES inverse/symmetric derivations
        # on transitive predicates (axioms compose)
        base = t
        for extra in parts:
            base = base.unionByName(extra)
        r = (base.filter(F.col("pred").isin(*sorted(transitive)))
             .dropDuplicates(["subj", "pred", "obj"]).localCheckpoint())
        n = r.count()
        for _ in range(max_rounds):
            hop = (r.alias("a")
                   .join(r.alias("b"),
                         (F.col("a.pred") == F.col("b.pred"))
                         & (F.col("a.obj") == F.col("b.subj")))
                   .select(F.col("a.subj").alias("subj"),
                           F.col("a.pred").alias("pred"),
                           F.col("b.obj").alias("obj")))
            nxt = r.unionByName(hop) \
                .dropDuplicates(["subj", "pred", "obj"]) \
                .localCheckpoint()
            n2 = nxt.count()
            r = nxt
            if n2 == n:
                break
            n = n2
        parts.append(r)
    if not parts:
        return t.limit(0)
    derived = parts[0]
    for more in parts[1:]:
        derived = derived.unionByName(more)
    return (derived.dropDuplicates(["subj", "pred", "obj"])
            .join(t, ["subj", "pred", "obj"], "left_anti"))


def owl_oracle_sql(instance_sql: str, inv_pairs: list,
                   symmetric: list, transitive: list) -> str:
    """DuckDB replay with the axioms as literals (the schema is tiny
    and known to the caller); recursive CTE for the transitive part."""
    inv_sel = " UNION ALL ".join(
        f"SELECT obj AS subj, '{q}' AS pred, subj AS obj FROM t"
        f" WHERE pred = '{p}'"
        " UNION ALL "
        f"SELECT obj, '{p}', subj FROM t WHERE pred = '{q}'"
        for p, q in inv_pairs) or "SELECT * FROM t WHERE 1 = 0"
    sym_in = ", ".join(f"'{s}'" for s in sorted(symmetric)) or "''"
    tr_in = ", ".join(f"'{s}'" for s in sorted(transitive)) or "''"
    return f"""
        WITH RECURSIVE t AS (SELECT DISTINCT subj, pred, obj
                             FROM ({instance_sql})
                             WHERE subj IS NOT NULL
                               AND obj IS NOT NULL),
        inv AS ({inv_sel}),
        sym AS (SELECT obj AS subj, pred, subj AS obj FROM t
                WHERE pred IN ({sym_in})),
        base AS (SELECT * FROM t WHERE pred IN ({tr_in})
                 UNION SELECT * FROM inv WHERE pred IN ({tr_in})
                 UNION SELECT * FROM sym WHERE pred IN ({tr_in})),
        tc AS (SELECT * FROM base
               UNION
               SELECT tc.subj, tc.pred, b.obj
               FROM tc JOIN base b
                 ON b.pred = tc.pred AND b.subj = tc.obj),
        derived AS (SELECT * FROM inv UNION SELECT * FROM sym
                    UNION SELECT * FROM tc)
        SELECT DISTINCT d.subj, d.pred, d.obj
        FROM derived d
        ANTI JOIN t ON t.subj = d.subj AND t.pred = d.pred
                   AND t.obj = d.obj
        ORDER BY subj, pred, obj"""
