"""Basic-graph-pattern queries over the triples table (Q5 parity).

The reference forwards SPARQL to an external Fuseki endpoint
(query_interface/sparql_interface.py:58-224); the equivalent analytics
surface here is Spark SQL over the materialized ``triples`` DataFrame.
This helper evaluates a conjunctive triple-pattern query (the core of
SPARQL SELECT) as a chain of self-joins:

    match(triples, [("?s", RDF_TYPE, KB + "TodoItem"),
                    ("?s", KB + "isCompleted", '"false"')])

Terms: ``?x`` variables, ``<...>``-free absolute IRIs, or ``"..."``
literal lexical forms.  Each pattern is a filtered projection of the
triples table; shared variables become equi-join keys.  Catalyst orders /
broadcasts the joins; selective patterns (bound predicate + object) prune
first — the same plan shape a SPARQL engine's BGP optimizer would pick.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

Pattern = tuple[str, str, str]


def _is_var(term: str) -> bool:
    return term.startswith("?")


def match_bgp(triples: DataFrame, patterns: list[Pattern],
              with_meta: bool = False) -> DataFrame:
    """Evaluate a basic graph pattern; returns one column per variable.

    ``with_meta=True`` additionally carries ``<var>__is_uri`` /
    ``<var>__datatype`` columns for variables first bound in object
    position (subject/predicate bindings are always IRIs) — needed by
    ``construct`` to emit faithful triples.
    """
    if not patterns:
        raise ValueError("empty basic graph pattern")
    result: DataFrame | None = None
    for i, (s, p, o) in enumerate(patterns):
        t = triples
        sel = []
        seen_vars: dict[str, str] = {}
        for term, col in ((s, "subj"), (p, "pred"), (o, "obj")):
            if _is_var(term):
                name = term[1:]
                if name in seen_vars:
                    # repeated variable within one pattern => equality
                    # constraint (SPARQL BGP semantics), single column
                    t = t.filter(F.col(col) == F.col(seen_vars[name]))
                else:
                    seen_vars[name] = col
                    sel.append(F.col(col).alias(name))
                    if with_meta and col == "obj":
                        sel.append(F.col("obj_is_uri").alias(f"{name}__is_uri"))
                        sel.append(F.col("obj_datatype").alias(f"{name}__datatype"))
            elif term.startswith('"'):
                t = t.filter((F.col(col) == term.strip('"')) & ~F.col("obj_is_uri")) \
                    if col == "obj" else t.filter(F.col(col) == term.strip('"'))
            else:
                t = t.filter(F.col(col) == term)
        part = t.select(*sel) if sel else t.select(F.lit(i).alias(f"_m{i}"))
        if result is None:
            result = part
        else:
            # a var re-bound in a later pattern keeps its FIRST meta cols
            part = part.drop(*[c for c in part.columns
                               if "__" in c and c in result.columns])
            shared = [c for c in part.columns
                      if c in result.columns and "__" not in c]
            result = result.join(part, on=shared, how="inner") if shared \
                else result.crossJoin(part)
    return result.distinct()


def count_triples(triples: DataFrame) -> int:
    """A8: SELECT (COUNT(*) AS ?count) (sparql_interface.py:457-486)."""
    return triples.count()


def list_graphs(triples: DataFrame) -> DataFrame:
    """A8/O3: SELECT DISTINCT ?g ... ORDER BY ?g (sparql_interface.py:434-455),
    with the per-document graph = source_doc."""
    return triples.select(F.col("source_doc").alias("g")).distinct().orderBy("g")


def describe(triples: DataFrame, uri: str) -> DataFrame:
    """DESCRIBE <uri>: all triples whose subject is the node."""
    return triples.filter(F.col("subj") == uri)


def ask(triples: DataFrame, patterns: list[Pattern]) -> bool:
    """ASK { ... }: does the pattern have any solution."""
    return match_bgp(triples, patterns).limit(1).count() > 0


def construct(triples: DataFrame, patterns: list[Pattern],
              template: list[Pattern]) -> DataFrame:
    """CONSTRUCT { template } WHERE { patterns }: emit new triples from
    BGP bindings (Q5 parity, sparql_service.py dispatch).

    Returns the TRIPLES shape minus source lineage: (subj, pred, obj,
    obj_is_uri, obj_datatype), set-deduplicated like an RDF graph.
    Object-position variables keep the is_uri/datatype of the triple
    they were bound from; fixed template terms follow the same syntax as
    patterns (``?var``, ``"literal"``, bare IRI).
    """
    from ..rdf_schema import XSD_STRING

    bound = match_bgp(triples, patterns, with_meta=True)
    parts = []
    for (s, p, o) in template:
        def _uri_term(term):
            return F.col(term[1:]) if _is_var(term) else F.lit(term)
        if _is_var(o):
            v = o[1:]
            obj = F.col(v)
            is_uri = (F.col(f"{v}__is_uri")
                      if f"{v}__is_uri" in bound.columns else F.lit(True))
            dt = (F.col(f"{v}__datatype")
                  if f"{v}__datatype" in bound.columns
                  else F.lit(None).cast("string"))
        elif o.startswith('"'):
            obj, is_uri, dt = (F.lit(o.strip('"')), F.lit(False),
                               F.lit(XSD_STRING))
        else:
            obj, is_uri, dt = F.lit(o), F.lit(True), F.lit(None).cast("string")
        parts.append(bound.select(
            _uri_term(s).alias("subj"), _uri_term(p).alias("pred"),
            obj.alias("obj"), is_uri.alias("obj_is_uri"),
            dt.alias("obj_datatype")))
    out = parts[0]
    for more in parts[1:]:
        out = out.unionByName(more)
    return out.distinct()