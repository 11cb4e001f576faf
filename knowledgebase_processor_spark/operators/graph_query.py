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


def match_bgp(triples: DataFrame, patterns: list[Pattern]) -> DataFrame:
    """Evaluate a basic graph pattern; returns one column per variable."""
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
            elif term.startswith('"'):
                t = t.filter((F.col(col) == term.strip('"')) & ~F.col("obj_is_uri")) \
                    if col == "obj" else t.filter(F.col(col) == term.strip('"'))
            else:
                t = t.filter(F.col(col) == term)
        part = t.select(*sel) if sel else t.select(F.lit(i).alias(f"_m{i}"))
        if result is None:
            result = part
        else:
            shared = [c for c in part.columns if c in result.columns]
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