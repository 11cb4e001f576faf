"""S6/S7: SPARQL Update statement sink (SURVEY.md §2.1).

The reference pushes its graph to a SPARQL endpoint two ways
(query_interface/sparql_interface.py):
  * plain load  — ``INSERT DATA { <nt-triples> }``           (:226-258)
  * doc upsert  — per-document ``DELETE {..} WHERE {..}`` of every entity
    with ``kb:sourceDocument <doc>`` plus the doc node itself, then the
    INSERT (:317-384, upsert_data :259-299)

A 100 TB pipeline cannot POST one statement at a time from the driver, so
this sink GENERATES the statements distributed: one SPARQL Update string
per source document, produced by an Arrow-batched ``applyInPandas`` group
— the executor-side shape of the reference's per-document loop.  The
output (source_doc, update) frame can be written as files, streamed to a
queue, or fed to any endpoint-POSTing foreachPartition; actually speaking
HTTP to an endpoint stays out of the engine (same non-goal as the
reference's fuseki container scripts).

Triple formatting is N-Triples like the reference's
``graph.serialize(format='nt')`` (:240): full URIs, no prefixes, plain
literals for xsd:string.
"""

from __future__ import annotations

import os

import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql.types import StringType, StructField, StructType

from .rdf_schema import KB_SOURCE_DOC
from .sinks_ttl import _escape, _iri, doc_stem
from .uris import XSD, resolve_uri

SPARQL_DOC = StructType([StructField("source_doc", StringType()),
                         StructField("update", StringType())])


def _nt_term(value: str, is_uri: bool, datatype: str | None) -> str:
    # URI terms go through _iri: crawled doc ids containing '>' or
    # whitespace must not produce malformed N-Triples or inject extra
    # SPARQL Update clauses (rdflib's nt serializer validates these).
    if is_uri:
        return f"<{_iri(value)}>"
    lit = f'"{_escape(value)}"'
    if datatype and datatype != XSD + "string":
        return f"{lit}^^<{_iri(datatype)}>"
    return lit          # rdflib nt: xsd:string stays a plain literal


def _delete_block(source_doc: str, graph_uri: str | None) -> str:
    """The reference's per-document delete (sparql_interface.py:338-380),
    rebased onto THIS pipeline's vocabulary: the source-document predicate
    is ``<KB_SOURCE_DOC>`` (vocab#sourceDocument, rdf_schema.py:35) and the
    matched object is the absolutized doc URI — exactly what the triple
    emitter stores (operators/triples._resolve), so the DELETE actually
    hits the previously-inserted rows."""
    doc_uri = _iri(resolve_uri(source_doc))
    inner = (f"{{ ?entity <{KB_SOURCE_DOC}> <{doc_uri}> . "
             f"?entity ?predicate ?object . }} UNION "
             f"{{ <{doc_uri}> ?docPredicate ?docObject . }}")
    tmpl = ("?entity ?predicate ?object .\n"
            f"    <{doc_uri}> ?docPredicate ?docObject .")
    if graph_uri:
        graph_uri = _iri(graph_uri)
        return (f"DELETE {{ GRAPH <{graph_uri}> {{ {tmpl} }} }}\n"
                f"WHERE {{ GRAPH <{graph_uri}> {{ {inner} }} }} ;")
    return f"DELETE {{ {tmpl} }}\nWHERE {{ {inner} }} ;"


def _format_update(pdf: pd.DataFrame, graph_uri: str | None,
                   upsert: bool) -> pd.DataFrame:
    doc = pdf["source_doc"].iloc[0]
    nt = "\n".join(
        f"  <{_iri(r.subj)}> <{_iri(r.pred)}> "
        f"{_nt_term(r.obj, bool(r.obj_is_uri), r.obj_datatype)} ."
        for r in sorted(pdf.itertuples(index=False),
                        key=lambda r: (r.subj, r.pred, r.obj)))
    if graph_uri:
        insert = f"INSERT DATA {{ GRAPH <{_iri(graph_uri)}> {{\n{nt}\n}} }}"
    else:
        insert = f"INSERT DATA {{\n{nt}\n}}"
    parts = ["PREFIX kb: <http://example.org/kb/>"]
    if upsert:
        parts.append(_delete_block(doc, graph_uri))
    parts.append(insert)
    return pd.DataFrame({"source_doc": [doc], "update": ["\n".join(parts) + "\n"]})


def to_sparql_updates(triples: DataFrame, graph_uri: str | None = None,
                      upsert: bool = True) -> DataFrame:
    """triples -> (source_doc, update): one SPARQL Update per document.

    ``upsert=True`` prepends the reference's document-scoped DELETE
    (S7 semantics); ``upsert=False`` is the plain S6 INSERT DATA load.
    The groupBy key is ``source_doc`` — the same url-hash-friendly key
    the MERGE sink buckets on, so at scale this shuffle co-locates with
    the materialization exchange.
    """
    return triples.groupBy("source_doc").applyInPandas(
        lambda pdf: _format_update(pdf, graph_uri, upsert), schema=SPARQL_DOC)


def write_sparql_update_files(triples: DataFrame, output_dir: str,
                              graph_uri: str | None = None,
                              upsert: bool = True) -> int:
    """Write one ``<doc-stem>.ru`` SPARQL Update file per document
    (executor-side, foreachPartition — no driver collect)."""
    os.makedirs(output_dir, exist_ok=True)
    updates = to_sparql_updates(triples, graph_uri, upsert)

    def _write(rows):
        n = 0
        for r in rows:
            # doc_stem appends a stable hash of the full id: sanitized
            # stems alone collide ('docs/a' vs 'docs_a') and partitions
            # would silently overwrite each other's files
            stem = doc_stem(r.source_doc)
            with open(os.path.join(output_dir, f"{stem}.ru"), "w",
                      encoding="utf-8") as f:
                f.write(r.update)
            n += 1
        yield n

    # single job: write and count in the same partition pass
    return sum(updates.rdd.mapPartitions(_write).collect())
