"""S4b: JSON-LD and RDF/XML serialization sinks beside the Turtle one.

The reference's export endpoint serializes the in-memory graph to
``turtle | json-ld | xml`` (webapp/backend/main.py:254-281, rdflib
``Graph.serialize``).  Here each format is the same distributed shape as
``sinks_ttl.to_turtle``: group the triples DataFrame by source document
and format each group inside an Arrow-batched ``applyInPandas`` —
stdlib-only emit (``json`` / manual XML writer), deterministic output
(sorted subjects/predicates/objects, fixed prefix table), producing a
``(source_doc, body)`` frame the caller writes as files or keeps as a
table.

Both formats round-trip: :func:`parse_jsonld` / :func:`parse_rdfxml`
(stdlib ``json`` / ``xml.etree``) read a serialized document back into
the same ``(subj, pred, obj, 'uri'|datatype)`` tuple set that
``goldens.parse_turtle`` produces, so the three formats are
isomorphism-checked against each other in tests.

* JSON-LD: expanded form — a top-level array of node objects
  ``{"@id": subj, pred: [{"@id": ...} | {"@value": ..., "@type": ...}]}``.
  Plain ``@value`` strings mean ``xsd:string`` (the JSON-LD default).
* RDF/XML: one ``rdf:Description rdf:about`` per subject; predicates
  must be QNames, so each predicate IRI splits at its last ``#`` or
  ``/`` and unknown namespaces get deterministic ``ns1, ns2, ...``
  prefixes (sorted namespace order).
"""

from __future__ import annotations

import json
import re
from xml.etree import ElementTree

import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql.types import StringType, StructField, StructType

from .sinks_ttl import _iri
from .uris import KB, RDF, RDFS, SCHEMA, XSD

JSONLD_DOC = StructType([StructField("source_doc", StringType()),
                         StructField("jsonld", StringType())])
RDFXML_DOC = StructType([StructField("source_doc", StringType()),
                         StructField("rdfxml", StringType())])

_XSD_STRING = XSD + "string"
_KNOWN_NS = [("kb", KB), ("schema", SCHEMA), ("rdf", RDF),
             ("rdfs", RDFS), ("xsd", XSD)]

# RDF/XML local names must be NCNames: letters/digits/._- not starting
# with a digit/dot/dash (ASCII subset is enough for this vocabulary)
_NCNAME = re.compile(r"[A-Za-z_][A-Za-z0-9._-]*$")


def _sorted_triples(pdf: pd.DataFrame):
    return sorted(
        ((r.subj, r.pred, r.obj, bool(r.obj_is_uri),
          r.obj_datatype or _XSD_STRING)
         for r in pdf.itertuples(index=False)),
        key=lambda t: (t[0], t[1], t[2], t[4]))


# --- JSON-LD ---------------------------------------------------------------

def _jsonld_object(obj: str, is_uri: bool, datatype: str) -> dict:
    if is_uri:
        return {"@id": _iri(obj)}
    if datatype == _XSD_STRING:
        return {"@value": obj}
    return {"@value": obj, "@type": _iri(datatype)}


def _format_jsonld(pdf: pd.DataFrame) -> pd.DataFrame:
    nodes: dict[str, dict] = {}
    for subj, pred, obj, is_uri, dt in _sorted_triples(pdf):
        node = nodes.setdefault(_iri(subj), {"@id": _iri(subj)})
        node.setdefault(_iri(pred), []).append(
            _jsonld_object(obj, is_uri, dt))
    body = json.dumps(list(nodes.values()), ensure_ascii=False, indent=2)
    return pd.DataFrame({"source_doc": [pdf["source_doc"].iloc[0]],
                         "jsonld": [body + "\n"]})


def to_jsonld(triples: DataFrame) -> DataFrame:
    """triples -> (source_doc, jsonld) — one expanded JSON-LD document
    per source doc."""
    return (triples.groupBy("source_doc")
            .applyInPandas(_format_jsonld, schema=JSONLD_DOC))


def parse_jsonld(text: str) -> set[tuple]:
    """Expanded JSON-LD -> {(subj, pred, obj, 'uri'|datatype)} — the
    same tuple shape as ``goldens.parse_turtle``."""
    out: set[tuple] = set()
    for node in json.loads(text):
        subj = node["@id"]
        for pred, objs in node.items():
            if pred == "@id":
                continue
            for o in objs:
                if "@id" in o:
                    out.add((subj, pred, o["@id"], "uri"))
                else:
                    out.add((subj, pred, o["@value"],
                             o.get("@type", _XSD_STRING)))
    return out


# --- RDF/XML ---------------------------------------------------------------

def _split_qname(pred: str) -> tuple[str, str]:
    """namespace/local split at the last ``#`` or ``/`` with a valid
    NCName local part; widens the namespace leftward if needed."""
    for m in reversed(list(re.finditer(r"[#/]", pred))):
        local = pred[m.end():]
        if _NCNAME.match(local):
            return pred[:m.end()], local
    raise ValueError(f"predicate IRI has no XML-serializable local name:"
                     f" {pred!r}")


def _xml_escape(s: str, attr: bool = False) -> str:
    s = s.replace("&", "&amp;").replace("<", "&lt;").replace(">", "&gt;")
    if attr:
        s = s.replace('"', "&quot;").replace("\n", "&#10;")
        s = s.replace("\r", "&#13;").replace("\t", "&#9;")
    else:
        s = s.replace("\r", "&#13;")
    return s


def _format_rdfxml(pdf: pd.DataFrame) -> pd.DataFrame:
    triples = _sorted_triples(pdf)
    ns_prefix = dict((ns, p) for p, ns in _KNOWN_NS)
    extra = sorted({_split_qname(t[1])[0] for t in triples}
                   - set(ns_prefix))
    for i, ns in enumerate(extra):
        ns_prefix[ns] = f"ns{i + 1}"
    used = sorted({_split_qname(t[1])[0] for t in triples} | {RDF})
    decls = "".join(f'\n         xmlns:{ns_prefix[ns]}="{_xml_escape(_iri(ns), attr=True)}"'
                    for ns in used)
    lines = ['<?xml version="1.0" encoding="UTF-8"?>',
             f"<rdf:RDF{decls}>"]
    cur = None
    for subj, pred, obj, is_uri, dt in triples:
        if subj != cur:
            if cur is not None:
                lines.append("  </rdf:Description>")
            lines.append(f'  <rdf:Description rdf:about='
                         f'"{_xml_escape(_iri(subj), attr=True)}">')
            cur = subj
        ns, local = _split_qname(pred)
        q = f"{ns_prefix[ns]}:{local}"
        if is_uri:
            lines.append(f'    <{q} rdf:resource='
                         f'"{_xml_escape(_iri(obj), attr=True)}"/>')
        elif dt == _XSD_STRING:
            lines.append(f"    <{q}>{_xml_escape(obj)}</{q}>")
        else:
            lines.append(f'    <{q} rdf:datatype='
                         f'"{_xml_escape(_iri(dt), attr=True)}">'
                         f"{_xml_escape(obj)}</{q}>")
    if cur is not None:
        lines.append("  </rdf:Description>")
    lines.append("</rdf:RDF>")
    return pd.DataFrame({"source_doc": [pdf["source_doc"].iloc[0]],
                         "rdfxml": ["\n".join(lines) + "\n"]})


def to_rdfxml(triples: DataFrame) -> DataFrame:
    """triples -> (source_doc, rdfxml) — one RDF/XML document per
    source doc."""
    return (triples.groupBy("source_doc")
            .applyInPandas(_format_rdfxml, schema=RDFXML_DOC))


def parse_rdfxml(text: str) -> set[tuple]:
    """RDF/XML (the subset this sink emits: Description/about,
    resource/datatype attributes, no nesting) -> the parse_turtle tuple
    shape."""
    rdf_ns = "{" + RDF + "}"
    out: set[tuple] = set()
    root = ElementTree.fromstring(text)
    for desc in root:
        subj = desc.attrib[rdf_ns + "about"]
        for el in desc:
            pred = el.tag.replace("{", "").replace("}", "")
            res = el.attrib.get(rdf_ns + "resource")
            if res is not None:
                out.add((subj, pred, res, "uri"))
            else:
                dt = el.attrib.get(rdf_ns + "datatype", _XSD_STRING)
                out.add((subj, pred, el.text or "", dt))
    return out
