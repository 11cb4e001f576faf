"""S4: Turtle serialization sink (SURVEY.md §2.1).

The reference writes one ``<stem>.ttl`` per document
(processor/rdf_processor.py:66-134).  Here the triples DataFrame is
grouped by source document and each group is formatted to a Turtle string
inside an Arrow-batched ``applyInPandas`` — producing a
``(source_doc, ttl)`` frame the caller can write as files or keep as a
table.  Output is deterministic (sorted triples, fixed prefix block) and
round-trips exactly through goldens.parse_turtle (tested).
"""

from __future__ import annotations

import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql.types import StringType, StructField, StructType

from .uris import KB, RDF, RDFS, SCHEMA, XSD

_PREFIXES = [("kb", KB), ("schema", SCHEMA), ("rdf", RDF),
             ("rdfs", RDFS), ("xsd", XSD)]

TTL_DOC = StructType([StructField("source_doc", StringType()),
                      StructField("ttl", StringType())])

_ESC = {"\\": "\\\\", '"': '\\"', "\n": "\\n", "\r": "\\r", "\t": "\\t"}


def _escape(lex: str) -> str:
    return "".join(_ESC.get(c, c) for c in lex)


import re as _re

_IRI_BAD = _re.compile(r'[\x00-\x20<>"{}|^`\\]|%(?![0-9A-Fa-f]{2})')


def _iri(value: str) -> str:
    """Percent-encode the characters the N-Triples IRIREF production
    forbids (controls, space, ``<>"{}|^`\\``) plus any stray ``%`` that
    does not start a well-formed escape sequence.  Doc ids come from
    crawled URLs, so an adversarial id containing ``>`` or whitespace
    would otherwise produce malformed N-Triples — or, in the SPARQL
    sink, inject arbitrary Update text.  rdflib's nt serializer (which
    the reference relies on, rdf_processor.py:126) performs the
    equivalent validation.

    Well-formed ``%XX`` sequences pass through untouched (a legitimate
    ``http://h/a%20b`` serializes byte-identically to rdflib).  The
    consequence is URI NORMALIZATION, not injectivity: ids that differ
    only in whether a forbidden character is raw or pre-escaped
    (``a>b`` vs ``a%3Eb``) denote the same URI after percent-decoding
    and deliberately coalesce to one IRI — per-document upserts treat
    them as one document, which is the correct reading of two crawled
    URLs that differ only in escaping."""
    return _IRI_BAD.sub(lambda m: "%%%02X" % ord(m.group()), value)


def _term(value: str, is_uri: bool, datatype: str | None) -> str:
    if is_uri:
        return f"<{_iri(value)}>"
    lit = f'"{_escape(value)}"'
    if datatype and datatype != XSD + "string":
        return f"{lit}^^<{_iri(datatype)}>"
    return f"{lit}^^xsd:string"


def _format_doc(pdf: pd.DataFrame) -> pd.DataFrame:
    lines = [f"@prefix {p}: <{ns}> ." for p, ns in _PREFIXES]
    lines.append("")
    rows = sorted(pdf.itertuples(index=False),
                  key=lambda r: (r.subj, r.pred, r.obj))
    for r in rows:
        obj = _term(r.obj, bool(r.obj_is_uri), r.obj_datatype)
        lines.append(f"<{_iri(r.subj)}> <{_iri(r.pred)}> {obj} .")
    return pd.DataFrame({"source_doc": [pdf["source_doc"].iloc[0]],
                         "ttl": ["\n".join(lines) + "\n"]})


def to_turtle(triples: DataFrame) -> DataFrame:
    """triples -> (source_doc, ttl) — one Turtle document per source doc."""
    return triples.groupBy("source_doc").applyInPandas(_format_doc, schema=TTL_DOC)


def write_turtle_files(triples: DataFrame, output_dir: str) -> int:
    """Materialize one .ttl file per document under ``output_dir``
    (driver-side fan-out, intended for fixture-sized corpora; at scale
    keep the (source_doc, ttl) table instead — SURVEY.md §2.1 S4 notes
    TTL files only exist to diff against goldens)."""
    import os
    os.makedirs(output_dir, exist_ok=True)
    n = 0
    for row in to_turtle(triples).toLocalIterator():
        with open(os.path.join(output_dir, doc_stem(row["source_doc"]) + ".ttl"),
                  "w", encoding="utf-8") as f:
            f.write(row["ttl"])
        n += 1
    return n


def doc_stem(source_doc: str) -> str:
    """Filesystem-safe, collision-free stem for per-document sink files.
    Sanitizing alone is lossy ('docs/a' and 'docs_a' both → 'docs_a', one
    file silently overwriting the other), so a short stable hash of the
    ORIGINAL id is appended as a uniqueness suffix."""
    import hashlib
    import re
    safe = re.sub(r"[^A-Za-z0-9._-]", "_", source_doc) or "graph"
    h = hashlib.sha256(source_doc.encode("utf-8", "surrogatepass")).hexdigest()[:8]
    return f"{safe[:120]}-{h}"
