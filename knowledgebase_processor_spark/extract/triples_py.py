"""Pure-Python triple emission mirroring ``operators.triples``.

Test oracle only: the production path is the Spark SQL transform in
``operators/triples.py``; this module applies the same ``rdf_schema``
rules row-at-a-time so unit tests can check extraction parity against the
golden TTLs without a SparkSession, and so the Spark emitter can be
property-tested against an independent implementation.
"""

from __future__ import annotations

from typing import Iterable

from ..rdf_schema import (
    BOOL_COLUMNS, INT_COLUMNS, KB_SOURCE_DOC, KIND_RULES, RDF_TYPE,
    RDFS_LABEL, RDFS_SEEALSO, XSD_STRING,
)
from ..uris import KB, resolve_uri

Triple = tuple[str, str, str, str]


def _lexical(col: str, value) -> str:
    if col in BOOL_COLUMNS:
        return "true" if value else "false"
    if col in INT_COLUMNS:
        return str(int(value))
    return str(value)


def entity_triples(ent: dict) -> set[Triple]:
    rules = KIND_RULES.get(ent["kind"])
    if rules is None:
        return set()
    subj = resolve_uri(ent["kb_id"], KB)
    out: set[Triple] = set()

    for t in rules["types"] + [KB + "Entity"]:
        out.add((subj, RDF_TYPE, t, "uri"))
    out.add((subj, RDFS_SEEALSO, subj, "uri"))
    if ent.get("source_document_uri") is not None:
        out.add((subj, KB_SOURCE_DOC, resolve_uri(ent["source_document_uri"], KB), "uri"))

    label = ent.get("label")
    if label is not None:
        out.add((subj, RDFS_LABEL, str(label), XSD_STRING))
    if label is None or not str(label).strip():
        for fb in rules["label_fallbacks"]:
            if fb == "label":
                continue
            v = ent.get(fb)
            if v is not None and _lexical(fb, v).strip():
                out.add((subj, RDFS_LABEL, _lexical(fb, v), XSD_STRING))
                break

    for col, pred, datatype, is_obj, is_list in rules["fields"]:
        v = ent.get(col)
        if v is None:
            continue
        values = v if is_list else [v]
        for item in values:
            if is_obj:
                out.add((subj, pred, resolve_uri(str(item), KB), "uri"))
            else:
                out.add((subj, pred, _lexical(col, item), datatype))
    return out


def entities_triples(entities: Iterable[dict]) -> set[Triple]:
    out: set[Triple] = set()
    for ent in entities:
        out |= entity_triples(ent)
    return out
