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


def _term(value: str, is_uri: bool, datatype: str | None) -> str:
    if is_uri:
        return f"<{value}>"
    lit = f'"{_escape(value)}"'
    if datatype and datatype != XSD + "string":
        return f"{lit}^^<{datatype}>"
    return f"{lit}^^xsd:string"


def _format_doc(pdf: pd.DataFrame) -> pd.DataFrame:
    lines = [f"@prefix {p}: <{ns}> ." for p, ns in _PREFIXES]
    lines.append("")
    rows = sorted(pdf.itertuples(index=False),
                  key=lambda r: (r.subj, r.pred, r.obj))
    for r in rows:
        obj = _term(r.obj, bool(r.obj_is_uri), r.obj_datatype)
        lines.append(f"<{r.subj}> <{r.pred}> {obj} .")
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
    import re
    os.makedirs(output_dir, exist_ok=True)
    n = 0
    for row in to_turtle(triples).toLocalIterator():
        stem = re.sub(r"[^A-Za-z0-9._-]", "_", row["source_doc"])
        with open(os.path.join(output_dir, stem + ".ttl"), "w", encoding="utf-8") as f:
            f.write(row["ttl"])
        n += 1
    return n
