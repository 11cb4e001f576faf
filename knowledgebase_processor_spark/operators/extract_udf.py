"""Arrow-batched document -> entities extraction operator.

`mapInPandas` wrapper around ``extract.core.extract_entities``: the per-row
Python work the reference does one document at a time
(processor/pipeline_orchestrator.py:140-166) becomes a partition-parallel,
Arrow-batched map with no shuffle.  Errors are isolated per document the
same way the reference isolates them per file (:160-165): a failing
document contributes an ``error`` row to the lineage side-channel instead
of killing the job.
"""

from __future__ import annotations

from typing import Iterator

import pandas as pd

from pyspark.sql import DataFrame, functions as F

from ..extract.core import ENTITY_FIELDS, extract_entities, extract_entities_merged
from ..schema import ENTITIES, ENTITIES_MERGED
from .metadata import derive_title

_INT_FIELDS = {"level", "item_count", "row_count", "column_count",
               "line_count", "position_start", "position_end"}
_BOOL_FIELDS = {"is_completed", "ordered"}


def _effective_title(title, text: str, path: str) -> str:
    """Batch-mode reference semantics (pipeline_orchestrator phase 1 /
    reader.py:125-136): a NULL title means "derive it" — frontmatter
    title > filename stem > first heading for generic stems.  Passing a
    non-null title (or no title column at all, which keeps the temp-doc
    default) bypasses derivation."""
    if title is None or (isinstance(title, float) and pd.isna(title)):
        return derive_title(text, path)
    return title


def _to_frame(rows: list[dict]) -> pd.DataFrame:
    df = pd.DataFrame(rows, columns=ENTITY_FIELDS)
    for c in _INT_FIELDS:
        df[c] = df[c].astype("Int64")
    for c in _BOOL_FIELDS:
        df[c] = df[c].astype("boolean")
    return df


def extract_entities_df(
    docs: DataFrame,
    doc_id_col: str = "doc_id",
    text_col: str = "text",
    path_col: str | None = None,
    title_col: str | None = None,
) -> DataFrame:
    """documents(doc_id, text[, path, title]) -> ENTITIES DataFrame.

    ``doc_id`` is the document's KB identifier (relative like
    ``test_cases/x`` or a full URI).  Without path/title columns the
    string-content defaults apply (pipeline_orchestrator.py:190-203):
    path ``temp_document.md``, title ``Temporary Document``.
    """
    cols = [doc_id_col, text_col]
    if path_col:
        cols.append(path_col)
    if title_col:
        cols.append(title_col)
    # Column pruning before the Python stage; a null id has no KG identity
    # (every URI embeds it) and would silently mint "None/..." nodes.
    narrowed = docs.select(*cols).filter(F.col(doc_id_col).isNotNull())

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for batch in batches:
            rows: list[dict] = []
            for rec in batch.itertuples(index=False):
                doc_id = getattr(rec, doc_id_col)
                text = getattr(rec, text_col) or ""
                path = getattr(rec, path_col) if path_col else "temp_document.md"
                title = (_effective_title(getattr(rec, title_col), text, path)
                         if title_col else "Temporary Document")
                try:
                    rows.extend(extract_entities(doc_id, text, path, title))
                except Exception as exc:  # per-document isolation
                    rows.append({**dict.fromkeys(ENTITY_FIELDS),
                                 "kind": "error", "kb_id": str(doc_id),
                                 "source_document_uri": str(doc_id),
                                 "text": f"{type(exc).__name__}: {exc}"})
            yield _to_frame(rows)

    return narrowed.mapInPandas(run, schema=ENTITIES)


def extract_merged_entities_df(
    docs: DataFrame,
    doc_id_col: str = "doc_id",
    text_col: str = "text",
    path_col: str | None = None,
    title_col: str | None = None,
) -> DataFrame:
    """Like extract_entities_df but with per-document duplicate-entity
    merging done in-process (extract.core.extract_entities_merged), so the
    output needs no dedup shuffle — every varying field is an array.
    Errors are dropped here (they carry no mergeable fields); use
    extract_entities_df when the error side-channel matters.
    """
    merged_fields = [f.name for f in ENTITIES_MERGED.fields]
    cols = [doc_id_col, text_col]
    if path_col:
        cols.append(path_col)
    if title_col:
        cols.append(title_col)
    narrowed = docs.select(*cols).filter(F.col(doc_id_col).isNotNull())

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for batch in batches:
            rows: list[dict] = []
            for rec in batch.itertuples(index=False):
                doc_id = getattr(rec, doc_id_col)
                text = getattr(rec, text_col) or ""
                path = getattr(rec, path_col) if path_col else "temp_document.md"
                title = (_effective_title(getattr(rec, title_col), text, path)
                         if title_col else "Temporary Document")
                try:
                    rows.extend(extract_entities_merged(doc_id, text, path, title))
                except Exception:
                    continue
            yield pd.DataFrame(rows, columns=merged_fields)

    return narrowed.mapInPandas(run, schema=ENTITIES_MERGED)
