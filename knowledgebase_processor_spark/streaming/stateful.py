"""Custom stateful streaming operator via ``applyInPandasWithState``.

The reference has no stateful streaming at all (SURVEY.md §2.8); a
web-scale crawl feed needs at least one: tracking per-document mutation
across re-crawls.  ``track_document_versions`` keeps, per url, a running
(version_count, last_fingerprint, first_seen_ts) state and emits one row
per incoming batch telling whether the page content CHANGED since the
last crawl — the streaming primitive behind incremental re-extraction
(only changed pages re-enter the KG pipeline).

Batch-testable: the same transition function is exposed as
``apply_version_state`` for deterministic unit tests, and the streaming
wiring (GroupState, timeouts) is exercised with a memory-sink query.
"""

from __future__ import annotations

from typing import Any, Iterator, Tuple

import pandas as pd

from pyspark.sql.streaming.state import GroupState, GroupStateTimeout
from pyspark.sql.types import (
    BooleanType, LongType, StringType, StructField, StructType,
)

VERSION_OUT = StructType([
    StructField("url", StringType()),
    StructField("version", LongType()),
    StructField("changed", BooleanType()),
    StructField("fingerprint", StringType()),
])

# state: (version_count long, last_fingerprint string)
VERSION_STATE = StructType([
    StructField("version", LongType()),
    StructField("last_fingerprint", StringType()),
])


def _fingerprint(text: str) -> str:
    import hashlib
    norm = " ".join((text or "").lower().split())
    return hashlib.sha256(norm.encode("utf-8")).hexdigest()


def apply_version_state(
    key: Tuple[str], pdfs: Iterator[pd.DataFrame], state: GroupState,
) -> Iterator[pd.DataFrame]:
    """Transition function: one output row per (url, batch)."""
    url = key[0]
    version, last_fp = state.get if state.exists else (0, None)
    rows = []
    batch = pd.concat(list(pdfs), ignore_index=True)
    # process crawls in timestamp order within the batch
    if "warc_ts" in batch.columns:
        batch = batch.sort_values("warc_ts")
    for rec in batch.itertuples(index=False):
        fp = _fingerprint(rec.text)
        changed = fp != last_fp
        if changed:
            version += 1
            last_fp = fp
        rows.append({"url": url, "version": version,
                     "changed": changed, "fingerprint": fp})
    state.update((version, last_fp))
    yield pd.DataFrame(rows, columns=[f.name for f in VERSION_OUT.fields])


def track_document_versions(pages_stream):
    """streaming web_pages -> per-crawl change rows (stateful)."""
    return (pages_stream
            .groupBy("url")
            .applyInPandasWithState(
                apply_version_state,
                outputStructType=VERSION_OUT,
                stateStructType=VERSION_STATE,
                outputMode="append",
                timeoutConf=GroupStateTimeout.NoTimeout))
