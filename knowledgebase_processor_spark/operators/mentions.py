"""Dictionary + rule-based mention detection and candidate entity linking.

The north rule replaces the reference's optional spaCy NER
(analyzer/entity_recognizer.py:35-58, disabled by default in
config/config.py:26) with a broadcast alias-dictionary scan:

* the alias dictionary (alias -> entity kind [+ canonical id]) is tiny
  relative to the corpus, so it broadcasts — either compiled into a regex
  union evaluated JVM-side (small dicts) or scanned inside an
  Arrow-batched pandas UDF (large dicts);
* detected mentions become KB entities with the reference's NER URI
  scheme (processor/named_entity_processor.py:159-163: a wikilink-style
  hash of ``{LABEL}-{text}`` scoped to the source document);
* candidate linking scores each mention against the alias dictionary's
  context words with a window-Jaccard similarity — the "context-similarity
  scoring" column of the north star.
"""

from __future__ import annotations

import re
from typing import Iterator

import pandas as pd

from pyspark.sql import DataFrame, functions as F
from pyspark.sql.types import (
    ArrayType, DoubleType, LongType, StringType, StructField, StructType,
)

from .. import uris

MENTIONS = StructType([
    StructField("doc_id", StringType()),
    StructField("alias", StringType()),
    StructField("kind", StringType()),
    StructField("start", LongType()),
    StructField("end", LongType()),
    StructField("context_score", DoubleType()),
])

# spaCy-label -> entity kind map (named_entity_processor.py:26-32)
LABEL_KIND = {"PERSON": "person", "ORG": "organization",
              "LOC": "location", "GPE": "location", "DATE": "date_entity"}


def detect_mentions(docs: DataFrame, alias_dict: dict[str, tuple[str, list[str]]],
                    doc_id_col: str = "doc_id", text_col: str = "text",
                    window: int = 40) -> DataFrame:
    """docs + {alias: (kind, context_words)} -> MENTIONS rows.

    The dictionary rides the closure (Spark broadcasts task binaries); for
    multi-GB dictionaries switch to ``spark.sparkContext.broadcast`` — the
    scan code is unchanged.
    """
    if not alias_dict:  # no aliases -> no mentions, not a crashed job
        return docs.sparkSession.createDataFrame([], MENTIONS)

    def _alt(alias: str) -> str:
        # word-boundary guards only where the alias edge IS a word char —
        # a bare \b around e.g. "C++" or "@handle" can never match (both
        # sides of the edge are non-word, so no boundary exists there)
        pre = r"(?<!\w)" if re.match(r"\w", alias[0]) else ""
        post = r"(?!\w)" if re.match(r"\w", alias[-1]) else ""
        return pre + re.escape(alias) + post

    compiled = re.compile(
        "(" + "|".join(_alt(a) for a in
                       sorted(alias_dict, key=len, reverse=True)) + ")")
    ctx_words = {a: set(w.lower() for w in words)
                 for a, (_, words) in alias_dict.items()}

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for batch in batches:
            rows = []
            for rec in batch.itertuples(index=False):
                text = getattr(rec, text_col) or ""
                doc_id = getattr(rec, doc_id_col)
                for m in compiled.finditer(text):
                    alias = m.group(1)
                    kind, _ = alias_dict[alias]
                    lo = max(0, m.start() - window)
                    ctx = set(text[lo:m.end() + window].lower().split())
                    want = ctx_words[alias]
                    score = (len(ctx & want) / len(want)) if want else 0.0
                    rows.append({"doc_id": doc_id, "alias": alias, "kind": kind,
                                 "start": m.start(), "end": m.end(),
                                 "context_score": round(score, 6)})
            yield pd.DataFrame(rows, columns=[f.name for f in MENTIONS.fields])

    return docs.select(doc_id_col, text_col).mapInPandas(run, schema=MENTIONS)


def mentions_to_entities(mentions: DataFrame) -> DataFrame:
    """Mention rows -> ENTITIES-schema rows with the reference NER URI
    scheme; join-ready for ``triples_from_entities``.

    All column work is JVM-side except the hash16 URI, which reuses the
    sha2/base64 builtins: urlsafe-b64(sha256)[:16] == standard b64 with
    +/ translated to -_ (id_generator.py:60-68).
    """
    from ..extract.core import ENTITY_FIELDS

    spacy_label = F.when(F.col("kind") == "person", "PERSON") \
        .when(F.col("kind") == "organization", "ORG") \
        .when(F.col("kind") == "location", "LOC") \
        .otherwise("DATE")
    hash_input = F.concat(F.col("doc_id"), spacy_label, F.lit("-"), F.col("alias"))
    h16 = F.substring(
        F.translate(F.base64(F.unhex(F.sha2(hash_input, 256))), "+/", "-_"), 1, 16)
    kb_id = F.concat(F.lit(uris.BASE_URL + "wikilinks/"), h16)

    from ..schema import ENTITIES

    base = mentions.select(
        F.col("kind"), kb_id.alias("kb_id"), F.col("alias").alias("label"),
        F.col("doc_id").alias("source_document_uri"),
        F.col("alias").alias("text"))
    types = {f.name: f.dataType for f in ENTITIES.fields}
    for c in ENTITY_FIELDS:
        if c not in base.columns:
            base = base.withColumn(c, F.lit(None).cast(types[c]))
    return base.select(*ENTITY_FIELDS)
