"""Boilerplate-stripped text extraction from raw HTML.

The north rule's input table carries raw Common-Crawl-style ``html``
(binary) next to pre-extracted ``text``; when ``text`` is absent the
pipeline must produce it from the HTML (BASELINE.json north_star:
"boilerplate-stripped text extraction from raw HTML").  The reference has
no HTML path at all (its reader consumes markdown files directly,
reader/reader.py:76-136), so this operator is a from-scratch addition in
the Boilerpipe/jusText tradition: remove non-content subtrees, then keep
text blocks by content-density rules.

Implementation notes:
* stdlib-only (``html.parser``) — no lxml/bs4 in the sandbox, and a
  dependency-free extractor ships everywhere spark-submit does.
* Runs as an Arrow-batched ``mapInPandas`` kernel (the same no-per-row-
  Python contract as the markdown extraction UDF): one Python call per
  ~8k-row batch, a tight loop inside.
* Deterministic: pure function of the html bytes — the per-url
  byte-identical invariant (tests/test_web_pages.py) extends to it.

Heuristics (classic jusText-style, tuned small):
* drop subtrees: script/style/noscript/template/svg/iframe/head,
  and the sectioning boilerplate nav/header/footer/aside/form.
* block-level tags flush paragraphs; inline tags concatenate.
* keep a paragraph if it has >= MIN_CHARS characters AND its
  link-density (chars inside <a> / total chars) is < MAX_LINK_DENSITY;
  short all-link paragraphs (menus, breadcrumbs) drop.
* <pre> blocks are kept verbatim (code/markdown payloads).
"""

from __future__ import annotations

from html.parser import HTMLParser
from typing import Iterator

from pyspark.sql import DataFrame, functions as F

_DROP_SUBTREES = frozenset(
    "script style noscript template svg iframe head nav header footer aside form".split())
_BLOCK_TAGS = frozenset(
    "p div section article main li ul ol table tr td th h1 h2 h3 h4 h5 h6 "
    "blockquote figure figcaption details summary br hr".split())

MIN_CHARS = 25
MAX_LINK_DENSITY = 0.5


class _Extractor(HTMLParser):
    def __init__(self) -> None:
        super().__init__(convert_charrefs=True)
        self.blocks: list[str] = []
        self._buf: list[str] = []
        self._link_chars = 0
        self._total_chars = 0
        self._drop_stack: list[str] = []
        self._a_depth = 0
        self._pre_depth = 0

    @property
    def _drop_depth(self) -> int:
        return len(self._drop_stack)

    def _flush(self) -> None:
        text = "".join(self._buf)
        if self._pre_depth == 0:
            text = " ".join(text.split())
        total, link = self._total_chars, self._link_chars
        self._buf, self._total_chars, self._link_chars = [], 0, 0
        if not text:
            return
        if self._pre_depth > 0:
            self.blocks.append(text)            # verbatim payload block
            return
        if total >= MIN_CHARS and (link / total) < MAX_LINK_DENSITY:
            self.blocks.append(text)

    def handle_starttag(self, tag, attrs):
        # HTML5 allows omitting </head>; html.parser does not synthesize
        # it, so an open <head> would otherwise swallow the entire body.
        # <body> (or any content block) implicitly closes an open head.
        if self._drop_stack and self._drop_stack[-1] == "head" \
                and (tag == "body" or tag in _BLOCK_TAGS):
            self._drop_stack.pop()
        if tag in _DROP_SUBTREES:
            self._drop_stack.append(tag)
            return
        if self._drop_depth:
            return
        if tag == "a":
            self._a_depth += 1
        if tag == "pre":
            self._flush()
            self._pre_depth += 1
        elif tag in _BLOCK_TAGS:
            self._flush()

    def handle_endtag(self, tag):
        if tag in _DROP_SUBTREES:
            if tag in self._drop_stack:
                # pop to (and including) the matching open tag — tolerates
                # unclosed inner drop-tags like <form> without </form>
                while self._drop_stack and self._drop_stack.pop() != tag:
                    pass
            return
        if self._drop_depth:
            return
        if tag == "a":
            self._a_depth = max(0, self._a_depth - 1)
        if tag == "pre":
            self._flush()
            self._pre_depth = max(0, self._pre_depth - 1)
        elif tag in _BLOCK_TAGS:
            self._flush()

    def handle_data(self, data):
        if self._drop_depth:
            return
        self._buf.append(data)
        n = len(data.strip())
        self._total_chars += n
        if self._a_depth:
            self._link_chars += n


def extract_main_text(html) -> str:
    """bytes|str html -> boilerplate-stripped text (deterministic)."""
    if html is None:
        return ""
    if isinstance(html, (bytes, bytearray)):
        html = bytes(html).decode("utf-8", errors="replace")
    p = _Extractor()
    try:
        p.feed(html)
        p.close()
    except Exception:
        # malformed html: keep whatever blocks were parsed before the error
        pass
    p._flush()
    # convert_charrefs=True already unescaped entities in handle_data;
    # a second unescape here would mangle literal "&amp;" payloads.
    return "\n\n".join(p.blocks)


def strip_boilerplate(pages: DataFrame, html_col: str = "html",
                      out_col: str = "extracted_text") -> DataFrame:
    """Add ``out_col`` = boilerplate-stripped text of ``html_col``.

    Arrow-batched mapInPandas over ONLY (passthrough cols + html): the
    schema is pages.schema + out_col, so the operator composes with any
    upstream projection; no shuffle, no Python in any other column's path.
    """
    import pandas as pd
    from pyspark.sql.types import StringType, StructField, StructType

    out_schema = StructType(list(pages.schema.fields)
                            + [StructField(out_col, StringType())])

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for batch in batches:
            batch[out_col] = [extract_main_text(h) for h in batch[html_col]]
            yield batch

    return pages.mapInPandas(run, schema=out_schema)


def pages_with_text(pages: DataFrame) -> DataFrame:
    """The north-rule text-resolution cascade: keep ``text`` when the
    table ships it; otherwise extract from raw html.

    Rows that already carry text bypass the Python stage entirely (a
    Common-Crawl table usually ships WET text for most rows — running the
    HTML parser over them would be the dominant cost for zero output);
    only the null-text slice pays for parsing.  Both slices are narrow
    scans of the same source, so no shuffle is introduced and the filter
    is pushed down to the parquet reader."""
    has_text = pages.filter(F.col("text").isNotNull())
    needs = pages.filter(F.col("text").isNull())
    extracted = (strip_boilerplate(needs)
                 .withColumn("text", F.col("extracted_text"))
                 .drop("extracted_text"))
    return has_text.unionByName(extracted)
