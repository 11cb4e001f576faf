"""Run the REFERENCE implementation in-process for differential testing.

The sandbox has the reference's pure-Python source at
`/root/reference/src` but not its rdflib dependency; tests/refshim/
provides the small in-memory rdflib subset its document->graph path
needs.  This module wires sys.path (shim first, then reference src, then
the repo's vendored markdown_it) and exposes

    reference_triples(doc_id, text) -> set[(subj, pred, obj, flag)]

in exactly the goldens.load_golden comparison format (timestamp triples
dropped, flag = "uri" or the literal datatype IRI), so any input —
hostile, fuzzed, or golden — can be checked against the Spark pipeline
without stored fixtures.  The reference entry point is
tests/test_specifications.py:100-117 (process_content_to_graph with all
eight extractors registered).
"""

from __future__ import annotations

import sys
from pathlib import Path

_HERE = Path(__file__).resolve().parent
_SHIM = str(_HERE / "refshim")
_REF_SRC = "/root/reference/src"
_VENDOR = str(_HERE.parent / "vendor")

_TS_PREDS = {"https://schema.org/dateCreated", "https://schema.org/dateModified"}

_processor_factory = None


def _ensure_paths() -> None:
    for p in (_SHIM, _REF_SRC, _VENDOR):
        if p not in sys.path:
            sys.path.insert(0, p)
    if "rdflib" in sys.modules:
        mod = sys.modules["rdflib"]
        if not (getattr(mod, "__file__", "") or "").startswith(_SHIM):
            raise RuntimeError("a different rdflib is already imported")


def reference_available() -> bool:
    try:
        _get_factory()
        return True
    except Exception:
        return False


def _get_factory():
    """Import the reference once and return a zero-arg processor factory
    (a fresh Processor per call — its DocumentRegistry is stateful)."""
    global _processor_factory
    if _processor_factory is not None:
        return _processor_factory
    _ensure_paths()

    # the reference's pydantic-v1-style Config blocks warn on 2.x; that's
    # the reference's business, not a signal in our suite
    import warnings
    warnings.filterwarnings(
        "ignore", category=DeprecationWarning, module=r"pydantic.*")
    warnings.filterwarnings("ignore", message=".*class-based `config`.*")

    from knowledgebase_processor.processor.processor import Processor
    from knowledgebase_processor.utils.document_registry import DocumentRegistry
    from knowledgebase_processor.utils.id_generator import EntityIdGenerator
    from knowledgebase_processor.extractor.markdown import MarkdownExtractor
    from knowledgebase_processor.extractor.frontmatter import FrontmatterExtractor
    from knowledgebase_processor.extractor.heading_section import HeadingSectionExtractor
    from knowledgebase_processor.extractor.link_reference import LinkReferenceExtractor
    from knowledgebase_processor.extractor.code_quote import CodeQuoteExtractor
    from knowledgebase_processor.extractor.todo_item import TodoItemExtractor
    from knowledgebase_processor.extractor.tags import TagExtractor
    from knowledgebase_processor.extractor.list_table import ListTableExtractor

    def factory():
        processor = Processor(
            document_registry=DocumentRegistry(),
            id_generator=EntityIdGenerator(base_url="http://example.org/kb/"),
            config=None,
        )
        for ext in (MarkdownExtractor(), FrontmatterExtractor(),
                    HeadingSectionExtractor(), LinkReferenceExtractor(),
                    CodeQuoteExtractor(), TodoItemExtractor(), TagExtractor(),
                    ListTableExtractor()):
            processor.register_extractor(ext)
        return processor

    _processor_factory = factory
    return factory


def _graph_to_set(graph) -> set[tuple[str, str, str, str]]:
    from rdflib import Literal  # the shim

    out: set[tuple[str, str, str, str]] = set()
    for s, p, o in graph:
        if str(p) in _TS_PREDS:
            continue
        if isinstance(o, Literal):
            flag = str(o.datatype) if o.datatype else "plain"
            out.add((str(s), str(p), str(o), flag))
        else:
            out.add((str(s), str(p), str(o), "uri"))
    return out


def reference_corpus_triples(files: dict[str, str]) -> dict[str, set]:
    """The reference's BATCH flow (pipeline_orchestrator.process_documents_
    batch phases, minus file serialization): write ``files`` ({relative
    path: markdown}) to a temp knowledge base, register every document
    (phase 1), process each against the POPULATED registry (phase 2 —
    this is what exercises cross-document wikilink resolution), and
    return {relative path: triple set} in the shared comparison format."""
    import os
    import tempfile

    _get_factory()  # ensure paths + imports
    from pathlib import Path as _P

    from knowledgebase_processor.reader.reader import Reader

    with tempfile.TemporaryDirectory() as kb:
        for rel, text in files.items():
            p = os.path.join(kb, rel)
            os.makedirs(os.path.dirname(p), exist_ok=True)
            with open(p, "w", encoding="utf-8") as f:
                f.write(text)
        processor = _get_factory()()
        reader = Reader(kb)
        data = processor.document_processor.read_and_register_documents(
            reader, "**/*.md", _P(kb))
        out: dict[str, set] = {}
        for path, document, kb_doc in data:
            entities, _ = processor.pipeline.process_single_document(
                document, kb_doc)
            graph = processor.pipeline.rdf_processor.entities_to_graph(entities)
            rel = os.path.relpath(path, kb).replace(os.sep, "/")
            out[rel] = _graph_to_set(graph)
        return out


def reference_triples(doc_id: str, text: str) -> set[tuple[str, str, str, str]]:
    """The reference's emitted triple set for one document, normalized to
    the shared comparison format (timestamps stripped)."""
    processor = _get_factory()()
    graph = processor.process_content_to_graph(text, document_id=doc_id)
    return _graph_to_set(graph)
