"""Differential tests: our Spark pipeline vs the LIVE reference implementation.

tests/reference_runtime.py runs the reference's own document->graph path
(/root/reference/src, tests/test_specifications.py:100-117 entry point)
in-process via the rdflib shim, so parity is checked against the
reference's ACTUAL behavior on arbitrary inputs — not just the stored
golden TTLs.  This found that the 6 reference-corpus goldens are stale:
the live reference itself disagrees with them (pre-anonymization wikilink
hash IDs), while our output matches the live reference exactly on all 66
fixtures.
"""

from __future__ import annotations

import random
import sys
from pathlib import Path

import pytest

sys.path.insert(0, str(Path(__file__).resolve().parent))

from reference_runtime import (  # noqa: E402
    reference_available, reference_corpus_triples, reference_triples,
)

pytestmark = pytest.mark.skipif(
    not reference_available(),
    reason="reference source not runnable in this environment")


def _ours(spark, docs: dict[str, str]) -> dict[str, set]:
    from knowledgebase_processor_spark.pipeline import documents_to_triples
    sdf = spark.createDataFrame(list(docs.items()), "doc_id string, text string")
    out: dict[str, set] = {d: set() for d in docs}
    for r in documents_to_triples(sdf).collect():
        out[r.source_doc].add(
            (r.subj, r.pred, r.obj, "uri" if r.obj_is_uri else r.obj_datatype))
    return out


def test_reference_harness_reproduces_stored_golden():
    """Sanity gate for the harness itself: on a unit fixture the live
    reference must bit-reproduce its stored golden, proving the shim
    changes nothing about reference behavior."""
    from knowledgebase_processor_spark.goldens import load_golden
    base = Path("/root/reference/specs/test_cases/todo_05_mixed_todos")
    got = reference_triples("test_cases/todo_05_mixed_todos",
                            (base / "input.md").read_text(encoding="utf-8"))
    assert got == load_golden(base / "expected_output.ttl")


def test_all_fixtures_match_live_reference(spark):
    """All 66 fixtures (60 unit + 6 corpus): ours == live reference,
    triple for triple.  Also pins down WHY the corpus goldens score
    below 1.0 against stored TTLs: the live reference disagrees with
    those TTLs too (stale fixtures), so golden projection there is a
    fixture artifact, not a pipeline error."""
    from knowledgebase_processor_spark.goldens import load_golden, spec_cases
    cases = [(d, md.read_text(encoding="utf-8"), ttl)
             for d, md, ttl in spec_cases()]
    ref = {d: reference_triples(d, text) for d, text, _ in cases}
    ours = _ours(spark, {d: text for d, text, _ in cases})

    mismatched = [d for d, _, _ in cases if ref[d] != ours[d]]
    assert mismatched == [], f"live-reference mismatches: {mismatched}"

    stale = [d for d, _, ttl in cases
             if d.startswith("test_corpus/") and ref[d] != load_golden(ttl)]
    assert len(stale) == 6, (
        "corpus golden staleness changed — revisit parity_report projection")


EDGE_DOCS = {
    "edge/crlf": "# Title\r\n\r\n- [ ] task one\r\n- [x] done\r\n\r\n#tag1 [[Page One]]\r\n",
    "edge/bom": "﻿# BOM Doc\n\n- [ ] todo after bom\n",
    "edge/combining": "# Café naïve\n\n[[Zoë's Page]] #café\n- [ ] fix café bug\n",
    "edge/emoji": "# Hello \U0001f30d\n\n- [ ] ship \U0001f680 feature\n[[Rocket \U0001f680]]\n",
    "edge/tabs": "#\tTabbed\n\n-\t[ ] tab todo\n\t- nested\n",
    "edge/trailing_ws": "# Trail   \n\n- [ ] todo   \n#tag  \n",
    "edge/no_newline_eof": "# No EOF newline\n- [ ] last",
    "edge/only_frontmatter": "---\ntitle: Only FM\ntags: [a, b]\n---\n",
    "edge/heading_levels": "####### seven\n###### six\n# one\n",
    "edge/empty_heading": "#\n##  \n# real\n",
    "edge/mixed_eol": "# Mixed\r\n- [ ] a\n- [x] b\r\n",
    "edge/old_mac_cr": "# CR only\r- [ ] cr todo\r",
    "edge/wikilink_pipe": "[[A|B|C]] [[|empty target]] [[target|]]\n",
    "edge/code_fence_tilde": "~~~python\nx = 1\n~~~\n",
    "edge/html_in_md": "<div># not heading</div>\n<b>bold</b> #realtag\n",
    "edge/numbered_list": "1. one\n2. two\n   1. nested\n",
    "edge/blockquote_nested": "> quote\n>> deeper\n> > also deep\n",
    "edge/table_ragged": "| a | b |\n|---|\n| 1 | 2 | 3 |\n",
    "edge/setext": "Setext H1\n=========\nSetext H2\n---------\n",
    "edge/ref_link": "[text][ref]\n\n[ref]: http://example.com \"Title\"\n",
}


def test_edge_inputs_match_live_reference(spark):
    """Line endings (CRLF / bare CR), BOM, combining marks, astral-plane
    emoji, tab indentation, degenerate headings/wikilinks/tables — no
    stored goldens exist for these, only the live reference."""
    ref = {d: reference_triples(d, t) for d, t in EDGE_DOCS.items()}
    ours = _ours(spark, EDGE_DOCS)
    mismatched = [d for d in EDGE_DOCS if ref[d] != ours[d]]
    assert mismatched == [], f"edge-input mismatches: {mismatched}"


def _fuzz_docs(seed: int, n: int) -> dict[str, str]:
    rng = random.Random(seed)
    words_pool = ["alpha", "Beta", "gamma-ray", "Zoë", "état",
                  "naïve", "data", "Q4", "café", "東京", "plan"]

    def words(n_):
        return " ".join(rng.choice(words_pool) for _ in range(n_))

    def fragment():
        k = rng.randrange(12)
        if k == 0:
            return f"{'#' * rng.randint(1, 6)} {words(rng.randint(1, 4))}\n"
        if k == 1:
            return f"- [{rng.choice(' x')}] {words(rng.randint(1, 5))}\n"
        if k == 2:
            return f"[[{words(rng.randint(1, 2))}]]\n"
        if k == 3:
            return f"[[{words(1)}|{words(1)}]]\n"
        if k == 4:
            return f"#{rng.choice(['t1', 'Tag-2', 'x_y', 'café'])} {words(2)}\n"
        if k == 5:
            return f"```{rng.choice(['', 'python', 'js'])}\n{words(3)}\n```\n"
        if k == 6:
            return f"> {words(4)}\n"
        if k == 7:
            return f"- {words(2)}\n  - {words(2)}\n"
        if k == 8:
            return f"| h1 | h2 |\n|---|---|\n| {words(1)} | {words(1)} |\n"
        if k == 9:
            return f"[{words(1)}](http://ex.com/{rng.randrange(99)})\n"
        if k == 10:
            return f"{words(rng.randint(3, 10))}\n"
        return "\n"

    def doc():
        fm = ""
        if rng.random() < 0.4:
            fm = f"---\ntitle: {words(2)}\ntags: [{words(1)}, {words(1)}]\n---\n"
        return fm + "".join(fragment() for _ in range(rng.randint(1, 15)))

    return {f"fuzz/d{i:03d}": doc() for i in range(n)}


BATCH_FILES = {
    "notes/alpha.md": "# Alpha\n\nLinks: [[beta]] [[notes/beta]] [[Beta Note]]\n- [ ] see [[gamma]]\n",
    "notes/beta.md": "---\ntitle: Beta Note\n---\n# Beta\n\nBack to [[alpha]] and [[missing page]]\n",
    "gamma.md": "# Gamma\n\n[[notes/alpha.md]] [[alpha]] [[delta|display text]]\n",
    "deep/nested/delta.md": "# Delta\n\n[[gamma]] [[nested/delta]] [[delta]]\n",
    "Ambig.md": "# Root ambig\n[[Ambig]]\n",
    "other/Ambig.md": "# Other ambig\n[[Ambig]] [[other/Ambig]]\n",
    "README.md": "# Real Title From Heading\ncontent [[alpha]]\n",
    "proj/index.md": "# Index Heading\n[[README]]\n",
    # title-derivation edges: the reader's YAML-only parse (TOML fence
    # must NOT win), present-but-falsy title key (no heading fallback),
    # invalid YAML on a generic stem (text unstripped for the heading
    # search), indented fence (reader requires byte-0 fence)
    "toml_title.md": "+++\ntitle = \"Toml Title\"\n+++\ntext\n",
    "empty_title.md": "---\ntitle: \"\"\n---\n# Not The Label\n",
    "index.md": "---\ntitle: [\ninvalid yaml\n---\n# Inside After\n",
    "dir2/readme.md": "# Deep Readme H1\ntext\n",
    "lead.md": "   ---\ntitle: indented fence\n---\ntext\n",
}


def test_batch_corpus_resolution_matches_live_reference(spark):
    """The reference's BATCH mode (registry populated with the whole
    corpus, then per-document processing) vs our distributed pipeline
    with ``resolve_links=True`` on the same 8-file knowledge base:
    cross-document wikilink resolution (path / basename / title keys,
    nested dirs, ambiguous basenames, unresolvable targets) and derived
    document titles (frontmatter > stem > first-heading-for-generic)
    must agree triple for triple."""
    from knowledgebase_processor_spark.pipeline import documents_to_triples
    from knowledgebase_processor_spark.uris import document_uri

    ref = reference_corpus_triples(BATCH_FILES)
    rows_in = [(document_uri(rel), text, rel, None)
               for rel, text in BATCH_FILES.items()]
    docs = spark.createDataFrame(
        rows_in, "doc_id string, text string, path string, title string")
    res = documents_to_triples(docs, "doc_id", "text", "path", "title",
                               resolve_links=True).collect()
    uri_to_rel = {document_uri(rel): rel for rel in BATCH_FILES}
    ours: dict[str, set] = {rel: set() for rel in BATCH_FILES}
    for r in res:
        ours[uri_to_rel[r.source_doc]].add(
            (r.subj, r.pred, r.obj, "uri" if r.obj_is_uri else r.obj_datatype))

    # note: [[Ambig]] here is NOT ambiguous — root Ambig.md's
    # path-without-extension IS "Ambig", a priority-1 exact match in both
    # engines; only basename-ONLY matches are order-dependent (separate
    # test below)
    mismatched = [rel for rel in BATCH_FILES if ref[rel] != ours[rel]]
    assert mismatched == [], f"batch-mode mismatches: {mismatched}"


def test_duplicate_basename_resolution_is_deterministic(spark):
    """When a wikilink matches only the BASENAME index and several
    documents share that basename, the reference's answer is UNDEFINED:
    its registry keeps whichever file Path.glob enumerated last
    (dict-assign overwrite, document_registry.py:36), and glob order is
    filesystem-dependent.  We define it instead — deterministic max
    kb_id (wikilink_resolve.documents_dimension) — so this test checks
    (a) everything except the ambiguous object agrees with the live
    reference, (b) the reference's winner is one of the candidates,
    (c) ours is the max-kb_id candidate on every run."""
    from knowledgebase_processor_spark.pipeline import documents_to_triples
    from knowledgebase_processor_spark.uris import document_uri

    files = {
        "d1/Page.md": "# One\n[[Page]]\n",
        "d2/sub/Page.md": "# Two\ntext\n",
        "linker.md": "[[Page]] and [[d1/Page]]\n",
    }
    candidates = {document_uri("d1/Page.md"), document_uri("d2/sub/Page.md")}
    ref = reference_corpus_triples(files)
    docs = spark.createDataFrame(
        [(document_uri(rel), text, rel, None) for rel, text in files.items()],
        "doc_id string, text string, path string, title string")
    res = documents_to_triples(docs, "doc_id", "text", "path", "title",
                               resolve_links=True).collect()
    uri_to_rel = {document_uri(rel): rel for rel in files}
    ours: dict[str, set] = {rel: set() for rel in files}
    for r in res:
        ours[uri_to_rel[r.source_doc]].add(
            (r.subj, r.pred, r.obj, "uri" if r.obj_is_uri else r.obj_datatype))

    def norm(ts):
        return {(s, p, "<AMBIG>" if o in candidates
                 and p.endswith("resolvedDocument") else o, f)
                for (s, p, o, f) in ts}

    for rel in files:
        assert norm(ref[rel]) == norm(ours[rel]), rel
        ref_winners = {o for (s, p, o, f) in ref[rel]
                       if p.endswith("resolvedDocument") and o in candidates}
        assert ref_winners <= candidates
    our_winners = {o for rel in files for (s, p, o, f) in ours[rel]
                   if p.endswith("resolvedDocument") and o in candidates}
    # [[d1/Page]] is an exact priority-1 match; [[Page]] is basename-only
    # and takes the max-kb_id candidate deterministically
    assert our_winners == {document_uri("d1/Page.md"), max(candidates)}


def test_title_derivation_matches_reference_labels():
    """Pure-Python property check (no Spark): derive_title equals the
    label the live reference emits for the document node, across random
    combinations of stems (incl. generic readme/index/untitled), YAML/
    TOML/broken frontmatter, falsy titles, and heading placement."""
    import random

    from knowledgebase_processor_spark.operators.metadata import derive_title
    from knowledgebase_processor_spark.uris import document_uri

    rng = random.Random(1137)
    stems = ["Alpha", "beta_note", "Gamma-Ray", "README", "index",
             "untitled", "a.b", "x y", "2024-11-07"]
    fms = ["", "---\ntitle: Simple T\n---\n", "---\ntitle: ''\n---\n",
           "---\ntitle: null\n---\n", "---\ndate: 2024-01-01\n---\n",
           "+++\ntitle = \"Toml\"\n+++\n", "---\nbroken: [\n---\n",
           "---\ntitle: \"Q: x\"\n---\n"]
    bodies = ["plain\n", "# First Heading\ntext\n", "text\n# Later Heading\n",
              "#\n# Real\n", ""]
    files = {}
    for i in range(40):
        d = rng.choice(["", "d/", "d/e/"])
        rel = f"{d}{rng.choice(stems)}_{i}.md" if rng.random() < 0.5 \
            else f"{d}{rng.choice(stems)}.md"
        if rel in files:
            continue
        files[rel] = rng.choice(fms) + rng.choice(bodies)
    ref = reference_corpus_triples(files)
    label_pred = "http://www.w3.org/2000/01/rdf-schema#label"
    bad = []
    for rel, text in files.items():
        doc_uri = document_uri(rel)
        ref_labels = {o for (s, p, o, f) in ref[rel]
                      if s == doc_uri and p == label_pred}
        got = derive_title(text, rel)
        # the reference emits no label triple when the label is empty
        expect = {got} if got else set()
        if ref_labels != expect:
            bad.append((rel, ref_labels, got))
    assert bad == [], bad


def test_seeded_fuzz_matches_live_reference(spark):
    """60 generator-composed documents (headings, todos, wikilinks, tags,
    fences, quotes, lists, tables, links, frontmatter in random order)
    — deterministic seed so failures reproduce."""
    docs = _fuzz_docs(seed=20260817, n=60)
    ref = {d: reference_triples(d, t) for d, t in docs.items()}
    ours = _ours(spark, docs)
    mismatched = [d for d in docs if ref[d] != ours[d]]
    assert mismatched == [], f"fuzz mismatches: {mismatched}"


def test_frontmatter_date_matrix_matches_reference():
    """_parse_fm_date mirrors the reference's FrontmatterExtractor
    ._parse_date (extractor/frontmatter.py:138-164) on a value matrix
    covering YAML-native datetime/date objects, every accepted string
    format, and rejects — compared against the LIVE reference class."""
    import datetime as dt

    from reference_runtime import _ensure_paths
    _ensure_paths()
    from knowledgebase_processor.extractor.frontmatter import (
        FrontmatterExtractor)

    from knowledgebase_processor_spark.operators.metadata import _parse_fm_date

    ref = FrontmatterExtractor()
    matrix = [
        dt.datetime(2024, 11, 7, 13, 45, 9),
        dt.date(2024, 11, 7),
        "2024-11-07",
        "2024-11-07 13:45:09",
        "2024/11/07",
        "07-11-2024",
        "November 7, 2024",      # not in the accepted list -> None
        "2024-13-45",            # invalid -> None
        "",
        None,
        42,
        ["2024-11-07"],
    ]
    for v in matrix:
        expect = ref._parse_date(v)
        got = _parse_fm_date(v)
        assert got == (expect.isoformat() if expect else None), (v, got, expect)


def _fuzz_docs_extended(seed: int, n: int) -> dict[str, str]:
    """Round-2 vocabulary extension: setext headings, indented code,
    HTML blocks, images, nested quotes, ordered lists, escapes,
    reference links with definitions, thematic breaks (the setext trap),
    inline code with hashes, .md/#anchor wikilinks, nested todos,
    definition-list lookalikes, CRLF line endings, and frontmatter with
    dates / categories / comma-string tags."""
    rng = random.Random(seed)
    pool = ["alpha", "Beta", "gamma-ray", "Zoë", "état", "data", "Q4",
            "café", "東京"]

    def words(k):
        return " ".join(rng.choice(pool) for _ in range(k))

    def fragment():
        k = rng.randrange(14)
        if k == 0:
            u = "=" if rng.random() < .5 else "-"
            return f"{words(2)}\n{u * 3}\n"
        if k == 1:
            return f"    {words(3)}\n    {words(2)}\n"
        if k == 2:
            return f"<div>\n{words(3)}\n</div>\n"
        if k == 3:
            return f"![{words(1)}](http://img.ex/{rng.randrange(9)}.png)\n"
        if k == 4:
            return f"> > {words(3)}\n> {words(2)}\n"
        if k == 5:
            return f"{rng.randrange(1, 4)}. {words(2)}\n2. {words(2)}\n"
        if k == 6:
            return "\\[\\[not a link\\]\\] \\# not heading\n"
        if k == 7:
            return (f"[{words(1)}][ref{rng.randrange(3)}]\n\n"
                    f"[ref{rng.randrange(3)}]: http://r.ex/x\n")
        if k == 8:
            return f"***\n{words(2)}\n---\n"
        if k == 9:
            return f"`inline #code` and ``double `tick`` {words(2)}\n"
        if k == 10:
            return f"[[{words(1)}.md]] [[{words(1)}#section]]\n"
        if k == 11:
            return f"- [ ] outer\n  - [x] nested {words(1)}\n"
        if k == 12:
            return f"Term\n: definition {words(2)}\n"
        return f"{words(rng.randint(3, 8))}\r\n"

    def doc():
        fm = ""
        r = rng.random()
        if r < 0.3:
            fm = (f"---\ntitle: {words(2)}\n"
                  f"date: 2024-0{rng.randrange(1, 9)}-1{rng.randrange(9)}\n"
                  f"tags: [{words(1)}]\ncategories: [{words(1)}]\n---\n")
        elif r < 0.4:
            fm = f"---\ntags: {words(1)}, {words(1)}\n---\n"
        return fm + "".join(fragment() for _ in range(rng.randint(1, 12)))

    return {f"fuzz2/d{i:03d}": doc() for i in range(n)}


def test_extended_fuzz_matches_live_reference(spark):
    """100 documents from the extended round-2 vocabulary — every shape
    above verified triple-for-triple against the live reference."""
    docs = _fuzz_docs_extended(seed=11, n=100)
    ref = {d: reference_triples(d, t) for d, t in docs.items()}
    ours = _ours(spark, docs)
    mismatched = [d for d in docs if ref[d] != ours[d]]
    assert mismatched == [], f"extended fuzz mismatches: {mismatched}"


def test_anchor_wikilinks_batch_resolution(spark):
    """Anchor-form wikilinks ([[page#section]], [[page.md#x]],
    [[page#a|label]]) through the BATCH registry flow — resolution
    and targetPath/label triples must match the live reference."""
    from knowledgebase_processor_spark.pipeline import documents_to_triples
    from knowledgebase_processor_spark.uris import document_uri

    files = {
        "notes/alpha.md": "# Alpha\ncontent\n",
        "notes/beta.md": "# Beta\ncontent\n",
        "linker.md": ("[[alpha#section]] [[notes/alpha#sec two]] "
                      "[[alpha.md#x]] [[beta#a|label]] [[nope#y]]\n"),
    }
    ref = reference_corpus_triples(files)
    docs = spark.createDataFrame(
        [(document_uri(rel), text, rel, None) for rel, text in files.items()],
        "doc_id string, text string, path string, title string")
    res = documents_to_triples(docs, "doc_id", "text", "path", "title",
                               resolve_links=True).collect()
    uri_to_rel = {document_uri(rel): rel for rel in files}
    ours: dict[str, set] = {rel: set() for rel in files}
    for r in res:
        ours[uri_to_rel[r.source_doc]].add(
            (r.subj, r.pred, r.obj, "uri" if r.obj_is_uri else r.obj_datatype))
    assert [rel for rel in files if ref[rel] != ours[rel]] == []
