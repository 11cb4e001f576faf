#!/usr/bin/env python
"""Reference-parity report: every golden fixture through ONE batch run.

Two scorings per document:

* **live** — against the reference implementation itself, executed
  in-process from /root/reference/src via tests/reference_runtime.py
  (rdflib shimmed).  This is the authoritative parity signal: it works
  for arbitrary inputs and is immune to stale fixtures.
* **golden** — against the stored TTLs (timestamp-stripped, the
  reference's own comparison protocol — tests/test_specifications.py:
  59-77).  The 6 reference-corpus goldens predate the current reference
  behavior (pre-anonymization wikilink hash IDs), so they are scored
  projected to the kinds they contain; the live column shows the same
  documents matching the actual reference exactly.

Usage: python scripts/parity_report.py
"""

from __future__ import annotations

import os
import sys

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, ROOT)
sys.path.insert(0, os.path.join(ROOT, "tests"))


def main() -> None:
    from knowledgebase_processor_spark.goldens import load_golden, spec_cases
    from knowledgebase_processor_spark.pipeline import documents_to_triples, session
    from reference_runtime import reference_available, reference_triples

    # same discovery + doc-id normalization the test suite uses
    cases = [(doc_id, md.read_text(encoding="utf-8"), ttl)
             for doc_id, md, ttl in spec_cases()]

    live = reference_available()
    ref = ({doc_id: reference_triples(doc_id, text)
            for doc_id, text, _ in cases} if live else {})

    spark = session("parity", cpus=8, shuffle_partitions=8)
    docs = spark.createDataFrame([(c[0], c[1]) for c in cases],
                                 "doc_id string, text string")
    rows = documents_to_triples(docs).collect()
    got: dict[str, set] = {}
    for r in rows:
        got.setdefault(r.source_doc, set()).add(
            (r.subj, r.pred, r.obj, "uri" if r.obj_is_uri else r.obj_datatype))
    spark.stop()

    corpus_kinds = {"Document", "TodoItem", "WikiLink"}
    tp = fp = fn = 0
    ltp = lfp = lfn = 0
    exact = live_exact = 0
    print(f"{'case':<46} {'live':>5} {'P':>6} {'R':>6} {'got':>5} {'exp':>5}")
    for doc_id, _, ttl in cases:
        exp = load_golden(ttl)
        raw = got.get(doc_id, set())

        lv = "-"
        if live:
            r_set = ref[doc_id]
            lv = "==" if raw == r_set else "DIFF"
            live_exact += raw == r_set
            inter_l = len(raw & r_set)
            ltp += inter_l
            lfp += len(raw) - inter_l
            lfn += len(r_set) - inter_l

        g = raw
        if doc_id.startswith("test_corpus/"):
            keep = {s for (s, p, o, f) in g
                    if p.endswith("#type") and o.rsplit("#", 1)[-1] in corpus_kinds}
            g = {t for t in g if t[0] in keep}
        inter = len(g & exp)
        p = inter / len(g) if g else 1.0
        r = inter / len(exp) if exp else 1.0
        tp += inter
        fp += len(g) - inter
        fn += len(exp) - inter
        exact += g == exp
        flag = "" if g == exp else "   <- golden diff"
        proj = " (projected)" if doc_id.startswith("test_corpus/") else ""
        print(f"{doc_id:<46} {lv:>5} {p:>6.3f} {r:>6.3f} {len(g):>5} {len(exp):>5}"
              f"{flag}{proj}")

    precision = tp / (tp + fp) if tp + fp else 1.0
    recall = tp / (tp + fn) if tp + fn else 1.0
    print(f"\nexact vs stored goldens: {exact}/{len(cases)} "
          f"(corpus cases projected; their goldens are stale)")
    print(f"golden aggregate precision={precision:.4f} recall={recall:.4f} "
          f"(north-rule gate: >= 0.95)")
    if live:
        lp = ltp / (ltp + lfp) if ltp + lfp else 1.0
        lr = ltp / (ltp + lfn) if ltp + lfn else 1.0
        print(f"LIVE reference: exact {live_exact}/{len(cases)}, "
              f"precision={lp:.4f} recall={lr:.4f} "
              f"(authoritative — reference executed in-process, no projection)")
    else:
        print("LIVE reference unavailable in this environment")


if __name__ == "__main__":
    main()
