#!/usr/bin/env python
"""Reference-parity report: every golden fixture through ONE batch run.

Loads all 60 unit spec cases + 6 reference-corpus docs as a single
documents DataFrame, runs the production pipeline once, and scores each
document's emitted triple set against its golden TTL
(timestamp-stripped, the reference's own comparison protocol —
tests/test_specifications.py:59-77). Prints a per-case table and the
aggregate precision/recall the north rule gates on (>= 0.95).

Usage: python scripts/parity_report.py
"""

from __future__ import annotations

import os
import sys

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, ROOT)


def main() -> None:
    from knowledgebase_processor_spark.goldens import load_golden, spec_cases
    from knowledgebase_processor_spark.pipeline import documents_to_triples, session

    # same discovery + doc-id normalization the test suite uses
    cases = [(doc_id, md.read_text(encoding="utf-8"), ttl)
             for doc_id, md, ttl in spec_cases()]

    spark = session("parity", cpus=8, shuffle_partitions=8)
    docs = spark.createDataFrame([(c[0], c[1]) for c in cases],
                                 "doc_id string, text string")
    rows = documents_to_triples(docs).collect()
    got: dict[str, set] = {}
    for r in rows:
        got.setdefault(r.source_doc, set()).add(
            (r.subj, r.pred, r.obj, "uri" if r.obj_is_uri else r.obj_datatype))
    spark.stop()

    # The 6 reference-corpus goldens predate the reference's structure
    # processor: they contain only Document/TodoItem/WikiLink nodes, so
    # (per tests/test_spark_pipeline.py and README) they are scored
    # PROJECTED to those kinds; the 60 unit cases are scored raw.
    corpus_kinds = {"Document", "TodoItem", "WikiLink"}
    tp = fp = fn = 0
    exact = 0
    print(f"{'case':<46} {'P':>6} {'R':>6} {'got':>5} {'exp':>5}")
    for doc_id, _, ttl in cases:
        exp = load_golden(ttl)
        g = got.get(doc_id, set())
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
        flag = "" if g == exp else "   <- diff"
        proj = " (projected)" if doc_id.startswith("test_corpus/") else ""
        print(f"{doc_id:<46} {p:>6.3f} {r:>6.3f} {len(g):>5} {len(exp):>5}"
              f"{flag}{proj}")
    precision = tp / (tp + fp) if tp + fp else 1.0
    recall = tp / (tp + fn) if tp + fn else 1.0
    print(f"\nexact-match cases: {exact}/{len(cases)}")
    print(f"aggregate precision={precision:.4f} recall={recall:.4f} "
          f"(north-rule gate: >= 0.95; corpus cases projected to the "
          f"kinds their stale goldens contain)")


if __name__ == "__main__":
    main()
