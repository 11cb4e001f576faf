"""PySpark-native knowledge-graph construction engine.

A from-scratch Spark DataFrame implementation of the document-to-KG
semantics of ``dstengle/knowledgebase-processor`` (reference read-only at
/root/reference): markdown element extraction, deterministic entity URIs
(ADR-0013), RDF triple emission, wikilink resolution via broadcast joins,
connected-components canonicalization, and training-data-pipeline operators
(dedup, similarity search, text analysis) — all expressed as DataFrame
transforms + vectorized pandas/Arrow UDFs.

Vendored pure-Python deps (``vendor/``: markdown-it-py, mdurl) stand in for
``spark-submit --py-files`` distribution on a real cluster.
"""

import os
import sys

_VENDOR = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "vendor")
if _VENDOR not in sys.path:
    # Executors in local mode share this interpreter; on a real cluster the
    # vendor dir ships via --py-files and lands on sys.path the same way.
    sys.path.insert(0, _VENDOR)

__version__ = "0.1.0"
