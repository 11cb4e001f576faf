#!/usr/bin/env python
"""Build dist/kgp_spark.zip for spark-submit --py-files: the package plus
the vendored pure-Python deps (markdown-it-py, mdurl)."""

from __future__ import annotations

import os
import zipfile

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def main() -> None:
    dist = os.path.join(ROOT, "dist")
    os.makedirs(dist, exist_ok=True)
    out = os.path.join(dist, "kgp_spark.zip")
    with zipfile.ZipFile(out, "w", zipfile.ZIP_DEFLATED) as zf:
        for top, arc_prefix in (("knowledgebase_processor_spark", "knowledgebase_processor_spark"),
                                ("vendor/markdown_it", "markdown_it"),
                                ("vendor/mdurl", "mdurl")):
            base = os.path.join(ROOT, top)
            for dirpath, _, files in os.walk(base):
                if "__pycache__" in dirpath:
                    continue
                for f in files:
                    if f.endswith((".py", ".typed")):
                        full = os.path.join(dirpath, f)
                        rel = os.path.join(arc_prefix, os.path.relpath(full, base))
                        zf.write(full, rel)
    print(out)


if __name__ == "__main__":
    main()
