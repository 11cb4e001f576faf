"""Record-preference merge: canonical record assembly across sources.

KG-construction core (the step after coreference clustering): once
canonicalization (components.py) says two source records ARE the same
entity, something must assemble the one canonical row — field-by-field,
by source priority, with survivorship lineage.  The reference does this
implicitly one document at a time (its per-doc upsert replaces whole
records, sinks.py S5/S7); at 10^12 scale the merge is a distributed
operator in its own right.

Semantics (classic survivorship rules):
* one row per key, fields taken from the highest-priority source where
  the field is NON-NULL (priority = the order of ``sources``);
* per-field lineage columns (``<field>__src``) record which source won;
* ``present_in`` records the source membership bitmap for audit.

Scale shape: one full-outer join per additional source on the merge key
— plain hash joins, AQE-splittable; field survivorship is pure
``coalesce`` codegen; no window, no collect.  Exactly SQL-replicable
(q99).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F


def merge_records(sources: list[tuple[str, DataFrame]], key: str,
                  fields: list[str]) -> DataFrame:
    """``sources`` = [(source_name, df)] in DESCENDING priority; every
    df must carry ``key`` and ``fields``.  Returns one row per key:
    (key, <field>..., <field>__src..., present_in)."""
    renamed = []
    for name, df in sources:
        cols = [F.col(key)] + [F.col(f).alias(f"{f}__{name}")
                               for f in fields]
        renamed.append(df.select(*cols)
                       .withColumn(f"__in_{name}", F.lit(True)))
    merged = renamed[0]
    for df in renamed[1:]:
        merged = merged.join(df, key, "full_outer")

    out = [F.col(key)]
    names = [n for n, _ in sources]
    for f in fields:
        val = F.coalesce(*[F.col(f"{f}__{n}") for n in names])
        src = F.coalesce(*[
            F.when(F.col(f"{f}__{n}").isNotNull(), F.lit(n))
            for n in names])
        out += [val.alias(f), src.alias(f"{f}__src")]
    present = F.concat_ws(",", *[
        F.when(F.coalesce(F.col(f"__in_{n}"), F.lit(False)), F.lit(n))
        for n in names])
    return merged.select(*out, present.alias("present_in"))
