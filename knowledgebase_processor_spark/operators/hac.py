"""Average-linkage agglomerative clustering within ER blocks (the
chaining-proof alternative to transitive closure: the CC-based dedup
electorate (q33) merges A~B~C even when A and C are dissimilar —
correct for near-duplicate DOCUMENTS, wrong for entity RECORDS where
'J Smith' ~ 'Jo Smith' ~ 'Jon Smith' must not fuse distinct people.
Average-linkage HAC with a distance threshold stops exactly where the
cluster's AVERAGE cohesion breaks, the standard record-linkage
clustering (e.g. the dedupe library's default)).

Blocks come from the blocking family (sorted-neighborhood q83, IFP
q182, LSH buckets); WITHIN a block the problem is tiny and inherently
sequential, so this is the documented Python boundary: one
Arrow-batched applyInPandas per block, pure-Python kernel (shared
with the reference that pins the q221 oracle), O(b^3) worst case on a
block of b records — bounded by ``max_block`` (oversized blocks pass
through as singletons with a disclosed flag, the LSH mega-bucket
contract; at web scale an oversized block means the BLOCKING key is
bad, not that the clusterer should eat it).

Determinism: integer Levenshtein distances, merges ordered by
(average distance, cluster-min-id pair) — bit-stable across engines
and runs; cluster label = min member id.
"""

from __future__ import annotations

from pyspark.sql import DataFrame


def _lev(a: str, b: str) -> int:
    if len(a) < len(b):
        a, b = b, a
    prev = list(range(len(b) + 1))
    for i, ca in enumerate(a, 1):
        cur = [i]
        for j, cb in enumerate(b, 1):
            cur.append(min(prev[j] + 1, cur[-1] + 1,
                           prev[j - 1] + (ca != cb)))
        prev = cur
    return prev[-1]


def hac_cluster(keys: dict, threshold_milli: int) -> dict:
    """Pure-Python kernel: id -> cluster (min member id).  Merges the
    cluster pair with the smallest average pairwise distance (in
    milli-units, 1000 = one edit) while that average <= threshold."""
    ids = sorted(keys)
    d = {(a, b): _lev(keys[a], keys[b]) * 1000
         for i, a in enumerate(ids) for b in ids[i + 1:]}
    clusters = {i: frozenset([i]) for i in ids}

    def avg(ca: frozenset, cb: frozenset) -> int:
        tot = sum(d[(min(x, y), max(x, y))] for x in ca for y in cb)
        return tot // (len(ca) * len(cb))

    while len(clusters) > 1:
        best = None
        for a in sorted(clusters):
            for b in sorted(clusters):
                if a >= b:
                    continue
                m = avg(clusters[a], clusters[b])
                cand = (m, a, b)
                if best is None or cand < best:
                    best = cand
        if best is None or best[0] > threshold_milli:
            break
        _, a, b = best
        clusters[a] = clusters[a] | clusters[b]
        del clusters[b]
    out = {}
    for rep, members in clusters.items():
        for m in members:
            out[m] = rep
    return out


def hac_blocks(records: DataFrame, threshold_milli: int = 2000,
               max_block: int = 50, block_col: str = "block",
               id_col: str = "rec_id",
               key_col: str = "key") -> DataFrame:
    """-> (block, rec_id, cluster, oversized): within-block HAC; rows
    of blocks larger than ``max_block`` come back as singletons with
    oversized = true."""
    import pandas as pd

    cols = records.select(records[block_col].alias("block"),
                          records[id_col].alias("rec_id"),
                          records[key_col].alias("key"))

    def run(pdf: pd.DataFrame) -> pd.DataFrame:
        blk = pdf["block"].iloc[0]
        if len(pdf) > max_block:
            return pd.DataFrame(
                {"block": blk, "rec_id": pdf["rec_id"],
                 "cluster": pdf["rec_id"], "oversized": True})
        keys = {int(r.rec_id): str(r.key)
                for r in pdf.itertuples(index=False)}
        assign = hac_cluster(keys, threshold_milli)
        ids = sorted(keys)
        return pd.DataFrame(
            {"block": blk, "rec_id": ids,
             "cluster": [assign[i] for i in ids],
             "oversized": False})

    return cols.groupBy("block").applyInPandas(
        run, "block string, rec_id long, cluster long,"
             " oversized boolean")
