"""Product quantization: encode/ADC differential vs a numpy recompute,
recall against exact L2, NaN hostility."""

import numpy as np
from pyspark.sql import functions as F

SF = "/root/testdata/sf0.001"


def _load(spark):
    return spark.read.parquet(f"{SF}/embeddings.parquet")


def test_pq_encode_matches_numpy(spark):
    from knowledgebase_processor_spark.operators.pq import pq_encode, pq_train
    vecs = _load(spark).limit(200)
    books = pq_train(vecs, dim=64, m=8, k=16, sample=256)
    got = {r["vec_id"]: list(r["codes"]) for r in pq_encode(vecs).collect()} \
        if False else {r["vec_id"]: list(r["codes"])
                       for r in pq_encode(vecs, books).collect()}
    rows = {r["vec_id"]: np.array([float(x) for x in r["embedding"]])
            for r in vecs.collect()}
    cb = np.array(books)                     # (m, k, sub)
    for vid, v in rows.items():
        exp = []
        for j in range(8):
            d2 = ((v[j * 8:(j + 1) * 8][None, :] - cb[j]) ** 2).sum(axis=1)
            exp.append(int(np.argmin(d2)))
        assert got[vid] == exp, vid


def test_pq_adc_matches_numpy_and_recalls(spark):
    from knowledgebase_processor_spark.operators.pq import (
        pq_encode, pq_topk, pq_train)
    vecs = _load(spark)
    books = pq_train(vecs, dim=64, m=8, k=16)
    enc = pq_encode(vecs, books).cache()
    rows = {r["vec_id"]: np.array([float(x) for x in r["embedding"]])
            for r in vecs.collect()}
    q = rows[0]
    got = [(r["vec_id"], r["adc_dist"])
           for r in pq_topk(enc, books, list(q), topk=10).collect()]

    # numpy ADC recompute
    cb = np.array(books)
    tables = np.stack([((q[j * 8:(j + 1) * 8][None, :] - cb[j]) ** 2).sum(axis=1)
                       for j in range(8)])
    codes = {vid: [int(np.argmin(((v[j * 8:(j + 1) * 8][None, :]
                                   - cb[j]) ** 2).sum(axis=1)))
                   for j in range(8)] for vid, v in rows.items()}
    adc = {vid: round(sum(tables[j][c] for j, c in enumerate(cs)), 6)
           for vid, cs in codes.items()}
    exp = sorted(adc.items(), key=lambda kv: (kv[1], kv[0]))[:10]
    assert [(vid, round(d, 6)) for vid, d in exp] == \
        [(vid, round(d, 6)) for vid, d in got]

    # raw ADC recall vs exact L2 top-10: a coarse quantizer (m=8, k=16)
    # is EXPECTED to be a shortlist generator, not a ranker — recall@10
    # without rerank hovers low (measured 3/10 here); the production
    # path is pq_topk_rerank below
    exact = sorted(rows, key=lambda vid: ((rows[vid] - q) ** 2).sum())[:10]
    overlap = len(set(exact) & {vid for vid, _ in got})
    assert overlap >= 2, (overlap, got, exact)

    # two-stage shortlist + exact rerank recovers the true neighbors
    from knowledgebase_processor_spark.operators.pq import pq_topk_rerank
    rr = pq_topk_rerank(enc, vecs, books, list(q), topk=10, shortlist=100)
    rr_ids = [r["vec_id"] for r in rr.collect()]
    rr_overlap = len(set(exact) & set(rr_ids))
    assert rr_overlap >= 8, (rr_overlap, rr_ids, exact)


def test_pq_nan_vector_gets_null_code_and_sorts_last(spark):
    """A NaN vector must flow through, not throw — and it must NOT get
    a normal-looking code (Spark's array_min/array_position treat
    NaN==NaN as true, so without the explicit isnan guard it would):
    the code is null, the ADC score is null, and the row sorts LAST in
    top-k (asc_nulls_last), never displacing a real neighbor.
    Regression for the round-2 review finding."""
    from knowledgebase_processor_spark.operators.pq import (
        pq_encode, pq_topk, pq_train)
    vecs = _load(spark).limit(50)
    books = pq_train(vecs, dim=64, m=8, k=16, sample=64)
    bad = spark.createDataFrame(
        [(999999, [float("nan")] * 64)], "vec_id long, embedding array<double>")
    enc = pq_encode(vecs.select("vec_id", "embedding").unionByName(bad), books)
    codes = {r["vec_id"]: r["codes"] for r in enc.collect()}
    assert all(c is None for c in codes[999999])        # null, not a code
    assert all(c is not None for vid, cs in codes.items() if vid != 999999
               for c in cs)
    out = pq_topk(enc, books, [0.0] * 64, topk=51).collect()
    assert len(out) == 51
    assert out[-1]["vec_id"] == 999999                  # last, not first
    assert out[-1]["adc_dist"] is None
    assert all(r["adc_dist"] is not None for r in out[:-1])


def test_ivfpq_matches_numpy_and_recalls(spark):
    from knowledgebase_processor_spark.operators.pq import (
        ivfpq_encode, ivfpq_topk, pq_train)
    from knowledgebase_processor_spark.operators.similarity import ivf_centroids
    vecs = _load(spark)
    cents = ivf_centroids(vecs, dim=64, k_cells=8)
    books = pq_train(vecs, dim=64, m=8, k=16)
    enc = ivfpq_encode(vecs.select("vec_id", "embedding"), cents, books).cache()

    rows = {r["vec_id"]: np.array([float(x) for x in r["embedding"]])
            for r in vecs.collect()}
    q = rows[0]
    got = [(r["vec_id"], r["adc_dist"])
           for r in ivfpq_topk(enc, cents, books, list(q),
                               topk=10, nprobe=8).collect()]

    # numpy recompute with the same cosine cell assignment as ivf_assign
    C = np.array(cents)
    cb = np.array(books)

    def cell_of(v):
        sims = (C @ v) / np.maximum(np.linalg.norm(C, axis=1)
                                    * np.linalg.norm(v), 1e-12)
        best, bc = -2.0, -1
        for i, s in enumerate(sims):       # strict > : first max wins
            if s > best:
                best, bc = s, i
        return bc

    def codes_of(r):
        return [int(np.argmin(((r[j * 8:(j + 1) * 8][None, :]
                                - cb[j]) ** 2).sum(axis=1)))
                for j in range(8)]

    adc = {}
    for vid, v in rows.items():
        c = cell_of(v)
        r = v - C[c]
        qr = q - C[c]
        tables = [((qr[j * 8:(j + 1) * 8][None, :] - cb[j]) ** 2).sum(axis=1)
                  for j in range(8)]
        adc[vid] = round(sum(tables[j][cd]
                             for j, cd in enumerate(codes_of(r))), 6)
    exp = sorted(adc.items(), key=lambda kv: (kv[1], kv[0]))[:10]
    assert [(vid, round(d, 6)) for vid, d in exp] == \
        [(vid, round(d, 6)) for vid, d in got]

    # IVF-PQ with full probing beats flat-PQ distortion: the true nearest
    # (vec 0 itself) must rank first via its residual codes
    assert got[0][0] == 0
