"""Product quantization (PQ) for embedding compression + ANN.

The standard large-scale vector-search memory lever (Jégou et al. 2011,
"Product Quantization for Nearest Neighbor Search"): split each vector
into M subvectors, k-means each subspace to K centroids, store each
vector as M small codes (here M bytes), and answer queries with
asymmetric distance computation (ADC) — a per-query M×K lookup table of
exact subdistances, summed via the codes.  At 10^12 documents this is
the difference between 256 GB of float32 per 10^9 vectors and 8 GB of
codes.

Spark shape:

* ``pq_train``   — k-means per subspace on a deterministic hash-ordered
                   SAMPLE (codebooks are tiny model state; training on a
                   bounded sample is the standard recipe and keeps the
                   driver's work milliseconds).
* ``pq_encode``  — pure column expressions: per subspace, the argmin
                   over K centroid distances (left-fold sums, so DuckDB
                   reproduces bit-identical floats — q46).  No Python in
                   the encode path; whole-stage codegen end to end.
* ``pq_topk``    — ADC: the query's M×K subdistance table is folded into
                   literal arrays; each row's score is M array lookups
                   and a sum.  One narrow projection + TakeOrdered.
"""

from __future__ import annotations

import numpy as np
from pyspark.sql import Column, DataFrame, functions as F


def pq_train(vecs: DataFrame, dim: int, m: int = 8, k: int = 16,
             iters: int = 8, sample: int = 2048,
             id_col: str = "vec_id", vec_col: str = "embedding",
             ) -> list[list[list[float]]]:
    """Train M sub-codebooks of K centroids each; returns
    ``codebooks[m][k] -> list[float]`` (plain literals: picklable,
    pinnable in oracles, broadcastable by closure).

    Deterministic: the training sample is the ``sample`` smallest
    ``xxhash64(id)`` rows (content-independent, partition-independent),
    init is the first K distinct sample points per subspace, then plain
    Lloyd iterations in numpy (ties in assignment break to the lowest
    centroid index).
    """
    if dim % m:
        raise ValueError(f"dim {dim} not divisible by m {m}")
    rows = (vecs.select(F.col(vec_col).alias("v"))
            .orderBy(F.xxhash64(F.col(id_col)), F.col(id_col))
            .limit(sample).collect())
    # size contract: TakeOrdered bounds the driver frame to `sample`
    assert len(rows) <= sample
    data = np.array([[float(x) for x in r["v"]] for r in rows])
    sub = dim // m
    books: list[list[list[float]]] = []
    for j in range(m):
        x = data[:, j * sub:(j + 1) * sub]
        uniq = np.unique(x, axis=0)
        cents = uniq[:k].copy()
        if len(cents) < k:                       # degenerate sample: pad
            cents = np.vstack([cents] * (k // len(cents) + 1))[:k]
        for _ in range(iters):
            d2 = ((x[:, None, :] - cents[None, :, :]) ** 2).sum(axis=2)
            assign = np.argmin(d2, axis=1)       # ties -> lowest index
            for c in range(k):
                pts = x[assign == c]
                if len(pts):
                    cents[c] = pts.mean(axis=0)
        books.append([[float(v) for v in c] for c in cents])
    return books


def _sub_d2(vec_col: str, cent: list[float], off: int) -> str:
    """Left-fold squared distance of vec[off:off+len(cent)] to cent —
    the summation order DuckDB's list_reduce reproduces exactly.

    Returns SQL TEXT, not a Column: building this fold from Column ops
    costs ~5 py4j round-trips per dimension per centroid (~40k calls =
    ~9 s of DRIVER time for an M=16,K=256 codebook — measured on q46);
    one expr-string parse per centroid is ~300x fewer crossings with a
    bit-identical expression tree.  Literals are rendered with repr()
    (shortest round-trip form, exact for doubles) + the 'D' suffix so
    ANSI SQL parses DOUBLE, never DECIMAL."""
    acc = None
    for i, c in enumerate(cent):
        d = (f"(CAST(element_at(`{vec_col}`, {off + i + 1}) AS DOUBLE)"
             f" - ({float(c)!r}D))")
        term = f"({d} * {d})"           # NOT power(): POWER() is only 1-ulp
        acc = term if acc is None else f"({acc} + {term})"
    return acc


def pq_encode(vecs: DataFrame, codebooks: list[list[list[float]]],
              id_col: str = "vec_id", vec_col: str = "embedding",
              keep: tuple[str, ...] = ()) -> DataFrame:
    """(id, *keep, codes array<int>): per subspace, the 0-based index of
    the nearest centroid (first minimum wins).  ``keep`` passes extra
    columns through the projection (stays narrow — no join-back).

    The M-subspace K-way argmin runs as an Arrow-batched numpy kernel
    replaying the left-fold squared-distance order EXACTLY (one
    dimension at a time across the batch: ``acc = acc + (v-c)^2`` in
    float64, the order DuckDB's list_reduce and the q46 oracle
    reproduce to the ulp).  The previous pure-column form put M*K*sub
    distance terms into one whole-stage-codegen method — past Janino's
    64 KB limit already at M=8 x K=16 x sub=8, silently degrading the
    encode stage to interpreted execution (the similarity.ivf_assign
    pathology; see PLANS.md round 4).

    Semantics preserved: ties to the lowest centroid index; a NaN (or
    NULL element) in a subvector nulls THAT subspace's code (NaN
    propagates through the fold and fails the `<` update, exactly like
    the old isnan guard); a NULL vector nulls all codes.  A vector
    SHORTER than M*sub now also yields null codes — the old
    ``element_at`` chain threw under ANSI.
    """
    import pandas as pd

    sub = len(codebooks[0][0])
    m = len(codebooks)
    need = m * sub
    books = [[[float(c) for c in cent] for cent in book]
             for book in codebooks]

    def _codes_batch(it):
        import numpy as np
        for pdf in it:
            col = pdf["_v"]
            out = [None] * len(col)
            ok, mats = [], []
            for i, x in enumerate(col):
                if x is None or len(x) < need:
                    continue
                try:
                    v = np.asarray(x[:need], dtype=np.float64)
                except (TypeError, ValueError):   # NULL elements -> NaN
                    v = np.array([np.nan if e is None else float(e)
                                  for e in x[:need]])
                ok.append(i)
                mats.append(v)
            if ok:
                V = np.stack(mats)
                allc = np.empty((len(ok), m), dtype=object)
                for j, book in enumerate(books):
                    off = j * sub
                    best = None
                    bestk = np.zeros(len(ok), dtype=np.int64)
                    for ki, cent in enumerate(book):
                        acc = None
                        for d in range(sub):      # left fold, in order
                            t = V[:, off + d] - cent[d]
                            t = t * t
                            acc = t if acc is None else acc + t
                        if best is None:
                            best = acc
                        else:
                            upd = acc < best      # first minimum wins
                            best = np.where(upd, acc, best)
                            bestk = np.where(upd, ki, bestk)
                    allc[:, j] = [None if np.isnan(b) else int(k)
                                  for b, k in zip(best, bestk)]
                for r, i in enumerate(ok):
                    out[i] = list(allc[r])
            pdf = pdf.drop(columns=["_v"])
            pdf["codes"] = out
            yield pdf

    staged = vecs.select(
        F.col(id_col), *[F.col(c) for c in keep],
        F.col(vec_col).cast("array<double>").alias("_v"))
    fields = ", ".join(f"{f.name} {f.dataType.simpleString()}"
                       for f in staged.schema.fields[:-1])
    return staged.mapInPandas(
        _codes_batch, schema=f"{fields}, codes array<int>")


def pq_topk(encoded: DataFrame, codebooks: list[list[list[float]]],
            query_vec: list[float], topk: int = 10,
            id_col: str = "vec_id") -> DataFrame:
    """ADC top-k over PQ codes: (id, adc_dist), ascending distance
    (then id).  The M×K table of exact subdistances query↔centroid is
    computed driver-side (M·K tiny floats) and folded in as literal
    arrays — each row costs M array lookups + a sum, no vector math."""
    q = np.array([float(x) for x in query_vec])
    sub = len(codebooks[0][0])
    score = None
    for j, book in enumerate(codebooks):
        qj = q[j * sub:(j + 1) * sub]
        # left-fold (python sum of d*d), NOT numpy pairwise sum or **2:
        # the oracle recomputes these table entries with a left-assoc
        # `+` chain of multiplications and the two must agree to the ulp
        table = [sum((lambda d: d * d)(float(qj[i]) - float(c[i]))
                     for i in range(sub)) for c in book]
        # try_element_at: a null code (NaN source vector) nulls the score
        # and sorts last instead of throwing under ANSI.  ONE lit(list)
        # call per table — element-wise F.lit costs a py4j round-trip
        # per entry (the bloom.py plan-construction lesson)
        term = F.try_element_at(
            F.lit([float(t) for t in table]).cast("array<double>"),
            F.element_at(F.col("codes"), j + 1) + 1)
        score = term if score is None else score + term
    # asc_nulls_last, NOT asc: Spark's default ascending order is NULLS
    # FIRST, which would put every null-code row at the HEAD of the
    # top-k, displacing all real neighbors
    return (encoded.select(F.col(id_col),
                           F.round(score, 6).alias("adc_dist"))
            .orderBy(F.asc_nulls_last("adc_dist"), F.asc(id_col))
            .limit(topk))


def pq_topk_rerank(encoded: DataFrame, vecs: DataFrame,
                   codebooks: list[list[list[float]]],
                   query_vec: list[float], topk: int = 10,
                   shortlist: int = 100, id_col: str = "vec_id",
                   vec_col: str = "embedding") -> DataFrame:
    """The production two-stage ANN: ADC over the compressed codes picks
    a ``shortlist`` of candidates (cheap, scan-wide), then ONLY those
    rows are exact-rescored from the full vectors (broadcast semi-join
    on the shortlist ids — the expensive float math touches ``shortlist``
    rows, not the corpus).  Output: (id, l2_dist) ascending."""
    cand = pq_topk(encoded, codebooks, query_vec, topk=shortlist,
                   id_col=id_col).select(id_col)
    # one expr-string parse for the whole left-fold (see _sub_d2 note)
    dist = F.expr(_sub_d2(vec_col, [float(x) for x in query_vec], 0))
    return (vecs.join(F.broadcast(cand), id_col)
            .select(F.col(id_col), F.round(dist, 6).alias("l2_dist"))
            .orderBy(F.asc_nulls_last("l2_dist"), F.asc(id_col))
            .limit(topk))


def ivfpq_encode(vecs: DataFrame, centroids: list[list[float]],
                 codebooks: list[list[list[float]]],
                 id_col: str = "vec_id", vec_col: str = "embedding",
                 ) -> DataFrame:
    """IVF-PQ index build: coarse cell assignment + PQ codes of the
    RESIDUAL (vector minus its cell centroid) — the billion-scale index
    layout (IVFADC in the PQ paper): residual energy is much smaller
    than vector energy, so the same codebook bits quantize far finer.

    Output: (id, cell, codes).  One narrow projection per vector —
    assignment, residual, and encoding are all column expressions.
    """
    from .similarity import ivf_assign
    assigned = ivf_assign(vecs, centroids, id_col, vec_col)
    # ONE nested-list literal (py4j-cheap), not K*dim F.lit calls
    cents = F.lit([[float(x) for x in c] for c in centroids]) \
             .cast("array<array<double>>")
    # try_element_at: the -1 'no cell' sentinel (NULL/short vector)
    # indexes 0, which plain element_at THROWS on under ANSI — the
    # NULL residual instead yields null codes downstream
    resid = F.zip_with(F.col("v").cast("array<double>"),
                       F.try_element_at(cents, F.col("cell") + 1),
                       lambda a, b: a - b)
    return pq_encode(assigned.select("vec_id", "cell", resid.alias("r")),
                     codebooks, id_col="vec_id", vec_col="r",
                     keep=("cell",))


def ivfpq_topk(encoded: DataFrame, centroids: list[list[float]],
               codebooks: list[list[list[float]]],
               query_vec: list[float], topk: int = 10, nprobe: int = 2,
               id_col: str = "vec_id") -> DataFrame:
    """IVF-PQ query: probe the ``nprobe`` nearest cells (L2 to the
    query), ADC-score each probed cell's rows against that cell's OWN
    residual table (query residual differs per cell), union, global
    top-k.  Each branch is a filter + M lookups — no float vectors are
    read at query time."""
    q = [float(x) for x in query_vec]

    def _l2(a: list[float], b: list[float]) -> float:
        return sum((x - y) * (x - y) for x, y in zip(a, b))

    ranked = sorted(range(len(centroids)), key=lambda i: (_l2(q, centroids[i]), i))
    parts = []
    for cell in ranked[:max(1, nprobe)]:
        qr = [qi - ci for qi, ci in zip(q, centroids[cell])]
        scored = pq_topk(encoded.filter(F.col("cell") == cell),
                         codebooks, qr, topk=topk, id_col=id_col)
        parts.append(scored)
    out = parts[0]
    for p in parts[1:]:
        out = out.unionByName(p)
    return (out.orderBy(F.asc_nulls_last("adc_dist"), F.asc(id_col))
            .limit(topk))
