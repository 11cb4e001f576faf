"""Deduplication operators for the training-data pipeline.

Five strategies over a documents table ``(doc_id, text)`` (plus an
embedding variant over ``(vec_id, embedding)``), all built from Spark
primitives:

* exact          — hash-groupBy on a normalized-content fingerprint
* minhash + LSH  — shingle -> K minhashes -> B bands -> bucket self-join
* simhash        — 64-bit sign-aggregated token hashes, bucket by prefix
* n-gram Jaccard — shingle-set similarity verify step for candidate pairs
* embedding      — cosine near-dup over vector columns

Scale shape: candidate generation is always *bucketed* (LSH bands, simhash
prefixes) so pair formation is grouped by bucket key, never a cross
product; oversized buckets are dropped whole (``max_bucket``) and the
exact-Jaccard verify runs only on surviving candidate pairs.  This is
the filter-verify architecture of the set-similarity-join literature
(e.g. "Scalable and Robust Set Similarity Join", ICDE 2018 — PAPERS.md):
a cheap signature filter whose robustness depends on bounding the skewed
signature groups, then exact verification of the candidate set.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

from ..functions.text import fingerprint, portable_words, shingles

# Deterministic multipliers for the minhash permutation family
# h_i(x) = (a_i * x + b_i) mod 2^31-1.  The 31-bit Mersenne prime keeps
# a_i * x < 2^62, inside signed-int64 under Spark's ANSI overflow checks.
_MERSENNE = (1 << 31) - 1


def _perm_params(num: int, seed: int = 42) -> list[tuple[int, int]]:
    import random
    rnd = random.Random(seed)
    return [(rnd.randrange(1, _MERSENNE - 1) | 1, rnd.randrange(0, _MERSENNE - 1))
            for _ in range(num)]


def exact_duplicates(docs: DataFrame, id_col: str = "doc_id",
                     text_col: str = "text") -> DataFrame:
    """(fingerprint, n_dups, doc_ids) for groups with >1 member."""
    return (
        docs.select(F.col(id_col).alias("doc_id"),
                    fingerprint(F.col(text_col)).alias("fp"))
        .groupBy("fp")
        .agg(F.count("*").alias("n_dups"),
             F.sort_array(F.collect_list("doc_id")).alias("doc_ids"))
        .filter(F.col("n_dups") > 1)
    )


def minhash_signatures(docs: DataFrame, id_col: str = "doc_id",
                       text_col: str = "text", num_hashes: int = 32,
                       shingle_n: int = 3) -> DataFrame:
    """(doc_id, sig array<long>) minhash signatures, all JVM-side:
    xxhash64 per shingle, then min over the permutation family via
    higher-order array functions — no Python in the hot path."""
    params = _perm_params(num_hashes)
    # Materialize the per-shingle base hashes ONCE; inlining them into each
    # permutation column would re-evaluate shingling + xxhash per hash
    # function (num_hashes x cost — measured 13x slower at sf0.1).  Shingle
    # hashes combine per-word hashes arithmetically instead of building
    # n-gram strings and re-hashing them (another ~2x).
    words = F.filter(F.split(F.lower(F.trim(F.col(text_col))), r"\s+"),
                     lambda x: x != "")
    word_hashes = F.transform(words, lambda w: F.pmod(F.xxhash64(w), F.lit(_MERSENNE)))
    base = docs.select(F.col(id_col).alias("doc_id"), word_hashes.alias("wh"))
    roll = F.transform(
        F.sequence(F.lit(1), F.size("wh") - (shingle_n - 1)),
        lambda i: F.pmod(sum(F.element_at(F.col("wh"), i + k) * (8387 + 12 * k)
                             for k in range(shingle_n)), F.lit(_MERSENNE)))
    # short docs (< shingle_n words): one shingle over whatever is there
    short = F.array(F.aggregate(F.col("wh"), F.lit(0).cast("long"),
                                lambda acc, x: F.pmod(acc * 31 + x, F.lit(_MERSENNE))))
    base = base.select(
        "doc_id",
        F.when(F.size("wh") >= shingle_n, F.array_distinct(roll))
         .otherwise(short).alias("hs"))
    sig_cols = [
        F.array_min(F.transform(F.col("hs"), lambda h: (h * a + b) % _MERSENNE)).alias(f"h{i}")
        for i, (a, b) in enumerate(params)
    ]
    return base.select("doc_id", *sig_cols) \
               .select("doc_id", F.array(*[f"h{i}" for i in range(num_hashes)]).alias("sig"))


def _capped_bucket_members(banded: DataFrame, max_bucket: int,
                           payload: str = "doc_id") -> DataFrame:
    """(band, bucket, payload) -> (ds array<payload>) for buckets with
    2..max_bucket members, with the cap enforced BEFORE any aggregation
    buffer materializes a member list.

    A boilerplate band-hash shared by 10^8 documents must never reach
    ``collect_list`` — even if the list is filtered away afterwards, the
    single aggregation buffer holding it is an executor OOM.  So the
    bucket is truncated streaming first: ``row_number`` over
    (band, bucket) runs in WindowExec, whose per-group buffer is a
    spillable external sorter, and the ``rn <= max_bucket + 1`` filter
    drops the tail of an oversized bucket row-by-row.  The surviving
    sentinel row (rn == max_bucket + 1) marks the bucket oversized so it
    is dropped whole after the now-bounded collect.  The groupBy reuses
    the window's (band, bucket) hash partitioning — one shuffle total.
    """
    from pyspark.sql import Window

    w = Window.partitionBy("band", "bucket").orderBy(payload)
    ranked = (banded
              .withColumn("rn", F.row_number().over(w))
              .filter(F.col("rn") <= max_bucket + 1))
    return (ranked.groupBy("band", "bucket")
            .agg(F.collect_list(payload).alias("ds"),
                 F.max("rn").alias("n"))
            .filter((F.col("n") > 1) & (F.col("n") <= max_bucket))
            .select(F.array_sort("ds").alias("ds")))


def _expand_bucket_pairs(members: DataFrame) -> DataFrame:
    """(ds sorted array) -> one row per in-bucket pair (p.doc_a < p.doc_b).

    Two chained Generates, NOT a transform/flatten lambda: higher-order
    functions evaluate interpreted per element AND the lambda form
    allocates the bucket's full O(n^2) pair array in one buffer before
    exploding it.  Generate(explode) streams pairs through codegen with
    no intermediate array — measured 139 s -> 0.6 s on the 72M pairs
    that near-cap (~1000-member) boilerplate buckets produce, and the
    per-bucket memory high-water drops from O(n^2) structs to O(n)."""
    return (members
            .select("ds", F.posexplode("ds").alias("i", "a"))
            .select("a",
                    F.explode(F.expr("slice(ds, i + 2, size(ds))"))
                    .alias("b"))
            .select(F.struct(F.col("a").alias("doc_a"),
                             F.col("b").alias("doc_b")).alias("p")))


def minhash_lsh_pairs(docs: DataFrame, id_col: str = "doc_id",
                      text_col: str = "text", num_hashes: int = 32,
                      bands: int = 8, shingle_n: int = 3,
                      max_bucket: int = 1000) -> DataFrame:
    """Candidate near-dup pairs via banded LSH: documents sharing any band
    bucket.  Returns (doc_a, doc_b, n_bands_shared), doc_a < doc_b.

    Shape chosen for scale: ONE pass over the signatures — window-capped
    bucket truncation (see ``_capped_bucket_members``) then in-bucket
    pair expansion — instead of a bucket self-join, which evaluates the
    whole signature pipeline twice (its heaviest part) and shuffles it
    twice.  Buckets larger than ``max_bucket`` are dropped whole: a
    band-hash shared by thousands of documents is boilerplate, its
    O(n^2) pairs are useless as near-dup candidates, and one such bucket
    at web scale would otherwise emit billions of rows from a single
    task (the standard LSH-dedup mega-bucket guard)."""
    rows = num_hashes // bands
    sigs = minhash_signatures(docs, id_col, text_col, num_hashes, shingle_n)
    banded = sigs.select(
        "doc_id",
        F.posexplode(F.array(*[
            F.xxhash64(F.concat_ws(",", *[F.element_at("sig", b * rows + r + 1).cast("string")
                                          for r in range(rows)]))
            for b in range(bands)])).alias("band", "bucket"),
    )
    pairs = _expand_bucket_pairs(_capped_bucket_members(banded, max_bucket))
    return (pairs.groupBy(F.col("p.doc_a").alias("doc_a"),
                          F.col("p.doc_b").alias("doc_b"))
            .agg(F.count("*").alias("n_bands_shared")))


def lsh_index(docs: DataFrame, id_col: str = "doc_id",
              text_col: str = "text", num_hashes: int = 32,
              bands: int = 8, shingle_n: int = 3,
              max_bucket: int = 1000) -> DataFrame:
    """The PERSISTABLE banded-LSH index of a corpus: (doc_id, sig,
    band, bucket), one row per (doc, band).  Same signature and band
    formulas as ``minhash_lsh_pairs``, so an index written once lets
    ``dedup_incremental`` screen every future crawl batch WITHOUT
    touching the corpus text again.

    Buckets with more than ``max_bucket`` members are dropped at BUILD
    time (boilerplate band-hashes; the same mega-bucket guard as the
    batch path) so the per-batch probe join never sees them — the cap
    costs one windowed count here, not one full index scan per batch.
    At web scale, write this bucketed by (band, bucket)
    (``sinks.bucketed``-style) and the probe join is a co-located
    sort-merge with no index shuffle.
    """
    from pyspark.sql import Window

    rows = num_hashes // bands
    sigs = minhash_signatures(docs, id_col, text_col, num_hashes, shingle_n)
    banded = sigs.select(
        "doc_id", "sig",
        F.posexplode(F.array(*[
            F.xxhash64(F.concat_ws(",", *[F.element_at("sig", b * rows + r + 1).cast("string")
                                          for r in range(rows)]))
            for b in range(bands)])).alias("band", "bucket"),
    )
    w = Window.partitionBy("band", "bucket")
    return (banded.withColumn("_bn", F.count("*").over(w))
            .filter(F.col("_bn") <= max_bucket)
            .select("doc_id", "sig", "band", "bucket"))


def dedup_incremental(new_docs: DataFrame, index: DataFrame,
                      id_col: str = "doc_id", text_col: str = "text",
                      num_hashes: int = 32, bands: int = 8,
                      shingle_n: int = 3, threshold: float = 0.8,
                      max_bucket: int = 1000) -> DataFrame:
    """Dedup a new crawl batch against an EXISTING corpus via its stored
    ``lsh_index`` — the production shape at web scale, where recomputing
    the corpus (``dedup_corpus``) per batch would re-read 100 TB.

    Returns (doc_id, dup_of, est_jaccard) for each new document whose
    estimated Jaccard against some indexed document clears ``threshold``
    (``dup_of`` = the best-matching indexed doc via ``max_by``); new
    documents absent from the result are novel.  The estimate is the
    classic MinHash one — the fraction of equal signature slots — an
    unbiased estimator of the true shingle Jaccard, so no corpus text is
    needed for verification.  In-batch duplicates are a separate concern
    (run ``dedup_corpus`` on the batch); this operator answers
    "have we already got this page?".

    Scale shape: candidates come from an equi-join on (band, bucket) —
    with the index pre-bucketed on those keys the join is co-located and
    only the (small) batch shuffles; oversized buckets were dropped at
    index build, so no bucket explosion.  The candidate set is
    deduplicated on (new, old) before the O(num_hashes) estimate.
    """
    new_idx = lsh_index(new_docs, id_col, text_col, num_hashes, bands,
                        shingle_n, max_bucket)
    cand = (new_idx.select("band", "bucket",
                           F.col("doc_id").alias("doc_id"),
                           F.col("sig").alias("sa"))
            .join(index.select("band", "bucket",
                               F.col("doc_id").alias("dup_of"),
                               F.col("sig").alias("sb")),
                  ["band", "bucket"])
            .filter(F.col("doc_id") != F.col("dup_of"))
            .select("doc_id", "dup_of", "sa", "sb").distinct())
    est = (F.expr("aggregate(zip_with(sa, sb, (x, y) -> IF(x = y, 1, 0)),"
                  " 0, (a, x) -> a + x)")
           / F.lit(float(num_hashes)))
    scored = cand.select("doc_id", "dup_of", est.alias("est_jaccard")) \
                 .filter(F.col("est_jaccard") >= threshold)
    # struct ordering makes the argmax deterministic on score ties
    # (highest score, then lexicographically greatest doc id)
    return (scored.groupBy("doc_id")
            .agg(F.expr("max_by(dup_of, struct(est_jaccard, dup_of))")
                 .alias("dup_of"),
                 F.round(F.max("est_jaccard"), 6).alias("est_jaccard")))


def ngram_jaccard_pairs(docs: DataFrame, candidates: DataFrame,
                        id_col: str = "doc_id", text_col: str = "text",
                        shingle_n: int = 3, threshold: float = 0.8) -> DataFrame:
    """Verify candidate pairs with exact shingle-set Jaccard (broadcast-free
    double join on doc ids)."""
    sh = docs.select(F.col(id_col).alias("doc_id"),
                     F.array_distinct(shingles(F.col(text_col), shingle_n)).alias("sh"))
    j = (candidates
         .join(sh.withColumnRenamed("doc_id", "doc_a").withColumnRenamed("sh", "sh_a"), "doc_a")
         .join(sh.withColumnRenamed("doc_id", "doc_b").withColumnRenamed("sh", "sh_b"), "doc_b"))
    inter = F.size(F.array_intersect("sh_a", "sh_b")).cast("double")
    union = F.size(F.array_union("sh_a", "sh_b")).cast("double")
    return (j.select("doc_a", "doc_b",
                     F.round(inter / F.greatest(union, F.lit(1.0)), 6).alias("jaccard"))
            .filter(F.col("jaccard") >= threshold))


def simhash(docs: DataFrame, id_col: str = "doc_id",
            text_col: str = "text") -> DataFrame:
    """64-bit SimHash per document: sign-sum of token xxhash64 bits.

    Implemented with an aggregate over a 64-slot bit-count array — stays in
    whole-stage codegen.  Returns (doc_id, simhash long, prefix16 long).
    """
    words = F.filter(F.split(F.lower(F.trim(F.col(text_col))), r"\s+"),
                     lambda x: x != "")
    hashes = F.transform(words, lambda w: F.xxhash64(w))
    # counts[i] = sum over tokens of (bit i set ? +1 : -1); the bit index is
    # a Python int so shiftright gets a literal shift amount.
    counts = F.aggregate(
        hashes,
        F.array_repeat(F.lit(0), 64),
        lambda acc, h: F.zip_with(
            acc,
            F.array(*[F.when(F.shiftright(h, i).bitwiseAND(F.lit(1)) == 1,
                             F.lit(1)).otherwise(F.lit(-1)) for i in range(64)]),
            lambda a, b: a + b),
    )
    bit_vals = [F.when(F.element_at(counts, i + 1) > 0,
                       F.lit((1 << i) if i < 63 else -(1 << 63)).cast("long"))
                 .otherwise(F.lit(0).cast("long"))
                for i in range(64)]
    sim = bit_vals[0]
    for bv in bit_vals[1:]:
        sim = sim.bitwiseOR(bv)
    return docs.select(F.col(id_col).alias("doc_id"), sim.alias("simhash")) \
               .withColumn("prefix16", F.shiftrightunsigned("simhash", 48))


def simhash_band_pairs(sims: DataFrame, max_hamming: int = 3,
                       nbits: int = 64, max_bucket: int = 1000) -> DataFrame:
    """Near-dup pairs over a (doc_id, simhash) frame via multi-segment
    banding: the ``nbits`` hash splits into ``max_hamming + 1`` contiguous
    bands, and any pair differing in <= max_hamming bits shares at least
    one INTACT band (pigeonhole) — guaranteed recall, unlike the previous
    single top-16-prefix bucket, which silently missed pairs whose
    differing bits fell inside the prefix.  Buckets are capped exactly
    like the MinHash path (window-truncated before any aggregation
    buffer), so a degenerate corpus where many near-empty pages hash to
    simhash≈0 stays bounded.  Returns (doc_a, doc_b, hamming),
    doc_a < doc_b, hamming <= max_hamming."""
    nb = max_hamming + 1
    base, extra = divmod(nbits, nb)
    widths = [base + (1 if i < extra else 0) for i in range(nb)]
    offsets = [sum(widths[:i]) for i in range(nb)]
    segs = [F.shiftrightunsigned("simhash", offsets[i])
             .bitwiseAND(F.lit((1 << widths[i]) - 1)) for i in range(nb)]
    banded = sims.select(
        F.struct("doc_id", "simhash").alias("m"),
        F.posexplode(F.array(*segs)).alias("band", "bucket"))
    pairs = _expand_bucket_pairs(
        _capped_bucket_members(banded, max_bucket, payload="m"))
    # a pair sharing several intact bands appears once per band; collapse
    # before the (cheap) hamming verify
    uniq = pairs.select(F.col("p.doc_a.doc_id").alias("doc_a"),
                        F.col("p.doc_b.doc_id").alias("doc_b"),
                        F.col("p.doc_a.simhash").alias("sim_a"),
                        F.col("p.doc_b.simhash").alias("sim_b")).distinct()
    hamming = F.bit_count(F.col("sim_a").bitwiseXOR(F.col("sim_b")))
    return (uniq.select("doc_a", "doc_b", hamming.alias("hamming"))
            .filter(F.col("hamming") <= max_hamming))


def simhash_near_dups(docs: DataFrame, id_col: str = "doc_id",
                      text_col: str = "text", max_hamming: int = 3,
                      max_bucket: int = 1000) -> DataFrame:
    """Near-dup pairs whose simhashes differ in <= max_hamming bits
    (banded multi-segment candidate generation, see simhash_band_pairs)."""
    s = simhash(docs, id_col, text_col).select("doc_id", "simhash")
    return simhash_band_pairs(s, max_hamming, 64, max_bucket)


def embedding_near_dups(vecs: DataFrame, id_col: str = "vec_id",
                        vec_col: str = "embedding",
                        threshold: float = 0.95) -> DataFrame:
    """Cosine near-dup pairs over an embedding column.  Brute-force O(n^2)
    verify — the exactness baseline and the verify step; at scale use
    ``embedding_near_dups_lsh`` (bucketed candidates, same verify)."""
    from .similarity import cosine_sim
    norm = vecs.select(F.col(id_col).alias("vec_id"), F.col(vec_col).alias("v"))
    a, b = norm.alias("a"), norm.alias("b")
    sim = cosine_sim(F.col("a.v"), F.col("b.v"))
    return (a.join(b, F.col("a.vec_id") < F.col("b.vec_id"))
            .select(F.col("a.vec_id").alias("vec_a"),
                    F.col("b.vec_id").alias("vec_b"),
                    F.round(sim, 6).alias("cosine"))
            .filter(F.col("cosine") >= threshold))


def embedding_near_dups_lsh(vecs: DataFrame, dim: int,
                            id_col: str = "vec_id",
                            vec_col: str = "embedding",
                            threshold: float = 0.95, bits: int = 8,
                            tables: int = 4, seed: int = 42,
                            max_bucket: int = 1000) -> DataFrame:
    """Scale path for embedding near-dup: random-hyperplane LSH buckets
    generate candidates, exact cosine verifies them — the same
    filter-verify shape as the MinHash text path.

    ``tables`` independent hyperplane sets (one band each): a true pair
    at cosine >= threshold has per-table collision probability
    (1 - theta/pi)^bits, so multiple tables multiply recall the same way
    MinHash bands do (candidates are deduplicated across tables before
    the verify join).  Buckets are window-capped like every other
    candidate generator here, so a degenerate corpus (all-zero or
    near-identical sketch regions) stays bounded.  O(n * tables) bucket
    rows, pair formation grouped per bucket — never a cross product.
    """
    from .similarity import cosine_sim_flat, lsh_buckets_multi

    norm = vecs.select(F.col(id_col).alias("doc_id"), F.col(vec_col).alias("v"))
    # all `tables` buckets in ONE Arrow-batched kernel pass (a
    # tables x bits x dim expression tree ran interpreted past Janino's
    # method limit — see similarity.lsh_buckets_multi), then posexplode
    banded = (lsh_buckets_multi(vecs, dim, bits, tables, id_col,
                                vec_col, seed)
              .select(F.col("vec_id").alias("doc_id"),
                      F.posexplode("buckets").alias("band", "bucket")))
    pairs = _expand_bucket_pairs(_capped_bucket_members(banded, max_bucket))
    cand = (pairs.select(F.col("p.doc_a").alias("vec_a"),
                         F.col("p.doc_b").alias("vec_b")).distinct())
    va = norm.select(F.col("doc_id").alias("vec_a"), F.col("v").alias("va"))
    vb = norm.select(F.col("doc_id").alias("vec_b"), F.col("v").alias("vb"))
    # flat codegen cosine (identical float path to the HOF fold)
    sim = cosine_sim_flat("va", "vb", dim)
    return (cand.join(va, "vec_a").join(vb, "vec_b")
            .select("vec_a", "vec_b", F.round(sim, 6).alias("cosine"))
            .filter(F.col("cosine") >= threshold))


def minhash_signatures_portable(docs: DataFrame, id_col: str = "doc_id",
                                text_col: str = "text",
                                num_hashes: int = 8) -> DataFrame:
    """MinHash signatures from a PORTABLE hash formula — bit-identical
    across engines, so an external system (DuckDB, Trino, any ANSI engine
    with md5) can recompute and verify them.

    Formula (word 3-gram shingles, salted md5 truncated to 60 bits):

        h_s(doc) = min over shingles g of
                   int(md5(f"{s}|{g}")[:15 hex chars], 16)

    The engine-native ``minhash_signatures`` (xxhash64) is ~2x faster and
    preferred in-pipeline; this variant exists for cross-system
    verification and reproducible dataset releases, and doubles as the
    oracle-checked driver query (q29).  All JVM-side column expressions —
    no Python.
    """
    # Explicit whitespace class, not \s: Java regex counts \x0B as
    # whitespace and RE2 (DuckDB) does not — \s would silently break the
    # bit-identical guarantee on such input.
    #
    # Two-step select: materialize the word array FIRST, then build
    # shingles by zip_with over shifted slices of the ws COLUMN — never
    # transform(indices, element_at(ws, i)) over a captured expression
    # tree, which re-evaluates the whole split per element and makes
    # shingling O(doc^2) on crawl-scale pages (span_dedup.py lesson;
    # found live as a 2x wall cost in q77's profile).
    based = docs.select(
        F.col(id_col).alias("doc_id"),
        portable_words(F.col(text_col)).alias("ws"))
    ws = F.col("ws")
    g2 = F.zip_with(ws, F.slice(ws, 2, F.greatest(F.size(ws), F.lit(1))),
                    lambda a, b: F.concat_ws(" ", a, b))
    g3 = F.zip_with(g2, F.slice(ws, 3, F.greatest(F.size(ws), F.lit(1))),
                    lambda a, b: F.concat_ws(" ", a, b))
    sh = F.when(F.size(ws) >= 3, F.slice(g3, 1, F.size(ws) - 2)) \
          .otherwise(F.array(F.array_join(ws, " ")))
    # Materialize the shingle array ONCE, then hash num_hashes ways —
    # inlining `sh` into the seed transform would re-evaluate the whole
    # shingling chain per seed (cf. minhash_signatures' same note).
    shingled = based.select("doc_id", sh.alias("sh"))
    sig = F.transform(
        F.sequence(F.lit(1), F.lit(num_hashes)),
        lambda s: F.array_min(F.transform(F.col("sh"), lambda g: F.conv(
            F.substring(F.md5(F.concat(s.cast("string"), F.lit("|"), g)),
                        1, 15), 16, 10).cast("bigint"))))
    return shingled.select("doc_id", sig.alias("sig"))


def minhash_lsh_pairs_portable(docs: DataFrame, id_col: str = "doc_id",
                               text_col: str = "text", num_hashes: int = 8,
                               bands: int = 4,
                               max_bucket: int = 1000) -> DataFrame:
    """Banded LSH candidate pairs over the PORTABLE MinHash signatures
    (``minhash_signatures_portable``): the bucket key is the band's raw
    signature values joined with ',' — no engine-native hash anywhere —
    so an external ANSI engine with md5 can recompute the buckets AND the
    resulting pair set bit-identically (the oracle-checked driver query
    q34).  Same window-capped bucket guard as the native path.  Returns
    (doc_a, doc_b, n_bands_shared), doc_a < doc_b."""
    rows = num_hashes // bands
    sigs = minhash_signatures_portable(docs, id_col, text_col, num_hashes)
    banded = sigs.select(
        "doc_id",
        F.posexplode(F.array(*[
            F.concat_ws(",", *[F.element_at("sig", b * rows + r + 1).cast("string")
                               for r in range(rows)])
            for b in range(bands)])).alias("band", "bucket"),
    )
    pairs = _expand_bucket_pairs(_capped_bucket_members(banded, max_bucket))
    return (pairs.groupBy(F.col("p.doc_a").alias("doc_a"),
                          F.col("p.doc_b").alias("doc_b"))
            .agg(F.count("*").alias("n_bands_shared")))


def simhash_portable(docs: DataFrame, id_col: str = "doc_id",
                     text_col: str = "text") -> DataFrame:
    """60-bit SimHash from a PORTABLE formula (salted-free md5 words) —
    bit-identical across engines, like ``minhash_signatures_portable``.

    sign-sum per bit b of the word-hash population:
        score_b = sum over words of ((md5int60(word) >> b) % 2) * 2 - 1
        simhash = sum of (1 << b) where score_b > 0

    Shape: explode words x 60 bit positions -> two partial-aggregatable
    groupBys.  This materializes |words| x 60 rows, so it is the
    VERIFICATION path; the engine-native ``simhash`` (64-slot array
    aggregate, zero explosion) is the in-pipeline scale path.
    """
    ws = portable_words(F.col(text_col))
    words = docs.select(F.col(id_col).alias("doc_id"), F.explode(ws).alias("word"))
    h = words.select("doc_id", F.conv(
        F.substring(F.md5("word"), 1, 15), 16, 10).cast("bigint").alias("hv"))
    bits = (h.select("doc_id", "hv",
                     F.explode(F.sequence(F.lit(0), F.lit(59))).alias("b"))
            .groupBy("doc_id", "b")
            .agg(F.sum(F.expr("(shiftright(hv, b) % 2) * 2 - 1")).alias("score")))
    return (bits.groupBy("doc_id")
            .agg(F.sum(F.expr(
                "CASE WHEN score > 0 THEN shiftleft(CAST(1 AS BIGINT), b) "
                "ELSE 0 END")).alias("simhash")))


def winnowed_fingerprints(docs: DataFrame, id_col: str = "doc_id",
                          text_col: str = "text", k: int = 8,
                          window: int = 4,
                          max_chars: int = 1_000_000) -> DataFrame:
    """Winnowing local fingerprints (Schleimer/Wilkerson/Aiken, SIGMOD'03
    — the MOSS algorithm): hash every char k-gram, slide a window of
    ``window`` consecutive hashes, keep each window's minimum, distinct.

    Guarantee: two documents sharing any substring of length
    >= k + window - 1 share at least one selected fingerprint — this is
    the SUBSTRING-level (partial-overlap / quote / boilerplate-fragment)
    detector that whole-document MinHash cannot provide.

    Hash formula is the PORTABLE md5-prefix used by the other portable
    twins, so DuckDB recomputes fingerprints bit-identically (driver
    query q35).  All JVM-side column expressions; O(len) per document.
    Returns (doc_id, fp) exploded.

    ``max_chars`` caps the scanned prefix: the k-gram hash array holds
    one long per character, so an adversarial multi-MB page would
    otherwise materialize hundreds of MB of transient arrays in a single
    row's expression evaluation.  1M chars (~200 printed pages) covers
    any real document body; overlap within the prefix is still detected.
    """
    w = _winnowed_fp_arrays(docs, id_col, text_col, k, window, max_chars)
    # explode_outer, NOT explode: plain explode makes InferFiltersFromGenerate
    # add a `size(fps) > 0` filter that predicate pushdown then rewrites below
    # the projections, alias-substituting the ENTIRE k-gram transform inside
    # the window-min lambda — i.e. the full md5 pass re-evaluated per window
    # position, O(len^2) per document (>200 s at 10k chars vs 0.5 s fused).
    # fps always has >= 1 element (greatest(..., 1)), so outer adds no rows.
    return w.select("doc_id", F.explode_outer("fps").alias("fp")).where(
        F.col("fp").isNotNull())


def _winnowed_fp_arrays(docs: DataFrame, id_col: str, text_col: str,
                        k: int, window: int, max_chars: int) -> DataFrame:
    """(doc_id, fps array<bigint>) — the per-document winnowed
    fingerprint SET before explosion (so callers that also need the set
    size read it via ``size(fps)`` instead of re-aggregating the
    exploded stream)."""
    d = docs.select(F.col(id_col).alias("doc_id"),
                    F.substring(F.lower(F.trim(F.coalesce(F.col(text_col), F.lit("")))),
                                1, max_chars).alias("t"))
    # k-grams via slices of a char ARRAY, not substr(t, i, k): UTF8String
    # substring walks bytes from position 0 on every call, so the substr
    # form is O(len^2) per document (measured 85 s at 200k chars); array
    # slices are offset-indexed -> O(len·k) (1M chars in ~2 s).  Output
    # proven equivalent incl. multi-byte chars.
    g = d.select("doc_id", F.split("t", "").alias("cs")).select("doc_id", F.expr(
        f"transform(sequence(1, greatest(size(cs) - {k - 1}, 1)),"
        f" i -> cast(conv(substr(md5(array_join(slice(cs, i, {k}), '')), 1, 15),"
        f" 16, 10) AS BIGINT))"
    ).alias("hs"))
    return g.select("doc_id", F.expr(
        f"array_distinct(transform(sequence(1, greatest(size(hs) - {window - 1}, 1)),"
        f" j -> array_min(slice(hs, j, {window}))))").alias("fps"))


def winnow_overlap_pairs(docs: DataFrame, id_col: str = "doc_id",
                         text_col: str = "text", k: int = 8,
                         window: int = 4, min_shared: int = 2,
                         max_bucket: int = 1000,
                         max_chars: int = 1_000_000) -> DataFrame:
    """Substring-overlap candidate pairs from winnowed fingerprints: the
    partial-containment detector (quotes, syndicated fragments, page A
    embedding page B) that whole-document MinHash/SimHash cannot provide
    — their signatures dilute a shared fragment to noise, while winnowing
    guarantees any shared run of length >= k + window - 1 chars yields a
    shared selected fingerprint (Schleimer et al., SIGMOD'03 §3).

    Returns (doc_a, doc_b, n_shared, containment) with doc_a < doc_b;
    ``containment`` = shared fps / min(|fps_a|, |fps_b|) — 1.0 means the
    smaller document's fingerprint set is fully inside the larger's.

    Scale shape mirrors the MinHash LSH path: ONE scan — each exploded
    fingerprint row carries its document's set size (``size(fps)`` read
    off the pre-explosion array, free), so the pair stream already holds
    (n_a, n_b) and no per-doc count table is joined back (the join-based
    form re-evaluated the whole fingerprint pipeline three times).
    Fingerprint = bucket, window-capped truncation BEFORE any member
    list materializes (``_capped_bucket_members``), in-bucket expansion.
    A fingerprint shared by more than ``max_bucket`` documents is
    boilerplate (nav chrome, license blocks) — its O(n^2) pairs are
    dropped whole, the standard mega-bucket guard.  ``min_shared``
    prunes the pair stream: one co-selected hash is an 11-char
    coincidence, two already imply either two fragments or one long one.
    """
    arrs = _winnowed_fp_arrays(docs, id_col, text_col, k, window, max_chars)
    fps = (arrs.select("doc_id", F.size("fps").alias("n_fps"),
                       F.explode_outer("fps").alias("fp"))
           .where(F.col("fp").isNotNull()))
    banded = fps.select(
        F.struct(F.col("doc_id").alias("doc_id"),
                 F.col("n_fps").alias("n_fps")).alias("m"),
        F.lit(0).alias("band"), F.col("fp").alias("bucket"))
    pairs = _expand_bucket_pairs(
        _capped_bucket_members(banded, max_bucket, payload="m"))
    shared = (pairs.groupBy(F.col("p.doc_a.doc_id").alias("doc_a"),
                            F.col("p.doc_b.doc_id").alias("doc_b"))
              .agg(F.count("*").alias("n_shared"),
                   F.min(F.least(F.col("p.doc_a.n_fps"),
                                 F.col("p.doc_b.n_fps"))).alias("_mn"))
              .filter(F.col("n_shared") >= min_shared))
    return shared.select(
        "doc_a", "doc_b", "n_shared",
        (F.col("n_shared") / F.col("_mn").cast("double")).alias("containment"))


def dedup_corpus(docs: DataFrame, id_col: str = "doc_id",
                 text_col: str = "text", num_hashes: int = 32,
                 bands: int = 8, shingle_n: int = 3,
                 jaccard_threshold: float = 0.8,
                 max_bucket: int = 1000) -> DataFrame:
    """The standard training-data dedup pipeline, end to end:

    1. exact      — fingerprint groupBy; every group keeps its min doc_id
    2. candidates — banded MinHash LSH over the exact-canonical survivors
                    (duplicates removed first so identical boilerplate
                    can't flood the LSH buckets)
    3. verify     — exact n-gram Jaccard on candidate pairs only
    4. cluster    — connected components over verified edges (near-dup
                    similarity is not transitive; CC closes the chains
                    A~B~C so one canonical survives per cluster)
    5. elect      — canonical = min doc_id of the cluster

    Returns ``(doc_id, canonical_id, reason)`` for EVERY input document:
    reason ``kept`` (doc_id == canonical_id), ``exact`` (byte-identical
    content group), or ``near`` (verified near-duplicate cluster).
    Filter ``doc_id = canonical_id`` for the keep-list.

    Scale shape: two groupBys (fingerprint, bucket) + the capped
    in-bucket pair expansion + CC's O(log n) iterations — no cross
    products anywhere; every stage is an equi-shuffle on a
    well-distributed key.
    """
    from .components import connected_components

    # exact_map is consumed twice (survivor filter + final canon join)
    # and survivors thrice (LSH + both sides of the Jaccard verify);
    # verified feeds CC's iterations.  Persist/checkpoint each so the
    # expensive prefixes run ONCE — without these the composed chain
    # re-derives the fingerprint groupBy and the 10^5-pair Jaccard
    # verify per consumer (measured 148 s -> 22 s on 5k salted docs).
    fp = docs.select(F.col(id_col).alias("doc_id"),
                     fingerprint(F.col(text_col)).alias("fp"))
    exact_canon = fp.groupBy("fp").agg(F.min("doc_id").alias("canonical_id"))
    exact_map = fp.join(exact_canon, "fp").select("doc_id", "canonical_id") \
        .persist()

    survivors = (docs.select(F.col(id_col).alias("doc_id"),
                             F.col(text_col).alias("text"))
                 .join(exact_map.filter(F.col("doc_id") == F.col("canonical_id"))
                       .select("doc_id"), "doc_id")
                 .persist())
    cands = minhash_lsh_pairs(survivors, "doc_id", "text", num_hashes,
                              bands, shingle_n, max_bucket)
    verified = ngram_jaccard_pairs(survivors, cands, "doc_id", "text",
                                   shingle_n, jaccard_threshold) \
        .localCheckpoint()
    near_labels = connected_components(
        verified.select(F.col("doc_a").alias("src"), F.col("doc_b").alias("dst")))
    survivors.unpersist()

    # exact representative -> its near-dup cluster label (if any) -> every
    # member of the exact group follows its representative
    canon = (exact_map
             .join(near_labels.withColumnRenamed("node", "canonical_id")
                   .withColumnRenamed("component", "near_canonical"),
                   "canonical_id", "left")
             .select("doc_id",
                     F.coalesce("near_canonical", "canonical_id").alias("cid"),
                     F.col("canonical_id").alias("exact_cid")))
    # materialize the result eagerly so exact_map can be UNPERSISTED
    # before returning: a long-lived session calling dedup_corpus per
    # crawl batch would otherwise pin one cached doc_id map per call
    # (CacheManager holds it until session end) and slowly evict useful
    # executor storage
    out = canon.select(
        "doc_id", F.col("cid").alias("canonical_id"),
        F.when(F.col("doc_id") == F.col("cid"), F.lit("kept"))
         .when(F.col("doc_id") != F.col("exact_cid"), F.lit("exact"))
         .otherwise(F.lit("near")).alias("reason")).localCheckpoint()
    exact_map.unpersist()
    return out


def line_dedup(docs: DataFrame, id_col: str = "doc_id",
               text_col: str = "text", min_chars: int = 8,
               portable: bool = False) -> DataFrame:
    """Corpus-wide EXACT line deduplication (the C4/RefinedWeb "remove
    repeated boilerplate lines across pages" pass): each distinct line
    long enough to be meaningful (``min_chars`` after trim) survives only
    in its FIRST occurrence — ordered by (doc id, line position) — and is
    deleted from every later page; short/blank lines are exempt (they are
    structure, not boilerplate, and deduping them would cross-link every
    page).  Documents whose every line is deleted drop out of the result.

    Scale shape: explode -> groupBy(line hash) with a partial-aggregable
    ``min(struct(id, pos))`` winner (NO window — a nav-bar line shared by
    10^8 pages would serialize one window partition), join back on the
    hash (AQE skew-split handles the boilerplate key: the winner side is
    one row per key), then per-doc reassembly.  ``portable=True`` swaps
    xxhash64 for the 60-bit md5 twin so external engines can recompute
    the winner set (q44).
    """
    line_h = (
        (lambda c: F.conv(F.substring(F.md5(c), 1, 15), 16, 10).cast("bigint"))
        if portable else F.xxhash64)
    lines = docs.select(
        F.col(id_col).alias("doc_id"),
        F.posexplode(F.split(F.col(text_col), "\n")).alias("pos", "line"))
    eligible = F.length(F.trim(F.col("line"))) >= min_chars
    keyed = lines.withColumn("lh", F.when(eligible, line_h(F.col("line"))))
    winners = (keyed.filter(F.col("lh").isNotNull())
               .groupBy("lh")
               .agg(F.min(F.struct("doc_id", "pos")).alias("first")))
    kept = (keyed.join(winners, "lh", "left")
            .filter(F.col("lh").isNull()
                    | ((F.col("first.doc_id") == F.col("doc_id"))
                       & (F.col("first.pos") == F.col("pos")))))
    return (kept.groupBy("doc_id")
            .agg(F.array_join(
                F.transform(F.array_sort(F.collect_list(F.struct("pos", "line"))),
                            lambda s: s["line"]), "\n").alias("text"),
                 F.count("*").alias("n_lines_kept")))


def edit_distance_pairs(docs: DataFrame, candidates: DataFrame,
                        id_col: str = "doc_id", text_col: str = "text",
                        max_dist: int = 20,
                        max_chars: int = 4000) -> DataFrame:
    """Verify candidate pairs with exact Levenshtein distance — the
    character-level verifier next to the shingle-set one
    (:func:`ngram_jaccard_pairs`); catches small in-place edits
    (typo fixes, date bumps, template fills) that shift every
    surrounding shingle but only move a few characters.

    (docs, candidate (doc_a, doc_b) pairs) -> (doc_a, doc_b, dist,
    dist_ppm) for pairs with ``dist <= max_dist``; ``dist_ppm`` is the
    distance normalized by the longer text (exact integer).

    Scale contract: Levenshtein is O(len_a * len_b) per pair, so texts
    are TRUNCATED to ``max_chars`` first (candidates come from the
    bucketed generators, so pair count is already bounded; the
    truncation bounds the per-pair CPU and is disclosed in the column
    name ``dist`` = distance of the truncated prefixes).  JVM-side
    ``levenshtein`` builtin — DuckDB ships the same function, so the
    q186 oracle replays bit-identically.
    """
    t = docs.select(F.col(id_col).alias("doc_id"),
                    F.substring(F.coalesce(F.col(text_col), F.lit("")),
                                1, max_chars).alias("t"))
    j = (candidates
         .join(t.withColumnRenamed("doc_id", "doc_a")
               .withColumnRenamed("t", "t_a"), "doc_a")
         .join(t.withColumnRenamed("doc_id", "doc_b")
               .withColumnRenamed("t", "t_b"), "doc_b"))
    dist = F.levenshtein("t_a", "t_b")
    longer = F.greatest(F.length("t_a"), F.length("t_b"), F.lit(1))
    return (j.select("doc_a", "doc_b",
                     dist.cast("long").alias("dist"),
                     longer.cast("long").alias("__l"))
            .filter(F.col("dist") <= max_dist)
            .selectExpr("doc_a", "doc_b", "dist",
                        "dist * 1000000 DIV __l AS dist_ppm"))
