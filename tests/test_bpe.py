"""BPE training + encoding (operators/bpe.py): hand-verified merges on
the classic Sennrich corpus, reconstruction and training-consistency
invariants, DataFrame encode path."""

from knowledgebase_processor_spark.operators.bpe import (
    bpe_encode, bpe_train, encode_word, train_on_histogram,
)

# Sennrich et al. 2016's worked example vocabulary
FREQS = {"low": 5, "lower": 2, "newest": 6, "widest": 3}


def test_hand_verified_merge_sequence():
    merges = train_on_histogram(FREQS, 5)
    # round 1: (e,s),(s,t),(t,</w>) all tie at 9 -> lexicographic min;
    # then est, est</w> at 9; then (l,o),(o,w) tie at 7 -> (l,o); (lo,w)
    assert merges == [("e", "s"), ("es", "t"), ("est", "</w>"),
                      ("l", "o"), ("lo", "w")]


def test_encode_replays_training_greedily():
    merges = train_on_histogram(FREQS, 5)
    ranks = {p: i for i, p in enumerate(merges)}
    # the classic result: an unseen word segments from learned subwords
    assert encode_word("lowest", ranks) == ["low", "est</w>"]
    assert encode_word("low", ranks) == ["low", "</w>"]
    assert encode_word("", ranks) == ["</w>"]


def test_training_words_reach_fixed_segmentation():
    # with enough merges every training word collapses to one token
    merges = train_on_histogram(FREQS, 100)
    ranks = {p: i for i, p in enumerate(merges)}
    for w in FREQS:
        assert encode_word(w, ranks) == [w + "</w>"]
    # and the loop stopped: merge count is bounded by total symbol mass
    assert len(merges) < 30


def test_dataframe_train_and_encode(spark):
    docs = spark.createDataFrame(
        [(1, "low low low low low"), (2, "lower lower"),
         (3, "newest newest newest newest newest newest"),
         (4, "widest widest widest"), (5, ""), (6, None)],
        "doc_id long, text string")
    merges = bpe_train(docs, num_merges=5)
    assert merges == [("e", "s"), ("es", "t"), ("est", "</w>"),
                      ("l", "o"), ("lo", "w")]
    enc = {r["doc_id"]: r for r in bpe_encode(docs, merges).collect()}
    assert enc[1]["tokens"][:2] == ["low", "</w>"]
    assert enc[1]["n_tokens"] == 10          # 5 x (low, </w>)
    assert enc[5]["tokens"] == [] and enc[6]["tokens"] == []
    # reconstruction: tokens of each doc concatenate back to its words
    joined = "".join(enc[3]["tokens"]).replace("</w>", " ").strip()
    assert joined == "newest newest newest newest newest newest"


def test_encode_deterministic_across_batch_order(spark):
    docs = spark.createDataFrame(
        [(i, "newest widest lower low") for i in range(20)],
        "doc_id long, text string")
    merges = train_on_histogram(FREQS, 8)
    rows = bpe_encode(docs, merges).collect()
    assert len({tuple(r["tokens"]) for r in rows}) == 1


def test_train_histogram_is_bounded(spark):
    # heavy-tail corpus: 3 head words + 50 singleton "URL-ish" tail words.
    tail = " ".join(f"u{i:03d}x" for i in range(50))
    docs = spark.createDataFrame(
        [(1, "low low low newest newest widest"), (2, tail)],
        "doc_id long, text string")
    # min_count drops the entire singleton tail (and 'widest')
    merges = bpe_train(docs, num_merges=3, min_count=2)
    assert merges == train_on_histogram({"low": 3, "newest": 2}, 3)
    # max_words caps the collected frame to the top-k by (c desc, w asc):
    # with k=2 only {low, newest} survive — identical merges
    assert bpe_train(docs, num_merges=3, max_words=2) == merges
    # defaults keep every word: unchanged vs the unbounded histogram
    full = {r["w"]: r["c"]
            for r in __import__("knowledgebase_processor_spark.operators.bpe",
                                fromlist=["word_histogram"])
            .word_histogram(docs).collect()}
    assert bpe_train(docs, num_merges=3) == train_on_histogram(full, 3)
