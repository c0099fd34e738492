"""BPE trainer + token counting (operators/bpe.py)."""

from __future__ import annotations

from pyspark.sql import functions as F

from hiispider_spark.operators import bpe

SF_DIR = "/root/testdata/sf0.001"


def test_trainer_merge_order_and_counts():
    merges = bpe.train_bpe_merges({"abab": 2, "ab": 3}, n_merges=10)
    # (a,b) weighted 2*2+3 = 7 beats (b,a) = 2; then (ab,ab) appears
    assert merges == [("a", "b"), ("ab", "ab")]
    ranks = {p: i for i, p in enumerate(merges)}
    assert bpe.segment_count("abab", ranks) == 1
    assert bpe.segment_count("ab", ranks) == 1
    assert bpe.segment_count("aba", ranks) == 2  # ab + a
    assert bpe.segment_count("xyz", ranks) == 3  # no merge applies


def test_trainer_deterministic_and_min_freq():
    wf = {"low": 5, "lower": 2, "newest": 6, "widest": 3}
    m1 = bpe.train_bpe_merges(wf, n_merges=10)
    assert m1 == bpe.train_bpe_merges(wf, n_merges=10)
    # most frequent first pair: (e,s) appears in newest(6)+widest(3)=9
    assert m1[0] == ("e", "s")
    # min_freq prunes: with a floor above every pair count, no merges
    assert bpe.train_bpe_merges(wf, n_merges=10, min_freq=100) == []


def test_bpe_token_count_on_documents(spark):
    docs = spark.read.parquet(f"{SF_DIR}/documents.parquet")
    merges, word_freqs = bpe.train_bpe(docs, "text", n_merges=50)
    assert len(merges) > 0 and len(word_freqs) > 0
    out = bpe.bpe_token_count(
        docs, "doc_id", "text", merges, list(word_freqs)
    ).persist()
    joined = out.join(
        docs.select(
            "doc_id",
            F.size(F.filter(F.split("text", " "), lambda t: t != "")).alias(
                "n_words"
            ),
            F.length(F.regexp_replace("text", " ", "")).alias("n_nonspace"),
        ),
        "doc_id",
    )
    # every word ≥1 token, and ≤ its char count (the fallback ceiling)
    assert joined.filter(F.col("n_bpe_tokens") < F.col("n_words")).count() == 0
    assert (
        joined.filter(F.col("n_bpe_tokens") > F.col("n_nonspace")).count() == 0
    )
    assert out.count() == docs.count()
    # deterministic end-to-end
    again = bpe.bpe_token_count(
        docs, "doc_id", "text", merges, list(word_freqs)
    )
    assert out.exceptAll(again).count() == 0
    out.unpersist()


def test_unknown_word_falls_back_to_char_count(spark):
    docs = spark.createDataFrame(
        [(1, "hello hello zz"), (2, "qqqq")], "doc_id long, text string"
    )
    merges = [("h", "e"), ("l", "l"), ("ll", "o"), ("he", "llo")]
    got = {
        r.doc_id: r.n_bpe_tokens
        for r in bpe.bpe_token_count(
            docs, "doc_id", "text", merges, ["hello"]
        ).collect()
    }
    # hello→1 token (known, fully merged); zz/qqqq unknown → char count
    assert got == {1: 1 + 1 + 2, 2: 4}
