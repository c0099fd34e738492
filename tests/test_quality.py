"""Corpus-quality operators (quality.py): Gopher signals, span-dup
fraction, PII scrub, stratified sampling, source caps."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from hiispider_spark.operators import quality as ql


@pytest.fixture(scope="module")
def docs(spark):
    rows = [
        # 0: clean, long enough, varied
        (0, " ".join(f"w{i}" for i in range(40)), "en", "srcA"),
        # 1: too short
        (1, "a b c", "en", "srcA"),
        # 2: heavy word repetition
        (2, " ".join(["spam"] * 30 + ["x", "y"]), "en", "srcB"),
        # 3: one dominant bigram, otherwise varied
        (3, " ".join(["p q"] * 12 + [f"u{i}" for i in range(16)]), "fr", "srcB"),
        # 4: single token (no bigrams at all)
        (4, "solo", "de", "srcC"),
        # 5/6: share an 8-token span verbatim
        (5, "one two three four five six seven eight " + " ".join(f"a{i}" for i in range(30)), "en", "srcC"),
        (6, "zz one two three four five six seven eight " + " ".join(f"b{i}" for i in range(30)), "en", "srcC"),
    ]
    return spark.createDataFrame(rows, ["doc_id", "text", "lang", "source"])


def test_gopher_signals(docs):
    out = {r["doc_id"]: r for r in ql.gopher_signals(docs, "doc_id", "text").collect()}
    assert out[0]["keep"] and out[0]["frac_dup_words"] == 0.0
    assert not out[1]["keep"]  # under MIN_TOKENS
    assert not out[2]["keep"] and out[2]["frac_dup_words"] > 0.9
    # doc 3: bigram "q p" appears 11x / 27 bigrams -> frac > 0.08
    assert not out[3]["keep"] and out[3]["top_bigram_frac"] > ql.MAX_TOP_BIGRAM_FRAC
    # no bigrams -> coalesced 0, but fails the length gate
    assert out[4]["top_bigram_frac"] == 0.0 and not out[4]["keep"]


def test_gopher_top_bigram_exact(spark):
    d = spark.createDataFrame([(0, "a b a b c")], ["doc_id", "text"])
    r = ql.gopher_signals(d, "doc_id", "text").collect()[0]
    # bigrams: ab ba ab bc -> top 'a b' count 2 of 4 -> 2*2/4 = 1.0
    assert r["top_bigram_frac"] == 1.0
    assert r["n_tokens"] == 5
    assert r["frac_dup_words"] == pytest.approx(1 - 3 / 5, abs=1e-6)


def test_span_dup_frac(docs):
    out = {r["doc_id"]: r for r in ql.span_dup_frac(docs, "doc_id", "text", n=8).collect()}
    # docs 5/6 share exactly one 8-token span ("one ... eight")
    assert out[5]["n_dup_spans"] == 1 and out[6]["n_dup_spans"] == 1
    assert out[0]["n_dup_spans"] == 0
    assert out[0]["n_spans"] == 40 - 8 + 1
    # doc 2 repeats 'spam'*30: its 8-grams collide with EACH OTHER
    assert out[2]["dup_frac"] > 0.8
    # <n tokens -> no spans -> no row
    assert 4 not in out and 1 not in out


def test_span_dup_frac_hashed_key_same_result(docs):
    plain = ql.span_dup_frac(docs, "doc_id", "text", n=8)
    hashed = ql.span_dup_frac(docs, "doc_id", "text", n=8, key_col=F.xxhash64)
    assert sorted(map(tuple, plain.collect())) == sorted(map(tuple, hashed.collect()))


def test_pii_scrub(spark):
    d = spark.createDataFrame(
        [
            (0, "mail me at bob.smith+x@ex-ample.co.uk or 555-123-4567 ok"),
            (1, "no pii here 12345"),
            (2, "a@b.io c@d.org 111-222-3333 444-555-6666"),
        ],
        ["doc_id", "text"],
    )
    out = {r["doc_id"]: r for r in ql.pii_scrub(d, "doc_id", "text").collect()}
    assert out[0]["n_emails"] == 1 and out[0]["n_phones"] == 1
    assert out[0]["masked_text"] == "mail me at <PII> or <PII> ok"
    assert out[1]["n_emails"] == 0 and out[1]["n_phones"] == 0
    assert out[1]["masked_text"] == "no pii here 12345"
    assert out[2]["n_emails"] == 2 and out[2]["n_phones"] == 2


def test_stratified_sample_deterministic_and_rated(spark):
    rows = [(i, "en" if i % 2 == 0 else "zh") for i in range(2000)]
    d = spark.createDataFrame(rows, ["doc_id", "lang"])
    rates = {"en": 800, "zh": 200}
    s1 = ql.stratified_sample(d, "doc_id", "lang", rates)
    got = s1.groupBy("lang").count().collect()
    by_lang = {r["lang"]: r["count"] for r in got}
    # 1000 per stratum; expect ~800 / ~200 within a loose band
    assert 700 <= by_lang["en"] <= 900
    assert 120 <= by_lang["zh"] <= 280
    # determinism: identical sample at different parallelism
    s2 = ql.stratified_sample(d.repartition(13), "doc_id", "lang", rates)
    assert sorted(map(tuple, s1.collect())) == sorted(map(tuple, s2.collect()))
    # unknown stratum -> dropped
    d2 = spark.createDataFrame([(1, "xx")], ["doc_id", "lang"])
    assert ql.stratified_sample(d2, "doc_id", "lang", rates).count() == 0


def test_source_cap(docs):
    out = ql.source_cap(docs, "doc_id", "text", k=1)
    rows = out.collect()
    groups = {(r["lang"], r["source"]) for r in rows}
    assert len(rows) == len(groups)  # exactly one survivor per group
    assert all(r["rn"] == 1 for r in rows)
    # k larger than any group -> everything survives
    assert ql.source_cap(docs, "doc_id", "text", k=10).count() == docs.count()


def test_source_cap_plans_window_group_limit(docs):
    plan = ql.source_cap(docs, "doc_id", "text", k=1)._jdf.queryExecution().executedPlan().toString()
    assert "WindowGroupLimit" in plan


def test_unigram_logprob_hand_math(spark):
    import math

    docs = spark.createDataFrame(
        [(0, "a a b"), (1, "b c")], "doc_id long, text string"
    )
    got = {r.doc_id: r for r in
           ql.unigram_logprob(docs, "doc_id", "text").collect()}
    # corpus counts: a=2, b=2, c=1, N=5
    exp0 = (2 * math.log(2 / 5) + math.log(2 / 5)) / 3
    exp1 = (math.log(2 / 5) + math.log(1 / 5)) / 2
    assert got[0].n_tokens == 3 and abs(got[0].mean_logprob - exp0) < 1e-6
    assert got[1].n_tokens == 2 and abs(got[1].mean_logprob - exp1) < 1e-6


def test_unigram_logprob_reference_corpus_oov(spark):
    import math

    lm = spark.createDataFrame([(0, "a a b")], "doc_id long, text string")
    docs = spark.createDataFrame([(7, "a z")], "doc_id long, text string")
    (row,) = ql.unigram_logprob(
        docs, "doc_id", "text", lm_docs=lm, alpha=1.0
    ).collect()
    # N=3, V=2: p(a)=(2+1)/(3+2), p(z OOV)=1/(3+2)
    exp = (math.log(3 / 5) + math.log(1 / 5)) / 2
    assert abs(row.mean_logprob - exp) < 1e-6


def test_unigram_logprob_separates_gibberish(spark):
    rows = [(i, "the cat sat on the mat near the door") for i in range(20)]
    rows.append((99, "zxqv wkjr pqmz xvbn qwrt"))
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    got = {r.doc_id: r.mean_logprob for r in
           ql.unigram_logprob(docs, "doc_id", "text").collect()}
    assert got[99] < got[0] - 1.0  # rare-token doc scores far lower
