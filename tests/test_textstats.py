"""Text statistics / quality / language-guess / fingerprint."""

from __future__ import annotations

from pyspark.sql import functions as F

from hiispider_spark.operators import textstats as ts


def _profile(spark, text):
    df = spark.createDataFrame([(1, text)], "doc_id long, text string")
    return ts.document_profile(df, "doc_id", "text").first()


def test_token_and_char_counts(spark):
    p = _profile(spark, "the cat  sat on the mat")
    assert p.n_tokens == 6  # double space → empty token removed
    assert p.n_chars == 23


def test_punct_ratio(spark):
    p = _profile(spark, "ab!?")
    assert p.punct_ratio == 0.5


def test_mean_word_len(spark):
    p = _profile(spark, "ab abcd")  # (2+4)/2
    assert p.mean_word_len == 3.0


def test_stopword_ratio_and_lang_guess(spark):
    p = _profile(spark, "the cat and the dog of it")
    assert p.lang_guess == "en"
    # hits: the, and, the, of, it → 5 of 7 tokens
    assert abs(p.stopword_ratio_en - round(5 / 7, 6)) < 1e-6
    assert _profile(spark, "el que la de y").lang_guess == "es"
    assert _profile(spark, "der und das ist").lang_guess == "de"
    assert _profile(spark, "xyzzy plugh foo").lang_guess == "und"


def test_lang_tie_breaks_by_code_order(spark):
    # 'la' is both es and fr; 'de' is es and fr → equal scores → es wins
    # (earlier in LANG_STOPWORDS order), matching the SQL CASE chain
    p = _profile(spark, "la de")
    assert p.lang_guess == "es"


def test_fingerprint_matches_pure_python(spark):
    text = "spark crawl frontier test"
    p = _profile(spark, text)
    acc = 7
    for w in text.split():
        acc = (acc * ts.FINGERPRINT_MUL + (ord(w[0]) + len(w))) % ts.FINGERPRINT_MOD
    assert p.fingerprint == acc


def test_fingerprint_is_order_sensitive(spark):
    a = _profile(spark, "alpha beta gamma").fingerprint
    b = _profile(spark, "gamma beta alpha").fingerprint
    assert a != b


def test_quality_bounds(spark, tiny_pages):
    prof = ts.document_profile(
        tiny_pages.select(F.col("i").alias("doc_id"), "text"), "doc_id", "text"
    )
    row = prof.agg(
        F.min("quality").alias("lo"), F.max("quality").alias("hi")
    ).first()
    assert 0.0 <= row.lo <= row.hi <= 1.0


def test_script_profile_fractions(spark):
    docs = spark.createDataFrame(
        [
            (0, "hello мир"),          # 5 latin + 3 cyrillic
            (1, "你好世界"),            # 4 cjk
            (2, "12345 !!!"),          # no script chars
            (3, "καλημέρα"),           # greek
        ],
        "doc_id long, text string",
    )
    from hiispider_spark.operators.textstats import script_profile

    got = {r.doc_id: r for r in script_profile(docs, "doc_id", "text").collect()}
    assert got[0].frac_latin == round(5 / 8, 6)
    assert got[0].frac_cyrillic == round(3 / 8, 6)
    assert got[0].main_script == "latin"
    assert got[1].frac_cjk == 1.0 and got[1].main_script == "cjk"
    assert got[2].main_script == "unknown"
    assert got[3].main_script == "greek" and got[3].frac_greek == 1.0


def test_tfidf_topk_hand_math(spark):
    import math

    from hiispider_spark.operators.textstats import tfidf_topk

    docs = spark.createDataFrame(
        [
            (0, "apple apple banana common"),
            (1, "banana cherry common"),
            (2, "common common cherry"),
        ],
        "doc_id long, text string",
    )
    got = {
        (r.doc_id, r.token): r
        for r in tfidf_topk(docs, "doc_id", "text", k=2).collect()
    }
    idf = lambda df_: math.log(4 / (df_ + 1)) + 1  # N=3 → (3+1)/(df+1)
    # doc0: apple tf=2 df=1 → 2*idf(1); banana tf=1 df=2; common tf=1 df=3
    assert abs(got[(0, "apple")].score - round(2 * idf(1), 6)) < 1e-9
    assert got[(0, "apple")].rank == 1
    assert got[(0, "banana")].rank == 2  # banana idf > common idf
    assert (0, "common") not in got  # cut by k=2
    # doc2: common tf=2 beats cherry tf=1? 2*idf(3)=2*ln(1)+2=2.0,
    # cherry idf(2)=ln(4/3)+1≈1.2877 → common first
    assert got[(2, "common")].rank == 1 and got[(2, "cherry")].rank == 2


def test_tfidf_topk_plan_shape(spark):
    from hiispider_spark.operators.textstats import tfidf_topk

    docs = spark.createDataFrame(
        [(0, "a b c")], "doc_id long, text string"
    )
    p = (
        tfidf_topk(docs, "doc_id", "text")
        ._jdf.queryExecution().executedPlan().toString()
    )
    assert "WindowGroupLimit" in p
    assert "ArrowEvalPython" not in p and "BatchEvalPython" not in p
