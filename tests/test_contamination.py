"""Benchmark decontamination (operators/contamination.py)."""

from pyspark.sql import functions as F

from hiispider_spark.operators import contamination as ct


def _df(spark, rows, schema="doc_id long, text string"):
    return spark.createDataFrame(rows, schema)


TRAIN = [
    (0, "the quick brown fox jumps over the lazy dog tonight"),
    (1, "completely unrelated text with no overlap at all here"),
    (2, "the quick brown fox jumps over something else entirely today"),
]
EVAL = [(100, "quick brown fox jumps over the lazy")]  # 7 tokens


def test_overlap_counts_exact(spark):
    docs = _df(spark, TRAIN)
    ev = _df(spark, EVAL, "eval_id long, text string")
    got = {
        (r.doc_id, r.eval_id): r
        for r in ct.ngram_contamination(docs, ev, n=4).collect()
    }
    # eval has 4 distinct 4-gram shingles; doc0 contains all 4,
    # doc2 shares only 'quick brown fox jumps' + 'brown fox jumps over'
    assert got[(0, 100)].n_shared == 4
    assert got[(0, 100)].eval_ngrams == 4
    assert got[(0, 100)].shared_frac == 1.0
    assert got[(2, 100)].n_shared == 2
    assert (1, 100) not in got  # no shared shingle → no row


def test_distinct_shingles_not_multiset(spark):
    # repeated shingle in the training doc counts once
    docs = _df(spark, [(0, "a b c d a b c d")])
    ev = _df(spark, [(9, "a b c d")], "eval_id long, text string")
    (row,) = ct.ngram_contamination(docs, ev, n=4).collect()
    assert row.n_shared == 1 and row.eval_ngrams == 1


def test_hashed_key_equivalent(spark):
    docs = _df(spark, TRAIN)
    ev = _df(spark, EVAL, "eval_id long, text string")
    plain = ct.ngram_contamination(docs, ev, n=4)
    hashed = ct.ngram_contamination(docs, ev, n=4, key_col=F.xxhash64)
    assert sorted(map(tuple, plain.collect())) == sorted(
        map(tuple, hashed.collect())
    )


def test_decontaminate_flags(spark):
    docs = _df(spark, TRAIN)
    ev = _df(spark, EVAL, "eval_id long, text string")
    got = {r.doc_id: r.contaminated for r in
           ct.decontaminate(docs, ev, n=4).collect()}
    assert got == {0: True, 1: False, 2: True}
    strict = {r.doc_id: r.contaminated for r in
              ct.decontaminate(docs, ev, n=4, min_shared=3).collect()}
    assert strict == {0: True, 1: False, 2: False}


def test_short_eval_doc_no_shingles(spark):
    docs = _df(spark, TRAIN)
    ev = _df(spark, [(5, "too short")], "eval_id long, text string")
    assert ct.ngram_contamination(docs, ev, n=4).count() == 0


def test_broadcast_plan_shape(spark):
    """Default config: the corpus side must NOT shuffle — eval shingles
    broadcast into a BroadcastHashJoin."""
    docs = _df(spark, TRAIN)
    ev = _df(spark, EVAL, "eval_id long, text string")
    plan = (
        ct.ngram_contamination(docs, ev, n=4)
        ._jdf.queryExecution().executedPlan().toString()
    )
    assert "BroadcastHashJoin" in plan
