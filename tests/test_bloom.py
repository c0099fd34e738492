"""Bloom seen-set: no false negatives, treeAggregate union, exactness."""

from __future__ import annotations

import numpy as np
from pyspark.sql import functions as F

from hiispider_spark.operators import seen

M = 1 << 17  # 128 Kbit for tests
K = 7


def _hashes(n, seed=0):
    rng = np.random.default_rng(seed)
    return rng.integers(-(2**63), 2**63 - 1, size=n, dtype=np.int64)


def test_insert_contains_no_false_negatives():
    bloom = np.zeros(M // 8, dtype=np.uint8)
    h = _hashes(5000)
    seen._insert(bloom, h, M, K)
    assert seen._contains(bloom, h, M, K).all()


def test_fpp_within_2x_estimate():
    bloom = np.zeros(M // 8, dtype=np.uint8)
    h = _hashes(5000, seed=1)
    seen._insert(bloom, h, M, K)
    probe = _hashes(20000, seed=2)
    fp = seen._contains(bloom, probe, M, K).mean()
    est = seen.estimated_fpp(5000, M, K)
    assert fp <= max(2 * est, 0.01)


def test_partition_blooms_and_tree_union(spark):
    n = 4000
    df = spark.range(n).select(
        (F.col("id") % 8).cast("int").alias("part_id"),
        F.xxhash64("id").alias("url_hash"),
    )
    blooms = seen.build_partition_blooms(df, M, K)
    assert blooms.count() == 8
    unioned = seen.union_blooms_tree(blooms, M)
    # union must contain every inserted key (no false negatives survive OR)
    h = np.array([r.url_hash for r in df.collect()], dtype=np.int64)
    bl = np.frombuffer(unioned, dtype=np.uint8)
    assert seen._contains(bl, h, M, K).all()
    # and equals the filter built by inserting everything directly
    direct = np.zeros(M // 8, dtype=np.uint8)
    seen._insert(direct, h, M, K)
    assert bytes(direct) == unioned


def test_filter_unseen_exactness(spark):
    all_urls = spark.range(1000).select(F.xxhash64("id").alias("url_hash"))
    seen_exact = all_urls.filter(F.col("url_hash") % 2 == 0)
    blooms = seen.build_partition_blooms(
        seen_exact.withColumn("part_id", F.lit(0)), M, K
    )
    bloom_bytes = seen.union_blooms_tree(blooms, M)
    got = seen.filter_unseen(all_urls, seen_exact, spark, bloom_bytes, M, K)
    expected = all_urls.join(seen_exact, "url_hash", "left_anti")
    assert sorted(r.url_hash for r in got.collect()) == sorted(
        r.url_hash for r in expected.collect()
    )
