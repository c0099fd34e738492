"""Cuckoo filter (operators/cuckoo.py): no false negatives, low fpp,
deletion, determinism, and the Spark partition/force-recrawl layer."""

from __future__ import annotations

import numpy as np
import pytest
from pyspark.sql import functions as F

from hiispider_spark.operators import cuckoo as ck


def _keys(n, seed=1):
    rng = np.random.RandomState(seed)
    return rng.randint(0, 2**63 - 1, size=n, dtype=np.int64).view(np.uint64)


def test_no_false_negatives_and_low_fpp():
    table = ck.empty_filter(1 << 12)  # 16384 slots
    keys = np.unique(_keys(12000))  # load ~0.73
    assert ck.insert(table, keys) == 0
    assert bool(ck.contains(table, keys).all())
    probe = np.unique(_keys(20000, seed=9))
    fresh = probe[~np.isin(probe, keys)]
    fpp = ck.contains(table, fresh).mean()
    # b=4, f=16 → theoretical fpp ≈ 8/2^16 ≈ 0.00012
    assert fpp < 0.01, fpp


def test_delete_removes_membership_only_for_deleted():
    table = ck.empty_filter(1 << 10)
    keys = np.unique(_keys(2000, seed=3))
    assert ck.insert(table, keys) == 0
    gone, kept = keys[:500], keys[500:]
    assert ck.delete(table, gone) == 0
    assert bool(ck.contains(table, kept).all())  # no false negatives
    # deleted keys may only survive as other keys' fp collisions
    assert ck.contains(table, gone).mean() < 0.01


def test_deterministic_build():
    keys = _keys(5000, seed=7)
    t1, t2 = ck.empty_filter(1 << 11), ck.empty_filter(1 << 11)
    ck.insert(t1, keys)
    ck.insert(t2, keys)
    assert np.array_equal(t1, t2)


def test_overfull_reports_failures():
    table = ck.empty_filter(1 << 4)  # 64 slots
    failed = ck.insert(table, np.unique(_keys(200, seed=5)))
    assert failed > 0  # cannot fit 200 keys in 64 slots


def test_power_of_two_enforced():
    with pytest.raises(ValueError):
        ck.empty_filter(1000)


def test_partition_build_probe_delete_roundtrip(spark):
    n_buckets = 1 << 10
    rows = [(int(h) % 4, int(np.int64(h))) for h in _keys(4000, seed=11)]
    hashed = spark.createDataFrame(rows, "part_id int, url_hash long")
    filters = {
        r.part_id: bytes(r.cuckoo)
        for r in ck.build_partition_filters(hashed, n_buckets).collect()
    }
    assert set(filters) == {0, 1, 2, 3}

    # membership via the Arrow probe column, partition 0
    p0 = hashed.filter("part_id = 0")
    got = p0.withColumn(
        "hit", ck.might_contain_col(filters[0], n_buckets)
    )
    assert got.filter(~F.col("hit")).count() == 0  # no false negatives

    # force-recrawl: delete half of partition 0's keys; partitions 1-3
    # must come back byte-identical
    dels = p0.limit(500).select("part_id", "url_hash")
    fdf = spark.createDataFrame(
        [(p, b) for p, b in filters.items()], ck.FILTER_SCHEMA
    )
    after = {
        r.part_id: bytes(r.cuckoo)
        for r in ck.apply_deletions(fdf, dels, n_buckets).collect()
    }
    assert set(after) == {0, 1, 2, 3}
    for p in (1, 2, 3):
        assert after[p] == filters[p]
    table = np.frombuffer(after[0], dtype=np.uint16).reshape(n_buckets, ck.SLOTS)
    deleted = np.array(
        [r.url_hash for r in dels.collect()], dtype=np.int64
    ).view(np.uint64)
    remaining = np.array(
        [r.url_hash for r in p0.join(dels, "url_hash", "left_anti").collect()],
        dtype=np.int64,
    ).view(np.uint64)
    assert bool(ck.contains(table, remaining).all())
    assert ck.contains(table, deleted).mean() < 0.05
