"""Host-level negative cache (O-7): dead hosts embargoed early."""

from __future__ import annotations

import shutil
import tempfile

from pyspark.sql import functions as F

from hiispider_spark.operators.negcache import filter_embargoed, next_neg_cache
from hiispider_spark.plans.epoch import EpochConfig, bootstrap, run_epoch
from hiispider_spark.schemas import NEG_CACHE
from hiispider_spark.sources.catalog import IcebergLike

CFG = EpochConfig(
    k_per_partition=64,
    n_partitions=8,
    bloom_m_bits=1 << 17,
    epoch_seconds=60.0,
    neg_cache_fail_threshold=3,
    neg_cache_ttl_s=90.0,  # expires mid-epoch-2 → eligible again epoch 3
)


def test_roll_forward_thresholds(spark):
    empty = spark.createDataFrame([], NEG_CACHE)
    failed = spark.createDataFrame(
        [("dead.org",)] * 4 + [("flaky.org",)] * 2,
        "host string",
    )
    nc = next_neg_cache(empty, failed, "2024-01-01 00:01:00", 3, 90.0)
    rows = {r.host: (str(r.until_ts), r.n_failures) for r in nc.collect()}
    assert "dead.org" in rows and rows["dead.org"][1] == 4
    assert rows["dead.org"][0] == "2024-01-01 00:02:30"  # +90s
    assert "flaky.org" not in rows  # under threshold


def test_filter_embargoed_split(spark):
    sl = spark.createDataFrame(
        [("a.org", "http://a.org/1"), ("b.org", "http://b.org/1")],
        "host string, url string",
    )
    nc = spark.createDataFrame(
        [("a.org", "2024-01-01 00:02:30", 3)],
        "host string, until_ts string, n_failures long",
    ).withColumn("until_ts", F.col("until_ts").cast("timestamp"))
    ok, emb = filter_embargoed(sl, nc, "2024-01-01 00:01:00")
    assert [r.host for r in ok.collect()] == ["b.org"]
    assert [r.host for r in emb.collect()] == ["a.org"]
    # expired entry no longer embargoes
    ok2, emb2 = filter_embargoed(sl, nc, "2024-01-01 00:03:00")
    assert emb2.count() == 0 and ok2.count() == 2


def test_dead_host_embargo_through_epochs(spark, tiny_pages, tiny_seeds, tiny_robots):
    """Seeds on a host with no pages: epoch 1 fails them (→ embargo),
    epoch 2 skips the host entirely (no new errors), epoch 3 (TTL past)
    retries them."""
    dead = spark.createDataFrame(
        [(f"http://dead.example.net/x{i}", 2.0) for i in range(4)],
        "url string, priority double",
    )
    seeds = tiny_seeds.unionByName(dead)
    root = tempfile.mkdtemp(prefix="negcache_")
    cat = IcebergLike(spark, root)
    bootstrap(spark, cat, seeds, CFG)
    errors_per_epoch = []
    for _ in range(3):
        run_epoch(spark, cat, tiny_pages, tiny_robots, CFG)
        n_err = (
            cat.read("lineage")
            .filter(F.col("epoch") == cat.epoch)
            .agg(F.sum("n_errors"))
            .first()[0]
        )
        errors_per_epoch.append(int(n_err or 0))
    # e1: 4 failures → embargo; e2: host skipped (0 errors — individual
    # URLs backed off anyway, but ALSO no other URL of the host ran);
    # e3: ttl 90s expired at 00:02:30 < 00:03:00 → retried, but URL
    # backoff (60*2^1=120s → due 00:03:00) makes them eligible → fail again
    assert errors_per_epoch[0] == 4
    assert errors_per_epoch[1] == 0
    assert errors_per_epoch[2] == 4
    nc = cat.read("neg_cache").collect()
    assert any(r.host == "dead.example.net" for r in nc)
    shutil.rmtree(root, ignore_errors=True)
