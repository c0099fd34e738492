"""Adaptive recrawl inside the epoch loop: page_cache change counters
roll forward and reschedule fetches at clamp(1/λ̂)."""

from __future__ import annotations

import math
import shutil
import tempfile
from datetime import datetime

import pytest
from pyspark.sql import functions as F

from hiispider_spark.plans.epoch import EpochConfig, bootstrap, run_epoch
from hiispider_spark.sources.catalog import IcebergLike

N = 12  # pages; half change between epoch 1 and 2
HOST = "h0000.example.org"


def _pages(spark, version):
    rows = []
    for i in range(N):
        # even pages change every version; odd pages never do
        body = f"page {i} v{version if i % 2 == 0 else 0}"
        rows.append(
            (
                f"http://{HOST}/p/{i}",
                datetime(2024, 1, 1),
                f"<html><body>{body}</body></html>".encode(),
                body,
                "en",
            )
        )
    return spark.createDataFrame(
        rows, "url string, warc_ts timestamp, html binary, text string, lang string"
    )


@pytest.fixture(scope="module")
def driven(spark):
    seeds = spark.createDataFrame(
        [(f"http://{HOST}/p/{i}", 1.0) for i in range(N)],
        "url string, priority double",
    )
    robots = spark.createDataFrame(
        [(HOST, [(True, "/")], 0.1)],
        "host string, rules array<struct<allow:boolean,prefix:string>>, crawl_delay double",
    )
    cfg = EpochConfig(
        k_per_partition=64,
        n_partitions=8,
        bloom_m_bits=1 << 17,
        interval_s=60,  # first requeue lands due exactly next epoch
        epoch_seconds=60.0,
        follow_links=False,
        adaptive_recrawl=True,
        recrawl_min_s=60.0,
        recrawl_max_s=86400.0,
    )
    root = tempfile.mkdtemp(prefix="adaptive_")
    cat = IcebergLike(spark, root)
    bootstrap(spark, cat, seeds, cfg)
    run_epoch(spark, cat, _pages(spark, 1), robots, cfg)  # 00:01
    run_epoch(spark, cat, _pages(spark, 2), robots, cfg)  # 00:02
    cache = {
        r.url_hash: r for r in cat.read("page_cache").collect()
    }
    frontier = {r.url: r for r in cat.read("frontier").collect()}
    yield cache, frontier
    shutil.rmtree(root, ignore_errors=True)


def test_counters_roll_forward(driven):
    cache, frontier = driven
    assert len(cache) == N
    for url, row in frontier.items():
        c = cache[row.url_hash]
        i = int(url.rsplit("/", 1)[1])
        assert c.n_polls == 2
        assert c.n_changes == (1 if i % 2 == 0 else 0)
        assert str(c.first_fetch_ts) == "2024-01-01 00:01:00"


def test_changed_pages_rescheduled_sooner(driven):
    cache, frontier = driven
    # epoch-2 ts = 00:02:00; gap = 60 s, n=2
    lam_changed = -math.log((2 - 1 + 0.5) / 2.5) / 60.0
    want_changed = datetime(2024, 1, 1, 0, 2) + __import__(
        "datetime"
    ).timedelta(seconds=math.floor(1.0 / lam_changed))
    want_static = datetime(2024, 1, 1, 0, 2) + __import__(
        "datetime"
    ).timedelta(seconds=86400)
    for url, row in frontier.items():
        i = int(url.rsplit("/", 1)[1])
        if i % 2 == 0:
            assert row.next_fetch_ts == want_changed, url
        else:
            assert row.next_fetch_ts == want_static, url
    assert want_changed < want_static


def test_default_off_keeps_fixed_interval(spark):
    seeds = spark.createDataFrame(
        [(f"http://{HOST}/p/{i}", 1.0) for i in range(4)],
        "url string, priority double",
    )
    robots = spark.createDataFrame(
        [(HOST, [(True, "/")], 0.1)],
        "host string, rules array<struct<allow:boolean,prefix:string>>, crawl_delay double",
    )
    cfg = EpochConfig(
        k_per_partition=64, n_partitions=8, bloom_m_bits=1 << 17,
        interval_s=60, follow_links=False,
    )
    root = tempfile.mkdtemp(prefix="adaptive_off_")
    cat = IcebergLike(spark, root)
    bootstrap(spark, cat, seeds, cfg)
    run_epoch(spark, cat, _pages(spark, 1), robots, cfg)
    got = {str(r.next_fetch_ts) for r in cat.read("frontier").collect()}
    assert got == {"2024-01-01 00:02:00"}  # epoch ts + fixed 60 s
    shutil.rmtree(root, ignore_errors=True)
