"""Crawl-trap detection (traps.py)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from hiispider_spark.operators import traps as tr


@pytest.fixture(scope="module")
def urls(spark):
    good = spark.range(0, 120).select(
        F.format_string(
            "http://good%d.example.org/p/%d",
            (F.col("id") % 2).cast("int"),
            F.col("id"),
        ).alias("url")
    )
    cal = spark.range(0, 80).select(
        F.format_string(
            "http://trapa.example.org%s/page",
            F.expr("repeat('/cal/2020', CAST(2 + id % 4 AS INT))"),
        ).alias("url")
    )
    sess = spark.range(0, 60).select(
        F.format_string(
            "http://trapb.example.org/p/%d?a=%d&b=%d&c=%d&d=%d&e=%d",
            *([F.col("id")] * 6),
        ).alias("url")
    )
    tiny = spark.range(0, 10).select(
        F.format_string(
            "http://tiny.example.org%s", F.expr("repeat('/x', 12)")
        ).alias("url")
    )
    return good.unionByName(cal).unionByName(sess).unionByName(tiny)


def test_url_signals(spark):
    d = spark.createDataFrame(
        [
            (0, "http://a.org/cal/2020/cal/2020/page?x=1&y=2"),
            (1, "http://a.org/p/5"),
            (2, "http://a.org"),
        ],
        ["i", "url"],
    )
    out = {r["i"]: r for r in tr.url_trap_signals(d).collect()}
    assert out[0]["depth"] == 5
    assert out[0]["repeat_frac"] == pytest.approx(1 - 3 / 5, abs=1e-6)
    assert out[0]["n_params"] == 2
    assert out[1]["depth"] == 2 and out[1]["repeat_frac"] == 0.0
    assert out[1]["n_params"] == 0
    # bare host: path_col coerces '' -> '/', zero segments
    assert out[2]["depth"] == 0 and out[2]["n_params"] == 0


def test_host_trap_stats(urls):
    stats = {r["host"]: r for r in tr.host_trap_stats(urls).collect()}
    assert not stats["good0.example.org"]["trap"]
    assert not stats["good1.example.org"]["trap"]
    assert stats["trapa.example.org"]["trap"]  # repetition signal
    assert stats["trapa.example.org"]["avg_repeat_frac"] > tr.MAX_AVG_REPEAT_FRAC
    assert stats["trapb.example.org"]["trap"]  # param-count signal
    assert stats["trapb.example.org"]["avg_params"] == 5.0
    # trap-shaped but below the volume floor -> never flagged
    assert not stats["tiny.example.org"]["trap"]
    assert stats["tiny.example.org"]["avg_depth"] == 12.0


def test_epoch_trap_guard(spark):
    """With trap_guard on, a page minting trap-shaped links does not
    grow the frontier; with it off, the same links all enter."""
    import shutil
    import tempfile

    from hiispider_spark.plans.epoch import EpochConfig, bootstrap, run_epoch
    from hiispider_spark.schemas import ROBOTS
    from hiispider_spark.sources.catalog import IcebergLike
    from hiispider_spark.sources.synth import EPOCH0

    trap_links = "".join(
        f'<a href="http://trapa.example.org{"/cal/2020" * (2 + i % 4)}/p{i}">'
        for i in range(30)
    )
    good_links = (
        '<a href="http://fine.example.org/a/1"><a href="http://fine.example.org/a/2">'
    )
    html = f"<html><body>{trap_links}{good_links}hello</body></html>"
    pages = spark.createDataFrame(
        [("http://seed.example.org/p/0", html, "hello", "en")],
        ["url", "html_s", "text", "lang"],
    ).select(
        "url",
        F.lit(EPOCH0).cast("timestamp").alias("warc_ts"),
        F.encode("html_s", "UTF-8").alias("html"),
        "text",
        "lang",
    )
    seeds = spark.createDataFrame(
        [("http://seed.example.org/p/0", 1.0)], ["url", "priority"]
    )
    robots = spark.createDataFrame([], ROBOTS)

    def frontier_size(trap_guard: bool) -> int:
        cfg = EpochConfig(
            k_per_partition=8, n_partitions=8, bloom_m_bits=1 << 14,
            trap_guard=trap_guard, trap_min_urls=20,
        )
        root = tempfile.mkdtemp(prefix="trap_epoch_")
        try:
            cat = IcebergLike(spark, root)
            bootstrap(spark, cat, seeds, cfg)
            st = run_epoch(spark, cat, pages, robots, cfg)
            return st["frontier_size"]
        finally:
            shutil.rmtree(root, ignore_errors=True)

    # guarded: seed + 2 fine-host links (trapa: 30 links ≥ 20, shape bad)
    assert frontier_size(True) == 3
    # unguarded: all 32 discovered links enter
    assert frontier_size(False) == 33


def test_filter_traps(urls):
    stats = tr.host_trap_stats(urls)
    kept = tr.filter_traps(urls, stats)
    hosts = {r["host"] for r in kept.select("host").distinct().collect()}
    assert hosts == {"good0.example.org", "good1.example.org", "tiny.example.org"}
    # broadcast anti-join, not a shuffle of the URL side
    plan = kept._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastHashJoin" in plan and "LeftAnti" in plan
