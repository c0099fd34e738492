"""Frontier build / dequeue determinism / requeue arithmetic."""

from __future__ import annotations

from pyspark.sql import functions as F

from hiispider_spark.operators.frontier import (
    build_frontier,
    dequeue_topk,
    merge_new_urls,
    requeue_failed,
    requeue_fetched,
)
from hiispider_spark.sources.synth import EPOCH0


def test_build_dedups_noncanonical_variants(spark, tiny_seeds):
    fr = build_frontier(tiny_seeds, n_partitions=8)
    # 400-page corpus: 40 spread (i%10==3) + 16 hot (i%25==0) canonical
    # seeds, plus 4 non-canonical variants collapsing into existing ones
    assert fr.count() == 56
    assert fr.filter(F.col("url").contains("HTTP")).count() == 0
    assert fr.filter(F.col("url").contains(":80")).count() == 0
    # the variant targets kept the canonical (higher) priority
    assert fr.filter(F.col("priority") < 1.0).count() == 0
    # identity + partitioning are total functions of the url
    assert fr.select("url_hash").distinct().count() == 56
    assert fr.filter(
        (F.col("part_id") < 0) | (F.col("part_id") >= 8)
    ).count() == 0


def test_dequeue_order_is_partition_count_invariant(spark, tiny_seeds):
    """The north-rule ordering guarantee: dequeue output is a pure
    function of table state, not of physical parallelism."""
    fr = build_frontier(tiny_seeds, n_partitions=8)
    ts = "2024-01-01 00:01:00"

    def run(df):
        out = dequeue_topk(df, ts, 3)
        return sorted(
            (r.part_id, r.priority, r.url_hash) for r in out.collect()
        )

    a = run(fr.repartition(2))
    b = run(fr.repartition(17))
    c = run(fr.coalesce(1))
    assert a == b == c
    # and ranking within a bucket is by priority desc
    out = dequeue_topk(fr, ts, 3)
    per_part = (
        out.groupBy("part_id").agg(F.min("priority").alias("mn")).collect()
    )
    due = fr
    for row in per_part:
        above = due.filter(
            (F.col("part_id") == row.part_id) & (F.col("priority") > row.mn)
        ).count()
        assert above <= 3


def test_dequeue_respects_due_time(spark, tiny_seeds):
    fr = build_frontier(tiny_seeds, n_partitions=8)
    future = fr.withColumn(
        "next_fetch_ts", F.lit("2024-06-01 00:00:00").cast("timestamp")
    )
    assert dequeue_topk(future, "2024-01-01 00:01:00", 10).count() == 0
    assert dequeue_topk(fr, EPOCH0, 10).count() > 0


def test_requeue_arithmetic(spark, tiny_seeds):
    fr = build_frontier(tiny_seeds, n_partitions=8).limit(5)
    ts = "2024-01-01 00:01:00"
    rq = requeue_fetched(fr, ts).collect()
    for r in rq:
        assert str(r.next_fetch_ts) == "2024-01-01 01:01:00"  # +3600s
        assert r.retry_count == 0
    bk = requeue_failed(fr, ts).collect()
    for r in bk:
        assert r.retry_count == 1
        assert str(r.next_fetch_ts) == "2024-01-01 00:03:00"  # +60*2^1
    # 5th failure retires the entry
    tired = fr.withColumn("retry_count", F.lit(4))
    assert all(r.state == "failed" for r in requeue_failed(tired, ts).collect())


def test_merge_new_urls_is_idempotent(spark, tiny_seeds):
    fr = build_frontier(tiny_seeds, n_partitions=8)
    new = spark.createDataFrame(
        [("http://h0001.example.org/new/1",), (fr.first().url,)], "url string"
    )
    merged = merge_new_urls(fr, new, "2024-01-01 00:01:00", 8)
    assert merged.count() == fr.count() + 1
    again = merge_new_urls(merged, new, "2024-01-01 00:02:00", 8)
    assert again.count() == merged.count()


def test_boot_stagger_spreads_first_fetch(spark, tiny_seeds):


    fr = build_frontier(tiny_seeds, n_partitions=8, stagger_s=3600)
    stats = fr.select(
        F.min("next_fetch_ts").alias("lo"),
        F.max("next_fetch_ts").alias("hi"),
        F.countDistinct("next_fetch_ts").alias("n_distinct"),
    ).first()
    import datetime as dt

    t0 = dt.datetime.fromisoformat(EPOCH0)
    assert stats.lo >= t0
    assert stats.hi < t0 + dt.timedelta(seconds=3600)
    # spread, not a herd: many distinct offsets across the seed list
    assert stats.n_distinct > fr.count() * 0.5
    # deterministic: same seed -> same schedule
    again = build_frontier(tiny_seeds, n_partitions=8, stagger_s=3600)
    assert fr.select("url", "next_fetch_ts").exceptAll(
        again.select("url", "next_fetch_ts")
    ).count() == 0


def test_dequeue_aging_rescues_starved_rows(spark):
    """aging_weight promotes long-overdue low-priority rows past fresh
    high-priority ones; weight=0 preserves the static order, and the
    aged window still plans as WindowGroupLimit."""
    from hiispider_spark.operators.frontier import dequeue_topk

    rows = [
        # (url, url_hash, part, priority, overdue_days)
        ("http://a/fresh-hi", 1, 0, 2.0, 0),
        ("http://a/fresh-mid", 2, 0, 1.5, 0),
        ("http://a/starved-lo", 3, 0, 0.5, 10),  # 10 days past due
    ]
    fr = spark.createDataFrame(
        [
            (u, h, p, pr, f"2024-01-{11 - od:02d} 00:00:00")
            for u, h, p, pr, od in rows
        ],
        "url string, url_hash long, part_id int, priority double, ts string",
    ).select(
        "url", "url_hash", "part_id", "priority",
        F.col("ts").cast("timestamp").alias("next_fetch_ts"),
        F.lit("pending").alias("state"),
    )
    ts = "2024-01-11 00:00:00"
    static = [r.url for r in dequeue_topk(fr, ts, 2).collect()]
    assert static == ["http://a/fresh-hi", "http://a/fresh-mid"]
    aged = dequeue_topk(fr, ts, 2, aging_weight=0.2)
    got = [r.url for r in aged.collect()]
    # starved row gains 0.2*10 = 2.0 → effective 2.5 tops the bucket
    assert got[0] == "http://a/starved-lo" and "http://a/fresh-hi" in got
    plan = aged._jdf.queryExecution().executedPlan().toString()
    assert "WindowGroupLimit" in plan
