"""Streaming surfaces: windowed events stream + synchronous crawl_url."""

from __future__ import annotations

from pyspark.sql import functions as F

from hiispider_spark.streaming.micro_batch import crawl_url, stream_events_windowed

SF_DIR = "/root/testdata/sf0.001"


def test_stream_matches_batch_aggregation(spark):
    got = stream_events_windowed(spark, SF_DIR)
    batch = (
        spark.read.parquet(f"{SF_DIR}/events.parquet")
        .withColumn("ts", F.col("ts").cast("timestamp"))
        .groupBy(F.date_trunc("hour", "ts").alias("win_start"), "event_type")
        .agg(F.count("*").alias("n"), F.sum("value").alias("total_value"))
    )
    a = sorted(
        (str(r.win_start), r.event_type, r.n, round(r.total_value, 6))
        for r in got.collect()
    )
    b = sorted(
        (str(r.win_start), r.event_type, r.n, round(r.total_value, 6))
        for r in batch.collect()
    )
    assert a == b


def test_crawl_url_canonicalizes_and_extracts(spark, tiny_pages):
    row = crawl_url(spark, tiny_pages, "HTTP://H0000.EXAMPLE.ORG:80/p/0#frag")
    assert row is not None
    assert row.url == "http://h0000.example.org/p/0"
    assert row.host == "h0000.example.org"
    expected = tiny_pages.filter("i = 0").first().text
    assert row.text == expected
    assert len(row.content_sha1) == 40


def test_crawl_url_miss_returns_none(spark, tiny_pages):
    assert crawl_url(spark, tiny_pages, "http://nosuch.example.org/x") is None
