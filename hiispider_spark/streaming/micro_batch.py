"""Streaming surfaces.

The crawl itself is an epoch micro-batch loop (plans.epoch) — the
Structured-Streaming-style design mandated by BASELINE.json:6; state
lives in tables rather than the streaming state store so it survives
restarts (SURVEY.md §2 disposition, "Streaming-only semantics").

This module adds:
- :func:`stream_events_windowed` — a real Structured Streaming query
  (watermark + tumbling window) over the driver's ``events`` table,
  covering the streaming checklist row; the epoch loop's per-epoch
  lineage aggregation is the batch twin of this window.
- :func:`crawl_url` — the reference's synchronous interface path
  [hs: hiispider/servers/interface.py::InterfaceServer †]: one URL
  through the same extraction code, returned as a Row.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Row, SparkSession
from pyspark.sql import functions as F

from hiispider_spark.functions.canon import canonical_url_col, host_col
from hiispider_spark.functions.siphash import url_hash_udf
from hiispider_spark.operators.extract import text_extract_udf


def stream_events_windowed(
    spark: SparkSession, sf_dir: str, window: str = "1 hour"
) -> DataFrame:
    """Tumbling-window counts over a parquet-backed stream, drained
    synchronously via processAllAvailable (local smoke pattern)."""
    schema = spark.read.parquet(f"{sf_dir}/events.parquet").schema
    events = (
        spark.readStream.schema(schema)
        # file-stream sources want a directory; glob down to events only
        .option("pathGlobFilter", "events.parquet")
        .parquet(sf_dir)
        # driver parquet stores ts as TIMESTAMP_NTZ; watermarks need TIMESTAMP
        .withColumn("ts", F.col("ts").cast("timestamp"))
        .withWatermark("ts", "1 hour")
    )
    agg = (
        events.groupBy(F.window("ts", window), "event_type")
        .agg(F.count("*").alias("n"), F.sum("value").alias("total_value"))
        .select(
            F.col("window.start").alias("win_start"),
            "event_type",
            "n",
            "total_value",
        )
    )
    name = "events_windowed_out"
    q = (
        agg.writeStream.outputMode("complete")
        .format("memory")
        .queryName(name)
        .start()
    )
    try:
        q.processAllAvailable()
    finally:
        q.stop()
    return spark.sql(f"SELECT * FROM {name}")


def crawl_url(spark: SparkSession, pages: DataFrame, url: str) -> Row | None:
    """Synchronous single-URL call (the interface-server path): builds a
    1-row DataFrame and pushes it through the same canonicalize → hash →
    fetch-join → extract pipeline as the epoch batch."""
    one = spark.createDataFrame([(url,)], "url string").select(
        canonical_url_col("url").alias("url")
    )
    hit = one.join(pages, "url", "inner").select(
        "url",
        url_hash_udf(F.col("url")).alias("url_hash"),
        host_col("url").alias("host"),
        text_extract_udf(F.col("html")).alias("text"),
        F.sha1(F.col("html")).alias("content_sha1"),
    )
    rows = hit.collect()
    return rows[0] if rows else None
