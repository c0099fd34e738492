"""applyInPandasWithState politeness — streaming twin of the batch
token buckets (same grant arithmetic, state in the streaming store)."""

from __future__ import annotations

import os
import shutil
import tempfile

import pandas as pd
import pytest
from pyspark.sql import functions as F

from hiispider_spark.streaming.stateful import (
    INPUT_FIELDS,
    politeness_bucket_fn,
    stream_politeness,
)


class _FakeState:
    def __init__(self):
        self._v = None

    @property
    def exists(self):
        return self._v is not None

    @property
    def get(self):
        return self._v

    def update(self, v):
        self._v = v


def _batch(host, n, delay, ts):
    return pd.DataFrame(
        {
            "host": [host] * n,
            "url": [f"http://{host}/p/{i}" for i in range(n)],
            "priority": [1.0 + (i % 5) / 10 for i in range(n)],
            "crawl_delay": [delay] * n,
            "batch_ts": [pd.Timestamp(ts)] * n,
        }
    )


def test_bucket_fn_budget_and_carry():
    state = _FakeState()
    # delay=2.0 → cap=30; 50 candidates → grant 30
    out1 = list(
        politeness_bucket_fn(("h",), [_batch("h", 50, 2.0, "2024-01-01 00:01:00")], state)
    )
    assert sum(len(p) for p in out1) == 30
    tokens, last = state.get
    assert tokens == 0.0
    # next batch 60s later: refill 30 tokens → grant 30 again
    out2 = list(
        politeness_bucket_fn(("h",), [_batch("h", 50, 2.0, "2024-01-01 00:02:00")], state)
    )
    assert sum(len(p) for p in out2) == 30


def test_bucket_fn_slow_host_alternates():
    state = _FakeState()
    ts = ["2024-01-01 00:01:00", "2024-01-01 00:02:00", "2024-01-01 00:03:00"]
    grants = []
    for t in ts:
        out = list(politeness_bucket_fn(("s",), [_batch("s", 3, 90.0, t)], state))
        grants.append(sum(len(p) for p in out))
    assert grants == [1, 0, 1]  # cap clamps to 1; 60/90 refill alternates


def test_bucket_fn_grant_order_matches_batch_operator():
    state = _FakeState()
    pdf = _batch("h", 10, 30.0, "2024-01-01 00:01:00")  # cap=2 → grant 2
    out = list(politeness_bucket_fn(("h",), [pdf], state))[0]
    expected = pdf.sort_values(["priority", "url"], ascending=[False, True]).head(2)
    assert list(out["url"]) == list(expected["url"])


def test_streaming_query_end_to_end(spark):
    """Drive the operator through a real Structured Streaming query
    (file source → applyInPandasWithState → memory sink)."""
    src = tempfile.mkdtemp(prefix="statstream_")
    try:
        pdf = pd.concat(
            [
                _batch("a.example", 40, 2.0, "2024-01-01 00:01:00"),
                _batch("b.example", 5, 1.0, "2024-01-01 00:01:00"),
            ]
        )
        spark.createDataFrame(pdf).coalesce(1).write.mode("overwrite").parquet(
            f"{src}/in"
        )
        schema = spark.read.parquet(f"{src}/in").schema
        stream = (
            spark.readStream.schema(schema)
            .parquet(f"{src}/in")
            .withColumn("batch_ts", F.col("batch_ts").cast("timestamp"))
            .select(*INPUT_FIELDS)
        )
        out = stream_politeness(stream)
        q = (
            out.writeStream.outputMode("append")
            .format("memory")
            .queryName("politeness_out")
            .option("checkpointLocation", f"{src}/ckpt")
            .start()
        )
        try:
            q.processAllAvailable()
        finally:
            q.stop()
        got = spark.sql(
            "SELECT host, count(*) n FROM politeness_out GROUP BY host"
        ).collect()
        by_host = {r.host: r.n for r in got}
        assert by_host["a.example"] == 30  # cap 60/2
        assert by_host["b.example"] == 5  # under budget → all granted
    finally:
        shutil.rmtree(src, ignore_errors=True)
