"""Stateful streaming politeness: crawl-delay token buckets as an
``applyInPandasWithState`` operator.

The batch engine keeps politeness state in a table (read-modify-write
per epoch) because storage-backed state survives restarts — that is the
resumable authority (SURVEY.md §2 "Streaming-only semantics"). This
module provides the *streaming-native* twin for deployments that feed
the frontier through Structured Streaming: per-host token buckets kept
in the streaming state store, same grant arithmetic as
operators/politeness.py (shared constants), emitting granted rows in
append mode.

Semantics per micro-batch and host:
    tokens = min(cap, tokens_prev + elapsed / crawl_delay)
    grant the top floor(tokens) rows by (priority DESC, url ASC)
    state' = (tokens - granted, batch_ts)

The two implementations are asserted equivalent in
tests/test_stateful_streaming.py (same input → same grant set).
"""

from __future__ import annotations

from collections.abc import Iterable, Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout
from pyspark.sql import types as T

from hiispider_spark.sources.synth import EPOCH_SECONDS

OUTPUT_SCHEMA = T.StructType(
    [
        T.StructField("host", T.StringType(), False),
        T.StructField("url", T.StringType(), False),
        T.StructField("priority", T.DoubleType(), False),
        T.StructField("batch_ts", T.TimestampType(), False),
    ]
)

STATE_SCHEMA = T.StructType(
    [
        T.StructField("tokens", T.DoubleType(), False),
        T.StructField("last_refill_unix", T.DoubleType(), False),
    ]
)

INPUT_FIELDS = ["host", "url", "priority", "crawl_delay", "batch_ts"]


def politeness_bucket_fn(
    key: tuple,
    pdfs: Iterable[pd.DataFrame],
    state: GroupState,
    epoch_seconds: float = EPOCH_SECONDS,
) -> Iterator[pd.DataFrame]:
    """Grouped-map-with-state function: one call per (host,) per batch.

    ``epoch_seconds`` is the shared batch-engine constant (the grant
    arithmetic the equivalence test asserts) — never a local literal.
    """
    pdf = pd.concat(list(pdfs), ignore_index=True)
    if pdf.empty:  # timeout-only invocation
        return
    delay = float(pdf["crawl_delay"].iloc[0])
    batch_ts = pdf["batch_ts"].max()
    cap = max(1.0, epoch_seconds / max(delay, 1e-9))
    if state.exists:
        tokens_prev, last_unix = state.get
        elapsed = batch_ts.timestamp() - last_unix
        tokens = min(cap, tokens_prev + max(elapsed, 0.0) / max(delay, 1e-9))
    else:
        tokens = cap
    budget = int(np.floor(tokens))
    pdf = pdf.sort_values(["priority", "url"], ascending=[False, True],
                          kind="mergesort")
    granted = pdf.head(budget)
    state.update((tokens - float(len(granted)), batch_ts.timestamp()))
    if len(granted):
        yield granted[["host", "url", "priority", "batch_ts"]]


def stream_politeness(
    requests: DataFrame, epoch_seconds: float = EPOCH_SECONDS
) -> DataFrame:
    """Wire the stateful operator onto a streaming DataFrame with
    columns INPUT_FIELDS. Returns the granted stream (append mode)."""

    def fn(key, pdfs, state):
        return politeness_bucket_fn(key, pdfs, state, epoch_seconds)

    return (
        requests.groupBy("host")
        .applyInPandasWithState(
            fn,
            outputStructType=OUTPUT_SCHEMA,
            stateStructType=STATE_SCHEMA,
            outputMode="append",
            timeoutConf=GroupStateTimeout.NoTimeout,
        )
    )
