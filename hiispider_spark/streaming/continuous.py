"""Continuous crawl: the epoch pipeline as a Structured Streaming query.

The reference runs forever off a scheduler loop + AMQP queue
[hs: hiispider/schedulerserver.py †]; ``run_epochs`` (plans/epoch.py)
is the batch-driver equivalent. This module is the Spark-native
always-on form: a streaming query whose every micro-batch trigger
executes one crawl epoch through ``foreachBatch``.

The trigger source is a **rate stream used as a clock** — the stream
carries no work (the frontier table is the queue; that is the whole
design); each tick just fires the next epoch against the shared
catalog. This is the standard shape for "continuous driver over a
transactional table" pipelines.

Effectively-once semantics: ``run_epoch`` commits all state through
IcebergLike's atomic manifest swap, and the epoch counter itself lives
in the manifest. A crash between trigger and commit replays the SAME
epoch computation off the last committed state (deterministic given
the page store), and a duplicate trigger after commit simply computes
the NEXT epoch — the classic foreachBatch + transactional-sink recipe,
no reliance on the rate source's offsets. test_continuous proves the
stream-driven catalog is byte-identical to the batch-loop catalog.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession

from hiispider_spark.plans.epoch import EpochConfig, run_epoch
from hiispider_spark.sources.catalog import IcebergLike


def crawl_stream(
    spark: SparkSession,
    cat: IcebergLike,
    pages: DataFrame,
    robots: DataFrame,
    cfg: EpochConfig = EpochConfig(),
    max_epochs: int | None = None,
    trigger_s: float = 1.0,
):
    """Start the continuous crawl; returns (StreamingQuery, stats).

    ``stats`` is a live list that grows by one epoch-summary dict per
    completed epoch (the driver owns it — foreachBatch runs in the
    driver). ``max_epochs`` turns further triggers into no-ops so
    tests and bounded backfills can drain and stop deterministically;
    production passes None and stops the query to stop the crawl.
    """
    stats: list[dict] = []

    def one_epoch(_batch: DataFrame, _batch_id: int) -> None:
        if max_epochs is not None and len(stats) >= max_epochs:
            return
        try:
            stats.append(run_epoch(spark, cat, pages, robots, cfg))
        except BaseException:
            # a failed epoch must not leave its staged appends behind:
            # IcebergLike._staged survives in-process, so a retry (or
            # the next trigger) would commit the dead attempt's files
            # alongside its own, duplicating extracted/lineage rows.
            # Crash-replay across PROCESS restarts already discards
            # staged state; this extends the guarantee within-process.
            cat.rollback_staged()
            raise

    query = (
        spark.readStream.format("rate")
        .option("rowsPerSecond", 1)
        .load()
        .writeStream.foreachBatch(one_epoch)
        .trigger(processingTime=f"{trigger_s} seconds")
        .option(
            "checkpointLocation", os.path.join(cat.root, "_stream_ckpt")
        )
        .queryName("crawl_stream")
        .start()
    )
    return query, stats
