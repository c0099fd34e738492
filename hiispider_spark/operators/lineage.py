"""Per-partition per-epoch lineage/metrics (SURVEY.md §2 O-23).

The reference keeps per-function counters and timers in a stats
component and job history in Redis [hs: hiispider/components/stats.py
(?) †, hs: hiispider/components/jobhistory.py (?) †]. BASELINE.json:14
requires "per-partition lineage + metrics"; each epoch appends one row
per frontier bucket to the ``lineage`` table — a map-side-combinable
hash aggregation, the cheapest shape Spark has.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def build_lineage(
    dequeued: DataFrame,
    fetched: DataFrame,
    extracted_with_part: DataFrame,
    failed: DataFrame,
    epoch: int,
    epoch_ts: str,
) -> DataFrame:
    """One row per part_id: dequeue/fetch/extract/error counts + bytes.

    ONE tagged union + ONE hash aggregation (map-side combinable): the
    four inputs project to (part_id, kind, bytes) slivers — all read
    from the epoch's persisted slim frames, never the html-bearing wide
    rows (``fetched`` carries a precomputed ``html_len``) — and a
    single groupBy counts each kind conditionally. The previous shape
    (4 independent aggs + 3 full-outer joins) carried ~4× the stage
    count and plan-build for identical output: a part_id present in
    any input appears either way, and missing kinds count 0.
    """
    _null_b = F.lit(None).cast("long")

    def tag(df: DataFrame, kind: str, bytes_col=None) -> DataFrame:
        return df.select(
            "part_id",
            F.lit(kind).alias("_k"),
            (bytes_col if bytes_col is not None else _null_b).alias("_b"),
        )

    u = (
        tag(dequeued, "d")
        .unionByName(tag(fetched, "f", F.col("html_len").cast("long")))
        .unionByName(tag(extracted_with_part, "e"))
        .unionByName(tag(failed, "x"))
    )
    cnt = lambda k: F.count_if(F.col("_k") == k).cast("long")  # noqa: E731
    return u.groupBy("part_id").agg(
        F.lit(epoch).cast("long").alias("epoch"),
        cnt("d").alias("n_dequeued"),
        cnt("f").alias("n_fetched"),
        cnt("e").alias("n_extracted"),
        cnt("x").alias("n_errors"),
        F.coalesce(F.sum("_b"), F.lit(0)).cast("long").alias("bytes"),
        F.lit(epoch_ts).cast("timestamp").alias("t_start"),
        F.lit(epoch_ts).cast("timestamp").alias("t_end"),
    ).select(
        "epoch",
        F.col("part_id").alias("partition_id"),
        "n_dequeued", "n_fetched", "n_extracted", "n_errors",
        "bytes", "t_start", "t_end",
    )
