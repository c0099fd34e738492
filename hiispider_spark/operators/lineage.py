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

    Each input aggregates independently (partial aggregation map-side),
    then the tiny per-partition summaries full-outer-join — never a
    shuffle of row-level data. ``fetched`` carries a precomputed
    ``html_len`` column (the epoch's narrow fetch-metadata cache) so
    this aggregation never touches the html-bearing wide rows.
    """

    def per_part(df: DataFrame, col: str, extra=None) -> DataFrame:
        aggs = [F.count("*").alias(col)]
        if extra is not None:
            aggs.append(extra)
        return df.groupBy("part_id").agg(*aggs)

    d = per_part(dequeued, "n_dequeued")
    f = per_part(fetched, "n_fetched", F.sum("html_len").alias("bytes"))
    e = per_part(extracted_with_part, "n_extracted")
    x = per_part(failed, "n_errors")

    out = (
        d.join(f, "part_id", "full_outer")
        .join(e, "part_id", "full_outer")
        .join(x, "part_id", "full_outer")
    )
    zero = lambda c: F.coalesce(F.col(c), F.lit(0)).cast("long")  # noqa: E731
    return out.select(
        F.lit(epoch).cast("long").alias("epoch"),
        F.col("part_id").alias("partition_id"),
        zero("n_dequeued").alias("n_dequeued"),
        zero("n_fetched").alias("n_fetched"),
        zero("n_extracted").alias("n_extracted"),
        zero("n_errors").alias("n_errors"),
        zero("bytes").alias("bytes"),
        F.lit(epoch_ts).cast("timestamp").alias("t_start"),
        F.lit(epoch_ts).cast("timestamp").alias("t_end"),
    )
