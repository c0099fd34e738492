"""Measure what the frontier's time layout (catalog.SORT_COLS) buys
the dequeue scan.

The dequeue reads every bucket with ``next_fetch_ts <= epoch_ts``
pushed to the parquet scan. A mature frontier is mostly FUTURE rows
(intervals run minutes→a week; the due slice per epoch is a few
percent), so almost all bytes are skippable — IF row-group min/max
stats can see it. Unsorted buckets interleave due and future rows, so
every row group straddles the predicate and nothing prunes; sorting
each bucket by next_fetch_ts at write time makes the not-yet-due tail
prunable at the footer.

This probe writes the SAME synthetic aged frontier both ways (same
bucket task layout the catalog uses, small parquet.block.size so
sandbox-sized buckets still carry multiple row groups), then reports,
straight from parquet footers, how many row groups and compressed
bytes a ``next_fetch_ts <= t`` reader must open under each layout —
plus Spark wall for the filtered count and the PushedFilters line
proving the predicate reaches the scan. Appends a summary row to
BENCH/BASELINE.md.

Usage: python tools/frontier_layout_probe.py [n_rows] [due_frac]
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

N_ROWS = int(sys.argv[1]) if len(sys.argv) > 1 else 4_000_000
DUE_FRAC = float(sys.argv[2]) if len(sys.argv) > 2 else 0.05
P = 32
EPOCH_TS = "2024-01-08 00:00:00"


def _synth_frontier(spark):
    """Aged-frontier shape: DUE_FRAC of rows are due at EPOCH_TS, the
    rest are scheduled up to a week out — deterministic, shuffled in
    storage order (hash-ordered ids) like a real accumulated table."""
    from pyspark.sql import functions as F

    due_cut = int(DUE_FRAC * 604_800 / (1 - DUE_FRAC))
    return (
        spark.range(N_ROWS, numPartitions=P * 4)
        .select(
            F.xxhash64("id").alias("url_hash"),
            F.format_string("http://h%04d.example.org/p/%d", (F.col("id") % 9973).cast("int"), F.col("id")).alias("url"),
            (F.xxhash64("id", F.lit(1)) % P).cast("int").alias("raw_pid"),
            ((F.abs(F.xxhash64("id", F.lit(2))) % 1000) / 1000.0).alias("priority"),
            # offset ∈ [-due_cut, +604800): negative = overdue
            (F.abs(F.xxhash64("id", F.lit(3))) % (604_800 + due_cut) - due_cut).alias("off_s"),
            F.lit("pending").alias("state"),
        )
        .select(
            "url_hash", "url",
            F.abs(F.col("raw_pid")).alias("part_id"),
            "priority",
            (F.lit(EPOCH_TS).cast("timestamp") + F.make_interval(secs=F.col("off_s").cast("double"))).alias("next_fetch_ts"),
            "state",
        )
    )


def _write(df, absdir: str, sort: bool):
    """The catalog's partition-level write shape (stage_overwrite_parts)
    with/without the SORT_COLS per-bucket sort."""
    from pyspark.sql import functions as F

    out = df.repartition(P, F.col("part_id")).withColumn(
        "_pid", F.col("part_id")
    )
    if sort:
        # sort on _pid itself (not its part_id twin): the partitionBy
        # writer requires ordering by partition columns and would
        # otherwise insert its own UNSTABLE sort on _pid, destroying
        # the within-bucket time order
        out = out.sortWithinPartitions("_pid", "next_fetch_ts")
    (
        out
        .write.mode("overwrite")
        # small groups so sandbox-sized buckets carry several row
        # groups; at 10^10 scale groups are the 128MB default and the
        # per-bucket files carry hundreds of them
        .option("parquet.block.size", 512 * 1024)
        .partitionBy("_pid")
        .parquet(absdir)
    )


def _footer_stats(absdir: str, pred_ts) -> dict:
    """From parquet footers only: row groups / compressed bytes a
    ``next_fetch_ts <= pred_ts`` reader must open vs can skip."""
    import pyarrow.parquet as pq

    total_rg = open_rg = total_b = open_b = 0
    for root, _dirs, files in os.walk(absdir):
        for fn in files:
            if not fn.endswith(".parquet"):
                continue
            md = pq.ParquetFile(os.path.join(root, fn)).metadata
            ts_idx = [
                i for i in range(md.num_columns)
                if md.row_group(0).column(i).path_in_schema == "next_fetch_ts"
            ][0]
            for g in range(md.num_row_groups):
                rg = md.row_group(g)
                rg_bytes = sum(
                    rg.column(i).total_compressed_size
                    for i in range(md.num_columns)
                )
                total_rg += 1
                total_b += rg_bytes
                st = rg.column(ts_idx).statistics
                must_open = st is None or st.min is None or st.min <= pred_ts
                if must_open:
                    open_rg += 1
                    open_b += rg_bytes
    return {
        "row_groups": total_rg,
        "open_row_groups": open_rg,
        "total_mb": round(total_b / 2**20, 1),
        "open_mb": round(open_b / 2**20, 1),
        "bytes_skipped_pct": round(100 * (1 - open_b / total_b), 1),
    }


def main() -> None:
    from datetime import datetime, timezone

    from pyspark.sql import functions as F

    from hiispider_spark.session import get_spark

    spark = get_spark(app="frontier-layout-probe", cpus=8, shuffle_partitions=P)
    base = tempfile.mkdtemp(prefix="layout_probe_")
    try:
        df = _synth_frontier(spark).persist()
        df.count()
        dirs = {}
        for name, sort in (("unsorted", False), ("sorted", True)):
            d = os.path.join(base, name)
            _write(df, d, sort)
            dirs[name] = d
        df.unpersist()
        # tz-aware UTC: TIMESTAMP_MICROS stats come back tz-annotated
        # (the session tz is pinned UTC)
        pred = datetime.strptime(EPOCH_TS, "%Y-%m-%d %H:%M:%S").replace(
            tzinfo=timezone.utc
        )
        result = {"n_rows": N_ROWS, "due_frac": DUE_FRAC, "layouts": {}}
        for name, d in dirs.items():
            stats = _footer_stats(d, pred)
            rd = spark.read.parquet(d).filter(
                F.col("next_fetch_ts") <= F.lit(EPOCH_TS).cast("timestamp")
            )
            t0 = time.time()
            n_due = rd.count()
            stats["spark_filtered_count_s"] = round(time.time() - t0, 2)
            stats["n_due"] = n_due
            result["layouts"][name] = stats
        # prove the predicate reaches the scan
        plan = (
            spark.read.parquet(dirs["sorted"])
            .filter(F.col("next_fetch_ts") <= F.lit(EPOCH_TS).cast("timestamp"))
            ._jdf.queryExecution().executedPlan().toString()
        )
        result["pushed"] = "next_fetch_ts" in plan and "PushedFilters" in plan
        print(json.dumps(result, indent=1))
        u, s = result["layouts"]["unsorted"], result["layouts"]["sorted"]
        os.makedirs("BENCH", exist_ok=True)
        with open("BENCH/BASELINE.md", "a") as f:
            f.write(
                f"\n| {time.strftime('%Y-%m-%d %H:%M')} | frontier time-layout probe "
                f"({N_ROWS/1e6:.0f}M rows, {DUE_FRAC:.0%} due, 512KB groups) | "
                f"unsorted: open {u['open_mb']}/{u['total_mb']} MB "
                f"({u['bytes_skipped_pct']}% skipped) | "
                f"sorted: open {s['open_mb']}/{s['total_mb']} MB "
                f"({s['bytes_skipped_pct']}% skipped) | "
                f"filtered-count wall {u['spark_filtered_count_s']}s → "
                f"{s['spark_filtered_count_s']}s |"
            )
    finally:
        shutil.rmtree(base, ignore_errors=True)
        spark.stop()


if __name__ == "__main__":
    main()
