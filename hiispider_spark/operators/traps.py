"""Crawl-trap detection: frontier hygiene against infinite URL spaces
(calendar pages, session-id explosions, cyclic path repetition).

The reference has no trap defense — its frontier is an operator-curated
job table, so a plugin pulling trap links would grow MySQL unboundedly.
At a 10^10-URL autonomous frontier, traps are THE failure mode: one
calendar widget can mint more URLs than the rest of the web combined.

Design (all JVM Column expressions; zero Python):
- per-URL signals: path depth, repeated-segment fraction, query-param
  count, URL length — narrow per-row exprs, no shuffle;
- per-host aggregation: one map-side-combinable ``groupBy(host)`` over
  the frontier (or, cheaper, over each epoch's newly-discovered links
  only — O(new) not O(frontier));
- enforcement: the flagged host list is tiny (hosts, not URLs) →
  broadcast anti-join in front of ``merge_new_urls``, the same slot the
  negative cache occupies (plans/epoch.py).

Thresholds are conservative: a trap host must show BOTH volume and a
pathological URL shape, so a big legitimate site (many URLs, flat
paths) is never embargoed.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from hiispider_spark.functions.canon import host_col, path_col

# flag a host only when it has ≥ MIN_URLS frontier URLs AND a
# pathological average shape
MIN_URLS = 50
MAX_AVG_REPEAT_FRAC = 0.3
MAX_AVG_DEPTH = 8.0
MAX_AVG_PARAMS = 4.0


def path_segments_col(url: Column) -> Column:
    """Non-empty '/'-separated path segments."""
    return F.filter(F.split(path_col(url), "/"), lambda s: s != "")


def seg_repeat_frac_col(url: Column) -> Column:
    """1 − distinct/total over path segments — ≈0 for normal paths,
    →1 for /cal/2020/cal/2020/... cycles. Rounded for the oracle."""
    segs = path_segments_col(url)
    return F.round(
        F.lit(1.0)
        - F.size(F.array_distinct(segs)) / F.greatest(F.size(segs), F.lit(1)),
        6,
    )


def n_query_params_col(url: Column) -> Column:
    # try_: malformed hrefs must yield NULL, not raise (see canon.host_col)
    q = F.try_parse_url(url, F.lit("QUERY"))
    return (
        F.when(q.isNull() | (q == ""), F.lit(0))
        .otherwise(F.size(F.split(q, "&")))
        .cast("long")
    )


def url_trap_signals(df: DataFrame, url_col: str = "url") -> DataFrame:
    """Input columns + (host, depth, repeat_frac, n_params, url_len)."""
    u = F.col(url_col)
    out = df
    if "host" not in df.columns:
        out = out.withColumn("host", host_col(u))
    return (
        out.withColumn("depth", F.size(path_segments_col(u)).cast("long"))
        .withColumn("repeat_frac", seg_repeat_frac_col(u))
        .withColumn("n_params", n_query_params_col(u))
        .withColumn("url_len", F.length(u).cast("long"))
    )


def host_trap_stats(
    frontier: DataFrame,
    url_col: str = "url",
    min_urls: int = MIN_URLS,
) -> DataFrame:
    """Per-host trap diagnosis: one aggregation pass, rows = hosts.

    ``trap`` = host exceeds the volume floor AND any shape signal.
    Run over newly-discovered links per epoch (O(new)) or the full
    frontier for a batch audit.
    """
    sig = url_trap_signals(frontier, url_col)
    agg = sig.groupBy("host").agg(
        F.count("*").alias("n_urls"),
        F.round(F.avg("depth"), 6).alias("avg_depth"),
        F.round(F.avg("repeat_frac"), 6).alias("avg_repeat_frac"),
        F.round(F.avg("n_params"), 6).alias("avg_params"),
        F.max("depth").alias("max_depth"),
    )
    trap = (F.col("n_urls") >= min_urls) & (
        (F.col("avg_repeat_frac") > MAX_AVG_REPEAT_FRAC)
        | (F.col("avg_depth") > MAX_AVG_DEPTH)
        | (F.col("avg_params") > MAX_AVG_PARAMS)
    )
    return agg.withColumn("trap", trap)


def filter_traps(
    new_urls: DataFrame, trap_hosts: DataFrame, url_col: str = "url"
) -> DataFrame:
    """Drop URLs on flagged hosts before the frontier merge. The trap
    list is per-HOST (tiny) → broadcast left-anti, no shuffle of the
    URL side."""
    hosts = trap_hosts.filter(F.col("trap")).select("host")
    df = new_urls
    if "host" not in df.columns:
        df = df.withColumn("host", host_col(F.col(url_col)))
    return df.join(F.broadcast(hosts), "host", "left_anti")
