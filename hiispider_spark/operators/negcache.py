"""Host-level negative cache (SURVEY.md §2 O-7).

The reference keeps dicts of recently-failed hosts/requests with a TTL
and skips them before fetching [hs: hiispider/pagegetter.py (negative
cache) †]. Spark-native split:

- request-level: the frontier's exponential-backoff ``next_fetch_ts``
  IS the per-URL negative cache (the dequeue time filter is the check);
- host-level (this module): a host accumulating ≥ ``fail_threshold``
  fetch failures in one epoch is embargoed for ``ttl_s`` — ALL of its
  pending URLs are excluded from the slice by a left-anti join until
  the TTL expires. The anti-join is placed immediately after dequeue,
  before the politeness shuffle, so dead hosts cost nothing downstream
  (the reference's "avoid known-dead work early" placement, SURVEY §4).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

DEFAULT_FAIL_THRESHOLD = 3
DEFAULT_TTL_S = 90.0


def filter_embargoed(
    slice_df: DataFrame, neg_cache: DataFrame, epoch_ts: str
) -> tuple[DataFrame, DataFrame]:
    """(eligible, embargoed): anti-join the slice against live entries."""
    live = neg_cache.filter(
        F.col("until_ts") > F.lit(epoch_ts).cast("timestamp")
    ).select("host")
    eligible = slice_df.join(F.broadcast(live), "host", "left_anti")
    embargoed = slice_df.join(F.broadcast(live), "host", "left_semi")
    return eligible, embargoed


def next_neg_cache(
    neg_cache: DataFrame,
    failed: DataFrame,
    epoch_ts: str,
    fail_threshold: int = DEFAULT_FAIL_THRESHOLD,
    ttl_s: float = DEFAULT_TTL_S,
) -> DataFrame:
    """Roll the table forward: drop expired entries, embargo hosts whose
    failure count this epoch reached the threshold."""
    ts = F.lit(epoch_ts).cast("timestamp")
    kept = neg_cache.filter(F.col("until_ts") > ts)
    fresh = (
        failed.groupBy("host")
        .agg(F.count("*").alias("n_failures"))
        .filter(F.col("n_failures") >= fail_threshold)
        .select(
            "host",
            (ts + F.make_interval(secs=F.lit(ttl_s))).alias("until_ts"),
            "n_failures",
        )
    )
    # a re-failing host replaces its old entry (newer TTL wins)
    return fresh.unionByName(
        kept.join(fresh.select("host"), "host", "left_anti")
    )
