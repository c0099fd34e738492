"""Adaptive recrawl scheduling via per-URL change-rate estimation.

hiispider reschedules every job at a FIXED per-job interval
([hs: hiispider/schedulerserver.py †] — each job carries its own
``interval`` and is re-pushed at +interval; ``requeue_fetched`` in
frontier.py mirrors that). At a 10^10-URL frontier a fixed interval
wastes fetch budget on static pages and goes stale on fast movers; the
standard upgrade is to estimate each page's Poisson change rate from
its own fetch history and revisit at ~1/λ̂ (Cho & Garcia-Molina,
"Estimating Frequency of Change", ACM TOIT 3(3), 2003).

Estimator (the paper's bias-corrected MLE for change rate under
periodic polling, §4.2):

    λ̂ = -ln((n - X + 0.5) / (n + 0.5)) / Ī

with ``n`` polls, ``X`` detected changes (content-hash differed from
the previous poll — exactly the signal the epoch's conditional-GET
path already computes), and ``Ī`` the mean inter-poll gap. ``X = 0``
gives λ̂ = 0 → revisit interval clamps to ``max_s``; every-poll-changed
gives the shortest interval, clamped to ``min_s``.

100 TB shape: ONE map-side-combinable groupBy(url) over the fetch log
(count / sum / min / max only), then pure Column arithmetic — no
Python, no window function, no second shuffle. Inside the epoch loop
the same arithmetic runs O(slice)/epoch off two running counters
(n_polls, n_changes) instead of re-scanning the log.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

DEFAULT_INTERVAL_S = 3600.0
MIN_INTERVAL_S = 60.0
MAX_INTERVAL_S = 86400.0 * 7


def change_rate_col(n_polls: Column, n_changes: Column, mean_gap_s: Column) -> Column:
    """λ̂ (changes/sec), Cho & Garcia-Molina bias-corrected MLE.

    ``n_changes`` is capped at ``n_polls`` defensively; ``mean_gap_s``
    must be > 0 (callers gate n_polls >= 2 before using the result).
    """
    n = n_polls.cast("double")
    x = F.least(n_changes.cast("double"), n)
    return -F.log((n - x + F.lit(0.5)) / (n + F.lit(0.5))) / mean_gap_s


def revisit_interval_col(
    lam: Column,
    min_s: float = MIN_INTERVAL_S,
    max_s: float = MAX_INTERVAL_S,
) -> Column:
    """clamp(1/λ̂, min_s, max_s); λ̂ <= 0 (never observed changing) →
    max_s."""
    return F.when(lam <= 0, F.lit(float(max_s))).otherwise(
        F.least(F.greatest(F.lit(1.0) / lam, F.lit(float(min_s))), F.lit(float(max_s)))
    )


def recrawl_schedule(
    history: DataFrame,
    key_col: str = "url",
    ts_col: str = "fetch_ts",
    changed_col: str = "changed",
    default_s: float = DEFAULT_INTERVAL_S,
    min_s: float = MIN_INTERVAL_S,
    max_s: float = MAX_INTERVAL_S,
) -> DataFrame:
    """Fetch log → per-URL adaptive schedule.

    ``history``: one row per fetch — (key, timestamp, changed:boolean;
    the first fetch of a URL carries changed=false since there is no
    prior digest to compare). Returns one row per key:
    (key, n_polls, n_changes, lam, interval_s, next_fetch_ts) with
    next_fetch_ts = last fetch + floor(interval) whole seconds.

    URLs with fewer than 2 polls (no gap to estimate from) get
    ``default_s``.
    """
    agg = history.groupBy(key_col).agg(
        F.count(F.lit(1)).alias("n_polls"),
        F.sum(F.col(changed_col).cast("long")).alias("n_changes"),
        F.min(ts_col).alias("_first_ts"),
        F.max(ts_col).alias("_last_ts"),
    )
    span = F.unix_timestamp("_last_ts") - F.unix_timestamp("_first_ts")
    gap = span.cast("double") / (F.col("n_polls") - 1).cast("double")
    estimable = (F.col("n_polls") >= 2) & (span > 0)
    lam = F.when(
        estimable,
        change_rate_col(F.col("n_polls"), F.col("n_changes"), gap),
    ).otherwise(F.lit(0.0))
    interval = F.when(
        estimable, revisit_interval_col(lam, min_s=min_s, max_s=max_s)
    ).otherwise(F.lit(float(default_s)))
    return agg.select(
        key_col,
        "n_polls",
        "n_changes",
        # + 0.0 folds IEEE -0.0 (λ̂ = -ln(1) for never-changed URLs)
        # to +0.0 so the value hash matches SQL oracles doing the same
        (F.round(lam, 9) + F.lit(0.0)).alias("lam"),
        F.round(interval, 6).alias("interval_s"),
        F.timestamp_seconds(
            F.unix_timestamp("_last_ts") + F.floor(interval).cast("long")
        ).alias("next_fetch_ts"),
    )
