"""Fetch + page-cache + conditional GET + change detection
(SURVEY.md §2 O-3..O-6, O-30).

The reference fetches over HTTP through a rate-limited request queue
with a Cassandra page cache: request-hash → cached body/etag →
conditional GET → SHA-1 change detection raising StaleContentException
on unchanged content [hs: hiispider/pagegetter.py::PageGetter.getPage †,
hs: hiispider/requestqueuer.py †, hs: hiispider/exceptions.py †].

In the sandbox there is no network (session brief): "fetching" is an
equi-join of the granted slice against the Common-Crawl-style ``pages``
table — which is exactly the shape a WARC-backed production deployment
has (fetch = join against the page store; live HTTP would batch inside
``mapInPandas`` per host group, same dataflow).

Scale notes: slice×pages is the big join — both sides keyed by ``url``;
Catalyst picks sort-merge + AQE skew splitting. On a real cluster both
tables are bucketed by url_hash so the join co-locates without a
shuffle of the 100 TB pages side (the slice is repartitioned to the
pages bucketing — never the reverse).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def fetch_join(
    granted: DataFrame, pages: DataFrame, broadcast_slice: bool = True
) -> tuple[DataFrame, DataFrame]:
    """(fetched, fetch_failed): inner join on url = simulated fetch
    (O-3); the complement of the fetch is a dead URL → retry/backoff.

    Join shape matters at 100 TB: the granted slice is k-bounded (top-k
    per bucket × politeness budgets) while ``pages`` is the full page
    store — so broadcast the SLICE and stream pages through a map-side
    hash join: one scan, no shuffle or sort of the big side. (A
    sort-merge join here shuffles the whole page store per epoch —
    measured 2× slower at 16 cores on the sandbox corpus, arbitrarily
    worse at cluster scale.) When the slice outgrows broadcast range,
    bucket both tables by url_hash instead (`broadcast_slice=False`
    falls back to Catalyst's choice).

    ``failed`` is granted minus fetched. NOTE: it references the raw
    join plan — a caller that persists a *derived* frame (e.g. after
    with_content_sha1) must re-derive failed from the persisted frame,
    or the page-store join executes twice (run_epoch does this).
    """
    page_cols = pages.select("url", F.col("warc_ts"), F.col("html"))
    g = F.broadcast(granted) if broadcast_slice else granted
    fetched = page_cols.join(g, "url", "inner").select(
        *granted.columns, "warc_ts", "html"
    )
    failed = granted.join(fetched.select("url"), "url", "left_anti")
    return fetched, failed


def with_content_sha1(fetched: DataFrame) -> DataFrame:
    """SHA-1 of the fetched body (O-6) — JVM-side ``F.sha1`` over the
    binary column, matching the reference's hashlib.sha1(body)."""
    return fetched.withColumn("content_sha1", F.sha1(F.col("html")))


def split_modified(
    fetched_sha: DataFrame, page_cache: DataFrame
) -> tuple[DataFrame, DataFrame]:
    """Conditional-GET + change detection (O-4..O-6).

    ``page_cache`` carries (url_hash, content_sha1 AS cached_sha1,
    fetched_ts) from prior epochs. A row whose new SHA-1 equals the
    cached one is a "304" — unchanged, skip extraction (the reference's
    StaleContentException path). Returns (modified, unchanged).
    """
    cache = page_cache.select(
        "url_hash",
        F.col("content_sha1").alias("cached_sha1"),
    )
    joined = fetched_sha.join(cache, "url_hash", "left")
    unchanged = joined.filter(
        F.col("cached_sha1").isNotNull()
        & (F.col("cached_sha1") == F.col("content_sha1"))
    ).drop("cached_sha1")
    modified = joined.filter(
        F.col("cached_sha1").isNull()
        | (F.col("cached_sha1") != F.col("content_sha1"))
    ).drop("cached_sha1")
    return modified, unchanged
