"""Frontier: build, priority dequeue, requeue, merge (SURVEY.md §2
O-1, O-15, O-18, O-21, O-22).

The reference keeps recurring jobs in MySQL and a driver-side ``heapq``
of (next_run_ts, uuid), popping all due entries per tick
[hs: hiispider/servers/scheduler.py::SchedulerServer †]. A single
in-memory heap cannot scale to a 10^10-URL frontier, so the Spark-native
design is a **partitioned priority table**: salted host-hash bucketing
(BASELINE.json:6) plus a per-partition windowed top-k dequeue — no
global sort, no driver-side state.

Determinism contract (BASELINE.json:14 "matching the reference's crawl
ordering"): the dequeue order is a pure function of table state —
``priority DESC, next_fetch_ts ASC, url_hash ASC`` within a partition,
and ``part_id = pmod(xxhash64(host, salt), P)`` with
``salt = pmod(xxhash64(url), n_salts)`` depends only on the URL, never
on executor count. Tests assert identical dequeue order at local[8]
and local[32].

Scale notes:
- top-k per partition is a window over each bucket — Spark evaluates it
  partition-parallel after one hash exchange on ``part_id``; with the
  frontier *stored* bucketed by ``part_id`` the exchange is metadata-only
  on a real cluster (Iceberg bucket transform / bucketed table).
- the hot-domain skew (host 0 ≈ 30% of URLs in the synthetic corpus) is
  broken by the per-URL salt: one hot host fans out across ``n_salts``
  buckets instead of melting one task.
"""

from __future__ import annotations

from functools import lru_cache

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

from hiispider_spark.functions.canon import canonical_url_col, host_col
from hiispider_spark.functions.siphash import url_hash_udf
from hiispider_spark.sources.synth import EPOCH0

DEFAULT_PARTITIONS = 32
DEFAULT_SALTS = 8
DEFAULT_INTERVAL_S = 3600
BACKOFF_BASE_S = 60

# Per-epoch plan-build constants are memoized by column NAME — see
# functions/canon.py module notes for why cached Column trees are safe
# to reuse across queries/epochs/threads. String args hit the cache.


def part_id_col(
    host: Column | str, salt: Column | str, n_partitions: int
) -> Column:
    """Salted host-hash bucket (BASELINE.json:6)."""
    if isinstance(host, str) and isinstance(salt, str):
        return _part_id_named(host, salt, n_partitions)
    return F.pmod(F.xxhash64(host, salt), F.lit(n_partitions)).cast("int")


@lru_cache(maxsize=128)
def _part_id_named(host: str, salt: str, n_partitions: int) -> Column:
    return F.pmod(
        F.xxhash64(F.col(host), F.col(salt)), F.lit(n_partitions)
    ).cast("int")


def salt_col(url: Column | str, n_salts: int) -> Column:
    if isinstance(url, str):
        return _salt_named(url, n_salts)
    return F.pmod(F.xxhash64(url), F.lit(n_salts)).cast("int")


@lru_cache(maxsize=128)
def _salt_named(name: str, n_salts: int) -> Column:
    return F.pmod(F.xxhash64(F.col(name)), F.lit(n_salts)).cast("int")


def build_frontier(
    seeds: DataFrame,
    n_partitions: int = DEFAULT_PARTITIONS,
    n_salts: int = DEFAULT_SALTS,
    interval_s: int = DEFAULT_INTERVAL_S,
    stagger_s: int = 0,
    stagger_seed: int = 42,
    bucket: bool = True,
) -> DataFrame:
    """Seed list → frontier table (O-1 + O-21 initial load).

    Canonicalizes (non-canonical spellings collapse), dedups keeping the
    highest priority (deterministic), assigns identity hash + salted
    bucket + plugin (O-10: seeds may carry a ``plugin`` column — the
    reference's per-job "plugin/function" type; default = flagship
    text), schedules everything as due at EPOCH0.

    ``stagger_s > 0`` spreads first fetches over [0, stagger_s) seconds
    via ``pmod(xxhash64(url_hash, seed), stagger_s)`` — the reference's
    boot stagger (random.randint re-expressed deterministically, O-15
    [hs: hiispider/servers/scheduler.py (heap push) †]) so a 10^10-row
    boot doesn't thunder-herd epoch 1. Default 0 keeps the closed-form
    golden fixtures (everything due at EPOCH0).
    """
    has_plugin = "plugin" in seeds.columns
    canon = seeds.select(
        # name-keyed → memoized tree: this runs per ingest batch in the
        # streaming paths, not just once at bootstrap
        canonical_url_col("url").alias("url"),
        "priority",
        *(["plugin"] if has_plugin else []),
    )
    aggs = [F.max("priority").alias("priority")]
    if has_plugin:
        aggs.append(F.min("plugin").alias("plugin"))  # deterministic pick
    dedup = canon.groupBy("url").agg(*aggs)
    if not has_plugin:
        dedup = dedup.withColumn("plugin", F.lit("text"))
    url = F.col("url")
    first_ts = F.lit(EPOCH0).cast("timestamp")
    if stagger_s > 0:
        offset = F.pmod(
            F.xxhash64(F.col("url_hash"), F.lit(stagger_seed)), F.lit(stagger_s)
        )
        first_ts = first_ts + F.make_interval(secs=offset.cast("double"))
    out = (
        dedup.withColumns(
            {
                "url_hash": url_hash_udf(url),
                "host": host_col("url"),
                "salt": salt_col("url", n_salts),
            }
        )
        .withColumns(
            {
                "part_id": part_id_col("host", "salt", n_partitions),
                "next_fetch_ts": first_ts,
                "interval_s": F.lit(interval_s),
                "retry_count": F.lit(0),
                "state": F.lit("pending"),
            }
        )
        .select(
            "url", "url_hash", "host", "salt", "part_id", "priority",
            "next_fetch_ts", "interval_s", "retry_count", "state", "plugin",
        )
    )
    # physical bucketing by part_id matters only where the frontier is
    # about to be WRITTEN bucketed (bootstrap, streaming ingest) — the
    # part_id COLUMN is always present, and every downstream operator
    # (dequeue window, politeness) re-keys by its own column anyway, so
    # analytic consumers pass bucket=False and skip a full-table
    # exchange (rows identical; the shuffle moved no information)
    return out.repartition(n_partitions, "part_id") if bucket else out


def dequeue_topk(
    frontier: DataFrame,
    epoch_ts: str,
    k_per_partition: int,
    aging_weight: float = 0.0,
) -> DataFrame:
    """Per-partition priority top-k of due URLs (O-18).

    Replaces the reference's global min-heap pop with a bucket-local
    window — the global sort a naive ``orderBy(priority).limit(n)``
    would shuffle is avoided; each bucket ranks independently.

    ``aging_weight`` > 0 ranks by EFFECTIVE priority = priority +
    weight × days-past-due — the starvation guard a 10^10 frontier
    needs (with static priorities, a row narrowly below its bucket's
    top-k cutoff can otherwise wait forever behind a stable cohort;
    the reference's global heap pops EVERY due row per tick, so it
    never starves — a k-bounded dequeue must buy that property back).
    0 keeps the exact original ordering (golden fixtures).
    """
    due = frontier.filter(
        (F.col("state") == "pending")
        & (F.col("next_fetch_ts") <= F.lit(epoch_ts).cast("timestamp"))
    )
    # "dequeue everything due" (k at/above 2^30, the closed-form oracle
    # queries' BIG_K): every due row passes rn <= k for any bucket below
    # 2^30 rows, so ranking is a no-op — skip the window outright. This
    # removes one Exchange + Sort + Window from those plans AND lets
    # Catalyst prune the ordering columns (url_hash's Arrow UDF among
    # them) when nothing downstream needs them. Result set is identical
    # by construction; k-bounded dequeues are untouched (golden-fixture
    # orderings pinned by tests).
    if k_per_partition >= (1 << 30):
        return due
    return (
        due.withColumn(
            "rn",
            # aging=0 ignores the epoch ts — key it out so every epoch
            # shares one cached tree
            _rank_col(float(aging_weight), epoch_ts if aging_weight else ""),
        )
        .filter(F.col("rn") <= k_per_partition)
        .drop("rn")
    )


@lru_cache(maxsize=64)
def _rank_col(aging_weight: float, epoch_ts: str) -> Column:
    """row_number over the dequeue window — memoized plan-build
    (~120 ms/build, once per epoch). aging_weight=0 (the golden-fixture
    default) ignores epoch_ts, so every epoch shares ONE cached tree;
    the aging tree keys on the epoch too (rebuilt per epoch, still
    cached within it for the flagship + bench re-plans)."""
    eff = F.col("priority")
    if aging_weight:
        overdue_s = (
            F.lit(epoch_ts).cast("timestamp").cast("double")
            - F.col("next_fetch_ts").cast("double")
        )
        eff = eff + F.lit(aging_weight) * overdue_s / F.lit(86400.0)
    w = Window.partitionBy("part_id").orderBy(
        eff.desc(), F.col("next_fetch_ts").asc(), F.col("url_hash").asc()
    )
    return F.row_number().over(w)


@lru_cache(maxsize=1)
def _interval_offset() -> Column:
    return F.make_interval(secs=F.col("interval_s").cast("double"))


def requeue_fetched(slice_df: DataFrame, epoch_ts: str) -> DataFrame:
    """Successful fetches go back on the schedule at +interval (O-15),
    mirroring the reference's heap re-push [hs: scheduler.py †]."""
    return slice_df.withColumns(
        {
            "next_fetch_ts": (
                F.lit(epoch_ts).cast("timestamp") + _interval_offset()
            ),
            "retry_count": F.lit(0),
        }
    )


@lru_cache(maxsize=1)
def _backoff_cols() -> tuple[Column, Column, Column]:
    retry = F.col("retry_count") + 1
    offset = F.make_interval(
        secs=(F.lit(BACKOFF_BASE_S) * F.pow(F.lit(2.0), retry)).cast("double")
    )
    state = F.when(retry >= 5, F.lit("failed")).otherwise(F.col("state"))
    return offset, retry.cast("int"), state


def requeue_failed(slice_df: DataFrame, epoch_ts: str) -> DataFrame:
    """Failed fetches: exponential backoff, capped retries (O-22).

    Reference records errors in a negative cache + job history and
    retries later [hs: hiispider/pagegetter.py †]; we push
    ``next_fetch_ts`` out by BACKOFF_BASE * 2^retry and retire after 5.
    """
    offset, retry, state = _backoff_cols()
    return slice_df.withColumns(
        {
            "next_fetch_ts": F.lit(epoch_ts).cast("timestamp") + offset,
            "retry_count": retry,
            "state": state,
        }
    )


def new_frontier_entries(
    frontier: DataFrame,
    new_urls: DataFrame,
    epoch_ts: str,
    n_partitions: int = DEFAULT_PARTITIONS,
    n_salts: int = DEFAULT_SALTS,
    interval_s: int = DEFAULT_INTERVAL_S,
    discovered_priority: float = 0.1,
    discovered_plugin: str = "text",
    assume_new: bool = False,
    assume_unique: bool = False,
) -> DataFrame:
    """Frontier-shaped rows for discovered URLs not yet in the frontier
    (the insert side of O-21). Exposed separately from the union so the
    epoch can reuse the inserted set for the seen-set delta update.

    Anti-join on url_hash — at 10^10 scale the bloom prefilter
    (operators.seen) cuts this probe by ~99% before the exact join.
    ``assume_new=True`` skips that anti-join entirely: the epoch's
    candidates already passed ``seen.filter_unseen_partitioned``, and
    seen_exact membership is a superset of frontier membership by
    construction (both inserted in the same atomic commit, frontier rows
    never deleted) — re-probing the full frontier would shuffle
    O(frontier) per epoch for zero information.
    """
    url = F.col("url")
    # reuse whatever identity columns the caller already computed
    # (the epoch pre-buckets candidates for the co-partitioned bloom
    # probe — recomputing the UDF hash here would double the work)
    keep = [
        c for c in ("url", "url_hash", "host", "salt", "part_id")
        if c in new_urls.columns
    ]
    hashed = new_urls.select(*keep)
    if not assume_unique:
        # callers that canonicalized+deduped upstream (the epoch does,
        # before hashing) skip this — it is a full shuffle of the
        # candidate set purely to re-prove uniqueness
        hashed = hashed.dropDuplicates(["url"])
    if "url_hash" not in keep:
        hashed = hashed.withColumn("url_hash", url_hash_udf(url))
    candidates = hashed
    if not assume_new:
        candidates = candidates.join(
            frontier.select("url_hash"), "url_hash", "left_anti"
        )
    if "host" not in keep:
        candidates = candidates.withColumn("host", host_col("url"))
    if "salt" not in keep:
        candidates = candidates.withColumn("salt", salt_col("url", n_salts))
    if "part_id" not in keep:
        candidates = candidates.withColumn(
            "part_id", part_id_col("host", "salt", n_partitions)
        )
    # one withColumns call (not six withColumn round-trips — each is a
    # py4j DataFrame build; this path runs every epoch)
    return candidates.withColumns(
        {
            "priority": F.lit(discovered_priority),
            "next_fetch_ts": F.lit(epoch_ts).cast("timestamp"),
            "interval_s": F.lit(interval_s),
            "retry_count": F.lit(0),
            "state": F.lit("pending"),
            "plugin": F.lit(discovered_plugin),
        }
    ).select(*frontier.columns)


def merge_new_urls(
    frontier: DataFrame,
    new_urls: DataFrame,
    epoch_ts: str,
    n_partitions: int = DEFAULT_PARTITIONS,
    n_salts: int = DEFAULT_SALTS,
    interval_s: int = DEFAULT_INTERVAL_S,
    discovered_priority: float = 0.1,
) -> DataFrame:
    """Frontier merge (O-21): union of the existing frontier with
    :func:`new_frontier_entries`; existing entries keep their schedule."""
    return frontier.unionByName(
        new_frontier_entries(
            frontier, new_urls, epoch_ts, n_partitions, n_salts,
            interval_s, discovered_priority,
        )
    )
