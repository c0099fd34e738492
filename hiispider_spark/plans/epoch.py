"""The crawl epoch — a Structured-Streaming-style micro-batch
(SURVEY.md §2 O-2, O-25; §3.1).

One epoch replaces one scheduler tick + AMQP round-trip + worker fan-out
of the reference [hs: hiispider/servers/scheduler.py †, hs:
hiispider/amqp.py †]:

    frontier ── dequeue top-k per bucket ── robots ── token buckets ──
    fetch(join pages) ── sha1 change filter ── extract plugins ──
    delta/out-links ── frontier merge ── atomic snapshot commit

All state (frontier, politeness, seen, lineage, extracted) lives in
IcebergLike tables; the manifest swap at the end is the only commit
point, so a run killed mid-epoch resumes from the previous epoch with
byte-identical results (BASELINE.json:6 "runs resume exactly" —
verified by tests/test_resume.py).

Determinism: ``epoch_ts`` is a pure function of the epoch counter (no
wall clock); every ordering has an explicit total tie-break; nothing
depends on partition count or executor count.
"""

from __future__ import annotations

import time
from dataclasses import dataclass
from datetime import datetime, timedelta

from pyspark import StorageLevel
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from hiispider_spark.functions.canon import canonical_url_col, host_col
from hiispider_spark.operators import politeness as pol
from hiispider_spark.operators import seen as seen_ops
from hiispider_spark.operators.delta import explode_items
from hiispider_spark.operators.fetch import (
    fetch_join,
    split_modified,
    with_content_sha1,
)
from hiispider_spark.operators.extract import run_extraction
from hiispider_spark.operators.frontier import (
    build_frontier,
    dequeue_topk,
    new_frontier_entries,
    part_id_col,
    requeue_failed,
    requeue_fetched,
    salt_col,
)
from hiispider_spark.operators.lineage import build_lineage
from hiispider_spark.operators.negcache import filter_embargoed, next_neg_cache
from hiispider_spark.sources.catalog import IcebergLike
from hiispider_spark.sources.synth import EPOCH0, EPOCH_SECONDS

FRONTIER_COLS = [
    "url", "url_hash", "host", "salt", "part_id", "priority",
    "next_fetch_ts", "interval_s", "retry_count", "state", "plugin",
]


@dataclass(frozen=True)
class EpochConfig:
    k_per_partition: int = 64
    n_partitions: int = 32
    n_salts: int = 8
    interval_s: int = 3600
    epoch_seconds: float = EPOCH_SECONDS
    bloom_m_bits: int = seen_ops.DEFAULT_M_BITS
    follow_links: bool = True
    # per-epoch summary counters. frontier_size comes from manifest
    # footer counts (O(1), no job — catalog.row_count); n_granted is one
    # count over the persisted slice. Cheap enough to default on.
    collect_stats: bool = True
    # host-level negative cache (O-7): hosts with ≥ threshold failures
    # in one epoch are embargoed for neg_cache_ttl_s
    neg_cache_fail_threshold: int = 3
    neg_cache_ttl_s: float = 90.0
    # O-15 boot stagger: spread first fetches over [0, boot_stagger_s)
    # seconds (deterministic hash of url_hash) — 0 keeps golden fixtures
    boot_stagger_s: int = 0
    # O-9 global in-flight cap (reference max_simultaneous_requests):
    # total grants per epoch across ALL hosts, waterfilled across
    # buckets — None keeps per-host budgets only (golden fixtures)
    max_inflight: int | None = None
    # Merge-on-read state commits (default — the 10^10 write shape):
    # each epoch appends a delta file of only the CHANGED rows for every
    # keyed state table — frontier (requeued + backoff + denied +
    # inserted; deferred/embargoed rows are byte-unchanged so the base
    # stays authoritative), page_cache (fetched digests), politeness
    # (touched hosts) — instead of rewriting every touched bucket. At a
    # 10^10-row frontier where every bucket dequeues every epoch,
    # partition-level overwrite still writes O(table) for each of them;
    # deltas write O(epoch work). Reads resolve newest-wins
    # (catalog.MERGE_KEYS, size-gated broadcast anti-join); compaction
    # folds deltas into bucket files when EITHER the file-set count
    # (read fan-in) or the accumulated delta rows (resolve key-set /
    # broadcast size) passes its bound. False = partition-level
    # overwrite commits (byte-identical state, more write amplification).
    state_deltas: bool = True
    compact_every: int = 8
    compact_delta_rows: int = 4_000_000
    # Reclaim superseded version dirs right after a compaction commits
    # (catalog.vacuum — Iceberg expire_snapshots analogue). Off only
    # for debugging/forensics on dead snapshots.
    vacuum_after_compact: bool = True
    # Crawl-trap guard (operators/traps.py): hosts whose newly
    # discovered links this epoch exceed trap_min_urls AND show a
    # pathological URL shape (segment repetition / depth / query-param
    # explosion) are dropped before the seen probe and frontier merge —
    # one calendar widget must not mint frontier rows unboundedly.
    # Default off: the synthetic corpus has flat URLs, and golden
    # fixtures pin the unguarded ordering.
    trap_guard: bool = False
    trap_min_urls: int = 10_000
    # Scope guard (operators/scope.py): drop out-of-scope discovered
    # links (non-http schemes, media extensions, over-long/deep URLs)
    # BEFORE canonicalization/hashing — a narrow filter that spares the
    # SipHash, the bloom probe, and the frontier row. Default off: the
    # synthetic corpus emits only in-scope links (no behavior change),
    # and golden fixtures pin the unguarded path.
    scope_guard: bool = False
    # Token-bucket implementation: "column" (the JVM window twin — the
    # fast path whenever the fetch is a join and the politeness stage
    # hosts no I/O, as in this sandbox; guide §4: no Python boundary on
    # the hot path) or "pandas" (groupBy(host).applyInPandas — the
    # BASELINE-mandated expression and the stage where batched live
    # HTTP executes in a production deployment; flip to it when the
    # fetch does real I/O). The two are proved row-identical by
    # test_politeness, including two full epochs byte-identical under
    # both impls, so the default only changes the physical plan.
    politeness_impl: str = "column"
    # Per-host concurrency ceiling per epoch (the reference's
    # max_simultaneous_requests_per_host) on top of the rate budget;
    # None = rate-limited only (golden fixtures).
    host_max_parallel: int | None = None
    # Dequeue starvation guard: effective priority += aging_weight ×
    # days-past-due (frontier.dequeue_topk). 0 = static priorities
    # (golden fixtures; reference parity — its global heap never
    # starves, a k-bounded dequeue needs the guard at scale).
    aging_weight: float = 0.0
    # Adaptive recrawl (operators/recrawl.py): reschedule successful
    # fetches at clamp(1/λ̂) from the page_cache change counters instead
    # of the row's fixed interval_s — static pages drift toward
    # recrawl_max_s, fast movers toward recrawl_min_s. Runs O(slice)
    # Column math off counters the cache update computes anyway.
    # Default off: golden ordering fixtures pin fixed intervals.
    adaptive_recrawl: bool = False
    recrawl_min_s: float = 60.0
    recrawl_max_s: float = 604800.0

    @classmethod
    def production(cls, **overrides) -> "EpochConfig":
        """Every scale guard ON — the configuration a 10^10-URL
        deployment runs. The field defaults above keep each guard OFF
        individually so golden fixtures pin the unguarded orderings;
        this preset is the other end of that dial, and
        test_epoch::test_production_profile drives them TOGETHER
        (interaction bugs — e.g. trap_guard × scope_guard × the
        assume_new insertion path — hide between individually-green
        features). ``overrides`` adjust for corpus size (a sandbox test
        lowers trap_min_urls and max_inflight; a real deployment sizes
        them to its hardware)."""
        base: dict = dict(
            aging_weight=0.05,          # dequeue starvation guard
            adaptive_recrawl=True,       # Cho & G-M revisit intervals
            trap_guard=True,             # calendar-widget URL mints
            scope_guard=True,            # drop out-of-scope links early
            host_max_parallel=4,         # per-host concurrency ceiling
            max_inflight=1 << 20,        # global in-flight cap
            politeness_impl="column",    # JVM twin (fetch is a join)
            boot_stagger_s=300,          # spread the first-fetch wave
            state_deltas=True,           # merge-on-read state commits
            collect_stats=True,
        )
        base.update(overrides)
        return cls(**base)


#: target rows per delta data file. Delta dirs are read back UNIONED
#: every epoch until compaction, so their file count is pure read
#: fan-in: a fixed coalesce(P) writes P near-empty files at sandbox
#: scale (measured ~1k rows/file — scan setup dominates), while one
#: giant file at 10^10 scale would serialize the write. The epoch
#: KNOWS its delta row counts before writing (n_dequeued, n_inserted,
#: n_fetched are already materialized), so the file count derives from
#: them: ceil(rows / ROWS_PER_DELTA_FILE), capped at the table's
#: partition count.
ROWS_PER_DELTA_FILE = 500_000


def _delta_files(rows: int, cap: int) -> int:
    """File count for a delta of ``rows`` rows: bounded file sizes,
    minimal read fan-in."""
    return max(1, min(cap, rows // ROWS_PER_DELTA_FILE + 1))


def epoch_timestamp(epoch: int, epoch_seconds: float = EPOCH_SECONDS) -> str:
    t0 = datetime.fromisoformat(EPOCH0)
    return (t0 + timedelta(seconds=epoch * epoch_seconds)).strftime(
        "%Y-%m-%d %H:%M:%S"
    )


def bootstrap(
    spark: SparkSession,
    cat: IcebergLike,
    seeds: DataFrame,
    cfg: EpochConfig = EpochConfig(),
) -> None:
    """Epoch 0: seed list → frontier + seen set; atomic initial commit.

    frontier and seen_set are written partition-level from the start so
    later epochs can carry untouched buckets over by manifest reference.
    """
    frontier = build_frontier(
        seeds, cfg.n_partitions, cfg.n_salts, cfg.interval_s,
        stagger_s=cfg.boot_stagger_s,
    )
    all_parts = list(range(cfg.n_partitions))
    cat.stage_overwrite_parts("frontier", frontier, "part_id", all_parts)
    frontier_c = cat.read_staged("frontier")  # materialized once on disk
    if cfg.state_deltas:
        # seen_exact ≡ frontier membership: reference the frontier's
        # bucket files instead of writing a url_hash copy of the table
        cat.stage_append_ref(
            "seen_exact", cat.staged_part_rels("frontier"), replace=True
        )
    else:
        cat.stage_overwrite("seen_exact", frontier_c.select("url_hash"))
    cat.stage_overwrite_parts(
        "seen_set",
        seen_ops.build_partition_blooms(frontier_c, cfg.bloom_m_bits),
        "partition_id",
        all_parts,
    )
    cat.commit(epoch=0)


def run_epoch(
    spark: SparkSession,
    cat: IcebergLike,
    pages: DataFrame,
    robots: DataFrame,
    cfg: EpochConfig = EpochConfig(),
) -> dict:
    """Process the next epoch; returns summary counters (plus
    ``phase_walls``: seconds per materialization boundary, the knob for
    finding which stage grows with history — it must be none)."""
    e = cat.epoch + 1
    ts = epoch_timestamp(e, cfg.epoch_seconds)
    walls: dict[str, float] = {}
    _t0 = time.time()

    def _mark(phase: str) -> None:
        nonlocal _t0
        t = time.time()
        walls[phase] = round(t - _t0, 2)
        _t0 = t

    frontier = cat.read("frontier")
    # Materialization discipline (r4): every persisted frame is
    # guaranteed materialized BEFORE the concurrent write pool starts —
    # by the dequeue collect (sl), the fused politeness+fetch+failed
    # job (bucketed, fetched, fetched_meta, failed), the extract count
    # (extracted_new), and the inserted collect (hashed, inserted).
    # Between those serial jobs there are NO redundant eager counts:
    # an intermediate count only moves the same work one job earlier
    # (measured wall-neutral at sandbox scale, one fewer scheduling
    # round per dropped count — which is what matters at 1000
    # executors). The sibling-race the old per-stage counts guarded
    # against can only occur across CONCURRENT jobs; the write jobs
    # (submitted eagerly, overlapping the later serial phases) only
    # ever consume frames ALREADY materialized by a serial job — each
    # _submit below sits after the count/collect that filled its
    # inputs' caches — so no persisted frame is first-computed by two
    # jobs at once.
    sl = dequeue_topk(
        frontier, ts, cfg.k_per_partition, aging_weight=cfg.aging_weight
    ).persist()
    # one job materializes the persist AND yields the dequeue count plus
    # the touched buckets (bounded by P rows — the only driver collect
    # in the pipeline besides counters); everything the epoch rewrites
    # lives in these buckets + the buckets of inserted links
    per_part = sl.groupBy("part_id").count().collect()
    n_dequeued = int(sum(r["count"] for r in per_part))
    touched = sorted(r.part_id for r in per_part)
    _mark("dequeue")

    # host-level negative cache: embargoed hosts drop out before any
    # downstream shuffle (O-7 — "avoid known-dead work early")
    neg_cache = cat.read("neg_cache")
    eligible, embargoed = filter_embargoed(sl, neg_cache, ts)

    # politeness: robots prefix rules then per-host token buckets
    allowed, denied = pol.split_robots(eligible, robots)
    bucket_fn = (
        pol.apply_token_buckets_col
        if cfg.politeness_impl == "column"
        else pol.apply_token_buckets
    )
    bucketed = bucket_fn(
        allowed, cat.read("politeness"), ts, cfg.epoch_seconds,
        host_max_parallel=cfg.host_max_parallel,
    )
    bucketed_raw = None
    if cfg.max_inflight is not None:
        # the cap collects per-bucket grant counts → persist its input
        bucketed_raw = bucketed.persist()
        bucketed_raw.count()
        bucketed = pol.apply_global_cap(bucketed_raw, cfg.max_inflight)
    # persisted but NOT eagerly counted: the first downstream
    # materialization (the failed/fetched_meta job below) computes the
    # politeness stage once into the cache, and every later consumer —
    # including the concurrent write jobs — reads the cached blocks.
    # An eager count here was one extra scheduling round per epoch
    # whose only effect was moving the same work one job earlier.
    bucketed = bucketed.persist()
    granted = bucketed.filter(F.col("granted")).select(*FRONTIER_COLS)
    deferred = bucketed.filter(~F.col("granted")).select(*FRONTIER_COLS)

    # fetch = join against the page store; sha1 change detection.
    # DISK_ONLY: these rows carry html bytes — unrolling them into the
    # memory store across many concurrent tasks GC-thrashes; streaming
    # to local disk scales linearly with cores.
    fetched, _ = fetch_join(granted, pages)
    fetched = with_content_sha1(fetched).persist(StorageLevel.DISK_ONLY)
    # narrow twin of the fetch result: requeue/failed/lineage/page-cache
    # only need frontier columns + digest + length — reading those
    # through the html-bearing DISK_ONLY cache re-scans ~KB-wide rows
    # once PER CONSUMER (measured as the write phase's hidden cost);
    # a slim in-memory projection is scanned instead
    fetched_meta = fetched.select(
        *FRONTIER_COLS, "content_sha1", F.length("html").alias("html_len")
    ).persist()
    # failed re-derived from PERSISTED frames — the tuple's own
    # anti-join references the pre-persist plan and would run the
    # broadcast join against the page store a second time. Persisted
    # itself: three downstream jobs (frontier backoff, lineage,
    # neg_cache) would otherwise each recompute the anti-join.
    failed = granted.join(
        fetched_meta.select("url"), "url", "left_anti"
    ).persist()
    # ONE job materializes politeness + fetch + sha1 + the slim meta
    # twin + failed (the fused sched/fetch stage) AND yields both
    # counts: computing the failed branch scans fetched_meta, whose
    # projection pulls the DISK_ONLY fetched cache into existence
    # through the whole upstream chain; the fetched branch then reads
    # the just-filled cache. Folding the two counts into one union-agg
    # job drops a full scheduling round per epoch (the count was cheap
    # but its job round-trip was not — the per-epoch fixed constant is
    # what caps scaling efficiency). Stats arithmetic still closes as
    # granted = fetched ⊎ failed.
    _counts = dict(
        failed.select(F.lit("f").alias("k"))
        .unionByName(fetched_meta.select(F.lit("m").alias("k")))
        .groupBy("k")
        .count()
        .collect()
    )
    n_failed = int(_counts.get("f", 0))
    n_fetched = int(_counts.get("m", 0))
    _mark("politeness_fetch")

    # Eager write scheduling (guide §2.6 "overlap independent jobs"):
    # every state-table write whose inputs are already materialized is
    # submitted NOW, from a driver thread, so it back-fills executor
    # slots while the epoch's remaining serial phases (extract, link
    # discovery) run — instead of serializing the whole write pool
    # after them. Inputs are all persisted-and-materialized frames
    # (the r4 materialization discipline), so no concurrent-first-use
    # race exists; per-table writes stage into distinct _staged keys
    # (GIL-safe, one committing thread at the end — catalog notes).
    from concurrent.futures import ThreadPoolExecutor

    write_walls: dict[str, float] = {}
    compacted: list[str] = []
    pool = ThreadPoolExecutor(max_workers=8)
    futures = []

    def _timed(name: str, job) -> None:
        # one scheduler pool per table write: under FAIR mode (session
        # default) pools share task slots equally, so the small 1-task
        # writes (neg_cache, lineage, politeness delta) land promptly
        # instead of queueing behind frontier/seen_set — FIFO showed a
        # ~6 s epoch-1 straggler tail from exactly that starvation.
        # try/finally: pool-executor threads are reused — a sticky
        # local property would put later jobs in the last write's pool.
        spark.sparkContext.setLocalProperty(
            "spark.scheduler.pool", f"write-{name}"
        )
        t0 = time.time()
        try:
            job()
        finally:
            spark.sparkContext.setLocalProperty("spark.scheduler.pool", None)
        write_walls[name] = round(time.time() - t0, 2)

    def _submit(name: str, job) -> None:
        futures.append(pool.submit(_timed, name, job))
    # conditional GET against the compact page_cache state table —
    # O(slice) per epoch (only touched buckets' cache files open),
    # never a scan+aggregate of the ever-growing extracted history
    cache = cat.read_parts("page_cache", touched).select(
        "url_hash", "content_sha1", "n_polls", "n_changes", "first_fetch_ts"
    )
    modified, unchanged = split_modified(fetched, cache)
    # next page_cache rows for this epoch's fetches: digest + rolled
    # change counters (adaptive-recrawl input). One slice×cache join —
    # same O(slice)/O(touched-buckets) shape as the conditional GET.
    prev = cache.select(
        "url_hash",
        F.col("content_sha1").alias("_sha"),
        F.col("n_polls").alias("_np"),
        F.col("n_changes").alias("_nc"),
        F.col("first_fetch_ts").alias("_ft"),
    )
    cache_rows = (
        fetched_meta.select("part_id", "url_hash", "content_sha1")
        .join(prev, "url_hash", "left")
        .select(
            "part_id",
            "url_hash",
            "content_sha1",
            (F.coalesce(F.col("_np"), F.lit(0)) + 1).alias("n_polls"),
            (
                F.coalesce(F.col("_nc"), F.lit(0))
                + F.when(
                    F.col("_sha").isNotNull()
                    & (F.col("_sha") != F.col("content_sha1")),
                    1,
                ).otherwise(0)
            ).alias("n_changes"),
            F.coalesce(
                F.col("_ft"), F.lit(ts).cast("timestamp")
            ).alias("first_fetch_ts"),
        )
    )

    # page-cache + politeness + neg-cache state depend only on frames
    # the fused politeness/fetch job just materialized (bucketed,
    # fetched_meta, failed) — their writes start here and overlap the
    # extract + link-discovery phases below. Same frames, same staged
    # bytes as the post-phase pool they replace.
    new_state = pol.next_politeness_state(bucketed, ts, cfg.n_partitions)
    if cfg.state_deltas:
        # delta = exactly this epoch's changed keys: fetched digests /
        # touched hosts. O(slice) rows, a handful of files; no carried
        # read, no per-table parts collect.
        cache_job = lambda: cat.stage_append_delta(  # noqa: E731
            "page_cache",
            cache_rows.coalesce(_delta_files(n_fetched, cfg.n_partitions)),
        )
        politeness_job = lambda: cat.stage_append_delta(  # noqa: E731
            "politeness", new_state.coalesce(1)
        )
    else:
        # fetched rows replace their digests, the rest of the touched
        # buckets carry; untouched buckets never open
        def cache_job() -> None:
            cache_next = cache_rows.unionByName(
                cat.read_parts("page_cache", touched).join(
                    fetched_meta.select("url_hash"), "url_hash", "left_anti"
                )
            )
            cat.stage_overwrite_parts(
                "page_cache", cache_next, "part_id", touched
            )

        # updated hosts replace; only their host-hash buckets rewrite
        # (manifest-pruned paths), every other bucket carries by
        # reference. pol_parts is a tiny collect over this epoch's
        # hosts — computed inside the write thread.
        def politeness_job() -> None:
            pol_parts = sorted(
                r.part_id
                for r in new_state.select("part_id").distinct().collect()
            )
            carried = cat.read_parts("politeness", pol_parts).join(
                new_state.select("host"), "host", "left_anti"
            )
            cat.stage_overwrite_parts(
                "politeness", new_state.unionByName(carried), "part_id",
                pol_parts,
            )

    neg_next = next_neg_cache(
        neg_cache, failed, ts, cfg.neg_cache_fail_threshold, cfg.neg_cache_ttl_s
    )
    _submit("politeness", politeness_job)
    _submit(
        "neg_cache",
        lambda: cat.stage_overwrite("neg_cache", neg_next.coalesce(1)),
    )
    _submit("page_cache", cache_job)

    extracted_new = run_extraction(modified, e).persist(StorageLevel.DISK_ONLY)
    n_extracted = extracted_new.count()
    _mark("extract")

    # lineage (per-bucket metrics) and the extracted append consume the
    # just-materialized extract cache (+ already-persisted sl/meta/
    # failed) — overlap them with link discovery below
    lin = build_lineage(sl, fetched_meta, extracted_new, failed, e, ts)
    _submit(
        "extracted", lambda: cat.stage_append("extracted", extracted_new)
    )
    # lineage/neg_cache are ≤ P rows by construction — one file,
    # one task, instead of shuffle-partition-many empty files
    _submit("lineage", lambda: cat.stage_append("lineage", lin.coalesce(1)))

    # discovered out-links → canonicalize → unseen → new entries
    # (O-20/O-21). Candidates get their salted bucket up front so the
    # bloom probe is CO-PARTITIONED: each bucket's candidates meet that
    # bucket's filter row in a cogroup — no treeAggregate of the full
    # filter onto the driver (a ~12 GB collect per epoch at 10^10
    # sizing; union_blooms_tree remains for ad-hoc membership queries).
    hashed = inserted = None
    ins_parts: list[int] = []
    if cfg.follow_links:
        from hiispider_spark.functions.siphash import url_hash_udf

        # canonicalize + hash + bucket once, cache — the probe's two
        # branches (bloom-definite-new ∪ exact-checked) both read this.
        # Builders take column NAMES: memoized plan-build (canon.py
        # module notes), and withColumns batches the py4j round-trips.
        links = explode_items(extracted_new).select(
            F.col("payload").alias("link")
        )
        if cfg.scope_guard:
            from hiispider_spark.operators import scope as sco

            links = sco.filter_in_scope(links, url_col="link")
        hashed = (
            links
            .select(canonical_url_col("link").alias("url"))
            .dropDuplicates(["url"])
            .withColumns(
                {
                    "url_hash": url_hash_udf(F.col("url")),
                    "host": host_col("url"),
                    "salt": salt_col("url", cfg.n_salts),
                }
            )
            .withColumn(
                "part_id", part_id_col("host", "salt", cfg.n_partitions)
            )
            .persist()
        )
        # persisted, lazily materialized: the inserted job below is the
        # first (and, with the trap agg's broadcast subtree, second)
        # consumer — both inside ONE job, so the cache fills once and
        # no concurrent-first-use race exists (the write pool starts
        # only after the inserted collect)
        candidates = hashed
        if cfg.trap_guard:
            from hiispider_spark.operators import traps as tr

            # one agg pass over the (persisted) candidate set; the
            # flagged host list is tiny → broadcast anti-join, so trap
            # URLs never reach the bloom probe or the frontier
            tstats = tr.host_trap_stats(hashed, min_urls=cfg.trap_min_urls)
            candidates = tr.filter_traps(hashed, tstats)
        unseen = seen_ops.filter_unseen_partitioned(
            candidates, cat.read("seen_set"), cat.read("seen_exact"),
            cfg.bloom_m_bits,
        )
        inserted = new_frontier_entries(
            frontier, unseen, ts,
            cfg.n_partitions, cfg.n_salts, cfg.interval_s,
            # candidates already passed the seen-set exact check, and
            # seen_exact ⊇ frontier membership (same atomic commits, no
            # deletes) — the in-function frontier anti-join would shuffle
            # O(frontier) per epoch to learn nothing. They were also
            # deduped by canonical url before hashing (assume_unique):
            # re-deduping would shuffle the candidate set again.
            assume_new=True,
            assume_unique=True,
        ).persist()
        ins_per_part = inserted.groupBy("part_id").count().collect()
        ins_parts = sorted(r.part_id for r in ins_per_part)
        n_inserted = int(sum(r["count"] for r in ins_per_part))
        _mark("links_seen")
    else:
        n_inserted = 0

    requeued = requeue_fetched(fetched_meta.select(*FRONTIER_COLS), ts)
    if cfg.adaptive_recrawl:
        from hiispider_spark.operators import recrawl as rc

        # override the fixed interval with clamp(1/λ̂) from the rolled
        # counters; n_polls < 2 (no gap yet) keeps the row's interval_s
        span = (
            F.unix_timestamp(F.lit(ts).cast("timestamp"))
            - F.unix_timestamp("first_fetch_ts")
        ).cast("double")
        est = (F.col("n_polls") >= 2) & (span > 0)
        lam = rc.change_rate_col(
            F.col("n_polls"),
            F.col("n_changes"),
            span / (F.col("n_polls") - 1).cast("double"),
        )
        iv = F.when(
            est,
            rc.revisit_interval_col(
                lam, min_s=cfg.recrawl_min_s, max_s=cfg.recrawl_max_s
            ),
        ).otherwise(F.col("interval_s").cast("double"))
        requeued = (
            requeued.join(
                cache_rows.select(
                    "url_hash", "n_polls", "n_changes", "first_fetch_ts"
                ),
                "url_hash",
                "left",
            )
            .withColumn(
                "next_fetch_ts",
                F.lit(ts).cast("timestamp")
                + F.make_interval(secs=F.floor(iv).cast("double")),
            )
            .select(*FRONTIER_COLS)
        )
    backoff = requeue_failed(failed.select(*FRONTIER_COLS), ts)
    touched_all = sorted(set(touched) | set(ins_parts))
    if cfg.state_deltas:
        # merge-on-read commit: ONLY the rows this epoch changed —
        # requeued/backoff (schedule advanced), denied (state flips to
        # robots_denied, leaving the pending pool), inserted (new).
        # deferred/embargoed rows went back byte-unmodified — their
        # base-file copies stay authoritative, so they don't appear here.
        frontier_delta = (
            requeued.select(*FRONTIER_COLS)
            .unionByName(backoff.select(*FRONTIER_COLS))
            .unionByName(denied.select(*FRONTIER_COLS))
        )
        if inserted is not None:
            frontier_delta = frontier_delta.unionByName(
                inserted.select(*FRONTIER_COLS)
            )
        # fold-on-write: when the pre-write accounting already proves
        # the compaction bound will trip this epoch (prior staged delta
        # rows/file-sets plus this epoch's upper bound n_dequeued +
        # n_inserted ≥ the same bounds compact() checks post-write),
        # write the resolved buckets ONCE via stage_upsert_fold instead
        # of delta-append + immediate compact — identical end state,
        # half the write bytes, and the O(delta-buckets) rewrite moves
        # into the overlapped write pool instead of running serially
        # after it. The upper bound can fold at most one epoch earlier
        # than the post-write exact counts — strictly tighter on the
        # invariants the bounds protect (read fan-in, resolve key-set).
        fold_frontier = (
            cat.delta_count("frontier") + 1 >= cfg.compact_every
            or cat.delta_row_count("frontier") + n_dequeued + n_inserted
            >= cfg.compact_delta_rows
        )
        if not fold_frontier:
            # the 3-way union stacks ~3×P partitions → 3×P files; merge
            # narrow (no shuffle) down to a row-count-derived file count
            # (delta rows ≈ dequeued slice + inserts, already counted)
            frontier_delta = frontier_delta.coalesce(
                _delta_files(n_dequeued + n_inserted, cfg.n_partitions)
            )
        new_frontier = None
    else:
        # partition-level overwrite: only buckets this epoch touched
        # (dequeued from, or inserted into) are rewritten; all other
        # buckets carry over by manifest reference. ``resident`` = rows
        # of touched buckets that were NOT dequeued — read via
        # manifest-pruned bucket paths, never a full-table scan.
        resident = cat.read_parts("frontier", touched_all).join(
            sl.select("url_hash"), "url_hash", "left_anti"
        )
        new_frontier = (
            resident.select(*FRONTIER_COLS)
            .unionByName(requeued.select(*FRONTIER_COLS))
            .unionByName(backoff.select(*FRONTIER_COLS))
            .unionByName(denied.select(*FRONTIER_COLS))
            .unionByName(deferred)
            .unionByName(embargoed.select(*FRONTIER_COLS))  # retry post-TTL
        )
        if inserted is not None:
            new_frontier = new_frontier.unionByName(
                inserted.select(*FRONTIER_COLS)
            )
        new_frontier = new_frontier.repartition(cfg.n_partitions, "part_id")

    # frontier + seen writes are the last to become schedulable (they
    # need the inserted set); everything else is already in flight
    if cfg.state_deltas and fold_frontier:
        frontier_job = lambda: cat.stage_upsert_fold(  # noqa: E731
            "frontier", frontier_delta, "part_id",
            n_rows=n_dequeued + n_inserted,
        )
    elif cfg.state_deltas:
        frontier_job = lambda: cat.stage_append_delta(  # noqa: E731
            "frontier", frontier_delta, n_new_keys=n_inserted
        )
    else:
        frontier_job = lambda: cat.stage_overwrite_parts(  # noqa: E731
            "frontier", new_frontier, "part_id", touched_all
        )
    _submit("frontier", frontier_job)
    if cfg.follow_links and ins_parts:  # nothing new discovered → no-op
        if not cfg.state_deltas:
            # bare 8-byte hashes: a handful of files is plenty, and
            # the driver-side commit cost is per file. (In delta
            # mode seen_exact comes for free — a manifest reference
            # to the frontier delta files, added after the pool.)
            _submit("seen_exact", lambda: cat.stage_append(
                "seen_exact", inserted.select("url_hash").coalesce(8)
            ))
        _submit("seen_set", lambda: cat.stage_overwrite_parts(
            "seen_set",
            seen_ops.merge_partition_blooms(
                cat.read_parts("seen_set", ins_parts, "partition_id"),
                inserted.select("part_id", "url_hash"),
                cfg.bloom_m_bits,
            ),
            "partition_id",
            ins_parts,
        ))
    _mark("plan_writes")
    try:
        for f in futures:
            f.result()
    finally:
        pool.shutdown(wait=False)
    if cfg.state_deltas:
        if fold_frontier:
            # the fold wrote resolved bucket files and cleared every
            # frontier delta inside the pool — swap seen_exact to
            # reference exactly those bucket files (same move the
            # post-hoc compact branch makes) and record the fold as
            # this epoch's frontier compaction.
            cat.stage_append_ref(
                "seen_exact", cat.staged_part_rels("frontier"),
                replace=True,
            )
            compacted.append("frontier")
        elif ins_parts:
            # seen_exact ⊇ frontier membership and frontier rows are
            # never deleted → the just-written frontier delta (which
            # contains every inserted row's url_hash, plus harmless
            # already-seen duplicates) IS this epoch's seen_exact
            # append. Zero extra bytes written, one fewer write job.
            cat.stage_append_ref(
                "seen_exact", cat.staged_delta_rels("frontier")[-1:]
            )
        # fold deltas into base bucket files inside this transaction
        # when either bound trips: file-set count (read fan-in) or
        # accumulated delta rows (resolve key-set / broadcast size)
        for tbl in ("frontier", "page_cache", "politeness"):
            if (
                cat.delta_count(tbl) >= cfg.compact_every
                or cat.delta_row_count(tbl) >= cfg.compact_delta_rows
            ):
                cat.compact(tbl)
                compacted.append(tbl)
                if tbl == "frontier":
                    # membership ≡ the compacted frontier: swap
                    # seen_exact to reference exactly those bucket
                    # files — stays O(table) refs, never grows stale
                    cat.stage_append_ref(
                        "seen_exact",
                        cat.staged_part_rels("frontier"),
                        replace=True,
                    )
    _mark("writes")

    stats = {
        "epoch": e,
        "epoch_ts": ts,
        "n_dequeued": n_dequeued,
        "n_fetched": n_fetched,
        "n_extracted": n_extracted,
        "phase_walls": walls,
        "write_walls": write_walls,
        # observability for the read-amplification bound: which state
        # tables folded their deltas this epoch (bench artifacts show
        # the dequeue wall reset the epoch after)
        "compacted": compacted,
    }
    if cfg.collect_stats:
        # no jobs here: granted partitions into fetched ⊎ failed (the
        # fetch join keeps granted rows that exist in the page store,
        # failed is the anti-join remainder), and frontier_size comes
        # from manifest footer counters
        stats["n_granted"] = n_fetched + n_failed
        fs = cat.row_count("frontier")
        if fs is not None:
            stats["frontier_size"] = fs
    cat.commit(epoch=e)
    if compacted and cfg.vacuum_after_compact:
        # compaction just superseded this table's delta files and the
        # rewritten bucket dirs' old versions; reclaim them now (O(files)
        # driver-side, no job). Safe here: the commit landed and every
        # frame this epoch materialized is persisted or consumed.
        cat.vacuum()
    for df in (
        sl, bucketed, bucketed_raw, fetched, fetched_meta, failed,
        extracted_new, hashed, inserted,
    ):
        if df is not None:
            df.unpersist()
    return stats


def run_epochs(
    spark: SparkSession,
    cat: IcebergLike,
    pages: DataFrame,
    robots: DataFrame,
    n_epochs: int,
    cfg: EpochConfig = EpochConfig(),
) -> list[dict]:
    """Drive n micro-batches (the foreachBatch-style loop, O-2/O-28)."""
    return [run_epoch(spark, cat, pages, robots, cfg) for _ in range(n_epochs)]
