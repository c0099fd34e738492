"""Fixed StructType schemas for every engine table (SURVEY.md §1).

The reference (hiidef/hiispider) is schema-dynamic — Python dicts flowing
through Twisted Deferreds [hs: hiispider/pagegetter.py †]. We pin typed
schemas because the north-rule invariants (byte-identical extracted text,
exact dequeue ordering, exact URL-seen membership — BASELINE.json:14,15)
require a deterministic typed contract.
"""

from __future__ import annotations

from pyspark.sql import types as T

# D2 — Common-Crawl-style page store; exactly the BASELINE.json:15 hint.
PAGES = T.StructType(
    [
        T.StructField("url", T.StringType(), False),
        T.StructField("warc_ts", T.TimestampType(), False),
        T.StructField("html", T.BinaryType(), False),
        T.StructField("text", T.StringType(), False),
        T.StructField("lang", T.StringType(), False),
    ]
)

# D1 — the priority frontier (hiispider's MySQL job table + scheduler heap).
FRONTIER = T.StructType(
    [
        T.StructField("url", T.StringType(), False),
        T.StructField("url_hash", T.LongType(), False),
        T.StructField("host", T.StringType(), False),
        T.StructField("salt", T.IntegerType(), False),
        T.StructField("part_id", T.IntegerType(), False),
        T.StructField("priority", T.DoubleType(), False),
        T.StructField("next_fetch_ts", T.TimestampType(), False),
        T.StructField("interval_s", T.IntegerType(), False),
        T.StructField("retry_count", T.IntegerType(), False),
        T.StructField("state", T.StringType(), False),
        # O-10: the reference's "plugin/function" job type — which
        # extract plugin runs on this URL's fetched body
        T.StructField("plugin", T.StringType(), False),
    ]
)

SEEDS = T.StructType(
    [
        T.StructField("url", T.StringType(), False),
        T.StructField("priority", T.DoubleType(), False),
    ]
)

ROBOTS_RULE = T.StructType(
    [
        T.StructField("allow", T.BooleanType(), False),
        T.StructField("prefix", T.StringType(), False),
    ]
)

ROBOTS = T.StructType(
    [
        T.StructField("host", T.StringType(), False),
        T.StructField("rules", T.ArrayType(ROBOTS_RULE), False),
        T.StructField("crawl_delay", T.DoubleType(), False),
    ]
)

# D3 — URL-seen set: per-partition Bloom filters + exact backstop.
# Filters are stored as array<long> (little-endian 64-bit words, byte
# layout identical to the raw bitmap) so membership probes run as pure
# JVM Column expressions (element_at + shifts) — the byte-blob form
# forced the probe through Python, which measured ANTI-scaling under
# thread concurrency (8.4 s @4 threads → 10.3 s @16 on 5M candidates;
# the JVM probe does the same work in 2-3 s flat).
SEEN_SET = T.StructType(
    [
        T.StructField("partition_id", T.IntegerType(), False),
        T.StructField("bloom", T.ArrayType(T.LongType()), False),
        T.StructField("n_items", T.LongType(), False),
        T.StructField("fpp", T.DoubleType(), False),
    ]
)

SEEN_EXACT = T.StructType([T.StructField("url_hash", T.LongType(), False)])

# D3b — host-level negative cache: hosts with repeated failures are
# embargoed until a TTL expires [hs: hiispider/pagegetter.py (negative
# cache dicts) †]; request-level negative caching is the frontier's
# next_fetch_ts backoff itself.
NEG_CACHE = T.StructType(
    [
        T.StructField("host", T.StringType(), False),
        T.StructField("until_ts", T.TimestampType(), False),
        T.StructField("n_failures", T.LongType(), False),
    ]
)

# D2b — compact conditional-GET state: latest content digest per URL,
# updated incrementally per epoch (O(slice)) instead of re-aggregating
# the ever-growing ``extracted`` history [hs: hiispider/pagegetter.py
# (Cassandra cache read) †]. Bucketed by part_id like the frontier so
# partition-level commits apply.
PAGE_CACHE = T.StructType(
    [
        T.StructField("part_id", T.IntegerType(), False),
        T.StructField("url_hash", T.LongType(), False),
        T.StructField("content_sha1", T.StringType(), False),
        # change-history counters for adaptive recrawl
        # (operators/recrawl.py): polls, detected changes, first fetch.
        # Three narrow fields riding the same O(slice)/epoch update —
        # no extra table, no extra shuffle.
        T.StructField("n_polls", T.LongType(), False),
        T.StructField("n_changes", T.LongType(), False),
        T.StructField("first_fetch_ts", T.TimestampType(), False),
    ]
)

# D7 — politeness token-bucket state, persisted across epochs.
# part_id = pmod(xxhash64(host), P): host-hash buckets (no salt — state
# is per-host) so epochs commit only the buckets whose hosts they
# touched, like the frontier/page_cache (never an O(all-hosts) rewrite).
POLITENESS = T.StructType(
    [
        T.StructField("host", T.StringType(), False),
        T.StructField("crawl_delay", T.DoubleType(), False),
        T.StructField("tokens", T.DoubleType(), False),
        T.StructField("last_refill", T.TimestampType(), False),
        T.StructField("part_id", T.IntegerType(), False),
    ]
)

# D4/D5 — extracted results (+ per-item rows for delta computation).
EXTRACTED_ITEM = T.StructType(
    [
        T.StructField("item_hash", T.LongType(), False),
        T.StructField("payload", T.StringType(), False),
    ]
)

EXTRACTED = T.StructType(
    [
        T.StructField("url_hash", T.LongType(), False),
        T.StructField("url", T.StringType(), False),
        T.StructField("plugin", T.StringType(), False),
        T.StructField("text", T.StringType(), False),
        T.StructField("items", T.ArrayType(EXTRACTED_ITEM), True),
        T.StructField("content_sha1", T.StringType(), False),
        T.StructField("epoch", T.LongType(), False),
    ]
)

# D6 — per-partition per-epoch lineage/metrics (BASELINE.json:14).
LINEAGE = T.StructType(
    [
        T.StructField("epoch", T.LongType(), False),
        T.StructField("partition_id", T.IntegerType(), False),
        T.StructField("n_dequeued", T.LongType(), False),
        T.StructField("n_fetched", T.LongType(), False),
        T.StructField("n_extracted", T.LongType(), False),
        T.StructField("n_errors", T.LongType(), False),
        T.StructField("bytes", T.LongType(), False),
        T.StructField("t_start", T.TimestampType(), False),
        T.StructField("t_end", T.TimestampType(), False),
    ]
)

ALL_TABLES = {
    "pages": PAGES,
    "frontier": FRONTIER,
    "seeds": SEEDS,
    "robots": ROBOTS,
    "seen_set": SEEN_SET,
    "seen_exact": SEEN_EXACT,
    "neg_cache": NEG_CACHE,
    "page_cache": PAGE_CACHE,
    "politeness": POLITENESS,
    "extracted": EXTRACTED,
    "lineage": LINEAGE,
}


def empty_frame(spark, schema: T.StructType | str):
    """0-row DataFrame Catalyst can PROVE empty.

    ``spark.createDataFrame([], schema)`` is RDD-backed, so the
    optimizer cannot see through it and a join against it still plans
    a full exchange+sort (the empty politeness state cost every
    closed-form query a SortMergeJoin that AQE only rescued at
    runtime). A ``range(0)`` projection is a plan-time-empty relation:
    ``PropagateEmptyRelation`` folds outer joins / unions against it
    away entirely. Same rows (none), same schema names/types; columns
    come out nullable, which every consumer (outer-join echo, delta
    resolve union, parquet append) already tolerates.
    """
    from pyspark.sql import functions as F

    if isinstance(schema, str):
        schema = T.StructType.fromDDL(schema)
    return spark.range(0).select(
        *[F.lit(None).cast(f.dataType).alias(f.name) for f in schema.fields]
    )
