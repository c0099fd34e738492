"""Distributed URL-seen set: per-partition Bloom filters unioned via
``RDD.treeAggregate`` + an exact anti-join backstop (SURVEY.md §2 O-20).

The reference approximates "seen" with page-cache existence plus a Redis
negative cache [hs: hiispider/pagegetter.py †] — fine at feed-poller
scale, impossible at a 10^10-URL frontier. BASELINE.json:6 mandates
"a distributed URL-seen set built from per-partition bloom/cuckoo
filters unioned via treeAggregate".

Design:
- every partition builds its filter **vectorized** (numpy bitwise ops
  over the whole partition's url_hash array — no per-row Python),
- filters are fixed-size byte arrays → union is bitwise OR, associative
  and commutative, so ``treeAggregate(depth=2)`` combines P partial
  filters in O(log P) driver rounds instead of P-way reduce at the
  driver (the reason bloom beats cuckoo here: trivial lossless union),
- membership is a broadcast of the unioned bytes + an Arrow
  ``pandas_udf`` doing the k probes vectorized,
- Bloom is a *prefilter only*: false positives would drop URLs, and the
  north rule requires URL-seen membership to match the reference
  exactly, so the authority is an exact anti-join on ``url_hash``
  against ``seen_exact`` — at scale the bloom cuts that join's probe
  side by ~(1 - fpp), e.g. 99% at fpp=0.01.

Sizing at 10^10 URLs (SURVEY.md §7): k=7, m/n ≈ 10 bits/key → fpp≈0.008;
10^10 keys ≈ 12.5 GB of filter total, split across P partitions'
``seen_set`` rows (e.g. P=10k → 1.25 MB per row) — each executor only
materializes the union lazily per query, or probes per-partition
filters co-partitioned with the frontier bucket.
"""

from __future__ import annotations

import math
from functools import lru_cache

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

DEFAULT_M_BITS = 1 << 24  # 16 Mbit = 2 MiB per filter (sandbox scale)
DEFAULT_K = 7


def _positions(h: np.ndarray, m_bits: int, k: int) -> np.ndarray:
    """Kirsch-Mitzenmacher double hashing: pos_i = h1 + i*h2 (mod m).

    ``h`` is uint64; m_bits must be a power of two. Returns (k, n) array.
    """
    mask = np.uint64(m_bits - 1)
    h1 = h & mask
    h2 = (h >> np.uint64(33)) | np.uint64(1)  # odd → full-period stride
    return np.stack(
        [(h1 + np.uint64(i) * h2) & mask for i in range(k)]
    )


def _insert(bloom: np.ndarray, hashes: np.ndarray, m_bits: int, k: int) -> None:
    pos = _positions(hashes.astype(np.uint64), m_bits, k).ravel()
    np.bitwise_or.at(bloom, (pos >> np.uint64(3)).astype(np.int64),
                     (np.uint8(1) << (pos & np.uint64(7)).astype(np.uint8)))


def _contains(bloom: np.ndarray, hashes: np.ndarray, m_bits: int, k: int) -> np.ndarray:
    pos = _positions(hashes.astype(np.uint64), m_bits, k)
    byte_idx = (pos >> np.uint64(3)).astype(np.int64)
    bit = (np.uint8(1) << (pos & np.uint64(7)).astype(np.uint8))
    return ((bloom[byte_idx] & bit) != 0).all(axis=0)


def estimated_fpp(n_items: int, m_bits: int, k: int = DEFAULT_K) -> float:
    if n_items == 0:
        return 0.0
    return (1.0 - math.exp(-k * n_items / m_bits)) ** k


def build_partition_blooms(
    df: DataFrame,
    m_bits: int = DEFAULT_M_BITS,
    k: int = DEFAULT_K,
) -> DataFrame:
    """Per-bucket Bloom filters for the ``seen_set`` table.

    ``df`` must carry (part_id, url_hash); each frontier bucket gets one
    filter built in a single vectorized pass over its url_hash array.
    """
    out_schema = T.StructType(
        [
            T.StructField("partition_id", T.IntegerType(), False),
            T.StructField("bloom", T.ArrayType(T.LongType()), False),
            T.StructField("n_items", T.LongType(), False),
            T.StructField("fpp", T.DoubleType(), False),
        ]
    )

    def per_group(pdf: pd.DataFrame) -> pd.DataFrame:
        bloom = np.zeros(m_bits // 8, dtype=np.uint8)
        h = pdf["url_hash"].to_numpy(dtype=np.int64).view(np.uint64)
        _insert(bloom, h, m_bits, k)
        n = len(h)
        return pd.DataFrame(
            {
                "partition_id": [int(pdf["part_id"].iloc[0])],
                # stored as int64 words (same little-endian bit layout
                # as the byte view) → probes stay JVM-side
                "bloom": [bloom.view(np.int64).tolist()],
                "n_items": [n],
                "fpp": [estimated_fpp(n, m_bits, k)],
            }
        )

    return (
        df.select("part_id", "url_hash")
        .groupBy("part_id")
        .applyInPandas(per_group, out_schema)
    )


def merge_partition_blooms(
    old_seen_set: DataFrame,
    new_items: DataFrame,
    m_bits: int = DEFAULT_M_BITS,
    k: int = DEFAULT_K,
) -> DataFrame:
    """Incremental seen-set update: OR the bloom of this epoch's new
    URLs into the existing per-partition filters — O(new) work instead
    of rebuilding over the whole frontier (the only shape that survives
    a 10^10-row frontier; rebuild would re-scan everything per epoch).

    ``new_items`` carries (part_id, url_hash). Partitions unseen so far
    get fresh rows; untouched partitions pass through unchanged.

    One cogroup pandas stage does the whole merge — old filter + new
    hashes meet per partition, the OR and the inserts run vectorized in
    numpy. The previous form (build new blooms in pandas → full-outer
    join → JVM ``zip_with`` OR) shipped every filter through an extra
    shuffle and evaluated an interpreted lambda per WORD of every
    filter (m_bits/64 evals × partitions, the write path's hot loop).
    Same bits by construction: OR of the same positions; ``fpp`` uses
    the same formula ``estimated_fpp`` already applies to fresh rows.
    """
    out_schema = T.StructType(
        [
            T.StructField("partition_id", T.IntegerType(), False),
            T.StructField("bloom", T.ArrayType(T.LongType()), False),
            T.StructField("n_items", T.LongType(), False),
            T.StructField("fpp", T.DoubleType(), False),
        ]
    )

    def merge(key, old: pd.DataFrame, new: pd.DataFrame) -> pd.DataFrame:
        if len(old):
            bloom = (
                np.asarray(old["bloom"].iloc[0], dtype=np.int64)
                .view(np.uint8)
                .copy()
            )
            for b in old["bloom"].iloc[1:]:  # defensive: ≤1 row/partition
                bloom |= np.asarray(b, dtype=np.int64).view(np.uint8)
            n_old = int(old["n_items"].sum())
        else:
            bloom = np.zeros(m_bits // 8, dtype=np.uint8)
            n_old = 0
        if len(new):
            h = new["url_hash"].to_numpy(dtype=np.int64).view(np.uint64)
            _insert(bloom, h, m_bits, k)
        n = n_old + len(new)
        return pd.DataFrame(
            {
                "partition_id": [int(key[0])],
                "bloom": [bloom.view(np.int64)],
                "n_items": [n],
                "fpp": [estimated_fpp(n, m_bits, k)],
            }
        )

    return (
        old_seen_set.groupby("partition_id")
        .cogroup(new_items.select("part_id", "url_hash").groupby("part_id"))
        .applyInPandas(merge, out_schema)
    )


def union_blooms_tree(
    seen_set: DataFrame, m_bits: int = DEFAULT_M_BITS, depth: int = 2
) -> bytes:
    """Union all per-partition filters via ``RDD.treeAggregate`` —
    the BASELINE.json:6 mandated combine. Bitwise OR is associative and
    commutative, so tree depth only changes latency, never the result."""
    n_bytes = m_bits // 8

    def seq(acc: np.ndarray, row) -> np.ndarray:
        words = np.asarray(row.bloom, dtype=np.int64).view(np.uint8)
        return acc | words

    def comb(a: np.ndarray, b: np.ndarray) -> np.ndarray:
        return a | b

    zero = np.zeros(n_bytes, dtype=np.uint8)
    out = seen_set.select("bloom").rdd.treeAggregate(zero, seq, comb, depth=depth)
    return out.tobytes()


def might_contain_udf(
    spark: SparkSession,
    bloom_bytes: bytes,
    m_bits: int = DEFAULT_M_BITS,
    k: int = DEFAULT_K,
):
    """Vectorized membership probe against a broadcast unioned filter.

    Returns a pandas_udf usable as ``filter(~udf(col("url_hash")))`` to
    prefilter "definitely unseen" URLs before the exact anti-join.
    """
    bc = spark.sparkContext.broadcast(bloom_bytes)

    @F.pandas_udf(T.BooleanType())
    def might_contain(url_hash: pd.Series) -> pd.Series:
        bloom = np.frombuffer(bc.value, dtype=np.uint8)
        h = url_hash.to_numpy(dtype=np.int64).view(np.uint64)
        return pd.Series(_contains(bloom, h, m_bits, k), index=url_hash.index)

    return might_contain


def bloom_might_contain_col(
    h, bloom, m_bits: int, k: int = DEFAULT_K
):
    """Bloom membership as a pure Column expression over an
    ``array<long>`` filter — Kirsch-Mitzenmacher double hashing,
    bit-identical to the numpy ``_contains`` (KAT-tested).

    Whole-stage codegen, zero Python: the byte-blob probe ran through
    applyInPandas and measured ANTI-scaling under thread concurrency
    (8.4 s @4 threads → 10.3 s @16 for 5M candidates — Arrow/pandas
    memory traffic, not compute); this expression does the same probes
    in 2-3 s flat and scales with the scan that contains it.
    """
    if isinstance(h, str) and isinstance(bloom, str):
        # memoized plan-build: ~0.7 s of py4j round-trips per build,
        # once per epoch on the hot path (cached Column trees are
        # reusable across plans — functions/canon.py module notes)
        return _bloom_probe_named(h, bloom, m_bits, k)
    return _bloom_probe_build(h, bloom, m_bits, k)


@lru_cache(maxsize=32)
def _bloom_probe_named(h: str, bloom: str, m_bits: int, k: int):
    return _bloom_probe_build(F.col(h), F.col(bloom), m_bits, k)


def _bloom_probe_build(h, bloom, m_bits: int, k: int):
    mask = m_bits - 1
    # two's-complement & gives the correct low bits for negative hashes
    h1 = h.bitwiseAND(F.lit(mask))
    h2 = F.call_function("shiftrightunsigned", h, F.lit(33)).bitwiseOR(F.lit(1))
    cond = None
    for i in range(k):
        pos = (h1 + F.lit(i) * h2).bitwiseAND(F.lit(mask))
        word = F.element_at(bloom, (F.shiftright(pos, 6) + F.lit(1)).cast("int"))
        hit = (
            F.call_function(
                "shiftrightunsigned", word, pos.bitwiseAND(F.lit(63))
            ).bitwiseAND(F.lit(1))
            == 1
        )
        cond = hit if cond is None else (cond & hit)
    return cond


def filter_unseen_partitioned(
    candidates: DataFrame,
    seen_set: DataFrame,
    seen_exact: DataFrame,
    m_bits: int = DEFAULT_M_BITS,
    k: int = DEFAULT_K,
    broadcast_filters: bool = True,
) -> DataFrame:
    """Per-bucket bloom prefilter + exact anti-join (the 10^10 shape).

    ``candidates`` must carry (url_hash, part_id) where part_id is the
    same salted bucket function the frontier uses — a seen URL's bloom
    bits live exactly in its own bucket's filter, so probing only that
    bucket is equivalent to probing the global union (with *better*
    fpp). Never a treeAggregate of the union onto the driver (a ~12 GB
    collect per epoch at 10^10 sizing; union_blooms_tree remains for
    ad-hoc membership queries).

    ``broadcast_filters=True`` (default): join each candidate to its
    bucket's filter row with a broadcast hash join and evaluate
    :func:`bloom_might_contain_col` in the same codegen stage — the
    build-side array is referenced in place, never copied per row (a
    sort-merge join WOULD materialize the 2 MB array into every joined
    row — that is why the hint is explicit). Right whenever the filter
    set fits a broadcast (sandbox: 32 × 2 MiB; a 10^10 deployment at
    P=10k × 1.25 MB = 12.5 GB does not) — set False there to use the
    co-partitioned cogroup probe, which moves each filter row to its
    candidates' executor exactly once.

    Bloom semantics unchanged: no false negatives, so bloom-negative
    rows are definitely unseen; bloom-positive rows go to the exact
    anti-join authority.
    """
    if broadcast_filters:
        blooms = seen_set.select(
            F.col("partition_id").alias("part_id"), "bloom"
        )
        flagged = candidates.join(F.broadcast(blooms), "part_id", "left")
        flagged = flagged.withColumn(
            "_maybe_seen",
            F.when(F.col("bloom").isNull(), F.lit(False)).otherwise(
                bloom_might_contain_col("url_hash", "bloom", m_bits, k)
            ),
        ).drop("bloom")
    else:
        out_schema = T.StructType(
            list(candidates.schema.fields)
            + [T.StructField("_maybe_seen", T.BooleanType(), False)]
        )

        def probe(key, cand: pd.DataFrame, blooms: pd.DataFrame) -> pd.DataFrame:
            if cand.empty or blooms.empty:
                return cand.assign(_maybe_seen=np.zeros(len(cand), dtype=bool))
            words = np.asarray(blooms["bloom"].iloc[0], dtype=np.int64)
            bloom = words.view(np.uint8)
            for b in blooms["bloom"].iloc[1:]:  # defensive: ≤1 row per bucket
                bloom = bloom | np.asarray(b, dtype=np.int64).view(np.uint8)
            h = cand["url_hash"].to_numpy(dtype=np.int64).view(np.uint64)
            return cand.assign(_maybe_seen=_contains(bloom, h, m_bits, k))

        flagged = (
            candidates.groupby("part_id")
            .cogroup(seen_set.groupby("partition_id"))
            .applyInPandas(probe, out_schema)
        )
    definitely_new = flagged.filter(~F.col("_maybe_seen")).drop("_maybe_seen")
    checked = (
        flagged.filter(F.col("_maybe_seen"))
        .drop("_maybe_seen")
        .join(seen_exact, "url_hash", "left_anti")
    )
    return definitely_new.unionByName(checked)


def filter_unseen(
    new_urls: DataFrame,
    seen_exact: DataFrame,
    spark: SparkSession | None = None,
    bloom_bytes: bytes | None = None,
    m_bits: int = DEFAULT_M_BITS,
    k: int = DEFAULT_K,
) -> DataFrame:
    """URLs (with url_hash) not yet seen (O-20).

    Bloom has no false negatives, so ``might_contain == False`` proves
    a URL unseen — those rows skip the join entirely. Only the bloom
    positives (true hits + fpp false alarms) probe the exact anti-join,
    which keeps membership exact. At 10^10 scale this cuts the join's
    probe side to (hit-rate + fpp) of the candidates.
    """
    if bloom_bytes is None or spark is None:
        return new_urls.join(seen_exact, "url_hash", "left_anti")
    probe = might_contain_udf(spark, bloom_bytes, m_bits, k)
    flagged = new_urls.withColumn("_maybe_seen", probe(F.col("url_hash")))
    definitely_new = flagged.filter(~F.col("_maybe_seen")).drop("_maybe_seen")
    needs_check = flagged.filter(F.col("_maybe_seen")).drop("_maybe_seen")
    checked = needs_check.join(seen_exact, "url_hash", "left_anti")
    return definitely_new.unionByName(checked)
