"""Per-partition cuckoo filters: the DELETABLE URL-seen variant.

BASELINE.json's north star names "per-partition bloom/cuckoo filters"
for the URL-seen set. seen.py implements the bloom side and documents
why bloom is the epoch-path default (lossless bitwise-OR union →
treeAggregate). The cuckoo filter (Fan, Andersen, Kaminsky,
Mitzenmacher, "Cuckoo Filter: Practically Better than Bloom",
CoNEXT 2014 — public algorithm, implemented fresh) completes the
mandate with the capability bloom fundamentally lacks: **deletion**.

Crawl use: retraction. A force-recrawl ("treat these URLs as never
seen" — operator action, site migration, corrupted fetch epoch) is a
*delete* from the seen structure. With blooms that means rebuilding a
partition's filter from its key set; with cuckoo filters it is an
O(changed) per-partition fingerprint removal — same partition-level
commit shape as every other state table here.

Layout: ``n_buckets`` (power of two) × 4 slots × uint16 fingerprints
(0 = empty). fp is derived from the high bits of the 64-bit url_hash
(never 0); candidate buckets i1 = h mod m, i2 = i1 XOR hash(fp) — the
partial-key cuckoo property that lets eviction relocate entries
knowing only the fingerprint. Eviction walks are DETERMINISTIC
(victim slot from a splitmix of the kick counter, not an RNG) so a
rebuilt filter is byte-identical at any parallelism — the resumable-
pipeline property the rest of the engine keeps.

Scale shape: one filter row per frontier partition (exactly like
seen_set bloom rows); inserts/deletes/probes are numpy over the
partition's key array inside applyInPandas — the only Python-level
loop is the (rare) eviction chain. Bulk placement is wave-vectorized:
wave 1 fills free i1 slots for the whole batch at once, wave 2 the i2
slots, and only the residue (empty at the load factors we size for —
≤0.84 with b=4 per the paper) walks evictions.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

SLOTS = 4  # b=4 sustains ~95% load (paper §5); we size for ≤0.84
MAX_KICKS = 500
_FP_MULT = np.uint64(0x9E3779B97F4A7C15)  # Fibonacci hashing for i2


def _fingerprint(h: np.ndarray) -> np.ndarray:
    """16-bit nonzero fingerprint from the hash's high bits."""
    fp = (h >> np.uint64(48)).astype(np.uint64) & np.uint64(0xFFFF)
    return np.where(fp == 0, np.uint64(1), fp).astype(np.uint64)


def _bucket1(h: np.ndarray, n_buckets: int) -> np.ndarray:
    return (h & np.uint64(n_buckets - 1)).astype(np.uint64)


def _alt_bucket(i: np.ndarray, fp: np.ndarray, n_buckets: int) -> np.ndarray:
    with np.errstate(over="ignore"):  # uint64 wraparound is the intent
        return (i ^ ((fp * _FP_MULT) >> np.uint64(32))) & np.uint64(n_buckets - 1)


def _splitmix(x: np.uint64) -> np.uint64:
    with np.errstate(over="ignore"):  # uint64 wraparound is the intent
        z = np.uint64(x) + np.uint64(0x9E3779B97F4A7C15)
        z = (z ^ (z >> np.uint64(30))) * np.uint64(0xBF58476D1CE4E5B9)
        z = (z ^ (z >> np.uint64(27))) * np.uint64(0x94D049BB133111EB)
        return z ^ (z >> np.uint64(31))


def empty_filter(n_buckets: int) -> np.ndarray:
    """(n_buckets, SLOTS) uint16 table; 0 = empty slot."""
    if n_buckets & (n_buckets - 1):
        raise ValueError("n_buckets must be a power of two")
    return np.zeros((n_buckets, SLOTS), dtype=np.uint16)


def _wave_place(table: np.ndarray, buckets: np.ndarray, fps: np.ndarray) -> np.ndarray:
    """Vectorized placement wave: for each (bucket, fp), claim a free
    slot if one exists. Returns boolean placed-mask. Items hitting the
    same bucket in one wave are serialized by a stable sort so each
    claims a distinct slot."""
    placed = np.zeros(len(buckets), dtype=bool)
    if len(buckets) == 0:
        return placed
    order = np.argsort(buckets, kind="stable")
    free = (table[buckets] == 0).sum(axis=1)  # free slots per item's bucket
    # rank of each item within its bucket group (0,1,2,...)
    b_sorted = buckets[order]
    new_group = np.ones(len(b_sorted), dtype=bool)
    new_group[1:] = b_sorted[1:] != b_sorted[:-1]
    idx_in_group = np.arange(len(b_sorted)) - np.maximum.accumulate(
        np.where(new_group, np.arange(len(b_sorted)), 0)
    )
    fits = idx_in_group < free[order]
    # fill sequentially only for the fitting items (python loop over
    # the fitting residue is bounded by batch size; each hit is O(b))
    for j in order[fits]:
        row = table[buckets[j]]
        slot = int(np.argmax(row == 0))
        if row[slot] != 0:
            continue
        row[slot] = fps[j]
        placed[j] = True
    return placed


def insert(table: np.ndarray, hashes: np.ndarray) -> int:
    """Insert hashes (uint64 view of int64 url_hash). Returns the
    number NOT placed (0 unless the filter is overfull — callers size
    n_buckets*SLOTS ≥ n/0.84)."""
    n_buckets = table.shape[0]
    h = hashes.astype(np.uint64)
    fp = _fingerprint(h)
    i1 = _bucket1(h, n_buckets)
    i2 = _alt_bucket(i1, fp, n_buckets)
    placed = _wave_place(table, i1, fp)
    rem = ~placed
    placed2 = np.zeros_like(placed)
    placed2[rem] = _wave_place(table, i2[rem], fp[rem])
    failed = 0
    for j in np.nonzero(~(placed | placed2))[0]:
        if not _insert_one(table, int(i1[j]), int(fp[j])):
            failed += 1
    return failed


def _insert_one(table: np.ndarray, i: int, fp: int) -> bool:
    n_buckets = table.shape[0]
    cur_i, cur_fp = i, np.uint64(fp)
    for kick in range(MAX_KICKS):
        row = table[cur_i]
        slot = int(np.argmax(row == 0))
        if row[slot] == 0:
            row[slot] = cur_fp
            return True
        alt = int(
            _alt_bucket(np.uint64(cur_i), np.uint64(cur_fp), n_buckets)
        )
        if (table[alt] == 0).any():
            cur_i = alt
            continue
        # deterministic victim: splitmix(kick counter ^ bucket).
        # int() BEFORE the modulo: np.uint64 % python-int promotes to
        # float64 and zeroes the low bits (victim would always be 0,
        # which cycles the walk — found by measurement)
        victim = int(_splitmix(np.uint64(kick * 1315423911 + cur_i))) % SLOTS
        cur_fp, table[cur_i][victim] = np.uint64(table[cur_i][victim]), cur_fp
        cur_i = int(
            _alt_bucket(np.uint64(cur_i), np.uint64(cur_fp), n_buckets)
        )
    return False


def contains(table: np.ndarray, hashes: np.ndarray) -> np.ndarray:
    """Vectorized membership: fp present in bucket i1 or i2. No false
    negatives for inserted-and-not-deleted keys."""
    n_buckets = table.shape[0]
    h = hashes.astype(np.uint64)
    fp = _fingerprint(h).astype(np.uint16)
    i1 = _bucket1(h, n_buckets)
    i2 = _alt_bucket(i1, fp.astype(np.uint64), n_buckets)
    in1 = (table[i1.astype(np.int64)] == fp[:, None]).any(axis=1)
    in2 = (table[i2.astype(np.int64)] == fp[:, None]).any(axis=1)
    return in1 | in2


def delete(table: np.ndarray, hashes: np.ndarray) -> int:
    """Remove one fingerprint copy per key (either bucket). Returns the
    number of keys whose fp was not found (never inserted — deleting a
    non-member is a caller bug in cuckoo filters, reported not raised)."""
    n_buckets = table.shape[0]
    h = hashes.astype(np.uint64)
    fps = _fingerprint(h).astype(np.uint16)
    i1s = _bucket1(h, n_buckets)
    missing = 0
    for j in range(len(h)):
        fp = fps[j]
        i1 = int(i1s[j])
        i2 = int(_alt_bucket(np.uint64(i1), np.uint64(fp), n_buckets))
        for b in (i1, i2):
            hit = np.nonzero(table[b] == fp)[0]
            if len(hit):
                table[b][int(hit[0])] = 0
                break
        else:
            missing += 1
    return missing


# ------------------------------------------------------------- Spark layer
FILTER_SCHEMA = T.StructType(
    [
        T.StructField("part_id", T.IntegerType(), False),
        T.StructField("cuckoo", T.BinaryType(), False),
    ]
)


def build_partition_filters(
    hashed: DataFrame,
    n_buckets: int,
    part_col: str = "part_id",
    hash_col: str = "url_hash",
) -> DataFrame:
    """One cuckoo filter per partition from that partition's url_hash
    set — the deletable twin of seen.build_partition_blooms."""

    def per_group(pdf: pd.DataFrame) -> pd.DataFrame:
        table = empty_filter(n_buckets)
        insert(table, pdf[hash_col].to_numpy().view(np.uint64))
        return pd.DataFrame(
            {"part_id": [int(pdf[part_col].iloc[0])], "cuckoo": [table.tobytes()]}
        )

    return (
        hashed.select(part_col, hash_col)
        .groupBy(part_col)
        .applyInPandas(per_group, FILTER_SCHEMA)
    )


def apply_deletions(
    filters: DataFrame,
    deletions: DataFrame,
    n_buckets: int,
    part_col: str = "part_id",
    hash_col: str = "url_hash",
) -> DataFrame:
    """Force-recrawl path: remove the deleted keys' fingerprints from
    their partitions' filters — O(changed) per partition, co-grouped so
    each filter row meets only its own deletions; untouched partitions
    pass through byte-identical."""

    def per_group(key, fl: pd.DataFrame, dels: pd.DataFrame) -> pd.DataFrame:
        if fl.empty:
            return pd.DataFrame(
                {
                    "part_id": pd.Series([], dtype="int32"),
                    "cuckoo": pd.Series([], dtype=object),
                }
            )
        raw = fl["cuckoo"].iloc[0]
        if dels.empty:
            return pd.DataFrame({"part_id": [key[0]], "cuckoo": [bytes(raw)]})
        table = (
            np.frombuffer(bytes(raw), dtype=np.uint16)
            .reshape(n_buckets, SLOTS)
            .copy()
        )
        delete(table, dels[hash_col].to_numpy().view(np.uint64))
        return pd.DataFrame({"part_id": [key[0]], "cuckoo": [table.tobytes()]})

    return filters.groupBy(part_col).cogroup(
        deletions.select(part_col, hash_col).groupBy(part_col)
    ).applyInPandas(per_group, FILTER_SCHEMA)


def might_contain_col(
    filters_bytes: bytes, n_buckets: int, hash_col: str = "url_hash"
):
    """Arrow-vectorized membership probe against one filter's bytes."""
    table = np.frombuffer(filters_bytes, dtype=np.uint16).reshape(
        n_buckets, SLOTS
    )

    @F.pandas_udf("boolean")
    def probe(h: pd.Series) -> pd.Series:
        return pd.Series(
            contains(table, h.to_numpy().view(np.uint64))
        )

    return probe(F.col(hash_col))
