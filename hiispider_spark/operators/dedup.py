"""Deduplication operators for training-data pipelines.

Beyond the reference's request-identity dedup (O-19), a 100 TB crawl
corpus needs content-level dedup before training. Four tiers, each a
``queries()`` entry in the driver contract:

- exact:        hash the normalized text, keep the lowest doc id
- n-gram Jaccard: token-set similarity via explode + self-join (exact,
                  quadratic in candidates — used on bounded subsets or
                  as the verify stage after LSH)
- MinHash+LSH:  shingles → per-seed min-hash signature → banded
                bucket join → candidate pairs (sub-quadratic; the
                scale path); signatures are pure Column expressions
                (xxhash64 per seed + array_min) — no UDF, no
                per-row Python, one shuffle for the band join
- SimHash:      64-bit sign-sum fingerprint; near-dups differ in few
                bits (hamming ≤ t)

Scale notes: MinHash/LSH is the only one that survives 10^9 docs —
band-bucket join keys are (band_idx, band_hash), high-cardinality and
uniform, so the shuffle balances; the Jaccard verify runs only on
bucket-collision pairs.
"""

from __future__ import annotations

import logging

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

logger = logging.getLogger(__name__)

#: per-(band_idx, band_hash) candidate cap for the LSH self-joins. The
#: band join is quadratic WITHIN a bucket: band keys are uniform for
#: distinct texts, but 10M near-identical boilerplate docs (ubiquitous
#: at 100 TB — exact dedup removes only the byte-identical core) share
#: every band value and would mint ~10^14 candidate pairs in one
#: bucket. Ranking each bucket by doc_id and keeping the first CAP
#: bounds candidates at O(bands · n · cap/2) while the rank<=k filter
#: compiles to WindowGroupLimit (per-partition partial top-k BEFORE the
#: shuffle — the hot bucket never materializes, let alone sorts). Docs
#: beyond the cap in a bucket lose candidacy in that band only; the cap
#: is far above any observed bucket on the synthetic corpus (max
#: band-bucket size ≲ a few at sf0.1), so test/oracle output is
#: unchanged. NOT silent: pass log_dropped=True for an eager warning,
#: or monitor band_bucket_overflow() in a production pipeline.
DEFAULT_BUCKET_CAP = 512

#: strip the per-row uniqueness suffix the corpus synthesizer appends —
#: collapsing pages back to their source document, which gives the
#: sandbox a real duplicate-group structure to exercise.
UNIQ_SUFFIX_RE = r" #\d+$"


def normalized_text(text: Column) -> Column:
    return F.regexp_replace(text, UNIQ_SUFFIX_RE, "")


def exact_dedup_groups(docs: DataFrame, id_col: str, text_col: str) -> DataFrame:
    """Exact dedup: md5(normalized text) → group size + survivor id.

    Map-side-combinable hash aggregation; at 100 TB the only shuffle is
    the 16-byte digest + id pairs, never the text.
    """
    return (
        docs.select(
            F.col(id_col).alias("doc_id"),
            F.md5(normalized_text(F.col(text_col))).alias("text_hash"),
        )
        .groupBy("text_hash")
        .agg(
            F.count("*").alias("n_copies"),
            F.min("doc_id").alias("keep_doc_id"),
        )
    )


def tokens_col(text: Column) -> Column:
    """Whitespace tokens, empties removed (shared by dedup + textstats)."""
    return F.filter(F.split(text, " "), lambda t: t != "")


def ngram_jaccard_pairs(
    docs: DataFrame,
    id_col: str,
    text_col: str,
    n: int = 2,
    threshold: float = 0.5,
) -> DataFrame:
    """Exact token-n-gram Jaccard similarity for all pairs sharing ≥1
    n-gram: explode → equi-join on the n-gram → |∩| per pair → Jaccard.

    Output: (doc_a, doc_b, jaccard) with doc_a < doc_b, sim ≥ threshold.
    """
    toks = docs.select(
        F.col(id_col).alias("doc_id"), tokens_col(F.col(text_col)).alias("t")
    )
    # docs with fewer than n tokens have no n-grams: guard explicitly —
    # sequence(0,-1) would expand descending and emit a spurious partial
    # gram via concat_ws's null skipping (oracle twin emits none)
    gram_arr = F.when(
        F.size("t") >= n,
        F.array_distinct(
            F.transform(
                F.sequence(F.lit(0), F.size("t") - n),
                lambda i: F.concat_ws(" ", *[F.col("t")[i + j] for j in range(n)]),
            )
        ),
    ).otherwise(F.array().cast("array<string>"))
    grams = toks.select("doc_id", F.explode(gram_arr).alias("gram"))
    sizes = grams.groupBy("doc_id").agg(F.count("*").alias("n_grams"))
    a = grams.alias("a")
    b = grams.alias("b")
    inter = (
        a.join(b, (F.col("a.gram") == F.col("b.gram")) & (F.col("a.doc_id") < F.col("b.doc_id")))
        .groupBy(F.col("a.doc_id").alias("doc_a"), F.col("b.doc_id").alias("doc_b"))
        .agg(F.count("*").alias("n_inter"))
    )
    sa = sizes.select(F.col("doc_id").alias("doc_a"), F.col("n_grams").alias("na"))
    sb = sizes.select(F.col("doc_id").alias("doc_b"), F.col("n_grams").alias("nb"))
    return (
        inter.join(sa, "doc_a")
        .join(sb, "doc_b")
        .withColumn(
            "jaccard",
            F.round(
                F.col("n_inter")
                / (F.col("na") + F.col("nb") - F.col("n_inter")),
                6,
            ),
        )
        .filter(F.col("jaccard") >= threshold)
        .select("doc_a", "doc_b", "jaccard")
    )


def shingles_col(text: Column, k: int = 5) -> Column:
    """Character k-shingles (distinct) of the normalized text.

    Indices run 0..len-k inclusive so the final shingle is kept; texts
    shorter than k yield exactly one (whole-text) shingle.
    """
    return F.array_distinct(
        F.transform(
            F.sequence(F.lit(0), F.greatest(F.length(text) - k, F.lit(0))),
            lambda i: text.substr(i + 1, F.lit(k)),
        )
    )


def minhash_signature_cols(shingles: Column, n_hashes: int = 32) -> list[Column]:
    """n_hashes min-hash values, each = min over shingles of
    xxhash64(shingle, seed_i). Pure Column expressions — JVM-side."""
    return [
        F.array_min(
            F.transform(shingles, lambda s: F.xxhash64(s, F.lit(i)))
        ).alias(f"mh_{i}")
        for i in range(n_hashes)
    ]


def _stack_bands(banded: DataFrame, bands: int, extra: list[str] | None = None
                 ) -> DataFrame:
    """(doc_id, band_0..band_{B-1}[, extra]) → one row per (doc, band):
    (doc_id[, extra], band_idx, bh)."""
    return banded.select(
        "doc_id",
        *(extra or []),
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(b).alias("band_idx"), F.col(f"band_{b}").alias("bh")
                    )
                    for b in range(bands)
                ]
            )
        ).alias("e"),
    ).select("doc_id", *(extra or []), F.col("e.band_idx"), F.col("e.bh"))


def _cap_buckets(
    stacked: DataFrame, bucket_cap: int, order_col: str = "doc_id"
) -> DataFrame:
    """Keep the first ``bucket_cap`` rows (by ``order_col``, so the kept
    set is deterministic) of every (band_idx, bh) bucket. rank<=k over a
    window compiles to WindowGroupLimit: each input partition keeps at
    most cap rows per key BEFORE the shuffle, so a pathological 10M-row
    boilerplate bucket is bounded map-side."""
    w = Window.partitionBy("band_idx", "bh").orderBy(order_col)
    return (
        stacked.withColumn("_rk", F.row_number().over(w))
        .filter(F.col("_rk") <= bucket_cap)
        .drop("_rk")
    )


def band_bucket_overflow(
    stacked: DataFrame, bucket_cap: int = DEFAULT_BUCKET_CAP
) -> DataFrame:
    """Buckets whose membership exceeds ``bucket_cap`` — the
    no-silent-caps observability hook: (band_idx, bh, n_docs,
    n_dropped). A production dedup run logs/persists this beside the
    pair output (one map-side-combinable agg over the stacked frame)."""
    return (
        stacked.groupBy("band_idx", "bh")
        .agg(F.count("*").alias("n_docs"))
        .filter(F.col("n_docs") > bucket_cap)
        .select(
            "band_idx",
            "bh",
            "n_docs",
            (F.col("n_docs") - bucket_cap).alias("n_dropped"),
        )
    )


def _log_overflow(stacked: DataFrame, bucket_cap: int, what: str) -> None:
    """Eagerly count capped-away bucket membership and WARN (one extra
    aggregation job — the guard's observability cost when requested)."""
    rows = (
        band_bucket_overflow(stacked, bucket_cap)
        .agg(
            F.count("*").alias("n_buckets"),
            F.sum("n_dropped").alias("n_dropped"),
            F.max("n_docs").alias("max_bucket"),
        )
        .collect()[0]
    )
    if rows["n_buckets"]:
        logger.warning(
            "%s: bucket_cap=%d dropped %d doc-band rows across %d hot "
            "buckets (largest bucket: %d docs) — candidate recall is "
            "reduced for those buckets' members",
            what, bucket_cap, rows["n_dropped"], rows["n_buckets"],
            rows["max_bucket"],
        )


def _banded_pairs(stacked: DataFrame, bucket_cap: int | None) -> DataFrame:
    """Self-join the (doc_id, band_idx, bh) stack into candidate pairs
    (doc_a < doc_b, n_bands_hit), capping each bucket first."""
    if bucket_cap is not None:
        stacked = _cap_buckets(stacked, bucket_cap)
    a, b_ = stacked.alias("a"), stacked.alias("b")
    return (
        a.join(
            b_,
            (F.col("a.band_idx") == F.col("b.band_idx"))
            & (F.col("a.bh") == F.col("b.bh"))
            & (F.col("a.doc_id") < F.col("b.doc_id")),
        )
        .groupBy(
            F.col("a.doc_id").alias("doc_a"), F.col("b.doc_id").alias("doc_b")
        )
        .agg(F.count("*").alias("n_bands_hit"))
    )


def minhash_lsh_pairs(
    docs: DataFrame,
    id_col: str,
    text_col: str,
    n_hashes: int = 32,
    bands: int = 8,
    shingle_k: int = 5,
    bucket_cap: int | None = DEFAULT_BUCKET_CAP,
    log_dropped: bool = False,
) -> DataFrame:
    """MinHash + banded LSH candidate pairs (doc_a < doc_b, n_bands_hit).

    rows/band = n_hashes // bands; two docs collide if any band's
    signature slice matches exactly. Candidates should flow into
    :func:`ngram_jaccard_pairs` (or signature similarity) to verify.

    ``bucket_cap`` bounds the per-bucket self-join blowup on boilerplate
    corpora (see :data:`DEFAULT_BUCKET_CAP`); ``log_dropped=True`` pays
    one extra aggregation job to WARN what the cap discarded.
    """
    rows_per_band = n_hashes // bands
    base = docs.select(
        F.col(id_col).alias("doc_id"),
        shingles_col(normalized_text(F.col(text_col)), shingle_k).alias("sh"),
    )
    # single-pass fold (see simhash_col): one traversal carrying all
    # n_hashes running minima. xxhash64(s, i) with the fold's int index
    # column hashes the same (string, int32) pair as the old
    # xxhash64(s, lit(i)) — identical signatures.
    mins = F.aggregate(
        F.col("sh"),
        F.array_repeat(F.lit((1 << 63) - 1).cast("long"), n_hashes),
        lambda acc, s: F.transform(
            acc, lambda mn, i: F.least(mn, F.xxhash64(s, i))
        ),
    )
    sig = base.select("doc_id", mins.alias("_mins")).select(
        "doc_id",
        *[F.get("_mins", i).alias(f"mh_{i}") for i in range(n_hashes)],
    )
    band_cols = [
        F.xxhash64(
            *[F.col(f"mh_{b * rows_per_band + r}") for r in range(rows_per_band)]
        ).alias(f"band_{b}")
        for b in range(bands)
    ]
    stacked = _stack_bands(sig.select("doc_id", *band_cols), bands)
    if log_dropped and bucket_cap is not None:
        _log_overflow(stacked, bucket_cap, "minhash_lsh_pairs")
    return _banded_pairs(stacked, bucket_cap)


# ---- portable-hash MinHash (engine-portable → real value oracle) ----
# xxhash64 signatures (above) are the fast JVM path but DuckDB cannot
# mirror them, so that query is graded rows-only. This variant swaps
# the hash family for polynomial arithmetic both engines compute
# identically — (a_i·fp(shingle) + b_i) mod p over a char-rolling
# fp — turning MinHash+LSH into a full value-checked oracle query.
# Same banding topology, same shuffle shape; ~2-4× the per-row compute
# of xxhash64 (still pure Column exprs, WholeStageCodegen).

MINHASH_P = 1_000_000_007
_SM = (1 << 64) - 1


def _mh_splitmix(x: int) -> int:
    x = (x + 0x9E3779B97F4A7C15) & _SM
    x = ((x ^ (x >> 30)) * 0xBF58476D1CE4E5B9) & _SM
    x = ((x ^ (x >> 27)) * 0x94D049BB133111EB) & _SM
    return x ^ (x >> 31)


def minhash_coeffs(n_hashes: int) -> list[tuple[int, int]]:
    """Deterministic (a_i, b_i) pairs, a_i ∈ [1, p-1], b_i ∈ [0, p-1] —
    shared verbatim by the Spark exprs and the DuckDB oracle SQL."""
    return [
        (
            (_mh_splitmix(2 * i) % (MINHASH_P - 1)) + 1,
            _mh_splitmix(2 * i + 1) % MINHASH_P,
        )
        for i in range(n_hashes)
    ]


def char_fp_col(s: Column) -> Column:
    """Engine-portable polynomial hash of a string's characters:
    acc = (acc·31 + codepoint) mod p, acc₀ = 7. Every intermediate
    stays within int64. Empty string → 7 (the seed), matching the SQL
    twin's empty list_reduce prepend."""
    codes = F.when(
        F.length(s) >= 1,
        F.transform(
            F.sequence(F.lit(1), F.length(s)),
            lambda i: F.ascii(s.substr(i, F.lit(1))).cast("long"),
        ),
    ).otherwise(F.array().cast("array<long>"))
    return F.aggregate(
        codes,
        F.lit(7).cast("long"),
        lambda acc, c: (acc * 31 + c) % MINHASH_P,
    )


def minhash_lsh_pairs_portable(
    docs: DataFrame,
    id_col: str,
    text_col: str,
    n_hashes: int = 16,
    bands: int = 4,
    shingle_k: int = 5,
    bucket_cap: int | None = DEFAULT_BUCKET_CAP,
    log_dropped: bool = False,
) -> DataFrame:
    """MinHash + banded LSH with the portable hash family — identical
    output computable by the DuckDB oracle. Same (doc_a, doc_b,
    n_bands_hit) contract and hot-bucket cap as
    :func:`minhash_lsh_pairs`."""
    rows_per_band = n_hashes // bands
    coeffs = minhash_coeffs(n_hashes)
    base = docs.select(
        F.col(id_col).alias("doc_id"),
        shingles_col(normalized_text(F.col(text_col)), shingle_k).alias("sh"),
    )
    fps = base.select(
        "doc_id", F.transform("sh", char_fp_col).alias("fps")
    )
    # single-pass fold (see simhash_col): one aggregate carrying all
    # n_hashes running minima instead of n_hashes array traversals;
    # identical values — min over the same (a_i·fp + b_i) mod p set,
    # p as the fold identity (every perm value is < p)
    av = F.array(*[F.lit(a).cast("long") for a, _ in coeffs])
    bv = F.array(*[F.lit(b).cast("long") for _, b in coeffs])
    mins = F.aggregate(
        F.col("fps"),
        F.array_repeat(F.lit(MINHASH_P).cast("long"), n_hashes),
        lambda acc, h: F.transform(
            acc,
            lambda mn, i: F.least(mn, (F.get(av, i) * h + F.get(bv, i)) % MINHASH_P),
        ),
    )
    # materialize the fold ONCE as a named column before fanning out to
    # n_hashes extractions — CollapseProject keeps non-cheap aliases in
    # their own project, so the aggregate is never duplicated per column
    sig = fps.select("doc_id", mins.alias("_mins")).select(
        "doc_id",
        *[F.get("_mins", i).alias(f"mh_{i}") for i in range(n_hashes)],
    )
    band_cols = []
    for b in range(bands):
        acc = F.lit(7).cast("long")
        for r in range(rows_per_band):
            acc = (acc * 31 + F.col(f"mh_{b * rows_per_band + r}")) % MINHASH_P
        band_cols.append(acc.alias(f"band_{b}"))
    stacked = _stack_bands(sig.select("doc_id", *band_cols), bands)
    if log_dropped and bucket_cap is not None:
        _log_overflow(stacked, bucket_cap, "minhash_lsh_pairs_portable")
    return _banded_pairs(stacked, bucket_cap)


def simhash_col(tokens: Column) -> Column:
    """64-bit SimHash: per-bit sign-sum of token xxhash64 values.

    bit_b(sig) = 1 iff sum over tokens of (+1 if bit b of hash else -1) > 0.

    Single-pass fold: ONE aggregate over the token hashes carrying a
    64-counter array accumulator (transform-with-index updates all 64
    sign-sums per token), instead of 64 separate aggregates that each
    re-traverse the array. Higher-order functions are interpreted per
    element, so traversal count is the cost driver: measured 8× faster
    (10.9 s → 1.3 s, 5 k docs × 80 tokens) and bit-identical — per bit
    the ±1 sum accumulates in the same token order.
    """
    hashes = F.transform(tokens, lambda t: F.xxhash64(t))
    one = F.lit(1).cast("long")
    counts = F.aggregate(
        hashes,
        F.array_repeat(F.lit(0).cast("long"), 64),
        lambda acc, h: F.transform(
            acc,
            # shiftright via call_function: the index is a Column and
            # F.shiftright only takes a literal bit count
            lambda x, i: x
            + F.when(
                F.call_function("shiftright", h, i).bitwiseAND(F.lit(1))
                == 1,
                one,
            ).otherwise(-one),
        ),
    )
    return F.aggregate(
        F.zip_with(
            counts,
            F.sequence(F.lit(0), F.lit(63)),
            lambda c, b: F.when(
                c > 0, F.call_function("shiftleft", one, b)
            ).otherwise(F.lit(0).cast("long")),
        ),
        F.lit(0).cast("long"),
        lambda s, x: s + x,
    )


def simhash_near_dups(
    docs: DataFrame, id_col: str, text_col: str, max_hamming: int = 3
) -> DataFrame:
    """SimHash near-duplicate pairs within hamming distance ≤ t.

    Pigeonhole prefilter: with B > t blocks, any pair within hamming t
    shares at least one identical block, so the block equi-join is a
    lossless candidate generator; exact hamming filters after. B adapts
    to t (B = t+1, capped at 16 so blocks stay ≥4 bits and the join
    keys stay selective).
    """
    sig = docs.select(
        F.col(id_col).alias("doc_id"),
        simhash_col(tokens_col(normalized_text(F.col(text_col)))).alias("sig"),
    )
    return _blocked_hamming_pairs(sig, max_hamming, n_bits=64)


def _blocked_hamming_pairs(
    sig: DataFrame, max_hamming: int, n_bits: int
) -> DataFrame:
    """(doc_a, doc_b, hamming ≤ max_hamming) from a (doc_id, sig) frame
    via the pigeonhole block equi-join (see simhash_near_dups)."""
    n_blocks = min(max(max_hamming + 1, 2), 16)
    base, rem = divmod(n_bits, n_blocks)
    starts, widths = [], []
    pos = 0
    for i in range(n_blocks):
        w = base + (1 if i < rem else 0)
        starts.append(pos)
        widths.append(w)
        pos += w
    blocks = sig.select(
        "doc_id",
        "sig",
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(i).alias("blk_idx"),
                        F.shiftright("sig", starts[i])
                        .bitwiseAND(F.lit((1 << widths[i]) - 1))
                        .alias("blk"),
                    )
                    for i in range(n_blocks)
                ]
            )
        ).alias("e"),
    ).select("doc_id", "sig", F.col("e.blk_idx"), F.col("e.blk"))
    a, b = blocks.alias("a"), blocks.alias("b")
    cand = (
        a.join(
            b,
            (F.col("a.blk_idx") == F.col("b.blk_idx"))
            & (F.col("a.blk") == F.col("b.blk"))
            & (F.col("a.doc_id") < F.col("b.doc_id")),
        )
        .select(
            F.col("a.doc_id").alias("doc_a"),
            F.col("b.doc_id").alias("doc_b"),
            F.col("a.sig").alias("sig_a"),
            F.col("b.sig").alias("sig_b"),
        )
        .dropDuplicates(["doc_a", "doc_b"])
    )
    hamming = F.bit_count(F.col("sig_a").bitwiseXOR(F.col("sig_b")))
    return (
        cand.withColumn("hamming", hamming)
        .filter(F.col("hamming") <= max_hamming)
        .select("doc_a", "doc_b", "hamming")
    )


# ---- portable-hash SimHash (engine-portable → real value oracle) ----
# The xxhash64 SimHash above is the fast JVM path (rows-only grading).
# This variant derives each signature bit from an independent portable
# universal hash — bit_b(token) = ((a_b·fp(token) + c_b) mod p) mod 2,
# fp = the char-rolling polynomial both engines compute identically —
# so DuckDB mirrors the signature bit-for-bit and the pair set is value
# oracle-checked. 32 bits (not 64): the oracle reassembles sig as a sum
# of 1<<b terms, which must stay inside BIGINT on both engines. The
# per-bit sign-sum construction is standard SimHash (Charikar '02) with
# an explicit hash family instead of "bits of one 64-bit hash".


def simhash_coeffs(n_bits: int) -> list[tuple[int, int]]:
    """Deterministic (a_b, c_b), a ∈ [1,p-1], c ∈ [0,p-1] — disjoint
    splitmix stream from minhash_coeffs (offset 1000)."""
    return [
        (
            (_mh_splitmix(1000 + 2 * b) % (MINHASH_P - 1)) + 1,
            _mh_splitmix(1000 + 2 * b + 1) % MINHASH_P,
        )
        for b in range(n_bits)
    ]


def simhash_portable_col(tokens: Column, n_bits: int = 32) -> Column:
    """Engine-portable SimHash signature (pure integer arithmetic, all
    intermediates < p² < 2⁶³).

    Same single-pass fold as :func:`simhash_col` — one aggregate with
    an n_bits-counter accumulator; the per-bit (a_b, c_b) coefficients
    ride as literal arrays indexed by the transform's position column
    (bit-identical: each bit's ±1 sum accumulates in token order)."""
    fps = F.transform(tokens, char_fp_col)
    coeffs = simhash_coeffs(n_bits)
    av = F.array(*[F.lit(a).cast("long") for a, _ in coeffs])
    cv = F.array(*[F.lit(c).cast("long") for _, c in coeffs])
    one = F.lit(1).cast("long")
    counts = F.aggregate(
        fps,
        F.array_repeat(F.lit(0).cast("long"), n_bits),
        lambda acc, h: F.transform(
            acc,
            lambda x, i: x
            + F.when(
                ((F.get(av, i) * h + F.get(cv, i)) % MINHASH_P) % 2 == 1,
                one,
            ).otherwise(-one),
        ),
    )
    return F.aggregate(
        F.zip_with(
            counts,
            F.sequence(F.lit(0), F.lit(n_bits - 1)),
            lambda c, b: F.when(
                c > 0, F.call_function("shiftleft", one, b)
            ).otherwise(F.lit(0).cast("long")),
        ),
        F.lit(0).cast("long"),
        lambda s, x: s + x,
    )


def simhash_near_dups_portable(
    docs: DataFrame,
    id_col: str,
    text_col: str,
    max_hamming: int = 8,
    n_bits: int = 32,
) -> DataFrame:
    """SimHash near-dups with the portable hash family — identical
    output computable by the DuckDB oracle (which skips the lossless
    block prefilter and verifies all pairs directly; same result set).
    Same (doc_a, doc_b, hamming) contract as :func:`simhash_near_dups`.
    """
    sig = docs.select(
        F.col(id_col).alias("doc_id"),
        simhash_portable_col(
            tokens_col(normalized_text(F.col(text_col))), n_bits
        ).alias("sig"),
    )
    return _blocked_hamming_pairs(sig, max_hamming, n_bits=n_bits)
