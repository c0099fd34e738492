"""Dedup operators: exact groups, n-gram Jaccard, MinHash/LSH, SimHash."""

from __future__ import annotations

from pyspark.sql import functions as F

from hiispider_spark.operators import dedup as dd


def _docs(spark, rows):
    return spark.createDataFrame(rows, "doc_id long, text string")


def test_exact_dedup_groups(spark):
    docs = _docs(
        spark,
        [
            (1, "alpha beta"),
            (2, "alpha beta"),
            (3, "alpha beta #42"),  # uniqueness suffix is normalized away
            (4, "gamma delta"),
        ],
    )
    got = {
        r.keep_doc_id: r.n_copies
        for r in dd.exact_dedup_groups(docs, "doc_id", "text").collect()
    }
    assert got == {1: 3, 4: 1}


def test_ngram_jaccard_exact_values(spark):
    docs = _docs(
        spark,
        [
            (1, "a b c d e"),          # bigrams: ab bc cd de
            (2, "a b c d x"),          # bigrams: ab bc cd dx  → |∩|=3 |∪|=5
            (3, "zz yy"),
        ],
    )
    rows = dd.ngram_jaccard_pairs(docs, "doc_id", "text", n=2, threshold=0.1).collect()
    assert len(rows) == 1
    r = rows[0]
    assert (r.doc_a, r.doc_b) == (1, 2)
    assert abs(r.jaccard - 3 / 5) < 1e-9


def test_minhash_identical_docs_collide_in_all_bands(spark):
    docs = _docs(spark, [(1, "the quick brown fox " * 5), (2, "the quick brown fox " * 5)])
    rows = dd.minhash_lsh_pairs(docs, "doc_id", "text", n_hashes=32, bands=8).collect()
    assert len(rows) == 1
    assert rows[0].n_bands_hit == 8


def test_minhash_near_dup_collides_somewhere(spark):
    base = "the quick brown fox jumps over the lazy dog again and again " * 4
    docs = _docs(spark, [(1, base), (2, base + "tail"), (3, "completely different words entirely")])
    pairs = {(r.doc_a, r.doc_b) for r in dd.minhash_lsh_pairs(docs, "doc_id", "text").collect()}
    assert (1, 2) in pairs
    assert (1, 3) not in pairs and (2, 3) not in pairs


def test_simhash_identical_zero_hamming(spark):
    docs = _docs(spark, [(1, "w1 w2 w3 w4 w5 w6"), (2, "w1 w2 w3 w4 w5 w6")])
    rows = dd.simhash_near_dups(docs, "doc_id", "text", max_hamming=0).collect()
    assert [(r.doc_a, r.doc_b, r.hamming) for r in rows] == [(1, 2, 0)]


def test_simhash_near_dup_small_hamming(spark):
    words = " ".join(f"tok{i}" for i in range(60))
    docs = _docs(spark, [(1, words), (2, words + " extra"), (3, " ".join(f"z{i}" for i in range(60)))])
    rows = {(r.doc_a, r.doc_b): r.hamming for r in dd.simhash_near_dups(docs, "doc_id", "text", max_hamming=10).collect()}
    assert (1, 2) in rows
    assert (1, 3) not in rows


def test_pages_corpus_dup_structure(spark, tiny_pages):
    """The synthetic corpus collapses to its source documents after
    normalization — n_pages/n_docs copies per group."""
    pages = tiny_pages.select(F.col("i").alias("doc_id"), "text")
    groups = dd.exact_dedup_groups(pages, "doc_id", "text")
    assert groups.count() == 400  # 400 pages over 500 docs → 400 groups
    assert groups.agg(F.max("n_copies")).first()[0] == 1


def test_minhash_portable_matches_python_reference(spark):
    """The portable-hash MinHash+LSH (engine-portable oracle variant)
    reproduces an independent pure-Python computation bit-for-bit."""
    import itertools
    from collections import Counter

    texts = {
        0: "abcdefgh",
        1: "abcdefgx",
        2: "zzzzzzzz",
        3: "ab",
        4: "abcdefgh",  # exact copy of 0 → must collide in every band
    }
    docs = spark.createDataFrame(
        sorted(texts.items()), "doc_id long, text string"
    )
    got = {
        (r.doc_a, r.doc_b): r.n_bands_hit
        for r in dd.minhash_lsh_pairs_portable(
            docs, "doc_id", "text", n_hashes=8, bands=2
        ).collect()
    }

    def shingles(t, k=5):
        return list(dict.fromkeys(t[i : i + k] for i in range(max(len(t) - k, 0) + 1)))

    def fp(s):
        acc = 7
        for ch in s:
            acc = (acc * 31 + ord(ch)) % dd.MINHASH_P
        return acc

    coeffs = dd.minhash_coeffs(8)

    def band_vals(t, bands=2):
        fps = [fp(s) for s in shingles(t)]
        sig = [min((a * x + b) % dd.MINHASH_P for x in fps) for a, b in coeffs]
        rpb = len(sig) // bands
        out = []
        for b in range(bands):
            acc = 7
            for r in range(rpb):
                acc = (acc * 31 + sig[b * rpb + r]) % dd.MINHASH_P
            out.append((b, acc))
        return out

    bv = {d: band_vals(t) for d, t in texts.items()}
    expected = Counter()
    for a, b in itertools.combinations(sorted(texts), 2):
        hits = sum(1 for x, y in zip(bv[a], bv[b]) if x == y)
        if hits:
            expected[(a, b)] = hits
    assert got == dict(expected)
    assert got[(0, 4)] == 2  # identical texts collide in every band


# ---- hot-bucket cap (boilerplate blowup guard) -------------------------

def _boilerplate(spark, n, family="all work and no play makes a dull crawl "):
    # ' #%d' is the corpus uniqueness suffix — normalized away, so all n
    # docs share every shingle, every signature, every band bucket
    return _docs(spark, [(i, f"{family * 3}#{i}") for i in range(n)])


def test_bucket_cap_bounds_boilerplate_candidates(spark):
    """A planted boilerplate family lands in ONE bucket per band;
    uncapped the self-join mints O(n²) pairs, capped it is O(cap²) —
    with the kept set deterministic (lowest doc_ids)."""
    docs = _boilerplate(spark, 1000)
    capped = dd.minhash_lsh_pairs(
        docs, "doc_id", "text", n_hashes=32, bands=8, bucket_cap=16
    ).collect()
    # 16 kept docs → C(16,2) pairs, every pair hitting all 8 bands
    assert len(capped) == 16 * 15 // 2
    assert all(r.n_bands_hit == 8 for r in capped)
    ids = {r.doc_a for r in capped} | {r.doc_b for r in capped}
    assert ids == set(range(16))  # deterministic keep: lowest doc_ids
    # O(cap·n·bands) candidate bound, vs ~500k uncapped
    assert len(capped) <= 16 * 1000 * 8


def test_bucket_cap_overflow_is_observable(spark):
    """No silent caps: band_bucket_overflow reports exactly what the
    cap discards (8 bands × one hot bucket × (n - cap) docs)."""
    docs = _boilerplate(spark, 300)
    sig = docs.select(
        F.col("doc_id"),
        dd.shingles_col(dd.normalized_text(F.col("text")), 5).alias("sh"),
    ).select(
        "doc_id",
        *[
            F.array_min(
                F.transform(F.col("sh"), lambda s, i=i: F.xxhash64(s, F.lit(i)))
            ).alias(f"mh_{i}")
            for i in range(32)
        ],
    )
    band_cols = [
        F.xxhash64(*[F.col(f"mh_{b * 4 + r}") for r in range(4)]).alias(
            f"band_{b}"
        )
        for b in range(8)
    ]
    stacked = dd._stack_bands(sig.select("doc_id", *band_cols), 8)
    ov = dd.band_bucket_overflow(stacked, bucket_cap=50).collect()
    assert len(ov) == 8  # one hot bucket per band
    assert all(r.n_docs == 300 and r.n_dropped == 250 for r in ov)


def test_bucket_cap_noop_below_cap_and_logs_above(spark, caplog):
    """Cap never binding → byte-identical output to uncapped (the
    oracle-safety property); log_dropped WARNs when it does bind."""
    import logging as _logging

    docs = _docs(
        spark,
        [(1, "alpha beta gamma delta " * 4), (2, "alpha beta gamma delta " * 4),
         (3, "omega psi chi phi " * 4)],
    )
    base = sorted(
        (r.doc_a, r.doc_b, r.n_bands_hit)
        for r in dd.minhash_lsh_pairs(
            docs, "doc_id", "text", bucket_cap=None
        ).collect()
    )
    capped = sorted(
        (r.doc_a, r.doc_b, r.n_bands_hit)
        for r in dd.minhash_lsh_pairs(docs, "doc_id", "text").collect()
    )
    assert base == capped
    boiler = _boilerplate(spark, 60)
    with caplog.at_level(_logging.WARNING, logger="hiispider_spark.operators.dedup"):
        dd.minhash_lsh_pairs(
            boiler, "doc_id", "text", bucket_cap=8, log_dropped=True
        ).count()
    assert any("bucket_cap=8 dropped" in m for m in caplog.messages)


def test_bucket_cap_plan_uses_window_group_limit(spark):
    """The rank<=cap filter must compile to WindowGroupLimit — a hot
    bucket bounds map-side BEFORE the shuffle, never fully sorts."""
    import io
    from contextlib import redirect_stdout

    docs = _boilerplate(spark, 50)
    df = dd.minhash_lsh_pairs(docs, "doc_id", "text", bucket_cap=16)
    buf = io.StringIO()
    with redirect_stdout(buf):
        df.explain("formatted")
    assert "WindowGroupLimit" in buf.getvalue()


def test_portable_bucket_cap_matches_fast_path_semantics(spark):
    """The portable-hash variant caps identically (same planted family,
    same C(cap,2) bound, all bands hit)."""
    docs = _boilerplate(spark, 200)
    rows = dd.minhash_lsh_pairs_portable(
        docs, "doc_id", "text", n_hashes=16, bands=4, bucket_cap=8
    ).collect()
    assert len(rows) == 8 * 7 // 2
    assert all(r.n_bands_hit == 4 for r in rows)
