"""Duplicate-cluster assignment + survivor selection (clusters.py)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from hiispider_spark.operators import clusters as cl


def _union_find(n, pairs):
    parent = list(range(n))

    def find(x):
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for a, b in pairs:
        ra, rb = find(a), find(b)
        if ra != rb:
            parent[max(ra, rb)] = min(ra, rb)
    # fully compress, then map every component to its min member
    comp = {}
    for x in range(n):
        comp.setdefault(find(x), []).append(x)
    return {x: min(members) for r, members in comp.items() for x in members}


def test_chains_converge_to_component_min(spark):
    # 100 ids in 10 chains of length 10 (edges step by 10): diameter 9
    ids = spark.range(100).toDF("doc_id")
    pairs = (
        spark.range(90)
        .toDF("doc_a")
        .select("doc_a", (F.col("doc_a") + 10).alias("doc_b"))
    )
    got = {
        r["doc_id"]: r["cluster"]
        for r in cl.dedup_clusters(ids, pairs).collect()
    }
    assert got == {i: i % 10 for i in range(100)}


def test_matches_union_find_on_arbitrary_graph(spark):
    n = 200
    # deterministic pseudo-random edge set incl. merges of chains
    edges = [((i * 17) % n, (i * 31 + 7) % n) for i in range(0, n, 3)]
    edges = [(a, b) for a, b in edges if a != b]
    want = _union_find(n, edges)
    ids = spark.range(n).toDF("doc_id")
    pairs = spark.createDataFrame(edges, ["doc_a", "doc_b"])
    got = {
        r["doc_id"]: r["cluster"]
        for r in cl.dedup_clusters(ids, pairs).collect()
    }
    assert got == want


def test_singletons_and_empty_pairs(spark):
    ids = spark.range(5).toDF("doc_id")
    empty = spark.createDataFrame([], "doc_a long, doc_b long")
    got = {r["doc_id"]: r["cluster"] for r in cl.dedup_clusters(ids, empty).collect()}
    assert got == {i: i for i in range(5)}


def test_survivors_by_quality_and_representative(spark):
    docs = spark.createDataFrame(
        [(0, 0.2), (1, 0.9), (2, 0.5), (3, 0.7)], ["doc_id", "q"]
    )
    clusters = spark.createDataFrame(
        [(0, 0), (1, 0), (2, 2), (3, 2)], ["doc_id", "cluster"]
    )
    by_q = {
        r["doc_id"]: r["keep"]
        for r in cl.dedup_survivors(docs, clusters, quality_col="q").collect()
    }
    assert by_q == {0: False, 1: True, 2: False, 3: True}
    rep = {
        r["doc_id"]: r["keep"]
        for r in cl.dedup_survivors(docs, clusters).collect()
    }
    assert rep == {0: True, 1: False, 2: True, 3: False}


def test_star_matches_union_find_on_arbitrary_graph(spark):
    n = 200
    edges = [((i * 17) % n, (i * 31 + 7) % n) for i in range(0, n, 3)]
    edges = [(a, b) for a, b in edges if a != b]
    want = _union_find(n, edges)
    ids = spark.range(n).toDF("doc_id")
    pairs = spark.createDataFrame(edges, ["doc_a", "doc_b"])
    got = {
        r["doc_id"]: r["cluster"]
        for r in cl.dedup_clusters(ids, pairs, algorithm="star").collect()
    }
    assert got == want


def test_star_beats_diameter_on_long_chain(spark):
    # path graph of 256 nodes: diameter 255. Label propagation needs
    # 255 rounds; star contraction must land in O(log^2 n) — well
    # under 20 — and still produce the exact component min everywhere.
    n = 256
    ids = spark.range(n).toDF("doc_id")
    pairs = (
        spark.range(n - 1)
        .toDF("doc_a")
        .select("doc_a", (F.col("doc_a") + 1).alias("doc_b"))
    )
    got = {
        r["doc_id"]: r["cluster"]
        for r in cl.dedup_clusters(ids, pairs, max_iter=20, algorithm="star").collect()
    }
    assert got == {i: 0 for i in range(n)}
    # round-count evidence via the internal contraction
    edges = pairs.select(
        F.col("doc_a").alias("src"), F.col("doc_b").alias("dst")
    ).unionByName(
        pairs.select(F.col("doc_b").alias("src"), F.col("doc_a").alias("dst"))
    )
    _, rounds = cl._star_contract(edges, max_rounds=30)
    assert rounds <= 12, rounds


def test_star_singletons_and_empty(spark):
    ids = spark.range(5).toDF("doc_id")
    empty = spark.createDataFrame([], "doc_a long, doc_b long")
    got = {
        r["doc_id"]: r["cluster"]
        for r in cl.dedup_clusters(ids, empty, algorithm="star").collect()
    }
    assert got == {i: i for i in range(5)}


def test_unknown_algorithm_raises(spark):
    ids = spark.range(2).toDF("doc_id")
    empty = spark.createDataFrame([], "doc_a long, doc_b long")
    with pytest.raises(ValueError):
        cl.dedup_clusters(ids, empty, algorithm="bogus")


def test_max_iter_guard(spark):
    # chain of diameter 9 with max_iter=3: must NOT converge to the
    # component min everywhere (proves iterations actually bound work)
    ids = spark.range(10).toDF("doc_id")
    pairs = (
        spark.range(9)
        .toDF("doc_a")
        .select("doc_a", (F.col("doc_a") + 1).alias("doc_b"))
    )
    got = {
        r["doc_id"]: r["cluster"]
        for r in cl.dedup_clusters(ids, pairs, max_iter=3).collect()
    }
    assert got[9] != 0  # label 0 cannot travel 9 hops in 3 iterations
    full = {
        r["doc_id"]: r["cluster"]
        for r in cl.dedup_clusters(ids, pairs, max_iter=20).collect()
    }
    assert full == {i: 0 for i in range(10)}
