"""Delta semantics — hiispider Autogenerator cases (SURVEY.md §2 O-17)."""

from __future__ import annotations

import json

from pyspark.sql import functions as F

from hiispider_spark.operators.delta import (
    compute_delta,
    explode_items,
    normalize_item,
)


def _items(spark, url_hash, epoch, payloads):
    return spark.createDataFrame(
        [(url_hash, epoch, i, p) for i, p in enumerate(payloads)],
        "url_hash long, epoch long, item_hash long, payload string",
    )


def test_new_items_only(spark):
    prev = _items(spark, 1, 1, ['{"id": 1}', '{"id": 2}'])
    cur = _items(spark, 1, 2, ['{"id": 2}', '{"id": 3}'])
    got = sorted(r.payload for r in compute_delta(cur, prev).collect())
    assert got == ['{"id": 3}']


def test_removed_items_not_reported(spark):
    prev = _items(spark, 1, 1, ['{"id": 1}', '{"id": 2}'])
    cur = _items(spark, 1, 2, ['{"id": 1}'])
    assert compute_delta(cur, prev).count() == 0


def test_ignored_fields_do_not_create_deltas(spark):
    """The reference drops volatile fields (dates) before hashing."""
    prev = _items(spark, 1, 1, ['{"id": 1, "fetched_at": "mon"}'])
    cur = _items(spark, 1, 2, ['{"id": 1, "fetched_at": "tue"}'])
    assert compute_delta(cur, prev, ignores=("fetched_at",)).count() == 0
    assert compute_delta(cur, prev).count() == 1  # without ignores it differs


def test_key_order_is_normalized(spark):
    prev = _items(spark, 1, 1, ['{"a": 1, "b": 2}'])
    cur = _items(spark, 1, 2, ['{"b": 2, "a": 1}'])
    assert compute_delta(cur, prev).count() == 0


def test_same_payload_different_url_is_new(spark):
    prev = _items(spark, 1, 1, ['{"id": 1}'])
    cur = _items(spark, 2, 2, ['{"id": 1}'])
    assert compute_delta(cur, prev).count() == 1


def test_plain_string_payloads_pass_through(spark):
    assert normalize_item("http://x/1") == "http://x/1"
    prev = _items(spark, 1, 1, ["http://x/1"])
    cur = _items(spark, 1, 2, ["http://x/1", "http://x/2"])
    got = [r.payload for r in compute_delta(cur, prev).collect()]
    assert got == ["http://x/2"]


def test_golden_delta_cases(spark):
    """All frozen Autogenerator-semantics cases (tests/golden/)."""
    import os

    path = os.path.join(os.path.dirname(__file__), "golden", "delta_cases.json")
    with open(path) as f:
        doc = json.load(f)
    for case in doc["cases"]:
        prev = _items(spark, 1, 1, case["old"])
        cur = _items(spark, 1, 2, case["new"])
        got = sorted(
            r.payload
            for r in compute_delta(cur, prev, tuple(case["ignores"])).collect()
        )
        assert got == sorted(case["expected"]), case["name"]


def test_explode_items(spark):
    df = spark.createDataFrame(
        [
            (1, 5, [(11, "a"), (12, "b")]),
            (2, 5, []),
            (3, 5, None),
        ],
        "url_hash long, epoch long, items array<struct<item_hash:long,payload:string>>",
    )
    got = explode_items(df.withColumn("url", F.lit("u"))).collect()
    assert sorted((r.url_hash, r.item_hash, r.payload) for r in got) == [
        (1, 11, "a"),
        (1, 12, "b"),
    ]
