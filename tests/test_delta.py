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


# ---- Autogenerator list-locating heuristic ------------------------------
def test_locate_by_path():
    from hiispider_spark.operators.delta import locate_item_list

    obj = {"data": {"entries": [{"id": 1}, {"id": 2}], "ids": [9]}}
    assert locate_item_list(obj, "data.entries") == [{"id": 1}, {"id": 2}]
    assert locate_item_list(obj, "data.ids") == [9]
    # integer path segments index into lists
    nested = {"pages": [{"items": [1, 2, 3]}, {"items": [4]}]}
    assert locate_item_list(nested, "pages.1.items") == [4]
    assert locate_item_list(nested, "pages.-1.items") == [4]
    # missing step / non-list target → []
    assert locate_item_list(obj, "data.nope") == []
    assert locate_item_list(obj, "data") == []
    assert locate_item_list({"a": 1}, "a") == []


def test_locate_largest_list():
    from hiispider_spark.operators.delta import locate_item_list

    obj = {
        "meta": {"tags": ["a"]},
        "data": {"entries": [1, 2, 3], "ids": [0, 1]},
    }
    assert locate_item_list(obj) == [1, 2, 3]
    # root-level list is just the largest-list case
    assert locate_item_list([5, 6]) == [5, 6]
    # nested lists inside lists are walked too
    assert locate_item_list({"a": [[1, 2, 3, 4], [9]]}) == [1, 2, 3, 4]
    # tie → earliest in depth-first document order (deterministic)
    assert locate_item_list({"x": [1, 2], "y": [3, 4]}) == [1, 2]
    # no list anywhere / non-container root
    assert locate_item_list({"a": {"b": 1}}) == []
    assert locate_item_list(42) == []


def test_autogen_delta_end_to_end(spark):
    from hiispider_spark.operators.delta import autogen_delta

    def payload(epoch, ks):
        items = ",".join(
            '{"id":%d,"ts":%d,"v":%d}' % (k, epoch * 1000 + k, k * 7 % 13)
            for k in ks
        )
        return (
            '{"meta":{"page":1},"data":{"entries":[%s],"ids":[0]}}' % items
        )

    prev = spark.createDataFrame(
        [(1, payload(0, [0, 1])), (2, payload(0, [0]))],
        "url_hash long, payload string",
    )
    cur = spark.createDataFrame(
        [(1, payload(1, [0, 1, 2])), (2, payload(1, [0])), (3, "not json")],
        "url_hash long, payload string",
    )
    got = autogen_delta(cur, prev, ignores=("ts",)).collect()
    # url 1: item id=2 is new; ids 0/1 re-emitted with moved ts → NOT new
    # url 2: identical item set → no delta; url 3: non-JSON → no items
    assert len(got) == 1
    assert got[0].url_hash == 1
    assert json.loads(got[0].item) == {"id": 2, "ts": 1002, "v": 1}
    # without ignores, the moved ts makes every re-emitted item "new"
    noisy = autogen_delta(cur, prev).collect()
    assert len(noisy) == 4
