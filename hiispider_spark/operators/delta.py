"""Delta computation — "new items since last poll" (SURVEY.md §2 O-17).

The reference's ``Autogenerator``/``Delta`` diff consecutive poll
results: locate the item list in nested JSON, normalize each item by
dropping ``ignores`` fields (dates etc.), then emit items present now
but not before, each with a stable id hash
[hs: hiispider/delta.py::Autogenerator, Delta †].

Spark-native: items are rows; normalization is JSON canonicalization;
"present now but not before" is a left-anti join on the stable hash —
per (url_hash) key, current epoch vs previous epoch.
"""

from __future__ import annotations

import json

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T


def normalize_item(payload: str, ignores: tuple[str, ...] = ()) -> str:
    """Canonical JSON of one item: drop ignored fields, sort keys —
    the reference's Autogenerator normalization. Non-JSON payloads
    pass through unchanged (plain-string items, e.g. out-links)."""
    try:
        obj = json.loads(payload)
    except (ValueError, TypeError):
        return payload
    if isinstance(obj, dict):
        obj = {k: v for k, v in obj.items() if k not in ignores}
    return json.dumps(obj, sort_keys=True, separators=(",", ":"))


def normalized_hash_udf(ignores: tuple[str, ...] = ()):
    """Arrow-batched stable item id: xxhash-free (hash happens JVM-side
    on the normalized string) — this UDF only normalizes."""

    @F.pandas_udf(T.StringType())
    def normalize(payload: pd.Series) -> pd.Series:
        return payload.map(lambda p: normalize_item(p, ignores))

    return normalize


def explode_items(extracted: DataFrame) -> DataFrame:
    """extracted.items → one row per item (url_hash, item_hash, payload,
    epoch) — the UDTF-shaped output of multi-item plugins."""
    return extracted.select(
        "url_hash",
        "epoch",
        F.explode_outer("items").alias("item"),
    ).select(
        "url_hash",
        "epoch",
        F.col("item.item_hash").alias("item_hash"),
        F.col("item.payload").alias("payload"),
    ).filter(F.col("item_hash").isNotNull())


def compute_delta(
    current_items: DataFrame,
    previous_items: DataFrame,
    ignores: tuple[str, ...] = (),
) -> DataFrame:
    """Items in ``current`` whose normalized hash is absent from
    ``previous`` for the same url (left-anti join per url_hash key)."""
    norm = normalized_hash_udf(ignores)

    def keyed(df: DataFrame) -> DataFrame:
        return df.withColumn(
            "norm_hash", F.xxhash64("url_hash", norm(F.col("payload")))
        )

    cur = keyed(current_items)
    prev = keyed(previous_items).select("norm_hash")
    return cur.join(prev, "norm_hash", "left_anti").drop("norm_hash")


def delta_vs_previous_epoch(all_items: DataFrame, epoch: int) -> DataFrame:
    """Convenience: delta of epoch ``epoch`` vs ``epoch - 1`` within the
    exploded items table."""
    cur = all_items.filter(F.col("epoch") == epoch)
    prev = all_items.filter(F.col("epoch") == epoch - 1)
    return compute_delta(cur, prev)
