"""Multimodal column plumbing: opaque binary media + typed metadata.

Image/audio decode libraries are not in this container, so the decode
step is STUBBED (``decode_image_stub`` raises NotImplementedError; the
deterministic fake featurizer stands in for it). Everything Spark-side
is real and tested: BinaryType columns, metadata structs, Arrow batch
shape through ``mapInPandas``, and partition-friendly output schema —
swap ``_fake_features`` for a PIL/torchvision call on a real cluster
and nothing else changes.

Scale notes: media bytes ride in the same row as metadata (fine to
~1 MB/row; bigger media belongs in object storage with a pointer
column). ``mapInPandas`` streams Arrow batches, so executor memory is
bounded by maxRecordsPerBatch × media size, not partition size.
"""

from __future__ import annotations

from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

MEDIA_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType(), False),
        T.StructField("media", T.BinaryType(), False),
        T.StructField(
            "meta",
            T.StructType(
                [
                    T.StructField("kind", T.StringType(), False),
                    T.StructField("width", T.IntegerType(), False),
                    T.StructField("height", T.IntegerType(), False),
                    T.StructField("n_bytes", T.IntegerType(), False),
                ]
            ),
            False,
        ),
    ]
)

FEATURE_DIM = 16


def synth_media(docs: DataFrame) -> DataFrame:
    """Attach a deterministic fake media payload per document: bytes
    derived from doc_id (stands in for a WARC image record)."""
    size = (F.col("doc_id") % 64 + 16).cast("int")
    payload = F.encode(
        F.concat(F.lit("IMG:"), F.repeat(F.format_string("%08x", F.col("doc_id")), 8)),
        "UTF-8",
    )
    return docs.select(
        F.col("doc_id").cast("long").alias("doc_id"),
        payload.alias("media"),
        F.struct(
            F.lit("image/fake").alias("kind"),
            size.alias("width"),
            (size * 2).alias("height"),
            F.length(payload).cast("int").alias("n_bytes"),
        ).alias("meta"),
    )


def decode_image_stub(media: bytes) -> "np.ndarray":
    """Real decode would go here (PIL.Image.open → np.asarray).

    The container has no imaging libraries — by design this raises so
    nobody mistakes the fake featurizer for a real decoder.
    """
    raise NotImplementedError(
        "image decode requires PIL/opencv, not present in this container; "
        "use extract_media_features (deterministic fake) for plumbing tests"
    )


def _fake_features(media: pd.Series) -> np.ndarray:
    """Deterministic stand-in featurizer: 16-bin byte histogram,
    L1-normalized. Vectorized per Arrow batch."""
    out = np.zeros((len(media), FEATURE_DIM), dtype=np.float64)
    for i, b in enumerate(media):
        arr = np.frombuffer(b, dtype=np.uint8)
        hist, _ = np.histogram(arr, bins=FEATURE_DIM, range=(0, 256))
        s = hist.sum()
        out[i] = hist / s if s else hist
    return out


def extract_media_features(media_df: DataFrame) -> DataFrame:
    """mapInPandas featurization: (doc_id, meta.*, features[16]).

    One Python invocation per Arrow batch; batch shape is asserted in
    tests (the contract a real decoder must also satisfy).
    """
    out_schema = T.StructType(
        [
            T.StructField("doc_id", T.LongType(), False),
            T.StructField("kind", T.StringType(), False),
            T.StructField("n_bytes", T.IntegerType(), False),
            T.StructField(
                "features", T.ArrayType(T.DoubleType(), False), False
            ),
        ]
    )

    def featurize(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            feats = _fake_features(pdf["media"])
            yield pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"],
                    "kind": pdf["meta"].map(lambda m: m["kind"]),
                    "n_bytes": pdf["meta"].map(lambda m: m["n_bytes"]),
                    "features": [np.round(f, 6).tolist() for f in feats],
                }
            )

    return media_df.mapInPandas(featurize, out_schema)
