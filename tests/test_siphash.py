"""SipHash-2-4: published KAT vectors + vectorized/pure equivalence."""

from __future__ import annotations

import random

import numpy as np
from pyspark.sql import functions as F

from hiispider_spark.functions.siphash import (
    SIP_KEY_DEFAULT,
    siphash24,
    siphash64_np,
    url_hash_udf,
)

import json
import os

_KAT_FILE = os.path.join(os.path.dirname(__file__), "golden", "siphash_kat.json")
with open(_KAT_FILE) as _f:
    _KAT_DOC = json.load(_f)
KAT_KEY = bytes.fromhex(_KAT_DOC["key_hex"])
# Published SipHash-2-4 64-bit vectors (Aumasson & Bernstein reference
# implementation, key 000102..0f, msg 00..0{n-1}); index = msg length.
KAT = {v["msg_len"]: int(v["hash_hex"], 16) for v in _KAT_DOC["vectors"]}


def test_known_answer_vectors():
    for n, expected in KAT.items():
        assert siphash24(bytes(range(n)), KAT_KEY) == expected


def test_vectorized_matches_reference():
    rng = random.Random(42)
    msgs = [bytes(range(i)) for i in range(64)]
    msgs += [
        bytes(rng.randrange(256) for _ in range(rng.randrange(0, 200)))
        for _ in range(200)
    ]
    got = siphash64_np(msgs, KAT_KEY)
    ref = np.array([siphash24(m, KAT_KEY) for m in msgs], dtype=np.uint64)
    assert (got == ref).all()


def test_vectorized_default_key_and_empty_batch():
    assert siphash64_np([]).shape == (0,)
    urls = [f"http://h{i:04d}.example.org/p/{i}".encode() for i in range(100)]
    got = siphash64_np(urls)
    ref = np.array([siphash24(u) for u in urls], dtype=np.uint64)
    assert (got == ref).all()


def test_udf_matches_reference(spark):
    urls = [f"http://h{i % 7:04d}.example.org/p/{i}" for i in range(50)]
    df = spark.createDataFrame([(u,) for u in urls], "url string")
    rows = df.select("url", url_hash_udf("url").alias("h")).collect()
    for r in rows:
        expected = siphash24(r.url.encode(), SIP_KEY_DEFAULT)
        assert r.h == np.uint64(expected).astype(np.int64)


def test_distribution_no_collisions_at_small_n():
    urls = [f"http://h{i:04d}.example.org/p/{i}".encode() for i in range(20000)]
    h = siphash64_np(urls)
    assert len(np.unique(h)) == len(urls)
