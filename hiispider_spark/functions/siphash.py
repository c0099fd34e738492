"""64-bit SipHash-2-4 URL identity hash (SURVEY.md §2 O-8).

hiispider identifies cacheable requests by a hashlib digest of the raw
request parameters [hs: hiispider/pagegetter.py (request hash) †].
BASELINE.json:6 mandates "canonicalization + 64-bit SipHash of URLs in
vectorized Arrow UDFs" for the frontier identity, so we implement
SipHash-2-4 (Aumasson & Bernstein, 2012 — public spec) twice:

- :func:`siphash24` — pure-Python reference, the executable spec,
  validated against the published test vectors (tests/golden/siphash_kat).
- :func:`siphash64_np` — numpy-vectorized across an entire Arrow batch:
  messages are padded into an (N, max_blocks*8) byte matrix and the
  SipRound state updates run across all N rows at once per 8-byte block,
  with a per-row active mask for variable lengths. The per-batch Python
  overhead is O(max_blocks) numpy calls, not O(rows).

The result is reinterpreted as signed int64 (Spark LongType).
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import functions as F
from pyspark.sql import types as T

# Fixed key => deterministic crawl identity across runs and cluster sizes.
SIP_KEY_DEFAULT = b"hiispider-spark!"  # exactly 16 bytes

_MASK = 0xFFFFFFFFFFFFFFFF


def _rotl(x: int, b: int) -> int:
    return ((x << b) | (x >> (64 - b))) & _MASK


def _sipround(v0: int, v1: int, v2: int, v3: int) -> tuple[int, int, int, int]:
    v0 = (v0 + v1) & _MASK
    v1 = _rotl(v1, 13) ^ v0
    v0 = _rotl(v0, 32)
    v2 = (v2 + v3) & _MASK
    v3 = _rotl(v3, 16) ^ v2
    v0 = (v0 + v3) & _MASK
    v3 = _rotl(v3, 21) ^ v0
    v2 = (v2 + v1) & _MASK
    v1 = _rotl(v1, 17) ^ v2
    v2 = _rotl(v2, 32)
    return v0, v1, v2, v3


def siphash24(data: bytes, key: bytes = SIP_KEY_DEFAULT) -> int:
    """SipHash-2-4 of ``data`` under a 128-bit ``key`` → unsigned 64-bit."""
    assert len(key) == 16
    k0 = int.from_bytes(key[:8], "little")
    k1 = int.from_bytes(key[8:], "little")
    v0 = k0 ^ 0x736F6D6570736575
    v1 = k1 ^ 0x646F72616E646F6D
    v2 = k0 ^ 0x6C7967656E657261
    v3 = k1 ^ 0x7465646279746573
    n = len(data)
    # full 8-byte little-endian words
    for off in range(0, n - n % 8, 8):
        m = int.from_bytes(data[off : off + 8], "little")
        v3 ^= m
        v0, v1, v2, v3 = _sipround(v0, v1, v2, v3)
        v0, v1, v2, v3 = _sipround(v0, v1, v2, v3)
        v0 ^= m
    # last block: remaining bytes + zero pad + (len & 0xff) << 56
    m = (n & 0xFF) << 56
    for i, byte in enumerate(data[n - n % 8 :]):
        m |= byte << (8 * i)
    v3 ^= m
    v0, v1, v2, v3 = _sipround(v0, v1, v2, v3)
    v0, v1, v2, v3 = _sipround(v0, v1, v2, v3)
    v0 ^= m
    v2 ^= 0xFF
    for _ in range(4):
        v0, v1, v2, v3 = _sipround(v0, v1, v2, v3)
    return (v0 ^ v1 ^ v2 ^ v3) & _MASK


def _np_rotl(x: np.ndarray, b: int) -> np.ndarray:
    return (x << np.uint64(b)) | (x >> np.uint64(64 - b))


def _np_sipround(v0, v1, v2, v3):
    v0 = v0 + v1
    v1 = _np_rotl(v1, 13) ^ v0
    v0 = _np_rotl(v0, 32)
    v2 = v2 + v3
    v3 = _np_rotl(v3, 16) ^ v2
    v0 = v0 + v3
    v3 = _np_rotl(v3, 21) ^ v0
    v2 = v2 + v1
    v1 = _np_rotl(v1, 17) ^ v2
    v2 = _np_rotl(v2, 32)
    return v0, v1, v2, v3


def siphash64_np(msgs: list[bytes], key: bytes = SIP_KEY_DEFAULT) -> np.ndarray:
    """Vectorized SipHash-2-4 over a batch of byte strings → uint64[N].

    One numpy pass per 8-byte block column; rows shorter than the block
    column are frozen via an active mask, so variable lengths are exact.
    """
    assert len(key) == 16
    n_rows = len(msgs)
    if n_rows == 0:
        return np.empty(0, dtype=np.uint64)
    lens = np.fromiter((len(m) for m in msgs), dtype=np.int64, count=n_rows)
    n_blocks = lens // 8 + 1  # final block always present (length byte)
    max_blocks = int(n_blocks.max())
    buf = np.zeros((n_rows, max_blocks * 8), dtype=np.uint8)
    for i, m in enumerate(msgs):  # memcpy per row; compute stays vectorized
        buf[i, : lens[i]] = np.frombuffer(m, dtype=np.uint8)
    # place the length byte at the top of each row's final block
    buf[np.arange(n_rows), n_blocks * 8 - 1] = (lens & 0xFF).astype(np.uint8)
    words = buf.view("<u8")  # (n_rows, max_blocks) little-endian words

    k0 = np.uint64(int.from_bytes(key[:8], "little"))
    k1 = np.uint64(int.from_bytes(key[8:], "little"))
    ones = np.ones(n_rows, dtype=np.uint64)
    v0 = ones * (k0 ^ np.uint64(0x736F6D6570736575))
    v1 = ones * (k1 ^ np.uint64(0x646F72616E646F6D))
    v2 = ones * (k0 ^ np.uint64(0x6C7967656E657261))
    v3 = ones * (k1 ^ np.uint64(0x7465646279746573))

    with np.errstate(over="ignore"):
        for j in range(max_blocks):
            active = n_blocks > j
            m = words[:, j]
            nv0, nv1, nv2, nv3 = _np_sipround(v0, v1, v2, v3 ^ m)
            nv0, nv1, nv2, nv3 = _np_sipround(nv0, nv1, nv2, nv3)
            nv0 = nv0 ^ m
            v0 = np.where(active, nv0, v0)
            v1 = np.where(active, nv1, v1)
            v2 = np.where(active, nv2, v2)
            v3 = np.where(active, nv3, v3)
        v2 = v2 ^ np.uint64(0xFF)
        for _ in range(4):
            v0, v1, v2, v3 = _np_sipround(v0, v1, v2, v3)
    return v0 ^ v1 ^ v2 ^ v3


@F.pandas_udf(T.LongType())
def url_hash_udf(urls: pd.Series) -> pd.Series:
    """Arrow-vectorized SipHash-2-4 of UTF-8 URL bytes → signed int64."""
    msgs = [u.encode("utf-8") for u in urls]
    h = siphash64_np(msgs).view(np.int64)
    return pd.Series(h, index=urls.index)
