"""WARC ingestion: Common-Crawl-style archive files → the pages table.

The engine's canonical input is an Iceberg-like table of pages
(url, warc_ts, html:binary, text, lang) — but real Common Crawl data
arrives as WARC files (ISO 28500 / WARC 1.0: framed records with
``WARC/1.0`` header blocks; ``response`` records carry a full HTTP
response as payload; archives are plain or per-record-gzip). This
module parses that format from scratch against the published spec —
no warc library exists in the container, and none is needed: the
format is line-framed headers + Content-Length-delimited payloads.

100 TB shape:
- one WARC file = one input row (``spark.read.format("binaryFile")``)
  = one task: Common Crawl shards its dumps into ~1 GB files, so
  file-level parallelism is the natural partitioning (64k files per
  crawl) and no record-level shuffle is needed to ingest;
- parsing runs in ``mapInPandas`` — Arrow batches in, a generator of
  record batches out, so a 1 GB archive never materializes as one
  Python list;
- the output schema is exactly the ``pages`` input hint; downstream
  (extraction, dedup, textstats) is unchanged.

Gzip: Common Crawl gzips each record as its own member; stdlib
``gzip.decompress`` handles concatenated members transparently.
"""

from __future__ import annotations

import gzip
import io
from collections.abc import Iterator
from datetime import datetime, timezone

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

PAGES_SCHEMA = T.StructType(
    [
        T.StructField("url", T.StringType(), True),
        T.StructField("warc_ts", T.TimestampType(), True),
        T.StructField("html", T.BinaryType(), True),
        T.StructField("http_status", T.IntegerType(), True),
        T.StructField("redirect", T.StringType(), True),
        T.StructField("source_file", T.StringType(), True),
    ]
)

_CRLF = b"\r\n"


def _parse_header_block(block: bytes) -> dict[str, str]:
    """WARC named fields: ``Name: value`` lines, case-insensitive
    names (spec §4); continuation lines (leading SP/TAB) folded."""
    headers: dict[str, str] = {}
    last = None
    for line in block.split(_CRLF):
        if not line:
            continue
        if line[:1] in (b" ", b"\t") and last is not None:
            headers[last] += " " + line.strip().decode("latin-1")
            continue
        name, sep, value = line.partition(b":")
        if not sep:
            continue
        last = name.strip().decode("latin-1").lower()
        headers[last] = value.strip().decode("latin-1")
    return headers


def _http_response(
    payload: bytes,
) -> tuple[int | None, bytes, str | None]:
    """Split an HTTP response payload into (status, body, location).
    A payload that is not an HTTP message (e.g. resource records)
    comes back as (None, payload, None). ``location`` is the raw
    Location header value (redirect target), unresolved."""
    if not payload.startswith(b"HTTP/"):
        return None, payload, None
    head, sep, body = payload.partition(_CRLF + _CRLF)
    if not sep:
        return None, payload, None
    try:
        status = int(head.split(_CRLF, 1)[0].split(b" ")[1])
    except (IndexError, ValueError):
        status = None
    location = _parse_header_block(head).get("location") or None
    return status, body, location


def _http_body(payload: bytes) -> tuple[int | None, bytes]:
    """(status, body) — see :func:`_http_response`."""
    status, body, _ = _http_response(payload)
    return status, body


def parse_warc_bytes(
    blob: bytes, want_types: tuple[str, ...] = ("response",)
) -> Iterator[dict]:
    """Yield records from one WARC archive (plain or gzipped).

    Malformed tails (truncated record, bad Content-Length) stop the
    scan of THIS file without raising — at 64k files/crawl a clipped
    archive must cost its own tail only, never the ingest job.
    """
    if blob[:2] == b"\x1f\x8b":
        try:
            blob = gzip.decompress(blob)  # concatenated members ok
        except OSError:
            return
    pos, n = 0, len(blob)
    while pos < n:
        # skip inter-record CRLFs
        while blob[pos : pos + 2] == _CRLF:
            pos += 2
        if pos >= n:
            return
        if not blob[pos : pos + 5] == b"WARC/":
            return  # framing lost — stop this file
        head_end = blob.find(_CRLF + _CRLF, pos)
        if head_end < 0:
            return
        headers = _parse_header_block(blob[pos:head_end])
        try:
            length = int(headers["content-length"])
        except (KeyError, ValueError):
            return
        payload = blob[head_end + 4 : head_end + 4 + length]
        if len(payload) < length:
            return  # truncated tail
        pos = head_end + 4 + length
        if headers.get("warc-type") in want_types:
            yield {"headers": headers, "payload": payload}


def _ts(value: str | None):
    if not value:
        return None
    try:
        # WARC-Date is ISO 8601 UTC, e.g. 2024-01-01T00:00:00Z
        return datetime.fromisoformat(value.replace("Z", "+00:00")).astimezone(
            timezone.utc
        ).replace(tzinfo=None)
    except ValueError:
        return None


def read_warc(files: DataFrame, latest_only: bool = True) -> DataFrame:
    """(path, content) rows — e.g. ``spark.read.format("binaryFile")``
    over a WARC directory — → pages-shaped rows, one per ``response``
    record: (url, warc_ts, html, http_status, redirect, source_file).
    ``redirect`` is the 3xx Location target resolved against the
    record URL (relative Locations are legal per RFC 9110 §10.2.2).

    ``latest_only`` (default): real archives carry MULTIPLE captures
    of one URL; duplicate url keys would fan out the epoch's fetch
    inner join (duplicate fetched rows, duplicate url_hash keys inside
    one frontier/page_cache delta, inflated n_polls/lineage). Keeps
    the latest capture per url — warc_ts desc, ties broken by later
    record in the lexically-later file (a re-crawl appended later
    wins) — via a windowed top-1 (WindowGroupLimit, no full sort).
    Pass ``latest_only=False`` for history workloads (recrawl-rate
    estimation feeds on the FULL capture log)."""
    import pandas as pd
    from pyspark.sql import Window
    from urllib.parse import urljoin

    cols = files.select("path", "content")
    out_schema = T.StructType(
        list(PAGES_SCHEMA) + [T.StructField("_rec_idx", T.LongType())]
    )

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            for path, blob in zip(pdf["path"], pdf["content"]):
                rows = []
                for idx, rec in enumerate(parse_warc_bytes(bytes(blob))):
                    status, body, location = _http_response(rec["payload"])
                    url = rec["headers"].get("warc-target-uri")
                    redirect = None
                    if location and status and 300 <= status < 400:
                        redirect = urljoin(url or "", location)
                    rows.append(
                        (
                            url,
                            _ts(rec["headers"].get("warc-date")),
                            body,
                            status,
                            redirect,
                            path,
                            idx,
                        )
                    )
                if rows:
                    yield pd.DataFrame(
                        rows, columns=[f.name for f in out_schema]
                    )

    pages = cols.mapInPandas(gen, out_schema)
    if not latest_only:
        return pages.drop("_rec_idx")
    w = Window.partitionBy("url").orderBy(
        F.col("warc_ts").desc_nulls_last(),
        F.col("source_file").desc(),
        F.col("_rec_idx").desc(),
    )
    return (
        pages.withColumn("_rn", F.row_number().over(w))
        .filter(F.col("_rn") == 1)
        .drop("_rn", "_rec_idx")
    )


# ----------------------------------------------------------------- writer
def build_warc_bytes(
    records: list[tuple], compress: bool = False
) -> bytes:
    """Serialize (url, iso_ts, status, body[, location]) rows as a
    WARC 1.0 archive of ``response`` records — the test/fixture-side
    inverse of :func:`parse_warc_bytes`. ``compress=True`` gzips each
    record as its own member (the Common Crawl layout)."""
    out = io.BytesIO()
    for i, rec_tuple in enumerate(records):
        url, iso_ts, status, body = rec_tuple[:4]
        location = rec_tuple[4] if len(rec_tuple) > 4 else None
        loc_hdr = f"Location: {location}\r\n" if location else ""
        http = (
            f"HTTP/1.1 {status} OK\r\nContent-Type: text/html\r\n{loc_hdr}"
            f"Content-Length: {len(body)}\r\n\r\n"
        ).encode() + body
        head = (
            "WARC/1.0\r\n"
            "WARC-Type: response\r\n"
            f"WARC-Record-ID: <urn:uuid:rec-{i}>\r\n"
            f"WARC-Target-URI: {url}\r\n"
            f"WARC-Date: {iso_ts}\r\n"
            "Content-Type: application/http; msgtype=response\r\n"
            f"Content-Length: {len(http)}\r\n\r\n"
        ).encode()
        rec = head + http + _CRLF + _CRLF
        out.write(gzip.compress(rec) if compress else rec)
    return out.getvalue()
