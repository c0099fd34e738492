"""WARC source: spec framing, gzip members, damage tolerance,
end-to-end round trip through binaryFile + mapInPandas."""

from __future__ import annotations

import gzip
import os
import shutil
import tempfile
from datetime import datetime

from hiispider_spark.sources import warc as w

RECS = [
    ("http://a.example.org/1", "2024-01-01T00:00:00Z", 200, b"<html>one</html>"),
    ("http://b.example.org/2", "2024-01-01T00:01:00Z", 404, b"<html>two</html>"),
    ("http://c.example.org/3", "2024-01-02T12:30:00Z", 200, b"<html>\xc3\xa9</html>"),
]


def test_roundtrip_plain():
    blob = w.build_warc_bytes(RECS)
    got = list(w.parse_warc_bytes(blob))
    assert len(got) == 3
    for (url, ts, status, body), rec in zip(RECS, got):
        assert rec["headers"]["warc-target-uri"] == url
        st, got_body = w._http_body(rec["payload"])
        assert st == status and got_body == body


def test_roundtrip_gzip_members():
    blob = w.build_warc_bytes(RECS, compress=True)
    assert blob[:2] == b"\x1f\x8b"
    got = list(w.parse_warc_bytes(blob))
    assert [r["headers"]["warc-target-uri"] for r in got] == [r[0] for r in RECS]


def test_non_response_records_filtered():
    blob = w.build_warc_bytes(RECS[:1])
    info = blob.replace(b"WARC-Type: response", b"WARC-Type: warcinfo")
    assert list(w.parse_warc_bytes(info)) == []
    assert len(list(w.parse_warc_bytes(info, want_types=("warcinfo",)))) == 1


def test_truncated_tail_keeps_prefix():
    blob = w.build_warc_bytes(RECS)
    clipped = blob[: len(blob) - 12]  # damage the last record
    got = list(w.parse_warc_bytes(clipped))
    assert [r["headers"]["warc-target-uri"] for r in got] == [
        RECS[0][0],
        RECS[1][0],
    ]


def test_garbage_and_bad_gzip_yield_nothing():
    assert list(w.parse_warc_bytes(b"not a warc at all")) == []
    assert list(w.parse_warc_bytes(b"\x1f\x8b" + b"\x00" * 20)) == []


def test_header_folding_and_case():
    blob = w.build_warc_bytes(RECS[:1]).replace(
        b"WARC-Target-URI: http://a.example.org/1",
        b"warc-target-uri: http://a.example.org\r\n /1",
    )
    (rec,) = list(w.parse_warc_bytes(blob))
    assert rec["headers"]["warc-target-uri"] == "http://a.example.org /1"


def test_warc_feeds_epoch_pipeline(spark):
    """read_warc output is directly usable as run_epoch's page store
    (the fetch join needs url/warc_ts/html only): WARC archive in →
    crawled + extracted text out, byte-identical to the archive body's
    text content."""
    from hiispider_spark.plans.epoch import EpochConfig, bootstrap, run_epoch
    from hiispider_spark.sources.catalog import IcebergLike

    host = "h0000.example.org"
    recs = [
        (
            f"http://{host}/p/{i}",
            "2024-01-01T00:00:00Z",
            200,
            f"<html><body>warc page {i}</body></html>".encode(),
        )
        for i in range(6)
    ]
    root = tempfile.mkdtemp(prefix="warc_epoch_")
    try:
        with open(os.path.join(root, "crawl.warc.gz"), "wb") as f:
            f.write(w.build_warc_bytes(recs, compress=True))
        pages = w.read_warc(
            spark.read.format("binaryFile").load(root, pathGlobFilter="*.warc.gz")
        )
        seeds = spark.createDataFrame(
            [(u, 1.0) for u, *_ in recs], "url string, priority double"
        )
        robots = spark.createDataFrame(
            [(host, [(True, "/")], 0.1)],
            "host string, rules array<struct<allow:boolean,prefix:string>>,"
            " crawl_delay double",
        )
        cfg = EpochConfig(
            k_per_partition=8, n_partitions=8, bloom_m_bits=1 << 17,
            follow_links=False,
        )
        cat = IcebergLike(spark, os.path.join(root, "cat"))
        bootstrap(spark, cat, seeds, cfg)
        stats = run_epoch(spark, cat, pages, robots, cfg)
        assert stats["n_fetched"] == 6 and stats["n_extracted"] == 6
        got = {r.url: r.text for r in cat.read("extracted").collect()}
        assert got == {u: f"warc page {i}" for i, (u, *_) in enumerate(recs)}
    finally:
        shutil.rmtree(root, ignore_errors=True)


def test_read_warc_latest_capture_per_url(spark):
    """Real archives carry multiple captures of one URL; the default
    keeps only the latest (warc_ts desc, later-file/later-record tie
    break) so fetch_join never fans out; latest_only=False keeps the
    full capture log for history workloads."""
    u = "http://a.example.org/1"
    old = (u, "2024-01-01T00:00:00Z", 200, b"<html>old</html>")
    new = (u, "2024-01-03T00:00:00Z", 200, b"<html>new</html>")
    same_ts_a = (u, "2024-01-03T00:00:00Z", 200, b"<html>first</html>")
    root = tempfile.mkdtemp(prefix="warc_dup_")
    try:
        with open(os.path.join(root, "part-0.warc"), "wb") as f:
            f.write(w.build_warc_bytes([old, same_ts_a, new]))
        files = spark.read.format("binaryFile").load(root)
        got = w.read_warc(files).collect()
        assert len(got) == 1
        # equal warc_ts → later record in the file wins
        assert bytes(got[0].html) == b"<html>new</html>"
        assert got[0].warc_ts == datetime(2024, 1, 3)
        full = w.read_warc(files, latest_only=False).collect()
        assert len(full) == 3
        assert "_rec_idx" not in w.read_warc(files, latest_only=False).columns
    finally:
        shutil.rmtree(root, ignore_errors=True)


def test_read_warc_end_to_end(spark):
    root = tempfile.mkdtemp(prefix="warc_")
    try:
        with open(os.path.join(root, "part-0.warc"), "wb") as f:
            f.write(w.build_warc_bytes(RECS[:2]))
        with open(os.path.join(root, "part-1.warc.gz"), "wb") as f:
            f.write(w.build_warc_bytes(RECS[2:], compress=True))
        files = spark.read.format("binaryFile").load(root)
        rows = {r.url: r for r in w.read_warc(files).collect()}
        assert set(rows) == {r[0] for r in RECS}
        assert rows["http://b.example.org/2"].http_status == 404
        assert bytes(rows["http://c.example.org/3"].html) == RECS[2][3]
        assert rows["http://a.example.org/1"].warc_ts == datetime(2024, 1, 1)
        # source lineage points at the physical archive
        assert rows["http://c.example.org/3"].source_file.endswith(
            "part-1.warc.gz"
        )
    finally:
        shutil.rmtree(root, ignore_errors=True)
