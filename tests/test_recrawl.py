"""Adaptive recrawl scheduling (recrawl.py) vs hand-computed math."""

from __future__ import annotations

import math
from datetime import datetime, timedelta

from hiispider_spark.operators import recrawl as rc


def _hist(spark, rows):
    return spark.createDataFrame(rows, "url string, fetch_ts timestamp, changed boolean")


def _mk(url, n, gap_s, changed_flags):
    t0 = datetime(2024, 1, 1)
    return [
        (url, t0 + timedelta(seconds=k * gap_s), bool(changed_flags[k]))
        for k in range(n)
    ]


def _expected_lam(n, x, gap_s):
    return -math.log((n - x + 0.5) / (n + 0.5)) / gap_s


def test_estimator_matches_paper_formula(spark):
    # 5 polls 600 s apart, 2 changes
    rows = _mk("http://a/", 5, 600, [0, 1, 0, 1, 0])
    out = rc.recrawl_schedule(_hist(spark, rows)).collect()[0]
    lam = _expected_lam(5, 2, 600.0)
    assert out["n_polls"] == 5 and out["n_changes"] == 2
    assert abs(out["lam"] - lam) < 1e-9
    assert abs(out["interval_s"] - 1.0 / lam) < 1e-5
    assert out["next_fetch_ts"] == datetime(2024, 1, 1) + timedelta(
        seconds=4 * 600 + math.floor(1.0 / lam)
    )


def test_never_changed_gets_max_interval(spark):
    rows = _mk("http://static/", 6, 600, [0] * 6)
    out = rc.recrawl_schedule(_hist(spark, rows), max_s=86400.0).collect()[0]
    assert out["lam"] == 0.0
    assert out["interval_s"] == 86400.0


def test_always_changed_clamps_to_min(spark):
    rows = _mk("http://hot/", 8, 30, [0] + [1] * 7)
    out = rc.recrawl_schedule(_hist(spark, rows), min_s=60.0).collect()[0]
    # lam is large; 1/lam < 60 → clamp
    assert out["interval_s"] == 60.0


def test_single_poll_gets_default(spark):
    rows = _mk("http://new/", 1, 600, [0])
    out = rc.recrawl_schedule(_hist(spark, rows), default_s=3600.0).collect()[0]
    assert out["interval_s"] == 3600.0
    assert out["lam"] == 0.0


def test_more_changes_shorter_interval(spark):
    rows = _mk("http://a/", 6, 600, [0, 1, 0, 0, 0, 0]) + _mk(
        "http://b/", 6, 600, [0, 1, 1, 1, 1, 0]
    )
    got = {r["url"]: r["interval_s"] for r in rc.recrawl_schedule(_hist(spark, rows)).collect()}
    assert got["http://b/"] < got["http://a/"]


def test_deterministic_across_repartition(spark):
    rows = []
    for d in range(40):
        n = 2 + d % 5
        rows += _mk(f"http://u{d}/", n, 300 + d * 10, [0] + [(d + k) % 3 == 0 for k in range(1, n)])
    h = _hist(spark, rows)
    a = sorted(map(tuple, rc.recrawl_schedule(h).collect()))
    b = sorted(map(tuple, rc.recrawl_schedule(h.repartition(13)).collect()))
    assert a == b
