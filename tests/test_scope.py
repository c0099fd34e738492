"""URL scope filtering (operators/scope.py)."""

from hiispider_spark.operators import scope as sc


def _urls(spark, us):
    return spark.createDataFrame([(u,) for u in us], "url string")


def test_scope_reasons(spark):
    us = [
        "http://a.org/page",                     # in scope
        "https://a.org/",                        # in scope, bare root
        "mailto:someone@a.org",                  # scheme
        "javascript:void(0)",                    # scheme
        "ftp://a.org/file",                      # scheme
        "http://a.org/i.jpg",                    # extension
        "http://a.org/i.JPG",                    # extension, case-folded
        "http://a.org/download.tar.gz",          # extension (gz)
        "http://a.org/page.html",                # html NOT skipped
        "http://a.org/x" + "y" * 3000,           # too_long
        "http://a.org" + "/d" * 20,              # depth
        "http://a.org/style.css?v=3",            # extension, query ignored
    ]
    got = {r.url: r.reason for r in sc.scope_filter(_urls(spark, us)).collect()}
    assert got["http://a.org/page"] is None
    assert got["https://a.org/"] is None
    assert got["mailto:someone@a.org"] == "scheme"
    assert got["javascript:void(0)"] == "scheme"
    assert got["ftp://a.org/file"] == "scheme"
    assert got["http://a.org/i.jpg"] == "extension"
    assert got["http://a.org/i.JPG"] == "extension"
    assert got["http://a.org/download.tar.gz"] == "extension"
    assert got["http://a.org/page.html"] is None
    assert got["http://a.org/x" + "y" * 3000] == "too_long"
    assert got["http://a.org" + "/d" * 20] == "depth"
    assert got["http://a.org/style.css?v=3"] == "extension"


def test_blocklist_broadcast(spark):
    us = ["http://bad.org/p", "http://good.org/p", "http://bad.org/i.jpg"]
    blocked = spark.createDataFrame([("bad.org",)], "host string")
    out = sc.scope_filter(_urls(spark, us), blocked_hosts=blocked)
    got = {r.url: (r.in_scope, r.reason) for r in out.collect()}
    assert got["http://bad.org/p"] == (False, "blocked_host")
    assert got["http://good.org/p"] == (True, None)
    # blocked_host outranks extension
    assert got["http://bad.org/i.jpg"] == (False, "blocked_host")
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastHashJoin" in plan


def test_filter_in_scope_keeps_schema(spark):
    df = spark.createDataFrame(
        [("http://a.org/p", 1.0), ("ftp://a.org/x", 2.0)],
        "url string, priority double",
    )
    out = sc.filter_in_scope(df)
    assert out.columns == ["url", "priority"]
    assert [r.url for r in out.collect()] == ["http://a.org/p"]


def test_epoch_scope_guard(spark):
    """With scope_guard on, out-of-scope links (media, mailto, deep
    paths) never enter the frontier; off, they all do."""
    import shutil
    import tempfile

    from pyspark.sql import functions as F

    from hiispider_spark.plans.epoch import EpochConfig, bootstrap, run_epoch
    from hiispider_spark.schemas import ROBOTS
    from hiispider_spark.sources.catalog import IcebergLike
    from hiispider_spark.sources.synth import EPOCH0

    bad = (
        '<a href="http://m.example.org/pic.jpg">'
        '<a href="mailto:x@example.org">'
        '<a href="http://m.example.org' + "/d" * 20 + '">'
    )
    good = '<a href="http://fine.example.org/a/1">'
    html = f"<html><body>{bad}{good}hello</body></html>"
    pages = spark.createDataFrame(
        [("http://seed.example.org/p/0", html, "hello", "en")],
        ["url", "html_s", "text", "lang"],
    ).select(
        "url",
        F.lit(EPOCH0).cast("timestamp").alias("warc_ts"),
        F.encode("html_s", "UTF-8").alias("html"),
        "text",
        "lang",
    )
    seeds = spark.createDataFrame(
        [("http://seed.example.org/p/0", 1.0)], ["url", "priority"]
    )
    robots = spark.createDataFrame([], ROBOTS)

    def frontier_size(scope_guard: bool) -> int:
        cfg = EpochConfig(
            k_per_partition=8, n_partitions=8, bloom_m_bits=1 << 14,
            scope_guard=scope_guard,
        )
        root = tempfile.mkdtemp(prefix="scope_epoch_")
        try:
            cat = IcebergLike(spark, root)
            bootstrap(spark, cat, seeds, cfg)
            st = run_epoch(spark, cat, pages, robots, cfg)
            return st["frontier_size"]
        finally:
            shutil.rmtree(root, ignore_errors=True)

    assert frontier_size(True) == 2   # seed + the one in-scope link
    assert frontier_size(False) == 5  # seed + all four discovered
