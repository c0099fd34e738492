"""Anchor-text + rel=canonical extraction (operators/links.py)."""

from hiispider_spark.operators import links as lk
from hiispider_spark.operators import redirects as rd


def _pages(spark, rows):
    return spark.createDataFrame(
        [(u, h.encode()) for u, h in rows], "url string, html binary"
    )


def test_anchor_texts_extraction(spark):
    html = (
        '<html><body>'
        '<a href="http://t.org/a">plain text</a>'
        '<a class="x" href="http://t.org/b"><b>bold</b> link</a>'
        '<a href="http://t.org/c"><img src="i.png"></a>'
        '<a href="">empty href</a>'
        '<a name="no-href">not a link</a>'
        "</body></html>"
    )
    got = {
        (r.dst_url): r.anchor
        for r in lk.anchor_texts(_pages(spark, [("http://s.org/", html)])).collect()
    }
    assert got == {
        "http://t.org/a": "plain text",
        "http://t.org/b": "bold link",  # tags stripped, space collapsed
        "http://t.org/c": "",  # image link → empty anchor
    }


def test_anchor_summary_topk_and_counts(spark):
    rows = [
        ("http://s1.org/", '<a href="http://t.org/">home</a><a href="http://t.org/">home</a>'),
        ("http://s2.org/", '<a href="http://t.org/">home</a><a href="http://t.org/">start</a>'),
        ("http://s3.org/", '<a href="http://t.org/">begin</a>'),
    ]
    out = lk.anchor_summary(lk.anchor_texts(_pages(spark, rows)), top_k=2)
    got = {(r.anchor): r for r in out.collect()}
    # tie at n=1 → lexicographic: 'begin' beats 'start' for rank 2
    assert set(got) == {"home", "begin"}
    assert got["home"].anchor_n == 3 and got["home"].rank == 1
    assert got["home"].n_refs == 5 and got["home"].n_sources == 4
    assert got["begin"].rank == 2 and got["begin"].anchor_n == 1


def test_canonical_edges_resolve_as_aliases(spark):
    rows = [
        # chain: m1 → m2 → main (canonical-of-canonical)
        ("http://s.org/m1", '<head><link rel="canonical" href="http://s.org/m2"></head>'),
        ("http://s.org/m2", '<head><link rel="canonical" href="http://s.org/main"></head>'),
        # self-canonical: dropped
        ("http://s.org/main", '<link rel="canonical" href="http://s.org/main">'),
        # no declaration
        ("http://s.org/other", "<html><body>x</body></html>"),
    ]
    ed = lk.canonical_edges(_pages(spark, rows))
    assert {(r.src_url, r.dst_url) for r in ed.collect()} == {
        ("http://s.org/m1", "http://s.org/m2"),
        ("http://s.org/m2", "http://s.org/main"),
    }
    res = {r.src_url: r for r in rd.resolve_redirects(ed).collect()}
    assert res["http://s.org/m1"].final_url == "http://s.org/main"
    assert res["http://s.org/m1"].n_hops == 2 and not res["http://s.org/m1"].is_cycle
