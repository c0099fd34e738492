"""Host-level PageRank + frontier re-ranking (operators/linkgraph.py)."""

from __future__ import annotations

from pyspark.sql import functions as F

from hiispider_spark.operators import linkgraph as lg


def _ranks(spark, edge_list, n_iter=3):
    edges = spark.createDataFrame(edge_list, "src string, dst string")
    return {
        r.host: r.rank
        for r in lg.host_pagerank(edges, n_iter=n_iter).collect()
    }


def _py_pagerank(edge_list, n_iter=3, damping=0.85):
    edges = sorted(set(edge_list))
    nodes = sorted({s for s, _ in edges} | {d for _, d in edges})
    n = len(nodes)
    deg = {}
    for s, _ in edges:
        deg[s] = deg.get(s, 0) + 1
    pr = {v: 1.0 / n for v in nodes}
    base = (1.0 - damping) / n
    for _ in range(n_iter):
        c = {v: 0.0 for v in nodes}
        for s, d in edges:
            c[d] += pr[s] / deg[s]
        pr = {v: round(base + damping * c[v], 10) for v in nodes}
    return {v: round(r, 6) for v, r in pr.items()}


def test_pagerank_matches_python_reference(spark):
    edges = [("a", "b"), ("b", "a"), ("a", "c"), ("d", "a")]
    got = _ranks(spark, edges)
    want = _py_pagerank(edges)
    assert set(got) == set(want)
    for v in want:
        assert abs(got[v] - want[v]) < 1e-8, v
    # authority ordering: 'a' (linked by b and d) outranks leaf 'c'
    assert got["a"] > got["c"] > 0
    # dangling 'c' leaks mass: total < 1
    assert sum(got.values()) < 1.0


def test_pagerank_deterministic(spark):
    edges = [("a", "b"), ("b", "c"), ("c", "a"), ("a", "c")]
    assert _ranks(spark, edges) == _ranks(spark, edges)


def test_pagerank_empty_edges(spark):
    out = _ranks(spark, [])
    assert out == {}


def test_host_edges_drops_relative_hrefs(spark):
    # relative + schemeless hrefs miss the host regexp → must be
    # filtered, not funneled into a '' pseudo-host
    pages = spark.createDataFrame(
        [
            (
                "http://a.example.org/",
                b'<a href="/rel/path">x</a><a href="http://b.example.org/p">y</a>',
            )
        ],
        "url string, html binary",
    )
    edges = lg.host_edges(pages).collect()
    assert len(edges) == 1
    assert edges[0].src == "a.example.org" and edges[0].dst == "b.example.org"


def test_pagerank_deep_iteration_truncated_lineage(spark):
    """n_iter > 5 switches to per-iteration localCheckpoint; 20
    iterations must complete with sane values (sum ≤ 1, ranks > 0)."""
    edges = [("a", "b"), ("b", "c"), ("c", "a"), ("a", "c"), ("d", "a")]
    got = _ranks(spark, edges, n_iter=20)
    want = _py_pagerank(edges, n_iter=20)
    assert set(got) == set(want)
    for v in want:
        assert abs(got[v] - want[v]) < 1e-8, v


def test_host_edges_from_pages(spark, tiny_pages):
    edges = lg.host_edges(tiny_pages)
    assert edges.count() == edges.distinct().count()
    hosts = {r.src for r in edges.select("src").distinct().collect()}
    assert all(h.endswith(".example.org") for h in hosts)
    # synth pages embed exactly 2 hrefs each → dst hosts exist
    assert edges.filter(F.col("dst") == "").count() == 0


def test_rerank_frontier_blends_priority(spark, tiny_seeds):
    from hiispider_spark.operators.frontier import build_frontier

    fr = build_frontier(tiny_seeds, n_partitions=8)
    ranks = spark.createDataFrame(
        [(r.host, 0.5) for r in fr.select("host").distinct().limit(2).collect()],
        "host string, rank double",
    )
    boosted_hosts = {r.host for r in ranks.collect()}
    out = lg.rerank_frontier(fr, ranks, weight=10.0)
    assert out.columns == fr.columns  # schema preserved
    joined = out.alias("o").join(
        fr.alias("f"), F.col("o.url_hash") == F.col("f.url_hash")
    ).select(
        F.col("o.host").alias("host"),
        F.col("o.priority").alias("p_new"),
        F.col("f.priority").alias("p_old"),
    )
    for r in joined.collect():
        if r.host in boosted_hosts:
            assert abs(r.p_new - (r.p_old + 5.0)) < 1e-6
        else:
            assert abs(r.p_new - r.p_old) < 1e-6
