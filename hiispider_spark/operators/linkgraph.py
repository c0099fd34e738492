"""Link-graph analytics: host-level PageRank for crawl prioritization.

hiispider's job priorities are static per job row [hs: MySQL job table
†]; a web-scale crawler re-ranks its frontier from the evolving link
graph so well-linked hosts are fetched first. Spark-first shape:

- edges: one pass over the page store — extract hrefs (JVM regex, no
  Python), project to (src_host, dst_host), distinct. At 100 TB this
  is the only corpus-sized scan; everything after is O(hosts).
- PageRank: the canonical distributed iteration — join edges with the
  current rank vector on src (shuffle keyed by host, O(edges)), sum
  contributions per dst (map-side combinable), rebuild the vector.
  ``n_iter`` fixed and small: frontier re-ranking needs a stable
  ordering signal, not convergence to machine epsilon.

Determinism / oracle parity: every iteration rounds to 10 dp (kills
float-summation-order noise), the result to 6 dp; all constants are
written so Spark and the DuckDB twin compute bit-identical doubles
(e.g. ``1.0 - damping``, never a 0.15 literal on one side only).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

HREF_RE = r'href="([^"]*)"'
HOST_RE = r"://([^/]*)"


def _host_of(url: Column) -> Column:
    # same regexp on both engines (parse_url has no DuckDB twin)
    return F.regexp_extract(url, HOST_RE, 1)


def host_edges(pages: DataFrame) -> DataFrame:
    """Distinct (src, dst) host pairs from the page store's hrefs.

    Relative / schemeless hrefs miss the host regexp (empty string);
    keeping them would funnel rank mass into a ``''`` pseudo-host that
    ``rerank_frontier`` can never match — filter both endpoints (the
    DuckDB oracle twin mirrors the same predicate)."""
    html_s = F.col("html").cast("string")
    return (
        pages.select(
            _host_of(F.col("url")).alias("src"),
            F.explode(
                F.regexp_extract_all(html_s, F.lit(HREF_RE), F.lit(1))
            ).alias("href"),
        )
        .select("src", _host_of(F.col("href")).alias("dst"))
        .filter((F.col("src") != "") & (F.col("dst") != ""))
        .distinct()
    )


def host_pagerank(
    edges: DataFrame, n_iter: int = 3, damping: float = 0.85
) -> DataFrame:
    """(host, rank) after ``n_iter`` PageRank steps over the distinct
    edge set. Dangling hosts keep the teleport term only (their mass is
    not redistributed — both engines drop it identically)."""
    spark = edges.sparkSession
    nodes = (
        edges.select(F.col("src").alias("host"))
        .union(edges.select(F.col("dst").alias("host")))
        .distinct()
    )
    # edges/nodes are re-joined EVERY iteration — persist them always
    # (O(host-pairs) / O(hosts) narrow rows, orders below corpus size):
    # without the persist each iteration job re-derived the edge set
    # from a full corpus scan (exchanges are not reusable across jobs).
    # edges are persisted ALREADY HASH-PARTITIONED ON dst, so each
    # iteration's per-dst contribution aggregate finds its required
    # distribution in place — zero exchanges inside the loop (guide
    # §2.4: establish the partitioning once, reuse it every pass).
    # The nodes.count() below both supplies n and fills both caches.
    edges = edges.repartition("dst").persist()
    nodes = nodes.persist()
    n = nodes.count()
    if n == 0:
        edges.unpersist()
        nodes.unpersist()
        return spark.createDataFrame([], "host string, rank double")
    # deg is re-broadcast every iteration — checkpoint the O(hosts)
    # frame once so those builds never re-scan the edge cache
    deg = edges.groupBy("src").agg(
        F.count("*").cast("double").alias("d")
    ).localCheckpoint(eager=True)
    base = (1.0 - damping) / n
    # The loop state is the CONTRIBUTION vector (host, c), not the rank
    # vector: rank_i(h) = round(base + damping·c_i(h), 10) with c = 0
    # for hosts nothing links to, so the rank can be re-derived inline
    # wherever needed (on edge sources below, on all nodes at the end).
    # This drops the per-iteration nodes-join job — each iteration is
    # ONE aggregate over the dst-partitioned edge cache plus two tiny
    # broadcast builds. Values are identical to the rank-vector form:
    # same joins on the same keys, same doubles in the same order.
    # localCheckpoint each step keeps the per-iteration plan flat (the
    # nested broadcast tower contrib_i ← contrib_{i-1} ← … otherwise
    # serializes broadcast builds through ever-deeper replans); each
    # step rounds to 10 dp, so checkpointing never changes a value.
    contrib = None
    rank_of_c = F.round(
        F.lit(base) + F.lit(damping) * F.coalesce(F.col("c"), F.lit(0.0)), 10
    )
    for i in range(n_iter):
        if contrib is None:
            ranked = edges.withColumn("rank", F.lit(1.0 / n))
        else:
            ranked = edges.join(
                F.broadcast(contrib), edges["src"] == contrib["host"], "left"
            ).withColumn("rank", rank_of_c)
        contrib = (
            ranked.join(F.broadcast(deg), "src")
            .groupBy("dst")
            .agg(F.sum(F.col("rank") / F.col("d")).alias("c"))
            .select(F.col("dst").alias("host"), "c")
            .localCheckpoint(eager=True)
        )
    out = nodes.join(F.broadcast(contrib), "host", "left").select(
        "host", F.round(rank_of_c, 6).alias("rank")
    )
    # the result no longer references edges/nodes lineage (pr is
    # checkpointed), so the caches can be dropped immediately
    out = out.localCheckpoint(eager=True)
    edges.unpersist()
    nodes.unpersist()
    return out


def rerank_frontier(
    frontier: DataFrame, ranks: DataFrame, weight: float = 10.0
) -> DataFrame:
    """Blend link-graph authority into frontier priorities:
    ``priority += weight · rank(host)``. Hosts without a rank keep
    their static priority. Ranks are O(hosts) — AQE broadcasts when
    small; at web scale the join shuffles O(frontier) once, keyed by
    the column the politeness stage shuffles on anyway."""
    r = ranks.select("host", F.col("rank").alias("_pr"))
    return (
        frontier.join(r, "host", "left")
        .withColumn(
            "priority",
            F.round(
                F.col("priority")
                + F.lit(weight) * F.coalesce(F.col("_pr"), F.lit(0.0)),
                6,
            ),
        )
        .select(*frontier.columns)  # join moved the key column first
    )
