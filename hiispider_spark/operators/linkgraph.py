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
    # edges/nodes/deg are re-joined every iteration — persist once
    # (O(hosts) / O(host-pairs) narrow rows, orders below corpus size)
    truncate = n_iter > 5
    if truncate:
        edges = edges.persist()
        nodes = nodes.persist()
    n = nodes.count()
    if n == 0:
        return spark.createDataFrame([], "host string, rank double")
    deg = edges.groupBy("src").agg(
        F.count("*").cast("double").alias("d")
    )
    base = (1.0 - damping) / n
    pr = nodes.withColumn("rank", F.lit(1.0 / n))
    for _ in range(n_iter):
        contrib = (
            edges.join(pr, edges["src"] == pr["host"])
            .join(deg, "src")
            .select(F.col("dst").alias("host"), (F.col("rank") / F.col("d")).alias("c"))
            .groupBy("host")
            .agg(F.sum("c").alias("c"))
        )
        pr = nodes.join(contrib, "host", "left").select(
            "host",
            F.round(
                F.lit(base) + F.lit(damping) * F.coalesce(F.col("c"), F.lit(0.0)),
                10,
            ).alias("rank"),
        )
        if truncate:
            # lineage grows linearly with iterations; without truncation
            # Catalyst re-analyzes an ever-deeper plan (and AQE re-plans
            # it) each step — localCheckpoint keeps per-iteration wall
            # flat. Values are unaffected: each step rounds to 10 dp.
            pr = pr.localCheckpoint(eager=True)
    out = pr.select("host", F.round("rank", 6).alias("rank"))
    if truncate:
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
