"""Link-metadata extraction: anchor texts and rel=canonical aliases.

Two link signals a web-corpus pipeline needs beyond the bare href
edges (linkgraph.py):

- **Anchor text** — the text inside ``<a href=...>...</a>`` is how the
  linking page describes the target: a ranking feature and a training
  signal (anchor-target pairs are classic weak supervision).
  Aggregated per target with a bounded top-k.
- **rel=canonical** — ``<link rel="canonical" href=...>`` declares the
  page's preferred URL. Same alias semantics as HTTP redirects, so the
  edges feed the SAME pointer-doubling resolver
  (redirects.resolve_redirects) and alias rewrite (apply_aliases):
  canonical-of-canonical chains resolve in log rounds, loops flag.

Everything is JVM Column regexp work — one pass over the page store,
no Python. The regexes accept the overwhelmingly-common machine-
generated forms (href in double quotes, rel before href); pages
outside that shape simply contribute no rows — acceptable for corpus
statistics, and the same trade linkgraph.py documents for its edges.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

_ANCHOR_RE = r'(?s)<a\s[^>]*href="[^"]*"[^>]*>.*?</a>'
_HREF_RE = r'href="([^"]*)"'
_INNER_RE = r"(?s)>(.*)</a>$"
_CANON_RE = r'<link\s[^>]*rel="canonical"[^>]*href="([^"]*)"'


def anchor_texts(
    pages: DataFrame, url_col: str = "url", html_col: str = "html"
) -> DataFrame:
    """(src_url, dst_url, anchor) — one row per well-formed anchor
    element. ``anchor`` is the inner markup with tags stripped and
    whitespace collapsed; empty anchors (image links) keep ''."""
    html_s = F.decode(F.col(html_col), "UTF-8")
    el = F.col("__a")
    inner = F.regexp_extract(el, _INNER_RE, 1)
    text = F.trim(
        F.regexp_replace(F.regexp_replace(inner, r"(?s)<[^>]*>", " "), r"\s+", " ")
    )
    return (
        pages.select(
            F.col(url_col).alias("src_url"),
            F.explode(
                F.regexp_extract_all(html_s, F.lit(_ANCHOR_RE), F.lit(0))
            ).alias("__a"),
        )
        .select(
            "src_url",
            F.regexp_extract(el, _HREF_RE, 1).alias("dst_url"),
            text.alias("anchor"),
        )
        .filter(F.col("dst_url") != "")
    )


def anchor_summary(anchors: DataFrame, top_k: int = 3) -> DataFrame:
    """Per-target anchor statistics: (dst_url, n_refs, n_sources,
    anchor, anchor_n, rank) — the ``top_k`` most frequent anchor
    strings per target (ties → lexicographic), alongside total
    reference and distinct-source counts.

    Shape: one groupBy (dst, anchor) with map-side combine, then
    rank ≤ k plans as WindowGroupLimit — a hot target (every page
    links "home") never materializes more than k anchor rows per map
    task after the partial top-k.
    """
    per = anchors.groupBy("dst_url", "anchor").agg(
        F.count("*").alias("anchor_n"),
        F.countDistinct("src_url").alias("n_src"),
    )
    tot = per.groupBy("dst_url").agg(
        F.sum("anchor_n").alias("n_refs"),
        F.sum("n_src").alias("n_sources"),
    )
    w = Window.partitionBy("dst_url").orderBy(
        F.col("anchor_n").desc(), F.col("anchor").asc()
    )
    ranked = (
        per.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= top_k)
        .drop("n_src")
    )
    return ranked.join(tot, "dst_url").select(
        "dst_url", "n_refs", "n_sources", "anchor", "anchor_n", "rank"
    )


def canonical_edges(
    pages: DataFrame, url_col: str = "url", html_col: str = "html"
) -> DataFrame:
    """(src_url, dst_url) rel=canonical alias edges — self-canonical
    pages (the common case) are dropped; feed the remainder to
    redirects.resolve_redirects / apply_aliases."""
    html_s = F.decode(F.col(html_col), "UTF-8")
    return (
        pages.select(
            F.col(url_col).alias("src_url"),
            F.regexp_extract(html_s, _CANON_RE, 1).alias("dst_url"),
        )
        .filter((F.col("dst_url") != "") & (F.col("dst_url") != F.col("src_url")))
    )
