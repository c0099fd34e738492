"""Crawl-scope filtering: which discovered URLs are worth queueing.

A link extractor emits everything — media files, javascript, mailto:,
kilometer-long session URLs. Queueing those wastes frontier space and
politeness budget (every skipped fetch is budget returned to a real
page). The scope gate is the standard first filter of every production
crawler (Heritrix "scope rules" / Nutch urlfilters); the reference
relies on its job table to bound scope [hs: hiispider job model †],
which an open-web crawl does not have.

Rules (all pure Column expressions — a narrow filter that runs BEFORE
canonicalization/hashing, so out-of-scope URLs never cost a SipHash or
a bloom probe, let alone a frontier row):

- scheme       not http/https (mailto:, javascript:, ftp:, data:)
- too_long     total URL length > ``max_len`` (session-id explosions)
- blocked_host host on the operator blocklist (broadcast semi-join)
- extension    path ends in a non-hypertext extension (media/archives)
- depth        path has > ``max_depth`` segments (mirrors traps.py's
               repetition signal, but as a hard scope bound)

Precedence is the listed order; ``reason`` is NULL for in-scope rows.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

#: non-hypertext extensions a text crawl skips (Heritrix/Nutch default
#: lists, trimmed to the unambiguous cases)
DEFAULT_SKIP_EXTENSIONS = (
    "jpg jpeg png gif webp bmp ico svg tif tiff "
    "css js mjs map "
    "mp3 mp4 m4a m4v avi mov wmv flv webm mkv wav ogg "
    "zip gz tgz bz2 xz 7z rar jar war "
    "exe msi dmg iso bin apk "
    "woff woff2 ttf eot otf "
    "doc docx xls xlsx ppt pptx ps eps swf"
).split()

_PATH_RE = r"^[A-Za-z][A-Za-z0-9+.-]*://[^/]*(/[^?#]*)?"


def scope_filter(
    urls: DataFrame,
    url_col: str = "url",
    blocked_hosts: DataFrame | None = None,
    max_len: int = 2048,
    max_depth: int = 16,
    skip_extensions: tuple[str, ...] = tuple(DEFAULT_SKIP_EXTENSIONS),
) -> DataFrame:
    """Input rows + (in_scope, reason). ``blocked_hosts``: one-column
    ``host`` DataFrame (operator blocklist) — broadcast, so the URL
    side never shuffles."""
    u = F.col(url_col)
    scheme = F.lower(F.regexp_extract(u, r"^([A-Za-z][A-Za-z0-9+.-]*):", 1))
    path = F.regexp_extract(u, _PATH_RE, 1)
    ext = F.lower(F.regexp_extract(path, r"\.([A-Za-z0-9]{1,5})$", 1))
    depth = F.size(F.split(path, "/")) - 1
    out = urls
    if blocked_hosts is not None:
        from hiispider_spark.functions.canon import host_col

        blk = F.broadcast(
            blocked_hosts.select(
                F.col("host").alias("__blocked_host"),
                F.lit(True).alias("__blocked"),
            )
        )
        out = out.join(
            blk, host_col(u) == F.col("__blocked_host"), "left"
        ).drop("__blocked_host")
    else:
        out = out.withColumn("__blocked", F.lit(None).cast("boolean"))
    reason = (
        F.when(~scheme.isin("http", "https"), F.lit("scheme"))
        .when(F.length(u) > max_len, F.lit("too_long"))
        .when(F.coalesce(F.col("__blocked"), F.lit(False)), F.lit("blocked_host"))
        .when(ext.isin(*skip_extensions), F.lit("extension"))
        .when(depth > max_depth, F.lit("depth"))
    )
    return (
        out.withColumn("reason", reason)
        .withColumn("in_scope", F.col("reason").isNull())
        .drop("__blocked")
    )


def filter_in_scope(urls: DataFrame, **kwargs) -> DataFrame:
    """Keep only in-scope rows, dropping the audit columns — the epoch
    fast path."""
    cols = urls.columns
    return scope_filter(urls, **kwargs).filter(F.col("in_scope")).select(cols)
