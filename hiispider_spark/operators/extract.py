"""Extract-plugin registry: hiispider plugins as Arrow pandas UDFs
(SURVEY.md §2 O-11, O-12).

The reference resolves ``"plugin/function"`` strings to callables on
``BaseServer.functions`` and invokes them per job with UTF-8 coercion
of every string [hs: hiispider/servers/base.py::callExposedFunction †,
hs: hiispider/plugins/ †, hs: hiispider/unicodeconverter.py †].

Here a plugin is a vectorized ``pandas_udf`` over the ``html`` binary
column. The flagship ``text`` plugin is defined as reference-equivalent
text extraction whose output must be **byte-identical to pages.text per
url** (BASELINE.json:15) — enforced by tests and by the driver oracle
(the same strip-tags rule is expressed in DuckDB SQL).

Every UDF is Arrow-batched: one Python invocation per ~10k-row batch,
numpy/pandas vectorized inside — no per-row Python (BASELINE.json:15).
"""

from __future__ import annotations

import re

import pandas as pd
from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

_TAG_RE = re.compile(r"<[^>]*>")
_HREF_RE = re.compile(r'href="([^"]*)"')


def _decode_utf8(html: pd.Series) -> pd.Series:
    """UTF-8 coercion of raw bodies — the reference's convertToUTF8
    [hs: hiispider/unicodeconverter.py †] (errors='replace' to never
    throw mid-batch, matching its best-effort coercion)."""
    return html.map(lambda b: b.decode("utf-8", errors="replace"))


@F.pandas_udf(T.StringType())
def text_extract_udf(html: pd.Series) -> pd.Series:
    """Flagship plugin: strip markup, keep text — byte-identical to the
    corpus ``text`` column (the BASELINE.json:15 invariant)."""
    return _decode_utf8(html).str.replace(_TAG_RE, "", regex=True)


@F.pandas_udf(T.ArrayType(T.StringType()))
def links_extract_udf(html: pd.Series) -> pd.Series:
    """Out-link plugin (UDTF-shaped: array out, explode downstream)."""
    return _decode_utf8(html).str.findall(_HREF_RE)


@F.pandas_udf(T.StringType())
def title_extract_udf(html: pd.Series) -> pd.Series:
    """<title> plugin — exercises a second registry entry."""
    return _decode_utf8(html).str.extract(r"<title>([^<]*)</title>", expand=False)


# O-13 — evaluateBoolean [hs: hiispider/evaluateboolean.py †]
def evaluate_boolean_col(c: Column) -> Column:
    lc = F.lower(F.trim(c.cast("string")))
    return F.when(lc.isin("true", "t", "yes", "y", "1"), F.lit(True)).when(
        lc.isin("false", "f", "no", "n", "0", ""), F.lit(False)
    ).otherwise(c.cast("boolean"))


#: plugin registry — the Spark equivalent of BaseServer.functions
PLUGINS = {
    "text": text_extract_udf,
    "links": links_extract_udf,
    "title": title_extract_udf,
}


def text_extract_col(html: Column) -> Column:
    """Column-expression twin of text_extract_udf (JVM regex, codegen).

    Used by oracle-checked queries; tests assert it matches the UDF
    byte-for-byte on the corpus.
    """
    return F.regexp_replace(F.decode(html, "UTF-8"), "<[^>]*>", "")


def run_extraction(modified: DataFrame, epoch: int) -> DataFrame:
    """Apply the flagship plugins → ``extracted`` rows (O-11).

    items = out-links as (item_hash, payload) pairs; item_hash is
    xxhash64 of the payload (JVM-side), feeding the delta operator.
    """
    links = links_extract_udf(F.col("html"))
    carry = ["part_id"] if "part_id" in modified.columns else []
    return modified.select(
        *carry,
        "url_hash",
        "url",
        F.lit("text").alias("plugin"),
        text_extract_udf(F.col("html")).alias("text"),
        F.transform(
            links,
            lambda u: F.struct(
                F.xxhash64(u).alias("item_hash"), u.alias("payload")
            ),
        ).alias("items"),
        "content_sha1",
        F.lit(epoch).cast("long").alias("epoch"),
    )
