"""robots.txt parsing: raw bytes → typed politeness rules.

The engine enforces robots via ``rules array<struct<allow,prefix>>`` +
``crawl_delay`` per host (schemas.ROBOTS, operators/politeness.py); the
reference has no robots support at all — BASELINE mandates enforcement
for us, and a real deployment also needs the parse step from fetched
``/robots.txt`` bodies. This module supplies it as a vectorized pandas
UDF (Arrow-batched, no per-row Python UDF in the plan).

Semantics follow the Robots Exclusion Protocol as deployed (RFC 9309 /
Google's parser):

- directives are case-insensitive; ``#`` starts a comment; CR/LF/CRLF
  all accepted;
- consecutive ``User-agent`` lines form one group header; any rule line
  closes the header;
- a crawler obeys the most specific matching group set — all groups
  naming its own token if any exist, else all ``*`` groups;
- ``Disallow:`` with an empty path permits everything (no rule);
- rule precedence (longest pattern match, Allow wins length ties) and
  RFC 9309 §2.2.3 wildcards (``*`` any-sequence, trailing ``$`` end
  anchor) are applied downstream by ``politeness.robots_deny_col``,
  which consumes the (allow, prefix) rows this parser emits verbatim
  in file order — wildcard chars ride inside the prefix string;
- ``Crawl-delay`` is nonstandard but widely honored — parsed as seconds
  (float); None when absent (downstream coalesces to the engine
  default).
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import functions as F
from pyspark.sql import types as T

from hiispider_spark.schemas import ROBOTS_RULE

PARSED_ROBOTS = T.StructType(
    [
        T.StructField("rules", T.ArrayType(ROBOTS_RULE), False),
        T.StructField("crawl_delay", T.DoubleType(), True),
    ]
)


def parse_robots_text(
    text: str, agent: str = "*"
) -> tuple[list[tuple[bool, str]], float | None]:
    """Parse one robots.txt body for ``agent`` → (rules, crawl_delay).

    rules = [(allow, prefix), ...] in file order, restricted to the most
    specific matching group set (exact agent token beats ``*``).
    """
    agent = agent.lower()
    # group := (agent_tokens, rules, delay); rebuilt on each UA header
    groups: list[tuple[list[str], list[tuple[bool, str]], float | None]] = []
    cur_agents: list[str] = []
    cur_rules: list[tuple[bool, str]] = []
    cur_delay: float | None = None
    in_header = False  # consecutive UA lines extend the same group

    def close_group() -> None:
        nonlocal cur_agents, cur_rules, cur_delay
        if cur_agents:
            groups.append((cur_agents, cur_rules, cur_delay))
        cur_agents, cur_rules, cur_delay = [], [], None

    for raw in text.replace("\r\n", "\n").replace("\r", "\n").split("\n"):
        line = raw.split("#", 1)[0].strip()
        if not line or ":" not in line:
            continue
        field, _, value = line.partition(":")
        field = field.strip().lower()
        value = value.strip()
        if field == "user-agent":
            if not in_header:
                close_group()
                in_header = True
            cur_agents.append(value.lower())
        else:
            in_header = False
            if field == "disallow":
                if value:  # empty Disallow == allow everything
                    cur_rules.append((False, value))
            elif field == "allow":
                if value:
                    cur_rules.append((True, value))
            elif field == "crawl-delay":
                try:
                    cur_delay = float(value)
                except ValueError:
                    pass
    close_group()

    # most specific matching group set: exact token if any group names
    # it, else the '*' groups; same-specificity groups merge (RFC 9309)
    exact = [g for g in groups if agent in g[0]]
    chosen = exact or [g for g in groups if "*" in g[0]]
    rules: list[tuple[bool, str]] = []
    delay: float | None = None
    for _agents, grules, gdelay in chosen:
        rules.extend(grules)
        if gdelay is not None:
            delay = gdelay
    return rules, delay


def parse_robots_udf(agent: str = "*"):
    """Vectorized parser column: robots.txt body (string or binary) →
    struct<rules, crawl_delay>. Arrow-batched pandas UDF — the only
    Python in the ingestion path, amortized per batch."""

    @F.pandas_udf(PARSED_ROBOTS)
    def parse(bodies: pd.Series) -> pd.DataFrame:
        rules_out, delay_out = [], []
        for body in bodies:
            if body is None:
                rules_out.append([])
                delay_out.append(None)
                continue
            if isinstance(body, (bytes, bytearray)):
                body = bytes(body).decode("utf-8", errors="replace")
            rules, delay = parse_robots_text(body, agent)
            rules_out.append(
                [{"allow": a, "prefix": p} for a, p in rules]
            )
            delay_out.append(delay)
        return pd.DataFrame({"rules": rules_out, "crawl_delay": delay_out})

    return parse


def robots_rows(
    fetched_robots,
    host_col: str = "host",
    body_col: str = "body",
    agent: str = "*",
    default_delay: float = 1.0,
):
    """(host, body) → schemas.ROBOTS rows ready for ``split_robots``."""
    parsed = parse_robots_udf(agent)(F.col(body_col))
    return fetched_robots.select(
        F.col(host_col).alias("host"), parsed.alias("_p")
    ).select(
        "host",
        F.col("_p.rules").alias("rules"),
        F.coalesce(F.col("_p.crawl_delay"), F.lit(default_delay)).alias(
            "crawl_delay"
        ),
    )


def sitemap_urls(
    robots_docs, host_col: str = "host", body_col: str = "body"
):
    """(host, sitemap_url) — ``Sitemap:`` directives from robots.txt
    bodies: the standard discovery edge from robots fetch to sitemap
    ingestion (sources/sitemap.py). Directives are GROUP-INDEPENDENT
    (sitemaps.org protocol / RFC 9309 §2.3 extension convention), so
    this is one JVM regexp per body — no UDF, no group logic. Accepts
    string or binary bodies; case-insensitive, CR/LF tolerant."""
    body = F.col(body_col)
    text = F.decode(body, "UTF-8")
    return robots_docs.select(
        F.col(host_col).alias("host"),
        F.explode(
            F.regexp_extract_all(
                text,
                F.lit(r"(?im)^[ \t]*sitemap[ \t]*:[ \t]*(\S+)"),
                F.lit(1),
            )
        ).alias("sitemap_url"),
    )
