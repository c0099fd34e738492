"""Property-based tests (hypothesis) for the pure-function cores.

Strategy: exercise the PYTHON reference implementations exhaustively
(thousands of generated cases, no Spark job per example), then rely on
the existing cross-impl equivalence tests (test_canon, test_redirects,
test_contamination's hashed≡plain) to carry the properties over to the
Column/UDF paths. A handful of Spark-side properties run with small
example budgets.
"""

from __future__ import annotations

from hypothesis import given, settings, strategies as st

from hiispider_spark.functions.canon import canonicalize_url

# --------------------------------------------------------------- canon

_url_host = st.from_regex(r"[a-zA-Z][a-zA-Z0-9-]{0,10}\.[a-zA-Z]{2,4}", fullmatch=True)
_url_path = st.from_regex(r"(/[a-zA-Z0-9._~-]{0,8}){0,4}", fullmatch=True)
_url_query = st.one_of(
    st.just(""),
    st.from_regex(r"\?[a-z]=[0-9]{1,3}(&[a-z]=[0-9]{1,3}){0,3}", fullmatch=True),
)
_url_frag = st.one_of(st.just(""), st.from_regex(r"#[a-zA-Z0-9]{0,6}", fullmatch=True))


@st.composite
def urls(draw):
    scheme = draw(st.sampled_from(["http", "https", "HTTP", "Https"]))
    host = draw(_url_host)
    port = draw(st.sampled_from(["", ":80", ":443", ":8080"]))
    return (
        f"{scheme}://{host}{port}{draw(_url_path)}"
        f"{draw(_url_query)}{draw(_url_frag)}"
    )


@given(urls())
@settings(max_examples=500, deadline=None)
def test_canonicalize_idempotent(u):
    c = canonicalize_url(u)
    assert canonicalize_url(c) == c


@given(urls())
@settings(max_examples=500, deadline=None)
def test_canonicalize_strips_fragment_and_default_port(u):
    c = canonicalize_url(u)
    assert "#" not in c
    assert ":80/" not in c + "/" or not c.startswith("http://") or ":8080" in c
    scheme = c.split("://", 1)[0]
    assert scheme == scheme.lower()


@given(urls(), st.permutations(range(4)))
@settings(max_examples=200, deadline=None)
def test_canonicalize_query_order_invariant(u, perm):
    base, sep, q = u.partition("?")
    if not sep or "#" in q:
        return
    params = q.split("&")
    if len(params) < 2:
        return
    # the sort is STABLE by key: same-key params keep file order on
    # purpose (?a=1&a=0 and ?a=0&a=1 may be different resources), so
    # the invariance property holds only for distinct-key permutations
    keys = [p.partition("=")[0] for p in params]
    if len(set(keys)) != len(keys):
        return
    shuffled = "&".join(params[i] for i in perm[: len(params)] if i < len(params))
    if sorted(shuffled.split("&")) != sorted(params):
        return
    assert canonicalize_url(f"{base}?{shuffled}") == canonicalize_url(u)


# ---------------------------------------------------- redirect resolver


def _py_resolve(edges: dict[str, str], max_hops: int):
    """Reference walker: follow until terminal or cycle."""
    out = {}
    # the Spark resolver's effective budget is the doubling horizon
    import math

    budget = 2 ** max(1, math.ceil(math.log2(max(2, max_hops))))
    for src in edges:
        cur, hops, seen = src, 0, set()
        while cur in edges and hops < budget + 1:
            if cur in seen:
                break
            seen.add(cur)
            cur = edges[cur]
            hops += 1
        if cur in edges:  # still jumping → cycle / over budget
            out[src] = (None, None, True)
        else:
            out[src] = (cur, hops, False)
    return out


@given(
    st.dictionaries(
        st.integers(0, 30).map(lambda i: f"u{i}"),
        st.integers(0, 30).map(lambda i: f"u{i}"),
        min_size=1,
        max_size=25,
    )
)
@settings(max_examples=12, deadline=None)
def test_resolver_matches_reference_walker(spark, edges):
    from hiispider_spark.operators import redirects as rd

    edges = {s: d for s, d in edges.items() if s != d}
    if not edges:
        return
    df = spark.createDataFrame(
        list(edges.items()), "src_url string, dst_url string"
    )
    got = {
        r.src_url: (r.final_url, r.n_hops, r.is_cycle)
        for r in rd.resolve_redirects(df, max_hops=32).collect()
    }
    assert got == _py_resolve(edges, 32)


# ------------------------------------------------------------- scope


@given(st.text(min_size=0, max_size=60))
@settings(max_examples=8, deadline=None)
def test_scope_filter_total_over_garbage(spark, s):
    """Arbitrary junk (control chars, half-URLs, unicode) must classify,
    never raise — the malformed-href robustness contract."""
    from hiispider_spark.operators import scope as sc

    df = spark.createDataFrame([(s,)], "url string")
    rows = sc.scope_filter(df).collect()
    assert len(rows) == 1 and rows[0].in_scope in (True, False)
