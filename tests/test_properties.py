"""Property-based tests (hypothesis) for the pure-Python twins.

These run WITHOUT a SparkSession — they pin the driver-side/pandas twin
implementations whose agreement with the JVM expressions is asserted
elsewhere (tests/test_urls.py, test_dedup_similarity.py), so properties
proved here transfer to the expression path.
"""

from __future__ import annotations

import pandas as pd
from hypothesis import given, settings
from hypothesis import strategies as st

from warcit_spark.functions.urls import canonicalize_urls_pandas
from warcit_spark.operators.dedup import _simhash_batch

# URL-ish generator: scheme/host/port/path/query fragments with the messy
# bits canonicalization must normalize (case, default ports, fragments,
# unsorted query params, spaces)
_scheme = st.sampled_from(["http", "HTTP", "https", "Https", "ftp"])
_host = st.from_regex(r"[A-Za-z0-9]([A-Za-z0-9.-]{0,20}[A-Za-z0-9])?", fullmatch=True)
_port = st.sampled_from(["", ":80", ":443", ":8080", ":8443"])
_path = st.from_regex(r"(/[A-Za-z0-9._ %~-]{0,10}){0,4}", fullmatch=True)
_query = st.sampled_from(
    ["", "?b=2&a=1", "?z=9&a=1&m=5", "?single=1", "?dup=1&dup=0"]
)
_frag = st.sampled_from(["", "#frag", "#a/b?c=d"])


@st.composite
def urls(draw):
    return (
        draw(_scheme) + "://" + draw(_host) + draw(_port)
        + draw(_path) + draw(_query) + draw(_frag)
    )


@settings(max_examples=300, deadline=None)
@given(urls())
def test_canonicalize_idempotent(u):
    """canon(canon(u)) == canon(u): re-canonicalizing a frontier URL (which
    happens every round to extracted links that may already be canonical)
    must be a fixed point, or the seen-set would never converge."""
    once = canonicalize_urls_pandas(pd.Series([u])).iloc[0]
    twice = canonicalize_urls_pandas(pd.Series([once])).iloc[0]
    assert twice == once


@settings(max_examples=300, deadline=None)
@given(urls())
def test_canonicalize_strips_fragment_and_sorts_query(u):
    c = canonicalize_urls_pandas(pd.Series([u])).iloc[0]
    assert "#" not in c
    if "?" in c:
        qs = c.split("?", 1)[1].split("&")
        assert qs == sorted(qs)


@settings(max_examples=200, deadline=None)
@given(
    st.lists(
        st.lists(st.integers(min_value=-(2**63), max_value=2**63 - 1), max_size=12),
        min_size=1,
        max_size=8,
    )
)
def test_simhash_bitvote_matches_naive(hash_lists):
    """The vectorized numpy bit-vote kernel == a naive per-bit Python vote
    on arbitrary signed-64 token-hash multisets."""
    got = _simhash_batch(pd.Series(hash_lists)).tolist()
    for arr, g in zip(hash_lists, got):
        if not arr:
            assert g == 0
            continue
        val = 0
        for b in range(64):
            ones = sum((h >> b) & 1 for h in (x & ((1 << 64) - 1) for x in arr))
            if ones * 2 > len(arr):
                val |= 1 << b
        want = val - (1 << 64) if val >= (1 << 63) else val
        assert g == want
