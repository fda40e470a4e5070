"""URL canonicalization (functions/urlnorm.py): case/port/escape/dot-
segment/tracking normalization, the idempotence property, and the Spark
dedup-key projection."""

from __future__ import annotations

from dhtmlparser3_spark.functions.urlnorm import (
    canonical_url,
    url_spelling_dups,
    with_canonical_url,
)

CASES = [
    # (input, canonical)
    ("HTTP://Host.Example:80/a/../b?x=1#frag", "http://host.example/b?x=1"),
    ("https://h.example:443/", "https://h.example/"),
    ("https://h.example:8443/", "https://h.example:8443/"),
    ("http://h.example", "http://h.example/"),
    ("http://h.example.", "http://h.example/"),
    ("http://h.example/a/./b/../c", "http://h.example/a/c"),
    ("http://h.example/a/b/..", "http://h.example/a/"),
    ("http://h.example/%7euser/%41%2fx", "http://h.example/~user/A%2Fx"),
    ("http://h.example/p?utm_source=x&q=1&fbclid=abc", "http://h.example/p?q=1"),
    ("http://h.example/p?utm_source=x", "http://h.example/p"),
    ("http://h.example/p?b=2&a=1", "http://h.example/p?b=2&a=1"),  # order kept
    ("http://u:pw@h.example/x", "http://u:pw@h.example/x"),
    ("  http://h.example/x  ", "http://h.example/x"),
    ("not a url", "not a url"),
    ("", ""),
    ("http://h.example/%zz%3c", "http://h.example/%zz%3C"),
    ("http://[::1]:80/", "http://[::1]/"),  # IPv6 literal keeps brackets
    ("http://[2001:DB8::1]:8443/x", "http://[2001:db8::1]:8443/x"),
]


def test_canonical_url_cases():
    for raw, want in CASES:
        assert canonical_url(raw) == want, raw


def test_canonical_url_options():
    assert (
        canonical_url("http://h/p?b=2&a=1", sort_query=True)
        == "http://h/p?a=1&b=2"
    )
    assert (
        canonical_url("http://h/p?utm_source=x&q=1", strip_tracking=False)
        == "http://h/p?utm_source=x&q=1"
    )


def test_canonical_url_idempotent_property():
    """canon(canon(u)) == canon(u) — the dedup-key contract — over
    random url-ish strings."""
    from hypothesis import given, settings, strategies as st

    part = st.text(
        alphabet="abXY019-._~%25/?&=#:@ ", max_size=15
    )
    urls = st.one_of(
        st.tuples(
            st.sampled_from(["http", "HTTP", "https"]),
            st.sampled_from(["h.example", "H.Example:80", "h.example:9",
                             "u@h.example", "h.example."]),
            part,
        ).map(lambda t: f"{t[0]}://{t[1]}/{t[2]}"),
        part,  # junk that must pass through stably
    )

    @settings(max_examples=400, deadline=None)
    @given(urls)
    def check(u):
        c = canonical_url(u)
        assert canonical_url(c) == c

    check()


def test_with_canonical_url_spark(spark):
    spellings = [
        "HTTP://Host.Example:80/a/../b?x=1#f",
        "http://host.example/b?x=1&utm_source=x",
        "http://host.example/b?x=1",
        "http://other.example/b?x=1",
    ]
    df = spark.createDataFrame([(u,) for u in spellings], "url string")
    got = {
        r.url: r.canonical_url
        for r in with_canonical_url(df).collect()
    }
    assert got == {u: canonical_url(u) for u in spellings}

    dups = url_spelling_dups(df).collect()
    assert len(dups) == 1
    assert dups[0].canonical_url == "http://host.example/b?x=1"
    assert dups[0].n_spellings == 3
    assert list(dups[0].urls) == sorted(spellings[:3])
