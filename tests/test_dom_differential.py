"""Differential tests: our Arena DOM vs the vendored reference parser.

Checks per snippet: full tree shape (names, params incl. order+case,
non_pair flags, content structure), plus byte-identity of content_str /
to_string / content_without_tags / prettify — the north-star invariant.
"""

from __future__ import annotations

import pytest
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from dhtmlparser3_spark.engine import api
from tests.corpus import SNIPPETS


def shape_ref(x):
    import dhtmlparser3
    from dhtmlparser3.tags.comment import Comment

    if isinstance(x, str):
        return ("text", x)
    if isinstance(x, Comment):
        return ("comment", x.content)
    return (
        "tag",
        x.name,
        tuple(x.parameters.items()) if x.parameters else (),
        bool(x.is_non_pair),
        tuple(shape_ref(c) for c in x.content),
    )


def shape_ours(x):
    if isinstance(x, str):
        return ("text", x)
    if isinstance(x, api.CommentNode):
        return ("comment", x.content)
    return (
        "tag",
        x.name,
        tuple(x.parameters.items()),
        bool(x.is_non_pair),
        tuple(shape_ours(c) for c in x.content),
    )


def compare_dom(s, ci=True):
    import dhtmlparser3

    try:
        rdom = dhtmlparser3.parse(s, case_insensitive_parameters=ci)
        rexc = None
    except Exception as e:  # noqa: BLE001
        rdom, rexc = None, type(e).__name__
    try:
        odom = api.parse(s, case_insensitive_parameters=ci)
        oexc = None
    except Exception as e:  # noqa: BLE001
        odom, oexc = None, type(e).__name__
    assert oexc == rexc, f"exception mismatch on {s!r}: ours={oexc} ref={rexc}"
    if rexc:
        return
    assert shape_ours(odom) == shape_ref(rdom), f"tree mismatch on {s!r}"
    assert odom.content_str() == rdom.content_str(), f"content_str on {s!r}"
    assert odom.content_str(escape=True) == rdom.content_str(escape=True)
    assert odom.to_string() == rdom.to_string(), f"to_string on {s!r}"
    assert (
        odom.content_without_tags() == rdom.content_without_tags()
    ), f"content_without_tags on {s!r}"
    assert odom.prettify() == rdom.prettify(), f"prettify on {s!r}"


@pytest.mark.parametrize("i", range(len(SNIPPETS)))
def test_corpus_dom(ref, i):
    compare_dom(SNIPPETS[i])


@pytest.mark.parametrize("i", range(len(SNIPPETS)))
def test_corpus_dom_case_sensitive_params(ref, i):
    compare_dom(SNIPPETS[i], ci=False)


def test_parent_semantics(ref):
    """.parent mirrors the reference incl. its post-reshape quirks."""
    import dhtmlparser3

    for s in ["<div><br><img><hr></div>", "<div><br><b>x</b><img></div>",
              "<a><b><c><d></b></a>", "<div><br><img><hr>"]:
        rdom = dhtmlparser3.parse(s)
        odom = api.parse(s)
        for rtag, otag in zip(rdom.find(""), odom.find("")):
            rp = rtag.parent.name if rtag.parent is not None else None
            op = otag.parent.name if otag.parent is not None else None
            assert op == rp, f"parent mismatch for <{rtag.name}> in {s!r}"


def test_double_link(ref):
    import dhtmlparser3

    s = "<div><br><b>x</b><img></div>"
    rdom = dhtmlparser3.parse(s)
    rdom.double_link()
    odom = api.parse(s)
    odom.double_link()
    for rtag, otag in zip(rdom.find(""), odom.find("")):
        rp = rtag.parent.name if rtag.parent is not None else None
        op = otag.parent.name if otag.parent is not None else None
        assert op == rp


HTMLISH = st.text(
    alphabet=st.sampled_from(list("<>&;/=\"' \t\nabAB#1-!")),
    max_size=60,
)


@given(HTMLISH)
@settings(max_examples=1500, deadline=None, suppress_health_check=[HealthCheck.too_slow])
def test_fuzz_dom(s):
    import sys

    if "/root/reference/src" not in sys.path:
        sys.path.insert(0, "/root/reference/src")
    compare_dom(s)


# Adversarial generator biased toward the B2/B3 reshape interactions
# (engine/dom.py _reshape_non_pair_tags / _move_content_to_parent): whole
# structural FRAGMENTS — mis-nested pairs, stray closers, unclosed tags,
# comments (incl. unterminated), entity runs — composed into one document,
# where character-soup fuzz (HTMLISH above) only rarely forms nested tags.
_FRAGMENTS = st.sampled_from(
    [
        "<b>", "</b>", "<i>", "</i>", "<div>", "</div>", "<p>", "</p>",
        "<br>", "<img src=x>", "<b><i>", "</b></i>", "<div><p>x",
        "</p></div>", "<b>x</b>", "<!-- c -->", "<!-- unterminated",
        "&amp;", "&#65;", "&bogus;", "&;", "x", " ", "\n", "<",
        ">", "</>", "<b b=1 b=2>", "<B>", "</B>", "<a href='q'>t",
    ]
)


@given(st.lists(_FRAGMENTS, min_size=1, max_size=12))
@settings(
    max_examples=1000,
    deadline=None,
    suppress_health_check=[HealthCheck.too_slow],
)
def test_fuzz_dom_reshape_adversarial(frags):
    import sys

    if "/root/reference/src" not in sys.path:
        sys.path.insert(0, "/root/reference/src")
    compare_dom("".join(frags))
