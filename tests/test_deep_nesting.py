"""Junk-HTML depth robustness: every serializer (incl. prettify) survives
nesting far past CPython's recursion limit — the reference RecursionErrors
there (tag.py's methods recurse per level), our engine must not: one poison
document at CC scale would otherwise kill a whole executor task.
"""

from __future__ import annotations

import sys

import pytest

from dhtmlparser3_spark.engine import serialize
from dhtmlparser3_spark.engine.dom import parse_arena
from dhtmlparser3_spark.engine.lexer import TAG

DEPTH = 5000  # >> sys.getrecursionlimit() (default 1000)


@pytest.fixture(scope="module")
def deep_arena():
    assert DEPTH > sys.getrecursionlimit()
    html = "<div>" * DEPTH + "x" + "</div>" * DEPTH
    return parse_arena(html)


def test_deep_parse(deep_arena):
    # arena build is iterative: all DEPTH divs exist (+1 = virtual root)
    assert deep_arena.kind.count(TAG) == DEPTH + 1


def test_deep_to_string(deep_arena):
    out = serialize.to_string(deep_arena)
    assert out == "<div>" * DEPTH + "x" + "</div>" * DEPTH


def test_deep_content_str(deep_arena):
    out = serialize.content_str(deep_arena)
    assert out.startswith("<div>") and "x" in out


def test_deep_content_without_tags(deep_arena):
    assert serialize.content_without_tags(deep_arena) == "x"


def test_deep_prettify():
    # prettify's output is O(depth²) by its own indentation semantics, so
    # the robustness pin uses a smaller depth — still past CPython's
    # default limit of 1000 (the suite itself may raise the limit for the
    # recursive reference oracle, so no runtime assert here)
    d = 1200
    a = parse_arena("<div>" * d + "x" + "</div>" * d)
    out = serialize.prettify(a)
    # the multiline branch fires at every level: one indent line per div
    assert out.count("\n") >= d
    assert "x" in out


def test_prettify_matches_reference_shape_shallow(ref):
    """Sanity: at a depth the reference CAN handle, outputs agree — the
    iterative rewrite changed mechanics, not semantics."""
    html = "<div>" * 50 + "x" + "</div>" * 50
    assert serialize.prettify(parse_arena(html)) == ref.parse(html).prettify()
