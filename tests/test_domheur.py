"""Unit pins for the text-density main-block heuristic (functions/domheur):
tie-breaks, script/style exclusion, candidate-set edges, deep nests."""

from __future__ import annotations

import sys

from dhtmlparser3_spark.functions.domheur import density_main_block


def test_basic_densest_wins():
    h = "<body><div>short</div><div>much longer content here</div></body>"
    assert density_main_block(h) == ("div", 24)


def test_tie_goes_to_first_in_document():
    h = "<body><p>aaaa</p><div>bbbb</div></body>"
    assert density_main_block(h) == ("p", 4)


def test_script_style_subtrees_score_zero():
    h = (
        "<body><div><script>var x = 'enormous blob of code';</script>hi</div>"
        "<p>real text</p></body>"
    )
    assert density_main_block(h) == ("p", 9)


def test_parent_includes_child_text_and_wins_on_tie():
    # outer div subtree == inner div subtree → outer (earlier pre-order)
    h = "<body><div><div>nested words</div></div></body>"
    assert density_main_block(h) == ("div", 12)


def test_no_candidates_returns_none():
    assert density_main_block("<body><span>only spans</span></body>") is None


def test_case_insensitive_names():
    h = "<body><DIV>Upper case tag</DIV></body>"
    name, score = density_main_block(h)
    assert name == "DIV" and score == 14


def test_deep_nest_no_recursion_error():
    d = 5000
    assert d > sys.getrecursionlimit()
    h = "<div>" * d + "x" + "</div>" * d
    assert density_main_block(h) == ("div", 1)
