"""Differential tests: our lexer vs the vendored reference tokenizer.

Token streams must be IDENTICAL (kind, content, name, params, flags) on the
full snippet corpus and on hypothesis-fuzzed HTML-ish strings, including
raised-exception parity for out-of-range numeric entities.
"""

from __future__ import annotations

import pytest
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from dhtmlparser3_spark.engine import lexer
from tests.corpus import SNIPPETS


def ours(s):
    out = []
    for tok in lexer.lex_iter(s):
        if tok[0] == lexer.TEXT:
            out.append(("text", tok[1]))
        elif tok[0] == lexer.COMMENT:
            out.append(("comment", tok[1]))
        else:
            out.append(("tag", tok[1], tuple(tok[2]), tok[3], tok[4]))
    return out


def theirs(s):
    from dhtmlparser3.tokenizer import Tokenizer
    from dhtmlparser3.tokens import CommentToken, TagToken, TextToken

    out = []
    for tok in Tokenizer(s).tokenize_iter():
        if isinstance(tok, TextToken):
            out.append(("text", tok.content))
        elif isinstance(tok, CommentToken):
            out.append(("comment", tok.content))
        elif isinstance(tok, TagToken):
            out.append(
                (
                    "tag",
                    tok.name,
                    tuple((p.key, p.value) for p in tok.parameters),
                    tok.is_non_pair,
                    tok.is_end_tag,
                )
            )
        else:  # pragma: no cover - EntityToken never escapes tokenize_iter
            out.append(("entity", tok.content))
    return out


def compare(s):
    try:
        expected = theirs(s)
        exc_e = None
    except Exception as e:  # noqa: BLE001 - exception parity check
        expected, exc_e = None, type(e).__name__
    try:
        got = ours(s)
        exc_g = None
    except Exception as e:  # noqa: BLE001
        got, exc_g = None, type(e).__name__
    if exc_e == "_Recover":  # never leaks from our public API
        exc_e = "IOError"
    assert exc_g == exc_e, f"exception mismatch on {s!r}: ours={exc_g} ref={exc_e}"
    assert got == expected, f"token mismatch on {s!r}:\nours={got}\nref ={expected}"


@pytest.mark.parametrize("s", SNIPPETS, ids=range(len(SNIPPETS)))
def test_corpus_snippets(ref, s):
    compare(s)


def test_spans_cover_source(ref):
    """Our extension: token spans must tile back into the source string."""
    for s in SNIPPETS:
        try:
            toks = lexer.lex(s)
        except Exception:  # noqa: BLE001 - parity cases covered above
            continue
        last = 0
        for t in toks:
            start, end = t[-2], t[-1]
            assert 0 <= start <= end <= len(s)
            assert start == last, f"gap in spans for {s!r}: {toks}"
            last = end
        if toks:
            assert last == len(s)


HTMLISH = st.text(
    alphabet=st.sampled_from(
        list("<>&;/=\"' \t\n\rabAB#x01-!πé")
    ),
    max_size=40,
)


@given(HTMLISH)
@settings(max_examples=2000, deadline=None, suppress_health_check=[HealthCheck.too_slow])
def test_fuzz_differential(s):
    import sys

    if "/root/reference/src" not in sys.path:
        sys.path.insert(0, "/root/reference/src")
    compare(s)
