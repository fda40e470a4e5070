"""Lenient HTML/XML lexer — semantics-exact with the reference tokenizer.

This is a from-scratch, index-based scanner over ``str`` that produces plain
tuples (Arrow/pandas friendly, no per-token objects), engineered so that the
token stream is *behaviour-identical* to the reference state machine
(``/root/reference/src/dhtmlparser3/tokenizer.py`` + ``tokens.py``), including
its malformed-HTML recovery and its deliberate quirks:

* adjacent text tokens merge at scan time (tokenizer.py:44-50),
* entity tokens are decoded inline into text (tokenizer.py:35-36, 41-42),
* a failed ``<...>`` scan backtracks and re-emits the raw slice as text
  (tokenizer.py:55-62),
* the whitespace set is `` \\t\\n`` — NO ``\\r`` (tokenizer.py:118-126),
* entities are capped at 20 chars (tokenizer.py:14), ``&;`` leaves the cursor
  ON the ``;`` so it is scanned twice (``"&;x"`` → text ``"&;;x"``;
  tokenizer.py:229-236 — verified against the reference),
* an unquoted attribute value followed by a stray quote consumes+drops the
  quote (tokenizer.py:161-166),
* a peek past end-of-string returns ``""`` which tests as a member of every
  stop-string (``"" in "..."`` is True) — so EOF acts as a universal stop char,
* the entity table is NOT html.unescape (13 entries only, tokens.py:120-134)
  and unknown entities come back *lowercased* (tokens.py:137).

Token tuples (kind first, source span last — spans are byte offsets into the
*decoded* source string and always cover the raw slice the token came from):

* ``(TEXT, content, start, end)``
* ``(TAG, name, params, is_non_pair, is_end_tag, start, end)`` with
  ``params``: ``list[(key, value)]`` in source order, duplicates preserved
* ``(COMMENT, content, start, end)``
"""

from __future__ import annotations

import re
from typing import Iterator, List, Tuple

TEXT = 0
TAG = 1
COMMENT = 2

# maximal runs of non-stop chars — used to jump instead of per-char loops;
# semantics identical to the reference's peek loops because a run ends at
# the FIRST stop char and EOF acts as a stop
_NAME_RUN = re.compile(r"[^> \n\t</]*")
_KEY_RUN = re.compile(r"[^ <=/>\t\n]*")
_VAL_RUN = re.compile(r"[^ </>'\"\t\n]*")

MAX_ENTITY_LENGTH = 20  # reference tokenizer.py:14

# Reference tokens.py:120-134 — deliberately NOT html.unescape (includes the
# nonstandard &nonbreakingspace;, lacks most of HTML5).
NAMED_ENTITIES = {
    "&amp;": "&",
    "&lt;": "<",
    "&gt;": ">",
    "&nonbreakingspace;": "\xa0",
    "&nbsp;": "\xa0",
    "&quot;": '"',
    "&apos;": "'",
    "&cent;": "\xa2",
    "&pound;": "\xa3",
    "&yen;": "\xa5",
    "&euro;": "€",
    "&copy;": "\xa9",
    "&reg;": "\xae",
}

# Stop sets kept as *strings*, not sets: a peek at EOF yields "" and
# `"" in "<string>"` is True — the reference relies on that to treat EOF as a
# stop character (tokenizer.py:131,146,161).
_NAME_STOP = "> \n\t</"
_KEY_STOP = " <=/>\t\n"
_VAL_STOP = " </>'\"\t\n"


class _Recover(Exception):
    """Models the reference's IOError backtracking (tokenizer.py:57-62)."""

    def __init__(self, pos: int):
        self.pos = pos


def decode_entity(raw: str) -> str:
    """Decode one ``&...;`` entity exactly like EntityToken (tokens.py:136-150).

    Content is lowercased first (tokens.py:137), so ``&AMP;`` decodes while an
    unknown ``&FooBar;`` comes back as ``&foobar;``.  Numeric forms go through
    ``chr`` and may raise for out-of-range codepoints — parity with the
    reference, which propagates the same error.
    """
    e = raw.lower()
    rep = NAMED_ENTITIES.get(e)
    if rep:
        return rep
    if e.startswith("&#x"):
        return chr(int("0" + e[2:-1], 16))
    if e.startswith("&#"):
        return chr(int(e[2:-1]))
    return e


def lex(s: str) -> List[tuple]:
    """Token list with adjacent-text merging (tokenizer.py:27-53).

    List-building (not a generator): the suspend/resume cost of a generator
    is measurable at 10^12-doc scale and the whole token list of one
    document is small.
    """
    n = len(s)
    if n <= 1:
        # single-char fast path (tokenizer.py:28-30); empty input degenerates
        # to one empty text token via the text scanner.
        return [(TEXT, s, 0, n)]

    out: List[tuple] = []
    append = out.append
    find = s.find
    pend = None
    i = 0
    # _scan's dispatch + the text scanner are inlined here: one Python call
    # per token is ~10% of lex time at 10^12-doc scale (semantics identical
    # to tokenizer.py:27-66 — see _scan, kept for the unit tests).
    while i < n:
        c = s[i]
        if c == "<":
            try:
                tok, i = _tag_scan(s, i, n)
            except _Recover as r:
                j = min(r.pos, n)
                tok, i = (TEXT, s[i:j], i, j), j
        elif c == "&":
            text, j, _ = _entity_scan(s, i, n - 1)
            tok, i = (TEXT, text, i, min(j, n)), j
        else:
            a = find("<", i + 1)
            b = find("&", i + 1)
            if a < 0:
                a = n
            if b < 0:
                b = n
            j = a if a < b else b
            tok, i = (TEXT, s[i:j], i, j), j
        if pend is None:
            pend = tok
        elif pend[0] == TEXT and tok[0] == TEXT:
            pend = (TEXT, pend[1] + tok[1], pend[2], tok[3])
        else:
            append(pend)
            pend = tok
    if pend is not None:
        append(pend)
    return out


def lex_iter(s: str) -> Iterator[tuple]:
    return iter(lex(s))


def _scan(s: str, i: int, n: int) -> Tuple[tuple, int]:
    c = s[i]
    if c == "<":
        try:
            return _tag_scan(s, i, n)
        except _Recover as r:
            j = min(r.pos, n)
            return (TEXT, s[i:j], i, j), j
    if c == "&":
        text, j, _ = _entity_scan(s, i, n - 1)
        return (TEXT, text, i, min(j, n)), j
    return _text_scan(s, i, n)


def _text_scan(s: str, i: int, n: int) -> Tuple[tuple, int]:
    # Run until '<' or '&' (tokenizer.py:241-251).  Implemented with str.find
    # jumps instead of a per-char loop — the output is identical because text
    # has no internal structure.
    a = s.find("<", i + 1)
    b = s.find("&", i + 1)
    if a < 0:
        a = n
    if b < 0:
        b = n
    j = a if a < b else b
    return (TEXT, s[i:j], i, j), j


def _skip_ws(s: str, p: int, end: int) -> int:
    # space/tab/newline ONLY — \r is content (tokenizer.py:118-126)
    while p <= end:
        c = s[p]
        if c != " " and c != "\t" and c != "\n":
            return p
        p += 1
    return p


def _tag_scan(s: str, i: int, n: int) -> Tuple[tuple, int]:
    """Scan ``<...>`` from the '<' at ``i`` (tokenizer.py:68-116)."""
    end = n - 1
    start = i
    p = i + 1  # consume '<'
    p = _skip_ws(s, p, end)
    c = s[p] if p <= end else s[end]  # cursor past end sees the stale last char

    is_end = False
    if c == "/":
        is_end = True
        p += 1
        c = s[p] if p <= end else s[end]

    if c == ">":
        p += 1
        return (TEXT, "<>", start, p), p  # literal "<>" (tokenizer.py:77-79)

    if (
        c == "!"
        and (s[p + 1] if p < end else "") == "-"
        and (s[p + 2] if p + 1 < end else "") == "-"
    ):
        return _comment_scan(s, p, n, start)

    name, p = _tag_name(s, p, end)
    params: List[Tuple[str, str]] = []
    non_pair = False
    while p <= end:
        # inline the no-whitespace fast path: most attr boundaries have a
        # single space or none, and the _skip_ws call itself is measurable
        # at 10^12-doc scale
        c = s[p]
        if c == " " or c == "\t" or c == "\n":
            p = _skip_ws(s, p, end)
            c = s[p] if p <= end else s[end]

        if c == ">":
            p += 1
            return (TAG, name, params, non_pair, is_end, start, p), p
        if c == "<":
            raise _Recover(p)  # nested tag start (tokenizer.py:92-93)

        key, p = _param_name(s, p, end)
        if p <= end:
            c = s[p]
            if c == " " or c == "\t" or c == "\n":
                p = _skip_ws(s, p, end)
            c = s[p] if p <= end else s[end]
        else:
            c = s[end]

        if c == "/":
            p += 1
            if key:
                params.append((key, ""))
            non_pair = True
        elif c == ">":
            params.append((key, ""))  # bare parameter (tokenizer.py:105-107)
        elif c == "=":
            p += 1
            p = _skip_ws(s, p, end)
            val, p = _param_value(s, p, end)
            params.append((key, val))

    raise _Recover(p)  # EOF inside tag (tokenizer.py:116)


def _tag_name(s: str, p: int, end: int) -> Tuple[str, int]:
    # name = first char + run until one of "> \n\t</" (tokenizer.py:128-137);
    # the first char is included even if it is itself a stop char
    if p > end:
        raise _Recover(p)
    q = _NAME_RUN.match(s, p + 1).end()
    return s[p:q], q  # cursor lands ON the stop char (or n at EOF)


def _param_name(s: str, p: int, end: int):
    c = s[p] if p <= end else s[end]
    if c == "/":
        return None, p  # tokenizer.py:140-141
    if p > end:
        raise _Recover(p)
    q = _KEY_RUN.match(s, p + 1).end()
    return s[p:q], q


def _param_value(s: str, p: int, end: int) -> Tuple[str, int]:
    c = s[p] if p <= end else s[end]
    if c == '"' or c == "'":
        return _quoted_value(s, p, end)
    if p > end:
        raise _Recover(p)
    q = _VAL_RUN.match(s, p + 1).end()
    buf = s[p:q]
    if q <= end and (s[q] == "'" or s[q] == '"'):
        return buf, q + 1  # stray trailing quote consumed AND dropped
    return buf, q


def _quoted_value(s: str, p: int, end: int) -> Tuple[str, int]:
    # tokenizer.py:172-194 — multiline allowed, entities decoded inline
    q = s[p] if p <= end else s[end]
    p += 1
    c = s[p] if p <= end else s[end]
    if c == q:
        return "", p + 1  # empty-value fast path
    buf = ""
    while p <= end:
        c = s[p]
        if c == q:
            return buf, p + 1
        if c == "&":
            text, p, _ = _entity_scan(s, p, end)
            buf += text
            continue
        buf += c
        p += 1
    raise _Recover(p)


def _entity_scan(s: str, i: int, end: int) -> Tuple[str, int, bool]:
    """Scan ``&...`` from ``i``; returns (text, next_pos, was_entity).

    Mirrors _consume_entity (tokenizer.py:214-239) + inline to_text: a real
    entity is decoded; aborted scans return the raw buffer with the cursor
    left ON the aborting char (space / overflow char / the ';' of "&;"),
    which the caller then re-scans — this reproduces the "&;" duplication.
    """
    buf = s[i]  # '&'
    p = i
    length = 0
    while p <= end:
        p += 1
        ch = s[p] if p <= end else ""
        length += 1
        if ch == " ":
            return buf, p, False
        if length > MAX_ENTITY_LENGTH:
            return buf, p, False
        buf += ch
        if ch == ";":
            if buf != "&;":
                if p <= end:
                    p += 1
                return decode_entity(buf), p, True
            return buf, p, False  # cursor stays ON ';' → scanned again
    return buf, p, False


def _comment_scan(s: str, p: int, n: int, start: int) -> Tuple[tuple, int]:
    """``<!--`` ... ``-->`` from the '!' at ``p`` (tokenizer.py:196-212)."""
    k = s.find("-->", p + 3)
    if k < 0:
        # unterminated → literal text, note the reconstructed "<!--" prefix
        return (TEXT, "<!--" + s[p + 3 :], start, n), n
    return (COMMENT, s[p + 3 : k], start, k + 3), k + 3
