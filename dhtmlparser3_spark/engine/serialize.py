"""Serialization folds over the Arena — byte-identical to the reference.

Maps to reference operators (SURVEY.md §2.5):

* ``content_str``            — Tag.content_str   (tag.py:173-190)  [X1]
* ``to_string``              — Tag.to_string     (tag.py:127-146)  [X2]
* ``tag_to_str``             — Tag.tag_to_str    (tag.py:148-158)  [X3]
* ``content_without_tags``   — tag.py:75-88                        [X6]
* ``prettify``               — tag.py:422-478                      [X7]
* ``comment_to_string``      — tags/comment.py:5-9                 [X8]
* ``escape_quote``           — quoter.py:6-30                      [X5]

Byte-identity traps honoured:

* text children are ``html.escape``-d (quote=True → also ``'``→``&#x27;``)
  inside to_string, EXCEPT under ``style``/``script`` (tag.py:23,133-135),
* ``content_str`` keeps *top-level* strings raw (escape=False default) while
  nested text is re-escaped via the child's to_string (tag.py:181-188),
* attribute values escape ONLY ``"``→``&quot;`` (quoter.py:6-30),
* bare/empty-valued attributes render as the bare key (tag.py:166-169),
* a non-pair tag renders ``<name ... />`` (tag.py:155-156), an empty name
  renders to nothing (tag.py:152-153),
* whitespace-only comments render ``<!-- -->`` (comment.py:5-9).

``to_string``/``content_str``/``content_without_tags``/``prettify`` are
*iterative* (explicit work stack): Common-Crawl junk HTML nests deeper than
CPython's recursion limit; the reference would RecursionError there, we do
not (the outputs are identical on anything the reference can parse —
pinned by tests/test_deep_nesting.py and the differential fuzz suites).
"""

from __future__ import annotations

import html
from typing import List, Optional

from dhtmlparser3_spark.engine.dom import Arena
from dhtmlparser3_spark.engine.lexer import COMMENT, TAG, TEXT

_DONT_ESCAPE = {"style", "script"}  # tag.py:23
_DONT_FORMAT = {"pre", "style", "script"}  # tag.py:24


def escape_quote(value: str) -> str:
    """quoter.escape — '"' → '&quot;' and nothing else."""
    return value.replace('"', "&quot;")


def comment_to_string(content: str) -> str:
    if not content.strip():
        return "<!-- -->"
    return f"<!--{content}-->"


def params_to_str(attrs) -> str:
    """tag.py:160-171 — insertion order, falsy value → bare key."""
    if not attrs:
        return ""
    parts = []
    for key, value in attrs:
        if value:
            parts.append(f'{key}="{escape_quote(str(value))}"')
        else:
            parts.append(f"{key}")
    return " " + " ".join(parts)


def tag_to_str(a: Arena, nid: int) -> str:
    name = a.name[nid]
    if not name:
        return ""
    if a.non_pair[nid]:
        return f"<{name}{params_to_str(a.attrs[nid])} />"
    return f"<{name}{params_to_str(a.attrs[nid])}>"


# work-stack opcodes
_OPEN = 0
_LIT = 1


def _serialize_tag(a: Arena, root: int, out: List[str]) -> None:
    """Append the full to_string of tag/comment node ``root`` to ``out``."""
    kind_l, name_l, text_l = a.kind, a.name, a.text
    np_l, ch_l, attrs_l = a.non_pair, a.children, a.attrs
    emit = out.append
    esc = html.escape
    stack = [(_OPEN, root)]
    push = stack.append
    while stack:
        op, x = stack.pop()
        if op == _LIT:
            emit(x)
            continue
        k = kind_l[x]
        if k == COMMENT:
            emit(comment_to_string(text_l[x]))
            continue
        if k == TEXT:
            # only reachable if a text node is serialized directly
            emit(text_l[x])
            continue
        name = name_l[x]
        non_pair = np_l[x]
        if name:
            if non_pair:
                emit(f"<{name}{params_to_str(attrs_l[x])} />")
            else:
                emit(f"<{name}{params_to_str(attrs_l[x])}>")
                push((_LIT, f"</{name}>"))
            raw = name in _DONT_ESCAPE
        else:
            raw = False
        for ch in reversed(ch_l[x]):
            if kind_l[ch] == TEXT:
                t = text_l[ch]
                push((_LIT, t if raw else esc(t)))
            else:
                push((_OPEN, ch))


def to_string(a: Arena, nid: Optional[int] = None) -> str:
    if nid is None:
        nid = a.result_root
    out: List[str] = []
    _serialize_tag(a, nid, out)
    return "".join(out)


def content_str(a: Arena, nid: Optional[int] = None, escape: bool = False) -> str:
    """Inner serialization: top-level text raw (or escaped), tag/comment
    children via their to_string (tag.py:173-190)."""
    if nid is None:
        nid = a.result_root
    out: List[str] = []
    for ch in a.children[nid]:
        if a.kind[ch] == TEXT:
            t = a.text[ch]
            out.append(html.escape(t) if escape else t)
        else:
            _serialize_tag(a, ch, out)
    return "".join(out)


def content_without_tags(a: Arena, nid: Optional[int] = None) -> str:
    """Concatenate text nodes only, comments dropped (tag.py:75-88)."""
    if nid is None:
        nid = a.result_root
    out: List[str] = []
    stack = list(reversed(a.children[nid]))
    while stack:
        x = stack.pop()
        k = a.kind[x]
        if k == TEXT:
            out.append(a.text[x])
        elif k == TAG:
            stack.extend(reversed(a.children[x]))
    return "".join(out)


def comment_prettify(content: str, depth: int, dont_format: bool = False) -> str:
    if dont_format:
        return comment_to_string(content)
    return f"{depth * '  '}{comment_to_string(content)}"


class _PrettyFrame:
    """One open tag (or virtual container) on the explicit prettify stack."""

    __slots__ = ("nid", "depth", "dont_format", "virtual", "parts", "children", "idx")

    def __init__(self, nid, depth, dont_format, virtual, children):
        self.nid = nid
        self.depth = depth
        self.dont_format = dont_format
        self.virtual = virtual
        self.parts: List[str] = []
        self.children = children
        self.idx = 0


def prettify(
    a: Arena, nid: Optional[int] = None, depth: int = 0, dont_format: bool = False
) -> str:
    """tag.py:422-478, iterative (explicit frame stack).

    The reference recurses per nesting level and RecursionErrors on
    junk-HTML nests past CPython's limit; like to_string/content_str we
    run on an explicit stack so depth is bounded by memory only.  Output
    is byte-identical on anything the reference can prettify (pinned by
    the differential fuzz tests in tests/test_dom_differential.py).
    """
    if nid is None:
        nid = a.result_root
    kind_l, name_l, text_l, ch_l = a.kind, a.name, a.text, a.children

    def start(n: int, d: int, df: bool):
        """Return the finished string for leaf cases, else a new frame."""
        k = kind_l[n]
        if k == COMMENT:
            return comment_prettify(text_l[n], d, df)
        if k == TEXT:
            return text_l[n]
        name = name_l[n]
        if name == "":
            return _PrettyFrame(n, d, df, True, ch_l[n])
        if a.non_pair[n] and not ch_l[n]:
            return f"{d * '  '}{tag_to_str(a, n)}\n"
        if not df and name in _DONT_FORMAT:
            df = True
        return _PrettyFrame(n, d, df, False, ch_l[n])

    root = start(nid, depth, dont_format)
    if isinstance(root, str):
        return root
    stack = [root]
    while True:
        fr = stack[-1]
        pushed = False
        while fr.idx < len(fr.children):
            ch = fr.children[fr.idx]
            fr.idx += 1
            ck = kind_l[ch]
            if fr.virtual:
                # tag.py:464-478 — items prettified at depth 0, text kept
                # only when non-whitespace (escaped)
                if ck == TEXT:
                    t = text_l[ch]
                    if t.strip():
                        fr.parts.append(html.escape(t))
                    continue
                sub = start(ch, 0, False)
            else:
                if ck == TEXT:
                    t = text_l[ch]
                    if fr.dont_format or t.strip():
                        raw = name_l[fr.nid] in _DONT_ESCAPE
                        fr.parts.append(t if raw else html.escape(t))
                    continue
                sub = start(ch, fr.depth + 1, fr.dont_format)
            if isinstance(sub, str):
                fr.parts.append(sub)
            else:
                stack.append(sub)
                pushed = True
                break
        if pushed:
            continue
        done = _finish_pretty(a, fr)
        stack.pop()
        if not stack:
            return done
        stack[-1].parts.append(done)


def _finish_pretty(a: Arena, fr: _PrettyFrame) -> str:
    """Assemble a completed frame — the tail of tag.py:441-462 (or the
    join of the virtual container, tag.py:476-478)."""
    if fr.virtual:
        return "\n".join(fr.parts)
    nid = fr.nid
    name = a.name[nid]
    tag = tag_to_str(a, nid)
    indent = fr.depth * "  "
    end_tag = "" if a.non_pair[nid] else f"</{name}>"
    content = "".join(fr.parts)

    if fr.dont_format:
        return f"{tag}{content}{end_tag}\n"

    # == reference's per-char newline count over the stripped content,
    # done at C speed (the per-char generator is O(subtree²) on deep nests)
    is_multiline = content.strip().count("\n") > 1
    if is_multiline:
        if content.endswith("\n"):
            return f"{indent}{tag}\n{content}{indent}{end_tag}\n"
        return f"{indent}{tag}\n{content}\n{indent}{end_tag}\n"

    if content.startswith("  ") and content.endswith("\n"):
        return f"{indent}{tag}\n{content}{indent}{end_tag}\n"

    return f"{indent}{tag}{content}{end_tag}\n"
