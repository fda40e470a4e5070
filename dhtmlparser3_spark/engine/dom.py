"""Arena (struct-of-arrays) DOM — tree-shape-exact with the reference parser.

Instead of the reference's parent-linked object tree
(``/root/reference/src/dhtmlparser3/parser.py`` + ``tags/tag.py``) we build a
flat *arena*: parallel lists indexed by node id, with explicit ``children``
id-lists.  This representation

* is what the Spark side needs anyway (it flattens to an
  ``array<struct<...>>`` column with zero object graphs),
* has no recursion limits (junk HTML nests arbitrarily deep at CC scale),
* makes parent rewiring / reshaping O(1)-ish list surgery.

Semantics replicated exactly (all observable via the reference's own tests):

* stack machine incl. *retroactive non-pair reshaping*: ``</x>`` closing over
  still-open tags hoists their content to the enclosing element and marks
  them non-pair (parser.py:60-135); hoisting looks the moved tag up in its
  parent by *equality* (name+attrs+non_pair), not identity (parser.py:145),
* unmatched end tags are dropped (parser.py:65-66),
* end-tag names match **case-sensitively** (parser.py:61),
* BOM quirk: the 3-char mojibake prefix "\\xef\\xbb\\xbf" is stripped only when
  len > 3 (parser.py:26-28) — a real "\\ufeff" is NOT stripped,
* root unwrap iff the virtual root holds exactly one Tag (parser.py:90-93),
* attribute dicts: case-preserving storage, case-insensitive identity, last
  value wins, *first position kept* (specialdict.py:31-48); attr-dict equality
  is order-insensitive / key-case-insensitive / value-exact
  (specialdict.py:86-111),
* the reference's ``NONPAIR_TAGS`` set (parser.py:13-23) is DEAD CODE — we
  deliberately do NOT special-case br/hr/img/...; non-pair detection is purely
  syntactic (``/``) + structural (reshape),
* ``.parent`` keeps the reference's (sometimes stale) pointer semantics:
  ``_move_content_to_parent`` does not re-point moved children; use
  ``double_link()`` for structural parents — exactly like the reference.

The ``case_insensitive_parameters`` global of the reference
(``Tag._DICT_INSTANCE``, parser.py:30-33) is a per-parse *parameter* here:
Spark workers are long-lived and shared, global mutable state is a hazard.
"""

from __future__ import annotations

from typing import Iterable, List, Optional, Tuple

from dhtmlparser3_spark.engine import lexer
from dhtmlparser3_spark.engine.lexer import COMMENT, TAG, TEXT

__all__ = ["Arena", "build_arena", "parse_arena", "strip_bom"]


def strip_bom(s: str) -> str:
    """parser.py:26-28 — fires only on the decoded-as-latin1 byte pattern."""
    if len(s) > 3 and s[:3] == "\xef\xbb\xbf":
        return s[3:]
    return s


def fold_attrs(
    pairs: Iterable[Tuple[Optional[str], str]], case_insensitive: bool = True
) -> List[Tuple[Optional[str], str]]:
    """Apply SpecialDict assignment semantics to raw token params.

    Last assignment wins; a re-assignment under a (case-insensitively) equal
    key replaces key+value *in place*, preserving the original position
    (specialdict.py:31-48, pinned by test_specialdict.py:103-130).
    """
    out: List[Tuple[Optional[str], str]] = []
    seen: dict = {}
    for k, v in pairs:
        ident = k.lower() if (case_insensitive and isinstance(k, str)) else k
        at = seen.get(ident)
        if at is None:
            seen[ident] = len(out)
            out.append((k, v))
        else:
            out[at] = (k, v)
    return out


def attrs_get(
    attrs: List[Tuple[str, str]], key, case_insensitive: bool = True, default=None
):
    """SpecialDict.get — case-insensitive key lookup (specialdict.py:70-76)."""
    ident = key.lower() if (case_insensitive and isinstance(key, str)) else key
    for k, v in attrs:
        kid = k.lower() if (case_insensitive and isinstance(k, str)) else k
        if kid == ident:
            return v
    return default


def attrs_contains(attrs, key, case_insensitive: bool = True) -> bool:
    sentinel = object()
    return attrs_get(attrs, key, case_insensitive, sentinel) is not sentinel


def attrs_equal(a, b, case_insensitive: bool = True) -> bool:
    """SpecialDict.__eq__ — order-insensitive, key-case-insensitive,
    value-exact (specialdict.py:86-111)."""
    if len(a) != len(b):
        return False
    sentinel = object()
    for k, v in b:
        mine = attrs_get(a, k, case_insensitive, sentinel)
        if mine is sentinel or mine != v:
            return False
    return True


class Arena:
    """One parsed document as parallel per-node arrays.

    Node 0 is the virtual root (name ``""``).  ``result_root`` is node 0 or —
    after the reference's unwrap rule — its single Tag child.
    """

    __slots__ = (
        "kind",
        "name",
        "attrs",
        "text",
        "non_pair",
        "children",
        "parent",
        "src_start",
        "src_end",
        "case_insensitive",
        "result_root",
    )

    def __init__(self, case_insensitive: bool = True):
        self.kind: List[int] = []
        self.name: List[str] = []
        self.attrs: List[List[Tuple[str, str]]] = []
        self.text: List[str] = []
        self.non_pair: List[bool] = []
        self.children: List[List[int]] = []
        # reference-semantic parent pointer (may go stale after reshape,
        # exactly like the reference until double_link() is called)
        self.parent: List[int] = []
        self.src_start: List[int] = []
        self.src_end: List[int] = []
        self.case_insensitive = case_insensitive
        self.result_root = 0

    # -- construction -----------------------------------------------------

    def new_node(
        self,
        kind: int,
        name: str = "",
        attrs=None,
        text: str = "",
        non_pair: bool = False,
        parent: int = -1,
        src_start: int = -1,
        src_end: int = -1,
    ) -> int:
        nid = len(self.kind)
        self.kind.append(kind)
        self.name.append(name)
        self.attrs.append(attrs if attrs is not None else [])
        self.text.append(text)
        self.non_pair.append(non_pair)
        self.children.append([])
        self.parent.append(parent)
        self.src_start.append(src_start)
        self.src_end.append(src_end)
        return nid

    # -- equality used by reshape hoisting --------------------------------

    def tag_equal(self, a: int, b: int) -> bool:
        """Tag.__eq__: name + parameters + is_non_pair, subtree ignored
        (tag.py:497-510)."""
        if self.kind[a] != TAG or self.kind[b] != TAG:
            return False
        if self.name[a] != self.name[b]:
            return False
        if self.non_pair[a] != self.non_pair[b]:
            return False
        return attrs_equal(self.attrs[a], self.attrs[b], self.case_insensitive)

    # -- structural helpers ------------------------------------------------

    def double_link(self, root: Optional[int] = None) -> None:
        """Recompute reference-semantic parents from the children lists
        (tag.py:65-73)."""
        if root is None:
            root = self.result_root
        stack = [root]
        while stack:
            nid = stack.pop()
            for ch in self.children[nid]:
                if self.kind[ch] == TAG:
                    self.parent[ch] = nid
                    stack.append(ch)

    def iter_pre_order(self, root: Optional[int] = None, tags_only: bool = False):
        """Depth-first pre-order including self (tag.py:355-364).

        Text/comment children are yielded (when not tags_only) but never
        descended into — matching the reference, which only recurses on Tags.
        """
        if root is None:
            root = self.result_root
        stack = [root]
        while stack:
            nid = stack.pop()
            k = self.kind[nid]
            if k == TAG:
                yield nid
                stack.extend(reversed(self.children[nid]))
            elif not tags_only:
                yield nid

    def iter_breadth_first(self, root: Optional[int] = None, tags_only: bool = False):
        """Level-ish order per breadth_first_iterator (tag.py:366-381): self,
        then children, then recurse into each child in order."""
        from collections import deque

        if root is None:
            root = self.result_root
        yield root
        # deque, not list: pop(0) + "nxt + queue" list rebuilding is
        # O(n^2) on wide junk documents (50k siblings under one parent);
        # popleft/extendleft(reversed(...)) yields the IDENTICAL order in
        # O(n)
        queue = deque([root])
        while queue:
            nid = queue.popleft()
            nxt = []
            for ch in self.children[nid]:
                k = self.kind[ch]
                if k == TAG:
                    yield ch
                    nxt.append(ch)
                elif not tags_only:
                    yield ch
            # reference recursion order: finish this node's children, then
            # recurse child-by-child (NOT a plain FIFO over the whole level)
            queue.extendleft(reversed(nxt))
        return


def build_arena(tokens: Iterable[tuple], case_insensitive: bool = True) -> Arena:
    """Stack-machine tree build — parser.py:37-93 on arrays.

    The arena appends are inlined with bound methods: this loop allocates
    every node of every document at 10^12-doc scale, and attribute/method
    lookups per node are ~25% of build time in CPython.
    """
    a = Arena(case_insensitive)
    root = a.new_node(TAG, "")  # virtual root
    stack = [root]
    top = root

    kind_l, name_l, attrs_l = a.kind, a.name, a.attrs
    text_l, np_l, ch_l = a.text, a.non_pair, a.children
    par_l, s0_l, s1_l = a.parent, a.src_start, a.src_end
    k_app, n_app, a_app = kind_l.append, name_l.append, attrs_l.append
    t_app, np_app, c_app = text_l.append, np_l.append, ch_l.append
    p_app, s0_app, s1_app = par_l.append, s0_l.append, s1_l.append

    nid = 0
    for tok in tokens:
        k = tok[0]
        if k == TAG:
            _, name, params, non_pair, is_end, s0, s1 = tok
            if is_end and not non_pair:
                closed = -1
                for x in reversed(stack):
                    if name_l[x] == name:  # case-sensitive (parser.py:61)
                        closed = x
                        break
                if closed < 0:
                    continue  # stray end tag → dropped (parser.py:65-66)
                if closed == top:
                    stack.pop()
                    top = stack[-1]
                    continue
                top = _reshape_non_pair_tags(a, stack, closed)
                continue
            nid += 1
            k_app(TAG)
            n_app(name)
            a_app(fold_attrs(params, case_insensitive) if params else [])
            t_app("")
            np_app(non_pair)
            c_app([])
            p_app(top)
            s0_app(s0)
            s1_app(s1)
            ch_l[top].append(nid)
            if not non_pair:
                stack.append(nid)
                top = nid
        else:  # TEXT / COMMENT
            nid += 1
            k_app(k)
            n_app("")
            a_app([])
            t_app(tok[1])
            np_app(False)
            c_app([])
            p_app(top)
            s0_app(tok[2])
            s1_app(tok[3])
            ch_l[top].append(nid)

    if len(stack) > 1:
        _reshape_non_pair_tags(a, stack, root)

    # root unwrap iff exactly one child and it is a Tag (parser.py:90-93)
    rc = a.children[root]
    if len(rc) == 1 and a.kind[rc[0]] == TAG:
        a.result_root = rc[0]
    else:
        a.result_root = root
    return a


def _reshape_non_pair_tags(a: Arena, stack: List[int], closed: int) -> int:
    """parser.py:95-135 — everything above ``closed`` on the stack becomes
    non-pair; content is hoisted to the enclosing element, deepest first.

    The split point is found by *equality* search, exactly like the
    reference's ``element_stack.index(closed_element)`` (parser.py:113):
    list.index uses Tag.__eq__, so when the stack holds duplicate equal
    open tags (``<div><div><p>x</div>``) the reshape cuts at the FIRST
    equal one — the outermost ``<div>`` becomes the closed pair and the
    inner duplicate is itself reshaped to non-pair (with ``parent`` still
    pointing at the identity-matched innermost node, also reference
    behavior).  An identity index here diverges on that input."""
    ci = 0
    for i, x in enumerate(stack):
        if x == closed or a.tag_equal(x, closed):
            ci = i + 1
            break
    non_pairs = stack[ci:]
    del stack[ci:]

    shifted = [stack[-1]] + non_pairs[:-1]
    for npt, par in zip(reversed(non_pairs), reversed(shifted)):
        _hoist_content(a, npt, par)
        a.non_pair[npt] = True
        a.parent[npt] = closed

    if stack:
        stack.pop()
        if stack:
            return stack[-1]
    return closed


def _hoist_content(a: Arena, npt: int, par: int) -> None:
    """parser.py:137-151 — splice npt's children into par right after npt.

    The insertion point is found by *equality* search (list.index uses
    Tag.__eq__), so with duplicate siblings the first equal tag wins — a
    reference quirk we keep.
    """
    kids = a.children[npt]
    if not kids:
        return
    pkids = a.children[par]
    at = 0
    for i, ch in enumerate(pkids):
        if a.tag_equal(ch, npt):
            at = i
            break
    a.children[par] = pkids[: at + 1] + kids + pkids[at + 1 :]
    a.children[npt] = []
    # NB: moved children keep their old .parent pointer — reference parity.


def parse_arena(
    string: str, case_insensitive_parameters: bool = True
) -> Arena:
    """str → Arena; the engine-level equivalent of dhtmlparser3.parse
    (__init__.py:24-26).

    STRICT for byte-parity: numeric entities whose codepoint overflows
    ``chr`` raise exactly as the reference does (ValueError /
    OverflowError); the Spark-tier UDF wrappers map that to an error ROW
    per document (functions/extract.py error-row policy) — there is no
    in-engine lenient mode.
    """
    s = strip_bom(string)
    return build_arena(lexer.lex(s), case_insensitive=case_insensitive_parameters)
