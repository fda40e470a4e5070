"""User-facing API parity layer: ``parse(html)`` → ``Node``.

A ``Node`` is a zero-copy view (arena + node id) exposing the reference
``Tag`` surface (SURVEY.md §2.4-§2.7): ``.name .p .c .parameters .content
.tags .parent``, ``find/findb/wfind/match/match_paths``,
``content_str/to_string/content_without_tags/prettify``, the mutation ops
(``remove/remove_item/replace_with/__setitem__/__delitem__``) and the dunder
surface (``__eq__ __hash__ __bool__ __len__ __getitem__ __contains__
__iter__ __copy__ __deepcopy__``).  A user of the reference can switch with
``import dhtmlparser3_spark.engine.api as dhtmlparser3``.

Differences by design (documented, not accidental):

* ``.content`` / ``.tags`` return freshly built lists of views (text items
  are plain ``str`` exactly like the reference); mutate through the mutation
  methods, not by editing the returned list,
* ``case_insensitive_parameters`` is a per-parse argument, never a global
  class toggle (the reference flips ``Tag._DICT_INSTANCE`` globally,
  parser.py:30-33 — unusable with long-lived shared Spark workers).
"""

from __future__ import annotations

import html as _html
from typing import List, Optional, Union

from dhtmlparser3_spark.engine import query, serialize
from dhtmlparser3_spark.engine.dom import (
    Arena,
    attrs_contains,
    attrs_equal,
    attrs_get,
    parse_arena,
)
from dhtmlparser3_spark.engine.lexer import COMMENT, TAG, TEXT


def parse(string: str, case_insensitive_parameters: bool = True) -> "Node":
    a = parse_arena(string, case_insensitive_parameters)
    return Node(a, a.result_root)


class FileParser:
    """File round-trip (reference __init__.py:9-21).

    Bug-parity note: the reference *ignores* ``case_insensitive_parameters``
    in FileParser (__init__.py:14 always calls plain ``parse``); we keep
    that behavior and document it rather than silently fixing it.
    """

    def __init__(self, path: str, case_insensitive_parameters: bool = True):
        self.path = path
        with open(path) as f:
            self.dom = parse(f.read())

    def write(self, path: Optional[str] = None) -> None:
        if path is None:
            path = self.path
        with open(path, "w") as f:
            f.write(str(self.dom))


def parse_file(path: str, case_insensitive_parameters: bool = True) -> FileParser:
    return FileParser(path, case_insensitive_parameters)


def Tag(name, parameters=None, content=None, is_non_pair=False) -> "Node":
    """Construct a free-standing tag node (reference Tag.__init__,
    tag.py:26-41) backed by its own one-node arena.  A plain-dict
    ``parameters`` goes through SpecialDict construction in the reference
    (tag.py:32), which FOLDS case-duplicate keys last-wins — mirrored via
    fold_attrs: Tag('x', {'A': '1', 'a': '2'}) keeps only a="2"."""
    from dhtmlparser3_spark.engine.dom import fold_attrs

    a = Arena(case_insensitive=True)
    attrs = (
        fold_attrs(list(parameters.items()), case_insensitive=True)
        if parameters
        else []
    )
    nid = a.new_node(TAG, name, attrs, non_pair=is_non_pair)
    node = Node(a, nid)
    a.result_root = nid
    for item in content or []:
        a.children[nid].append(_materialize(a, item, nid))
    return node


def Comment(content: str = "") -> "CommentNode":
    a = Arena(case_insensitive=True)
    nid = a.new_node(COMMENT, text=content)
    a.result_root = nid
    return CommentNode(a, nid)


class AttrsView:
    """Live dict-like view of a node's attributes with SpecialDict semantics
    (specialdict.py: case-insensitive identity, case-preserving storage,
    in-place re-assign)."""

    __slots__ = ("_a", "_nid")

    def __init__(self, arena: Arena, nid: int):
        self._a = arena
        self._nid = nid

    def _pairs(self):
        return self._a.attrs[self._nid]

    def __getitem__(self, key):
        sentinel = object()
        v = attrs_get(self._pairs(), key, self._a.case_insensitive, sentinel)
        if v is sentinel:
            raise KeyError(repr(key))
        return v

    def get(self, key, default=None):
        return attrs_get(self._pairs(), key, self._a.case_insensitive, default)

    def __setitem__(self, key, value):
        a, nid = self._a, self._nid
        pairs = a.attrs[nid]
        ident = key.lower() if (a.case_insensitive and isinstance(key, str)) else key
        for i, (k, _) in enumerate(pairs):
            kid = k.lower() if (a.case_insensitive and isinstance(k, str)) else k
            if kid == ident:
                pairs[i] = (key, value)
                return
        pairs.append((key, value))

    def __delitem__(self, key):
        a, nid = self._a, self._nid
        pairs = a.attrs[nid]
        ident = key.lower() if (a.case_insensitive and isinstance(key, str)) else key
        for i, (k, _) in enumerate(pairs):
            kid = k.lower() if (a.case_insensitive and isinstance(k, str)) else k
            if kid == ident:
                del pairs[i]
                return
        raise KeyError(repr(key))

    def __contains__(self, key):
        return attrs_contains(self._pairs(), key, self._a.case_insensitive)

    def __len__(self):
        return len(self._pairs())

    def __bool__(self):
        return bool(self._pairs())

    def __iter__(self):
        return iter([k for k, _ in self._pairs()])

    def keys(self):
        return [k for k, _ in self._pairs()]

    def values(self):
        return [v for _, v in self._pairs()]

    def items(self):
        return list(self._pairs())

    def clear(self):
        self._a.attrs[self._nid] = []

    def copy(self):
        return dict(self._pairs())

    def __eq__(self, other):
        if isinstance(other, AttrsView):
            other = other.items()
        elif hasattr(other, "items"):
            other = list(other.items())
        elif isinstance(other, list):
            pass
        else:
            return False
        return attrs_equal(self._pairs(), other, self._a.case_insensitive)

    def __ne__(self, other):
        return not self.__eq__(other)

    def __repr__(self):
        return repr(dict(self._pairs()))


class CommentNode:
    """View of a comment node (tags/comment.py)."""

    __slots__ = ("arena", "nid")

    def __init__(self, arena: Arena, nid: int):
        self.arena = arena
        self.nid = nid

    @property
    def content(self) -> str:
        return self.arena.text[self.nid]

    @content.setter
    def content(self, value: str):
        self.arena.text[self.nid] = value

    def to_string(self) -> str:
        return serialize.comment_to_string(self.content)

    def prettify(self, depth: int = 0, dont_format: bool = False) -> str:
        return serialize.comment_prettify(self.content, depth, dont_format)

    def __repr__(self):
        return self.to_string()

    def __eq__(self, other):
        if isinstance(other, CommentNode):
            return self.content == other.content
        return False

    def __ne__(self, other):
        return not self.__eq__(other)

    # the reference Comment defines __eq__ WITHOUT __hash__, which makes
    # it unhashable (tags/comment.py:20-27) — so hash() of any Node whose
    # content contains a comment raises TypeError; mirrored
    __hash__ = None


class Node:
    """Tag view over (arena, node id)."""

    __slots__ = ("arena", "nid")

    def __init__(self, arena: Arena, nid: int):
        self.arena = arena
        self.nid = nid

    # -- basic fields ------------------------------------------------------

    @property
    def name(self) -> str:
        return self.arena.name[self.nid]

    @name.setter
    def name(self, value: str):
        self.arena.name[self.nid] = value

    @property
    def is_non_pair(self) -> bool:
        return self.arena.non_pair[self.nid]

    @is_non_pair.setter
    def is_non_pair(self, value: bool):
        self.arena.non_pair[self.nid] = value

    @property
    def parameters(self) -> AttrsView:
        return AttrsView(self.arena, self.nid)

    p = parameters

    @property
    def parent(self) -> Optional["Node"]:
        pid = self.arena.parent[self.nid]
        return Node(self.arena, pid) if pid >= 0 else None

    @property
    def content(self) -> List[Union["Node", CommentNode, str]]:
        return [self._view(ch) for ch in self.arena.children[self.nid]]

    c = content

    @property
    def tags(self) -> List["Node"]:
        a = self.arena
        return [
            Node(a, ch) for ch in a.children[self.nid] if a.kind[ch] == TAG
        ]

    def _view(self, ch: int):
        k = self.arena.kind[ch]
        if k == TEXT:
            return self.arena.text[ch]
        if k == COMMENT:
            return CommentNode(self.arena, ch)
        return Node(self.arena, ch)

    def double_link(self):
        self.arena.double_link(self.nid)

    # -- queries -------------------------------------------------------------

    def _wrap(self, nid: int) -> "Node":
        return Node(self.arena, nid)

    def find(self, name, p=None, fn=None, case_sensitive=False) -> List["Node"]:
        ids = query.find_ids(
            self.arena, self.nid, name, p, fn, case_sensitive, self._wrap
        )
        return [Node(self.arena, i) for i in ids]

    def findb(self, name, p=None, fn=None, case_sensitive=False) -> List["Node"]:
        ids = query.findb_ids(
            self.arena, self.nid, name, p, fn, case_sensitive, self._wrap
        )
        return [Node(self.arena, i) for i in ids]

    def find_depth_first_iter(self, name, p=None, fn=None, case_sensitive=False):
        for nid in self.arena.iter_pre_order(self.nid, tags_only=True):
            if query.is_almost_equal(
                self.arena, nid, name, p, fn, case_sensitive, self._wrap
            ):
                yield Node(self.arena, nid)

    def find_breadth_first_iter(self, name, p=None, fn=None, case_sensitive=False):
        for nid in self.arena.iter_breadth_first(self.nid, tags_only=True):
            if query.is_almost_equal(
                self.arena, nid, name, p, fn, case_sensitive, self._wrap
            ):
                yield Node(self.arena, nid)

    def depth_first_iterator(self, tags_only: bool = False):
        for nid in self.arena.iter_pre_order(self.nid, tags_only=tags_only):
            yield self._view(nid) if self.arena.kind[nid] != TAG else Node(
                self.arena, nid
            )

    def breadth_first_iterator(self, tags_only: bool = False):
        for nid in self.arena.iter_breadth_first(self.nid, tags_only=tags_only):
            yield self._view(nid) if self.arena.kind[nid] != TAG else Node(
                self.arena, nid
            )

    def wfind(self, name, p=None, fn=None, case_sensitive=False) -> "WContainer":
        ids = query.find_ids(
            self.arena, self.nid, name, p, fn, case_sensitive, self._wrap
        )
        return WContainer(self.arena, ids)

    def match(self, *args) -> List["Node"]:
        ids = query.match_ids(self.arena, self.nid, list(args), self._wrap)
        return [Node(self.arena, i) for i in ids]

    def match_paths(self, *args) -> List["Node"]:
        ids = query.match_paths_ids(self.arena, self.nid, list(args), self._wrap)
        return [Node(self.arena, i) for i in ids]

    # -- serialization -------------------------------------------------------

    def to_string(self) -> str:
        return serialize.to_string(self.arena, self.nid)

    def tag_to_str(self) -> str:
        return serialize.tag_to_str(self.arena, self.nid)

    def content_str(self, escape: bool = False) -> str:
        return serialize.content_str(self.arena, self.nid, escape=escape)

    def content_without_tags(self) -> str:
        return serialize.content_without_tags(self.arena, self.nid)

    def prettify(self, depth: int = 0, dont_format: bool = False) -> str:
        return serialize.prettify(self.arena, self.nid, depth, dont_format)

    # -- mutations -------------------------------------------------------------

    def _is_same(self, ch: int, item) -> bool:
        """The reference matches Tag/Comment children with ``is`` and — in
        ``remove`` — strings too (tag.py:100-102): a fresh equal literal does
        NOT match a parsed text node unless CPython interned them.  Our
        ``.content`` hands out the arena's str objects, so ``is`` works."""
        a = self.arena
        if isinstance(item, (Node, CommentNode)):
            return ch == item.nid
        if isinstance(item, str) and a.kind[ch] == TEXT:
            return a.text[ch] is item
        return False

    def remove_item(self, item) -> None:
        """tag.py:110-125 — str removed by VALUE (list.remove → first match,
        ValueError if absent); Tag/Comment filtered by identity."""
        a = self.arena
        kids = a.children[self.nid]
        if isinstance(item, str):
            for i, ch in enumerate(kids):
                if a.kind[ch] == TEXT and a.text[ch] == item:
                    del kids[i]
                    return
            raise ValueError("list.remove(x): x not in list")
        if isinstance(item, (Node, CommentNode)):
            a.children[self.nid] = [ch for ch in kids if ch != item.nid]
            return
        raise ValueError(f"Can't remove `{repr(item)}`")

    def remove(self, item) -> bool:
        """tag.py:90-108 — recursive `is`-identity search, but the actual
        removal DELEGATES to remove_item (tag.py:102), which for strings
        does ``list.remove`` → the FIRST VALUE-equal sibling goes, not
        necessarily the identity match that triggered it (reference
        quirk: remove(second "xy") removes the first "xy")."""
        a = self.arena
        for ch in a.children[self.nid]:
            if self._is_same(ch, item):
                self.remove_item(item)
                return True
            if a.kind[ch] == TAG and Node(a, ch).remove(item):
                return True
        return False

    def replace_with(self, item, keep_content: bool = False) -> None:
        """tag.py:192-220."""
        a = self.arena
        if isinstance(item, str):
            pid = a.parent[self.nid]
            if pid < 0:
                # the reference evaluates self.parent.name BEFORE its
                # `if self.parent` check (tag.py:202-204), so a parentless
                # node raises — mirrored, including the exception type
                raise AttributeError(
                    "'NoneType' object has no attribute 'name'"
                )
            unused_root = (
                a.name[pid] == "" and len(a.children[pid]) == 1
            )
            if pid >= 0 and not unused_root:
                tn = a.new_node(TEXT, text=item, parent=pid)
                kids = a.children[pid]
                for i, ch in enumerate(kids):
                    if ch == self.nid:
                        kids[i] = tn
                        break
            else:
                a.name[self.nid] = ""
                a.attrs[self.nid] = []
                a.non_pair[self.nid] = True
                tn = a.new_node(TEXT, text=item, parent=self.nid)
                a.children[self.nid] = [tn]
        elif isinstance(item, Node):
            oa = item.arena
            a.name[self.nid] = oa.name[item.nid]
            a.attrs[self.nid] = list(oa.attrs[item.nid])
            if not keep_content:
                if oa is a:
                    a.children[self.nid] = list(oa.children[item.nid])
                else:
                    a.children[self.nid] = [
                        _import_subtree(a, oa, ch, self.nid)
                        for ch in oa.children[item.nid]
                    ]
            a.non_pair[self.nid] = oa.non_pair[item.nid]
        else:
            raise TypeError(f"Can't replace `item` with `{item.__class__}`!")

    # -- dunder surface ---------------------------------------------------------

    def __str__(self) -> str:
        return self.to_string()

    def __bytes__(self) -> bytes:
        return self.to_string().encode("utf-8")

    def __repr__(self) -> str:
        return (
            f"Node({self.name!r}, parameters={dict(self.arena.attrs[self.nid])!r}, "
            f"is_non_pair={self.is_non_pair})"
        )

    def __eq__(self, other) -> bool:
        """name + parameters + is_non_pair, subtree ignored (tag.py:497-510)."""
        if not isinstance(other, Node):
            return False
        if self.name != other.name:
            return False
        if not attrs_equal(
            self.arena.attrs[self.nid],
            other.arena.attrs[other.nid],
            self.arena.case_insensitive,
        ):
            return False
        return self.is_non_pair == other.is_non_pair

    def __ne__(self, other):
        return not self.__eq__(other)

    def __hash__(self):
        """tag.py:515-521 — tag_to_str hash XOR-folded over content hashes."""
        h = hash(self.tag_to_str())
        for item in self.content:
            h ^= hash(item)
        return h

    def __bool__(self):
        return bool(self.arena.children[self.nid])

    def __len__(self):
        return len(self.tags)

    def __getitem__(self, item):
        if isinstance(item, str):
            return self.parameters[item]
        return self.tags[item]

    def __setitem__(self, key, value):
        """tag.py:535-554: str → param; slice → insert at tag-index; int →
        replace k-th tag."""
        a = self.arena
        if isinstance(key, str):
            self.parameters[key] = str(value)
            return
        vid = _materialize(a, value, self.nid)
        kids = a.children[self.nid]
        if isinstance(key, slice):
            if key.start == -1:
                kids.append(vid)
            elif key.start == 0:
                kids.insert(0, vid)
            else:
                t = self.tags[key.start]
                kids.insert(self._content_index_eq(t), vid)
        else:
            t = self.tags[key]
            kids[self._content_index_eq(t)] = vid
        if a.kind[vid] == TAG:
            a.parent[vid] = self.nid

    def _content_index_eq(self, t: "Node") -> int:
        """``content.index(item)`` in the reference (tag.py:546-553)
        compares with ``==``, and Tag equality is STRUCTURAL (name +
        params + is_non_pair, content ignored) — so the FIRST equal
        sibling's position wins, not the k-th tag's own position:
        ``dom[1] = Tag('b')`` on two equal <a> siblings replaces the
        FIRST one."""
        a = self.arena
        for i, ch in enumerate(a.children[self.nid]):
            if a.kind[ch] == TAG and a.tag_equal(ch, t.nid):
                return i
        raise ValueError(f"{t!r} is not in list")

    def __contains__(self, item):
        """tag.py:556-560: str → param key (case-insens); else membership in
        content via == (structural Tag equality, NOT identity)."""
        if isinstance(item, str):
            return item in self.parameters
        a = self.arena
        for ch in a.children[self.nid]:
            if isinstance(item, Node) and a.kind[ch] == TAG:
                if a is item.arena and a.tag_equal(ch, item.nid):
                    return True
                if a is not item.arena and Node(a, ch) == item:
                    return True
            elif isinstance(item, CommentNode) and a.kind[ch] == COMMENT:
                if a.text[ch] == item.content:
                    return True
        return False

    def __delitem__(self, key):
        if isinstance(key, str):
            del self.parameters[key]
        else:
            self.remove_item(self.tags[key])

    def __iter__(self):
        return iter(self.tags)

    def __copy__(self):
        """Shallow: shares the arena + children list (tag.py:571-576)."""
        a = self.arena
        nid = a.new_node(
            TAG,
            a.name[self.nid],
            list(a.attrs[self.nid]),
            non_pair=a.non_pair[self.nid],
            parent=a.parent[self.nid],
        )
        a.children[nid] = a.children[self.nid]  # shared, like the reference
        return Node(a, nid)

    def __deepcopy__(self, memodict=None):
        a = self.arena
        nid = _import_subtree(a, a, self.nid, -1)
        return Node(a, nid)


def _materialize(a: Arena, value, parent: int) -> int:
    """Turn a str / Node / CommentNode into a node id in arena ``a``."""
    if isinstance(value, str):
        return a.new_node(TEXT, text=value, parent=parent)
    if isinstance(value, CommentNode):
        if value.arena is a:
            return value.nid
        return a.new_node(COMMENT, text=value.content, parent=parent)
    if isinstance(value, Node):
        if value.arena is a:
            return value.nid
        return _import_subtree(a, value.arena, value.nid, parent)
    raise TypeError(f"Can't insert `{value.__class__}`")


def _import_subtree(dst: Arena, src: Arena, nid: int, parent: int) -> int:
    """Deep-copy a subtree (possibly across arenas), iteratively."""
    root_new = dst.new_node(
        src.kind[nid],
        src.name[nid],
        list(src.attrs[nid]),
        src.text[nid],
        src.non_pair[nid],
        parent,
        src.src_start[nid],
        src.src_end[nid],
    )
    stack = [(nid, root_new)]
    while stack:
        old, new = stack.pop()
        for ch in src.children[old]:
            cid = dst.new_node(
                src.kind[ch],
                src.name[ch],
                list(src.attrs[ch]),
                src.text[ch],
                src.non_pair[ch],
                new,
                src.src_start[ch],
                src.src_end[ch],
            )
            dst.children[new].append(cid)
            stack.append((ch, cid))
    return root_new


class WContainer:
    """The chainable result of ``wfind`` — models the reference's empty-name
    container with ``_wfind_only_on_content`` (tag.py:222-238).

    The reference container IS a full blank-named Tag, so every Tag
    method chains off it — ``dom.wfind('p').find('a')``,
    ``.content_str()``, ``.match(...)`` all work.  WContainer implements
    the wfind-specific chain steps natively and DELEGATES the rest of
    the Tag surface to a lazily-materialized blank container node whose
    children are the matches (one extra arena node per delegating
    container; the matches keep their original parents, as in the
    reference)."""

    __slots__ = ("arena", "ids", "_cid")

    def __init__(self, arena: Arena, ids: List[int]):
        self.arena = arena
        self.ids = ids
        self._cid = None

    def _as_node(self) -> Node:
        if self._cid is None:
            a = self.arena
            cid = a.new_node(TAG, "", [], parent=-1)
            a.children[cid] = list(self.ids)
            self._cid = cid
        return Node(self.arena, self._cid)

    def __getattr__(self, attr):
        # only fires for attributes WContainer itself doesn't define
        if attr.startswith("__"):
            raise AttributeError(attr)
        return getattr(self._as_node(), attr)

    @property
    def content(self) -> List[Node]:
        return [Node(self.arena, i) for i in self.ids]

    c = content

    @property
    def tags(self) -> List[Node]:
        return self.content

    def wfind(self, name, p=None, fn=None, case_sensitive=False) -> "WContainer":
        wrap = lambda nid: Node(self.arena, nid)
        ids = query.wfind_step(
            self.arena, self.ids, name, p, fn, case_sensitive, wrap
        )
        return WContainer(self.arena, ids)

    def match_paths(self, *args) -> List[Node]:
        frontier = self.ids
        wrap = lambda nid: Node(self.arena, nid)
        for step in args:
            name, p, fn, cs = query._normalize_step(step)
            frontier = query.wfind_step(self.arena, frontier, name, p, fn, cs, wrap)
        return [Node(self.arena, i) for i in frontier]

    def __bool__(self):
        return bool(self.ids)

    def __len__(self):
        return len(self.ids)

    def __repr__(self):
        return f"WContainer({self.content!r})"
