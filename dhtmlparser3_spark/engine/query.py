"""Selector semantics over the Arena (SURVEY.md §2.4, Q1-Q10).

Arena-level (node-id in, node-ids out) implementations of the reference's
find/findb/wfind/match/match_paths:

* ``find``   — depth-first pre-order, INCLUDES self (tag.py:315-326,355-364),
* ``findb``  — the reference's breadth-ish order (tag.py:328-339,366-381),
* name match is case-insensitive by default with ``""`` as wildcard
  (tag.py:383-400),
* param subset: key lookup case-insensitive (SpecialDict), value comparison
  EXACT (tag.py:402-420),
* ``wfind`` — first step = plain find; later steps match only *direct
  children* of the previous matches (tag.py:222-238),
* ``match`` — descendant-at-each-step chained find (tag.py:240-273),
* ``match_paths`` — strict chained wfind (tag.py:283-313).

``fn`` predicates receive whatever the caller's ``wrap`` produces (the
user-facing API passes a Node wrapper so reference-style lambdas work
unchanged; the Spark relational tier never uses ``fn`` — arbitrary Python
predicates live in the UDF tier only).
"""

from __future__ import annotations

from typing import Callable, List, Optional

from dhtmlparser3_spark.engine.dom import Arena, attrs_get
from dhtmlparser3_spark.engine.lexer import TAG


def contains_params_subset(a: Arena, nid: int, subset) -> bool:
    """tag.py:402-420 — all (k, v) present; value compare exact."""
    items = subset.items() if hasattr(subset, "items") else subset
    attrs = a.attrs[nid]
    sentinel = object()
    for key, val in items:
        if not attrs:
            return False
        mine = attrs_get(attrs, key, a.case_insensitive, sentinel)
        if mine is sentinel:
            return False
        if val != mine:
            return False
    return True


def is_almost_equal(
    a: Arena,
    nid: int,
    name: str,
    p=None,
    fn: Optional[Callable] = None,
    case_sensitive: bool = False,
    wrap: Optional[Callable[[int], object]] = None,
) -> bool:
    """tag.py:383-400."""
    if a.kind[nid] != TAG:
        return False
    tag_name = a.name[nid]
    if not case_sensitive:
        tag_name = tag_name.lower()
        name = name.lower()
    if name and tag_name != name:
        return False
    if p is not None and not contains_params_subset(a, nid, p):
        return False
    if fn is not None and not fn(wrap(nid) if wrap else nid):
        return False
    return True


def find_ids(
    a: Arena,
    root: int,
    name: str,
    p=None,
    fn=None,
    case_sensitive: bool = False,
    wrap=None,
) -> List[int]:
    return [
        nid
        for nid in a.iter_pre_order(root, tags_only=True)
        if is_almost_equal(a, nid, name, p, fn, case_sensitive, wrap)
    ]


def findb_ids(
    a: Arena,
    root: int,
    name: str,
    p=None,
    fn=None,
    case_sensitive: bool = False,
    wrap=None,
) -> List[int]:
    return [
        nid
        for nid in a.iter_breadth_first(root, tags_only=True)
        if is_almost_equal(a, nid, name, p, fn, case_sensitive, wrap)
    ]


def wfind_step(
    a: Arena,
    frontier: List[int],
    name: str,
    p=None,
    fn=None,
    case_sensitive: bool = False,
    wrap=None,
) -> List[int]:
    """One chained-wfind step: match only the direct children of the previous
    matches (tag.py:231-238)."""
    out: List[int] = []
    for item in frontier:
        for ch in a.children[item]:
            if a.kind[ch] == TAG and is_almost_equal(
                a, ch, name, p, fn, case_sensitive, wrap
            ):
                out.append(ch)
    return out


def match_ids(a: Arena, root: int, steps, wrap=None) -> List[int]:
    """Chained descendant find (tag.py:240-273).  Each step is a find-arg
    spec: str | (args tuple/list) | dict(kwargs)."""
    steps = list(steps)
    matched = _call_find(a, root, steps.pop(0), wrap)
    while steps:
        step = steps.pop(0)
        nxt: List[int] = []
        for nid in matched:
            nxt.extend(_call_find(a, nid, step, wrap))
        matched = nxt
    return matched


def match_paths_ids(a: Arena, root: int, steps, wrap=None) -> List[int]:
    """Strict path matching via chained wfind (tag.py:283-313): the first
    step searches the whole subtree, later steps one level at a time."""
    steps = list(steps)
    first = True
    frontier = [root]
    for step in steps:
        name, p, fn, cs = _normalize_step(step)
        if first:
            frontier = find_ids(a, root, name, p, fn, cs, wrap)
            first = False
        else:
            frontier = wfind_step(a, frontier, name, p, fn, cs, wrap)
    return frontier


def _normalize_step(step):
    if isinstance(step, dict):
        return (
            step.get("name", ""),
            step.get("p"),
            step.get("fn"),
            step.get("case_sensitive", False),
        )
    if isinstance(step, (list, tuple)):
        args = list(step)
        name = args.pop(0) if args else ""
        p = args.pop(0) if args else None
        fn = args.pop(0) if args else None
        cs = args.pop(0) if args else False
        return name, p, fn, cs
    return step, None, None, False


def _call_find(a: Arena, root: int, step, wrap) -> List[int]:
    name, p, fn, cs = _normalize_step(step)
    return find_ids(a, root, name, p, fn, cs, wrap)
