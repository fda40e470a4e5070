"""Differential tests for find/findb/wfind/match/match_paths + mutations,
ported from the reference's test_tag.py strategy (SURVEY.md §5)."""

from __future__ import annotations

import copy

import pytest

from dhtmlparser3_spark.engine import api
from tests.corpus import SNIPPETS

NESTED = (
    '<div id="first">\n  First div.\n  <div id="first.subdiv">\n'
    "    Subdiv in first div.\n  </div>\n</div>\n"
    '<div id="second">\n  Second.\n</div>'
)
WTREE = (
    "<root><some><something><xe id='wanted' /></something>"
    "<something><xe id='notwanted' /></something>"
    "<xe id='second' /></some><some><xe id='third' /></some></root>"
)
PATHDOC = (
    '<html><body><article><div class="page-body"><p>text</p>'
    '<div class="page-body"><p>deep</p></div></div></article></body></html>'
)


def sigs(nodes):
    return [n.to_string() for n in nodes]


def both(ref, s):
    return ref.parse(s), api.parse(s)


FIND_CASES = [
    ("div", None, False),
    ("", None, False),
    ("div", {"id": "first"}, False),
    ("DIV", None, False),
    ("DIV", None, True),
    ("xe", {"id": "wanted"}, False),
    ("something", None, False),
    ("p", None, False),
    ("nonexistent", None, False),
]


@pytest.mark.parametrize("doc", [NESTED, WTREE, PATHDOC])
@pytest.mark.parametrize("name,p,cs", FIND_CASES)
def test_find_findb(ref, doc, name, p, cs):
    r, o = both(ref, doc)
    assert sigs(o.find(name, p, case_sensitive=cs)) == sigs(
        r.find(name, p, case_sensitive=cs)
    )
    assert sigs(o.findb(name, p, case_sensitive=cs)) == sigs(
        r.findb(name, p, case_sensitive=cs)
    )


def test_find_on_all_snippets(ref):
    for s in SNIPPETS:
        try:
            r = ref.parse(s)
        except Exception:  # noqa: BLE001
            continue
        o = api.parse(s)
        assert sigs(o.find("")) == sigs(r.find("")), s
        assert sigs(o.findb("")) == sigs(r.findb("")), s


def test_find_fn_predicate(ref):
    r, o = both(ref, NESTED)
    rres = r.find("", fn=lambda t: "id" in t.parameters)
    ores = o.find("", fn=lambda t: "id" in t.parameters)
    assert sigs(ores) == sigs(rres)
    rres = r.find("div", fn=lambda t: t.parameters.get("id", "").startswith("f"))
    ores = o.find("div", fn=lambda t: t.parameters.get("id", "").startswith("f"))
    assert sigs(ores) == sigs(rres)


def test_wfind_chain(ref):
    r, o = both(ref, WTREE)
    rres = r.wfind("some").wfind("something").wfind("xe")
    ores = o.wfind("some").wfind("something").wfind("xe")
    assert sigs(ores.content) == sigs(rres.content)
    # missing intermediate level → empty (strict one-level steps)
    rres = r.wfind("some").wfind("xe", {"id": "wanted"})
    ores = o.wfind("some").wfind("xe", {"id": "wanted"})
    assert sigs(ores.content) == sigs(rres.content)


def test_match(ref):
    r, o = both(ref, PATHDOC)
    assert sigs(o.match("body", "div", "p")) == sigs(r.match("body", "div", "p"))
    assert sigs(o.match("article", ["div", {"class": "page-body"}], "p")) == sigs(
        r.match("article", ["div", {"class": "page-body"}], "p")
    )
    assert sigs(o.match("body", {"name": "div", "p": {"class": "page-body"}})) == sigs(
        r.match("body", {"name": "div", "p": {"class": "page-body"}})
    )


def test_match_paths(ref):
    r, o = both(ref, PATHDOC)
    assert sigs(o.match_paths("body", "article")) == sigs(
        r.match_paths("body", "article")
    )
    # fuzzy match finds the <p>, strict path does not (div is wrapped)
    assert sigs(o.match_paths("body", "p")) == sigs(r.match_paths("body", "p"))
    assert sigs(o.match_paths("html", "body", "article", "div", "p")) == sigs(
        r.match_paths("html", "body", "article", "div", "p")
    )


def test_params_case_insensitive_lookup(ref):
    r, o = both(ref, '<html><tag PARAM="true"></html>')
    rt, ot = r.find("tag")[0], o.find("tag")[0]
    assert ot.parameters["param"] == rt.parameters["param"]
    assert ot.parameters["PaRaM"] == rt.parameters["PaRaM"]
    assert ("param" in ot.parameters) == ("param" in rt.parameters)
    assert ot.parameters.get("nope", "d") == rt.parameters.get("nope", "d")


def test_param_reassign_preserves_position(ref):
    """SpecialDict ordering-on-reassign (test_specialdict.py:103-130)."""
    r, o = both(ref, "<t a=1 b=2 c=3>x</t>")
    rt, ot = r.find("t")[0], o.find("t")[0]
    rt.parameters["B"] = "9"
    ot.parameters["B"] = "9"
    assert list(ot.parameters.keys()) == list(rt.parameters.keys())
    assert ot.to_string() == rt.to_string()


def test_accessors_and_dunders(ref):
    r, o = both(ref, NESTED)
    assert len(o) == len(r)
    assert bool(o) == bool(r)
    assert [t.name for t in o] == [t.name for t in r]
    rt, ot = r.find("div")[0], o.find("div")[0]
    assert ot["id"] == rt["id"]
    assert ot[0].to_string() == rt[0].to_string()
    assert ("id" in ot) == ("id" in rt)
    assert str(ot) == str(rt)
    assert bytes(ot) == bytes(rt)
    assert [t.name for t in ot.tags] == [t.name for t in rt.tags]


def test_setitem_param_and_insert(ref):
    for key in ["x", 0]:
        r, o = both(ref, "<div><a>1</a><b>2</b></div>")
        if isinstance(key, str):
            r[key] = 42
            o[key] = 42
        assert o.to_string() == r.to_string()
    # slice inserts: append (-1), prepend (0), before k-th tag
    for start in [-1, 0, 1]:
        r, o = both(ref, "<div><a>1</a><b>2</b></div>")
        import dhtmlparser3

        r[start:] = dhtmlparser3.Tag("new", is_non_pair=True)
        o[start:] = api.parse("<new />")
        assert o.to_string() == r.to_string(), f"slice {start}"
    # int replace
    r, o = both(ref, "<div><a>1</a><b>2</b></div>")
    import dhtmlparser3

    r[1] = dhtmlparser3.Tag("new", is_non_pair=True)
    o[1] = api.parse("<new />")
    assert o.to_string() == r.to_string()


def test_delitem(ref):
    r, o = both(ref, "<div a=1><x>1</x><y>2</y></div>")
    del r["a"]
    del o["a"]
    assert o.to_string() == r.to_string()
    del r[0]
    del o[0]
    assert o.to_string() == r.to_string()


def test_remove_and_remove_item(ref):
    r, o = both(ref, "<div><x>1</x><y>2</y><x>3</x></div>")
    assert o.remove(o.find("y")[0]) == r.remove(r.find("y")[0])
    assert o.to_string() == r.to_string()
    r.remove_item(r.tags[0])
    o.remove_item(o.tags[0])
    assert o.to_string() == r.to_string()
    # string removal by value
    r, o = both(ref, "<div>abc<x>1</x>abc</div>")
    r.remove("abc")
    o.remove("abc")
    assert o.to_string() == r.to_string()


def test_replace_with(ref):
    import dhtmlparser3

    r, o = both(ref, "<div><x a=1>inner</x><y>2</y></div>")
    r.find("x")[0].replace_with(dhtmlparser3.parse("<z b=2>new</z>"))
    o.find("x")[0].replace_with(api.parse("<z b=2>new</z>"))
    assert o.to_string() == r.to_string()
    r, o = both(ref, "<div><x a=1>inner</x><y>2</y></div>")
    r.find("x")[0].replace_with(dhtmlparser3.parse("<z>n</z>"), keep_content=True)
    o.find("x")[0].replace_with(api.parse("<z>n</z>"), keep_content=True)
    assert o.to_string() == r.to_string()
    # replace with a string substitutes the parent slot
    r, o = both(ref, "<div><x>inner</x><y>2</y></div>")
    r.find("x")[0].replace_with("TEXT")
    o.find("x")[0].replace_with("TEXT")
    assert o.to_string() == r.to_string()


def test_copy_deepcopy(ref):
    r, o = both(ref, "<div a=1><x>1</x></div>")
    rc, oc = copy.copy(r), copy.copy(o)
    assert oc.to_string() == rc.to_string()
    rd, od = copy.deepcopy(r), copy.deepcopy(o)
    assert od.to_string() == rd.to_string()
    # deep copy is independent
    rd.find("x")[0].replace_with("gone")
    od.find("x")[0].replace_with("gone")
    assert od.to_string() == rd.to_string()
    assert o.to_string() == r.to_string()


def test_eq_hash_semantics(ref):
    r, o = both(ref, "<div a=1>x</div>")
    r2, o2 = both(ref, "<div A=1>y</div>")
    assert (o == o2) == (r == r2)  # name+params+non_pair only, subtree ignored
    r3, o3 = both(ref, "<div a=2>x</div>")
    assert (o == o3) == (r == r3)


def test_match_arg_forms_and_misc_parity():
    """match dict/{name,p}/list(*args) forms, cip=False key access, comment
    prettify, wfind-miss falsiness, and crash parity on the bare-list path
    (reference raises AttributeError: str has no .items — so must we)."""
    import sys

    sys.path.insert(0, "/root/reference/src")
    import dhtmlparser3 as ref

    from dhtmlparser3_spark.engine import api as ours

    d_r = ref.parse('<a><b id="x">t</b></a>')
    d_o = ours.parse('<a><b id="x">t</b></a>')
    r = d_r.match("a", {"name": "b", "p": {"id": "x"}})
    o = d_o.match("a", {"name": "b", "p": {"id": "x"}})
    assert [str(x) for x in r] == [str(x) for x in o] and len(r) == 1
    assert [str(x) for x in d_r.match("a", "b")] == [
        str(x) for x in d_o.match("a", "b")
    ]
    assert [str(x) for x in d_r.match(["b", {"id": "x"}])] == [
        str(x) for x in d_o.match(["b", {"id": "x"}])
    ]
    r2 = ref.parse('<a ID="q">x</a>', case_insensitive_parameters=False)
    o2 = ours.parse('<a ID="q">x</a>', case_insensitive_parameters=False)
    assert ("id" in r2) == ("id" in o2) and ("ID" in r2) == ("ID" in o2)
    assert (
        ref.parse("<a><!-- hi --></a>").prettify()
        == ours.parse("<a><!-- hi --></a>").prettify()
    )
    assert bool(ref.parse("<x><y>1</y></x>").wfind("x").wfind("z")) == bool(
        ours.parse("<x><y>1</y></x>").wfind("x").wfind("z")
    )

    def crashes(f):
        try:
            f()
            return False
        except Exception:
            return True

    assert crashes(lambda: d_r.match(["a", "b"])) == crashes(
        lambda: d_o.match(["a", "b"])
    )
