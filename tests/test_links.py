"""Link extraction edge cases + PageRank recurrence sanity."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from dhtmlparser3_spark.functions.links import host_edges, outlinks, pagerank


def _pages(spark, htmls):
    rows = [(f"https://h{i}.example/{i}.html", h.encode()) for i, h in enumerate(htmls)]
    return spark.createDataFrame(rows, "url string, html binary")


@pytest.mark.spark
def test_outlinks_edge_cases(spark):
    corpus = [
        # no-href anchor dropped; ci HREF key found; unquoted value
        '<a name="x">skip</a><a HREF=/rel>r</a>',
        # direct mode: DIRECT text children only, document order;
        # subtree mode: every text node in the <a> interval
        '<a href="https://t.example/">pre<b>bold</b>post</a>',
        "<p>no links</p>",
        # fully-nested anchor text: direct gathers '', subtree gathers it
        '<a href="https://n.example/"><b><i>deep</i></b></a>',
    ]
    out = outlinks(_pages(spark, corpus)).collect()
    got = sorted((r.url, r.href, r.anchor) for r in out)
    assert got == [
        ("https://h0.example/0.html", "/rel", "r"),
        ("https://h1.example/1.html", "https://t.example/", "prepost"),
        ("https://h3.example/3.html", "https://n.example/", ""),
    ]
    sub = outlinks(_pages(spark, corpus), anchor_mode="subtree").collect()
    got_sub = sorted((r.url, r.href, r.anchor) for r in sub)
    assert got_sub == [
        ("https://h0.example/0.html", "/rel", "r"),
        ("https://h1.example/1.html", "https://t.example/", "preboldpost"),
        ("https://h3.example/3.html", "https://n.example/", "deep"),
    ]
    both = outlinks(_pages(spark, corpus), anchor_mode="both").collect()
    assert sorted(
        (r.url, r.href, r.anchor) for r in both if r.mode == "direct"
    ) == got
    assert sorted(
        (r.url, r.href, r.anchor) for r in both if r.mode == "subtree"
    ) == got_sub


@pytest.mark.spark
def test_pagerank_sink_accumulates(spark):
    # two sources pointing at one sink: sink ends above the uniform base,
    # sources at the dangling floor; total mass stays bounded by PR_SCALE
    edges = spark.createDataFrame(
        [("a", "c", 1), ("b", "c", 1)], "src string, dst string, n_links long"
    )
    r = {row.host: row.rank for row in pagerank(edges, iters=3).collect()}
    assert set(r) == {"a", "b", "c"}
    assert r["a"] == r["b"] < r["c"]
    assert sum(r.values()) <= 10**12


@pytest.mark.spark
def test_pagerank_distributed_nodes_path(spark, monkeypatch):
    """Above _LOCAL_NODES_MAX the node set stays a distributed DataFrame
    (no driver collect of every host string); ranks must be bit-identical
    to the local-relation path."""
    import dhtmlparser3_spark.functions.links as links_mod

    edges = spark.createDataFrame(
        [("a", "c", 1), ("b", "c", 1), ("c", "a", 2)],
        "src string, dst string, n_links long",
    )
    local = {r.host: r.rank for r in pagerank(edges, iters=4).collect()}
    monkeypatch.setattr(links_mod, "_LOCAL_NODES_MAX", 0)
    dist = {r.host: r.rank for r in pagerank(edges, iters=4).collect()}
    assert dist == local


@pytest.mark.spark
def test_host_edges_multiplicity(spark):
    links = spark.createDataFrame(
        [
            ("https://s.example/p1", "https://d.example/x"),
            ("https://s.example/p2", "https://d.example/y"),
        ],
        "url string, href string",
    )
    rows = host_edges(links).collect()
    assert [(r.src, r.dst, r.n_links) for r in rows] == [
        ("s.example", "d.example", 2)
    ]
