"""Crawl frontier composition (pipeline/frontier.py): discovery →
canonical dedup → robots compliance → crawled anti-join."""

from __future__ import annotations

from dhtmlparser3_spark.pipeline.frontier import crawl_frontier

SITEMAP_A = """<urlset>
 <url><loc>http://a.example/new1</loc><lastmod>2024-01-01</lastmod></url>
 <url><loc>HTTP://A.Example:80/new1?utm_source=x</loc></url>
 <url><loc>http://a.example/old</loc></url>
 <url><loc>http://a.example/private/x</loc><priority>0.9</priority></url>
</urlset>"""

SITEMAP_B = """<urlset>
 <url><loc>http://b.example/only</loc></url>
 <url><loc>http://a.example/new1</loc></url>
</urlset>"""

ROBOTS = [
    ("http://a.example/robots.txt", b"User-agent: *\nDisallow: /private/\n"),
]


def _frontier(spark, **kw):
    maps = spark.createDataFrame(
        [
            ("http://a.example/sitemap.xml", SITEMAP_A.encode()),
            ("http://b.example/sitemap.xml", SITEMAP_B.encode()),
        ],
        "url string, body binary",
    )
    return crawl_frontier(maps, **kw)


def test_frontier_dedup_is_canonical_and_deterministic(spark):
    rows = {r.canonical_url: r for r in _frontier(spark).collect()}
    # three spellings of new1 (case, port, utm) collapse to one row
    assert set(rows) == {
        "http://a.example/new1",
        "http://a.example/old",
        "http://a.example/private/x",
        "http://b.example/only",
    }
    keep = rows["http://a.example/new1"]
    # lexically-first spelling/source wins: 'HTTP://...' < 'http://...'
    assert keep.url == "HTTP://A.Example:80/new1?utm_source=x"
    assert keep.src_url == "http://a.example/sitemap.xml"
    assert rows["http://a.example/private/x"].priority == "0.9"
    assert rows["http://a.example/old"].lastmod is None


def test_frontier_robots_and_crawled(spark):
    robots = spark.createDataFrame(ROBOTS, "url string, body binary")
    crawled = spark.createDataFrame(
        [("http://a.example/old?utm_source=x",)], "url string"
    )  # crawled under a DIFFERENT spelling — canonical anti-join catches it
    got = {
        r.canonical_url
        for r in _frontier(
            spark, robots_captures=robots, crawled=crawled
        ).collect()
    }
    assert got == {"http://a.example/new1", "http://b.example/only"}


# --- redirect-chain resolution -----------------------------------------------


def _py_resolve(edges: dict, src: str, max_hops: int):
    """Reference walker: follow edges from src up to max_hops."""
    cur, hops = edges[src], 1
    while cur in edges and hops < max_hops:
        cur = edges[cur]
        hops += 1
    if cur in edges:
        return (None, max_hops, True)
    return (cur, hops, False)


def test_resolve_redirect_chains_differential(spark):
    """Pointer-jumping resolver matches a per-src python walk on a mixed
    graph: straight chains, converging chains, a 2-cycle, a 3-cycle, and
    an over-max_hops chain."""
    from dhtmlparser3_spark.functions.links import resolve_redirect_chains

    E = {}
    # straight chain a0→a1→...→a5 (5 hops from a0)
    for i in range(5):
        E[f"http://x/a{i}"] = f"http://x/a{i+1}"
    # converging: b and c both → d → a3 (joins the chain midway)
    E["http://x/b"] = "http://x/d"
    E["http://x/c"] = "http://x/d"
    E["http://x/d"] = "http://x/a3"
    # 2-cycle
    E["http://x/p"] = "http://x/q"
    E["http://x/q"] = "http://x/p"
    # 3-cycle
    E["http://x/r"] = "http://x/s"
    E["http://x/s"] = "http://x/t"
    E["http://x/t"] = "http://x/r"
    # long chain into the cycle (never terminates)
    E["http://x/u"] = "http://x/p"
    # chain longer than max_hops=4: a0 (5 hops) → cycle verdict at 4
    edges = spark.createDataFrame(
        list(E.items()), "src string, dst string"
    )
    for max_hops in (4, 16):
        got = {
            r.src: (r.final_url, r.hops, r.cycle)
            for r in resolve_redirect_chains(edges, max_hops).collect()
        }
        want = {s: _py_resolve(E, s, max_hops) for s in E}
        # hops for cycle rows are capped, not meaningful — compare them
        # only on terminated rows
        for s in E:
            gf, gh, gc = got[s]
            wf, wh, wc = want[s]
            assert (gf, gc) == (wf, wc), (max_hops, s, got[s], want[s])
            if not wc:
                assert gh == wh, (max_hops, s, got[s], want[s])


def test_redirect_edges_from_captures(spark, tmp_path):
    from dhtmlparser3_spark.functions.links import (
        redirect_edges,
        resolve_redirect_chains,
    )
    from dhtmlparser3_spark.sources.warc import (
        build_warc_record,
        read_warc,
        write_warc_gz,
    )

    recs = [
        build_warc_record(
            "http://h.example/old", "2024-01-01T00:00:00Z", b"",
            status=301, reason="Moved", location="/mid",
        ),
        build_warc_record(
            "http://h.example/mid", "2024-01-01T00:00:01Z", b"",
            status=302, reason="Found", location="/new",
        ),
        # self-redirect: must NOT become an edge (or a 1-cycle)
        build_warc_record(
            "http://h.example/self", "2024-01-01T00:00:02Z", b"",
            status=301, reason="Moved", location="http://h.example/self",
        ),
        # duplicate capture of /old with a different target: lexically
        # smallest dst wins deterministically
        build_warc_record(
            "http://h.example/old", "2024-01-01T00:00:03Z", b"",
            status=301, reason="Moved", location="/aaa",
        ),
        # 200 capture: not an edge
        build_warc_record(
            "http://h.example/page", "2024-01-01T00:00:04Z", b"<p>x</p>",
        ),
    ]
    path = str(tmp_path / "chain.warc.gz")
    write_warc_gz([], path, extra_members=recs)
    captures = read_warc(spark, path)

    edges = {(r.src, r.dst) for r in redirect_edges(captures).collect()}
    assert edges == {
        ("http://h.example/old", "http://h.example/aaa"),
        ("http://h.example/mid", "http://h.example/new"),
    }
    resolved = {
        r.src: (r.final_url, r.hops, r.cycle)
        for r in resolve_redirect_chains(
            redirect_edges(captures)
        ).collect()
    }
    assert resolved == {
        "http://h.example/old": ("http://h.example/aaa", 1, False),
        "http://h.example/mid": ("http://h.example/new", 1, False),
    }


def test_resolve_redirect_chains_random_graphs(spark):
    """Seeded random functional graphs (each src → one dst drawn from a
    shared url pool, so chains, convergences, and cycles all arise)
    replayed against the python walker."""
    import random

    from dhtmlparser3_spark.functions.links import resolve_redirect_chains

    for seed in range(8):
        rng = random.Random(9100 + seed)
        pool = [f"http://g{seed}.example/n{i}" for i in range(40)]
        srcs = rng.sample(pool, 25)
        E = {s: rng.choice([u for u in pool if u != s]) for s in srcs}
        edges = spark.createDataFrame(
            list(E.items()), "src string, dst string"
        )
        max_hops = rng.choice([4, 8, 16])
        got = {
            r.src: (r.final_url, r.hops, r.cycle)
            for r in resolve_redirect_chains(edges, max_hops).collect()
        }
        assert set(got) == set(E)
        for s in E:
            wf, wh, wc = _py_resolve(E, s, max_hops)
            gf, gh, gc = got[s]
            assert (gf, gc) == (wf, wc), (seed, s, got[s], (wf, wh, wc))
            if not wc:
                assert gh == wh, (seed, s, got[s], (wf, wh, wc))
