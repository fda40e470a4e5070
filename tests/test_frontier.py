"""Crawl frontier composition (pipeline/frontier.py): discovery →
canonical dedup → robots compliance → crawled anti-join."""

from __future__ import annotations

from pyspark.sql import functions as F

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


# --- polite fetch scheduling --------------------------------------------------


def test_fetch_schedule_per_host_politeness(spark):
    """Slots within a host are spaced by its crawl-delay (default where
    robots is silent), ordered priority-desc then url; hosts do not
    interleave slots."""
    from dhtmlparser3_spark.functions.robots import robots_delays
    from dhtmlparser3_spark.pipeline.frontier import fetch_schedule

    frontier = spark.createDataFrame(
        [
            # host a: three urls, one with priority
            ("http://a.example/p1", None),
            ("http://a.example/p2", "0.9"),
            ("http://a.example/p3", None),
            # host b: two urls, no robots entry → default delay
            ("http://b.example/x", None),
            ("http://b.example/y", None),
        ],
        "url string, priority string",
    ).withColumn("canonical_url", F.col("url")) \
     .withColumn("src_url", F.lit("s")) \
     .withColumn("lastmod", F.lit(None).cast("string"))
    robots = spark.createDataFrame(
        [("http://a.example/robots.txt", b"User-agent: *\nCrawl-delay: 10\n")],
        "url string, body binary",
    )
    sched = {
        r.url: r
        for r in fetch_schedule(
            frontier,
            robots_delays(robots),
            default_delay=2.0,
            start_ts="2024-01-01 00:00:00",
            broadcast_delays=True,
        ).collect()
    }
    # priority 0.9 wins slot 0; then lexical url order
    assert sched["http://a.example/p2"].slot == 0
    assert sched["http://a.example/p1"].slot == 1
    assert sched["http://a.example/p3"].slot == 2
    # 10s spacing on host a
    t = {u: sched[u].fetch_ts for u in sched}
    assert (
        t["http://a.example/p1"] - t["http://a.example/p2"]
    ).total_seconds() == 10.0
    assert (
        t["http://a.example/p3"] - t["http://a.example/p1"]
    ).total_seconds() == 10.0
    # default 2s spacing on host b, starting at start_ts
    assert sched["http://b.example/x"].slot == 0
    assert str(t["http://b.example/x"]) == "2024-01-01 00:00:00"
    assert (
        t["http://b.example/y"] - t["http://b.example/x"]
    ).total_seconds() == 2.0


def test_fetch_schedule_composes_with_frontier(spark, tmp_path):
    """End-to-end: sitemap + robots captures → frontier → schedule; the
    disallowed url never reaches the plan, the crawl-delay paces what
    does."""
    from dhtmlparser3_spark.functions.robots import robots_delays
    from dhtmlparser3_spark.pipeline.frontier import (
        crawl_frontier,
        fetch_schedule,
    )

    maps = spark.createDataFrame(
        [(
            "http://a.example/sitemap.xml",
            b"<urlset>"
            b"<url><loc>http://a.example/one</loc></url>"
            b"<url><loc>http://a.example/two</loc>"
            b"<priority>1.0</priority></url>"
            b"<url><loc>http://a.example/private/x</loc></url>"
            b"</urlset>",
        )],
        "url string, body binary",
    )
    robots = spark.createDataFrame(
        [(
            "http://a.example/robots.txt",
            b"User-agent: *\nDisallow: /private/\nCrawl-delay: 5\n",
        )],
        "url string, body binary",
    )
    plan = fetch_schedule(
        crawl_frontier(maps, robots_captures=robots),
        robots_delays(robots),
    ).collect()
    by_url = {r.url: r for r in plan}
    assert set(by_url) == {"http://a.example/one", "http://a.example/two"}
    assert by_url["http://a.example/two"].slot == 0  # priority 1.0 first
    assert (
        by_url["http://a.example/one"].fetch_ts
        - by_url["http://a.example/two"].fetch_ts
    ).total_seconds() == 5.0


# --- re-crawl (freshness) candidates ------------------------------------------


def test_recrawl_candidates(spark):
    """Stale = advertised lastmod strictly newer than the stored capture,
    matched on the canonical key; no lastmod / unparseable / older →
    absent; newest advertisement wins."""
    import datetime as dt

    from dhtmlparser3_spark.pipeline.frontier import recrawl_candidates

    crawled = spark.createDataFrame(
        [
            # stored under a tracking-param spelling; advertised clean
            ("http://a.example/stale?utm_source=x",
             dt.datetime(2024, 1, 1, 0, 0, 0)),
            ("http://a.example/fresh", dt.datetime(2024, 6, 1, 0, 0, 0)),
            ("http://a.example/nolastmod", dt.datetime(2024, 1, 1)),
            ("http://a.example/badlastmod", dt.datetime(2024, 1, 1)),
            ("http://a.example/notadvertised", dt.datetime(2024, 1, 1)),
        ],
        "url string, warc_ts timestamp",
    )
    maps = spark.createDataFrame(
        [
            (
                "http://a.example/sitemap.xml",
                b"<urlset>"
                b"<url><loc>http://a.example/stale</loc>"
                b"<lastmod>2024-03-05</lastmod></url>"
                b"<url><loc>http://a.example/fresh</loc>"
                b"<lastmod>2024-02-01</lastmod></url>"
                b"<url><loc>http://a.example/nolastmod</loc></url>"
                b"<url><loc>http://a.example/badlastmod</loc>"
                b"<lastmod>whenever</lastmod></url>"
                b"</urlset>",
            ),
            # second sitemap advertises /stale OLDER — the newest
            # advertisement (2024-03-05) must win
            (
                "http://a.example/sitemap2.xml",
                b"<urlset>"
                b"<url><loc>http://a.example/stale</loc>"
                b"<lastmod>2024-01-02</lastmod></url>"
                b"</urlset>",
            ),
        ],
        "url string, body binary",
    )
    got = {
        r.url: r
        for r in recrawl_candidates(
            crawled, maps, broadcast_advertised=True
        ).collect()
    }
    # only the stale page appears, under its STORED spelling
    assert set(got) == {"http://a.example/stale?utm_source=x"}
    r = got["http://a.example/stale?utm_source=x"]
    assert str(r.lastmod_ts) == "2024-03-05 00:00:00"
    assert r.src_url == "http://a.example/sitemap.xml"
    assert r.canonical_url == "http://a.example/stale"


# --- sitemap index recursion --------------------------------------------------


def test_sitemap_fetch_targets(spark):
    """Child sitemaps from index files become the next fetch round:
    canonical-deduped across spellings/sources, already-fetched children
    anti-joined out, plain urlset files contribute nothing."""
    from dhtmlparser3_spark.pipeline.frontier import sitemap_fetch_targets

    maps = spark.createDataFrame(
        [
            (
                "http://a.example/sitemap_index.xml",
                b"<sitemapindex>"
                b"<sitemap><loc>http://a.example/s1.xml</loc></sitemap>"
                b"<sitemap><loc>HTTP://A.Example:80/s1.xml</loc></sitemap>"
                b"<sitemap><loc>http://a.example/s2.xml</loc></sitemap>"
                b"<sitemap><loc>http://a.example/done.xml</loc></sitemap>"
                b"</sitemapindex>",
            ),
            (
                "http://a.example/plain.xml",
                b"<urlset><url><loc>http://a.example/p</loc></url></urlset>",
            ),
        ],
        "url string, body binary",
    )
    fetched = spark.createDataFrame(
        [("http://a.example/done.xml?utm_source=x",)], "url string"
    )
    got = {
        r.canonical_url: r
        for r in sitemap_fetch_targets(maps, crawled=fetched).collect()
    }
    assert set(got) == {
        "http://a.example/s1.xml",
        "http://a.example/s2.xml",
    }
    # two spellings of s1 collapsed; lexically-first spelling kept
    assert got["http://a.example/s1.xml"].url == "HTTP://A.Example:80/s1.xml"
    assert got["http://a.example/s2.xml"].src_url == (
        "http://a.example/sitemap_index.xml"
    )
