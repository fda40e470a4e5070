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
