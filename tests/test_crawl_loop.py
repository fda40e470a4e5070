"""The crawl loop end-to-end, from ONE synthesized WARC shard:

    captures ──warc_pages──► corpus ──extract──► byte-identical text
       │  ├─ robots.txt capture ──► compliance + politeness delays
       │  ├─ sitemap.xml capture ──► discovery + freshness
       │  ├─ 3xx capture ──► redirect discovery
       │  └─ revisit record ──► duplicate-fetch credit
       └──────────► frontier → schedule → recrawl → write_warc round-trip

Each stage is pinned in its own suite; this test pins the COMPOSITION —
the contract that one ingest pass feeds every downstream tier without
re-reading or reshaping anything.
"""

from __future__ import annotations

import datetime as dt
import sys

from pyspark.sql import functions as F

sys.path.insert(0, "/root/reference/src")
import dhtmlparser3 as ref  # noqa: E402  (vendored reference — oracle)

from dhtmlparser3_spark.functions.robots import robots_delays  # noqa: E402
from dhtmlparser3_spark.pipeline.extract_job import extract_pages  # noqa: E402
from dhtmlparser3_spark.pipeline.frontier import (  # noqa: E402
    crawl_frontier,
    fetch_schedule,
    recrawl_candidates,
)
from dhtmlparser3_spark.sources.warc import (  # noqa: E402
    build_warc_record,
    read_warc,
    read_warc_revisits,
    revisit_counts,
    warc_pages,
    write_warc,
    write_warc_gz,
)

ROBOTS_BODY = b"User-agent: *\nDisallow: /private/\nCrawl-delay: 5\n"
SITEMAP_BODY = (
    b"<urlset>"
    b"<url><loc>http://site.example/home</loc>"
    b"<lastmod>2024-03-01</lastmod></url>"
    b"<url><loc>http://site.example/new</loc></url>"
    b"<url><loc>http://site.example/private/secret</loc></url>"
    b"</urlset>"
)
HOME_HTML = b"<html><p a=1>home &amp; hearth</p><br></html>"
ABOUT_HTML = "<div>café &lt;3 <b>about".encode()


def _shard(tmp_path) -> str:
    recs = [
        build_warc_record(
            "http://site.example/robots.txt", "2024-01-01T00:00:00Z",
            ROBOTS_BODY,
        ),
        build_warc_record(
            "http://site.example/sitemap.xml", "2024-01-01T00:00:01Z",
            SITEMAP_BODY,
        ),
        # content captures — one wire-encoded, to prove decode in-loop
        build_warc_record(
            "http://site.example/home", "2024-01-01T00:00:02Z", HOME_HTML,
            content_encoding="gzip", transfer_encoding="chunked",
        ),
        build_warc_record(
            "http://site.example/about", "2024-01-01T00:00:03Z", ABOUT_HTML,
        ),
        # redirect: discovers /fresh
        build_warc_record(
            "http://site.example/old-url", "2024-01-01T00:00:04Z", b"",
            status=301, reason="Moved Permanently", location="/fresh",
        ),
        # error page: the 200-only policy must keep it out of the corpus
        build_warc_record(
            "http://site.example/gone", "2024-01-01T00:00:05Z",
            b"<h1>404</h1>", status=404, reason="Not Found",
        ),
        # the archive's own dedup marker for /about
        build_warc_record(
            "http://site.example/about", "2024-02-01T00:00:00Z", b"",
            warc_type="revisit",
            refers_to_url="http://site.example/about",
            refers_to_date="2024-01-01T00:00:03Z",
            payload_digest="sha1:ABOUTDIGESTABOUTDIGESTABOUTDIGES",
        ),
    ]
    path = str(tmp_path / "site.warc.gz")
    write_warc_gz([], path, extra_members=recs)
    return path


def test_crawl_loop_end_to_end(spark, tmp_path):
    path = _shard(tmp_path)
    captures = read_warc(spark, path)

    # ── corpus: 200s only, wire codings decoded, extraction byte-exact
    pages = warc_pages(spark, path)
    page_urls = {r.url for r in pages.select("url").collect()}
    assert page_urls == {
        "http://site.example/robots.txt",
        "http://site.example/sitemap.xml",
        "http://site.example/home",
        "http://site.example/about",
    }  # 404 and the 301 (3xx not in the 200 policy) excluded
    content = pages.where(
        ~F.col("url").rlike(r"(robots\.txt|sitemap\.xml)$")
    )
    extracted = extract_pages(content, parallelism=2, with_metrics=False)
    got_text = {
        r.url: r.extracted_text
        for r in extracted.select("url", "extracted_text").collect()
    }
    assert got_text == {
        "http://site.example/home": ref.parse(
            HOME_HTML.decode()
        ).content_str(),
        "http://site.example/about": ref.parse(
            ABOUT_HTML.decode()
        ).content_str(),
    }

    # ── compliance + discovery from the SAME captures frame
    as_body = lambda pat: (  # noqa: E731
        captures.where(F.col("url").endswith(pat)).select(
            "url", F.col("html").alias("body")
        )
    )
    frontier = crawl_frontier(
        as_body("sitemap.xml"),
        robots_captures=as_body("robots.txt"),
        crawled=content.select("url"),
        redirect_captures=captures,
    )
    frows = {r.canonical_url: r for r in frontier.collect()}
    # /home already crawled (anti-join), /private robots-dropped,
    # /new sitemap-discovered, /fresh redirect-discovered
    assert set(frows) == {
        "http://site.example/new",
        "http://site.example/fresh",
    }
    assert frows["http://site.example/fresh"].src_url == (
        "http://site.example/old-url"
    )

    # ── politeness: 5 s spacing from the captured robots.txt
    sched = {
        r.url: r
        for r in fetch_schedule(
            frontier,
            robots_delays(as_body("robots.txt")),
            start_ts="2024-06-01 00:00:00",
        ).collect()
    }
    assert {sched[u].slot for u in sched} == {0, 1}
    ts = sorted(r.fetch_ts for r in sched.values())
    assert (ts[1] - ts[0]).total_seconds() == 5.0

    # ── freshness: /home advertised 2024-03-01 > captured 2024-01-01
    stale = recrawl_candidates(
        extracted.select("url", "warc_ts"), as_body("sitemap.xml")
    ).collect()
    assert [r.url for r in stale] == ["http://site.example/home"]

    # ── archive dedup credit
    credit = revisit_counts(read_warc_revisits(spark, path)).collect()
    assert [
        (r.refers_to_url, r.n_revisits) for r in credit
    ] == [("http://site.example/about", 1)]

    # ── curated re-publish round-trips byte-identically
    dest = str(tmp_path / "curated")
    manifest = write_warc(
        content.select("url", "warc_ts", "html"), dest
    ).collect()
    assert sum(m.records for m in manifest) == 2
    back = {
        r.url: bytes(r.html)
        for r in read_warc(spark, dest + "/*.warc.gz").collect()
    }
    want = {
        r.url: bytes(r.html)
        for r in content.select("url", "html").collect()
    }
    assert back == want
