"""robots.txt compliance tier (functions/robots.py): pure-python parity
with the stdlib contract, hypothesis fuzz, and the Spark loop from
WARC-captured robots files to a filtered pages table."""

from __future__ import annotations

import gzip

import pytest
from pyspark.sql import functions as F
from urllib.robotparser import RobotFileParser

from dhtmlparser3_spark.functions.robots import (
    allowance,
    can_fetch,
    parse_robots,
    request_path,
    robots_allowed,
    robots_filter,
    robots_rules,
)

ROBOTS_FIXTURES = [
    "User-agent: *\nDisallow: /private/\nAllow: /private/ok\n",
    "User-agent: *\nAllow: /private/ok\nDisallow: /private/\n",
    "User-agent: googlebot\nDisallow: /\n\nUser-agent: *\nDisallow: /tmp/\n",
    "User-agent: a\nUser-agent: b\nDisallow: /x\n\nUser-agent: *\nAllow: /\n",
    "User-agent: *\nDisallow:\n",          # empty Disallow = allow all
    "User-agent: *\nDisallow: *\n",        # whole-path wildcard
    "# only comments\n",
    "User-agent: *\nDisallow: /a%3cd.html\n",
    "User-agent: *\nDisallow: /café\n",
    "User-agent: *\nDisallow: /?q=1\nDisallow: /p;x\n",
    "Disallow: /orphan\nUser-agent: *\nDisallow: /x\n",  # orphan rule dropped
    "User-agent: *",                       # agent line, no rules
    "",
    "User-agent: spider\nCrawl-delay: 3\nDisallow: /deep\n",
]

URL_FIXTURES = [
    "http://h.example/private/x",
    "http://h.example/private/ok/page",
    "http://h.example/a",
    "http://h.example/tmp/x",
    "http://h.example/a%3Cd.html",
    "http://h.example/a%3cd.html",
    "http://h.example/caf%C3%A9/x",
    "http://h.example/?q=1",
    "http://h.example/p;x",
    "http://h.example/",
    "http://h.example",
    "http://h.example/x/y",
    "http://h.example/deep/z",
]

AGENTS = ["*", "GoogleBot/2.1", "b/1.0", "spider", "Mozilla"]


def _stdlib(text: str, url: str, agent: str) -> bool:
    rp = RobotFileParser()
    rp.parse(text.splitlines())
    return rp.can_fetch(agent, url)


def test_can_fetch_matches_stdlib_corpus():
    """Every (fixture, agent, url) triple: our parse→normalize→scan
    composition equals RobotFileParser.can_fetch bit-for-bit."""
    for text in ROBOTS_FIXTURES:
        for agent in AGENTS:
            for url in URL_FIXTURES:
                assert can_fetch(text, url, agent) == _stdlib(
                    text, url, agent
                ), (text, agent, url)


def test_parse_robots_entry_resolution():
    text = "User-agent: googlebot\nDisallow: /g\n\nUser-agent: *\nDisallow: /all\n"
    assert parse_robots(text, "GoogleBot/2.1") == [("/g", False)]
    assert parse_robots(text, "other") == [("/all", False)]
    assert parse_robots("# nothing\n", "any") == []


def test_request_path_stdlib_normalization():
    assert request_path("http://h/a b") == "/a%20b"
    assert request_path("http://h") == "/"
    assert request_path("http://h/a%3Cd") == "/a%3Cd"
    # first-match scan itself
    rules = [("/private/ok", True), ("/private/", False)]
    assert allowance(rules, "/private/ok/x") is True
    assert allowance(rules, "/private/z") is False
    assert allowance(rules, "/elsewhere") is True
    assert allowance([("*", False)], "/anything") is False
    assert allowance([], "/x") is True


def test_can_fetch_hypothesis_fuzz():
    """Random robots-ish texts × random paths never crash and never
    diverge from the stdlib."""
    from hypothesis import given, settings, strategies as st

    line = st.one_of(
        st.sampled_from(
            [
                "User-agent: *",
                "User-agent: bot",
                "User-agent: spider",
                "Disallow: /a",
                "Disallow: /a/b",
                "Disallow:",
                "Disallow: *",
                "Allow: /a/b/c",
                "Allow: /",
                "# comment",
                "",
                "junk line no colon",
                "Crawl-delay: 2",
                "Disallow: /%7Euser",
                "Disallow: /q?x=1",
            ]
        ),
        st.text(
            alphabet="Uuser-Aagent:DisalowX */#%\t abc",
            max_size=30,
        ),
    )
    texts = st.lists(line, max_size=12).map("\n".join)
    paths = st.text(
        alphabet="/abq%7E?=&; .", max_size=20
    ).map(lambda p: "http://h.example/" + p)
    agents = st.sampled_from(["*", "bot/1.0", "spider", "zzz"])

    @settings(max_examples=300, deadline=None)
    @given(texts, paths, agents)
    def check(text, url, agent):
        assert can_fetch(text, url, agent) == _stdlib(text, url, agent)

    check()


# --- Spark loop ---------------------------------------------------------------


HOSTS = {
    "allow.example": "User-agent: *\nAllow: /\n",
    "deny.example": "User-agent: *\nDisallow: /\n",
    "partial.example": "User-agent: *\nDisallow: /private/\nAllow: /private/ok\n",
    "agented.example": "User-agent: mybot\nDisallow: /mine\n\nUser-agent: *\nDisallow: /theirs\n",
    "garbage.example": "\x00\x01 not robots at all \xff",
}
# norobots.example has no capture → default allow

PAGES = [
    f"http://{h}.example{p}"
    for h in ["allow", "deny", "partial", "agented", "garbage", "norobots"]
    for p in ["/", "/private/x", "/private/ok/y", "/mine/a", "/theirs/b"]
]


def _expected(agent: str) -> dict:
    out = {}
    for url in PAGES:
        host = url.split("/")[2]
        text = HOSTS.get(host)
        out[url] = True if text is None else _stdlib(text, url, agent)
    return out


@pytest.mark.parametrize("agent", ["*", "mybot/2.0"])
def test_robots_filter_end_to_end(spark, agent):
    robots = spark.createDataFrame(
        [(f"http://{h}/robots.txt", t.encode("utf-8", "replace")) for h, t in HOSTS.items()],
        "url string, body binary",
    )
    pages = spark.createDataFrame([(u,) for u in PAGES], "url string")
    rules = robots_rules(robots, agent=agent)
    assert rules.count() == len(HOSTS)  # one row per host

    got = {
        r.url: r.allowed
        for r in robots_allowed(pages, rules).collect()
    }
    assert got == _expected(agent)

    kept = {r.url for r in robots_filter(pages, rules).collect()}
    assert kept == {u for u, ok in _expected(agent).items() if ok}


def test_robots_rules_duplicate_captures_deterministic(spark):
    """Two captures of one host: the lexically-first url's body wins,
    every run."""
    robots = spark.createDataFrame(
        [
            ("http://h.example/robots.txt?b", b"User-agent: *\nDisallow: /\n"),
            ("http://h.example/robots.txt?a", b"User-agent: *\nAllow: /\n"),
        ],
        "url string, body binary",
    )
    rows = robots_rules(robots).collect()
    assert len(rows) == 1
    assert [tuple(r) for r in rows[0].rules] == [("/", True)]


def test_robots_from_warc_captures(spark, tmp_path):
    """The crawl-native loop: robots captures written as WARC records,
    read back with read_warc, fed to robots_rules — filtered pages match
    the stdlib per host."""
    from dhtmlparser3_spark.sources.warc import read_warc, write_warc_gz

    docs = [
        (f"http://{h}/robots.txt", "2024-01-01T00:00:00Z", t.encode("utf-8", "replace"))
        for h, t in sorted(HOSTS.items())
    ]
    path = str(tmp_path / "robots.warc.gz")
    write_warc_gz(docs, path)
    captures = read_warc(spark, path).where("error IS NULL")
    rules = robots_rules(
        captures.select("url", captures.html.alias("body"))
    )
    pages = spark.createDataFrame([(u,) for u in PAGES], "url string")
    got = {r.url: r.allowed for r in robots_allowed(pages, rules).collect()}
    assert got == _expected("*")


def test_robots_broadcast_plan(spark):
    """broadcast=True puts a BroadcastHashJoin in the plan (the curated-
    subset path); default leaves the strategy to the planner."""
    robots = spark.createDataFrame(
        [("http://h.example/robots.txt", b"User-agent: *\nDisallow: /x\n")],
        "url string, body binary",
    )
    pages = spark.createDataFrame([(u,) for u in PAGES], "url string")
    plan = robots_allowed(
        pages, robots_rules(robots), broadcast=True
    )._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastHashJoin" in plan


def test_curate_corpus_with_robots(spark):
    """robots plugs into the composed curation pipeline as the FIRST
    stage: curate(pages, robots=...) equals curate over the manually
    pre-filtered pages."""
    from dhtmlparser3_spark.pipeline.curate import curate_corpus
    from dhtmlparser3_spark.sources.pages import build_pages

    pages = build_pages(spark, "/root/testdata/sf0.001").limit(60).cache()
    hosts = sorted(
        {r.url.split("/")[2] for r in pages.select("url").collect()}
    )
    deny = hosts[: len(hosts) // 2]
    robots = spark.createDataFrame(
        [
            (f"http://{h}/robots.txt", b"User-agent: *\nDisallow: /\n")
            for h in deny
        ],
        "url string, body binary",
    )
    got = {
        tuple(r)
        for r in curate_corpus(pages, min_quality=0, robots=robots).collect()
    }
    kept_pages = pages.where(
        ~F.regexp_extract("url", r"^https?://([^/]+)", 1).isin(deny)
    )
    want = {
        tuple(r) for r in curate_corpus(kept_pages, min_quality=0).collect()
    }
    assert got == want and len(got) > 0
    pages.unpersist()


# --- crawl-delay extraction ---------------------------------------------------


def test_crawl_delay_of_matches_stdlib():
    from urllib.robotparser import RobotFileParser

    from dhtmlparser3_spark.functions.robots import crawl_delay_of

    cases = [
        ("User-agent: *\nCrawl-delay: 7\n", "*"),
        ("User-agent: *\nCrawl-delay: 2.5\n", "*"),
        ("User-agent: bot\nCrawl-delay: 3\nUser-agent: *\nCrawl-delay: 9\n",
         "bot"),
        ("User-agent: bot\nCrawl-delay: 3\nUser-agent: *\nCrawl-delay: 9\n",
         "other"),
        ("User-agent: *\nRequest-rate: 1/5\n", "*"),
        ("User-agent: *\nRequest-rate: 2/10\n", "*"),
        ("User-agent: *\nDisallow: /x\n", "*"),
        ("", "*"),
        ("User-agent: *\nCrawl-delay: fast\n", "*"),  # non-numeric
    ]
    for text, agent in cases:
        rp = RobotFileParser()
        rp.parse(text.splitlines())
        want = rp.crawl_delay(agent)
        got = crawl_delay_of(text, agent)
        if want is not None:
            assert got == float(want), (text, agent, got, want)
        else:
            rr = rp.request_rate(agent)
            if rr is not None and rr.requests:
                assert got == rr.seconds / rr.requests, (text, agent, got)
            else:
                assert got is None, (text, agent, got)


def test_robots_delays_per_host(spark):
    from dhtmlparser3_spark.functions.robots import robots_delays

    robots = spark.createDataFrame(
        [
            ("http://slow.example/robots.txt",
             b"User-agent: *\nCrawl-delay: 10\n"),
            ("http://rate.example/robots.txt",
             b"User-agent: *\nRequest-rate: 1/4\n"),
            ("http://silent.example/robots.txt",
             b"User-agent: *\nDisallow: /private/\n"),
        ],
        "url string, body binary",
    )
    got = {r.host: r.crawl_delay for r in robots_delays(robots).collect()}
    assert got == {
        "slow.example": 10.0,
        "rate.example": 4.0,
        "silent.example": None,
    }
