"""Crawl frontier: the polite-crawler discovery loop composed.

    sitemap captures  ──sitemap_entries (engine parse)──► candidate locs
    crawl captures    ──3xx Location column──► redirect targets
                      ──canonicalize + first-spelling dedup──► one row/page
    robots captures   ──robots_rules──► compliance filter (before anything
                                         else pays for the url)
    crawled pages     ──canonical anti-join──► only NEW work survives

The output is what a fetch scheduler consumes: urls a site advertised
(sitemap ``<loc>``) or pointed at (HTTP redirect ``Location``), that its
robots policy allows, that the corpus does not already hold — with the
advertised lastmod/priority kept for scheduling.  Every stage is an
existing operator (functions/sitemap.py, functions/urlnorm.py,
functions/robots.py, the ``redirect_to`` column sources/warc.py
materializes at ingest); this module is the composition and its contract.

Scale shape: one parse pass over sitemap captures (map-only), a
column-select over already-ingested crawl captures for redirects (no
re-read — ``redirect_to`` is materialized at ingest), ONE exchange on the
canonical url for the spelling dedup, a host join for robots, and a
left-anti join against the crawled set on the same canonical key
(broadcast-able when the frontier is incremental and the crawled side is
the big one — the anti-join's build side is the NEW candidates, typically
tiny next to the corpus, so pass ``broadcast_candidates=True`` to flip
it).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from dhtmlparser3_spark.functions.robots import robots_filter, robots_rules
from dhtmlparser3_spark.functions.sitemap import (
    sitemap_entries,
    with_lastmod_ts,
)
from dhtmlparser3_spark.functions.urlnorm import with_canonical_url

FRONTIER_SCHEMA = (
    "url string, canonical_url string, src_url string, "
    "lastmod string, priority string"
)


def redirect_candidates(captures: DataFrame) -> DataFrame:
    """``read_warc``-shaped captures → (url, src_url, lastmod, priority)
    candidate rows from HTTP redirects: each clean 3xx capture advertises
    its resolved ``Location`` target (``redirect_to``, absolute — resolved
    against the capture url at ingest) with the redirecting url as the
    discovery source.  lastmod/priority are NULL — redirects carry no
    scheduling hints.  Map-only column select; candidate urls that only
    differ in spelling from known pages die in the frontier's canonical
    dedup/anti-join downstream."""
    return (
        captures.where(
            F.col("error").isNull()
            & F.col("redirect_to").isNotNull()
            & F.col("http_status").between(300, 399)
        )
        .select(
            F.col("redirect_to").alias("url"),
            F.col("url").alias("src_url"),
            F.lit(None).cast("string").alias("lastmod"),
            F.lit(None).cast("string").alias("priority"),
        )
    )


def crawl_frontier(
    sitemap_captures: DataFrame,
    robots_captures: DataFrame = None,
    crawled: DataFrame = None,
    redirect_captures: DataFrame = None,
    agent: str = "*",
    url_col: str = "url",
) -> DataFrame:
    """(url, body) sitemap captures → ``FRONTIER_SCHEMA`` fetch list.

    * duplicate advertisements of one canonical url keep the lexically
      first (loc, src_url) — deterministic across runs and across the
      sitemap/redirect source mix;
    * ``redirect_captures`` (``read_warc`` shape): 3xx ``Location``
      targets join the candidate pool (``redirect_candidates``);
    * ``robots_captures`` (url, body): fetch-disallowed urls drop;
    * ``crawled`` (any frame with ``url_col``): urls whose canonical
      spelling the corpus already holds drop (left-anti).
    """
    entries = (
        sitemap_entries(sitemap_captures)
        .where(F.col("error").isNull() & (F.col("kind") == "url"))
        .select(
            F.col("loc").alias("url"),
            F.col("src_url").alias("src_url"),
            "lastmod",
            "priority",
        )
    )
    if redirect_captures is not None:
        entries = entries.unionByName(redirect_candidates(redirect_captures))
    canon = with_canonical_url(entries)
    w = Window.partitionBy("canonical_url").orderBy("url", "src_url")
    frontier = (
        canon.withColumn("rk", F.row_number().over(w))
        .where(F.col("rk") == 1)
        .select("url", "canonical_url", "src_url", "lastmod", "priority")
    )
    if robots_captures is not None:
        frontier = robots_filter(
            frontier, robots_rules(robots_captures, agent)
        )
    if crawled is not None:
        seen = with_canonical_url(
            crawled.select(F.col(url_col).alias("url"))
        ).select("canonical_url").distinct()
        frontier = frontier.join(seen, "canonical_url", "left_anti")
    return frontier.select(
        "url", "canonical_url", "src_url", "lastmod", "priority"
    )


def fetch_schedule(
    frontier: DataFrame,
    delays: DataFrame = None,
    default_delay: float = 1.0,
    start_ts: str = "2024-01-01 00:00:00",
    broadcast_delays: bool = False,
) -> DataFrame:
    """Frontier rows → a per-host POLITE fetch plan ``(url, host, slot,
    fetch_ts)``: within each host, urls take consecutive slots spaced by
    that host's crawl-delay, so the plan never asks one server for two
    pages closer together than its robots.txt allows.

    ``delays`` is ``functions.robots.robots_delays`` output
    ``(host, crawl_delay)``; hosts absent from it or with a NULL delay
    use ``default_delay`` seconds (robots silence is not permission to
    hammer).  Slot order within a host is deterministic: sitemap
    ``priority`` descending (NULL last — an advertised priority beats an
    unstated one), then url — so re-runs and resumed crawls schedule
    identically.

    Scale shape: ONE exchange on host (the window's partition key) plus
    a host join for delays (``broadcast_delays=True`` hints the tiny
    delay table; at full scale the per-host rows this window handles are
    exactly the rows one polite crawler worker owns anyway, so host
    partitioning is the natural layout, not an overhead).  No global
    ordering is imposed — a scheduler consuming the plan reads
    ``fetch_ts`` per host shard."""
    host = F.regexp_extract("url", r"^https?://([^/]+)", 1)
    f = frontier.withColumn("host", host)
    if delays is not None:
        d = F.broadcast(delays) if broadcast_delays else delays
        f = f.join(d, "host", "left")
    else:
        f = f.withColumn("crawl_delay", F.lit(None).cast("double"))
    w = (
        Window.partitionBy("host")
        .orderBy(
            F.col("priority").cast("double").desc_nulls_last(), F.col("url")
        )
    )
    return (
        f.withColumn("slot", F.row_number().over(w) - F.lit(1))
        .select(
            "url",
            "host",
            "slot",
            F.timestamp_seconds(
                F.to_timestamp(F.lit(start_ts)).cast("double")
                + F.col("slot")
                * F.coalesce(F.col("crawl_delay"), F.lit(default_delay))
            ).alias("fetch_ts"),
        )
    )


def recrawl_candidates(
    crawled: DataFrame,
    sitemap_captures: DataFrame,
    url_col: str = "url",
    ts_col: str = "warc_ts",
    broadcast_advertised: bool = False,
) -> DataFrame:
    """Freshness pass: pages the corpus HOLDS whose site advertises a
    NEWER version — sitemap ``lastmod`` strictly after the stored
    capture's ``warc_ts`` — as ``(url, canonical_url, warc_ts,
    lastmod_ts, src_url)``.  The crawl loop's third input besides
    discovery and compliance: ``crawl_frontier`` finds what the corpus
    lacks, this finds what it holds stale.  ``url`` is the STORED
    spelling (what to refetch/replace); the join is on the canonical
    key, so a page crawled under one spelling and advertised under
    another still matches.

    Pages with no advertised lastmod, an unparseable lastmod, or
    lastmod ≤ warc_ts don't appear — no signal is not staleness.
    Duplicate advertisements keep the NEWEST parsed lastmod per
    canonical url (a struct max — (lastmod_ts, src_url) lexicographic,
    so equal timestamps tie-break deterministically on src_url — and the
    conservative reading: any advertisement newer than the capture makes
    it stale).

    Scale shape: one canonical exchange per side into an equi-join —
    ``broadcast_advertised=True`` hints the sitemap side (an incremental
    sitemap re-fetch is tiny next to a 10^12-page corpus)."""
    advertised = (
        with_lastmod_ts(
            sitemap_entries(sitemap_captures).where(
                F.col("error").isNull() & (F.col("kind") == "url")
            )
        )
        .where(F.col("lastmod_ts").isNotNull())
        .select(
            F.col("loc").alias("url"),
            F.col("src_url").alias("src_url"),
            "lastmod_ts",
        )
    )
    advertised = (
        with_canonical_url(advertised)
        .groupBy("canonical_url")
        .agg(
            F.max(F.struct("lastmod_ts", "src_url")).alias("_m")
        )
        .select(
            "canonical_url",
            F.col("_m.lastmod_ts").alias("lastmod_ts"),
            F.col("_m.src_url").alias("src_url"),
        )
    )
    if broadcast_advertised:
        advertised = F.broadcast(advertised)
    held = with_canonical_url(
        crawled.select(
            F.col(url_col).alias("url"), F.col(ts_col).alias("warc_ts")
        )
    )
    return (
        held.join(advertised, "canonical_url")
        .where(F.col("lastmod_ts") > F.col("warc_ts"))
        .select("url", "canonical_url", "warc_ts", "lastmod_ts", "src_url")
    )


def sitemap_fetch_targets(
    sitemap_captures: DataFrame,
    crawled: DataFrame = None,
    url_col: str = "url",
) -> DataFrame:
    """Discovery RECURSION for sitemap index files: the child-sitemap
    locs the fetched sitemaps advertise (``sitemap_entries`` kind =
    ``"sitemap"``), canonical-deduped (first spelling/source wins,
    deterministic), minus those already fetched — i.e. the next round of
    SITEMAP fetches, the same loop ``crawl_frontier`` runs for pages.
    Output ``(url, canonical_url, src_url)``; feed the fetched results
    back in until the frame is empty (real site indexes nest one or two
    levels; the spec caps entries at 50k/file, so each round is a small
    frame).  Same plan shape as the frontier: one parse pass, one
    canonical exchange, one anti-join."""
    kids = (
        sitemap_entries(sitemap_captures)
        .where(F.col("error").isNull() & (F.col("kind") == "sitemap"))
        .select(
            F.col("loc").alias("url"), F.col("src_url").alias("src_url")
        )
    )
    canon = with_canonical_url(kids)
    w = Window.partitionBy("canonical_url").orderBy("url", "src_url")
    out = (
        canon.withColumn("rk", F.row_number().over(w))
        .where(F.col("rk") == 1)
        .select("url", "canonical_url", "src_url")
    )
    if crawled is not None:
        seen = with_canonical_url(
            crawled.select(F.col(url_col).alias("url"))
        ).select("canonical_url").distinct()
        out = out.join(seen, "canonical_url", "left_anti")
    return out
