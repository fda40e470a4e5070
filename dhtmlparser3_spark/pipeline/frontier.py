"""Crawl frontier: the polite-crawler discovery loop composed.

    sitemap captures ──sitemap_entries (engine parse)──► candidate locs
                      ──canonicalize + first-spelling dedup──► one row/page
    robots captures  ──robots_rules──► compliance filter (before anything
                                        else pays for the url)
    crawled pages    ──canonical anti-join──► only NEW work survives

The output is what a fetch scheduler consumes: urls a site advertised,
that its robots policy allows, that the corpus does not already hold —
with the advertised lastmod/priority kept for scheduling.  Every stage
is an existing operator (functions/sitemap.py, functions/urlnorm.py,
functions/robots.py); this module is the composition and its contract.

Scale shape: one parse pass over sitemap captures (map-only), ONE
exchange on the canonical url for the spelling dedup, a host join for
robots, and a left-anti join against the crawled set on the same
canonical key (broadcast-able when the frontier is incremental and the
crawled side is the big one — the anti-join's build side is the NEW
candidates, typically tiny next to the corpus, so pass
``broadcast_candidates=True`` to flip it).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from dhtmlparser3_spark.functions.robots import robots_filter, robots_rules
from dhtmlparser3_spark.functions.sitemap import sitemap_entries
from dhtmlparser3_spark.functions.urlnorm import with_canonical_url

FRONTIER_SCHEMA = (
    "url string, canonical_url string, src_sitemap string, "
    "lastmod string, priority string"
)


def crawl_frontier(
    sitemap_captures: DataFrame,
    robots_captures: DataFrame = None,
    crawled: DataFrame = None,
    agent: str = "*",
    url_col: str = "url",
) -> DataFrame:
    """(url, body) sitemap captures → ``FRONTIER_SCHEMA`` fetch list.

    * duplicate advertisements of one canonical url keep the lexically
      first (loc, src_sitemap) — deterministic across runs;
    * ``robots_captures`` (url, body): fetch-disallowed urls drop;
    * ``crawled`` (any frame with ``url_col``): urls whose canonical
      spelling the corpus already holds drop (left-anti).
    """
    entries = (
        sitemap_entries(sitemap_captures)
        .where(F.col("error").isNull() & (F.col("kind") == "url"))
        .select(
            F.col("loc").alias("url"),
            F.col("src_url").alias("src_sitemap"),
            "lastmod",
            "priority",
        )
    )
    canon = with_canonical_url(entries)
    w = Window.partitionBy("canonical_url").orderBy("url", "src_sitemap")
    frontier = (
        canon.withColumn("rk", F.row_number().over(w))
        .where(F.col("rk") == 1)
        .select("url", "canonical_url", "src_sitemap", "lastmod", "priority")
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
        "url", "canonical_url", "src_sitemap", "lastmod", "priority"
    )
