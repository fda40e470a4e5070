"""End-to-end corpus curation: the training-data pipeline composed.

    pages ──extract (salted, Arrow-batched parse)──► main_text
          ──quality scoring (pure columnar)────────► counters + score
          ──filter (quality floor)─────────────────► kept docs
          ──exact dedup (md5 window, keep 1st url)─► curated corpus

Every stage is an operator that already has its own oracle; the composed
pipeline has a composed DuckDB oracle in ``__spark_entry__`` — the point
is that the stages CHAIN without materialization: one Python stage (the
parse), everything after it whole-stage-codegen + one window exchange.
At 10^12 docs the md5-dedup window is the only extra shuffle, keyed on
the digest (uniform by construction — no skew).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from dhtmlparser3_spark.functions.textops import with_quality
from dhtmlparser3_spark.pipeline.extract_job import extract_pages


def curate_corpus(
    pages: DataFrame,
    min_quality: int = 50,
    robots: DataFrame = None,
    agent: str = "*",
    **extract_kw,
) -> DataFrame:
    """pages → curated (url, n_tokens, quality), deduped on exact text.

    ``robots``: optional (url, body) robots.txt captures — when given,
    fetch-disallowed pages are dropped BEFORE the parse stage (the
    compliance filter is a host join over urls; running it first means
    a disallowed page never costs a parse, the right order at crawl
    scale)."""
    if robots is not None:
        from dhtmlparser3_spark.functions.robots import (
            robots_filter,
            robots_rules,
        )

        pages = robots_filter(pages, robots_rules(robots, agent))
    ex = extract_pages(pages, with_metrics=False, **extract_kw)
    docs = ex.select("url", F.col("main_text").alias("text"))
    scored = with_quality(docs)
    kept = scored.where(F.col("quality") >= min_quality)
    w = Window.partitionBy(F.md5("text")).orderBy("url")
    return (
        kept.withColumn("rk", F.row_number().over(w))
        .where(F.col("rk") == 1)
        .select(
            "url",
            F.col("n_tokens").cast("int").alias("n_tokens"),
            F.col("quality").cast("int").alias("quality"),
        )
    )
