"""End-to-end corpus curation: the training-data pipeline composed.

    pages ──[robots filter (pre-parse host join)]───► allowed pages
          ──extract (salted, Arrow-batched parse)──► main_text
          ──[cross-doc line dedup (opt-in)]─────────► boilerplate-free text
          ──[exact-substring span dedup (opt-in)]───► memorization-fuel cut
          ──[LM quality bucket filter (opt-in)]─────► prose-like docs
          ──quality scoring (pure columnar)────────► counters + score
          ──filter (quality floor)─────────────────► kept docs
          ──exact dedup (md5 window, keep 1st url)─► curated corpus

Every stage is an operator that already has its own oracle; the composed
pipeline has a composed DuckDB oracle in ``__spark_entry__`` — the point
is that the stages CHAIN without materialization: one Python stage (the
parse), everything after it whole-stage-codegen.  In the default
configuration the md5-dedup window is the only extra shuffle, keyed on
the digest (uniform by construction — no skew); the opt-in line-dedup
stage adds its own keys-only counting shuffles (text still crosses the
wire once inside that operator — see functions/dedup.py), and the opt-in
LM stage adds one broadcast join plus a url semi-join.
"""

from __future__ import annotations

from typing import Sequence

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from dhtmlparser3_spark.functions.textops import with_quality
from dhtmlparser3_spark.pipeline.extract_job import extract_pages


def curate_corpus(
    pages: DataFrame,
    min_quality: int = 50,
    robots: DataFrame = None,
    agent: str = "*",
    line_dedup_min_docs: int = None,
    dup_span_k: int = None,
    lm_reference: DataFrame = None,
    lm_keep_buckets: Sequence[str] = ("head", "middle"),
    lm_thresholds: Sequence[int] = None,
    **extract_kw,
) -> DataFrame:
    """pages → curated (url, n_tokens, quality), deduped on exact text.

    ``robots``: optional (url, body) robots.txt captures — when given,
    fetch-disallowed pages are dropped BEFORE the parse stage (the
    compliance filter is a host join over urls; running it first means
    a disallowed page never costs a parse, the right order at crawl
    scale).

    ``line_dedup_min_docs``: when set, lines appearing in >= that many
    docs are stripped from every doc AFTER extraction and BEFORE quality
    scoring / exact dedup — the order matters: boilerplate inflates
    token counts and makes near-identical articles hash differently, so
    removing it first improves both downstream stages (CCNet §4.1).

    ``dup_span_k``: when set, exact-substring dedup (Lee et al. 2021)
    cuts every >=k-token sequence occurring more than once corpus-wide,
    after the line stage — note its output is token-joined text
    (functions/dedup.py dup_spans), so it normalizes whitespace.

    ``lm_reference``: optional (doc_id, text) trusted corpus — when
    given, a bigram LM is trained on it and docs whose lm_bucket is not
    in ``lm_keep_buckets`` are dropped before the quality floor
    (functions/lm.py; the model broadcasts, the corpus does not move).
    ``lm_thresholds=(t_head, t_middle)`` overrides the module's
    corpus-calibrated bucket cuts — thresholds are model-relative, so a
    different reference corpus should pass its own.
    """
    if robots is not None:
        from dhtmlparser3_spark.functions.robots import (
            robots_filter,
            robots_rules,
        )

        pages = robots_filter(pages, robots_rules(robots, agent))
    ex = extract_pages(pages, with_metrics=False, **extract_kw)
    docs = ex.select("url", F.col("main_text").alias("text"))
    if line_dedup_min_docs is not None:
        from dhtmlparser3_spark.functions.dedup import line_dedup

        docs = line_dedup(
            docs, min_docs=line_dedup_min_docs, id_col="url"
        ).select("url", F.col("clean_text").alias("text"))
    if dup_span_k is not None:
        from dhtmlparser3_spark.functions.dedup import dup_spans

        docs = dup_spans(docs, k=dup_span_k, id_col="url").select(
            "url", F.col("clean_text").alias("text")
        )
    if lm_reference is not None:
        from dhtmlparser3_spark.functions.lm import bigram_model, lm_score

        model, total = bigram_model(lm_reference)
        kw = {}
        if lm_thresholds is not None:
            kw = {"t_head": lm_thresholds[0], "t_middle": lm_thresholds[1]}
        keep = (
            lm_score(docs, model, total, id_col="url", **kw)
            .where(F.col("lm_bucket").isin(list(lm_keep_buckets)))
            .select("url")
        )
        docs = docs.join(keep, "url", "left_semi")
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
