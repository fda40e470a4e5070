"""N-gram LM quality scoring (CCNet-style perplexity bucketing).

CCNet (Wenzek et al. 2019, §4.2) scores every document with a language
model trained on a trusted reference corpus and buckets the corpus into
head/middle/tail by perplexity — the standard "does this read like real
prose" quality tier between the heuristic filters (Gopher repetition,
stopword ratios — quality_filters.py) and deduplication.  Not a reference
operator: dhtmlparser3's scope ends at the parse that produces the text
(src/dhtmlparser3/__init__.py:24-26); this is the curation stage
downstream of extraction.

Spark-first shape, designed for 10^12 docs:

* the MODEL is tiny relative to the corpus (CCNet's wiki LM is a few
  hundred MB; here a bigram table) — it broadcasts, the corpus never
  re-partitions for it;
* SCORING is explode → broadcast-hash join → per-doc sum with map-side
  partial aggregation, so the only shuffled rows are ``(doc_id, int64)``
  partials — document text stays in its scan partition;
* everything is in the INTEGER domain end to end: each bigram's log-prob
  is frozen to micro-nats (``round(ln(c/total) * 1e6)``) when the model
  is built, per-doc scores are exact integer sums of those, and bucket
  thresholds compare ``sum >= T * n`` in integer arithmetic — so scores
  are bit-identical across engines (the DuckDB oracle reproduces them
  exactly) and across cluster sizes / reduction orders, which float
  summation would not be;
* zero Python UDFs — token split, bigram zip, join and aggregation are
  all codegen expressions.

The one driver-side action is the model's total-count scalar (same
bounded-collect precedent as the IVF codebook in similarity.py).
"""

from __future__ import annotations

from typing import Tuple

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from dhtmlparser3_spark.functions.textops import tokens_col

# micro-nats per nat: log-probs are frozen to round(ln(p) * SCALE)
SCALE = 1_000_000

# head/middle/tail thresholds in avg micro-nats per bigram: a doc is
# 'head' when its mean bigram log-prob clears T_HEAD (i.e. its bigrams
# are common in the reference corpus), 'tail' below T_MIDDLE, and docs
# with no bigrams at all are their own bucket (nothing to judge).
T_HEAD = -6_800_000
T_MIDDLE = -6_900_000


def bigrams_col(col: str = "text") -> Column:
    """Adjacent-token bigrams as 'w1 w2' strings; <2 tokens → empty."""
    toks = tokens_col(col)
    n = F.size(toks)
    return F.when(n < 2, F.array().cast("array<string>")).otherwise(
        F.zip_with(
            F.slice(toks, 1, n - 1),
            F.slice(toks, 2, n - 1),
            lambda a, b: F.concat(a, F.lit(" "), b),
        )
    )


def bigram_model(
    train: DataFrame, text_col: str = "text", materialize: bool = True
) -> Tuple[DataFrame, int]:
    """(model, total): bigram → frozen integer log-prob over ``train``.

    model columns: (bigram, n, lp_micro) with
    ``lp_micro = round(ln(n / total) * 1e6)`` — the freeze happens HERE,
    once per distinct bigram, so scoring never touches floats.  ``total``
    (the corpus bigram count) comes back as a scalar for the OOV penalty.

    ``materialize=True`` (default) snapshots the count table to the
    driver — it is the broadcastable model by definition, so this is the
    same bytes a broadcast would move — and releases the training scan's
    cache immediately (no cache entries accumulate across invocations).
    Set False for a model too large to hold on the driver: the model
    stays a lazy cached plan and scoring joins it distributed.
    """
    counts = (
        train.select(F.explode(bigrams_col(text_col)).alias("bigram"))
        .groupBy("bigram")
        .agg(F.count("*").alias("n"))
    )
    counts = counts.persist()
    if materialize:
        rows = counts.collect()
        counts.unpersist()
        total = sum(r["n"] for r in rows)
        base = train.sparkSession.createDataFrame(
            rows, "bigram string, n bigint"
        )
    else:
        total = counts.agg(F.sum("n")).first()[0] or 0
        base = counts
    model = base.select(
        "bigram",
        "n",
        F.round(
            F.log(F.col("n").cast("double") / F.lit(float(max(total, 1))))
            * SCALE
        )
        .cast("bigint")
        .alias("lp_micro"),
    )
    return model, int(total)


def oov_lp_micro(total: int) -> int:
    """Frozen OOV penalty: an unseen bigram scores as a pseudo-count of
    one against (total + 1) — strictly below every in-model bigram."""
    import math

    return round(math.log(1.0 / (total + 1)) * SCALE)


def lm_score(
    df: DataFrame,
    model: DataFrame,
    total: int,
    id_col: str = "doc_id",
    text_col: str = "text",
    broadcast_model: bool = True,
    t_head: int = T_HEAD,
    t_middle: int = T_MIDDLE,
) -> DataFrame:
    """Per-doc LM quality: (id, n_bigrams, sum_lp_micro, lm_bucket).

    ``sum_lp_micro`` is the exact integer sum of the doc's bigram
    log-probs (OOV bigrams take the frozen penalty); buckets compare
    mean log-prob against ``t_head``/``t_middle`` in integer
    cross-multiplied form (``sum >= T * n``), so the verdict is
    reduction-order-proof.  The module defaults are calibrated to the
    sandbox corpus; thresholds are model-relative quantities (CCNet cuts
    at percentiles of the reference LM), so a different reference corpus
    should pass its own.
    ``broadcast_model=False`` falls back to a shuffle join for a model
    too big to broadcast (e.g. char-5-gram tables at full CC scale).
    """
    oov = oov_lp_micro(total)
    bg = df.select(
        F.col(id_col), F.explode_outer(bigrams_col(text_col)).alias("bigram")
    )
    m = model.select("bigram", "lp_micro")
    if broadcast_model:
        m = F.broadcast(m)
    scored = bg.join(m, "bigram", "left").groupBy(id_col).agg(
        F.count("bigram").alias("n_bigrams"),
        F.coalesce(
            F.sum(
                F.when(F.col("bigram").isNull(), F.lit(0)).otherwise(
                    F.coalesce(F.col("lp_micro"), F.lit(oov))
                )
            ),
            F.lit(0),
        ).alias("sum_lp_micro"),
    )
    n = F.col("n_bigrams").cast("bigint")
    s = F.col("sum_lp_micro")
    bucket = (
        F.when(F.col("n_bigrams") == 0, F.lit("empty"))
        .when(s >= F.lit(int(t_head)) * n, F.lit("head"))
        .when(s >= F.lit(int(t_middle)) * n, F.lit("middle"))
        .otherwise(F.lit("tail"))
    )
    return scored.select(
        id_col,
        F.col("n_bigrams").cast("int").alias("n_bigrams"),
        "sum_lp_micro",
        bucket.alias("lm_bucket"),
    )


def lm_quality(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    train_mod: int = 10,
    train_keep: int = 3,
    t_head: int = T_HEAD,
    t_middle: int = T_MIDDLE,
) -> DataFrame:
    """Composed tier: train on the deterministic ``id % train_mod <
    train_keep`` slice (the 'trusted reference' stand-in — at a real
    deployment this is a wiki-quality corpus), score every doc."""
    train = df.where(F.col(id_col) % train_mod < train_keep)
    model, total = bigram_model(train, text_col)
    return lm_score(
        df, model, total, id_col=id_col, text_col=text_col,
        t_head=t_head, t_middle=t_middle,
    )
