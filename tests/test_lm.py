"""LM quality tier (functions/lm.py) — model differential + plan pins.

The integer-domain contract is the point: log-probs are frozen to
micro-nats once per model row, per-doc scores are exact integer sums, so
an independent pure-Python implementation (math.log, same freeze rule)
must reproduce Spark's output EXACTLY — no tolerance anywhere.
"""

from __future__ import annotations

import contextlib
import io
import math
import random
from collections import Counter

import pytest
from pyspark.sql import functions as F

from dhtmlparser3_spark.functions.lm import (
    SCALE,
    T_HEAD,
    T_MIDDLE,
    bigram_model,
    lm_quality,
    lm_score,
    oov_lp_micro,
)


def model_lm(docs: dict[int, str], train_ids) -> dict[int, tuple]:
    """Independent spec implementation (id -> (n, sum_lp, bucket))."""

    def bigrams(t):
        toks = t.split()
        return [f"{a} {b}" for a, b in zip(toks, toks[1:])]

    counts = Counter(
        bg for d in train_ids for bg in bigrams(docs[d])
    )
    total = sum(counts.values())
    lp = {
        bg: _half_up(math.log(n / total) * SCALE)
        for bg, n in counts.items()
    }
    oov = oov_lp_micro(total)
    out = {}
    for d, t in docs.items():
        bgs = bigrams(t)
        s = sum(lp.get(bg, oov) for bg in bgs)
        n = len(bgs)
        if n == 0:
            b = "empty"
        elif s >= T_HEAD * n:
            b = "head"
        elif s >= T_MIDDLE * n:
            b = "middle"
        else:
            b = "tail"
        out[d] = (n, s, b)
    return out


def _half_up(x: float) -> int:
    """Spark F.round semantics (HALF_UP, away from zero on .5)."""
    return int(math.floor(x + 0.5)) if x >= 0 else -int(math.floor(-x + 0.5))


@pytest.mark.spark
def test_lm_quality_random_differential(spark):
    rng = random.Random(41)
    vocab = [f"w{i}" for i in range(12)]
    docs = {
        d: " ".join(rng.choice(vocab) for _ in range(rng.randint(0, 30)))
        for d in range(120)
    }
    docs[7] = ""  # empty doc -> 'empty' bucket
    docs[8] = "single"  # one token -> no bigrams -> 'empty'
    df = spark.createDataFrame(list(docs.items()), "doc_id int, text string")
    got = {
        r["doc_id"]: (r["n_bigrams"], r["sum_lp_micro"], r["lm_bucket"])
        for r in lm_quality(df).collect()
    }
    want = model_lm(docs, [d for d in docs if d % 10 < 3])
    assert got == want
    assert got[7][2] == "empty" and got[8][2] == "empty"


@pytest.mark.spark
def test_lm_score_oov_floor(spark):
    """A doc of pure OOV bigrams scores exactly n * oov penalty and lands
    in 'tail' (the penalty is strictly below every in-model log-prob)."""
    train = spark.createDataFrame(
        [(0, "a b a b a b")], "doc_id int, text string"
    )
    model, total = bigram_model(train)
    oov = oov_lp_micro(total)
    assert total == 5
    lps = [r["lp_micro"] for r in model.collect()]
    assert all(oov < v for v in lps)
    score = spark.createDataFrame(
        [(1, "x y z")], "doc_id int, text string"
    )
    row = lm_score(score, model, total).collect()[0]
    assert (row["n_bigrams"], row["sum_lp_micro"]) == (2, 2 * oov)
    # bucket follows the integer threshold formula (a toy model's OOV
    # penalty is mild — ln(1/6) — so this is 'head' here; corpus-scale
    # totals push OOV docs into 'tail', covered by the differential test)
    want = (
        "head"
        if 2 * oov >= T_HEAD * 2
        else ("middle" if 2 * oov >= T_MIDDLE * 2 else "tail")
    )
    assert row["lm_bucket"] == want


@pytest.mark.spark
def test_lm_materialize_modes_agree(spark):
    df = spark.createDataFrame(
        [(i, f"t{i % 3} u{i % 2} t{(i + 1) % 3} v") for i in range(40)],
        "doc_id int, text string",
    )
    train = df.where(F.col("doc_id") % 2 == 0)
    m1, t1 = bigram_model(train, materialize=True)
    m2, t2 = bigram_model(train, materialize=False)
    assert t1 == t2
    r1 = sorted(map(tuple, lm_score(df, m1, t1).collect()))
    r2 = sorted(map(tuple, lm_score(df, m2, t2).collect()))
    assert r1 == r2
    m2.unpersist()


@pytest.mark.spark
def test_lm_score_plan_broadcast_no_python(spark):
    """Scale pins: the model side is a BroadcastHashJoin (corpus never
    re-partitions for the model), the per-doc aggregate has a map-side
    partial (partial_count/sum below the doc_id exchange), and the whole
    tier is codegen — zero Python eval nodes."""
    df = spark.createDataFrame(
        [(i, "a b c d e") for i in range(64)], "doc_id int, text string"
    )
    model, total = bigram_model(df.limit(8))
    plan_df = lm_score(df, model, total)
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        plan_df.explain(mode="formatted")
    plan = buf.getvalue()
    assert "BroadcastHashJoin" in plan, plan
    assert "ArrowEvalPython" not in plan and "BatchEvalPython" not in plan
    assert "partial_sum" in plan or "partial sum" in plan.lower(), plan


@pytest.mark.spark
def test_curate_composition_lm_stage(spark):
    """lm_reference plugs into curate_corpus: docs whose bigrams are
    alien to the reference corpus land in 'tail' and are dropped; docs
    that read like the reference survive."""
    import datetime

    from dhtmlparser3_spark.pipeline.curate import curate_corpus

    ts = datetime.datetime(2024, 1, 1)
    prose = "the quick brown fox jumps over the lazy dog and runs home"
    rows = []
    for i in range(8):
        rows.append(
            (
                f"http://h/good{i}",
                ts,
                f"<html><p>{prose} {prose}</p></html>".encode(),
                None,
                "en",
            )
        )
    rows.append(
        (
            "http://h/gibberish",
            ts,
            b"<html><p>zxq wvv qqj kpt zxq wvv qqj kpt zxq wvv</p></html>",
            None,
            "en",
        )
    )
    pages = spark.createDataFrame(
        rows, "url string, warc_ts timestamp, html binary, text string, lang string"
    )
    ref = spark.createDataFrame(
        [(i, prose) for i in range(20)], "doc_id int, text string"
    )
    base = {
        r["url"]
        for r in curate_corpus(pages, min_quality=0).collect()
    }
    # toy-model-scale thresholds: in-model bigrams score ~ln(1/11) ≈
    # -2.4M micro-nats, OOV ≈ ln(1/221) ≈ -5.4M — cut between them
    got = {
        r["url"]
        for r in curate_corpus(
            pages,
            min_quality=0,
            lm_reference=ref,
            lm_thresholds=(-3_000_000, -5_000_000),
        ).collect()
    }
    assert "http://h/gibberish" in base
    assert "http://h/gibberish" not in got
    assert any(u.startswith("http://h/good") for u in got)
