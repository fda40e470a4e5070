"""BPE tier (functions/bpe.py) — trainer differential + apply + plans.

The trainer is pinned against an independent reimplementation in this
file (different structure: Counter-based pair counting, regex-based
merge application) on random word tables; application is pinned by the
losslessness property (concatenated segments == word) and replay
equivalence (greedy ranked apply == replaying merges in order); the
Spark tier by partitioning-invariance and plan shape.
"""

from __future__ import annotations

import random
import re
from collections import Counter

import pytest
from pyspark.sql import functions as F

from dhtmlparser3_spark.functions.bpe import (
    apply_bpe,
    segment_word,
    train_bpe,
    train_bpe_on_counts,
    word_counts,
)


def model_train(counts, num_merges):
    """Independent trainer: Counter + regex merge, same spec."""
    words = Counter()
    for w, c in counts:
        if w:
            words[" ".join(w)] += c  # symbols space-separated in a string
    merges = []
    for _ in range(num_merges):
        pairs = Counter()
        for w, c in words.items():
            sym = w.split(" ")
            for a, b in zip(sym, sym[1:]):
                pairs[(a, b)] += c
        if not pairs:
            break
        best = max(pairs.items(), key=lambda kv: (kv[1], kv[0]))[0]
        merges.append(best)
        pat = re.compile(
            r"(?<!\S)" + re.escape(best[0]) + r" " + re.escape(best[1]) + r"(?!\S)"
        )
        words = Counter(
            {pat.sub(best[0] + best[1], w): c for w, c in words.items()}
        )
    return merges


def model_segment(word, merges):
    """Replay merges in training order (the spec's definition)."""
    sym = " ".join(word)
    for a, b in merges:
        pat = re.compile(
            r"(?<!\S)" + re.escape(a) + r" " + re.escape(b) + r"(?!\S)"
        )
        sym = pat.sub(a + b, sym)
    return sym.split(" ") if sym else []


@pytest.mark.parametrize("seed", [5, 77, 901])
def test_trainer_differential(seed):
    rng = random.Random(seed)
    alphabet = "abcdef"
    counts = [
        (
            "".join(rng.choice(alphabet) for _ in range(rng.randint(1, 8))),
            rng.randint(1, 50),
        )
        for _ in range(120)
    ]
    got = train_bpe_on_counts(counts, num_merges=25)
    want = model_train(counts, 25)
    assert got == want


@pytest.mark.parametrize("seed", [13, 414])
def test_apply_matches_replay_and_is_lossless(seed):
    rng = random.Random(seed)
    counts = [
        (
            "".join(rng.choice("abcd") for _ in range(rng.randint(1, 7))),
            rng.randint(1, 20),
        )
        for _ in range(60)
    ]
    merges = train_bpe_on_counts(counts, num_merges=15)
    ranks = {tuple(m): i for i, m in enumerate(merges)}
    for w, _ in counts:
        seg = segment_word(w, ranks)
        assert "".join(seg) == w  # lossless
        assert seg == model_segment(w, merges)  # greedy == replay


def test_handcrafted_first_merges():
    counts = [("aaab", 10), ("aab", 5), ("b", 3)]
    # pair counts round 1: (a,a): 10*2+5 = 25, (a,b): 15 -> merge (a,a)
    merges = train_bpe_on_counts(counts, 2)
    assert merges[0] == ("a", "a")
    # round 2: words now (aa,a,b):10, (aa,b):5, (b):3 ->
    # (aa,a):10, (a,b):10, (aa,b):5 -> tie 10/10 broken by greater pair
    assert merges[1] == ("aa", "a")


@pytest.mark.spark
def test_spark_bpe_partitioning_invariant(spark):
    docs = spark.read.parquet(
        "/root/testdata/sf0.001/documents.parquet"
    ).select("doc_id", "text")
    m1 = train_bpe(word_counts(docs), num_merges=30)
    m2 = train_bpe(word_counts(docs.repartition(13)), num_merges=30)
    assert m1 == m2 and len(m1) == 30
    out = {
        r["doc_id"]: (r["n_words"], r["n_bpe_tokens"])
        for r in apply_bpe(docs, m1).collect()
    }
    # merges compress: tokens per doc strictly below characters, at or
    # above word count
    for d, (nw, nt) in out.items():
        assert nt >= nw
    # spot-check one doc against the pure-Python path
    row = docs.where("doc_id = 3").collect()[0]
    from dhtmlparser3_spark.functions.textops import token_list

    ranks = {tuple(m): i for i, m in enumerate(m1)}
    want = sum(len(segment_word(w, ranks)) for w in token_list(row["text"]))
    assert out[3][1] == want


@pytest.mark.spark
def test_spark_bpe_plans(spark):
    docs = spark.createDataFrame(
        [(i, "aa ab aa ba") for i in range(20)], "doc_id int, text string"
    )
    wc = word_counts(docs)
    plan = wc._jdf.queryExecution().executedPlan().toString()
    assert plan.count("Exchange") == 1, plan  # one corpus-scale shuffle
    merges = train_bpe(wc, num_merges=5)
    aplan = apply_bpe(docs, merges)._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in aplan, aplan  # apply is map-only
    assert "ArrowEvalPython" in aplan, aplan


@pytest.mark.spark
def test_top_words_cut_deterministic_on_ties(spark):
    """The top-K collect orders by (n desc, word), so a count tie
    straddling the cut is resolved identically on every partitioning —
    the cross-cluster-determinism claim at its sharpest point."""
    rows = [("aa", 5), ("ab", 5), ("ac", 5), ("ad", 5), ("ae", 5)]
    base = spark.createDataFrame(rows, "word string, n long")
    m1 = train_bpe(base, num_merges=4, top_words=3)
    m2 = train_bpe(base.repartition(7), num_merges=4, top_words=3)
    m3 = train_bpe(base.orderBy(F.rand(42)), num_merges=4, top_words=3)
    assert m1 == m2 == m3
    # the cut keeps aa/ab/ac (lexicographic among equal counts): every
    # merge's joined symbols must come from those words only
    kept_chars = set("aabc")
    for a, b in m1:
        assert set(a + b) <= kept_chars, (a, b)
