"""BPE vocabulary training and application (Sennrich et al. 2016).

The tokenizer-training tier of a training-data pipeline, decomposed the
way the algorithm actually scales:

* the ONLY corpus-scale pass is ``word_counts`` — explode whitespace
  tokens, one hash-aggregate (map-side partials), one shuffle of
  (word, int64) rows.  At 10^12 docs the distinct-word table is ~10^8
  rows — corpus-size-INDEPENDENT up to vocabulary growth, which is why
  every practical BPE trainer (subword-nmt, HF tokenizers) trains on the
  word-frequency dict, not the corpus;
* ``train_bpe`` then runs the classic merge loop driver-side over the
  top-K word table (bounded collect — K rows of a few bytes; the loop is
  pure Python and touches no Spark).  Merges are fully deterministic:
  ties on pair count break on the lexicographically greatest pair, so
  two clusters training on the same counts emit identical merge lists
  regardless of partitioning or reduction order;
* ``apply_bpe`` re-enters Spark as ONE map-only Arrow-batched UDF with
  the merge ranks in its closure (a broadcast-sized list) — no shuffle,
  no joins; segmentation is per-word (merges never cross whitespace) so
  any partitioning of the corpus gives identical output.

Not a reference operator (dhtmlparser3 stops at the parse producing the
text); this consumes extracted text downstream.  Symbols are the word's
characters with no end-of-word marker (merges are word-internal;
documented divergence from subword-nmt's </w> convention — the marker
only matters for detokenization, which this pipeline does not do).
"""

from __future__ import annotations

from typing import Dict, List, Sequence, Tuple

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from dhtmlparser3_spark.functions.textops import tokens_col

Pair = Tuple[str, str]


def word_counts(df: DataFrame, text_col: str = "text") -> DataFrame:
    """(word, n) over the corpus — the one corpus-scale pass."""
    return (
        df.select(F.explode(tokens_col(text_col)).alias("word"))
        .groupBy("word")
        .agg(F.count("*").alias("n"))
    )


def _merge_word(w: Tuple[str, ...], pair: Pair) -> Tuple[str, ...]:
    """One left-to-right pass replacing adjacent ``pair`` with its join."""
    out: List[str] = []
    i = 0
    while i < len(w):
        if i + 1 < len(w) and (w[i], w[i + 1]) == pair:
            out.append(w[i] + w[i + 1])
            i += 2
        else:
            out.append(w[i])
            i += 1
    return tuple(out)


def train_bpe_on_counts(
    counts: Sequence[Tuple[str, int]], num_merges: int
) -> List[Pair]:
    """The merge loop on an in-memory (word, count) table.

    Each round counts weighted adjacent-symbol pairs across the word
    table and merges the most frequent (ties → lexicographically
    greatest pair: max over (count, pair) tuples — any total order works,
    it just has to be one)."""
    words: Dict[Tuple[str, ...], int] = {}
    for w, c in counts:
        if w:
            t = tuple(w)
            words[t] = words.get(t, 0) + int(c)
    merges: List[Pair] = []
    for _ in range(num_merges):
        pairs: Dict[Pair, int] = {}
        for w, c in words.items():
            for a, b in zip(w, w[1:]):
                pairs[(a, b)] = pairs.get((a, b), 0) + c
        if not pairs:
            break
        best = max(pairs.items(), key=lambda kv: (kv[1], kv[0]))[0]
        merges.append(best)
        new_words: Dict[Tuple[str, ...], int] = {}
        for w, c in words.items():
            m = _merge_word(w, best)
            new_words[m] = new_words.get(m, 0) + c
        words = new_words
    return merges


def train_bpe(
    wc: DataFrame, num_merges: int = 100, top_words: int = 1_000_000
) -> List[Pair]:
    """Collect the top-K word-frequency rows (bounded: K rows; the
    broadcastable model precedent) and run the driver-side merge loop.
    Deterministic cut: order by (n desc, word) so equal-count words at
    the boundary are taken identically on every run/cluster."""
    rows = (
        wc.orderBy(F.col("n").desc(), F.col("word"))
        .limit(top_words)
        .collect()
    )
    return train_bpe_on_counts([(r["word"], r["n"]) for r in rows], num_merges)


def segment_word(word: str, ranks: Dict[Pair, int]) -> List[str]:
    """Apply ranked merges to one word (greedy lowest-rank-first — the
    standard BPE apply; identical result to replaying merges in order)."""
    sym = list(word)
    while len(sym) > 1:
        best_rank = None
        best_i = -1
        for i in range(len(sym) - 1):
            r = ranks.get((sym[i], sym[i + 1]))
            if r is not None and (best_rank is None or r < best_rank):
                best_rank, best_i = r, i
        if best_rank is None:
            break
        sym[best_i : best_i + 2] = [sym[best_i] + sym[best_i + 1]]
    return sym


def apply_bpe(
    df: DataFrame,
    merges: Sequence[Pair],
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """(id, n_words, n_bpe_tokens) — ONE map-only Arrow-batched stage.

    The merge ranks ride the UDF closure (broadcast-sized); segmentation
    is per-word so the result is independent of partitioning.  Returns
    counts (the training-pipeline consumable); the token arrays
    themselves stay worker-side."""
    from pyspark.sql.functions import pandas_udf

    ranks = {tuple(m): i for i, m in enumerate(merges)}

    @pandas_udf("struct<n_words:int,n_bpe_tokens:int>")
    def _seg(texts):
        import pandas as pd

        from dhtmlparser3_spark.functions.textops import token_list

        out_w, out_t = [], []
        for t in texts:
            toks = token_list(t or "")
            out_w.append(len(toks))
            out_t.append(sum(len(segment_word(w, ranks)) for w in toks))
        return pd.DataFrame({"n_words": out_w, "n_bpe_tokens": out_t})

    return df.select(
        F.col(id_col),
        _seg(F.col(text_col)).alias("s"),
    ).select(
        id_col,
        F.col("s.n_words").alias("n_words"),
        F.col("s.n_bpe_tokens").alias("n_bpe_tokens"),
    )
