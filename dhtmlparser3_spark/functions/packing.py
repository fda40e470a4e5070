"""Training-sequence packing: concat-and-chunk over a deterministic doc order.

The standard LM pretraining feed concatenates documents (in a fixed order)
into one token stream and slices it into fixed-length sequences; a document
can straddle a sequence boundary.  Assigning docs to sequences needs each
doc's GLOBAL token offset — an exclusive prefix sum over the whole corpus.

The naive Spark form is ``sum().over(Window.orderBy(doc_id))`` with no
partitionBy: a SINGLE-partition window that funnels 10^12 rows through one
task.  This module computes the same prefix sum hierarchically, the way a
cluster must:

1. docs are bucketed by ``doc_id`` range (dense ids → uniform buckets, no
   sampling nondeterminism, unlike repartitionByRange);
2. a per-bucket window (parallel — partitionBy(bucket)) gives the local
   exclusive cumsum;
3. bucket subtotals — #buckets rows, corpus_size/bucket_docs — get their own
   exclusive cumsum on the tiny side and are BROADCAST-joined back.

Total cost: one parallel window + one map-side aggregate + one broadcast
join; nothing global ever shuffles.  At 10^12 docs with bucket_docs=2^20
the subtotal table is ~10^6 rows — still driver-trivial; a third level of
the same construction covers anything bigger.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from dhtmlparser3_spark.functions.textops import tokens_col


def global_offsets(
    docs: DataFrame,
    id_col: str = "doc_id",
    size_col: str = "n_tok",
    bucket_docs: int = 4096,
) -> DataFrame:
    """Add ``offset`` = exclusive prefix sum of ``size_col`` in ``id_col``
    order, via the two-level construction above."""
    d = docs.withColumn("bucket", F.floor(F.col(id_col) / bucket_docs))
    w_local = (
        Window.partitionBy("bucket")
        .orderBy(id_col)
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    d = d.withColumn(
        "_local_before", F.coalesce(F.sum(size_col).over(w_local), F.lit(0))
    )
    totals = d.groupBy("bucket").agg(F.sum(size_col).alias("_btot"))
    # exclusive cumsum over the TINY subtotal table (≤ corpus/bucket_docs
    # rows); single-partition window is deliberate and bounded here
    w_bucket = Window.orderBy("bucket").rowsBetween(Window.unboundedPreceding, -1)
    offsets = totals.select(
        "bucket",
        F.coalesce(F.sum("_btot").over(w_bucket), F.lit(0)).alias("_boff"),
    )
    return (
        d.join(F.broadcast(offsets), "bucket")
        .withColumn("offset", (F.col("_boff") + F.col("_local_before")).cast("long"))
        .drop("bucket", "_local_before", "_boff")
    )


def pack_assignments(
    docs: DataFrame,
    seq_len: int = 128,
    id_col: str = "doc_id",
    text_col: str = "text",
    bucket_docs: int = 4096,
) -> DataFrame:
    """(doc_id, n_tok, offset, pack_id, n_toks_in_pack) — one row per
    (document, training sequence) it contributes tokens to.

    A doc spanning tokens [offset, offset+n_tok) feeds packs
    floor(offset/L) … floor((offset+n_tok-1)/L); boundary docs appear in
    several rows with the token split recorded.
    """
    sized = docs.select(
        F.col(id_col), F.size(tokens_col(text_col)).cast("long").alias("n_tok")
    ).where(F.col("n_tok") > 0)
    d = global_offsets(sized, id_col=id_col, bucket_docs=bucket_docs)
    first = F.floor(F.col("offset") / seq_len)
    last = F.floor((F.col("offset") + F.col("n_tok") - 1) / seq_len)
    e = d.select(
        id_col,
        "n_tok",
        "offset",
        F.explode(F.sequence(first, last)).alias("pack_id"),
    )
    lo = F.greatest(F.col("pack_id") * seq_len, F.col("offset"))
    hi = F.least((F.col("pack_id") + 1) * seq_len, F.col("offset") + F.col("n_tok"))
    return e.withColumn("n_toks_in_pack", (hi - lo).cast("long"))


def pack_summary(
    docs: DataFrame, seq_len: int = 128, **kw
) -> DataFrame:
    """Per-sequence roll-up: (pack_id, n_docs, n_tokens, min_doc, max_doc).
    Every pack holds exactly ``seq_len`` tokens except the final partial
    one — the invariant the oracle asserts corpus-wide."""
    a = pack_assignments(docs, seq_len=seq_len, **kw)
    return a.groupBy("pack_id").agg(
        F.count("*").alias("n_docs"),
        F.sum("n_toks_in_pack").alias("n_tokens"),
        F.min(a.columns[0]).alias("min_doc"),
        F.max(a.columns[0]).alias("max_doc"),
    )
