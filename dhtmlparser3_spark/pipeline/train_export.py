"""Training-export composition: sample → split → pack, one declarative plan.

The last mile of a training-data pipeline: downsample sources to the target
mixture, assign deterministic train/val splits, and pack each split's
documents into fixed-length training sequences.  Every stage is an already-
oracled operator (quality_filters.mixture_sample, textops.split_assignment,
packing.pack_summary); the composition chains them WITHOUT materialization
— sampling and split assignment are pure codegen expressions that fuse into
the packing stage's first window pass.

Scale notes: the sample filter drops rows before anything shuffles; packing
runs per-split via the two-level prefix sum (packing.py — parallel bucket
windows, broadcast subtotals), so adding the split dimension adds zero
single-partition state.  A near-dup sweep (graph.dedup_clusters anti-join)
slots between sample and split when the corpus needs it; kept out of this
composition so the oracle stays one window chain.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from dhtmlparser3_spark.functions.packing import pack_summary
from dhtmlparser3_spark.functions.quality_filters import mixture_keep_col
from dhtmlparser3_spark.functions.textops import split_assignment_col


def train_export(
    docs: DataFrame,
    seq_len: int = 128,
    base_pct: int = 20,
    train_pct: int = 90,
) -> DataFrame:
    """(split, pack_id, n_docs, n_tokens) — packed sequence inventory of the
    sampled corpus, train and val packed as independent streams."""
    # the keep decision is a pure expression of columns docs already has,
    # so it fuses as a where() — a semi-join back against mixture_sample
    # would scan docs twice and pay an exchange for nothing
    sampled = docs.where(mixture_keep_col(base_pct=base_pct))
    tagged = sampled.withColumn(
        "split", split_assignment_col("text", train_pct=train_pct)
    )
    parts = []
    for split in ("train", "val"):
        part = tagged.where(F.col("split") == split).select("doc_id", "text")
        parts.append(
            pack_summary(part, seq_len=seq_len)
            .withColumn("split", F.lit(split))
            .select("split", "pack_id", "n_docs", "n_tokens")
        )
    return parts[0].unionByName(parts[1])
