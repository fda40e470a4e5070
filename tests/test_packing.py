"""Sequence packing: hierarchical prefix sum == flat cumsum, boundary-doc
splits, and the physical-plan guarantee (no corpus-wide single-partition
window)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from dhtmlparser3_spark.functions.packing import (
    global_offsets,
    pack_assignments,
    pack_summary,
)


def _docs(spark, sizes, start_id=0, id_gap=1):
    rows = [(start_id + i * id_gap, " ".join(["w"] * n)) for i, n in enumerate(sizes)]
    return spark.createDataFrame(rows, "doc_id long, text string")


@pytest.mark.spark
def test_global_offsets_match_flat_cumsum(spark):
    sizes = [5, 1, 7, 3, 12, 2, 9, 4, 6, 8]
    # tiny buckets force several levels of subtotals to actually engage
    d = _docs(spark, sizes, start_id=10, id_gap=3)
    out = {
        r["doc_id"]: r["offset"]
        for r in global_offsets(
            d.withColumn("n_tok", F.size(F.split("text", " "))), bucket_docs=7
        ).collect()
    }
    acc, want = 0, {}
    for i, n in enumerate(sizes):
        want[10 + i * 3] = acc
        acc += n
    assert out == want


@pytest.mark.spark
def test_boundary_doc_splits_across_packs(spark):
    # L=10; doc sizes 6, 8 → doc 1 spans tokens [6,14): packs 0 (4 toks)
    # and 1 (4 toks)
    d = _docs(spark, [6, 8])
    rows = sorted(
        (r["doc_id"], r["pack_id"], r["n_toks_in_pack"])
        for r in pack_assignments(d, seq_len=10, bucket_docs=1).collect()
    )
    assert rows == [(0, 0, 6), (1, 0, 4), (1, 1, 4)]


@pytest.mark.spark
def test_pack_summary_invariants(spark):
    sizes = [17, 3, 40, 1, 1, 25, 9, 130, 2]
    d = _docs(spark, sizes)
    packs = sorted(
        (r["pack_id"], r["n_tokens"], r["n_docs"])
        for r in pack_summary(d, seq_len=32, bucket_docs=2).collect()
    )
    total = sum(sizes)
    assert [p for p, _, _ in packs] == list(range(len(packs)))
    assert all(t == 32 for _, t, _ in packs[:-1])
    assert packs[-1][1] == total - 32 * (len(packs) - 1)
    assert sum(t for _, t, _ in packs) == total


@pytest.mark.spark
def test_no_corpus_wide_single_partition_window(spark):
    d = _docs(spark, [4] * 50)
    plan = global_offsets(
        d.withColumn("n_tok", F.size(F.split("text", " "))), bucket_docs=8
    )._jdf.queryExecution().executedPlan().toString()
    # every window over the doc side must be partitioned by bucket; the only
    # SinglePartition exchange allowed is the tiny bucket-subtotal side
    import re

    windows = [ln for ln in plan.splitlines() if "Window" in ln and "bucket" not in ln]
    assert all("windowspecdefinition(doc_id" not in ln.lower() for ln in windows), plan
    assert plan.count("SinglePartition") <= 1, plan
