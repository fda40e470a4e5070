"""Incremental LSH dedup (dedup.lsh_index / incremental_lsh_pairs).

The production-common operation at 10^12 docs: a crawl increment probes
the STORED corpus index instead of re-pairing the corpus.  Correctness
rests on one identity — banding is deterministic per doc, so (uncapped)

    pairs(old ∪ new) == pairs(old) ∪ pairs(new) ∪ incremental(new, index(old))

— which this file pins on a corpus with near-dups deliberately crossing
the old/new boundary, plus the plan contract (equi-join probe, no
cartesian, no corpus re-shingling on the increment run).
"""

from __future__ import annotations

import contextlib
import io

import pytest
from pyspark.sql import functions as F

from dhtmlparser3_spark.functions.dedup import (
    incremental_lsh_pairs,
    lsh_index,
    minhash_lsh_pairs,
    shingle_arrays,
)

VOCAB = "alpha beta gamma delta epsilon zeta eta theta iota kappa".split()


def _doc(seed: int, drop: int = None) -> str:
    toks = [VOCAB[(seed * 3 + j) % len(VOCAB)] for j in range(24)]
    if drop is not None:
        toks = toks[:drop] + toks[drop + 2 :]
    return " ".join(toks)


def _corpus(spark):
    """old: originals; new: near-dup variants of half of them (cross-
    boundary pairs) + fresh docs + an internal new-new near-dup pair."""
    old_rows = [(i, _doc(i)) for i in range(10)]
    new_rows = [(100 + i, _doc(i, drop=5)) for i in range(5)]  # cross dups
    new_rows += [(200 + i, _doc(50 + i)) for i in range(3)]  # fresh
    new_rows += [(300, _doc(70)), (301, _doc(70, drop=9))]  # new-new pair
    old = spark.createDataFrame(old_rows, "doc_id int, text string")
    new = spark.createDataFrame(new_rows, "doc_id int, text string")
    return old, new


@pytest.mark.spark
def test_incremental_identity(spark):
    old, new = _corpus(spark)
    both = old.unionByName(new)
    kw = dict(n=3, tau_pct=60, bucket_cap=None)

    def pairs(df):
        return {
            (r["a_id"], r["b_id"], r["jacc_pct"])
            for r in minhash_lsh_pairs(df, **kw).collect()
        }

    batch = pairs(both)
    old_only = pairs(old)
    new_only = pairs(new)
    bands, arrays = lsh_index(old)
    arrays = arrays.persist()
    inc = {
        # batch emits pairs with a_id < b_id; incremental is (new, old) —
        # normalize to the sorted orientation for comparison
        (min(r["a_id"], r["b_id"]), max(r["a_id"], r["b_id"]), r["jacc_pct"])
        for r in incremental_lsh_pairs(new, bands, arrays, n=3, tau_pct=60).collect()
    }
    assert batch == old_only | new_only | inc
    assert inc  # cross-boundary dups really exist
    assert new_only  # and so does the new-new pair
    arrays.unpersist()


@pytest.mark.spark
def test_incremental_probe_plan(spark):
    """The probe is an equi-join on (band, sig) — no cartesian product —
    and the increment run contains exactly ONE shingle UDF evaluation
    (the increment's); the stored index contributes scans, not a
    re-shingling of the corpus."""
    old, new = _corpus(spark)
    bands, arrays = lsh_index(old)
    # simulate a published index: materialized tables, not lazy plans
    bands = spark.createDataFrame(bands.collect(), bands.schema)
    arrays = spark.createDataFrame(arrays.collect(), arrays.schema)
    out = incremental_lsh_pairs(new, bands, arrays)
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "CartesianProduct" not in plan, plan
    assert "BroadcastNestedLoopJoin" not in plan, plan
    # every Python-stage occurrence in the tree text must be part of a
    # cached relation's description (same heuristic as test_plan_shapes.
    # _assert_udf_only_behind_cache): the increment's persisted shingle
    # pass is the ONLY Python stage — the index side contributes local
    # table scans, never a re-shingling of the corpus
    n_arrow = plan.count("ArrowEvalPython") + plan.count("MapInArrow")
    n_cached = plan.count("InMemoryRelation")
    assert n_arrow == n_cached, plan
    assert plan.count("InMemoryTableScan") >= 2, plan


@pytest.mark.spark
def test_incremental_verify_uses_stored_arrays(spark):
    """jacc_pct must come from exact shingle intersection with the STORED
    arrays — corrupt them and the verified output must change."""
    old, new = _corpus(spark)
    bands, arrays = lsh_index(old)
    good = incremental_lsh_pairs(new, bands, arrays.persist()).count()
    poisoned = arrays.select(
        "doc_id", F.slice("shs", 1, 2).alias("shs")
    )
    bad = incremental_lsh_pairs(new, bands, poisoned).count()
    assert good > 0 and bad < good
    arrays.unpersist()
