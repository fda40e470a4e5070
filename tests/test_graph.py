"""Connected-components (large-star/small-star) vs a pure-Python union-find
oracle on adversarial toy graphs, plus the dedup_clusters contract."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from dhtmlparser3_spark.functions.graph import connected_components, dedup_clusters


def _uf_components(pairs):
    parent = {}

    def find(x):
        while parent.setdefault(x, x) != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for a, b in pairs:
        parent[find(a)] = find(b)
    return {n: min(m for m in parent if find(m) == find(n)) for n in parent}


GRAPHS = {
    "chains_and_pairs": [(1, 2), (2, 3), (3, 4), (10, 11), (20, 21)]
    + [(i, i + 1) for i in range(30, 39)],
    # worst case for plain label propagation: one long path (diameter = n)
    "long_path": [(i, i + 1) for i in range(100, 140)],
    # star already, plus reversed-id star (max as center)
    "stars": [(50, i) for i in range(51, 60)] + [(i, 70) for i in range(61, 70)],
    # dense clique + bridge + duplicate/self-noise edges
    "clique_bridge": [(a, b) for a in range(200, 205) for b in range(a + 1, 205)]
    + [(204, 210), (210, 211), (7, 7), (3, 2)],
}


@pytest.mark.spark
@pytest.mark.parametrize("name", sorted(GRAPHS))
def test_connected_components_vs_union_find(spark, name):
    pairs = GRAPHS[name]
    df = spark.createDataFrame(pairs, "a_id long, b_id long")
    got = {
        r["node"]: r["comp"] for r in connected_components(df).collect()
    }
    want = _uf_components([(a, b) for a, b in pairs if a != b])
    assert got == want


@pytest.mark.spark
def test_dedup_clusters_keep_flag(spark):
    df = spark.createDataFrame([(5, 9), (9, 2), (11, 12)], "a_id long, b_id long")
    rows = {r["doc_id"]: r for r in dedup_clusters(df).collect()}
    assert {d: r["cluster_id"] for d, r in rows.items()} == {
        2: 2, 5: 2, 9: 2, 11: 11, 12: 11,
    }
    assert [d for d, r in sorted(rows.items()) if r["keep"] == 1] == [2, 11]
    # exactly one survivor per cluster
    assert sum(r["keep"] for r in rows.values()) == 2


@pytest.mark.spark
def test_connected_components_converges_on_path_within_log_rounds(spark):
    # the documented O(log n) property: a 64-node path must converge well
    # under the 30-round cap (plain label propagation would need ~64)
    pairs = [(i, i + 1) for i in range(64)]
    df = spark.createDataFrame(pairs, "a_id long, b_id long")
    out = connected_components(df, max_iter=12).groupBy("comp").count().collect()
    assert len(out) == 1 and out[0]["count"] == 65 and out[0]["comp"] == 0
