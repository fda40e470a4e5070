"""Distributed graph machinery for dedup-cluster resolution.

Near-dup PAIRS (minhash_lsh_pairs / simhash_pairs / jaccard_pairs) are only
half of deduplication: a real curation pipeline must resolve pairs into
CLUSTERS (transitive closure — A~B, B~C puts A,C in one group even when
A~C is below threshold) and then keep one canonical document per cluster.

``connected_components`` implements the alternating large-star / small-star
algorithm (Kiveris et al., "Connected Components in MapReduce and Beyond",
SoCC 2014): O(log² n) rounds worst-case (≈ log n in practice), each round a
bounded number of shuffles on the EDGE list only — no adjacency matrix, no
per-node driver state.  This is the published scale-out CC algorithm, chosen
over plain min-label propagation whose round count is the graph DIAMETER
(adversarial dup chains — page1~page2~…~pageK from near-identical template
churn — make diameter O(n); star contraction collapses such chains
logarithmically).

Scale shape per round: groupBy(u).min(v) (map-side partial agg on the edge
list) + one shuffle-join of edges to their per-node minimum.  Edge count
never grows: each star step only re-points existing edges at smaller node
ids.  Convergence is detected with ONE bounded driver action per round
(count + order-insensitive checksum), the same deliberate-small-state
pattern as the IVF codebook collect (similarity.py).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def _canon(edges: DataFrame) -> DataFrame:
    """Orient every edge (big, small), drop self-loops, dedup."""
    u, v = F.col("u"), F.col("v")
    return (
        edges.where(u != v)
        .select(
            F.greatest(u, v).alias("u"),
            F.least(u, v).alias("v"),
        )
        .distinct()
    )


def _large_star(edges: DataFrame) -> DataFrame:
    """Connect every strictly-larger neighbor of u to min(Γ(u) ∪ {u})."""
    bi = edges.union(edges.select(F.col("v").alias("u"), F.col("u").alias("v")))
    mins = bi.groupBy("u").agg(F.min("v").alias("mn"))
    m = F.least(F.col("u"), F.col("mn"))
    return _canon(
        bi.join(mins, "u")
        .where(F.col("v") > F.col("u"))
        .select(F.col("v").alias("u"), m.alias("v"))
    )


def _small_star(edges: DataFrame) -> DataFrame:
    """Connect every smaller-or-equal neighbor of u (edges already oriented
    big→small, so Γ(u) here = smaller neighbors) to min(Γ(u))."""
    mins = edges.groupBy("u").agg(F.min("v").alias("m"))
    j = edges.join(mins, "u")
    # (v, m) for every neighbor, plus the center (u, m)
    re_pointed = j.select(F.col("v").alias("u"), F.col("m").alias("v"))
    center = j.select("u", F.col("m").alias("v")).distinct()
    return _canon(re_pointed.union(center))


def _persistent_rdd_ids(spark) -> set:
    """Ids of currently-persisted RDDs (includes localCheckpoint blocks,
    which spark.catalog.clearCache() does NOT touch)."""
    jmap = spark.sparkContext._jsc.getPersistentRDDs()
    it = jmap.keySet().iterator()
    ids = set()
    while it.hasNext():
        ids.add(it.next())
    return ids


def _unpersist_rdds(spark, ids) -> None:
    """Eagerly drop the given persisted RDDs (non-blocking)."""
    jmap = spark.sparkContext._jsc.getPersistentRDDs()
    for rid in ids:
        jrdd = jmap.get(rid)
        if jrdd is not None:
            jrdd.unpersist(False)


def connected_components(
    pairs: DataFrame,
    a_col: str = "a_id",
    b_col: str = "b_id",
    max_iter: int = 30,
) -> DataFrame:
    """(node, comp) for every node appearing in ``pairs``; ``comp`` is the
    minimum node id of the connected component.

    One bounded driver action per round for the convergence test.  Each
    round's localCheckpoint pins its edge-list blocks in the storage pool;
    once round k is materialized (eager=True), round k-1's blocks are
    unreachable from any live plan, so they are unpersisted EAGERLY via
    the persistent-RDD map rather than left to the GC-driven
    ContextCleaner.  At 10^12 docs the per-round edge list is TBs of
    executor storage — holding every round simultaneously is an OOM, and
    in shared sessions the leaked blocks were measurably slowing LATER
    queries (round-5 A/B: jaccard_pairs interleaved with dedup_clusters
    reps read min 8.0 s with the leak vs 5.5 s decomposed; clearCache()
    cannot reclaim checkpoint blocks).  Only blocks created by THIS loop
    are touched — caller caches are fenced by id-set differencing (NOT
    safe against a concurrent CC loop in the same session: id-diffing
    would claim the other loop's in-flight blocks; run such loops
    sequentially or via reliable checkpoint()).  A 10^12-doc run should
    additionally use reliable checkpoint() to object storage, which also
    survives executor loss.
    """
    spark = pairs.sparkSession
    fenced = _persistent_rdd_ids(spark)  # caller-owned: never touch
    # Iterative jobs MUST truncate lineage each round: an unbroken chain of
    # K rounds re-analyzes a plan that doubles per round (union + self-join)
    # and the driver's planning time, not the data, becomes the bottleneck.
    # localCheckpoint(eager) materializes the round and restarts the plan
    # from the materialized blocks; on a real cluster prefer reliable
    # checkpoint() to HDFS/object storage so executor loss cannot kill a
    # late round.
    edges = _canon(
        pairs.select(F.col(a_col).alias("u"), F.col(b_col).alias("v"))
    ).localCheckpoint(eager=True)
    owned = _persistent_rdd_ids(spark) - fenced  # this round's blocks
    prev_sig = None
    for _ in range(max_iter):
        edges = _small_star(_large_star(edges)).localCheckpoint(eager=True)
        live = _persistent_rdd_ids(spark)
        _unpersist_rdds(spark, owned)  # previous round: now unreachable
        owned = live - fenced - owned
        row = edges.agg(
            F.count("*").alias("n"),
            F.expr("bit_xor(xxhash64(u, v))").alias("chk"),
        ).collect()[0]
        sig = (row["n"], row["chk"])
        if sig == prev_sig:
            break
        prev_sig = sig
    # at the star fixpoint every edge is (member, component-min)
    return (
        edges.select(F.col("u").alias("node"), F.col("v").alias("comp"))
        .union(edges.select(F.col("v").alias("node"), F.col("v").alias("comp")))
        .groupBy("node")
        .agg(F.min("comp").alias("comp"))
    )


def dedup_clusters(pairs: DataFrame) -> DataFrame:
    """Resolve near-dup pairs into clusters: (doc_id, cluster_id, keep).

    ``cluster_id`` = min doc_id of the component (the canonical survivor a
    keep-one-per-cluster pass retains); ``keep`` = 1 for that survivor.
    Anti-joining ``keep = 0`` rows against the corpus is the standard
    near-dup sweep a curation pipeline runs after the exact-dedup window
    (curate.py); the driver query ``dedup_clusters`` pins it against a
    recursive-CTE transitive-closure oracle.
    """
    cc = connected_components(pairs)
    return cc.select(
        F.col("node").alias("doc_id"),
        F.col("comp").alias("cluster_id"),
        (F.col("node") == F.col("comp")).cast("int").alias("keep"),
    )
