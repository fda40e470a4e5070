"""Embedding similarity search: brute-force cosine top-k + LSH-bucketed ANN.

Brute path (the exactness baseline and the oracle-checked query):
queries (a small filtered set) are BROADCAST against the corpus — one pass,
no shuffle of the big side; per-query top-k via window rank.  All arithmetic
in float64 with a deterministic left-to-right fold (F.aggregate) so the
DuckDB oracle reproduces the ordering.

ANN path (the 100 TB shape): 16 deterministic random hyperplanes (md5-seeded,
no RNG state) → sign-bit bucket key → candidates share the bucket → top-k
within bucket.  Probed with multi-bucket lookup (flip one bit) to lift
recall.  No SQL oracle (approximate by nature); recall vs brute force is
pinned in pytest instead.
"""

from __future__ import annotations

import hashlib
import struct as _struct

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from dhtmlparser3_spark.functions.dedup import DEFAULT_BUCKET_CAP, cap_buckets


def _as_double(col):
    return F.transform(col, lambda x: x.cast("double"))


def dot_col(a, b):
    """Deterministic sequential dot product (zip_with then left fold)."""
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x * y),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )


def norm_col(a):
    return F.sqrt(
        F.aggregate(a, F.lit(0.0), lambda acc, x: acc + x * x)
    )


def cosine_topk(
    emb: DataFrame,
    k: int = 5,
    query_mod: int = 50,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Exact top-k cosine neighbors for query vectors (vec_id % query_mod == 0).

    Plan shape: broadcast(queries) × corpus → codegen'd fold per pair →
    window rank per query.  At 10^12 scale the corpus side stays partitioned,
    only the query side is broadcast, and the window is per-query-partition
    (no global sort).
    """
    # norms are computed ONCE PER ROW on each side BEFORE the join — the
    # interpreted dim-step fold inside the pair projection would re-fold
    # the same query norm once per corpus row (Q×N extra folds);
    # numerically identical: same left-to-right fold, evaluated earlier
    base = emb.select(
        F.col(id_col).alias("nid"), _as_double(F.col(vec_col)).alias("v")
    ).withColumn("vn", norm_col(F.col("v")))
    queries = (
        emb.where(F.col(id_col) % query_mod == 0)
        .select(
            F.col(id_col).alias("qid"), _as_double(F.col(vec_col)).alias("q")
        )
        .withColumn("qn", norm_col(F.col("q")))
    )
    pairs = base.crossJoin(F.broadcast(queries)).where(F.col("qid") != F.col("nid"))
    sim = (dot_col(F.col("q"), F.col("v")) / (F.col("qn") * F.col("vn"))).alias("sim")
    scored = pairs.select("qid", "nid", sim)
    w = Window.partitionBy("qid").orderBy(F.col("sim").desc(), F.col("nid").asc())
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= k)
        .select(
            F.col("qid").alias("query_id"),
            F.col("nid").alias("neighbor_id"),
            F.col("rank").cast("int").alias("rank"),
        )
    )


EMB_DUP_MOD = 9
EMB_DUP_OFFSET = 1_000_000
EMB_DUP_EPS = 0.05


def embedding_dup_corpus(emb: DataFrame, id_col: str = "vec_id", vec_col: str = "embedding") -> DataFrame:
    """embeddings ∪ deterministic near-dup copies: every (vec_id % 9 == 0)
    vector gets a copy perturbed by ±0.05 in a fixed index pattern —
    cosine ≈ 0.997 to its source, far above any natural pair (max ≈ 0.60
    in this corpus), so the τ=0.9 threshold has a wide numeric margin on
    both engines.  float32→double then double arithmetic is IEEE-exact in
    both Spark and DuckDB, so the constructed vectors are bit-identical."""
    base = emb.select(F.col(id_col).alias("vec_id"), F.col(vec_col).alias("embedding"))
    # same fixed-offset collision guard as dedup.dedup_corpus: a source
    # id at or above the offset would alias a synthesized copy
    max_id = base.agg(F.max("vec_id")).first()[0]
    if max_id is not None and max_id >= EMB_DUP_OFFSET:
        raise ValueError(
            f"embedding_dup_corpus: max vec_id {max_id} collides with "
            f"EMB_DUP_OFFSET {EMB_DUP_OFFSET}; raise the offset (and its "
            f"oracle mirror) for this corpus"
        )
    pert = base.where(F.col("vec_id") % EMB_DUP_MOD == 0).select(
        (F.col("vec_id") + EMB_DUP_OFFSET).alias("vec_id"),
        F.transform(
            "embedding",
            lambda x, i: x.cast("double") + F.lit(EMB_DUP_EPS) * ((i % 3) - 1),
        ).alias("embedding"),
    )
    return base.select(
        "vec_id", _as_double(F.col("embedding")).alias("embedding")
    ).unionByName(pert)


def _cosine_verify_pairs(corpus: DataFrame, cand: DataFrame, tau: float) -> DataFrame:
    """Exact cosine for candidate (a_id, b_id) pairs: two broadcast-shaped
    joins against the corpus (the candidate side is tiny — AQE broadcasts
    it), same deterministic left-fold arithmetic as the brute path so the
    surviving rows are bit-identical to brute force."""
    # one norm per corpus row BEFORE the joins (not per surviving pair)
    sided = corpus.withColumn("n", norm_col(F.col("embedding")))
    a = sided.select(
        F.col("vec_id").alias("a_id"),
        F.col("embedding").alias("a_v"),
        F.col("n").alias("a_n"),
    )
    b = sided.select(
        F.col("vec_id").alias("b_id"),
        F.col("embedding").alias("b_v"),
        F.col("n").alias("b_n"),
    )
    j = cand.join(a, "a_id").join(b, "b_id")
    sim = dot_col(F.col("a_v"), F.col("b_v")) / (
        F.col("a_n") * F.col("b_n")
    )
    return (
        j.select("a_id", "b_id", sim.alias("sim"))
        .where(F.col("sim") >= tau)
        .select(
            "a_id", "b_id", F.floor(100 * F.col("sim")).cast("int").alias("sim_pct")
        )
    )


def embedding_dup_pairs_brute(
    emb: DataFrame, tau: float = 0.9, id_col: str = "vec_id", vec_col: str = "embedding"
) -> DataFrame:
    """Embedding-cosine near-dup pairs, brute force: ALL pairs with cos ≥ τ.
    Quadratic in corpus size — the small-corpus baseline and the recall
    oracle for :func:`embedding_dup_pairs` (which is what ships)."""
    corpus = embedding_dup_corpus(emb, id_col, vec_col).withColumn(
        "n", norm_col(F.col("embedding"))
    )
    a = corpus.alias("a")
    b = corpus.alias("b")
    pairs = a.join(b, F.col("a.vec_id") < F.col("b.vec_id"))
    sim = dot_col(F.col("a.embedding"), F.col("b.embedding")) / (
        F.col("a.n") * F.col("b.n")
    )
    return (
        pairs.select(
            F.col("a.vec_id").alias("a_id"),
            F.col("b.vec_id").alias("b_id"),
            sim.alias("sim"),
        )
        .where(F.col("sim") >= tau)
        .select("a_id", "b_id", F.floor(100 * F.col("sim")).cast("int").alias("sim_pct"))
    )


def embedding_dup_pairs(
    emb: DataFrame,
    tau: float = 0.9,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    n_planes: int = 8,
    n_tables: int = 24,
    bucket_cap: int | None = DEFAULT_BUCKET_CAP,
    observation=None,
) -> DataFrame:
    """Embedding-cosine near-dup pairs — the SHIPPED operator: LSH-bucketed
    candidate generation + exact-cosine verification.

    Scale shape: one corpus scan computes all L bucket keys per vector in a
    single numpy matmul (``_bucket_udf``), candidates are pairs sharing any
    (table, bucket) — grouped per bucket so the quadratic step is bounded
    by bucket size — then the tiny candidate set is verified with the exact
    cosine (bit-identical arithmetic to the brute baseline).  Never
    materializes the O(n²) pair space the brute form joins through.

    Recall (defaults m=8 bits, L=24 tables; miss = (1-p^m)^L where
    p = 1-θ/π): the constructed dup corpus spans cos 0.944-0.997 — at the
    observed minimum (p≈0.894) a pair misses w.p. ≈ 4e-6, at a borderline
    τ=0.9 pair (p≈0.857) ≈ 3e-4.  L=24 (not 8) was tuned against the
    sf0.1 tier, where the 8-table config deterministically missed 2 of
    223 pairs at cos≈0.95 — near-dup LSH recall is probabilistic at the
    threshold boundary, so the table count must carry the margin.  The
    driver's DuckDB oracle IS the brute result, so any miss turns the
    correctness row red — recall is continuously audited, not assumed.
    ``bucket_cap``/``observation``: see dedup.cap_buckets (bounded task
    memory on degenerate corpora).
    """
    corpus = embedding_dup_corpus(emb, id_col, vec_col)
    dim = len(emb.select(vec_col).first()[0])
    planes = _hyperplanes(n_planes * n_tables, dim)
    buckets = _bucket_udf(planes, n_planes, n_tables)
    banded = corpus.select(
        "vec_id",
        F.posexplode_outer(buckets(F.col("embedding"))).alias("t", "b"),
    ).where(F.col("b").isNotNull())
    grouped = cap_buckets(
        banded.groupBy("t", "b")
        .agg(F.array_sort(F.collect_set("vec_id")).alias("ids"))
        .where(F.size("ids") > 1),
        "ids", bucket_cap, observation,
    )
    pairs = F.flatten(
        F.transform(
            "ids",
            lambda a, i: F.transform(
                F.slice("ids", i + 2, F.size("ids")),
                lambda b: F.struct(a.alias("a_id"), b.alias("b_id")),
            ),
        )
    )
    cand = (
        grouped.select(F.explode(pairs).alias("p"))
        .select(F.col("p.a_id").alias("a_id"), F.col("p.b_id").alias("b_id"))
        .distinct()
    )
    out = _cosine_verify_pairs(corpus, cand, tau)
    out._overflow_observation = grouped._overflow_observation
    out._overflow_truncating = grouped._overflow_truncating
    return out


def ivf_ann_topk(
    emb: DataFrame,
    k: int = 5,
    query_mod: int = 50,
    n_centroids: int = 16,
    n_probe: int = 8,
    n_assign: int = 2,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Approximate top-k via IVF (inverted-file) coarse quantization — the
    second scale path next to :func:`lsh_ann_topk`.

    * Coarse codebook: the ``n_centroids`` lowest-id vectors, L2-normalized
      (deterministic — no RNG, no k-means iterations; measured on this
      corpus a 10-iteration deterministic Lloyd refinement LOWERS recall —
      near-random embeddings collapse toward the mean without gaining
      cell selectivity; at production scale you would train the codebook
      offline and broadcast it identically).
    * Redundant assignment (spill-tree style): every corpus vector is
      posted to its ``n_assign`` nearest cells by cosine — one numpy
      matmul per Arrow batch (rows x dim @ dim x C).  On weakly-clustered
      corpora this is the lever that moves recall: a true neighbor that
      straddles a Voronoi boundary is reachable from both adjacent cells.
      Measured recall@5 at (16 cells, 8-probe, 2-assign):
      0.88 / 0.96 / 0.94 at sf0.001/0.01/0.1 vs 0.66 / 0.80 / 0.725 for
      the old (8, 4-probe, 1-assign) config, at candidate-scan fraction
      ~0.76 vs ~0.50 of the corpus per query (these synthetic embeddings
      are near-random — mean pairwise cos 0.002 — so ALL coarse indexes
      are weakly selective here; clustered production embeddings scan a
      far smaller fraction at the same recall).  Index storage is
      ``n_assign``× (each vector appears in ``n_assign`` cells).
    * Probing: each query searches its ``n_probe`` nearest cells; recall
      vs brute force is pinned in pytest AND by the driver's oracled
      ``ann_recall`` row (floor 85).
    * Join on cell id co-partitions candidates; only queries broadcast.
      A pair reachable via several shared cells is deduped on its slim
      (qid, nid, sim) projection before the per-query top-k window.
    """
    import numpy as np
    from pyspark.sql.functions import pandas_udf

    cents = [
        (r[0], list(r[1]))
        for r in emb.select(id_col, vec_col)
        .orderBy(id_col)
        .limit(n_centroids)
        .collect()
    ]
    C = [v for _, v in cents]

    def _cell_udf(probe: int):
        @pandas_udf("array<int>")
        def _cells(vecs):
            import pandas as pd

            M = np.asarray(C, dtype=np.float64)
            M /= np.linalg.norm(M, axis=1, keepdims=True)
            if len(vecs) == 0:
                return pd.Series([], dtype=object)
            V = np.asarray([np.asarray(v, dtype=np.float64) for v in vecs])
            Vn = V / np.maximum(np.linalg.norm(V, axis=1, keepdims=True), 1e-30)
            sims = Vn @ M.T  # rows x C
            order = np.argsort(-sims, axis=1, kind="stable")[:, :probe]
            return pd.Series([[int(c) for c in row] for row in order])

        return _cells

    base = emb.select(
        F.col(id_col).alias("nid"),
        _as_double(F.col(vec_col)).alias("v"),
        F.explode_outer(_cell_udf(n_assign)(F.col(vec_col))).alias("cell"),
    ).where(F.col("cell").isNotNull()).withColumn("vn", norm_col(F.col("v")))
    queries = emb.where(F.col(id_col) % query_mod == 0).select(
        F.col(id_col).alias("qid"),
        _as_double(F.col(vec_col)).alias("q"),
        F.explode_outer(_cell_udf(n_probe)(F.col(vec_col))).alias("cell"),
    ).where(F.col("cell").isNotNull()).withColumn("qn", norm_col(F.col("q")))
    cand = base.join(F.broadcast(queries), "cell").where(
        F.col("qid") != F.col("nid")
    )
    # norms folded once per row pre-join, not per candidate pair
    sim = (
        dot_col(F.col("q"), F.col("v")) / (F.col("qn") * F.col("vn"))
    ).alias("sim")
    # n_assign > 1 can surface the same (qid, nid) pair once per shared
    # cell; sim is a deterministic fold of the same two vectors, so the
    # slim 3-column distinct removes the duplicates bit-exactly BEFORE the
    # top-k window (a duplicate surviving to the window would burn a rank)
    scored = cand.select("qid", "nid", sim).distinct()
    w = Window.partitionBy("qid").orderBy(F.col("sim").desc(), F.col("nid").asc())
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= k)
        .select(
            F.col("qid").alias("query_id"),
            F.col("nid").alias("neighbor_id"),
            F.col("rank").cast("int").alias("rank"),
        )
    )


def _hyperplanes(n_planes: int, dim: int):
    """Deterministic pseudo-random unit-free hyperplanes from md5 — no RNG
    object, reproducible across workers and sessions."""
    planes = []
    for p in range(n_planes):
        row = []
        for d in range(dim):
            h = hashlib.md5(f"plane:{p}:{d}".encode()).digest()[:8]
            (u,) = _struct.unpack(">Q", h)
            row.append((u / float(1 << 64)) * 2.0 - 1.0)
        planes.append(row)
    return planes


def _bucket_udf(planes, n_planes: int, n_tables: int):
    """pandas_udf: embedding → array of L bucket ids, via ONE numpy matmul
    per Arrow batch.  The pure-Catalyst alternative (L*m dot_col folds) runs
    interpreted at ~ dim*L*m lambda evals per row — numpy does the whole
    batch as a (rows x dim) @ (dim x L*m) product.  Sign-bit bucketing is
    robust to summation-order rounding (a flipped bucket near a hyperplane
    only shifts recall marginally), so the UDF needs no fold-order parity
    with the exact-cosine oracle paths."""
    import numpy as np
    from pyspark.sql.functions import pandas_udf

    P = [list(r) for r in planes]  # plain lists pickle cheaply

    @pandas_udf("array<int>")
    def _buckets(vecs):
        import pandas as pd

        mat = np.array(P, dtype=np.float64).T  # dim x (L*m)
        if len(vecs) == 0:
            return pd.Series([], dtype=object)
        V = np.asarray(
            [np.asarray(v, dtype=np.float64) for v in vecs]
        )  # rows x dim
        bits = (V @ mat) > 0  # rows x (L*m)
        out = []
        pw = 1 << np.arange(n_planes)
        for row in bits:
            out.append(
                [int((row[t * n_planes : (t + 1) * n_planes] * pw).sum())
                 for t in range(n_tables)]
            )
        return pd.Series(out)

    return _buckets


def _probe_udf(planes, n_planes: int, n_tables: int, n_flip: int):
    """pandas_udf: embedding → array of (table, bucket) probe keys — the
    exact code per table plus, when ``n_flip >= 1``, every code at Hamming
    distance 1 (multiprobe).  Used on the QUERY side only: probing 1+m
    buckets per table multiplies query lookups, not corpus state."""
    import numpy as np
    from pyspark.sql.functions import pandas_udf

    P = [list(r) for r in planes]

    @pandas_udf("array<struct<t:int,b:int>>")
    def _probes(vecs):
        import pandas as pd

        mat = np.array(P, dtype=np.float64).T
        if len(vecs) == 0:
            return pd.Series([], dtype=object)
        V = np.asarray([np.asarray(v, dtype=np.float64) for v in vecs])
        bits = (V @ mat) > 0
        pw = 1 << np.arange(n_planes)
        # all Hamming-r probe masks for r = 1..n_flip, precomputed once —
        # a bare `if n_flip >= 1: flip one bit` would silently serve
        # multiprobe=2 callers the flip-1 probe set (round-4 review)
        from itertools import combinations

        masks = []
        for r in range(1, min(n_flip, n_planes) + 1):
            for combo in combinations(range(n_planes), r):
                m = 0
                for j in combo:
                    m |= 1 << j
                masks.append(m)
        out = []
        for row in bits:
            keys = []
            for t in range(n_tables):
                code = int((row[t * n_planes : (t + 1) * n_planes] * pw).sum())
                keys.append({"t": t, "b": code})
                for m in masks:
                    keys.append({"t": t, "b": code ^ m})
            out.append(keys)
        return pd.Series(out)

    return _probes


def lsh_ann_topk(
    emb: DataFrame,
    k: int = 5,
    query_mod: int = 50,
    n_planes: int = 4,
    n_tables: int = 8,
    multiprobe: int = 1,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Approximate top-k: multi-table random-hyperplane LSH with flip-1
    multiprobe on the query side.

    L independent tables of m sign-bits each; a pair is a candidate if the
    query's probe set (its code + all Hamming-1 codes when multiprobe=1)
    hits the corpus vector's code in ANY table.  Per-table hit prob rises
    from p^m to p^m + m·p^(m-1)(1-p) (p = 1-θ/π): a true neighbor at
    cos≈0.35 (p≈0.61) is found w.p. ≈0.995 with the defaults vs ≈0.70
    unprobed — measured recall@5 on the test corpus ≈0.99 (pinned ≥0.9 in
    pytest, ≥60% in the driver's ann_recall oracle).

    Scale shape: the corpus is scanned ONCE computing all L bucket keys in
    a single numpy matmul inside an Arrow batch (see _bucket_udf) —
    multiprobe multiplies only the tiny broadcast query side (1+m keys per
    table), never corpus state; candidates are co-partitioned by bucket so
    the join is local.
    """
    dim = len(emb.select(vec_col).first()[0])
    planes = _hyperplanes(n_planes * n_tables, dim)
    buckets = _bucket_udf(planes, n_planes, n_tables)
    probes = _probe_udf(planes, n_planes, n_tables, multiprobe)

    base = emb.select(
        F.col(id_col).alias("nid"),
        _as_double(F.col(vec_col)).alias("v"),
        F.posexplode_outer(buckets(F.col(vec_col))).alias("t", "b"),
    ).where(F.col("b").isNotNull()).withColumn("vn", norm_col(F.col("v")))
    queries = emb.where(F.col(id_col) % query_mod == 0).select(
        F.col(id_col).alias("qid"),
        _as_double(F.col(vec_col)).alias("q"),
        F.explode_outer(probes(F.col(vec_col))).alias("tb"),
    ).where(F.col("tb").isNotNull()).select(
        "qid", "q", F.col("tb.t").alias("t"), F.col("tb.b").alias("b")
    ).withColumn("qn", norm_col(F.col("q")))

    cand = base.join(F.broadcast(queries), ["t", "b"]).where(
        F.col("qid") != F.col("nid")
    )
    # norms folded once per row pre-join, not per candidate pair
    sim = (
        dot_col(F.col("q"), F.col("v")) / (F.col("qn") * F.col("vn"))
    ).alias("sim")
    scored = cand.select("qid", "nid", sim).groupBy("qid", "nid").agg(
        F.max("sim").alias("sim")
    )
    w = Window.partitionBy("qid").orderBy(F.col("sim").desc(), F.col("nid").asc())
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= k)
        .select(
            F.col("qid").alias("query_id"),
            F.col("nid").alias("neighbor_id"),
            F.col("rank").cast("int").alias("rank"),
        )
    )
