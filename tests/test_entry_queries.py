"""Driver emulation: every queries() entry vs its oracle_sql() at sf0.01.

Mirrors the driver's comparison: row count + schema-width + order-insensitive
value equality (sorted by all columns).  Also pins the TAG_MATRIX constants
against the actual reference parser, and the ANN recall floor.
"""

from __future__ import annotations

import duckdb
import pandas as pd
import pytest

import __spark_entry__ as entrymod

SF = "/root/testdata/sf0.01"
TABLES = [
    "region", "nation", "customer", "supplier", "part", "orders",
    "lineitem", "events", "documents", "embeddings",
]


@pytest.fixture(scope="module")
def duck():
    con = duckdb.connect()
    for t in TABLES:
        con.sql(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{SF}/{t}.parquet')"
        )
    return con


def normalize(df: pd.DataFrame) -> pd.DataFrame:
    df = df[sorted(df.columns)].copy()
    for c in df.columns:
        if df[c].dtype == object:
            df[c] = df[c].astype(str)
        elif "datetime" in str(df[c].dtype):
            df[c] = df[c].astype("datetime64[us]").astype(str)
        elif df[c].dtype.kind in "fiu":
            df[c] = pd.to_numeric(df[c]).astype("float64")
    return df.sort_values(by=list(df.columns)).reset_index(drop=True)


ORACLED = sorted(set(entrymod.oracle_sql().keys()))


@pytest.mark.spark
@pytest.mark.parametrize("name", ORACLED)
def test_query_vs_oracle(spark, duck, name):
    q = entrymod.queries()[name]
    got = normalize(q(spark, SF).toPandas())
    want = normalize(duck.sql(entrymod.oracle_sql()[name]).df())
    assert list(got.columns) == list(want.columns), (
        f"{name}: column mismatch {list(got.columns)} vs {list(want.columns)}"
    )
    assert len(got) == len(want), f"{name}: {len(got)} rows vs {len(want)}"
    pd.testing.assert_frame_equal(got, want, check_dtype=False, atol=0, rtol=0)


@pytest.mark.spark
def test_rows_only_queries(spark):
    for name in sorted(set(entrymod.queries()) - set(ORACLED)):
        df = entrymod.queries()[name](spark, SF)
        assert df.count() >= 0


def test_tag_matrix_matches_reference(ref):
    """The oracle constants in TAG_MATRIX/TEXT_NODE_MATRIX are reference
    facts, not assumptions."""
    from dhtmlparser3_spark.sources import pages as pg

    for t in range(5):
        html = pg.compile_py(pg.TEMPLATES[t], t, "some sample words here ok")
        dom = ref.parse(html)
        got = {}
        for tag in dom.find(""):
            if tag.name:
                got[tag.name] = got.get(tag.name, 0) + 1
        assert got == entrymod.TAG_MATRIX[t], f"template {t}"
        texts = [
            x
            for x in dom.depth_first_iterator()
            if isinstance(x, str)
        ]
        assert len(texts) == entrymod.TEXT_NODE_MATRIX[t], f"template {t}"
        # and the payload-drop variant for empty text
        html0 = pg.compile_py(pg.TEMPLATES[t], t, "")
        dom0 = ref.parse(html0)
        texts0 = [x for x in dom0.depth_first_iterator() if isinstance(x, str)]
        assert len(texts0) == (
            entrymod.TEXT_NODE_MATRIX[t] - entrymod.PAYLOAD_TEXT_NODE[t]
        ), f"template {t} empty-payload"
        # a WHITESPACE-ONLY payload keeps its text node (the parser never
        # trims), so the extract_stats oracle's empty rule must be
        # text = '' and NOT trim(text) = '' (round-4 review: trim() would
        # turn the driver row red on a corpus with space-only texts)
        html_ws = pg.compile_py(pg.TEMPLATES[t], t, "   ")
        dom_ws = ref.parse(html_ws)
        texts_ws = [
            x for x in dom_ws.depth_first_iterator() if isinstance(x, str)
        ]
        assert len(texts_ws) == entrymod.TEXT_NODE_MATRIX[t], (
            f"template {t} whitespace-payload"
        )


@pytest.mark.spark
def test_ann_recall_floor(spark):
    """LSH ANN must find ≥90% of true top-5 neighbors at sf0.01 (flip-1
    multiprobe on the query side; measured 0.98-1.0 across tiers)."""
    from dhtmlparser3_spark.functions.similarity import cosine_topk, lsh_ann_topk

    emb = spark.read.parquet(f"{SF}/embeddings.parquet")
    truth = cosine_topk(emb, k=5, query_mod=50).toPandas()
    approx = lsh_ann_topk(emb, k=5, query_mod=50).toPandas()
    t = set(zip(truth.query_id, truth.neighbor_id))
    a = set(zip(approx.query_id, approx.neighbor_id))
    recall = len(t & a) / len(t)
    assert recall >= 0.9, f"ANN recall {recall:.2f}"


@pytest.mark.spark
def test_ivf_recall_floor(spark):
    """IVF ANN (16 cells, 8-probe, 2-assign redundant posting — the
    synthetic embeddings are near-random so cells are weakly selective;
    the redundant assignment is what carries recall across Voronoi
    boundaries) must find ≥85% of true top-5 at sf0.01 (deterministic
    0.96 measured, 0.88/0.94 at sf0.001/sf0.1; the driver's ann_recall
    row pins the same per-method floor)."""
    from dhtmlparser3_spark.functions.similarity import cosine_topk, ivf_ann_topk

    emb = spark.read.parquet(f"{SF}/embeddings.parquet")
    truth = cosine_topk(emb, k=5, query_mod=50).toPandas()
    approx = ivf_ann_topk(emb, k=5, query_mod=50).toPandas()
    t = set(zip(truth.query_id, truth.neighbor_id))
    a = set(zip(approx.query_id, approx.neighbor_id))
    recall = len(t & a) / len(t)
    assert recall >= 0.85, f"IVF recall {recall:.2f}"
    # redundant assignment surfaces a pair once per shared cell; the
    # pre-window distinct must leave exactly k unique neighbors per query
    # (a surviving duplicate would burn a rank and silently cost recall)
    assert len(a) == len(approx), "duplicate (query, neighbor) pairs"
    per_q = approx.groupby("query_id").neighbor_id.count()
    assert (per_q == 5).all(), per_q.to_dict()
    assert sorted(approx["rank"].unique()) == [1, 2, 3, 4, 5]


@pytest.mark.spark
def test_entry_smoke(spark):
    df = entrymod.entry(spark)
    rows = df.limit(5).collect()
    assert len(rows) > 0
    assert "extracted_text" in df.columns
