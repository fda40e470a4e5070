"""asof_join semantics on handmade frames + mixture_sample determinism."""

from __future__ import annotations

from datetime import datetime

import pytest
from pyspark.sql import functions as F

from dhtmlparser3_spark.operators.asof import asof_join


def _ts(s):
    return datetime.fromisoformat(s)


@pytest.mark.spark
def test_asof_join_basic(spark):
    left = spark.createDataFrame(
        [
            (1, _ts("2024-01-01 10:00:00"), "c1"),
            (1, _ts("2024-01-01 12:00:00"), "c2"),
            (2, _ts("2024-01-01 09:00:00"), "c3"),  # no prior right row
        ],
        "user_id long, ts timestamp, tag string",
    )
    right = spark.createDataFrame(
        [
            (1, _ts("2024-01-01 09:30:00"), 100),
            (1, _ts("2024-01-01 11:00:00"), 200),
            (2, _ts("2024-01-01 09:30:00"), 300),  # after the only left row
        ],
        "user_id long, ts timestamp, val long",
    )
    out = {
        r["tag"]: (r["val_matched"], r["ts_matched"])
        for r in asof_join(left, right, on=["user_id"]).collect()
    }
    assert out["c1"] == (100, _ts("2024-01-01 09:30:00"))
    assert out["c2"] == (200, _ts("2024-01-01 11:00:00"))
    assert out["c3"] == (None, None)


@pytest.mark.spark
def test_asof_join_equal_ts_matches(spark):
    left = spark.createDataFrame(
        [(1, _ts("2024-01-01 10:00:00"), "c")],
        "user_id long, ts timestamp, tag string",
    )
    right = spark.createDataFrame(
        [(1, _ts("2024-01-01 10:00:00"), 7)],
        "user_id long, ts timestamp, val long",
    )
    [r] = asof_join(left, right, on=["user_id"]).collect()
    assert r["val_matched"] == 7  # at-or-before includes equality


@pytest.mark.spark
def test_asof_null_right_value_does_not_splice(spark):
    # the newer right row has a NULL value: the match must report that NULL,
    # not fall back to the older row's value (struct payload, not per-column
    # last(ignorenulls))
    left = spark.createDataFrame(
        [(1, _ts("2024-01-01 12:00:00"), "c")],
        "user_id long, ts timestamp, tag string",
    )
    right = spark.createDataFrame(
        [
            (1, _ts("2024-01-01 10:00:00"), 1),
            (1, _ts("2024-01-01 11:00:00"), None),
        ],
        "user_id long, ts timestamp, val long",
    )
    [r] = asof_join(left, right, on=["user_id"]).collect()
    assert r["val_matched"] is None
    assert r["ts_matched"] == _ts("2024-01-01 11:00:00")


@pytest.mark.spark
def test_mixture_sample_deterministic_and_rate_shaped(spark):
    from dhtmlparser3_spark.functions.quality_filters import mixture_sample

    docs = spark.createDataFrame(
        [(i, f"src{i % 4}") for i in range(400)], "doc_id long, source string"
    )
    a = sorted(r["doc_id"] for r in mixture_sample(docs).collect())
    b = sorted(r["doc_id"] for r in mixture_sample(docs).collect())
    assert a == b and 0 < len(a) < 400  # reproducible, non-trivial
    rates = {
        r["source"]: r["rate_pct"]
        for r in mixture_sample(docs).select("source", "rate_pct").distinct().collect()
    }
    assert rates == {"src0": 20, "src1": 27, "src2": 34, "src3": 41}


@pytest.mark.spark
def test_canonical_url_edge_cases(spark):
    from dhtmlparser3_spark.functions.quality_filters import canonical_url_col

    cases = {
        "https://A.B/p": "https://a.b/p",
        "HTTP://a.b:80/x?b=1&a=2#f": "http://a.b/x?a=2&b=1",
        "https://a.b:8443/x": "https://a.b:8443/x",  # non-default port kept
        "https://a.b/x?": "https://a.b/x",  # bare '?' dropped
        "relative/path.html": "relative/path.html",  # schemeless untouched
        "https://a.b": "https://a.b",  # no path
    }
    df = spark.createDataFrame([(u,) for u in cases], "url string")
    got = {
        r["url"]: r["c"]
        for r in df.select("url", canonical_url_col("url").alias("c")).collect()
    }
    assert got == cases
