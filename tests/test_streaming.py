"""Structured Streaming extraction: file-source micro-batches through the
same byte-identical extraction, exactly-once via checkpoint."""

from __future__ import annotations

import pytest

from dhtmlparser3_spark.sources.pages import build_pages
from dhtmlparser3_spark.streaming import stream_extract as se

SF = "/root/testdata/sf0.001"


@pytest.fixture()
def pages_dir(spark, tmp_path):
    p = str(tmp_path / "pages_in")
    build_pages(spark, SF).repartition(8).write.parquet(p)
    return p


@pytest.mark.spark
def test_stream_extract_matches_batch(spark, tmp_path, pages_dir, ref):
    out = str(tmp_path / "out")
    ckpt = str(tmp_path / "ckpt")
    stream = se.read_pages_stream(spark, pages_dir)
    q = se.start_foreach_batch(stream, out, ckpt, parallelism=4)
    q.awaitTermination(120)

    res = spark.read.parquet(out)
    assert res.count() == 500
    assert res.select("url").distinct().count() == 500
    assert res.where("error is not null").count() == 0
    # multiple epochs actually happened (maxFilesPerTrigger=4 over 8 files)
    assert res.select("epoch").distinct().count() >= 2

    # byte-identity spot check vs the vendored reference
    sample = res.select("url", "extracted_text").limit(20).collect()
    src = {
        r.url: bytes(r.html).decode("utf-8")
        for r in spark.read.parquet(pages_dir).collect()
    }
    for r in sample:
        assert r.extracted_text == ref.parse(src[r.url]).content_str()

    # restart with the same checkpoint: no new data → no duplicates
    q2 = se.start_foreach_batch(
        se.read_pages_stream(spark, pages_dir), out, ckpt, parallelism=4
    )
    q2.awaitTermination(60)
    assert spark.read.parquet(out).count() == 500


@pytest.mark.spark
def test_stream_extract_batch_replay_is_idempotent(spark, tmp_path, pages_dir):
    """foreachBatch is AT-LEAST-ONCE: a crash between the sink write and
    the checkpoint commit replays the micro-batch on restart.  Simulate
    the crash window at the engine level — delete the LAST batch's commit
    marker from the checkpoint (its offsets file and its sink output both
    survive, exactly the on-disk state of that crash) and restart.  The
    engine replays the batch; the per-epoch overwrite sink must absorb it
    with zero duplicates (a plain append sink would yield 750 rows)."""
    import os

    out = str(tmp_path / "out")
    ckpt = str(tmp_path / "ckpt")
    q = se.start_foreach_batch(
        se.read_pages_stream(spark, pages_dir), out, ckpt, parallelism=4
    )
    q.awaitTermination(120)
    res = spark.read.parquet(out)
    assert res.count() == 500
    n_epochs = res.select("epoch").distinct().count()
    assert n_epochs >= 2

    commits = sorted(
        f for f in os.listdir(os.path.join(ckpt, "commits"))
        if not f.startswith(".")
    )
    assert len(commits) >= 2
    os.remove(os.path.join(ckpt, "commits", commits[-1]))
    # also drop the local ChecksumFileSystem sidecar — a real crash leaves
    # neither file, and a stale .crc makes the replayed commit's rename
    # fail as a (spurious) concurrent-checkpoint-use error
    crc = os.path.join(ckpt, "commits", f".{commits[-1]}.crc")
    if os.path.exists(crc):
        os.remove(crc)

    q2 = se.start_foreach_batch(
        se.read_pages_stream(spark, pages_dir), out, ckpt, parallelism=4
    )
    q2.awaitTermination(120)
    replayed = spark.read.parquet(out)
    assert replayed.count() == 500
    assert replayed.select("url").distinct().count() == 500
    assert replayed.select("epoch").distinct().count() == n_epochs


@pytest.mark.spark
def test_windowed_metrics_stream_plan(spark, pages_dir):
    """The stateful windowed aggregate compiles into a streaming plan with
    watermark + stateful agg (smoke via availableNow to memory sink)."""
    stream = se.read_pages_stream(spark, pages_dir)
    extracted = se.extract_stream(stream)
    metrics = se.windowed_metrics_stream(extracted)
    q = (
        metrics.writeStream.format("memory")
        .queryName("m_out")
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    rows = spark.sql("select * from m_out").collect()
    # warc_ts spans 500s → a handful of 10-minute windows; append mode emits
    # only watermark-closed windows, so just require the query ran clean
    assert q.lastProgress is not None


@pytest.mark.spark
def test_stream_dedup_watermark_bounds_state(spark, tmp_path):
    """dropDuplicates state is watermark-bounded: a duplicate arriving
    within the watermark is suppressed; a row arriving BEHIND the
    watermark is dropped outright (never emitted) and the state metric
    shows eviction — the two-batch late-row pin for the 100 TB state
    bound."""
    import glob
    import os
    import uuid

    from pyspark.sql import functions as F

    inp = str(tmp_path / "in")
    os.makedirs(inp)

    def write_one(df, name, mtime):
        tmp = str(tmp_path / ("w_" + name))
        df.coalesce(1).write.parquet(tmp)
        part = glob.glob(tmp + "/part-*.parquet")[0]
        dst = os.path.join(inp, name)
        os.replace(part, dst)
        os.utime(dst, (mtime, mtime))

    def row(url, text, secs):
        return spark.range(1).select(
            F.lit(url).alias("url"),
            F.expr(
                "timestamp'2024-01-01 00:00:00' "
                f"+ make_interval(0,0,0,0,0,0, {secs})"
            ).alias("warc_ts"),
            F.encode(F.lit("<p>x</p>"), "utf-8").alias("html"),
            F.lit(text).alias("text"),
            F.lit("en").alias("lang"),
            F.lit(0).cast("long").alias("doc_id"),
        )

    import time as _time

    t0 = _time.time() - 1000
    # batch 1: two distinct digests at t=0s and t=7200s (watermark after
    # this batch = 7200s - 1h = 3600s)
    write_one(
        row("u1", "alpha", 0).unionByName(row("u2", "beta", 7200)),
        "b1.parquet", t0,
    )
    # batch 2 (spacer): advances nothing new, propagates the watermark
    write_one(row("u3", "gamma", 7300), "b2.parquet", t0 + 100)
    # batch 3: a dup of beta within the watermark (dropped as duplicate)
    # and a LATE novel digest at t=30s < watermark (dropped as late)
    write_one(
        row("u4?dup", "beta", 7250).unionByName(row("u5", "late-novel", 30)),
        "b3.parquet", t0 + 200,
    )

    stream = (
        spark.readStream.schema(se.PAGES_SCHEMA)
        .option("maxFilesPerTrigger", 1)
        .parquet(inp)
    )
    name = f"dd_{uuid.uuid4().hex[:8]}"
    q = (
        se.dedup_stream(stream, watermark="1 hour")
        .writeStream.format("memory")
        .queryName(name)
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    got = {r.text for r in spark.table(name).select("text").collect()}
    # beta dup suppressed (stateful dedup), late-novel dropped (watermark)
    assert got == {"alpha", "beta", "gamma"}, got
    dropped = sum(
        s.get("numRowsDroppedByWatermark", 0)
        for pr in q.recentProgress
        for s in pr.get("stateOperators", [])
    )
    assert dropped >= 1, [pr.get("stateOperators") for pr in q.recentProgress]
