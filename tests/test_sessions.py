"""Stateful sessionization: streaming applyInPandasWithState vs batch oracle."""

from __future__ import annotations

import pytest

from pyspark.sql import functions as F

from dhtmlparser3_spark.streaming import sessions as ss

SF = "/root/testdata/sf0.001"
GAP_MIN = 30


@pytest.mark.spark
def test_stream_sessions_match_batch_subset(spark, tmp_path):
    import glob
    import os

    events = spark.read.parquet(f"{SF}/events.parquet").select("ts", "user_id")
    src = str(tmp_path / "events_in")
    # several files → several micro-batches (state crosses batch boundaries);
    # stagger mtimes so the file source replays them in event-time order
    # (range partition i = time range i) — the out-of-order case is covered
    # by the operator's late-drop policy, tested via subset assertions below
    events.repartitionByRange(6, "ts").write.parquet(src)
    for i, f in enumerate(sorted(glob.glob(f"{src}/part-*"))):
        os.utime(f, (1_700_000_000 + i * 10, 1_700_000_000 + i * 10))

    stream = (
        spark.readStream.schema("ts timestamp, user_id bigint")
        .option("maxFilesPerTrigger", 1)
        .parquet(src)
    )
    out = str(tmp_path / "sessions_out")
    q = (
        ss.sessionize_stream(stream, gap_minutes=GAP_MIN)
        .writeStream.format("parquet")
        .option("path", out)
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(180)

    got = spark.read.parquet(out)
    n_got = got.count()
    assert n_got > 0, "no sessions emitted"

    # with in-order replay and no late data, EVERY emitted session must be
    # exactly an oracle session (finalization waits for the watermark)
    want = ss.sessionize_batch(events, gap_minutes=GAP_MIN).drop("sess_id")
    joined = got.join(
        want, ["user_id", "session_start", "session_end", "n_events"], "inner"
    )
    assert joined.count() == n_got, "streamed session not in batch oracle"

    # and the stream must emit MOST oracle sessions (the open tail at end of
    # stream legitimately never finalizes)
    n_want = want.count()
    assert n_got >= 0.7 * n_want, f"only {n_got}/{n_want} sessions emitted"

    # no duplicates, sane intervals
    assert got.select("user_id", "session_start").distinct().count() == n_got
    assert (
        got.where(
            (F.col("session_end") < F.col("session_start"))
            | (F.col("n_events") < 1)
        ).count()
        == 0
    )


@pytest.mark.spark
def test_stream_sessions_out_of_order_batches(spark, tmp_path):
    """Reversed file order: rows below the watermark are dropped, emitted
    sessions stay internally consistent and duplicate-free."""
    import glob
    import os

    events = spark.read.parquet(f"{SF}/events.parquet").select("ts", "user_id")
    src = str(tmp_path / "events_rev")
    events.repartitionByRange(6, "ts").write.parquet(src)
    files = sorted(glob.glob(f"{src}/part-*"))
    for i, f in enumerate(reversed(files)):  # newest time range first
        os.utime(f, (1_700_000_000 + i * 10, 1_700_000_000 + i * 10))

    stream = (
        spark.readStream.schema("ts timestamp, user_id bigint")
        .option("maxFilesPerTrigger", 1)
        .parquet(src)
    )
    out = str(tmp_path / "sessions_rev")
    q = (
        ss.sessionize_stream(stream, gap_minutes=GAP_MIN)
        .writeStream.format("parquet")
        .option("path", out)
        .option("checkpointLocation", str(tmp_path / "ckpt_rev"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(180)
    got = spark.read.parquet(out)
    assert got.count() > 0
    # every emitted session is a contiguous gap-bounded run of real events
    ev, g = events.alias("e"), got.alias("g")
    per = (
        g.join(
            ev,
            (F.col("e.user_id") == F.col("g.user_id"))
            & (F.col("e.ts") >= F.col("g.session_start"))
            & (F.col("e.ts") <= F.col("g.session_end")),
        )
        .groupBy("g.user_id", "g.session_start", "g.n_events")
        .agg(F.count("*").alias("actual"))
    )
    assert per.where(F.col("actual") != F.col("n_events")).count() == 0
    assert (
        got.select("user_id", "session_start").distinct().count() == got.count()
    )


@pytest.mark.spark
def test_batch_sessionizer_gap_semantics(spark):
    rows = [
        (1, "2024-01-01 00:00:00"),
        (1, "2024-01-01 00:10:00"),
        (1, "2024-01-01 01:00:00"),  # 50min gap → new session
        (2, "2024-01-01 00:00:00"),
    ]
    df = spark.createDataFrame(rows, "user_id bigint, ts string").withColumn(
        "ts", F.to_timestamp("ts")
    )
    res = ss.sessionize_batch(df, gap_minutes=30).collect()
    per_user = {}
    for r in res:
        per_user.setdefault(r.user_id, []).append(r)
    assert len(per_user[1]) == 2
    assert sorted(s.n_events for s in per_user[1]) == [1, 2]
    assert len(per_user[2]) == 1


@pytest.mark.spark
def test_batch_sessionizer_microsecond_gap_boundary(spark):
    """Gaps compare in µs like the stream (round-4 review): 1800.000001 s
    splits, exactly 1800 s does not — unix_timestamp() truncation would
    merge the first pair (1800s) and still merge the second."""
    rows = [
        (1, "2024-01-01 00:00:00.000000"),
        (1, "2024-01-01 00:30:00.000001"),  # gap > 30min by 1µs → split
        (2, "2024-01-01 00:00:00.500000"),
        (2, "2024-01-01 00:30:00.500000"),  # gap == 30min exactly → merge
    ]
    df = spark.createDataFrame(rows, "user_id bigint, ts string").withColumn(
        "ts", F.to_timestamp("ts")
    )
    res = ss.sessionize_batch(df, gap_minutes=30).collect()
    per_user = {}
    for r in res:
        per_user.setdefault(r.user_id, []).append(r)
    assert len(per_user[1]) == 2, per_user
    assert len(per_user[2]) == 1 and per_user[2][0].n_events == 2, per_user


def _naive_groups(ts_sorted, gap_us):
    """Reference gap-grouping of a raw sorted timestamp multiset: split
    where the successor gap exceeds gap_us; report (start, end, count)."""
    groups = []
    cur = [ts_sorted[0]]
    for t in ts_sorted[1:]:
        if t - cur[-1] > gap_us:
            groups.append(cur)
            cur = [t]
        else:
            cur.append(t)
    groups.append(cur)
    return [(g[0], g[-1], len(g)) for g in groups]


def test_merge_groups_incremental_equals_batch_property():
    """The compacted-triple fold (sessions._merge_groups) must be EXACT:
    folding events batch-by-batch through (start, end, count) triples
    yields the same groups as one naive pass over the raw multiset.  This
    is the invariant the round-4 state-compaction rewrite rests on — a
    new point can extend a group, bridge two, or open its own, but never
    split one (consecutive points inside a group are ≤ gap apart), so
    interval boundaries carry all the information raw timestamps did.
    Hypothesis drives random gaps, batch splits, duplicates, and boundary
    collisions (ints drawn from a small range force exact-gap ties)."""
    from hypothesis import given, settings
    from hypothesis import strategies as st

    @settings(max_examples=300, deadline=None)
    @given(
        st.lists(st.integers(0, 400), min_size=1, max_size=60),
        st.integers(1, 25),
        st.data(),
    )
    def run(points, gap_us, data):
        pts = sorted(points)
        # partition the multiset into 1-4 arrival batches ARBITRARILY —
        # unlike the watermark-ordered stream, a later batch may carry a
        # point before/inside/bridging any existing group; the fold must
        # be exact for all of them (extend / bridge / open, never split)
        n_batches = data.draw(st.integers(1, 4))
        assign = [data.draw(st.integers(0, n_batches - 1)) for _ in pts]
        batches = [
            [p for p, a in zip(pts, assign) if a == b]
            for b in range(n_batches)
        ]
        triples = []
        for b in batches:
            triples = ss._merge_groups(triples, sorted(b), gap_us)
        assert triples == _naive_groups(pts, gap_us)

    run()
