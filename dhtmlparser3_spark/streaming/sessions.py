"""Custom stateful streaming operator: gap-based sessionization.

``applyInPandasWithState`` over a user-keyed event stream: a session is a
maximal run of events per user with inter-event gaps ≤ ``gap``.

Correct under out-of-order micro-batches (the engine does NOT filter late
rows for this operator — unlike built-in windowed aggs — so the operator
must):

* rows older than the current watermark are DROPPED (standard late-data
  policy; the watermark delay is the disorder budget),
* newer rows fold into per-key state,
* a session is FINALIZED and emitted only when ``session_end + gap ≤
  watermark``: no future row can extend it (future rows ≥ watermark) and
  no row can land in its gap window (it would be late).  This makes the
  emitted stream deterministic regardless of batch boundaries.

State per key is COMPACTED group triples (start, end, count), not raw
timestamps: no event below the watermark can ever arrive, so the group
structure among already-buffered events is fixed and a new event only
interacts with group BOUNDARIES (extend / bridge-merge / new group).  A
continuously-active key (one event per minute forever) therefore holds
ONE triple, not an ever-growing timestamp list — state is O(open groups)
regardless of event rate.  The wake-up deadline is the EARLIEST open
group's ``end + gap`` so a finalizable older session is never held
hostage by a newer group's deadline.

All event-time arithmetic is on epoch-µs LONGS computed by Spark
(``unix_micros`` on the way in, ``timestamp_micros`` on the way out):
pandas would otherwise hand the UDF session-timezone wall-clock naive
timestamps, which compare wrongly against ``getCurrentWatermarkMs()``
epoch values on any non-UTC session (off by the zone offset).

Partitioned by user hash; checkpointed by the engine.
"""

from __future__ import annotations

from typing import Any, Iterable, Iterator, Tuple

import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

_RAW_OUTPUT_SCHEMA = (
    "user_id bigint, start_us bigint, end_us bigint, "
    "n_events int, closed_by string"
)
STATE_SCHEMA = "starts array<bigint>, ends array<bigint>, counts array<int>"


def _epoch_us_col(col):
    """Zone-free epoch-µs of a timestamp column of EITHER type.

    ``unix_micros`` rejects TIMESTAMP_NTZ (the type parquet event tables
    carry); ``to_utc_timestamp(ts, 'UTC')`` reinterprets NTZ naive micros
    as UTC — exactly the micros the NTZ watermark tracks — and is the
    identity on TIMESTAMP_LTZ."""
    from pyspark.sql import functions as F

    return F.unix_micros(F.to_utc_timestamp(col, "UTC"))


def _merge_groups(triples, new_ts, gap_us):
    """Fold sorted new event times into sorted disjoint group triples.

    Existing groups are separated by > gap and new points are ≥ the
    watermark, so one sorted coalescing pass is exact: a point inside or
    within ``gap`` of a group extends it, a point bridging two groups
    merges them, anything else opens a new group."""
    items = sorted(
        list(triples) + [(t, t, 1) for t in new_ts], key=lambda x: x[0]
    )
    merged: list = []
    for s, e, n in items:
        if merged and s - merged[-1][1] <= gap_us:
            ms, me, mn = merged[-1]
            merged[-1] = (ms, max(me, e), mn + n)
        else:
            merged.append((s, e, n))
    return merged


def _make_update(gap_us: int):
    def update(
        key: Tuple[Any, ...],
        pdfs: Iterable[pd.DataFrame],
        state: GroupState,
    ) -> Iterator[pd.DataFrame]:
        user = key[0]
        wm_us = state.getCurrentWatermarkMs() * 1000

        if state.exists:
            starts, ends, counts = state.get
            triples = list(zip(starts, ends, counts))
        else:
            triples = []

        new_ts = []
        if not state.hasTimedOut:
            for pdf in pdfs:
                for t_us in pdf["ts_us"]:
                    t_us = int(t_us)
                    if t_us >= wm_us:  # late rows below watermark: dropped
                        new_ts.append(t_us)
        new_ts.sort()

        out = []
        keep = []
        for s, e, n in _merge_groups(triples, new_ts, gap_us):
            if e + gap_us <= wm_us:
                out.append(
                    (user, s, e, n,
                     "timeout" if state.hasTimedOut else "gap")
                )
            else:
                keep.append((s, e, n))

        if keep:
            state.update(
                (
                    [s for s, _e, _n in keep],
                    [e for _s, e, _n in keep],
                    [n for _s, _e, n in keep],
                )
            )
            # wake once the watermark can finalize the EARLIEST open
            # group (keep is sorted; groups are disjoint so keep[0] has
            # the minimal end) — the newest group's deadline must not
            # delay an older finalizable session
            deadline_ms = (keep[0][1] + gap_us) // 1000 + 1
            state.setTimeoutTimestamp(max(deadline_ms, wm_us // 1000 + 1))
        elif state.exists:
            state.remove()

        yield _frame(out)

    return update


def _frame(rows):
    return pd.DataFrame(
        [
            {
                "user_id": u,
                "start_us": s,
                "end_us": e,
                "n_events": n,
                "closed_by": how,
            }
            for (u, s, e, n, how) in rows
        ],
        columns=["user_id", "start_us", "end_us", "n_events", "closed_by"],
    )


def sessionize_stream(
    events: DataFrame, gap_minutes: int = 30, watermark: str = "1 hour"
) -> DataFrame:
    """events(ts, user_id, ...) stream → finalized-session stream."""
    from pyspark.sql import functions as F

    gap_us = gap_minutes * 60 * 1_000_000
    raw = (
        events.withWatermark("ts", watermark)
        .withColumn("ts_us", _epoch_us_col("ts"))
        .groupBy("user_id")
        .applyInPandasWithState(
            _make_update(gap_us),
            outputStructType=_RAW_OUTPUT_SCHEMA,
            stateStructType=STATE_SCHEMA,
            outputMode="append",
            timeoutConf=GroupStateTimeout.EventTimeTimeout,
        )
    )
    return raw.select(
        "user_id",
        F.timestamp_micros("start_us").alias("session_start"),
        F.timestamp_micros("end_us").alias("session_end"),
        "n_events",
        "closed_by",
    )


def sessionize_batch(events: DataFrame, gap_minutes: int = 30) -> DataFrame:
    """Batch oracle for the streaming operator: lag()-gap session ids —
    ALL sessions (the stream emits only watermark-finalized ones).

    Gaps compare in MICROSECONDS (``unix_micros``), matching the stream's
    epoch-µs arithmetic exactly — ``unix_timestamp`` would truncate to
    whole seconds and split/merge differently on sub-second margins (the
    synthetic events table is µs-grained throughout)."""
    from pyspark.sql import Window
    from pyspark.sql import functions as F

    gap_us = gap_minutes * 60 * 1_000_000
    w = Window.partitionBy("user_id").orderBy("ts")
    marked = events.select("user_id", "ts").withColumn(
        "new_sess",
        (
            F.coalesce(
                _epoch_us_col("ts") - _epoch_us_col(F.lag("ts").over(w)),
                F.lit(gap_us + 1),
            )
            > gap_us
        ).cast("int"),
    )
    sessed = marked.withColumn(
        "sess_id", F.sum("new_sess").over(w.rowsBetween(Window.unboundedPreceding, 0))
    )
    return sessed.groupBy("user_id", "sess_id").agg(
        F.min("ts").alias("session_start"),
        F.max("ts").alias("session_end"),
        F.count("*").cast("int").alias("n_events"),
    )
