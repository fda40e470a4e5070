"""Custom stateful streaming operator: gap-based sessionization.

``applyInPandasWithState`` over a user-keyed event stream: a session is a
maximal run of events per user with inter-event gaps ≤ ``gap``.

Correct under out-of-order micro-batches (the engine does NOT filter late
rows for this operator — unlike built-in windowed aggs — so the operator
must):

* rows older than the current watermark are DROPPED (standard late-data
  policy; the watermark delay is the disorder budget),
* newer rows are buffered in state (sorted pending timestamps, epoch-µs),
* a session is FINALIZED and emitted only when ``session_end + gap ≤
  watermark``: no future row can extend it (future rows ≥ watermark) and
  no row can land in its gap window (it would be late).  This makes the
  emitted stream deterministic regardless of batch boundaries.

State per user is bounded: pending holds only events newer than
``watermark - gap`` plus the open tail — O(rate × (delay + gap)).
Partitioned by user hash; checkpointed by the engine.
"""

from __future__ import annotations

from typing import Any, Iterable, Iterator, Tuple

import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

OUTPUT_SCHEMA = (
    "user_id bigint, session_start timestamp, session_end timestamp, "
    "n_events int, closed_by string"
)
STATE_SCHEMA = "pending array<bigint>"


def _sessions_of(ts_sorted, gap_us):
    """Split sorted timestamps into maximal gap-bounded groups."""
    groups = []
    cur = [ts_sorted[0]]
    for t in ts_sorted[1:]:
        if t - cur[-1] > gap_us:
            groups.append(cur)
            cur = [t]
        else:
            cur.append(t)
    groups.append(cur)
    return groups


def _make_update(gap_us: int):
    def update(
        key: Tuple[Any, ...],
        pdfs: Iterable[pd.DataFrame],
        state: GroupState,
    ) -> Iterator[pd.DataFrame]:
        user = key[0]
        wm_us = state.getCurrentWatermarkMs() * 1000

        pending = list(state.get[0]) if state.exists else []

        if not state.hasTimedOut:
            for pdf in pdfs:
                for t in pd.to_datetime(pdf["ts"]):
                    t_us = int(t.value // 1_000)
                    if t_us >= wm_us:  # late rows below watermark: dropped
                        pending.append(t_us)

        out = []
        if pending:
            pending.sort()
            keep = []
            for grp in _sessions_of(pending, gap_us):
                if grp[-1] + gap_us <= wm_us:
                    out.append(
                        (user, grp[0], grp[-1], len(grp),
                         "timeout" if state.hasTimedOut else "gap")
                    )
                else:
                    keep.extend(grp)
            pending = keep

        if pending:
            state.update((pending,))
            # wake once the watermark can finalize the oldest open session
            deadline_ms = (pending[-1] + gap_us) // 1000 + 1
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
                "session_start": pd.Timestamp(s, unit="us"),
                "session_end": pd.Timestamp(e, unit="us"),
                "n_events": n,
                "closed_by": how,
            }
            for (u, s, e, n, how) in rows
        ],
        columns=["user_id", "session_start", "session_end", "n_events", "closed_by"],
    )


def sessionize_stream(
    events: DataFrame, gap_minutes: int = 30, watermark: str = "1 hour"
) -> DataFrame:
    """events(ts, user_id, ...) stream → finalized-session stream."""
    gap_us = gap_minutes * 60 * 1_000_000
    return (
        events.withWatermark("ts", watermark)
        .groupBy("user_id")
        .applyInPandasWithState(
            _make_update(gap_us),
            outputStructType=OUTPUT_SCHEMA,
            stateStructType=STATE_SCHEMA,
            outputMode="append",
            timeoutConf=GroupStateTimeout.EventTimeTimeout,
        )
    )


def sessionize_batch(events: DataFrame, gap_minutes: int = 30) -> DataFrame:
    """Batch oracle for the streaming operator: lag()-gap session ids —
    ALL sessions (the stream emits only watermark-finalized ones)."""
    from pyspark.sql import Window
    from pyspark.sql import functions as F

    gap_s = gap_minutes * 60
    w = Window.partitionBy("user_id").orderBy("ts")
    marked = events.select("user_id", "ts").withColumn(
        "new_sess",
        (
            F.coalesce(
                F.unix_timestamp("ts") - F.unix_timestamp(F.lag("ts").over(w)),
                F.lit(gap_s + 1),
            )
            > gap_s
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
