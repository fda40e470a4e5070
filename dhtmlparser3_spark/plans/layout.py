"""Physical-layout helpers shared by corpus builders and queries.

The sandbox sf tables are single parquet files → single scan splits; any
expression-heavy map work downstream (shingling HOFs, embedding folds)
would run on ONE core and Amdahl-cap the whole query.  At 100 TB the same
hazard appears after a selective filter or a small dimension read.  The
rule: spread a DataFrame before expensive per-row work whenever its scan
parallelism is below the cluster's.
"""

from __future__ import annotations

import os
import re

from pyspark.sql import DataFrame


def _scan_split_estimate(df: DataFrame) -> int:
    """Estimated scan splits of ``df``'s input files: on-disk bytes vs
    ``spark.sql.files.maxPartitionBytes``.  0 when the plan has no file
    sources (or their sizes are unreadable)."""
    try:
        files = df.inputFiles()
    except Exception:  # noqa: BLE001 — e.g. streaming plans
        return 0
    if not files:
        return 0
    raw = df.sparkSession.conf.get(
        "spark.sql.files.maxPartitionBytes", "134217728"
    ).lower().rstrip("b")
    units = {"k": 1 << 10, "m": 1 << 20, "g": 1 << 30}
    try:
        if raw and raw[-1] in units:
            max_bytes = int(raw[:-1]) * units[raw[-1]]
        else:
            max_bytes = int(raw)
    except ValueError:
        max_bytes = 128 << 20
    splits = 0
    for f in files:
        path = f[7:] if f.startswith("file://") else f
        try:
            size = os.path.getsize(path)
        except OSError:
            size = 0
        splits += max(1, -(-size // max_bytes))
    return splits


# logical-plan text of the layout nodes (no execution, no plan-to-RDD
# conversion).  `repartition(n)` prints as "Repartition n, true",
# `coalesce(n)` as "Repartition n, false" (no shuffle), and
# `repartition(n, cols)`/`repartitionByRange` as
# "RepartitionByExpression [...], n".  The expression list itself may
# print brackets (array/map element access, e.g. ``col("a")[0]``), so the
# width is anchored on the line's TRAILING ``], n`` — greedy ``.*`` under
# MULTILINE reaches the last ``]`` of that plan line, not the first.
_REPART_SHUFFLE = re.compile(r"\bRepartition (\d+), true\b")
_REPART_BY_EXPR = re.compile(
    r"\bRepartitionByExpression \[.*\](?:, (\d+))?\r?$", re.MULTILINE
)
_COALESCE = re.compile(r"\bRepartition (\d+), false\b")


def _plan_layout(df: DataFrame) -> tuple[int, bool]:
    """(max explicit shuffle-repartition width in the analyzed plan — 0 if
    none, has_coalesce).  Coalesce NARROWS the layout, so it must never
    count as an existing spread (round-2 code matched the bare substring
    "Repartition", which made spread() silently no-op on coalesce(1)
    plans — the exact Amdahl hazard it exists to prevent)."""
    try:
        text = df._jdf.queryExecution().analyzed().toString()
    except Exception:  # noqa: BLE001 — e.g. connect-only sessions
        return 0, False
    widths = [int(m) for m in _REPART_SHUFFLE.findall(text)]
    widths += [int(m) for m in _REPART_BY_EXPR.findall(text) if m]
    return max(widths, default=0), bool(_COALESCE.search(text))


def has_parallelism(df: DataFrame, threshold: int) -> bool:
    """Does ``df``'s layout provide at least ``threshold``-way parallelism
    for the map stage that will consume it?  Pure metadata — file-scan
    split estimate OR an explicit mid-plan shuffle repartition of that
    width (so a caller that already repartitioned wide is recognized and
    not re-shuffled).  A plan containing a coalesce answers False EVEN
    when a wide repartition is also present: text probes cannot order the
    two nodes, and ``repartition(N).coalesce(1)`` judged wide would make
    spread() no-op on a 1-partition layout — the exact Amdahl hazard it
    exists to prevent.  One redundant shuffle on the reverse ordering
    (``coalesce(1).repartition(N)``) is the cheap direction of that
    ambiguity.  No ``df.rdd.getNumPartitions()``: plan-to-RDD conversion
    per call, sidesteps AQE statistics."""
    width, coalesced = _plan_layout(df)
    if coalesced:
        return False
    if width >= threshold:
        return True
    return _scan_split_estimate(df) >= threshold


def spread(df: DataFrame, factor: int = 2) -> DataFrame:
    """Round-robin repartition to ``factor x defaultParallelism`` unless
    the layout already provides the cluster's parallelism (wide file
    splits or an explicit wide repartition — which keeps spread()
    idempotent: the repartition spread() itself adds is seen on the
    second call).

    A no-op on well-split inputs (real Iceberg/parquet tables at scale),
    so it is safe to apply unconditionally before expression-heavy
    stages; all probes are pure metadata.
    """
    sc = df.sparkSession.sparkContext
    if has_parallelism(df, sc.defaultParallelism):
        return df
    return df.repartition(sc.defaultParallelism * factor)
