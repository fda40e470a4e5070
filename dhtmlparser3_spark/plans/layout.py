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


def _governing_layout_nodes(df: DataFrame) -> list[tuple[str, int | None]]:
    """The GOVERNING layout nodes of the analyzed logical plan: walk the
    tree top-down via py4j and record each Repartition /
    RepartitionByExpression that has NO layout ancestor (the topmost one
    on each root-to-leaf path is what determines that path's output
    partitioning; anything beneath it is overridden).  Returns
    ``[("coalesce"|"shuffle", numPartitions|None), ...]`` — None width for
    ``repartition(col)`` without an explicit count (defaults to
    spark.sql.shuffle.partitions at runtime).  Raises on sessions where
    the JVM plan is unreachable (e.g. Spark Connect) — callers fall back
    to the text probe."""
    stack = [df._jdf.queryExecution().analyzed()]
    tops: list[tuple[str, int | None]] = []
    while stack:
        node = stack.pop()
        name = node.getClass().getSimpleName()
        if name == "Repartition":
            kind = "shuffle" if node.shuffle() else "coalesce"
            tops.append((kind, int(node.numPartitions())))
            continue  # governing node — its subtree is overridden
        if name == "RepartitionByExpression":
            opt = node.optNumPartitions()
            w = int(opt.get()) if opt.isDefined() else None
            tops.append(("shuffle", w))
            continue
        ch = node.children()
        for i in range(ch.length()):
            stack.append(ch.apply(i))
    return tops


def has_parallelism(df: DataFrame, threshold: int) -> bool:
    """Does ``df``'s layout provide at least ``threshold``-way parallelism
    for the map stage that will consume it?  Pure metadata, no execution.

    Primary probe: walk the analyzed plan TREE (py4j) and decide from the
    GOVERNING (topmost-per-path) layout nodes — ordering is exact, so
    ``repartition(N).coalesce(1)`` is correctly narrow (the coalesce
    governs) while ``coalesce(1).repartition(N)`` is correctly wide, and
    a governing NARROW repartition (``repartition(2)``) answers False
    even over wide file splits (it overrides them).  When no layout node
    governs, fall back to the file-scan split estimate.

    Fallback probe (plan tree unreachable, e.g. Spark Connect): the plan-
    TEXT regexes — unordered, so any coalesce answers False conservatively
    (one redundant shuffle is the cheap direction of that ambiguity).
    No ``df.rdd.getNumPartitions()``: plan-to-RDD conversion per call,
    sidesteps AQE statistics."""
    try:
        tops = _governing_layout_nodes(df)
    except Exception:  # noqa: BLE001 — connect-only sessions etc.
        width, coalesced = _plan_layout(df)
        if coalesced:
            return False
        if width >= threshold:
            return True
        return _scan_split_estimate(df) >= threshold
    if tops:
        default_w = int(
            df.sparkSession.conf.get("spark.sql.shuffle.partitions", "200")
        )
        widths = []
        for kind, w in tops:
            if kind == "coalesce":
                return False
            widths.append(default_w if w is None else w)
        # every root-to-leaf path must be wide enough (a join/union with
        # one narrow governing branch still bottlenecks that branch)
        return min(widths) >= threshold
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
