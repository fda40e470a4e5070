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


def _plan_layout(df: DataFrame) -> tuple[int, bool, bool] | None:
    """Text-probe fallback: (max explicit shuffle-repartition width in the
    analyzed plan — 0 if none, has_coalesce, has_countless_by_expr), or
    None when even the plan TEXT is unreachable (e.g. Spark Connect) —
    callers must then answer conservatively rather than pretending the
    plan is layout-free.  Coalesce NARROWS the layout, so it must never
    count as an existing spread (round-2 code matched the bare substring
    "Repartition", which made spread() silently no-op on coalesce(1)
    plans — the exact Amdahl hazard it exists to prevent).  A count-less
    ``repartition(col)`` is flagged separately: it is a layout node whose
    runtime width AQE may coalesce to 1, so its presence must route to
    the tree walk (or a conservative False), never to the layout-free
    scan-split fast path."""
    try:
        text = df._jdf.queryExecution().analyzed().toString()
    except Exception:  # noqa: BLE001 — e.g. connect-only sessions
        return None
    by_expr = _REPART_BY_EXPR.findall(text)
    widths = [int(m) for m in _REPART_SHUFFLE.findall(text)]
    widths += [int(m) for m in by_expr if m]
    countless = any(not m for m in by_expr)
    return max(widths, default=0), bool(_COALESCE.search(text)), countless


def _governing_layout(df: DataFrame, threshold: int) -> tuple[list, bool]:
    """Governing layout widths of the analyzed logical plan, by walking
    the tree top-down via py4j.  Per root-to-leaf path, the TOPMOST
    layout node determines the path's output partitioning:

    * shuffle repartition with an explicit count → that width governs;
      its subtree is overridden (the walk stops there);
    * ``repartition(col)`` without a count → width 0 (conservative: AQE
      coalesces column-only repartition shuffles, so the runtime width
      can land on 1 regardless of spark.sql.shuffle.partitions);
    * coalesce(n) with n < threshold → hard narrow (width n governs);
      with n ≥ threshold it is width-TRANSPARENT (output = min(n,
      below), and n clears the bar, so the walk continues below it);
    * a leaf reached without passing any layout node → that path is
      governed by its scan — reported via the ``ungoverned`` flag so the
      caller folds in the file-split estimate (a union/join with one
      bare-scan branch must not be judged wide by its other branch).

    Raises on sessions where the JVM plan is unreachable (Spark
    Connect) — callers fall back to the text probe."""
    stack = [df._jdf.queryExecution().analyzed()]
    widths: list[int] = []
    ungoverned = False
    while stack:
        node = stack.pop()
        name = node.getClass().getSimpleName()
        if name == "ResolvedHint":
            # A broadcast-hinted subtree is the replicated side of a join:
            # its partitioning never reaches the consuming stage, so a
            # coalesce(1) on a broadcast dimension must not veto a wide
            # fact side.  Prune it (neither widths nor ungoverned); if the
            # WHOLE plan prunes away, the caller falls back to the scan
            # estimate.  Non-broadcast hints descend normally.
            try:
                hint = node.hints().toString().lower()
            except Exception:  # noqa: BLE001 — hint API shift
                hint = ""
            if "broadcast" in hint:
                continue
        if name == "Repartition":
            n = int(node.numPartitions())
            if node.shuffle() or n < threshold:
                widths.append(n)
                continue
            # width-transparent coalesce: descend, the subtree decides
        elif name == "RepartitionByExpression":
            opt = node.optNumPartitions()
            widths.append(int(opt.get()) if opt.isDefined() else 0)
            continue
        ch = node.children()
        if ch.length() == 0:
            ungoverned = True
        for i in range(ch.length()):
            stack.append(ch.apply(i))
    return widths, ungoverned


def has_parallelism(df: DataFrame, threshold: int) -> bool:
    """Does ``df``'s layout provide at least ``threshold``-way parallelism
    for the map stage that will consume it?  Pure metadata, no execution.

    Primary probe: one ``analyzed().toString()`` round trip; when the
    text mentions no layout node at all, the file-scan split estimate
    decides (the common case — no O(plan) py4j walk).  Otherwise walk
    the analyzed plan TREE and decide from the GOVERNING layout nodes
    (see :func:`_governing_layout`) — ordering is exact, so
    ``repartition(N).coalesce(1)`` is correctly narrow (the coalesce
    governs), ``coalesce(1).repartition(N)`` is correctly wide, a narrow
    governing ``repartition(2)`` overrides wide file splits, and a
    ``repartition(256).coalesce(64)`` chain is wide when 64 clears the
    threshold.  Every governed path must clear the threshold, and any
    path ending in a bare scan additionally requires the split estimate
    to clear it.

    Fallback (plan tree/text unreachable, e.g. Spark Connect): answer
    False — spread() then pays one explicit repartition, which is always
    safe; pretending such a plan is layout-free could leave the map
    stage on one partition.  No ``df.rdd.getNumPartitions()``:
    plan-to-RDD conversion per call, sidesteps AQE statistics."""
    probed = _plan_layout(df)
    if probed is None:
        return False  # cannot see the plan at all — force the spread
    width_txt, coalesced_txt, countless_txt = probed
    if width_txt == 0 and not coalesced_txt and not countless_txt:
        return _scan_split_estimate(df) >= threshold
    try:
        widths, ungoverned = _governing_layout(df, threshold)
    except Exception:  # noqa: BLE001 — text worked but tree didn't
        if coalesced_txt or countless_txt:
            # unordered text: any coalesce, or a column-only repartition
            # whose runtime width AQE may collapse → conservative
            return False
        if width_txt >= threshold:
            return True
        return _scan_split_estimate(df) >= threshold
    if widths and min(widths) < threshold:
        return False
    if ungoverned or not widths:
        return _scan_split_estimate(df) >= threshold
    return True


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
