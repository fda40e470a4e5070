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


def has_parallelism(df: DataFrame, threshold: int) -> bool:
    """Does ``df``'s file layout provide at least ``threshold`` scan
    splits?  Pure metadata (file sizes vs maxPartitionBytes) — no
    plan-to-RDD conversion: ``df.rdd.getNumPartitions()`` would convert
    the logical plan per call and sidestep AQE statistics, so callers
    that cannot answer from file metadata should just repartition (the
    extra shuffle moves only narrow pre-expansion rows and is a no-op in
    cost next to the expression-heavy stage being protected)."""
    return _scan_split_estimate(df) >= threshold


def _plan_has_repartition(df: DataFrame) -> bool:
    """Does the ANALYZED plan already contain a repartition?  A plan-text
    probe (no execution, no plan-to-RDD conversion) that keeps spread()
    idempotent — the file-split estimate cannot see a mid-plan
    repartition."""
    try:
        return "Repartition" in df._jdf.queryExecution().analyzed().toString()
    except Exception:  # noqa: BLE001 — e.g. connect-only sessions
        return False


def spread(df: DataFrame, factor: int = 2) -> DataFrame:
    """Round-robin repartition to ``factor x defaultParallelism`` unless
    the file-scan split estimate already reaches the cluster's
    parallelism or the plan already repartitions.

    A no-op on well-split inputs (real Iceberg/parquet tables at scale),
    so it is safe to apply unconditionally before expression-heavy
    stages; both probes are pure metadata — the exact-but-expensive
    ``df.rdd.getNumPartitions()`` conversion (which also sidesteps AQE
    statistics) is never paid.
    """
    sc = df.sparkSession.sparkContext
    target = sc.defaultParallelism * factor
    if has_parallelism(df, sc.defaultParallelism) or _plan_has_repartition(df):
        return df
    return df.repartition(target)
