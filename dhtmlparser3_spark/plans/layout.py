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
    """Does ``df``'s layout provide at least ``threshold`` partitions?

    Fast path: if the file-scan split estimate alone reaches the threshold
    (the normal 100 TB case — many well-sized parquet files), answer yes
    with zero plan work.  Otherwise fall back to an exact
    ``df.rdd.getNumPartitions()`` probe — a plan-to-RDD conversion, paid
    only when the scan is small/absent (e.g. a mid-plan repartition that
    the file estimate cannot see).
    """
    if _scan_split_estimate(df) >= threshold:
        return True
    return df.rdd.getNumPartitions() >= threshold


def spread(df: DataFrame, factor: int = 2) -> DataFrame:
    """Round-robin repartition to ``factor x defaultParallelism`` iff the
    current layout has fewer partitions than the cluster has cores.

    A no-op on well-split inputs (real Iceberg/parquet tables at scale), so
    it is safe to apply unconditionally before expression-heavy stages; the
    shuffle it may introduce moves only the narrow pre-expansion rows.
    """
    sc = df.sparkSession.sparkContext
    target = sc.defaultParallelism * factor
    if has_parallelism(df, sc.defaultParallelism):
        return df
    return df.repartition(target)
