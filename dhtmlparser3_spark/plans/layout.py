"""Physical-layout helpers shared by corpus builders and queries.

The sandbox sf tables are single parquet files → single scan splits; any
expression-heavy map work downstream (shingling HOFs, embedding folds)
would run on ONE core and Amdahl-cap the whole query.  At 100 TB the same
hazard appears after a selective filter or a small dimension read.  The
rule: spread a DataFrame before expensive per-row work whenever its scan
parallelism is below the cluster's.
"""

from __future__ import annotations

from pyspark.sql import DataFrame


def spread(df: DataFrame, factor: int = 2) -> DataFrame:
    """Round-robin repartition to ``factor x defaultParallelism`` iff the
    current layout has fewer partitions than the cluster has cores.

    A no-op on well-split inputs (real Iceberg/parquet tables at scale), so
    it is safe to apply unconditionally before expression-heavy stages; the
    shuffle it may introduce moves only the narrow pre-expansion rows.
    """
    sc = df.sparkSession.sparkContext
    target = sc.defaultParallelism * factor
    if df.rdd.getNumPartitions() >= sc.defaultParallelism:
        return df
    return df.repartition(target)
