"""Generic as-of join — an operator Spark lacks natively.

``asof_join(left, right, on, ts)`` attaches, to every left row, the most
recent right row with the same key and ``right.ts <= left.ts`` (DuckDB
``ASOF JOIN`` semantics, which is also the oracle used by the driver
query — an INDEPENDENT implementation, not a SQL transliteration).

Physical shape: tag both sides, union, ONE window per key ordered by
(ts, side) carrying ``last(right-struct, ignorenulls)`` — a single shuffle
on the join key, never the O(|L|·|R|) per-key blowup of the naive
range-join formulation (``l.ts >= r.ts`` inequality joins explode on hot
keys; a 10^6-event user would produce 10^12 candidate pairs).  The right
payload travels as ONE struct so a NULL inside a matched row can never
splice values from different right rows.

Equal timestamps match (at-or-before); right rows should be unique per
(key, ts) — pre-dedup otherwise, as the driver query does — because any
tie-break among simultaneous right rows is engine-ambiguous.
"""

from __future__ import annotations

from typing import List, Optional

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def asof_join(
    left: DataFrame,
    right: DataFrame,
    on: List[str],
    ts_col: str = "ts",
    value_cols: Optional[List[str]] = None,
    suffix: str = "_matched",
) -> DataFrame:
    """Left rows + ``<value>_matched`` columns (and ``<ts>_matched``) from
    the latest right row at-or-before each left row's timestamp; NULL when
    no prior right row exists for the key."""
    on = list(on)
    if value_cols is None:
        value_cols = [c for c in right.columns if c not in on + [ts_col]]
    left_extra = [c for c in left.columns if c not in on + [ts_col]]
    ltypes = {f.name: f.dataType for f in left.schema.fields}

    rv = F.struct(
        F.col(ts_col).alias("__ts"), *[F.col(c) for c in value_cols]
    )
    r2 = right.select(
        *on,
        ts_col,
        *[F.lit(None).cast(ltypes[c]).alias(c) for c in left_extra],
        F.lit(0).alias("_side"),
        rv.alias("_rv"),
    )
    l2 = left.select(
        *on,
        ts_col,
        *left_extra,
        F.lit(1).alias("_side"),
        F.lit(None).cast(r2.schema["_rv"].dataType).alias("_rv"),
    )
    u = l2.unionByName(r2.select(*l2.columns))
    w = (
        Window.partitionBy(*on)
        .orderBy(F.col(ts_col).asc(), F.col("_side").asc())
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    m = F.last("_rv", ignorenulls=True).over(w)
    return (
        u.withColumn("_m", m)
        .where(F.col("_side") == 1)
        .select(
            *on,
            ts_col,
            *left_extra,
            *[F.col("_m")[c].alias(c + suffix) for c in value_cols],
            F.col("_m")["__ts"].alias(ts_col + suffix),
        )
    )
