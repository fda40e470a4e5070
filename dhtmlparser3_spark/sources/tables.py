"""Input-table readers: Iceberg-first, parquet fallback.

The production input (BASELINE.json ``north_rule``) is an Iceberg table of
Common-Crawl-style pages.  This sandbox ships no Iceberg runtime jars, so
the reader probes for the Iceberg data source and falls back to a plain
parquet path; everything downstream (the extract job, lineage, bench) takes
a DataFrame and is storage-agnostic.

What Iceberg adds at 100 TB, and where the code already assumes it:

* snapshot-isolated appends → pipeline/lineage.py's two-phase
  output-then-lineage commit collapses into one atomic snapshot
  (write_mode="iceberg" there);
* partition/metadata pruning → the same Catalyst pushdown we verify against
  parquet (PLANS.md §2) applies, plus manifest-level file skipping;
* incremental reads (snapshot range) → the Structured Streaming wrapper in
  streaming/stream_extract.py swaps its file source for
  ``spark.readStream.format("iceberg")`` unchanged.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

PAGES_COLUMNS = ["url", "warc_ts", "html", "text", "lang"]


def have_iceberg(spark: SparkSession) -> bool:
    """True iff the Iceberg DataSource is registered on this cluster."""
    try:
        spark._jvm.java.lang.Class.forName(
            "org.apache.iceberg.spark.source.IcebergSource"
        )
        return True
    except Exception:  # noqa: BLE001 — any jvm lookup failure = not present
        return False


def _looks_like_table_name(source: str) -> bool:
    """Catalog table identifiers (``db.pages``) vs filesystem paths: a
    path contains a separator or scheme; plain parquet datasets are
    normally DIRECTORIES (no ``.parquet`` suffix), so suffix-sniffing
    alone would mis-route every directory written by :func:`write_pages`
    to the Iceberg reader on an Iceberg-enabled cluster."""
    return "/" not in source and "\\" not in source and "://" not in source


def read_pages(
    spark: SparkSession, source: str, fmt: str = "auto"
) -> DataFrame:
    """Read the pages table from ``source``.

    fmt="iceberg": ``source`` is a catalog table name (db.pages) or table
    path; fmt="parquet": a file/directory of parquet; fmt="auto" uses
    Iceberg only when the runtime is present AND ``source`` looks like a
    catalog table identifier — any filesystem path routes to parquet
    (pass fmt="iceberg" explicitly for an Iceberg table addressed by
    path)."""
    if fmt == "auto":
        fmt = (
            "iceberg"
            if have_iceberg(spark) and _looks_like_table_name(source)
            else "parquet"
        )
    if fmt == "iceberg":
        return spark.read.format("iceberg").load(source)
    return spark.read.parquet(source)


def write_bucketed(
    df: DataFrame, table: str, key: str, n_buckets: int = 64
) -> None:
    """Persist ``df`` bucketed+sorted on ``key`` — repeated equi-joins or
    aggregations on that key then run with ZERO exchanges (verified:
    bucketed orders⋈customer plans 0 Exchange nodes vs 2 for plain
    parquet).  At 100 TB this is the difference between re-shuffling the
    fact table per query and never shuffling it again; Iceberg's
    bucket-partition transform gives the same property declaratively."""
    df.write.bucketBy(n_buckets, key).sortBy(key).mode("overwrite").saveAsTable(
        table
    )


def write_pages(df: DataFrame, target: str, fmt: str = "auto") -> None:
    """Append extracted rows to ``target`` (Iceberg table or parquet dir).
    Auto mode mirrors :func:`read_pages`: Iceberg only for catalog table
    identifiers, parquet for any filesystem path — so a directory written
    here always round-trips through read_pages."""
    if fmt == "auto":
        fmt = (
            "iceberg"
            if have_iceberg(df.sparkSession)
            and _looks_like_table_name(target)
            else "parquet"
        )
    if fmt == "iceberg":
        df.writeTo(target).append()
    else:
        df.write.mode("append").parquet(target)
