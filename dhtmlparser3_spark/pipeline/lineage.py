"""Checkpointed, idempotently-resumable extraction runs.

North-star requirement: "each micro-run checkpoints per-partition watermarks
and lineage (input file, row range, digest) ... so a killed job resumes
idempotently".

Design (Iceberg-shaped, parquet-implemented — this sandbox has no Iceberg
catalog; the commit protocol below is exactly what an Iceberg snapshot
append gives for free, and `write_mode="iceberg"` would collapse to a
single `writeTo(...).append()` of output+lineage in one transaction):

* Work is split into deterministic BUCKETS: ``bucket = xxhash64(url, salt)
  % n_buckets``.  A bucket is the unit of both salting (uniform spread →
  no host-level skew) and resume (the micro-run).
* Each micro-run processes one batch of buckets: extract → write output
  parquet under ``out/bucket=<b>/`` → then append one lineage row
  ``(run_id, bucket, input_path, n_docs, digest, ts)`` to the lineage
  table.  The lineage row is written ONLY after the bucket's output commit
  (parquet _SUCCESS), so the lineage table is always an UNDER-estimate of
  completed work — a crash between the two leaves an orphan bucket dir
  that is re-written (overwrite, idempotent) on resume, never duplicated.
* Resume = anti-join pending buckets against completed lineage rows
  (``left_anti`` on bucket id), then continue.
* The digest (SUM of per-url crc32 of extracted text — order-free like
  xor, and what both _process_bucket and verify_run compute) makes
  re-runs verifiable: re-extracting a completed bucket must reproduce
  its digest.

At 10^12 docs: buckets ≈ tens of thousands (each a few GB), lineage table
stays tiny, and every micro-run is one Spark job with bounded state —
the scheduler never holds the whole corpus in one plan.
"""

from __future__ import annotations

import os
import time
import uuid
from typing import Optional, Sequence

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from dhtmlparser3_spark.functions.extract import EXTRACT_SCHEMA, make_extract_iterator

LINEAGE_SCHEMA = (
    "run_id string, bucket int, input_path string, n_docs bigint, "
    "digest bigint, committed_at timestamp"
)


def with_bucket(pages: DataFrame, n_buckets: int, salt: int = 2024) -> DataFrame:
    return pages.withColumn(
        "bucket",
        F.pmod(F.xxhash64(F.col("url"), F.lit(salt)), F.lit(n_buckets)).cast("int"),
    )


def completed_buckets(spark: SparkSession, lineage_path: str) -> DataFrame:
    """Buckets with a committed lineage row (empty frame if none yet).

    ONLY a missing path means "no lineage yet" — a corrupt lineage file,
    permission error, or transient storage failure must PROPAGATE:
    swallowing it would mark every bucket pending, silently re-extract
    the whole corpus, and append duplicate lineage rows that verify_run
    then flags as corruption."""
    from pyspark.errors.exceptions.captured import AnalysisException

    local = "://" not in lineage_path
    if local and not os.path.exists(lineage_path):
        # fast check for local paths only — on a remote FS (s3://, hdfs://)
        # os.path.exists is always False and must not be consulted; the
        # read below handles remote path-not-found via the exception class
        return spark.createDataFrame([], "bucket int")
    try:
        return spark.read.parquet(lineage_path).select("bucket").distinct()
    except AnalysisException as e:
        msg = str(e)
        if "PATH_NOT_FOUND" in msg or "Path does not exist" in msg:
            return spark.createDataFrame([], "bucket int")
        raise


def pending_buckets(
    spark: SparkSession, pages: DataFrame, lineage_path: str, n_buckets: int
) -> list[int]:
    done = completed_buckets(spark, lineage_path)
    all_b = spark.range(n_buckets).select(F.col("id").cast("int").alias("bucket"))
    rows = all_b.join(done, "bucket", "left_anti").collect()
    return sorted(r.bucket for r in rows)


def run_extract_job(
    spark: SparkSession,
    pages: DataFrame,
    output_path: str,
    lineage_path: str,
    n_buckets: int = 16,
    input_path: str = "",
    max_buckets_per_run: Optional[int] = None,
    fail_after_buckets: Optional[int] = None,
) -> dict:
    """Resumable extraction: processes pending buckets, committing lineage
    per bucket.  ``fail_after_buckets`` simulates a mid-job kill (tests).

    Returns {run_id, processed, skipped, total}.
    """
    run_id = uuid.uuid4().hex[:12]
    bucketed = with_bucket(pages, n_buckets)
    pending = pending_buckets(spark, pages, lineage_path, n_buckets)
    skipped = n_buckets - len(pending)
    if max_buckets_per_run is not None:
        pending = pending[:max_buckets_per_run]

    processed = 0
    for i, b in enumerate(pending):
        if fail_after_buckets is not None and i >= fail_after_buckets:
            raise RuntimeError(f"simulated kill after {i} buckets")
        _process_bucket(
            spark, bucketed, b, output_path, lineage_path, run_id, input_path
        )
        processed += 1
    return {
        "run_id": run_id,
        "processed": processed,
        "skipped": skipped,
        "total": n_buckets,
    }


def _process_bucket(
    spark: SparkSession,
    bucketed: DataFrame,
    bucket: int,
    output_path: str,
    lineage_path: str,
    run_id: str,
    input_path: str,
) -> None:
    part = bucketed.where(F.col("bucket") == bucket).select(
        "url", "warc_ts", "lang", "html"
    )
    out = part.mapInPandas(make_extract_iterator(), schema=EXTRACT_SCHEMA)
    bucket_dir = os.path.join(output_path, f"bucket={bucket}")
    # overwrite → re-running a half-written bucket is idempotent
    out.write.mode("overwrite").parquet(bucket_dir)

    # digest computed from the COMMITTED files, not the in-flight frame
    written = spark.read.parquet(bucket_dir)
    agg = written.agg(
        F.count("*").alias("n"),
        F.coalesce(
            F.sum(F.crc32(F.concat_ws(" ", "url", "extracted_text"))),
            F.lit(0),
        ).alias("digest"),
    ).collect()[0]

    lineage_row = spark.createDataFrame(
        [
            (
                run_id,
                bucket,
                input_path,
                int(agg.n),
                int(agg.digest),
                time.time_ns() // 1000,
            )
        ],
        "run_id string, bucket int, input_path string, n_docs bigint, "
        "digest bigint, committed_us long",
    ).withColumn(
        "committed_at", F.timestamp_micros(F.col("committed_us"))
    ).drop("committed_us")
    # append AFTER the bucket output committed: lineage never over-claims
    lineage_row.write.mode("append").parquet(lineage_path)


def verify_run(
    spark: SparkSession, output_path: str, lineage_path: str
) -> DataFrame:
    """Recompute each committed bucket's digest from its output files and
    join against the lineage claim — any mismatch row is corruption."""
    out = spark.read.parquet(output_path)
    # parquet partition discovery yields the bucket column from the path
    recomputed = out.groupBy("bucket").agg(
        F.count("*").alias("n_actual"),
        F.sum(F.crc32(F.concat_ws(" ", "url", "extracted_text"))).alias(
            "digest_actual"
        ),
    )
    lineage = spark.read.parquet(lineage_path).select("bucket", "n_docs", "digest")
    return (
        recomputed.join(lineage, "bucket")
        .where(
            (F.col("n_actual") != F.col("n_docs"))
            | (F.col("digest_actual") != F.col("digest"))
        )
    )
