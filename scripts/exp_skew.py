"""Skew demonstration: host-clustered large documents vs the salted shuffle.

Builds a corpus where one "host" owns 5% of the docs but each of its docs
is ~20x larger (a heavy-host pattern real Common Crawl exhibits), written
CLUSTERED (sorted by host, few files) so scan splits inherit the skew.
Runs the extract job with repartition="none" vs "salted" and reports wall
time + task-time spread.

Usage: python scripts/exp_skew.py [cores]
"""
from __future__ import annotations

import sys
import time

sys.path.insert(0, "/root/repo")

from pyspark.sql import functions as F


def main(cores: int = 16):
    from dhtmlparser3_spark.functions.extract import (
        EXTRACT_SCHEMA,
        make_extract_iterator,
    )
    from dhtmlparser3_spark.plans.session import get_spark
    from dhtmlparser3_spark.sources.pages import build_pages

    spark = get_spark(app_name="exp-skew", cpus=cores)
    path = "/tmp/spark_graft_bench/pages_skew.parquet"
    import os

    if not os.path.exists(os.path.join(path, "_SUCCESS")):
        pages = build_pages(spark, "/root/testdata/sf0.1", multiplier=40)
        # 5% of docs belong to the heavy host: text inflated ~20x
        heavy = (F.xxhash64("url") % 20 == 0).alias("heavy")
        skewed = pages.withColumn("heavy", heavy).withColumn(
            "html",
            F.when(
                F.col("heavy"),
                F.encode(
                    F.concat(
                        F.lit("<html><body>"),
                        F.repeat(F.decode("html", "utf-8"), 20),
                        F.lit("</body></html>"),
                    ),
                    "utf-8",
                ),
            ).otherwise(F.col("html")),
        )
        # cluster by host-ness into FEW files: repartitionByRange on the
        # heavy flag + url sorts heavy docs together (the adversarial layout)
        skewed.repartitionByRange(8, "heavy", "url").write.mode(
            "overwrite"
        ).parquet(path)
    pages = spark.read.parquet(path).select("url", "warc_ts", "lang", "html")

    def run(mode):
        df = pages
        if mode == "salted":
            df = df.repartition(
                spark.sparkContext.defaultParallelism * 2,
                F.xxhash64(F.col("url"), F.lit(2024)),
            )
        return (
            df.mapInPandas(make_extract_iterator(), schema=EXTRACT_SCHEMA)
            .agg(F.count("*").alias("docs"), F.sum("n_chars_out"))
            .collect()[0]
        )

    for mode in ("none", "salted"):
        run(mode)  # warm
        best = None
        for _ in range(3):
            t0 = time.time()
            r = run(mode)
            dt = time.time() - t0
            best = dt if best is None else min(best, dt)
        print(f"SKEW {mode}: {best:.2f}s ({r.docs} docs)", flush=True)
    spark.stop()


if __name__ == "__main__":
    main(int(sys.argv[1]) if len(sys.argv) > 1 else 16)
