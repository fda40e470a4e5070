"""Config sweep for the full extract job at a pinned width.

Interleaved best-of-N to fight VM noise. Fresh DataFrame per run (no
shuffle-stage reuse).
"""
from __future__ import annotations

import sys
import time

from pyspark.sql import functions as F

sys.path.insert(0, "/root/repo")


def make_jobs(spark, path):
    from dhtmlparser3_spark.functions.extract import (
        EXTRACT_SCHEMA,
        make_extract_iterator,
    )

    pages = spark.read.parquet(path).select("url", "warc_ts", "lang", "html")
    par2 = spark.sparkContext.defaultParallelism * 2
    par4 = spark.sparkContext.defaultParallelism * 4

    def agg(df):
        return df.agg(
            F.count("*").alias("docs"), F.sum("n_chars_out").alias("chars")
        ).collect()[0]

    def shuffled(par):
        def run():
            rep = pages.repartition(
                par, F.xxhash64(F.col("url"), F.lit(2024))
            )
            return agg(
                rep.mapInPandas(make_extract_iterator(), schema=EXTRACT_SCHEMA)
            )

        return run

    def noshuffle():
        return agg(
            pages.mapInPandas(make_extract_iterator(), schema=EXTRACT_SCHEMA)
        )

    return {"shuf2x": shuffled(par2), "shuf4x": shuffled(par4), "noshuf": noshuffle}


def main(cores: int):
    from bench import _ensure_pages
    from dhtmlparser3_spark.plans.session import get_spark

    results = {}
    # two sessions: default batch 8192 vs small batch 2048 + tuned splits
    sessions = {
        "b8192": dict(),
        "b2048_splits": {
            "spark.sql.execution.arrow.maxRecordsPerBatch": "2048",
            "spark.sql.files.maxPartitionBytes": "2m",
            "spark.sql.files.openCostInBytes": "131072",
        },
        "b8192_splits": {
            "spark.sql.files.maxPartitionBytes": "2m",
            "spark.sql.files.openCostInBytes": "131072",
        },
    }
    for sname, conf in sessions.items():
        spark = get_spark(
            app_name=f"sweep-{sname}", cpus=cores, extra_conf=conf
        )
        path = _ensure_pages(spark, "/root/testdata/sf0.1", 100)
        jobs = make_jobs(spark, path)
        for jn, j in jobs.items():
            j()  # warm
        for p in range(3):
            for jn, j in jobs.items():
                t0 = time.time()
                r = j()
                dt = time.time() - t0
                key = f"{sname}/{jn}"
                results.setdefault(key, []).append(dt)
                print(f"SWEEP pass{p} {key}: {dt:.2f}s", flush=True)
        spark.stop()
    print("---- best ----", flush=True)
    for k, v in sorted(results.items(), key=lambda kv: min(kv[1])):
        print(f"BEST {k}: {min(v):.2f}s  all={['%.2f' % x for x in v]}", flush=True)


if __name__ == "__main__":
    main(int(sys.argv[1]))
