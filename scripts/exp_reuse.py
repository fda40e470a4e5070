"""Are python workers reused across jobs? Track daemon-child PIDs."""
from __future__ import annotations

import subprocess
import sys
import time

import pandas as pd
from pyspark.sql import functions as F

sys.path.insert(0, "/root/repo")


def worker_pids():
    out = subprocess.run(
        ["bash", "-c",
         "for p in $(pgrep -f 'pyspark.daemon'); do "
         "pgrep -P $p; done"],
        capture_output=True, text=True,
    )
    return sorted(int(x) for x in out.stdout.split())


def main(cores: int):
    from bench import _ensure_pages
    from dhtmlparser3_spark.plans.session import get_spark

    spark = get_spark(app_name="exp-reuse", cpus=cores)
    path = _ensure_pages(spark, "/root/testdata/sf0.1", 100)
    pages = spark.read.parquet(path).select("url", "warc_ts", "lang", "html")
    par = spark.sparkContext.defaultParallelism * 2

    def noop(batches):
        for pdf in batches:
            yield pd.DataFrame({"url": pdf["url"], "n": [0] * len(pdf)})

    def fresh_job():
        rep = pages.repartition(par, F.xxhash64(F.col("url"), F.lit(2024)))
        return (
            rep.mapInPandas(noop, schema="url string, n bigint")
            .agg(F.count("*"))
            .collect()
        )

    for i in range(4):
        t0 = time.time()
        fresh_job()
        dt = time.time() - t0
        pids = worker_pids()
        print(
            f"REUSE run{i}: {dt:.2f}s workers={len(pids)} "
            f"pids={pids[:6]}...",
            flush=True,
        )
    spark.stop()


if __name__ == "__main__":
    main(int(sys.argv[1]))
