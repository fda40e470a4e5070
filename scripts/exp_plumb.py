"""Characterize the python-stage plumbing floor at a pinned width.

Runs a noop mapInPandas job repeatedly under different configs, reporting
per-run wall time, busy-CPU fraction during the run, and live python
worker count.
"""
from __future__ import annotations

import os
import subprocess
import sys
import time

import pandas as pd
from pyspark.sql import functions as F

sys.path.insert(0, "/root/repo")


def cpu_busy():
    with open("/proc/stat") as f:
        parts = f.readline().split()[1:]
    vals = list(map(int, parts))
    idle = vals[3] + vals[4]
    return sum(vals), idle


def nworkers():
    out = subprocess.run(
        ["bash", "-c", "ps ax | grep -c 'pyspark.daemon' "],
        capture_output=True,
        text=True,
    )
    return int(out.stdout.strip()) - 1


def main(cores: int, conf_name: str, extra: dict):
    from bench import _ensure_pages
    from dhtmlparser3_spark.plans.session import get_spark

    spark = get_spark(
        app_name=f"exp-plumb-{conf_name}", cpus=cores, extra_conf=extra
    )
    path = _ensure_pages(spark, "/root/testdata/sf0.1", 100)
    pages = spark.read.parquet(path).select("url", "warc_ts", "lang", "html")
    par = spark.sparkContext.defaultParallelism * 2
    rep = pages.repartition(par, F.xxhash64(F.col("url"), F.lit(2024)))

    schema = "url string, n bigint"

    def noop(batches):
        for pdf in batches:
            yield pd.DataFrame(
                {"url": pdf["url"], "n": [len(pdf)] * len(pdf)}
            )

    df = rep.mapInPandas(noop, schema=schema).agg(F.count("*"))
    times = []
    for i in range(4):
        t0 = time.time()
        tot0, idle0 = cpu_busy()
        df.collect()
        tot1, idle1 = cpu_busy()
        dt = time.time() - t0
        busy = 1 - (idle1 - idle0) / max(tot1 - tot0, 1)
        times.append(dt)
        print(
            f"PLUMB conf={conf_name} cores={cores} run{i}: {dt:.2f}s "
            f"busy={busy:.2f} workers={nworkers()}",
            flush=True,
        )
    spark.stop()


if __name__ == "__main__":
    cores = int(sys.argv[1])
    conf_name = sys.argv[2] if len(sys.argv) > 2 else "base"
    confs = {
        "base": {},
        "bigbatch": {"spark.sql.execution.arrow.maxRecordsPerBatch": "65536"},
        "parcores": {"spark.default.parallelism": str(cores)},
        "faulthandler_off": {"spark.python.worker.faulthandler.enabled": "false"},
        "nossl": {"spark.io.encryption.enabled": "false"},
    }
    main(cores, conf_name, confs[conf_name])
