"""Where do python-stage tasks wait?

Variants:
  nohtml    — drop html before repartition (tiny rows through shuffle+Arrow)
  html      — keep html (full volume)
Both record per-task worker-side timings to /tmp/exp_wait_log/.
"""
from __future__ import annotations

import glob
import os
import shutil
import sys
import time

import pandas as pd
from pyspark.sql import functions as F

sys.path.insert(0, "/root/repo")

LOGDIR = "/tmp/exp_wait_log"


def noop_logged(batches):
    t_start = time.time()
    n = 0
    t_in_gen = 0.0
    t0 = time.time()
    for pdf in batches:
        t_in_gen += time.time() - t0
        n += len(pdf)
        yield pd.DataFrame({"n": [len(pdf)]})
        t0 = time.time()
    os.makedirs(LOGDIR, exist_ok=True)
    with open(f"{LOGDIR}/{os.getpid()}_{time.time_ns()}", "w") as f:
        f.write(f"{n} {time.time() - t_start:.3f} {t_in_gen:.3f}\n")


def main(cores: int):
    from bench import _ensure_pages
    from dhtmlparser3_spark.plans.session import get_spark

    spark = get_spark(app_name="exp-wait", cpus=cores)
    path = _ensure_pages(spark, "/root/testdata/sf0.1", 100)
    par = spark.sparkContext.defaultParallelism * 2

    for variant in ("nohtml", "html"):
        cols = ["url"] if variant == "nohtml" else ["url", "html"]
        pages = spark.read.parquet(path).select(*cols)

        def fresh_job():
            rep = pages.repartition(par, F.xxhash64(F.col("url"), F.lit(2024)))
            return (
                rep.mapInPandas(noop_logged, schema="n bigint")
                .agg(F.sum("n"))
                .collect()
            )

        fresh_job()  # warm
        for i in range(2):
            shutil.rmtree(LOGDIR, ignore_errors=True)
            t0 = time.time()
            fresh_job()
            dt = time.time() - t0
            # aggregate worker logs
            tot_wall, tot_wait = 0.0, 0.0
            ntasks = 0
            for fn in glob.glob(f"{LOGDIR}/*"):
                with open(fn) as f:
                    _, wall, wait = f.read().split()
                tot_wall += float(wall)
                tot_wait += float(wait)
                ntasks += 1
            print(
                f"WAIT {variant} run{i}: job={dt:.2f}s tasks={ntasks} "
                f"task-wall-sum={tot_wall:.1f}s waiting-for-batches-sum={tot_wait:.1f}s",
                flush=True,
            )
    spark.stop()


if __name__ == "__main__":
    main(int(sys.argv[1]))
