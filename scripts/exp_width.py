"""Width-degradation diagnostic: where do the extra seconds at 16 cores go?

Observed (bench_history/2026-08-17_run6_scaling_only.json): spark_vs_ceiling
falls 0.82 -> 0.55 -> 0.29 over 8 -> 16 -> 32 pinned cores in some VM
windows, while the pure-mp ceiling scales at 0.81 — a Spark-side,
width-dependent cost.  This experiment isolates the stage that stops
scaling by interleaving variants at one pinned width, all in subprocesses
(one JVM each, full-run warmup, best of N):

  scan      parquet scan -> sum(length(html))          (JVM columnar only)
  shuffle   scan -> salted repartition -> same agg     (adds the exchange)
  udf       scan -> mapInPandas extract -> agg         (adds Python, no shuffle)
  full      scan -> repartition -> extract -> agg      (the benchmarked job)
  fullpgc   full with -XX:+UseParallelGC               (GC hypothesis)

Usage: python scripts/exp_width.py [cores [reps]]   (default 16 2)
"""

import json
import os
import subprocess
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _child(variant: str, cores: int) -> None:
    sys.path.insert(0, REPO)
    from pyspark.sql import functions as F

    from dhtmlparser3_spark.pipeline.extract_job import extract_pages
    from dhtmlparser3_spark.plans.session import get_spark

    import bench

    extra = {"spark.sql.adaptive.enabled": "false",
             "spark.shuffle.compress": "false"}
    if variant == "fullpgc":
        extra["spark.driver.extraJavaOptions"] = "-XX:+UseParallelGC"
    spark = get_spark(
        app_name=f"exp-width-{variant}-{cores}",
        cpus=cores,
        arrow_batch_rows=32768,
        extra_conf=extra,
    )
    path = bench._ensure_pages(spark, "/root/testdata/sf0.1", 200)
    pages = spark.read.parquet(path)

    def job():
        if variant == "scan":
            df = pages.agg(F.sum(F.length("html")).alias("b"))
        elif variant == "shuffle":
            df = pages.repartition(
                cores, F.xxhash64(F.col("url"), F.lit(2024))
            ).agg(F.sum(F.length("html")).alias("b"))
        else:
            rep = "none" if variant.startswith("udf") else "salted"
            io = "pandas" if variant.endswith("pd") else "arrow"
            df = extract_pages(
                pages, parallelism=cores, with_metrics=False,
                repartition=rep, io=io,
            ).agg(
                F.count("*").alias("docs"),
                F.sum("n_chars_out").alias("chars"),
            )
        return df.collect()[0]

    job()  # full warmup (C2 JIT)
    secs = []
    for _ in range(3):
        t0 = time.time()
        job()
        secs.append(round(time.time() - t0, 3))
    print(json.dumps({"variant": variant, "cores": cores, "secs": secs}))
    spark.stop()


def main() -> None:
    if len(sys.argv) > 1 and sys.argv[1] == "_child":
        _child(sys.argv[2], int(sys.argv[3]))
        return
    cores = int(sys.argv[1]) if len(sys.argv) > 1 else 16
    reps = int(sys.argv[2]) if len(sys.argv) > 2 else 2
    variants = os.environ.get(
        "EXP_WIDTH_VARIANTS", "udf,udfpd,full,fullpd"
    ).split(",")
    best: dict = {v: [] for v in variants}
    for r in range(reps):
        for v in variants:
            out = subprocess.run(
                ["taskset", "-c", f"0-{cores - 1}", sys.executable,
                 os.path.abspath(__file__), "_child", v, str(cores)],
                capture_output=True, text=True, check=True,
            )
            rec = json.loads(out.stdout.strip().splitlines()[-1])
            best[v].append(rec["secs"])
            print(f"rep {r} {v:8s} @ {cores} cores: {rec['secs']}", flush=True)
    summary = {v: min(min(s) for s in best[v]) for v in variants}
    print(json.dumps({"cores": cores, "min_secs": summary, "all": best}))


if __name__ == "__main__":
    main()
