"""Where does the 16-core record-config run lose ~0.7 s vs its ceiling?

Round-4 gate runs show spark_vs_ceiling ~0.77 at 16 pinned cores vs ~0.81
at 4 — a width-dependent gap that caps raw 4→16 at ~0.95×hw.  Suspects:

  * straggle: with TILE=1 the job runs 2 waves of even-byte splits; a
    slow task in wave 2 adds its full overhang to the wall.  More, smaller
    waves smooth stragglers at the cost of more per-task fixed overhead
    (Python-worker checkout + Arrow writer setup).
  * GC: 16-wide allocation in one JVM vs 4-wide.

This script interleaves wave-count variants (and optionally ParallelGC) at
one pinned width in fresh subprocesses (full-run warmup, best-of-N), and
pulls per-task durations of the UDF stage from the REST API so straggle is
MEASURED, not inferred:

  ideal  = sum(task run time) / cores     (perfect packing)
  wall   = measured job wall
  straggle = wall - ideal                 (scheduling + packing + tail)

Usage: python scripts/exp_waves.py [cores [reps]]      (default 16 3)
       variants via EXP_VARIANTS, e.g. "w2,w3,w4,w2pgc"
"""
from __future__ import annotations

import json
import os
import subprocess
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _child(variant: str, cores: int, reps: int) -> None:
    sys.path.insert(0, REPO)
    from pyspark.sql import functions as F

    from dhtmlparser3_spark.pipeline.extract_job import extract_pages
    from dhtmlparser3_spark.plans.session import get_spark

    import bench

    # variant grammar: w<waves>[b<batch_k>][pgc], e.g. w2, w4, w2b64, w2pgc
    waves = int(variant[1])
    extra = {
        "spark.sql.adaptive.enabled": "false",
        "spark.ui.enabled": "true",  # REST task metrics
    }
    from dhtmlparser3_spark.plans.session import _default_local_dir

    if "/dev/shm" in _default_local_dir():
        extra["spark.shuffle.compress"] = "false"
    if variant.endswith("pgc"):
        extra["spark.driver.extraJavaOptions"] = "-XX:+UseParallelGC"
    batch = 32768
    if "b" in variant[2:]:
        batch = 1024 * int(
            variant.split("b")[1].replace("pgc", "") or "32"
        )
    spark = get_spark(
        app_name=f"exp-waves-{variant}-{cores}",
        cpus=cores,
        arrow_batch_rows=batch,
        extra_conf=extra,
    )
    path = bench._ensure_pages(spark, "/root/testdata/sf0.1", 200)
    fs = [
        os.path.join(path, f)
        for f in os.listdir(path)
        if f.startswith("part-")
    ]
    open_cost = 4 << 20
    total_eff = sum(os.path.getsize(f) for f in fs) + open_cost * len(fs)
    tile = max(open_cost, total_eff // (waves * cores) + 1)
    spark.conf.set("spark.sql.files.maxPartitionBytes", str(tile))
    pages = spark.read.parquet(path)

    def job():
        return (
            extract_pages(
                pages, parallelism=cores, with_metrics=False,
                repartition="none",
            )
            .agg(
                F.count("*").alias("docs"),
                F.sum(F.crc32("extracted_text")).alias("checksum"),
            )
            .collect()[0]
        )

    job()  # full warmup (C2)
    best, secs = None, []
    for _ in range(reps):
        t0 = time.time()
        r = job()
        dt = time.time() - t0
        secs.append(round(dt, 3))
        best = dt if best is None else min(best, dt)

    # task metrics of the LAST job's UDF stage via REST
    import urllib.request

    def _get(p):
        base = spark.sparkContext.uiWebUrl
        with urllib.request.urlopen(base + "/api/v1" + p) as r:
            return json.load(r)

    app = spark.sparkContext.applicationId
    stages = _get(f"/applications/{app}/stages?status=complete")
    # the UDF stage of the final timed job = the completed stage with the
    # most input bytes, highest stage id
    udf = max(
        stages,
        key=lambda s: (s.get("inputBytes", 0), s["stageId"]),
    )
    tasks = _get(
        f"/applications/{app}/stages/{udf['stageId']}"
        f"/{udf['attemptId']}/taskList?length=5000"
    )
    durs = sorted(t["duration"] / 1000.0 for t in tasks)
    ideal = sum(durs) / cores
    print(
        json.dumps(
            {
                "variant": variant,
                "cores": cores,
                "docs": int(r.docs),
                "checksum": int(r.checksum),
                "secs": secs,
                "best": round(best, 3),
                "n_tasks": len(durs),
                "task_min": round(durs[0], 2),
                "task_med": round(durs[len(durs) // 2], 2),
                "task_max": round(durs[-1], 2),
                "ideal_packed": round(ideal, 2),
                "straggle_vs_last_run": round(secs[-1] - ideal, 2),
            }
        ),
        flush=True,
    )
    spark.stop()


def main():
    if len(sys.argv) > 1 and sys.argv[1] == "_child":
        _child(sys.argv[2], int(sys.argv[3]), int(sys.argv[4]))
        return
    cores = int(sys.argv[1]) if len(sys.argv) > 1 else 16
    reps = int(sys.argv[2]) if len(sys.argv) > 2 else 3
    variants = os.environ.get("EXP_VARIANTS", "w2,w3,w4").split(",")
    rounds = int(os.environ.get("EXP_ROUNDS", "2"))
    out: dict[str, list] = {}
    for rnd in range(rounds):
        for v in variants:  # interleaved: same-window comparison
            r = subprocess.run(
                [
                    "taskset", "-c", f"0-{cores - 1}",
                    sys.executable, os.path.abspath(__file__),
                    "_child", v, str(cores), str(reps),
                ],
                capture_output=True, text=True, check=True,
            )
            rec = json.loads(r.stdout.strip().splitlines()[-1])
            out.setdefault(v, []).append(rec)
            print(f"round {rnd} {v}: best {rec['best']}s "
                  f"(ideal {rec['ideal_packed']}, straggle "
                  f"{rec['straggle_vs_last_run']}, tasks {rec['n_tasks']}, "
                  f"med {rec['task_med']} max {rec['task_max']})",
                  file=sys.stderr, flush=True)
    for v, recs in out.items():
        print(json.dumps({v: recs}))


if __name__ == "__main__":
    main()
