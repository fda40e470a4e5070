"""Isolate the serial floor: time sub-jobs at a given pinned width.

  scan_count      parquet scan -> count (no shuffle, no UDF)
  shuffle_only    scan -> salted repartition -> count
  udf_only        scan -> repartition -> mapInPandas(noop passthrough) -> agg
  full            scan -> repartition -> mapInPandas(extract) -> agg
"""
from __future__ import annotations

import sys
import time

from pyspark.sql import functions as F

sys.path.insert(0, "/root/repo")


def main(cores: int):
    from bench import _ensure_pages
    from dhtmlparser3_spark.functions.extract import (
        EXTRACT_SCHEMA,
        make_extract_iterator,
    )
    from dhtmlparser3_spark.plans.session import get_spark

    spark = get_spark(app_name=f"exp-stages-{cores}", cpus=cores)
    path = _ensure_pages(spark, "/root/testdata/sf0.1", 100)
    pages = spark.read.parquet(path).select("url", "warc_ts", "lang", "html")
    par = spark.sparkContext.defaultParallelism * 2
    rep = pages.repartition(par, F.xxhash64(F.col("url"), F.lit(2024)))

    import pandas as pd

    def noop(batches):
        for pdf in batches:
            n = len(pdf)
            yield pd.DataFrame(
                {
                    "url": pdf["url"],
                    "warc_ts": pdf["warc_ts"],
                    "lang": pdf["lang"],
                    "extracted_text": [""] * n,
                    "main_text": [""] * n,
                    "n_nodes": [0] * n,
                    "n_tags": [0] * n,
                    "n_text_nodes": [0] * n,
                    "n_chars_out": [0] * n,
                    "spans": [[]] * n,
                    "error": [None] * n,
                }
            )

    jobs = {
        "scan_count": lambda: pages.count(),
        "shuffle_only": lambda: rep.count(),
        "udf_noop": lambda: rep.mapInPandas(noop, schema=EXTRACT_SCHEMA)
        .agg(F.count("*"))
        .collect(),
        "full": lambda: rep.mapInPandas(
            make_extract_iterator(), schema=EXTRACT_SCHEMA
        )
        .agg(F.count("*"), F.sum("n_chars_out"))
        .collect(),
    }
    for name, j in jobs.items():
        j()  # warm
        best = None
        for _ in range(2):
            t0 = time.time()
            j()
            dt = time.time() - t0
            best = dt if best is None else min(best, dt)
        print(f"STAGE cores={cores} {name}: {best:.2f}s", flush=True)
    spark.stop()


if __name__ == "__main__":
    main(int(sys.argv[1]))
