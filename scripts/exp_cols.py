"""Bisect which output column makes the python stage slow."""
from __future__ import annotations

import sys
import time

import pandas as pd
from pyspark.sql import functions as F

sys.path.insert(0, "/root/repo")


def main(cores: int):
    from bench import _ensure_pages
    from dhtmlparser3_spark.plans.session import get_spark

    spark = get_spark(app_name="exp-cols", cpus=cores)
    path = _ensure_pages(spark, "/root/testdata/sf0.1", 100)
    pages = spark.read.parquet(path).select("url", "warc_ts", "lang", "html")
    par = spark.sparkContext.defaultParallelism * 2
    rep = pages.repartition(par, F.xxhash64(F.col("url"), F.lit(2024)))

    variants = {
        "tiny": ("url string, n bigint", lambda pdf: {"url": pdf["url"], "n": [0] * len(pdf)}),
        "ts": (
            "url string, warc_ts timestamp, n bigint",
            lambda pdf: {"url": pdf["url"], "warc_ts": pdf["warc_ts"], "n": [0] * len(pdf)},
        ),
        "spans": (
            "url string, spans array<struct<node_id:int,src_start:int,src_end:int>>, n bigint",
            lambda pdf: {"url": pdf["url"], "spans": [[]] * len(pdf), "n": [0] * len(pdf)},
        ),
        "strings": (
            "url string, a string, b string, n bigint",
            lambda pdf: {
                "url": pdf["url"],
                "a": [""] * len(pdf),
                "b": [""] * len(pdf),
                "n": [0] * len(pdf),
            },
        ),
        "full_shape": (
            "url string, warc_ts timestamp, lang string, extracted_text string, "
            "main_text string, n_nodes int, n_tags int, n_text_nodes int, "
            "n_chars_out bigint, "
            "spans array<struct<node_id:int,src_start:int,src_end:int>>, error string",
            lambda pdf: {
                "url": pdf["url"],
                "warc_ts": pdf["warc_ts"],
                "lang": pdf["lang"],
                "extracted_text": [""] * len(pdf),
                "main_text": [""] * len(pdf),
                "n_nodes": [0] * len(pdf),
                "n_tags": [0] * len(pdf),
                "n_text_nodes": [0] * len(pdf),
                "n_chars_out": [0] * len(pdf),
                "spans": [[]] * len(pdf),
                "error": [None] * len(pdf),
            },
        ),
    }

    for name, (schema, make) in variants.items():
        def noop(batches, make=make):
            for pdf in batches:
                yield pd.DataFrame(make(pdf))

        df = rep.mapInPandas(noop, schema=schema).agg(F.count("*"))
        df.collect()  # warm
        times = []
        for _ in range(3):
            t0 = time.time()
            df.collect()
            times.append(time.time() - t0)
        print(f"COLS cores={cores} {name}: {min(times):.2f}s {['%.2f' % t for t in times]}", flush=True)
    spark.stop()


if __name__ == "__main__":
    main(int(sys.argv[1]))
