"""Experiment: where does Spark's scaling loss come from at high core counts?

Variants, each a full extraction job over the same prebuilt pages corpus:
  A. current: salted repartition -> mapInPandas
  B. noshuffle: mapInPandas directly over scan partitions
  C. noshuffle_arrow: mapInArrow directly over scan partitions

Run pinned:  taskset -c 0-15 python scripts/exp_shuffle.py <variant> <cores>
"""
from __future__ import annotations

import sys
import time

from pyspark.sql import functions as F

sys.path.insert(0, "/root/repo")


def run(variant: str, cores: int, mult: int = 100):
    from bench import _ensure_pages
    from dhtmlparser3_spark.pipeline.extract_job import extract_pages
    from dhtmlparser3_spark.plans.session import get_spark

    sf_dir = "/root/testdata/sf0.1"
    spark = get_spark(app_name=f"exp-{variant}", cpus=cores)
    path = _ensure_pages(spark, sf_dir, mult)
    pages = spark.read.parquet(path)

    def job():
        if variant == "current":
            df = extract_pages(pages, with_metrics=False)
        elif variant == "noshuffle":
            from dhtmlparser3_spark.functions.extract import (
                EXTRACT_SCHEMA,
                make_extract_iterator,
            )

            df = pages.select("url", "warc_ts", "lang", "html").mapInPandas(
                make_extract_iterator(), schema=EXTRACT_SCHEMA
            )
        elif variant == "noshuffle_arrow":
            import pyarrow as pa

            from dhtmlparser3_spark.functions.extract import (
                EXTRACT_SCHEMA,
                decode_html,
                extract_one,
            )

            def arrow_iter(batches):
                import gc

                gc.disable()
                for b in batches:
                    urls = b.column("url")
                    ts = b.column("warc_ts")
                    lang = b.column("lang")
                    htmls = b.column("html")
                    rows = [extract_one(decode_html(h.as_py())) for h in htmls]
                    cols = list(zip(*rows)) if rows else [[]] * 8
                    yield pa.RecordBatch.from_arrays(
                        [
                            urls,
                            ts,
                            lang,
                            pa.array(cols[0], pa.string()),
                            pa.array(cols[1], pa.string()),
                            pa.array(cols[2], pa.int32()),
                            pa.array(cols[3], pa.int32()),
                            pa.array(cols[4], pa.int32()),
                            pa.array(cols[5], pa.int64()),
                            pa.array(
                                cols[6],
                                pa.list_(
                                    pa.struct(
                                        [
                                            ("node_id", pa.int32()),
                                            ("src_start", pa.int32()),
                                            ("src_end", pa.int32()),
                                        ]
                                    )
                                ),
                            ),
                            pa.array(cols[7], pa.string()),
                        ],
                        names=[
                            "url",
                            "warc_ts",
                            "lang",
                            "extracted_text",
                            "main_text",
                            "n_nodes",
                            "n_tags",
                            "n_text_nodes",
                            "n_chars_out",
                            "spans",
                            "error",
                        ],
                    )

            df = pages.select("url", "warc_ts", "lang", "html").mapInArrow(
                arrow_iter, schema=EXTRACT_SCHEMA
            )
        else:
            raise SystemExit(f"unknown variant {variant}")
        return df.agg(
            F.count("*").alias("docs"), F.sum("n_chars_out").alias("chars")
        ).collect()[0]

    # warm
    t0 = time.time()
    r = job()
    warm = time.time() - t0
    best = None
    for _ in range(2):
        t0 = time.time()
        r = job()
        dt = time.time() - t0
        best = dt if best is None else min(best, dt)
    print(
        f"RESULT variant={variant} cores={cores} docs={r.docs} "
        f"chars={r.chars} first={warm:.2f}s best={best:.2f}s "
        f"({r.docs / best:,.0f} docs/sec)",
        flush=True,
    )
    spark.stop()


if __name__ == "__main__":
    run(sys.argv[1], int(sys.argv[2]))
