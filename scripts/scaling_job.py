"""spark-submit job for the N-vs-4N scaling evidence (BASELINE.md protocol).

Run via::

    taskset -c <cpus> spark-submit --master local[<cores>] --py-files engine.zip \
        scripts/scaling_job.py <pages_parquet_dir> <cores> <runs> [residue mod]

Reads a pre-generated pages table (optionally only the url-hash shard
``pmod(xxhash64(url), mod) == residue`` — the executor-emulation protocol
gives each "executor" process a disjoint shard), runs the full extraction
pipeline to the noop sink, prints one JSON line with the best-of-<runs>
wall time for its shard.
"""

from __future__ import annotations

import json
import sys
import time

from pyspark.sql import SparkSession
from pyspark.sql import functions as F


def main() -> None:
    pages_dir, cores, runs = sys.argv[1], int(sys.argv[2]), int(sys.argv[3])
    residue = int(sys.argv[4]) if len(sys.argv) > 4 else None
    mod = int(sys.argv[5]) if len(sys.argv) > 5 else 4
    spark = (
        SparkSession.builder.appName(f"scaling-{cores}-{residue}")
        .config("spark.sql.shuffle.partitions", str(cores))
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.sql.execution.arrow.maxRecordsPerBatch", "1024")
        .config("spark.python.worker.reuse", "true")
        .config("spark.ui.enabled", "false")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("WARN")

    from ocr_spark.gen import bench_pages
    from ocr_spark.operators.extract import extract_pages

    pages = spark.read.parquet(pages_dir)
    if residue is not None:
        pages = pages.where(
            F.pmod(F.xxhash64("url"), F.lit(mod)) == F.lit(residue)
        )
    # fixed task granularity regardless of cluster size: a production job's
    # partitioning does not change when executors are added
    pages = pages.repartition(16 * (1 if residue is not None else mod))
    n_docs = pages.cache().count()

    # warm-up: spawn Python UDF workers + JIT before the timed window
    extract_pages(bench_pages(spark, 2000)).write.format("noop").mode(
        "overwrite"
    ).save()

    best = float("inf")
    for _ in range(runs):
        start = time.perf_counter()
        extract_pages(pages).write.format("noop").mode("overwrite").save()
        best = min(best, time.perf_counter() - start)

    print(
        json.dumps(
            {
                "cores": cores,
                "residue": residue,
                "docs": n_docs,
                "sec": round(best, 3),
                "docs_per_sec": round(n_docs / best, 1),
            }
        )
    )
    spark.stop()


if __name__ == "__main__":
    main()
