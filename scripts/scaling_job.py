"""spark-submit job for the N-vs-4N scaling evidence (BASELINE.md protocol).

Run via::

    spark-submit --master local[8]  --py-files engine.zip scripts/scaling_job.py \
        <pages_parquet_dir> <cores> <runs>

Reads a pre-generated pages table, runs the full extraction pipeline to the
noop sink (full evaluation, nothing collected), and prints one JSON line
with the best-of-<runs> wall time. Generation is done once by
scripts/bench_scaling.py so both cluster sizes read byte-identical input.
"""

from __future__ import annotations

import json
import sys
import time

from pyspark.sql import SparkSession


def main() -> None:
    pages_dir, cores, runs = sys.argv[1], int(sys.argv[2]), int(sys.argv[3])
    spark = (
        SparkSession.builder.appName(f"scaling-{cores}")
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

    pages = spark.read.parquet(pages_dir).repartition(cores * 4)
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
                "docs": n_docs,
                "sec": round(best, 3),
                "docs_per_sec": round(n_docs / best, 1),
            }
        )
    )
    spark.stop()


if __name__ == "__main__":
    main()
