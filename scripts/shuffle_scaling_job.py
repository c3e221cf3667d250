"""spark-submit job for the SHUFFLE-path scaling evidence (BENCH/SHUFFLE.md).

Run via::

    taskset -c <cpus> spark-submit --master local[<cores>] \
        --py-files engine.zip scripts/shuffle_scaling_job.py \
        <docs_parquet_dir> <cores> <runs> <shuffle_partitions>

Reads a pre-generated documents table and runs the production-width
MinHash near-dup keeper pass (operators/corpus.near_keepers, 64 perms /
16 bands) to a count — signatures (map) → band-key explode → groupBy
(bi, band) → join back → groupBy(doc) → join docs: several REAL exchanges,
unlike the map-only extraction/WARC scaling jobs. Prints one JSON line
with the best-of-<runs> wall time.

The shuffle partition count is FIXED across parallelism levels (passed in,
not derived from cores) so both sides execute the same physical plan and
only the task-slot count differs — the ratio then measures exchange +
compute scaling, not a plan change.
"""

from __future__ import annotations

import json
import sys
import time

from pyspark.sql import SparkSession


def main() -> None:
    docs_dir, cores, runs, parts = (
        sys.argv[1], int(sys.argv[2]), int(sys.argv[3]), int(sys.argv[4])
    )
    spark = (
        SparkSession.builder.appName(f"shuffle-scaling-{cores}")
        .config("spark.sql.shuffle.partitions", str(parts))
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.ui.enabled", "false")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("WARN")
    from ocr_spark.operators.corpus import near_keepers

    docs = spark.read.parquet(docs_dir)
    n = docs.count()  # warms the file listing; not part of the timed job
    best = None
    kept = None
    for _ in range(runs):
        t0 = time.monotonic()
        kept = near_keepers(docs, num_perms=64, bands=16).count()
        sec = time.monotonic() - t0
        best = sec if best is None or sec < best else best
    print(
        json.dumps(
            {
                "docs": n,
                "kept": kept,
                "cores": cores,
                "sec": round(best, 3),
                "docs_per_sec": round(n / best, 1),
            }
        )
    )
    spark.stop()


if __name__ == "__main__":
    main()
