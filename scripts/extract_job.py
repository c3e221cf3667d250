"""Production entry point: resumable extraction via spark-submit.

Usage (the launch mode the north_rule mandates)::

    zip -qr engine.zip ocr_spark
    spark-submit --master <cluster> --py-files engine.zip \\
        scripts/extract_job.py <pages_location> <out_dir> <run_id> \\
        [num_parts] [parts_per_batch] [data_location]

``pages_location`` is a parquet directory or an ``iceberg:<catalog.db.tbl>``
location (ocr_spark.tables); ``data_location`` (optional) sends the
extracted DATA rows somewhere other than ``<out_dir>/data`` — e.g. an
``iceberg:`` table — while manifests/lineage stay in out_dir. The job is
idempotent per (out_dir): a killed run resumes at partition granularity
from the checkpoint manifest, and a completed multi-batch run has read the
raw input exactly once (staging — see ocr_spark.operators.runner). Prints
one JSON line with run stats (incl. per-phase stage_sec timings) and
per-partition lineage totals.
"""

from __future__ import annotations

import json
import pathlib
import sys
import time

REPO = pathlib.Path(__file__).resolve().parents[1]
sys.path.insert(0, str(REPO))


def main() -> None:
    if len(sys.argv) < 4:
        print(__doc__)
        sys.exit(2)
    pages_loc, out_dir, run_id = sys.argv[1:4]
    num_parts = int(sys.argv[4]) if len(sys.argv) > 4 else 64
    parts_per_batch = int(sys.argv[5]) if len(sys.argv) > 5 else num_parts
    data_location = sys.argv[6] if len(sys.argv) > 6 else None

    from pyspark.sql import functions as F

    from ocr_spark.operators.runner import (
        read_lineage, read_pages, run_extract,
    )
    from ocr_spark.session import build_session

    spark = build_session(app_name=f"ocr-spark-extract-{run_id}")
    try:
        t0 = time.perf_counter()
        res = run_extract(
            spark,
            read_pages(spark, pages_loc),
            out_dir,
            run_id=run_id,
            num_parts=num_parts,
            parts_per_batch=parts_per_batch,
            data_location=data_location,
        )
        lin = (
            read_lineage(spark, out_dir)
            .filter(F.col("status") == "ok")
            .agg(
                F.sum("input_rows").alias("input_rows"),
                F.sum("output_rows").alias("output_rows"),
                F.sum("bytes_in").alias("bytes_in"),
            )
            .collect()[0]
        )
        print(
            json.dumps(
                {
                    **res,
                    "wall_sec": round(time.perf_counter() - t0, 3),
                    "input_rows": int(lin["input_rows"] or 0),
                    "output_rows": int(lin["output_rows"] or 0),
                    "bytes_in": int(lin["bytes_in"] or 0),
                }
            )
        )
    finally:
        spark.stop()


if __name__ == "__main__":
    main()
