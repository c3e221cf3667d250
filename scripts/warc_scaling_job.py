"""One pinned ingest executor for scripts/warc_bench.py.

Reads a disjoint shard of a WARC archive (every n_execs-th file by sorted
index) through the full read path — binaryFile scan →
sources/warc.parse_warc → pages projection — materialized with the noop
sink, ``runs`` times; prints one JSON line with the best wall time and the
record count. Launched under ``taskset`` by warc_bench.py.

Usage: spark-submit warc_scaling_job.py <archive_dir> <cores> <runs>
       [residue n_execs]
"""

from __future__ import annotations

import json
import pathlib
import sys
import time

REPO = pathlib.Path(__file__).resolve().parents[1]
sys.path.insert(0, str(REPO))


def main() -> None:
    archive_dir = sys.argv[1]
    cores = int(sys.argv[2])
    runs = int(sys.argv[3])
    residue = int(sys.argv[4]) if len(sys.argv) > 4 else None
    n_execs = int(sys.argv[5]) if len(sys.argv) > 5 else 1

    from pyspark.sql import functions as F

    from ocr_spark.session import build_session
    from ocr_spark.sources import warc

    files = sorted(str(p) for p in pathlib.Path(archive_dir).glob("*.warc*"))
    if residue is not None:
        files = [f for i, f in enumerate(files) if i % n_execs == residue]

    spark = build_session(master=f"local[{cores}]",
                          app_name=f"warc-scaling-{residue}",
                          shuffle_partitions=cores)
    raw = spark.read.format("binaryFile").load(files)
    pages = warc.parse_warc(raw, "content").select(
        "url",
        F.to_timestamp("warc_date", "yyyy-MM-dd'T'HH:mm:ss'Z'")
        .alias("warc_ts"),
        "html",
    )
    n = pages.count()  # warm-up + the shard's record count
    best = None
    for _ in range(runs):
        t0 = time.perf_counter()
        pages.write.format("noop").mode("overwrite").save()
        dt = time.perf_counter() - t0
        best = dt if best is None or dt < best else best
    print(json.dumps({
        "residue": residue, "n_files": len(files), "rows": n,
        "best_sec": round(best, 3),
        "rate": round(n / best, 1),
    }))
    spark.stop()


if __name__ == "__main__":
    main()
