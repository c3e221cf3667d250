"""Partition-granular extraction runner: lineage + checkpoint manifest + resume
(SURVEY.md §2 ops 4, 5, 6, 22; §3.2 steps 3 and 8; north_rule "resumable from
checkpoint with per-partition lineage + metrics").

Layout of an output table directory::

    <out_dir>/data/part_id=<N>/*.parquet     -- extracted rows (op 4)
    <out_dir>/_manifest/part-<N>.json        -- commit record, atomic rename (op 6)
    <out_dir>/_lineage/*.parquet             -- lineage rows (op 5, LINEAGE_SCHEMA)

Crash-safety contract:

- a partition is COMMITTED iff its manifest file exists;
- batches are written with Spark's dynamic partition overwrite, so re-running
  an uncommitted partition replaces any half-written files from a killed
  attempt instead of appending duplicates (idempotent per-partition commit);
- the manifest file is written tmp-then-``os.replace`` (atomic on POSIX), so
  readers never observe a torn commit record;
- resume = anti-join of committed part_ids (a ``part_id NOT IN`` filter —
  pure partition pruning on the part_id-partitioned layout, no data shuffle).

part_id = pmod(xxhash64(url), num_parts) is independent of cluster size and
task layout, so a manifest written at N executors resumes correctly at 4N.

At 100 TB scale: lineage stats are aggregated from a column-pruned read-back
of the just-written parquet (reads only part_id/bytes_in/n_blocks footers +
columns), never from a second scan of the raw input.
"""

from __future__ import annotations

import datetime as dt
import json
import os
import pathlib
import time
from collections.abc import Callable, Sequence

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ocr_spark.operators.extract import (
    DEFAULT_NUM_PARTS,
    extract_pages,
    with_part_id,
)
from ocr_spark.schemas import LINEAGE_SCHEMA, PAGES_SCHEMA


class Manifest:
    """Checkpoint manifest: one JSON commit record per completed partition."""

    def __init__(self, out_dir: str | os.PathLike) -> None:
        self.dir = pathlib.Path(out_dir) / "_manifest"

    def completed_parts(self) -> dict[int, dict]:
        out: dict[int, dict] = {}
        if not self.dir.is_dir():
            return out
        for p in sorted(self.dir.glob("part-*.json")):
            try:
                rec = json.loads(p.read_text())
                out[int(rec["part_id"])] = rec
            except (ValueError, KeyError):
                continue  # torn/foreign file: treated as not committed
        return out

    def commit(self, rec: dict) -> None:
        """Atomically record one partition as committed (op 6)."""
        self.dir.mkdir(parents=True, exist_ok=True)
        final = self.dir / f"part-{int(rec['part_id']):05d}.json"
        tmp = final.with_suffix(".json.tmp")
        tmp.write_text(json.dumps(rec, sort_keys=True))
        os.replace(tmp, final)  # atomic on POSIX


def read_pages(spark: SparkSession, path: str) -> DataFrame:
    """Op 1: read a pages table. Iceberg runtime jar absent in this sandbox
    (SURVEY.md §0) — parquet with the manifest layer above stands in; with
    the jar present this becomes ``spark.read.format("iceberg").load``."""
    return spark.read.schema(PAGES_SCHEMA).parquet(path)


def read_extracted(spark: SparkSession, out_dir: str) -> DataFrame:
    """The extracted table with its spec'd schema (EXTRACTED_SCHEMA).

    The physical parquet carries one extra ``bytes_in`` column so lineage can
    be aggregated from a column-pruned read-back instead of a second scan of
    the raw input; it is an accounting detail, not part of the table surface.
    """
    return spark.read.parquet(str(pathlib.Path(out_dir) / "data")).drop(
        "bytes_in"
    )


def read_lineage(spark: SparkSession, out_dir: str) -> DataFrame:
    return spark.read.schema(LINEAGE_SCHEMA).parquet(
        str(pathlib.Path(out_dir) / "_lineage")
    )


def _chunks(seq: Sequence[int], size: int) -> list[list[int]]:
    return [list(seq[i : i + size]) for i in range(0, len(seq), size)]


def run_extract(
    spark: SparkSession,
    pages: DataFrame,
    out_dir: str,
    run_id: str,
    num_parts: int = DEFAULT_NUM_PARTS,
    parts_per_batch: int = 16,
    repartition: int | None = None,
    after_batch: Callable[[list[int]], None] | None = None,
) -> dict:
    """Run (or resume) the extraction job over ``pages`` into ``out_dir``.

    Returns ``{"run_id", "parts_done_before", "parts_done_now", "batches"}``.
    ``after_batch`` is a test hook called after each batch commit (used by the
    kill/resume tests to abort mid-run).
    """
    out = pathlib.Path(out_dir)
    data_dir = str(out / "data")
    lineage_dir = str(out / "_lineage")
    manifest = Manifest(out)

    done_before = sorted(manifest.completed_parts())
    todo = [p for p in range(num_parts) if p not in set(done_before)]

    pages = with_part_id(pages, num_parts)

    old_mode = spark.conf.get("spark.sql.sources.partitionOverwriteMode", "static")
    spark.conf.set("spark.sql.sources.partitionOverwriteMode", "dynamic")
    try:
        batches = _chunks(todo, parts_per_batch)
        for batch in batches:
            started = dt.datetime.now(dt.timezone.utc).replace(tzinfo=None)
            t0 = time.perf_counter()
            try:
                sub = pages.where(F.col("part_id").isin(batch))
                ex = extract_pages(sub, num_parts=num_parts,
                                   repartition=repartition, stats=True)
                # cluster output by part_id before the partitioned write:
                # without it every task writes a file into every part dir
                # (tasks x parts small files — measured 7x slower and 32x
                # the file count). The shuffle moves extracted text, a
                # fraction of the input bytes.
                # dynamic overwrite: replaces exactly the part_id=N dirs in
                # this batch — idempotent re-run after a crash, no
                # duplicate rows
                ex.repartition(len(batch), "part_id").write.mode(
                    "overwrite"
                ).partitionBy("part_id").parquet(data_dir)
            except Exception:
                # record the failure in the metrics table, then surface it;
                # the partitions stay uncommitted so a rerun redoes them
                ts = dt.datetime.now(dt.timezone.utc).replace(tzinfo=None)
                failed = [
                    (part, run_id, 0, 0, 0, started, ts, "failed", 0.0)
                    for part in batch
                ]
                spark.createDataFrame(
                    failed, schema=LINEAGE_SCHEMA
                ).coalesce(1).write.mode("append").parquet(lineage_dir)
                raise
            elapsed = time.perf_counter() - t0
            finished = dt.datetime.now(dt.timezone.utc).replace(tzinfo=None)

            # column-pruned read-back of the freshly written batch
            stats_rows = (
                spark.read.parquet(data_dir)
                .where(F.col("part_id").isin(batch))
                .groupBy("part_id")
                .agg(
                    F.count(F.lit(1)).alias("rows"),
                    F.sum("bytes_in").alias("bytes_in"),
                )
                .collect()
            )
            stats = {r["part_id"]: r for r in stats_rows}
            lineage_rows = []
            for part in batch:
                r = stats.get(part)
                n_rows = int(r["rows"]) if r is not None else 0
                n_bytes = int(r["bytes_in"]) if r is not None else 0
                lineage_rows.append(
                    (
                        part, run_id, n_rows, n_rows, n_bytes, started,
                        finished, "ok",
                        round(n_rows / elapsed, 3) if elapsed > 0 else 0.0,
                    )
                )
            spark.createDataFrame(lineage_rows, schema=LINEAGE_SCHEMA).coalesce(
                1
            ).write.mode("append").parquet(lineage_dir)
            # manifest commit LAST: a crash before this point leaves the
            # partition uncommitted and the next run redoes it idempotently
            for part, row in zip(batch, lineage_rows):
                manifest.commit(
                    {
                        "part_id": part,
                        "run_id": run_id,
                        "output_rows": row[3],
                        "bytes_in": row[4],
                        "committed_ts": finished.isoformat(),
                    }
                )
            if after_batch is not None:
                after_batch(batch)
    finally:
        spark.conf.set("spark.sql.sources.partitionOverwriteMode", old_mode)

    return {
        "run_id": run_id,
        "parts_done_before": done_before,
        "parts_done_now": todo,
        "batches": len(_chunks(todo, parts_per_batch)),
    }
