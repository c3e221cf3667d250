"""Streaming joins (round 4 late): the two join operators a streaming
crawl pipeline needs that the §2 streaming block (ops 50-56) did not yet
exercise as driver-visible queries.

- ``stream_join_static``: enrich an unbounded event stream with a bounded
  dimension table (user→segment). The dim side is broadcast so every
  micro-batch is a stateless map-side hash probe — no state store, no
  per-batch shuffle of the dim (see streaming/incremental.py:
  stream_static_enrich for the full scale note).
- ``stream_join_interval``: stream-stream INNER interval join — the
  view→click (fetch→parse) attribution shape. Watermarks on BOTH sides
  bound the keyed state store by rate × (gap + lateness), not stream
  length; inner matches emit eagerly, so the matched SET is deterministic
  under any micro-batch split, which is exactly what the DuckDB batch
  restatement checks. Cross-micro-batch matching (a click in batch N
  joining a view buffered in batch N-1's state) is pinned in
  tests/test_streaming.py with maxFilesPerTrigger=1.

Both run a REAL availableNow Structured Streaming drain inside the query —
file source, exactly-once _BatchCommitter sink (batch-scoped overwrite +
manifest record) — and return the committed output, so the driver's
value-hash compares the streaming engine end-to-end against plain batch
SQL. Both micro-batch partials are COMPOSABLE aggregates (counts and
pre-quantized e4 integer sums), so the final compaction is exact no matter
how the drain split batches.
"""

from __future__ import annotations

import os
import shutil
import tempfile

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ocr_spark.queries import register, t

_STATIC_SQL = """
SELECT c.c_mktsegment AS segment,
  CAST(count(*) AS BIGINT) AS n_events,
  CAST(sum(CAST(round(e.value * 10000, 0) AS BIGINT)) AS BIGINT)
    AS sum_value_e4
FROM events e JOIN customer c ON e.user_id = c.c_custkey
GROUP BY c.c_mktsegment
"""


@register("stream_join_static", _STATIC_SQL)
def q_stream_join_static(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Events stream × broadcast customer dim → per-segment totals.

    The stream-static join happens INSIDE the streaming plan (not in
    foreachBatch), so the state-free broadcast probe is the actual
    streaming operator under test. Each micro-batch appends its PARTIAL
    per-segment (count, pre-quantized value sum) — both composable — and
    one batch aggregation compacts the partials, so the result equals the
    batch join + groupBy regardless of the drain's batch split."""
    from ocr_spark.streaming.incremental import (
        _BatchCommitter,
        stream_static_enrich,
    )

    work = tempfile.mkdtemp(prefix="ocr-spark-stream-sj-")
    src_dir = os.path.join(work, "src")
    os.makedirs(src_dir)
    shutil.copy(
        f"{sf_dir}/events.parquet", os.path.join(src_dir, "events.parquet")
    )
    dim = t(spark, sf_dir, "customer").select(
        F.col("c_custkey").alias("user_id"), "c_mktsegment"
    )
    stream = (
        spark.readStream.schema(t(spark, sf_dir, "events").schema)
        .parquet(src_dir)
    )
    enriched = stream_static_enrich(stream, dim, "user_id")

    out = os.path.join(work, "out")
    committer = _BatchCommitter(out, "stream-join-static")

    def commit(bdf: DataFrame, bid: int) -> None:
        committer(
            bdf.groupBy(F.col("c_mktsegment").alias("segment")).agg(
                F.count(F.lit(1)).alias("n_part"),
                F.sum(
                    F.round(F.col("value") * 10000, 0).cast("bigint")
                ).alias("sum_part"),
            ),
            bid,
        )

    (
        enriched.writeStream.foreachBatch(commit)
        .option("checkpointLocation", os.path.join(work, "ckpt"))
        .trigger(availableNow=True)
        .start()
        .awaitTermination()
    )
    return (
        spark.read.parquet(f"{out}/data")
        .groupBy("segment")
        .agg(
            F.sum("n_part").alias("n_events"),
            F.sum("sum_part").alias("sum_value_e4"),
        )
    )


_INTERVAL_SQL = """
SELECT v.user_id AS user_id,
  v.event_id AS view_id, c.event_id AS click_id,
  CAST(epoch_ms(c.ts) - epoch_ms(v.ts) AS BIGINT) AS gap_ms
FROM events v JOIN events c
  ON v.user_id = c.user_id
 AND v.event_type = 'view' AND c.event_type = 'click'
 AND c.ts >= v.ts AND c.ts <= v.ts + INTERVAL 10 MINUTE
"""


@register("stream_join_interval", _INTERVAL_SQL)
def q_stream_join_interval(spark: SparkSession, sf_dir: str) -> DataFrame:
    """View→click attribution as a REAL stream-stream interval join: two
    file streams (views, clicks split out of the events table), watermarked
    both sides, inner-joined on user within [view_ts, view_ts + 10 min].

    The 31-day watermark covers the whole bounded fixture's disorder, so
    no state is evicted mid-drain and the emitted match set equals the
    batch interval join exactly — the honest production knob is the
    lateness SLA, and the state-eviction semantics are what the watermark
    buys at scale (state ∝ rate × gap, not stream length)."""
    from ocr_spark.streaming.incremental import (
        _BatchCommitter,
        stream_interval_join,
    )

    work = tempfile.mkdtemp(prefix="ocr-spark-stream-ij-")
    ev = t(spark, sf_dir, "events")
    v_dir = os.path.join(work, "views")
    c_dir = os.path.join(work, "clicks")
    ev.where(F.col("event_type") == "view").coalesce(1).write.parquet(v_dir)
    ev.where(F.col("event_type") == "click").coalesce(1).write.parquet(c_dir)

    def src(d: str) -> DataFrame:
        return spark.readStream.schema(ev.schema).parquet(d)

    # watermarks require TIMESTAMP (event time), not the parquet NTZ;
    # the session timezone is pinned UTC so the cast is instant-preserving
    # and unix_millis stays equal to DuckDB's epoch_ms on the same values
    views = src(v_dir).select(
        "user_id",
        F.col("event_id").alias("view_id"),
        F.col("ts").cast("timestamp").alias("v_ts"),
    )
    clicks = src(c_dir).select(
        F.col("user_id").alias("c_user"),
        F.col("event_id").alias("click_id"),
        F.col("ts").cast("timestamp").alias("c_ts"),
    )
    joined = stream_interval_join(
        views, clicks, "user_id = c_user", "v_ts", "c_ts", "10 minutes"
    ).select(
        "user_id",
        "view_id",
        "click_id",
        (F.unix_millis("c_ts") - F.unix_millis("v_ts")).alias("gap_ms"),
    )

    out = os.path.join(work, "out")
    committer = _BatchCommitter(out, "stream-join-interval")
    (
        joined.writeStream.foreachBatch(committer)
        .option("checkpointLocation", os.path.join(work, "ckpt"))
        .trigger(availableNow=True)
        .start()
        .awaitTermination()
    )
    return spark.read.parquet(f"{out}/data").select(
        "user_id", "view_id", "click_id", "gap_ms"
    )
