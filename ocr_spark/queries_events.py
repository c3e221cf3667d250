"""Event-analytics registry entries (SURVEY §2 analytics face): the three
queries every product/behavior warehouse runs on an event stream —
sessionization, ordered funnels, cohort retention — over the driver's
`events` table (event_id, ts, user_id, event_type, value, props).

Determinism notes (the usual cross-engine traps, pre-empted):

* Time arithmetic is MICROSECOND BIGINTs end-to-end — Spark
  ``unix_micros(cast(ts as timestamp))`` (the parquet column is
  TIMESTAMP_NTZ; the cast is identity under the engine's pinned UTC
  session, the same assumption fn_datetime already grades) ≡ DuckDB
  ``epoch_us(ts)`` — never float epoch
  seconds (DuckDB's ``epoch()`` returns a fractional DOUBLE) and never
  second-truncation (Spark's ``unix_timestamp`` floors).
* Window order is (ts, event_id): ts alone can collide, and an
  under-specified ORDER BY is the classic engine-dependent result.
* Dates come from UTC casts on both sides (the session pins
  spark.sql.session.timeZone=UTC; DuckDB timestamps are naive-UTC).

Scale: all three are one-or-two linear shuffles on user_id — the natural
partitioning key of any event store. Sessionization is a single window
pass (no self-join); the funnel is chained conditional aggregations with
the per-user step-1/2 frontiers joined back on the SAME user_id key
(Exchange reuse, no timestamp-range self-join blowup); retention is two
aggs over (user, day) granularity, never event×event.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ocr_spark.queries import register, t

SESSION_GAP_US = 30 * 60 * 1_000_000  # 30 minutes


@register(
    "events_sessionize",
    f"""
WITH _e AS (
  SELECT user_id, event_id, epoch_us(ts) AS us,
         lag(epoch_us(ts)) OVER (PARTITION BY user_id
                                 ORDER BY ts, event_id) AS prev_us
  FROM events
),
_marks AS (
  SELECT user_id, event_id, us,
         CASE WHEN prev_us IS NULL
                   OR us - prev_us > {SESSION_GAP_US}
              THEN 1 ELSE 0 END AS is_new
  FROM _e
),
_sess AS (
  SELECT user_id, event_id, us,
         sum(is_new) OVER (PARTITION BY user_id
                           ORDER BY us, event_id
                           ROWS UNBOUNDED PRECEDING) AS session_idx
  FROM _marks
)
SELECT user_id, CAST(session_idx AS BIGINT) AS session_idx,
       count(*) AS n_events,
       min(us) AS first_us, max(us) AS last_us
FROM _sess GROUP BY 1, 2
""",
)
def q_events_sessionize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gap-based sessionization (30-min inactivity splits), graded at
    session granularity: (user, session_idx, n_events, first/last_us).

    Plan: ONE user_id Exchange serves the lag window, the cumulative-sum
    window AND the session aggregation (same partition key throughout);
    no self-join. The streaming sibling is stream_session
    (session_window with watermark) — this is the batch/backfill shape.
    """
    e = t(spark, sf_dir, "events").select(
        "user_id", "event_id", F.unix_micros(F.col("ts").cast("timestamp")).alias("us")
    )
    w_lag = Window.partitionBy("user_id").orderBy("us", "event_id")
    marks = e.withColumn(
        "is_new",
        F.when(
            F.lag("us").over(w_lag).isNull()
            | (F.col("us") - F.lag("us").over(w_lag) > SESSION_GAP_US),
            1,
        ).otherwise(0),
    )
    sess = marks.withColumn(
        "session_idx",
        F.sum("is_new").over(
            w_lag.rowsBetween(Window.unboundedPreceding, 0)
        ),
    )
    return sess.groupBy("user_id", "session_idx").agg(
        F.count(F.lit(1)).alias("n_events"),
        F.min("us").alias("first_us"),
        F.max("us").alias("last_us"),
    )


_FUNNEL_STEPS = ("signup", "view", "purchase")


@register(
    "events_funnel",
    f"""
WITH _e AS (
  SELECT user_id, event_type, epoch_us(ts) AS us FROM events
),
_s1 AS (
  SELECT user_id, min(us) AS t1 FROM _e
  WHERE event_type = '{_FUNNEL_STEPS[0]}' GROUP BY 1
),
_s2 AS (
  SELECT e.user_id, min(e.us) AS t2
  FROM _e e JOIN _s1 USING (user_id)
  WHERE e.event_type = '{_FUNNEL_STEPS[1]}' AND e.us > _s1.t1
  GROUP BY 1
),
_s3 AS (
  SELECT e.user_id, min(e.us) AS t3
  FROM _e e JOIN _s2 USING (user_id)
  WHERE e.event_type = '{_FUNNEL_STEPS[2]}' AND e.us > _s2.t2
  GROUP BY 1
)
SELECT u.user_id,
       CAST(CASE WHEN _s3.user_id IS NOT NULL THEN 3
                 WHEN _s2.user_id IS NOT NULL THEN 2
                 WHEN _s1.user_id IS NOT NULL THEN 1
                 ELSE 0 END AS BIGINT) AS reached
FROM (SELECT DISTINCT user_id FROM _e) u
LEFT JOIN _s1 USING (user_id)
LEFT JOIN _s2 USING (user_id)
LEFT JOIN _s3 USING (user_id)
""",
)
def q_events_funnel(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Ordered 3-step funnel (signup → view → purchase, strictly
    later-in-time at each step): per-user deepest step reached.

    Plan: each step is a conditional aggregation joined back ON user_id
    — every Exchange in the chain is on the same key, so the sort/
    partitioning is reused instead of re-shuffled, and nothing is ever
    event×event (the naive formulation is a timestamp-range self-join).
    """
    e = t(spark, sf_dir, "events").select(
        "user_id", "event_type", F.unix_micros(F.col("ts").cast("timestamp")).alias("us")
    )
    s1 = (
        e.where(F.col("event_type") == _FUNNEL_STEPS[0])
        .groupBy("user_id")
        .agg(F.min("us").alias("t1"))
    )
    s2 = (
        e.where(F.col("event_type") == _FUNNEL_STEPS[1])
        .join(s1, "user_id")
        .where(F.col("us") > F.col("t1"))
        .groupBy("user_id")
        .agg(F.min("us").alias("t2"))
    )
    s3 = (
        e.where(F.col("event_type") == _FUNNEL_STEPS[2])
        .join(s2, "user_id")
        .where(F.col("us") > F.col("t2"))
        .groupBy("user_id")
        .agg(F.min("us").alias("t3"))
    )
    users = e.select("user_id").distinct()
    return (
        users.join(s1.select("user_id", "t1"), "user_id", "left")
        .join(s2.select("user_id", "t2"), "user_id", "left")
        .join(s3.select("user_id", "t3"), "user_id", "left")
        .select(
            "user_id",
            F.when(F.col("t3").isNotNull(), 3)
            .when(F.col("t2").isNotNull(), 2)
            .when(F.col("t1").isNotNull(), 1)
            .otherwise(0)
            .cast("bigint")
            .alias("reached"),
        )
    )


@register(
    "events_retention",
    """
WITH _days AS (
  SELECT DISTINCT user_id, CAST(ts AS DATE) AS d FROM events
),
_cohort AS (
  SELECT user_id, min(d) AS cohort_day FROM _days GROUP BY 1
)
SELECT c.cohort_day,
       CAST(dd.d - c.cohort_day AS BIGINT) AS day_offset,
       count(DISTINCT dd.user_id) AS n_users
FROM _days dd JOIN _cohort c USING (user_id)
GROUP BY 1, 2
""",
)
def q_events_retention(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cohort retention triangle: users grouped by first-active day,
    counted on each later day they return — (cohort_day, day_offset,
    n_users).

    Plan: events collapse to (user, day) FIRST (the distinct is the only
    pass over raw events), cohorts are a user-keyed agg joined back on
    user_id, and the triangle agg runs over user×day rows — at 100 TB
    the heavy input appears in exactly one shuffle."""
    e = t(spark, sf_dir, "events").select(
        "user_id", F.to_date("ts").alias("d")
    )
    days = e.distinct()
    cohort = days.groupBy("user_id").agg(F.min("d").alias("cohort_day"))
    return (
        days.join(cohort, "user_id")
        .select(
            "cohort_day",
            F.datediff("d", "cohort_day").cast("bigint").alias(
                "day_offset"
            ),
            "user_id",
        )
        .groupBy("cohort_day", "day_offset")
        .agg(F.countDistinct("user_id").alias("n_users"))
    )


# --- gap-filled resampling -------------------------------------------------------------

_RESAMPLE_STEP_US = 6 * 3600 * 1_000_000  # 6-hour buckets


@register(
    "events_resample",
    f"""
WITH e AS (
  SELECT event_type, epoch_us(ts) // {_RESAMPLE_STEP_US} AS b,
    CAST(round(value * 100, 0) AS BIGINT) AS cents
  FROM events
), r AS (
  SELECT min(b) AS bmin, max(b) AS bmax FROM e
), axis AS (
  SELECT t.event_type, unnest(range(r.bmin, r.bmax + 1)) AS b
  FROM (SELECT DISTINCT event_type FROM events) t, r
), a AS (
  SELECT event_type, b, count(*) AS n, sum(cents) AS cents
  FROM e GROUP BY event_type, b
)
SELECT axis.event_type,
  CAST(axis.b * {_RESAMPLE_STEP_US} AS BIGINT) AS bucket_start_us,
  CAST(coalesce(a.n, 0) AS BIGINT) AS n,
  CAST(coalesce(a.cents, 0) AS BIGINT) AS value_cents
FROM axis LEFT JOIN a ON axis.event_type = a.event_type AND axis.b = a.b
""",
)
def q_events_resample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Time-series densification (gap fill): 6-hour buckets per event
    type over the full corpus span, EVERY (type, bucket) present — empty
    buckets as explicit zero rows, the shape dashboards and
    anomaly-detection windows require.

    Scale shape: events aggregate per (type, bucket) in ONE shuffle; the
    dense axis is types x buckets — a tiny generated dimension (explode
    of one sequence() against the distinct types), so the gap-filling
    LEFT join is broadcast-sized no matter how large the fact side is.
    Value sums are per-row integer cents (order-independent). Bucket
    index uses integer division of positive epoch-us — Spark's `div`
    truncates while DuckDB's `//` floors, identical on the positive
    domain (pre-epoch timestamps would need floor-division care)."""
    step = F.lit(_RESAMPLE_STEP_US)
    e = t(spark, sf_dir, "events").select(
        "event_type",
        F.expr(
            # parquet event times are TIMESTAMP_NTZ; the cast is
            # instant-preserving under the pinned UTC session and keeps
            # unix_micros == DuckDB epoch_us
            f"unix_micros(CAST(ts AS TIMESTAMP)) div {_RESAMPLE_STEP_US}"
        ).alias("b"),
        F.round(F.col("value") * 100, 0).cast("bigint").alias("cents"),
    )
    agg = e.groupBy("event_type", "b").agg(
        F.count(F.lit(1)).alias("n_"), F.sum("cents").alias("cents_")
    )
    rng = e.agg(F.min("b").alias("bmin"), F.max("b").alias("bmax"))
    buckets = rng.selectExpr("explode(sequence(bmin, bmax)) AS b")
    axis = e.select("event_type").distinct().crossJoin(F.broadcast(buckets))
    return (
        axis.join(agg, ["event_type", "b"], "left")
        .select(
            "event_type",
            (F.col("b") * step).cast("bigint").alias("bucket_start_us"),
            F.coalesce("n_", F.lit(0)).cast("bigint").alias("n"),
            F.coalesce("cents_", F.lit(0)).cast("bigint").alias("value_cents"),
        )
    )


# --- rolling z-score anomaly detection --------------------------------------------------

_ANOM_W = 8          # trailing window width (rows, excluding current)
_ANOM_MIN_N = 4      # need at least this many baseline rows to judge
_ANOM_K2 = 9         # flag when z^2 > 9, i.e. |x - mu| > 3 sigma


@register(
    "events_anomaly",
    f"""
WITH e AS (
  SELECT event_id, event_type, epoch_us(ts) AS us,
    CAST(round(value * 100, 0) AS BIGINT) AS cents
  FROM events
),
w AS (
  SELECT event_id, event_type, us, cents,
    count(*) OVER fr AS n,
    CAST(coalesce(sum(cents) OVER fr, 0) AS BIGINT) AS s,
    CAST(coalesce(sum(cents * cents) OVER fr, 0) AS BIGINT) AS ss
  FROM e
  WINDOW fr AS (PARTITION BY event_type ORDER BY us, event_id
                ROWS BETWEEN {_ANOM_W} PRECEDING AND 1 PRECEDING)
)
SELECT event_id, event_type, us, cents,
  CAST(n AS BIGINT) AS n,
  CAST(n * cents - s AS BIGINT) AS dev,
  CAST(n * ss - s * s AS BIGINT) AS var_i,
  n >= {_ANOM_MIN_N} AND (
    (n * cents - s) * (n * cents - s) > {_ANOM_K2} * (n * ss - s * s)
  ) AS flagged
FROM w
""",
)
def q_events_anomaly(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Rolling z-score outlier detection over the event stream: each
    event judged against the trailing {W}-row baseline of its own
    event_type — the monitoring primitive every ingestion pipeline runs
    (sudden value spikes, stuck sensors).

    Integer-exact under the value hash: with n, s = count/sum and
    ss = sum of squares over the trailing frame (all BIGINT cents),
    z^2 > k^2  <=>  (n*x - s)^2 > k^2 * (n*ss - s^2)   [n^2*sigma^2 both
    sides], so the 3-sigma test is pure BIGINT cross-multiplication —
    no sqrt, no float division, no engine-dependent rounding. A
    zero-variance baseline flags any deviation (dev^2 > 0 = k^2*0).

    Scale shape: ONE event_type Exchange serves all three frame
    aggregates (same WINDOW spec); the frame is rows-bounded so state is
    O(W) per partition. Window order (us, event_id) is collision-free.
    Magnitudes: |cents| <= ~5e4 at the driver's value range, so
    n*ss <= 8 * 2.5e9 * ... ~ 2e13 and dev^2 <= (8 * 1e5)^2 ~ 6.4e11 —
    comfortably inside BIGINT."""
    e = t(spark, sf_dir, "events").select(
        "event_id",
        "event_type",
        F.unix_micros(F.col("ts").cast("timestamp")).alias("us"),
        F.round(F.col("value") * 100, 0).cast("bigint").alias("cents"),
    )
    fr = (
        Window.partitionBy("event_type")
        .orderBy("us", "event_id")
        .rowsBetween(-_ANOM_W, -1)
    )
    w = e.select(
        "event_id",
        "event_type",
        "us",
        "cents",
        F.count(F.lit(1)).over(fr).alias("n"),
        F.coalesce(F.sum("cents").over(fr), F.lit(0))
        .cast("bigint")
        .alias("s"),
        F.coalesce(F.sum(F.col("cents") * F.col("cents")).over(fr), F.lit(0))
        .cast("bigint")
        .alias("ss"),
    )
    dev = F.col("n") * F.col("cents") - F.col("s")
    var_i = F.col("n") * F.col("ss") - F.col("s") * F.col("s")
    return w.select(
        "event_id",
        "event_type",
        "us",
        "cents",
        F.col("n").cast("bigint").alias("n"),
        dev.cast("bigint").alias("dev"),
        var_i.cast("bigint").alias("var_i"),
        (
            (F.col("n") >= _ANOM_MIN_N)
            & (dev * dev > F.lit(_ANOM_K2) * var_i)
        ).alias("flagged"),
    )


# --- time-RANGE window frame ---------------------------------------------------------

_RANGE_US = 6 * 3600 * 1_000_000  # 6-hour trailing window, microseconds


@register(
    "events_range_frame",
    f"""
WITH e AS (
  SELECT event_id, event_type, epoch_us(ts) AS us,
    CAST(round(value * 100, 0) AS BIGINT) AS cents
  FROM events
)
SELECT event_id, event_type, us, cents,
  CAST(sum(cents) OVER (PARTITION BY event_type ORDER BY us
    RANGE BETWEEN {_RANGE_US} PRECEDING AND CURRENT ROW) AS BIGINT)
    AS trailing_6h_cents,
  CAST(count(*) OVER (PARTITION BY event_type ORDER BY us
    RANGE BETWEEN {_RANGE_US} PRECEDING AND CURRENT ROW) AS BIGINT)
    AS trailing_6h_n
FROM e
""",
)
def q_events_range_frame(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Time-based (RANGE) window frames — the rows-vs-range axis the
    rest of the window family doesn't cover: the frame is bounded by the
    ORDER-BY VALUE (trailing 6 hours of wall time), so rows with equal
    timestamps are peers and the result is deterministic under any tie
    order — no tiebreak column needed, unlike every ROWS frame.

    Scale shape: identical to the ROWS entries — one event_type
    Exchange, one Window operator serving both aggregates; frame state
    is bounded by the densest 6h of a single type."""
    e = t(spark, sf_dir, "events").select(
        "event_id",
        "event_type",
        F.unix_micros(F.col("ts").cast("timestamp")).alias("us"),
        F.round(F.col("value") * 100, 0).cast("bigint").alias("cents"),
    )
    fr = (
        Window.partitionBy("event_type")
        .orderBy("us")
        .rangeBetween(-_RANGE_US, 0)
    )
    return e.select(
        "event_id",
        "event_type",
        "us",
        "cents",
        F.sum("cents").over(fr).cast("bigint").alias("trailing_6h_cents"),
        F.count(F.lit(1)).over(fr).cast("bigint").alias("trailing_6h_n"),
    )


# --- ntile bucketing -----------------------------------------------------------------


@register(
    "win_ntile_buckets",
    """
SELECT event_id, event_type,
  CAST(ntile(4) OVER (PARTITION BY event_type ORDER BY event_id)
    AS INT) AS quartile
FROM events
""",
)
def q_win_ntile_buckets(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ntile(4) quartile assignment per event_type — the equal-count
    bucketing primitive (train/val splits, load tiers). Ordered by the
    unique event_id so the assignment is total and engine-independent
    (ntile over a tied order is implementation-defined; a unique key
    removes the ambiguity the same way every ROWS-frame entry does)."""
    e = t(spark, sf_dir, "events")
    w = Window.partitionBy("event_type").orderBy("event_id")
    return e.select(
        "event_id",
        "event_type",
        F.ntile(4).over(w).cast("int").alias("quartile"),
    )


# --- cumulative distribution ----------------------------------------------------------


@register(
    "win_cume_dist",
    """
SELECT event_id, event_type,
  CAST(round(value * 100, 0) AS BIGINT) AS cents,
  cume_dist() OVER (
    PARTITION BY event_type
    ORDER BY CAST(round(value * 100, 0) AS BIGINT)
  ) AS cdist
FROM events
""",
)
def q_win_cume_dist(spark: SparkSession, sf_dir: str) -> DataFrame:
    """cume_dist per event_type over the integer-cents value — the
    empirical-CDF window primitive (quantile position of every event
    within its type). Unlike row_number/ntile, cume_dist is TIE-SAFE by
    definition (peers share #rows<=current / total), so an order with
    duplicates is still engine-deterministic; the division's operands
    (two exact integers) are identical on both engines, hence the raw
    double survives the value hash without rounding."""
    e = t(spark, sf_dir, "events")
    cents = F.round(F.col("value") * 100, 0).cast("bigint")
    w = Window.partitionBy("event_type").orderBy(cents.asc())
    return e.select(
        "event_id",
        "event_type",
        cents.alias("cents"),
        F.cume_dist().over(w).alias("cdist"),
    )


# --- SCD2 dimension build ---------------------------------------------------------------
# Slowly-changing-dimension type 2 from an event stream: the warehouse
# move that turns "user's tier changed over time" into validity intervals
# [valid_from, valid_to) with the current row open (valid_to NULL).
# Gaps-and-islands: lag() flags changes, a running sum numbers the
# islands, one aggregate per island takes its first timestamp, lead()
# closes each interval with the next one's start. tier = cents DIV 500 of
# 'purchase' events — derived, not random, so both engines see identical
# input. One shuffle on user_id serves every window; ties broken by the
# unique event_id.

_SCD2_SQL = """
WITH p AS (
  SELECT user_id, ts, event_id,
    CAST(round(value * 100, 0) AS BIGINT) // 500 AS tier
  FROM events WHERE event_type = 'purchase'
),
flagged AS (
  SELECT user_id, ts, event_id, tier,
    CASE WHEN lag(tier) OVER w IS DISTINCT FROM tier THEN 1 ELSE 0 END
      AS chg
  FROM p WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
),
islands AS (
  SELECT user_id, ts, tier,
    sum(chg) OVER (PARTITION BY user_id ORDER BY ts, event_id
      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS isl
  FROM flagged
),
iv AS (
  SELECT user_id, isl, tier, min(ts) AS valid_from
  FROM islands GROUP BY user_id, isl, tier
)
SELECT user_id, CAST(isl AS BIGINT) AS version, tier, valid_from,
  lead(valid_from) OVER (PARTITION BY user_id ORDER BY valid_from)
    AS valid_to
FROM iv
"""


def scd2_from_purchases(purchases: DataFrame) -> DataFrame:
    """The SCD2 interval build over a (user_id, ts, event_id, value)
    purchase frame — shared by the batch entry and the streaming fold
    (streaming/incremental.scd2_intervals), so both faces are one code
    path by construction."""
    p = purchases.select(
        "user_id", "ts", "event_id",
        F.expr("CAST(round(value * 100, 0) AS BIGINT) div 500").alias("tier"),
    )
    wo = Window.partitionBy("user_id").orderBy("ts", "event_id")
    flagged = p.withColumn(
        "chg",
        F.when(
            ~F.lag("tier").over(wo).eqNullSafe(F.col("tier")), 1
        ).otherwise(0),
    )
    islands = flagged.withColumn(
        "isl",
        F.sum("chg").over(
            wo.rowsBetween(Window.unboundedPreceding, Window.currentRow)
        ),
    )
    iv = islands.groupBy("user_id", "isl", "tier").agg(
        F.min("ts").alias("valid_from")
    )
    wl = Window.partitionBy("user_id").orderBy("valid_from")
    return iv.select(
        "user_id",
        F.col("isl").cast("bigint").alias("version"),
        "tier",
        "valid_from",
        F.lead("valid_from").over(wl).alias("valid_to"),
    )


@register("events_scd2", _SCD2_SQL)
def q_events_scd2(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SCD2 intervals per user from purchase events: each run of equal
    tiers becomes one versioned row; the newest row stays open
    (valid_to NULL). All keys and the tier are exact integers; interval
    edges are the raw event timestamps."""
    e = t(spark, sf_dir, "events").filter(F.col("event_type") == "purchase")
    return scd2_from_purchases(e)


@register("stream_scd2", _SCD2_SQL)
def q_stream_scd2(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The streaming face of events_scd2: events arrive as file
    micro-batches (maxFilesPerTrigger=1 over a 3-file copy), purchase
    rows are committed as exactly-once APPEND-ONLY deltas, and the
    read-side fold derives the interval table — which must equal the
    batch build under the SAME oracle, independent of how the file
    source sliced the batches (the log is the state; see
    incremental_scd2's docstring for why intervals are deliberately not
    merge-maintained)."""
    import os
    import tempfile

    from ocr_spark.streaming.incremental import (
        incremental_scd2,
        scd2_intervals,
    )

    work = tempfile.mkdtemp(prefix="ocr-spark-stream-scd2-")
    src = os.path.join(work, "src")
    t(spark, sf_dir, "events").repartition(3).write.parquet(src)
    out = os.path.join(work, "dim")
    ckpt = os.path.join(work, "ckpt")
    writer, _ = incremental_scd2(spark, src, out, ckpt)
    q = writer.trigger(availableNow=True).start()
    q.awaitTermination()
    return scd2_intervals(spark, out)


# --- integer-exact EWMA smoothing -------------------------------------------

_EWMA_SQL = """
WITH p AS (
  SELECT event_id, user_id, ts,
         CAST(round(value * 100, 0) AS BIGINT) AS v_c
  FROM events WHERE event_type = 'purchase'
), f AS (
  SELECT event_id, user_id,
         list(v_c) OVER (
           PARTITION BY user_id ORDER BY ts, event_id
           ROWS BETWEEN 15 PRECEDING AND CURRENT ROW
         ) AS vals
  FROM p
)
SELECT event_id, user_id,
       CAST(len(vals) AS BIGINT) AS n_in,
       CAST(list_sum(list_transform(vals,
              (x, i) -> x * (1::BIGINT << CAST(i - 1 AS INT)))) AS BIGINT)
         AS num,
       CAST((1::BIGINT << CAST(len(vals) AS INT)) - 1 AS BIGINT) AS den,
       CAST(list_sum(list_transform(vals,
              (x, i) -> x * (1::BIGINT << CAST(i - 1 AS INT))))
            * 1000000
            // ((1::BIGINT << CAST(len(vals) AS INT)) - 1) AS BIGINT)
         AS ewma_e6
FROM f
ORDER BY event_id
"""


@register("events_ewma", _EWMA_SQL)
def q_events_ewma(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Integer-exact exponentially-weighted moving average of purchase
    value per user (half-life = one event, window capped at 16).

    Float EWMAs are order-fragile (a+b*w != b*w+a in IEEE); this one is
    EXACT: cents values weighted by powers of two over the trailing
    16-row frame — newest row weight 2^(n-1), oldest 2^0, denominator
    2^n - 1 — all BIGINT (max ~2^15 * 10^6 cents, far inside range), the
    single rounding being the final e6 integer division. Shape: one
    user-keyed window (collect over a BOUNDED 16-row frame, so state per
    row is constant), then pure array algebra via transform/aggregate —
    no second shuffle, no self-join, no Python.

    DuckDB's list lambda index is 1-based, Spark's is 0-based; the
    weight exponents differ accordingly (i-1 vs i) to mean the same
    thing."""
    w = (
        Window.partitionBy("user_id")
        .orderBy("ts", "event_id")
        .rowsBetween(-15, Window.currentRow)
    )
    return (
        t(spark, sf_dir, "events")
        .filter(F.col("event_type") == "purchase")
        .select(
            "event_id", "user_id", "ts",
            F.round(F.col("value") * 100, 0).cast("long").alias("v_c"),
        )
        .select(
            "event_id", "user_id",
            F.collect_list("v_c").over(w).alias("vals"),
        )
        .select(
            "event_id", "user_id",
            F.size("vals").cast("long").alias("n_in"),
            F.expr(
                "aggregate(transform(vals,"
                " (x, i) -> x * shiftleft(CAST(1 AS BIGINT), i)),"
                " CAST(0 AS BIGINT), (a, b) -> a + b)"
            ).alias("num"),
            F.expr(
                "shiftleft(CAST(1 AS BIGINT), size(vals))"
                " - CAST(1 AS BIGINT)"
            ).alias("den"),
        )
        .withColumn(
            "ewma_e6", F.expr("num * CAST(1000000 AS BIGINT) div den")
        )
        .orderBy("event_id")
    )


# --- temporal as-of enrichment against the SCD2 dimension -------------------

# The oracle spells the semantics the WAREHOUSE way — an interval join
# (valid_from <= ts < valid_to, open row NULL-bounded) against the same
# iv derivation — while the Spark side uses the scale shape below. Two
# independent spellings of "tier as of event time" under one hash.
_TEMPORAL_SQL = f"""
WITH v AS (
  SELECT event_id, user_id, ts FROM events WHERE event_type = 'view'
)
SELECT v.event_id, v.user_id,
       CAST(coalesce(iv.tier, -1) AS BIGINT) AS tier_asof,
       iv.valid_from AS tier_since
FROM v
LEFT JOIN ({_SCD2_SQL}) iv
  ON v.user_id = iv.user_id
 AND v.ts >= iv.valid_from
 AND (iv.valid_to IS NULL OR v.ts < iv.valid_to)
ORDER BY v.event_id
"""


@register("join_temporal_scd2", _TEMPORAL_SQL)
def q_join_temporal_scd2(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Enrich view events with the user's tier AS OF event time from the
    SCD2 dimension (events_scd2's build, one code path).

    The scale shape is NOT an interval join: tier-change points and
    probe events UNION into one frame and a single user-keyed window
    propagates the last change forward (last(ignorenulls) over
    unbounded-preceding). One shuffle total, no per-interval explode,
    no BNLJ — the as-of fold that survives 10^12 probe rows. Change
    rows sort before probes at equal ts (kind 0 < 1), so an interval
    starting at t covers a probe at exactly t; among change rows at an
    equal ts the higher version sorts last and wins, which is exactly
    the interval join's empty-interval [t, t) exclusion."""
    e = t(spark, sf_dir, "events")
    iv = scd2_from_purchases(
        e.filter(F.col("event_type") == "purchase")
    )
    changes = iv.select(
        "user_id",
        F.col("valid_from").alias("ts"),
        F.lit(0).alias("kind"),
        F.col("version").alias("ord"),
        F.lit(None).cast("bigint").alias("event_id"),
        "tier",
        F.col("valid_from").alias("vf"),
    )
    probes = e.filter(F.col("event_type") == "view").select(
        "user_id",
        "ts",
        F.lit(1).alias("kind"),
        F.col("event_id").alias("ord"),
        "event_id",
        F.lit(None).cast("bigint").alias("tier"),
        F.lit(None).cast("timestamp").alias("vf"),
    )
    w = (
        Window.partitionBy("user_id")
        .orderBy("ts", "kind", "ord")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return (
        changes.unionByName(probes)
        .select(
            "event_id", "user_id", "kind",
            F.last("tier", ignorenulls=True).over(w).alias("t_asof"),
            F.last("vf", ignorenulls=True).over(w).alias("tier_since"),
        )
        .filter(F.col("kind") == 1)
        .select(
            "event_id", "user_id",
            F.coalesce("t_asof", F.lit(-1)).cast("bigint").alias("tier_asof"),
            "tier_since",
        )
        .orderBy("event_id")
    )


# --- sequential pattern detection (MATCH_RECOGNIZE-style) -------------------

# v/c/p/s/e are the (distinct) first letters of the five event types; the
# pattern is a view -> click -> purchase chain with no intervening error
# or purchase. Non-overlapping leftmost scanning is the shared regex
# semantic (verified identical between engines).
_PATTERN = "v[^ep]*c[^ep]*p"

_SEQPAT_SQL = f"""
WITH s AS (
  SELECT user_id,
         string_agg(left(event_type, 1), '' ORDER BY ts, event_id) AS seq,
         count(*) AS n_events
  FROM events GROUP BY user_id
)
SELECT user_id,
       CAST(n_events AS BIGINT) AS n_events,
       CAST(len(regexp_extract_all(seq, '{_PATTERN}')) AS BIGINT)
         AS n_funnels,
       CAST(len(regexp_extract_all(seq, '{_PATTERN}')) > 0 AS BIGINT)
         AS converted
FROM s
ORDER BY user_id
"""


@register("events_seqpattern", _SEQPAT_SQL)
def q_events_seqpattern(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MATCH_RECOGNIZE-style sequential pattern detection: count
    view -> click -> purchase funnels with NO intervening error or
    purchase, per user, as a REGEX over the user's event-type sequence.

    The whole per-user history collapses to one string (first letters
    are distinct across the five event types), so arbitrary
    row-sequence patterns — negations, optional steps, bounded gaps —
    become regex features instead of k-way self-joins: ONE groupBy
    shuffle + a regexp_count, where events_funnel's fixed 3-step form
    needs its windows. Order inside the aggregated string is forced by
    array_sort over (ts, event_id, code) structs (Spark makes no
    within-group ordering promise; DuckDB's ORDER BY inside string_agg
    states it directly — the sort is the portable piece). Per-user
    history fits memory at any corpus scale (it's one user's events);
    non-overlapping leftmost regex scanning verified identical in both
    engines."""
    pat = _PATTERN.replace("\\", "\\\\")
    return (
        t(spark, sf_dir, "events")
        .select(
            "user_id",
            F.struct("ts", "event_id",
                     F.expr("left(event_type, 1)").alias("code")).alias("r"),
        )
        .groupBy("user_id")
        .agg(
            F.count("*").cast("long").alias("n_events"),
            F.array_join(
                F.transform(
                    F.array_sort(F.collect_list("r")), lambda x: x["code"]
                ),
                "",
            ).alias("seq"),
        )
        .select(
            "user_id",
            "n_events",
            F.expr(f"CAST(regexp_count(seq, '{pat}') AS BIGINT)").alias(
                "n_funnels"
            ),
            F.expr(
                f"CAST(regexp_count(seq, '{pat}') > 0 AS BIGINT)"
            ).alias("converted"),
        )
        .orderBy("user_id")
    )


# --- A/B experiment readout --------------------------------------------------
# The experimentation face of the event warehouse: users hash into
# control/treatment arms (md5 of a salted user id — the deterministic
# stand-in for an assignment service), a per-user binary conversion
# metric rolls up from their event history, and each metric gets the
# two-proportion pooled z-test at 95%. The test is spelled as an exact
# cross-multiplication — z^2 > 1.96^2 becomes
#   d^2 * N * 10000 > 38416 * n1 * n2 * c * (N - c),  d = c1*n2 - c2*n1
# with every factor an exact BIGINT cast to DOUBLE in a pinned
# evaluation order, so both engines compute bit-identical verdicts (the
# BIGINT-only spelling overflows 2^63 past ~500 users per arm; doubles
# hold every factor exactly here and IEEE ops are order-deterministic).
# Three organic metrics (>= median-ish activity thresholds) ride beside
# one PLANTED uplift (treatment users with user_id % 4 != 0 convert) so
# both verdict polarities sit under the value hash.

_AB_ARM_SPARK = (
    "CAST(conv(substring(md5(concat('ab1#', CAST(user_id AS STRING))),"
    " 1, 1), 16, 10) AS BIGINT) % 2"
)
_AB_ARM_SQL = (
    "CAST(strpos('0123456789abcdef', substr(md5('ab1#' ||"
    " CAST(user_id AS VARCHAR)), 1, 1)) - 1 AS BIGINT) % 2"
)

_AB_THRESH = 14  # per-user event-count conversion threshold

_AB_SIG = """
CASE WHEN
  (CAST(c_treat * n_control - c_control * n_treat AS DOUBLE)
   * CAST(c_treat * n_control - c_control * n_treat AS DOUBLE)
   * CAST(n_control + n_treat AS DOUBLE)) * 10000.0
  > 38416.0 * CAST(n_control AS DOUBLE) * CAST(n_treat AS DOUBLE)
    * CAST(c_control + c_treat AS DOUBLE)
    * CAST(n_control + n_treat - c_control - c_treat AS DOUBLE)
THEN 1 ELSE 0 END
"""

_AB_SQL = f"""
WITH u AS (
  SELECT user_id,
    count(CASE WHEN event_type = 'purchase' THEN 1 END) AS np,
    count(CASE WHEN event_type = 'click' THEN 1 END) AS nc,
    count(CASE WHEN event_type = 'error' THEN 1 END) AS ne,
    count(CASE WHEN event_type = 'view' THEN 1 END) AS nv
  FROM events GROUP BY 1
), a AS (
  SELECT user_id, {_AB_ARM_SQL} AS arm,
    CASE WHEN np >= {_AB_THRESH} THEN 1 ELSE 0 END AS m_purchase,
    CASE WHEN nc >= {_AB_THRESH} THEN 1 ELSE 0 END AS m_click,
    CASE WHEN ne >= {_AB_THRESH} THEN 1 ELSE 0 END AS m_error
  FROM u WHERE nv >= 1
), b AS (
  SELECT user_id, arm, m_purchase, m_click, m_error,
    CASE WHEN arm = 1 AND user_id % 4 != 0 THEN 1
         ELSE m_purchase END AS m_planted
  FROM a
), l AS (
  SELECT arm, 'purchase' AS metric, m_purchase AS converted FROM b
  UNION ALL SELECT arm, 'click', m_click FROM b
  UNION ALL SELECT arm, 'error', m_error FROM b
  UNION ALL SELECT arm, 'planted', m_planted FROM b
), s AS (
  SELECT metric,
    CAST(sum(CASE WHEN arm = 0 THEN 1 ELSE 0 END) AS BIGINT)
      AS n_control,
    CAST(sum(CASE WHEN arm = 0 THEN converted ELSE 0 END) AS BIGINT)
      AS c_control,
    CAST(sum(CASE WHEN arm = 1 THEN 1 ELSE 0 END) AS BIGINT) AS n_treat,
    CAST(sum(CASE WHEN arm = 1 THEN converted ELSE 0 END) AS BIGINT)
      AS c_treat
  FROM l GROUP BY 1
)
SELECT metric, n_control, c_control, n_treat, c_treat,
  CAST({_AB_SIG} AS BIGINT) AS significant
FROM s
"""


@register("events_ab_test", _AB_SQL)
def q_events_ab_test(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Two-proportion z-test per metric over hash-assigned arms: one
    user-keyed rollup shuffle, a 4-way stack to (metric, converted)
    grain, one tiny metric aggregation — the corpus is shuffled once.
    Cross-multiplied verdict, both polarities graded (see block
    comment)."""
    e = t(spark, sf_dir, "events")
    u = e.groupBy("user_id").agg(
        F.expr(
            "count(CASE WHEN event_type = 'purchase' THEN 1 END)"
        ).alias("np"),
        F.expr(
            "count(CASE WHEN event_type = 'click' THEN 1 END)"
        ).alias("nc"),
        F.expr(
            "count(CASE WHEN event_type = 'error' THEN 1 END)"
        ).alias("ne"),
        F.expr(
            "count(CASE WHEN event_type = 'view' THEN 1 END)"
        ).alias("nv"),
    )
    th = _AB_THRESH
    b = (
        u.filter(F.col("nv") >= 1)
        .select(
            "user_id",
            F.expr(_AB_ARM_SPARK).alias("arm"),
            F.expr(f"CASE WHEN np >= {th} THEN 1 ELSE 0 END").alias(
                "m_purchase"
            ),
            F.expr(f"CASE WHEN nc >= {th} THEN 1 ELSE 0 END").alias(
                "m_click"
            ),
            F.expr(f"CASE WHEN ne >= {th} THEN 1 ELSE 0 END").alias(
                "m_error"
            ),
        )
        .withColumn(
            "m_planted",
            F.expr(
                "CASE WHEN arm = 1 AND user_id % 4 != 0 THEN 1"
                " ELSE m_purchase END"
            ),
        )
    )
    long = b.selectExpr(
        "arm",
        "stack(4, 'purchase', m_purchase, 'click', m_click,"
        " 'error', m_error, 'planted', m_planted) AS (metric, converted)",
    )
    s = long.groupBy("metric").agg(
        F.expr(
            "CAST(sum(CASE WHEN arm = 0 THEN 1 ELSE 0 END) AS BIGINT)"
        ).alias("n_control"),
        F.expr(
            "CAST(sum(CASE WHEN arm = 0 THEN converted ELSE 0 END)"
            " AS BIGINT)"
        ).alias("c_control"),
        F.expr(
            "CAST(sum(CASE WHEN arm = 1 THEN 1 ELSE 0 END) AS BIGINT)"
        ).alias("n_treat"),
        F.expr(
            "CAST(sum(CASE WHEN arm = 1 THEN converted ELSE 0 END)"
            " AS BIGINT)"
        ).alias("c_treat"),
    )
    return s.select(
        "metric", "n_control", "c_control", "n_treat", "c_treat",
        F.expr(f"CAST({_AB_SIG} AS BIGINT)").alias("significant"),
    )


# --- seasonal-naive forecast backtest ----------------------------------------
# The baseline every real forecaster must beat: predict each 6-hour
# bucket's total by the value one season (24h = 4 buckets) earlier, and
# backtest it per event type. All integer: bucket totals are cent sums,
# the forecast is a lag-4 window over (type, bucket), the error is
# |actual - forecast| summed as BIGINT with MAE as one floor division —
# no float ever crosses an aggregation. One shuffle builds the bucket
# series (map-side-combined), one type-keyed window reads it; the
# backtest relation is |types| x |buckets|, independent of event volume
# — the shape that survives 10^12 events.

_FC_SEASON = 4  # 4 x 6h buckets = 24 h
_FC_BUCKET_US = 21_600_000_000  # 6 h in microseconds


_FC_SQL = f"""
WITH b AS (
  SELECT event_type, epoch_us(ts) // {_FC_BUCKET_US} AS bucket,
    CAST(sum(CAST(round(value * 100, 0) AS BIGINT)) AS BIGINT) AS val_c
  FROM events GROUP BY 1, 2
),
f AS (
  SELECT event_type, bucket, val_c,
    lag(val_c, {_FC_SEASON}) OVER (
      PARTITION BY event_type ORDER BY bucket
    ) AS fc_c
  FROM b
)
SELECT event_type,
  CAST(count(*) AS BIGINT) AS n_evals,
  CAST(sum(abs(val_c - fc_c)) AS BIGINT) AS sae_c,
  CAST(sum(abs(val_c - fc_c)) // count(*) AS BIGINT) AS mae_c
FROM f WHERE fc_c IS NOT NULL
GROUP BY 1
"""


@register("events_forecast_naive", _FC_SQL)
def q_events_forecast_naive(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Seasonal-naive (t-24h) forecast backtest per event type:
    integer-cent bucket totals, lag-4 forecast, BIGINT MAE (block
    comment)."""
    from pyspark.sql import Window

    e = t(spark, sf_dir, "events")
    b = (
        e.groupBy(
            "event_type",
            F.expr(
                f"unix_micros(cast(ts AS TIMESTAMP)) DIV {_FC_BUCKET_US}"
            ).alias("bucket"),
        )
        .agg(
            F.expr(
                "CAST(sum(CAST(round(value * 100, 0) AS BIGINT))"
                " AS BIGINT)"
            ).alias("val_c")
        )
    )
    w = Window.partitionBy("event_type").orderBy("bucket")
    f = b.withColumn("fc_c", F.lag("val_c", _FC_SEASON).over(w))
    return (
        f.filter(F.col("fc_c").isNotNull())
        .groupBy("event_type")
        .agg(
            F.count("*").cast("bigint").alias("n_evals"),
            F.sum(F.abs(F.col("val_c") - F.col("fc_c")))
            .cast("bigint")
            .alias("sae_c"),
            F.expr(
                "CAST(sum(abs(val_c - fc_c)) DIV count(*) AS BIGINT)"
            ).alias("mae_c"),
        )
    )


# --- cohort LTV curve --------------------------------------------------------
# Retention's revenue twin: per cohort (first-active day), the running
# cumulative purchase revenue per cohort member by day offset — the LTV
# curve growth/finance teams read. Integer cents end-to-end; the one
# pass over raw events is the (user, day) revenue rollup, everything
# after runs on user- or cohort-grained relations.

_LTV_SQL = """
WITH r AS (
  SELECT user_id, CAST(ts AS DATE) AS d,
    sum(CAST(round(value * 100, 0) AS BIGINT)) AS rev_c
  FROM events WHERE event_type = 'purchase' GROUP BY 1, 2
),
f AS (
  SELECT user_id, min(CAST(ts AS DATE)) AS cohort_day
  FROM events GROUP BY 1
),
sz AS (SELECT cohort_day, count(*) AS n_users FROM f GROUP BY 1),
cr AS (
  SELECT f.cohort_day, CAST(r.d - f.cohort_day AS BIGINT) AS day_offset,
    sum(r.rev_c) AS rev_c
  FROM r JOIN f USING (user_id) GROUP BY 1, 2
),
cum AS (
  SELECT cohort_day, day_offset,
    sum(rev_c) OVER (PARTITION BY cohort_day ORDER BY day_offset
                     ROWS UNBOUNDED PRECEDING) AS cum_rev_c
  FROM cr
)
SELECT c.cohort_day, c.day_offset,
  CAST(s.n_users AS BIGINT) AS n_users,
  CAST(c.cum_rev_c AS BIGINT) AS cum_rev_c,
  CAST(c.cum_rev_c // s.n_users AS BIGINT) AS ltv_c
FROM cum c JOIN sz s USING (cohort_day)
"""


@register("events_cohort_ltv", _LTV_SQL)
def q_events_cohort_ltv(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cohort LTV: (cohort_day, day_offset, n_users, cum_rev_c, ltv_c)
    with a per-cohort running cent sum and a floored per-member average
    (block comment)."""
    from pyspark.sql import Window

    e = t(spark, sf_dir, "events")
    r = (
        e.filter(F.col("event_type") == "purchase")
        .groupBy("user_id", F.to_date("ts").alias("d"))
        .agg(
            F.expr(
                "sum(CAST(round(value * 100, 0) AS BIGINT))"
            ).alias("rev_c")
        )
    )
    f = e.groupBy("user_id").agg(
        F.min(F.to_date("ts")).alias("cohort_day")
    )
    sz = f.groupBy("cohort_day").agg(F.count("*").alias("n_users"))
    cr = (
        r.join(f, "user_id")
        .groupBy(
            "cohort_day",
            F.datediff("d", "cohort_day").cast("bigint").alias(
                "day_offset"
            ),
        )
        .agg(F.sum("rev_c").alias("rev_c"))
    )
    w = (
        Window.partitionBy("cohort_day")
        .orderBy("day_offset")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    cum = cr.withColumn("cum_rev_c", F.sum("rev_c").over(w))
    return cum.join(sz, "cohort_day").select(
        "cohort_day",
        "day_offset",
        F.col("n_users").cast("bigint"),
        F.col("cum_rev_c").cast("bigint"),
        F.expr("CAST(cum_rev_c DIV n_users AS BIGINT)").alias("ltv_c"),
    )


# --- user-journey path analysis ----------------------------------------------
# The Markov transition matrix behind "where do users go next": each
# user's history in (ts, event_id) order yields (prev_type -> type)
# steps; transition probability is an e6 integer share of the source
# type's outgoing steps. One user-keyed window (the only pass over raw
# events) + one tiny (from, to) aggregation.

_PATH_SQL = """
WITH s AS (
  SELECT user_id, event_type,
    lag(event_type) OVER (
      PARTITION BY user_id ORDER BY epoch_us(ts), event_id
    ) AS prev_type
  FROM events
),
tr AS (
  SELECT prev_type AS from_type, event_type AS to_type, count(*) AS n
  FROM s WHERE prev_type IS NOT NULL GROUP BY 1, 2
),
tot AS (SELECT from_type, sum(n) AS tot FROM tr GROUP BY 1)
SELECT tr.from_type, tr.to_type, CAST(tr.n AS BIGINT) AS n,
  CAST(tr.n * 1000000 // t.tot AS BIGINT) AS p_e6
FROM tr JOIN tot t USING (from_type)
"""


@register("events_path_analysis", _PATH_SQL)
def q_events_path_analysis(spark: SparkSession, sf_dir: str) -> DataFrame:
    """First-order transition matrix over user event paths:
    (from_type, to_type, n, p_e6) with integer e6 shares (block
    comment)."""
    from pyspark.sql import Window

    e = t(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy(
        F.expr("unix_micros(cast(ts AS TIMESTAMP))"), "event_id"
    )
    s = e.select(
        "event_type", F.lag("event_type").over(w).alias("prev_type")
    )
    tr = (
        s.filter(F.col("prev_type").isNotNull())
        .groupBy(
            F.col("prev_type").alias("from_type"),
            F.col("event_type").alias("to_type"),
        )
        .agg(F.count("*").alias("n"))
    )
    tot = tr.groupBy("from_type").agg(F.sum("n").alias("tot"))
    return tr.join(tot, "from_type").select(
        "from_type",
        "to_type",
        F.col("n").cast("bigint"),
        F.expr("CAST(n * 1000000 DIV tot AS BIGINT)").alias("p_e6"),
    )


# --- multi-touch attribution -------------------------------------------------
# Marketing's join: every purchase attributed to the view/click touches
# by the same user in the trailing 24h. The join is user-equi-keyed with
# the time window as a residual (the join_range discipline — never a
# pure non-equi BNLJ); per purchase, touches get the linear share
# 1e6 DIV n (floored, deterministic) and the (ts, event_id)-latest
# touch flags last_touch — the two attribution models read from one
# relation. Microsecond BIGINT time math throughout.

_ATTR_WINDOW_US = 86_400_000_000  # 24 h

_ATTR_SQL = f"""
WITH p AS (
  SELECT user_id, event_id AS purchase_id, epoch_us(ts) AS pus
  FROM events WHERE event_type = 'purchase'
),
tc AS (
  SELECT user_id, event_id AS touch_id, event_type AS touch_type,
    epoch_us(ts) AS tus
  FROM events WHERE event_type IN ('view', 'click')
),
j AS (
  SELECT p.purchase_id, tc.touch_id, tc.touch_type, tc.tus
  FROM p JOIN tc ON tc.user_id = p.user_id
    AND tc.tus <= p.pus AND tc.tus > p.pus - {_ATTR_WINDOW_US}
),
r AS (
  SELECT purchase_id, touch_id, touch_type,
    count(*) OVER (PARTITION BY purchase_id) AS n_touches,
    row_number() OVER (PARTITION BY purchase_id
                       ORDER BY tus DESC, touch_id DESC) AS rn
  FROM j
)
SELECT purchase_id, touch_id, touch_type,
  CAST(n_touches AS BIGINT) AS n_touches,
  CAST(1000000 // n_touches AS BIGINT) AS share_e6,
  CAST(CASE WHEN rn = 1 THEN 1 ELSE 0 END AS BIGINT) AS last_touch
FROM r
"""


@register("events_attribution", _ATTR_SQL)
def q_events_attribution(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Linear + last-touch attribution in one relation (block comment):
    user-equi join with a 24h residual, one purchase-keyed window."""
    from pyspark.sql import Window

    e = t(spark, sf_dir, "events")
    us = "unix_micros(cast(ts AS TIMESTAMP))"
    p = e.filter(F.col("event_type") == "purchase").select(
        F.col("user_id").alias("puser"),
        F.col("event_id").alias("purchase_id"),
        F.expr(us).alias("pus"),
    )
    tc = e.filter(F.col("event_type").isin("view", "click")).select(
        "user_id",
        F.col("event_id").alias("touch_id"),
        F.col("event_type").alias("touch_type"),
        F.expr(us).alias("tus"),
    )
    j = p.join(
        tc,
        (F.col("user_id") == F.col("puser"))
        & (F.col("tus") <= F.col("pus"))
        & (F.col("tus") > F.col("pus") - _ATTR_WINDOW_US),
    )
    w = Window.partitionBy("purchase_id")
    wr = w.orderBy(F.desc("tus"), F.desc("touch_id"))
    r = j.select(
        "purchase_id",
        "touch_id",
        "touch_type",
        F.count("*").over(w).alias("n_touches"),
        F.row_number().over(wr).alias("rn"),
    )
    return r.select(
        "purchase_id",
        "touch_id",
        "touch_type",
        F.col("n_touches").cast("bigint"),
        F.expr("CAST(1000000 DIV n_touches AS BIGINT)").alias("share_e6"),
        F.expr(
            "CAST(CASE WHEN rn = 1 THEN 1 ELSE 0 END AS BIGINT)"
        ).alias("last_touch"),
    )


# --- RFM segmentation --------------------------------------------------------
# The classic customer-value grid: every user scored 1..4 on Recency
# (latest event), Frequency (event count) and Monetary (purchase cents),
# each by ntile quartile over a unique order, concatenated into the RFM
# segment code. One user rollup shuffle + three 4-bucket windows over
# the |users|-sized relation.

_RFM_SQL = """
WITH u AS (
  SELECT user_id,
    max(epoch_us(ts)) AS last_us,
    count(*) AS freq,
    CAST(coalesce(sum(CASE WHEN event_type = 'purchase'
      THEN CAST(round(value * 100, 0) AS BIGINT) END), 0) AS BIGINT)
      AS spend_c
  FROM events GROUP BY 1
),
s AS (
  SELECT user_id, last_us, freq, spend_c,
    ntile(4) OVER (ORDER BY last_us, user_id) AS r_score,
    ntile(4) OVER (ORDER BY freq, user_id) AS f_score,
    ntile(4) OVER (ORDER BY spend_c, user_id) AS m_score
  FROM u
)
SELECT user_id, CAST(freq AS BIGINT) AS freq, spend_c,
  CAST(r_score AS BIGINT) AS r_score,
  CAST(f_score AS BIGINT) AS f_score,
  CAST(m_score AS BIGINT) AS m_score,
  CAST(r_score AS VARCHAR) || CAST(f_score AS VARCHAR)
    || CAST(m_score AS VARCHAR) AS segment
FROM s
"""


@register("events_rfm", _RFM_SQL)
def q_events_rfm(spark: SparkSession, sf_dir: str) -> DataFrame:
    """RFM quartile segmentation per user (block comment). The three
    ntile windows are global over the USER relation (|users| rows, not
    |events|) — at 10^12 events the rollup shuffle is the only
    event-sized exchange; quartiling a billion users would swap the
    global ntile for a quantile-sketch cut, noted here as the scale
    knob."""
    from pyspark.sql import Window

    e = t(spark, sf_dir, "events")
    u = e.groupBy("user_id").agg(
        F.expr("max(unix_micros(cast(ts AS TIMESTAMP)))").alias("last_us"),
        F.count("*").alias("freq"),
        F.expr(
            "CAST(coalesce(sum(CASE WHEN event_type = 'purchase'"
            " THEN CAST(round(value * 100, 0) AS BIGINT) END), 0)"
            " AS BIGINT)"
        ).alias("spend_c"),
    )
    s = u.select(
        "user_id",
        "freq",
        "spend_c",
        F.ntile(4).over(Window.orderBy("last_us", "user_id")).alias(
            "r_score"
        ),
        F.ntile(4).over(Window.orderBy("freq", "user_id")).alias(
            "f_score"
        ),
        F.ntile(4).over(Window.orderBy("spend_c", "user_id")).alias(
            "m_score"
        ),
    )
    return s.select(
        "user_id",
        F.col("freq").cast("bigint"),
        "spend_c",
        F.col("r_score").cast("bigint"),
        F.col("f_score").cast("bigint"),
        F.col("m_score").cast("bigint"),
        F.expr(
            "concat(CAST(r_score AS STRING), CAST(f_score AS STRING),"
            " CAST(m_score AS STRING))"
        ).alias("segment"),
    )


# --- churn survival curve (Kaplan-Meier) -------------------------------------
# Product analytics' survival question: what fraction of users is still
# active t days after their first event? Lifetime = last_day -
# first_day; users whose last activity falls within 3 days of the
# corpus end are CENSORED (still alive — they leave the risk set
# without counting as churn, the KM distinction a naive churn rate
# gets wrong). S(t) = prod_{u<=t} (1 - d_u / n_u) with d_u = churns at
# lifetime u and n_u = users with lifetime >= u. The product is floats
# — made engine-exact by the fn_vector device: per-day factors are
# exact-integer divisions collected into ONE day-ordered array and
# sequentially folded per output row (both engines fold in index
# order; IEEE ops are bit-deterministic), then floor-quantized to e6.
# The day table is |distinct lifetimes| rows, so the fold is O(days^2)
# over a broadcast-tiny relation — the corpus appears in exactly one
# user-rollup shuffle.

_SURV_CENSOR_DAYS = 3

_SURV_SQL = f"""
WITH base AS (SELECT min(CAST(ts AS DATE)) AS b FROM events),
ev AS (
  -- planted per-user activity windows: every user's raw history spans
  -- the whole corpus month (lifetime variance ~0, a 3-point curve), so
  -- each user only "stays" 5 + (user_id*7)%25 days — deterministic
  -- heterogeneous lifetimes exercising churn AND censoring arms
  SELECT e.user_id, e.ts FROM events e, base
  WHERE CAST(CAST(e.ts AS DATE) - base.b AS BIGINT)
        < 5 + (e.user_id * 7) % 25
),
u AS (
  SELECT user_id,
    min(CAST(ts AS DATE)) AS d0, max(CAST(ts AS DATE)) AS d1
  FROM ev GROUP BY 1
),
mx AS (SELECT max(d1) AS dend FROM u),
lt AS (
  SELECT user_id, CAST(d1 - d0 AS BIGINT) AS life,
    CASE WHEN CAST((SELECT dend FROM mx) - d1 AS BIGINT)
              <= {_SURV_CENSOR_DAYS} THEN 1 ELSE 0 END AS censored
  FROM u
),
day AS (
  SELECT life AS day,
    CAST(sum(1 - censored) AS BIGINT) AS d
  FROM lt GROUP BY 1
),
risk AS (
  SELECT d1.day, d1.d,
    (SELECT CAST(count(*) AS BIGINT) FROM lt WHERE lt.life >= d1.day)
      AS n
  FROM day d1
),
fct AS (
  SELECT list(struct_pack(day := day,
    v := CAST(n - d AS DOUBLE) / CAST(n AS DOUBLE)) ORDER BY day)
    AS fs
  FROM risk
)
SELECT r.day, r.n AS n_risk, r.d AS n_churned,
  CAST(floor(list_aggregate(list_transform(
    list_filter(f.fs, s -> s.day <= r.day), s -> s.v), 'product')
    * 1e6) AS BIGINT) AS surv_e6
FROM risk r, fct f
"""


@register("events_survival", _SURV_SQL)
def q_events_survival(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Kaplan-Meier survival per lifetime day with right-censoring
    (block comment): (day, n_risk, n_churned, surv_e6)."""
    e0 = t(spark, sf_dir, "events")
    base = e0.agg(F.min(F.to_date("ts")).alias("b"))
    e = (
        e0.crossJoin(F.broadcast(base))
        .filter(
            F.expr(
                "CAST(datediff(CAST(ts AS DATE), b) AS BIGINT)"
                " < 5 + (user_id * 7) % 25"
            )
        )
        .select("user_id", "ts")
    )
    u = e.groupBy("user_id").agg(
        F.min(F.to_date("ts")).alias("d0"),
        F.max(F.to_date("ts")).alias("d1"),
    )
    mx = u.agg(F.max("d1").alias("dend"))
    lt = u.crossJoin(F.broadcast(mx)).select(
        "user_id",
        F.expr("CAST(datediff(d1, d0) AS BIGINT)").alias("life"),
        F.expr(
            f"CASE WHEN CAST(datediff(dend, d1) AS BIGINT)"
            f" <= {_SURV_CENSOR_DAYS} THEN 1 ELSE 0 END"
        ).alias("censored"),
    )
    day = lt.groupBy(F.col("life").alias("day")).agg(
        F.expr("CAST(sum(1 - censored) AS BIGINT)").alias("d")
    )
    # n_at_risk via a non-equi join against the tiny day table
    risk = (
        day.join(
            lt.select("life"),
            F.col("life") >= F.col("day"),
        )
        .groupBy("day", "d")
        .agg(F.count("*").cast("bigint").alias("n"))
    )
    fct = risk.agg(
        F.expr(
            "array_sort(collect_list(struct(day,"
            " CAST(n - d AS DOUBLE) / CAST(n AS DOUBLE) AS v)))"
        ).alias("fs")
    )
    return risk.crossJoin(F.broadcast(fct)).select(
        "day",
        F.col("n").alias("n_risk"),
        F.col("d").alias("n_churned"),
        F.expr(
            "CAST(floor(aggregate(transform("
            "filter(fs, s -> s.day <= day), s -> s.v),"
            " CAST(1.0 AS DOUBLE), (acc, v) -> acc * v) * 1e6)"
            " AS BIGINT)"
        ).alias("surv_e6"),
    )


# --- DAU / WAU / MAU ---------------------------------------------------------
# The product-analytics staple: per day, the count of distinct users
# active that day (DAU), in the trailing 7 days (WAU) and the trailing
# 28 days (MAU). Rolling DISTINCT does not decompose into a window
# aggregate — the standard exact formulation joins the (user, day)
# distinct relation onto the day spine with a bounded range residual
# (fan-out x7 / x28 on the |users|x|days| relation, NOT on raw events)
# and re-counts distinct per spine day. The corpus appears in exactly
# one shuffle (the user-day distinct); everything after is
# days-spine-sized. At 10^12 events the exact form stays viable because
# the fan-out is over user-days; the sketch alternative (per-day HLL
# registers MAX-folded over the trailing window) is the documented
# approximate fallback, already graded by sketch_hll_merge.

_ACT_SQL = """
WITH ud AS (
  SELECT DISTINCT user_id, CAST(ts AS DATE) AS d FROM events
),
spine AS (SELECT DISTINCT d FROM ud),
wau AS (
  SELECT s.d, count(DISTINCT u.user_id) AS n
  FROM spine s JOIN ud u
    ON u.d <= s.d AND u.d >= s.d - INTERVAL 6 DAY
  GROUP BY 1
),
mau AS (
  SELECT s.d, count(DISTINCT u.user_id) AS n
  FROM spine s JOIN ud u
    ON u.d <= s.d AND u.d >= s.d - INTERVAL 27 DAY
  GROUP BY 1
),
dau AS (
  SELECT d, count(*) AS n FROM ud GROUP BY 1
)
SELECT dau.d AS day, CAST(dau.n AS BIGINT) AS dau,
  CAST(wau.n AS BIGINT) AS wau, CAST(mau.n AS BIGINT) AS mau,
  CAST(dau.n * 1000000 // mau.n AS BIGINT) AS stickiness_e6
FROM dau JOIN wau ON wau.d = dau.d JOIN mau ON mau.d = dau.d
"""


@register("events_active_users", _ACT_SQL)
def q_events_active_users(spark: SparkSession, sf_dir: str) -> DataFrame:
    """DAU/WAU/MAU + DAU/MAU stickiness per day (block comment)."""
    e = t(spark, sf_dir, "events")
    ud = e.select("user_id", F.to_date("ts").alias("d")).distinct()
    spine = ud.select("d").distinct().withColumnRenamed("d", "sd")

    def rolling(days: int, name: str) -> DataFrame:
        return (
            spine.join(
                ud,
                (F.col("d") <= F.col("sd"))
                & (F.col("d") >= F.date_sub(F.col("sd"), days - 1)),
            )
            .groupBy("sd")
            .agg(F.countDistinct("user_id").alias(name))
        )

    dau = ud.groupBy(F.col("d").alias("sd")).agg(
        F.count("*").alias("dau")
    )
    out = (
        dau.join(rolling(7, "wau"), "sd")
        .join(rolling(28, "mau"), "sd")
    )
    return out.select(
        F.col("sd").alias("day"),
        F.col("dau").cast("bigint"),
        F.col("wau").cast("bigint"),
        F.col("mau").cast("bigint"),
        F.expr("CAST(dau * 1000000 DIV mau AS BIGINT)").alias(
            "stickiness_e6"
        ),
    )


# --- activity streaks --------------------------------------------------------
# Longest consecutive-day activity streak per user — the classic
# date-arithmetic gaps-and-islands: over each user's DISTINCT active
# days in order, d minus row_number is constant exactly within a run of
# consecutive days, so grouping by that anchor yields the islands and
# one more aggregate takes the longest. Two user-keyed exchanges over
# the user-day relation; raw events shuffle once.

_STREAK_SQL = """
WITH ud AS (
  SELECT DISTINCT user_id, CAST(ts AS DATE) AS d FROM events
),
r AS (
  SELECT user_id, d,
    d - CAST(row_number() OVER (PARTITION BY user_id ORDER BY d)
             AS INTEGER) AS anchor
  FROM ud
),
runs AS (
  SELECT user_id, anchor, count(*) AS len,
    min(d) AS start_day
  FROM r GROUP BY 1, 2
)
SELECT user_id,
  CAST(max(len) AS BIGINT) AS longest_streak,
  CAST(count(*) AS BIGINT) AS n_streaks,
  min(CASE WHEN len = (SELECT max(len) FROM runs r2
                       WHERE r2.user_id = runs.user_id)
       THEN start_day END) AS best_start
FROM runs GROUP BY 1
"""


@register("events_streaks", _STREAK_SQL)
def q_events_streaks(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-user longest consecutive-day streak, streak count, and the
    earliest start of a maximal streak (block comment)."""
    from pyspark.sql import Window

    e = t(spark, sf_dir, "events")
    ud = e.select("user_id", F.to_date("ts").alias("d")).distinct()
    w = Window.partitionBy("user_id").orderBy("d")
    r = ud.withColumn(
        "anchor",
        F.date_sub("d", F.row_number().over(w).cast("int")),
    )
    runs = r.groupBy("user_id", "anchor").agg(
        F.count("*").alias("len"), F.min("d").alias("start_day")
    )
    wmax = Window.partitionBy("user_id")
    return (
        runs.withColumn("mx", F.max("len").over(wmax))
        .groupBy("user_id")
        .agg(
            F.max("len").cast("bigint").alias("longest_streak"),
            F.count("*").cast("bigint").alias("n_streaks"),
            F.min(
                F.when(F.col("len") == F.col("mx"), F.col("start_day"))
            ).alias("best_start"),
        )
    )


# --- activity heatmap --------------------------------------------------------
# The hour-of-day x day-of-week usage matrix every product dashboard
# opens with: one groupBy over derived calendar keys (map-side
# combined to a 7x24-bounded relation), integer cents for the value
# column. Dense axis guaranteed by crossing the distinct keys (the
# events_resample device) so EMPTY cells are explicit zero rows.

_HEAT_SQL = """
WITH c AS (
  SELECT CAST(isodow(ts) AS BIGINT) AS dow,
    CAST(hour(ts) AS BIGINT) AS hod,
    count(*) AS n,
    CAST(sum(CAST(round(value * 100, 0) AS BIGINT)) AS BIGINT) AS val_c
  FROM events GROUP BY 1, 2
),
axis AS (
  SELECT d.dow, h.hod
  FROM (SELECT unnest(generate_series(1, 7)) AS dow) d,
       (SELECT unnest(generate_series(0, 23)) AS hod) h
)
SELECT a.dow, a.hod,
  CAST(coalesce(c.n, 0) AS BIGINT) AS n,
  CAST(coalesce(c.val_c, 0) AS BIGINT) AS val_c
FROM axis a LEFT JOIN c ON c.dow = a.dow AND c.hod = a.hod
"""


@register("events_heatmap", _HEAT_SQL)
def q_events_heatmap(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Dense 7x24 activity heatmap with explicit zero cells (block
    comment)."""
    e = t(spark, sf_dir, "events")
    c = e.groupBy(
        F.expr("CAST(dayofweek(ts) AS BIGINT)").alias("sundow"),
        F.expr("CAST(hour(ts) AS BIGINT)").alias("hod"),
    ).agg(
        F.count("*").alias("n"),
        F.expr(
            "CAST(sum(CAST(round(value * 100, 0) AS BIGINT)) AS BIGINT)"
        ).alias("val_c"),
    ).select(
        # Spark dayofweek is 1=Sunday; ISO dow is 1=Monday..7=Sunday
        F.expr(
            "CAST(CASE WHEN sundow = 1 THEN 7 ELSE sundow - 1 END"
            " AS BIGINT)"
        ).alias("dow"),
        "hod", "n", "val_c",
    )
    axis = spark.range(1, 8).selectExpr("id AS dow").crossJoin(
        spark.range(0, 24).selectExpr("id AS hod")
    )
    return axis.join(c, ["dow", "hod"], "left").select(
        "dow", "hod",
        F.expr("CAST(coalesce(n, 0) AS BIGINT)").alias("n"),
        F.expr("CAST(coalesce(val_c, 0) AS BIGINT)").alias("val_c"),
    )
