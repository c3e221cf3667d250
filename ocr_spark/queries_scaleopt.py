"""Runtime-pruning join surface: dynamic partition pruning + runtime
bloom-filter join reduction.

These two entries gate the optimizer features that carry large-large
joins at the 10^12-row tier — the pruning Spark decides AT RUNTIME, not
from static predicates:

``join_dpp``
    A month-partitioned fact table joined to a filtered calendar
    dimension. Catalyst injects a ``dynamicpruningexpression`` into the
    fact scan's PartitionFilters: the dim side runs first (reusing its
    broadcast), and only the surviving months' directories are ever
    LISTED, let alone read. On a 100 TB warehouse laid out by ingest
    month this is the difference between scanning 84 months and 21 —
    and it composes with static pruning, which cannot see join-derived
    predicates at all. Plan pin (tests/test_plans.py):
    ``dynamicpruning`` inside PartitionFilters.

``join_runtime_bloom``
    Shuffle join where the build side carries a selective filter.
    Catalyst plans a ``bloom_filter_agg`` over the build keys and wraps
    the probe scan in ``might_contain`` — probe rows that cannot match
    are dropped BEFORE the shuffle, which is the expensive thing at
    scale (the filter itself is one small aggregate + broadcast).
    Injection is governed by size thresholds tuned for clusters
    (application side > 10 GB), so at benchmark scale this entry builds
    on ``spark.newSession()`` with the thresholds floored — a clone
    that shares the SparkContext but NOT the parent's SQLConf, leaving
    every other registry entry's planning untouched. At the 10^12 tier
    the default thresholds fire on their own and the plan is identical.

Both oracles recompute from the raw parquet: DuckDB never sees the
partitioned side-write or the bloom filter — if runtime pruning dropped
a row it shouldn't have, the value hash breaks.
"""
from __future__ import annotations

import os
import tempfile

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ocr_spark.queries import register, t

# fiscal-Q3 months of a fixed 1992-2004 spine that over-covers the
# synthetic orders' date span; quarter() is the
# portable piece (DuckDB spells the spine differently, so the oracle
# filters quarter(o_orderdate) directly — same set, orders all fall
# inside the spine range by construction).
_DPP_SQL = """
SELECT strftime(o_orderdate, '%Y-%m') AS o_month,
       CAST(count(*) AS BIGINT) AS n_orders,
       CAST(sum(CAST(round(o_totalprice * 100, 0) AS BIGINT)) AS BIGINT)
         AS total_c
FROM orders
WHERE quarter(o_orderdate) = 3
GROUP BY 1
ORDER BY 1
"""


@register("join_dpp", _DPP_SQL)
def q_join_dpp(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Dynamic partition pruning over a month-partitioned fact table.

    The fact side is orders re-laid-out ``partitionBy(o_month)`` (the
    warehouse layout a 10^12-row pipeline would use: one directory per
    ingest month; the repartition before the write keeps it to one file
    per partition instead of shards x months). The dim side is a
    calendar spine (sequence over a fixed 1992-2004 range that
    over-covers the synthetic orders' 1995-2001 span) filtered
    to fiscal Q3 — a predicate the fact scan cannot see statically.
    DPP runs the 39-row dim first and injects the surviving month keys
    into the scan's PartitionFilters, so non-Q3 directories are pruned
    at listing time. (Spine months with no orders vanish via the inner
    join + groupBy, so over-covering the range is harmless.)
    """
    work = tempfile.mkdtemp(prefix="ocr-spark-dpp-")
    fact_path = os.path.join(work, "orders_by_month")
    (
        t(spark, sf_dir, "orders")
        .withColumn("o_month", F.date_format("o_orderdate", "yyyy-MM"))
        .repartition("o_month")
        .write.partitionBy("o_month")
        .parquet(fact_path)
    )
    fact = spark.read.parquet(fact_path)
    dim = (
        spark.range(1)
        .select(
            F.explode(
                F.sequence(
                    F.lit("1992-01-01").cast("date"),
                    F.lit("2004-12-01").cast("date"),
                    F.expr("interval 1 month"),
                )
            ).alias("m")
        )
        .select(
            F.date_format("m", "yyyy-MM").alias("o_month"),
            F.quarter("m").alias("fq"),
        )
        .filter(F.col("fq") == 3)
        .drop("fq")
    )
    return (
        fact.join(dim, "o_month")
        .groupBy("o_month")
        .agg(
            F.count("*").alias("n_orders"),
            F.sum(
                F.round(F.col("o_totalprice") * 100, 0).cast("long")
            ).alias("total_c"),
        )
        .orderBy("o_month")
    )


_BLOOM_SQL = """
SELECT o_orderpriority,
       CAST(count(*) AS BIGINT) AS n_items,
       CAST(sum(CAST(round(l_extendedprice * 100, 0) AS BIGINT)) AS BIGINT)
         AS rev_c
FROM lineitem
JOIN orders ON l_orderkey = o_orderkey
WHERE o_orderpriority IN ('1-URGENT', '2-HIGH')
GROUP BY 1
ORDER BY 1
"""


@register("join_runtime_bloom", _BLOOM_SQL)
def q_join_runtime_bloom(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Runtime bloom-filter reduction on a shuffle join's probe side.

    lineitem joins the urgent/high slice of orders. With broadcast off
    (both sides "large"), Catalyst plans ``bloom_filter_agg`` over the
    filtered build keys and guards the probe scan with
    ``might_contain(xxhash64(l_orderkey))`` — ~60% of lineitem rows die
    before the shuffle instead of after it. Built on ``newSession()``
    so the cluster-tuned injection thresholds can be floored for
    benchmark-scale input without touching the shared session's SQLConf
    (conf isolation is session-scoped in Spark; the SparkContext is
    shared). False positives only pass extra rows to the join — the
    join condition still decides membership, which is why the DuckDB
    oracle (no bloom filter at all) must hash-match exactly.
    """
    s2 = spark.newSession()
    s2.conf.set(
        "spark.sql.optimizer.runtime.bloomFilter."
        "applicationSideScanSizeThreshold",
        "0",
    )
    s2.conf.set(
        "spark.sql.optimizer.runtime.bloomFilter.creationSideThreshold",
        "100MB",
    )
    s2.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    li = t(s2, sf_dir, "lineitem")
    sel = t(s2, sf_dir, "orders").filter(
        F.col("o_orderpriority").isin("1-URGENT", "2-HIGH")
    )
    return (
        li.join(sel, li.l_orderkey == sel.o_orderkey)
        .groupBy("o_orderpriority")
        .agg(
            F.count("*").alias("n_items"),
            F.sum(
                F.round(F.col("l_extendedprice") * 100, 0).cast("long")
            ).alias("rev_c"),
        )
        .orderBy("o_orderpriority")
    )


# --- join-strategy advisor (round 4 close) -------------------------------------------
# The diagnostic that DECIDES the three strategies this repo's join
# surface implements (join_broadcast / join_shuffle / join_salted):
# profile a join's two sides — fact size, dim size, key cardinality, the
# heaviest key — and emit the advisory verdict a pipeline author (or an
# auto-tuner) acts on before burning a 100 TB shuffle. Rules, applied in
# order, thresholds scaled to driver SFs (on a cluster they come from
# executor memory and task targets — documented knobs, same structure):
#
#   broadcast  dim_rows <= 500          (replicate the dim, no shuffle;
#                                        skew is irrelevant map-side)
#   salt       max_key_cnt * 20 > fact_rows   (one key holds > 5% of the
#                                        fact: a shuffle would hang its
#                                        straggler task — pre-salt)
#   shuffle    otherwise
#
# Three joins are profiled so every verdict arm fires at sf0.01:
# lineitem⋈supplier (100-row dim → broadcast), lineitem⋈orders (15k-row
# dim, ~4-per-key fact → shuffle), and the same fact under a planted
# half-corpus hot key (l_orderkey % 2 = 0 → key 0) against the orders
# dim → salt. Each profile is one map-side-combined groupBy over the
# fact keys plus two scalar counts — the advisor costs one aggregation
# pass, never a trial join.

_ADV_BROADCAST_MAX = 500
_ADV_SKEW_MULT = 20


def _adv_sql_one(name: str, fact: str, key: str, dim: str) -> str:
    return f"""
SELECT '{name}' AS join_name,
  (SELECT count(*) FROM {fact}) AS fact_rows,
  (SELECT count(*) FROM {dim}) AS dim_rows,
  count(*) AS n_keys,
  max(c) AS max_key_cnt
FROM (SELECT {key} AS k, count(*) AS c FROM {fact} GROUP BY 1)
"""


_ADV_VERDICT = f"""
CASE WHEN dim_rows <= {_ADV_BROADCAST_MAX} THEN 'broadcast'
     WHEN max_key_cnt * {_ADV_SKEW_MULT} > fact_rows THEN 'salt'
     ELSE 'shuffle' END
"""

_ADV_SQL = f"""
WITH skewfact AS (
  SELECT CASE WHEN l_orderkey % 2 = 0 THEN 0
              ELSE l_orderkey END AS hot_key
  FROM lineitem
),
profiles AS (
  {_adv_sql_one("li_supplier", "lineitem", "l_suppkey", "supplier")}
  UNION ALL
  {_adv_sql_one("li_orders", "lineitem", "l_orderkey", "orders")}
  UNION ALL
  {_adv_sql_one("li_orders_hot", "skewfact", "hot_key", "orders")}
)
SELECT join_name,
  CAST(fact_rows AS BIGINT) AS fact_rows,
  CAST(dim_rows AS BIGINT) AS dim_rows,
  CAST(n_keys AS BIGINT) AS n_keys,
  CAST(max_key_cnt AS BIGINT) AS max_key_cnt,
  {_ADV_VERDICT} AS verdict
FROM profiles
"""


def _adv_profile(fact: DataFrame, key, name: str, dim: DataFrame) -> DataFrame:
    keyed = fact.select(key.alias("k"))
    prof = keyed.groupBy("k").count().agg(
        F.count("*").alias("n_keys"),
        F.max("count").alias("max_key_cnt"),
    )
    counts = keyed.agg(F.count("*").alias("fact_rows")).crossJoin(
        dim.agg(F.count("*").alias("dim_rows"))
    )
    return (
        prof.crossJoin(F.broadcast(counts))
        .select(
            F.lit(name).alias("join_name"),
            F.col("fact_rows").cast("bigint"),
            F.col("dim_rows").cast("bigint"),
            F.col("n_keys").cast("bigint"),
            F.col("max_key_cnt").cast("bigint"),
        )
    )


@register("profile_join_advisor", _ADV_SQL)
def q_profile_join_advisor(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Join-strategy advisory profile per candidate join: one
    map-side-combined key aggregation + two scalar counts each, verdict
    from the ordered broadcast/salt/shuffle rules (block comment). All
    three arms fire at sf0.01."""
    li = t(spark, sf_dir, "lineitem")
    profiles = (
        _adv_profile(
            li, F.col("l_suppkey"), "li_supplier",
            t(spark, sf_dir, "supplier"),
        )
        .unionByName(
            _adv_profile(
                li, F.col("l_orderkey"), "li_orders",
                t(spark, sf_dir, "orders"),
            )
        )
        .unionByName(
            _adv_profile(
                li,
                F.expr(
                    "CASE WHEN l_orderkey % 2 = 0 THEN 0"
                    " ELSE l_orderkey END"
                ),
                "li_orders_hot",
                t(spark, sf_dir, "orders"),
            )
        )
    )
    return profiles.select(
        "join_name", "fact_rows", "dim_rows", "n_keys", "max_key_cnt",
        F.expr(_ADV_VERDICT).alias("verdict"),
    )
