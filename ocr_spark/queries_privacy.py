"""Privacy-preserving release operators: k-anonymity + l-diversity.

A corpus pipeline that ships user-derived tables (crawl logs, account
snapshots) needs release gates beyond PII string scrubbing
(pipe_scrub_pii): re-identification risk lives in the JOINABLE
quasi-identifier combinations, not in any one column. Standard model
(Sweeney 2002; Machanavajjhala et al. 2007):

``privacy_k_anon``
    The anonymized release itself. Direct identifiers are dropped
    (c_custkey -> md5 pseudonym, c_name gone), the linkable numeric
    column is generalized to a coarse band, and any row whose
    quasi-identifier group has fewer than K members is SUPPRESSED —
    the released table provably hides every individual in a crowd of
    >= K. Shape: one window count over the QI key (single shuffle,
    partial-count map side), then a filter; no self-join.

``privacy_l_div``
    The audit that k-anonymity alone misses: a group can be large yet
    have every member share the same sensitive value (homogeneity
    attack — group membership alone discloses the attribute).
    Per-QI-group distinct count of the sensitive column; groups below
    L are flagged. Shape: one groupBy with count + count_distinct —
    Spark plans the distinct via a two-phase partial-distinct expand,
    still a single QI-keyed exchange.

Both are pure column algebra over one shuffle — at 10^12 rows the QI
key is the partition key and the suppression filter is map-side after
the window. Oracles recompute group sizes/diversity in DuckDB SQL.
"""
from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ocr_spark.queries import register, t

_K = 5
_L = 3

_KANON_SQL = f"""
WITH g AS (
  SELECT md5(CAST(c_custkey AS VARCHAR)) AS pseudo_id,
         c_mktsegment,
         CAST(floor(c_acctbal / 1000) AS BIGINT) AS bal_band,
         count(*) OVER (
           PARTITION BY c_mktsegment,
                        CAST(floor(c_acctbal / 1000) AS BIGINT)
         ) AS group_n
  FROM customer
)
SELECT pseudo_id, c_mktsegment, bal_band, CAST(group_n AS BIGINT) AS group_n
FROM g
WHERE group_n >= {_K}
ORDER BY pseudo_id
"""


@register("privacy_k_anon", _KANON_SQL)
def q_privacy_k_anon(spark: SparkSession, sf_dir: str) -> DataFrame:
    """K-anonymous release of customer (QI = segment x $1000 balance
    band, K=5): pseudonymized, generalized, small-group-suppressed.
    Rare bands at the balance extremes fall below K and are dropped —
    both polarities fire at sf0.01."""
    qi = [
        F.col("c_mktsegment"),
        F.floor(F.col("c_acctbal") / 1000).cast("long").alias("bal_band"),
    ]
    w = Window.partitionBy(*qi)
    return (
        t(spark, sf_dir, "customer")
        .select(
            F.md5(F.col("c_custkey").cast("string")).alias("pseudo_id"),
            *qi,
            F.count("*").over(w).alias("group_n"),
        )
        .filter(F.col("group_n") >= _K)
        .orderBy("pseudo_id")
    )


_LDIV_SQL = f"""
SELECT c_nationkey,
       CAST(floor(c_acctbal / 1000) AS BIGINT) AS bal_band,
       CAST(count(*) AS BIGINT) AS group_n,
       CAST(count(DISTINCT c_mktsegment) AS BIGINT) AS n_sensitive,
       CAST(count(DISTINCT c_mktsegment) >= {_L} AS BIGINT) AS l_ok
FROM customer
GROUP BY 1, 2
ORDER BY 1, 2
"""


@register("privacy_l_div", _LDIV_SQL)
def q_privacy_l_div(spark: SparkSession, sf_dir: str) -> DataFrame:
    """L-diversity audit (QI = nation x balance band, sensitive =
    mktsegment, L=3): flags QI groups whose sensitive attribute is too
    homogeneous for release even when the group is large enough for
    k-anonymity."""
    n_sens = F.countDistinct("c_mktsegment")
    return (
        t(spark, sf_dir, "customer")
        .groupBy(
            "c_nationkey",
            F.floor(F.col("c_acctbal") / 1000).cast("long").alias("bal_band"),
        )
        .agg(
            F.count("*").alias("group_n"),
            n_sens.alias("n_sensitive"),
            (n_sens >= _L).cast("long").alias("l_ok"),
        )
        .orderBy("c_nationkey", "bal_band")
    )
