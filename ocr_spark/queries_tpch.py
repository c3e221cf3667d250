"""Named TPC-H queries (Q1, Q3, Q5, Q6, Q18), adapted to the synthetic
tables' slimmed schemas, expressed through the SQL ENTRY POINT.

Everything else in the registry drives the DataFrame API; these five go
through ``spark.sql`` over registered views — the second §3 lifecycle
entry point — with the SAME query text (modulo the date-format function
name) running on both engines. That makes them the closest thing to a
portability gate: the text a warehouse user would actually type.

Float discipline: revenue expressions are integer-cents arithmetic BEFORE
aggregation — ``price_cents * (100 - disc_cents)`` is exact BIGINT math
(discount/tax are 2-decimal), so sums are order-independent and
cross-engine identical; the single divide happens after the SUM. At
10^12-row scale the e4/e6 fixed-point sums would move to DECIMAL(38) to
dodge int64 overflow; at benchmark scale BIGINT headroom is ~10^3x.

Plan shape (pinned in tests/test_plans.py): Q1 is one partial/final
hash-aggregate pair with the shipdate filter pushed to the scan; Q3/Q5
broadcast the dimension sides under AQE and shuffle only the fact keys;
Q18's HAVING subquery plans as an aggregate feeding a shuffled semi-join
on the orderkey — never a full materialized IN-list.
"""
from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from ocr_spark.queries import register, t

_REV = (
    "CAST(round(l_extendedprice * 100, 0) AS BIGINT)"
    " * (100 - CAST(round(l_discount * 100, 0) AS BIGINT))"
)
_CHARGE = (
    f"{_REV} * (100 + CAST(round(l_tax * 100, 0) AS BIGINT))"
)

_TABLES = (
    "lineitem", "orders", "customer", "supplier", "nation", "region",
    "part",
)


def _sql(spark: SparkSession, sf_dir: str, text: str) -> DataFrame:
    for name in _TABLES:
        t(spark, sf_dir, name).createOrReplaceTempView(name)
    return spark.sql(text)


_Q1 = """
SELECT l_returnflag, l_linestatus,
  CAST(sum(CAST(l_quantity AS BIGINT)) AS BIGINT) AS sum_qty,
  CAST(sum(CAST(round(l_extendedprice * 100, 0) AS BIGINT)) AS DOUBLE)
    / 100.0 AS sum_base_price,
  CAST(sum({rev}) AS DOUBLE) / 10000.0 AS sum_disc_price,
  CAST(sum({charge}) AS DOUBLE) / 1000000.0 AS sum_charge,
  count(*) AS count_order
FROM lineitem
WHERE l_shipdate <= TIMESTAMP '2001-06-01 00:00:00'
GROUP BY l_returnflag, l_linestatus
ORDER BY l_returnflag, l_linestatus
""".format(rev=_REV, charge=_CHARGE)


@register("tpch_q1", _Q1)
def q_tpch_q1(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q1 pricing summary through spark.sql — identical query text
    on both engines; integer-cents per-row quantization keeps every SUM
    order-independent."""
    return _sql(spark, sf_dir, _Q1)


_Q3 = """
SELECT l.l_orderkey,
  CAST(sum({rev}) AS DOUBLE) / 10000.0 AS revenue,
  {fmt} AS orderdate
FROM customer c
JOIN orders o ON c.c_custkey = o.o_custkey
JOIN lineitem l ON o.o_orderkey = l.l_orderkey
WHERE c.c_mktsegment = 'BUILDING'
  AND o.o_orderdate < TIMESTAMP '1998-06-30 00:00:00'
  AND l.l_shipdate > TIMESTAMP '1998-06-30 00:00:00'
GROUP BY l.l_orderkey, o.o_orderdate
ORDER BY revenue DESC, l.l_orderkey
LIMIT 10
"""


@register(
    "tpch_q3",
    _Q3.format(rev=_REV, fmt="strftime(o.o_orderdate, '%Y-%m-%d')"),
)
def q_tpch_q3(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q3 shipping-priority top-10 (deterministic orderkey
    tie-break added — TPC-H's bare LIMIT is engine-lottery on revenue
    ties)."""
    return _sql(
        spark, sf_dir,
        _Q3.format(rev=_REV, fmt="date_format(o.o_orderdate, 'yyyy-MM-dd')"),
    )


_Q5 = """
SELECT n.n_name,
  CAST(sum({rev}) AS DOUBLE) / 10000.0 AS revenue
FROM customer c
JOIN orders o ON c.c_custkey = o.o_custkey
JOIN lineitem l ON o.o_orderkey = l.l_orderkey
JOIN supplier s ON l.l_suppkey = s.s_suppkey
  AND c.c_nationkey = s.s_nationkey
JOIN nation n ON s.s_nationkey = n.n_nationkey
JOIN region r ON n.n_regionkey = r.r_regionkey
WHERE r.r_name = 'ASIA'
  AND o.o_orderdate >= TIMESTAMP '1996-01-01 00:00:00'
  AND o.o_orderdate < TIMESTAMP '1998-01-01 00:00:00'
GROUP BY n.n_name
ORDER BY revenue DESC, n.n_name
""".format(rev=_REV)


@register("tpch_q5", _Q5)
def q_tpch_q5(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q5 local-supplier volume: the 6-table join with the
    customer-nation = supplier-nation residual — region/nation broadcast,
    fact keys shuffle once."""
    return _sql(spark, sf_dir, _Q5)


_Q6 = """
SELECT CAST(sum(CAST(round(l_extendedprice * 100, 0) AS BIGINT)
           * CAST(round(l_discount * 100, 0) AS BIGINT)) AS DOUBLE)
  / 10000.0 AS revenue
FROM lineitem
WHERE l_shipdate >= TIMESTAMP '1996-01-01 00:00:00'
  AND l_shipdate < TIMESTAMP '1997-01-01 00:00:00'
  AND CAST(round(l_discount * 100, 0) AS BIGINT) BETWEEN 5 AND 7
  AND l_quantity < 24
"""


@register("tpch_q6", _Q6)
def q_tpch_q6(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q6 forecasting-revenue change: pure pushed-filter scan +
    one global agg. The discount band compares CENTS (integers) — a raw
    BETWEEN 0.05 AND 0.07 would hinge on float literal parsing, which
    DuckDB reads as DECIMAL and Spark as DOUBLE."""
    return _sql(spark, sf_dir, _Q6)


_Q18 = """
SELECT c.c_name, c.c_custkey, o.o_orderkey,
  {fmt} AS orderdate, o.o_totalprice,
  CAST(sum(CAST(l.l_quantity AS BIGINT)) AS BIGINT) AS sum_qty
FROM customer c
JOIN orders o ON c.c_custkey = o.o_custkey
JOIN lineitem l ON o.o_orderkey = l.l_orderkey
WHERE o.o_orderkey IN (
  SELECT l_orderkey FROM lineitem
  GROUP BY l_orderkey HAVING sum(l_quantity) > 250
)
GROUP BY c.c_name, c.c_custkey, o.o_orderkey, o.o_orderdate, o.o_totalprice
ORDER BY o.o_totalprice DESC, o.o_orderkey
LIMIT 100
"""


@register(
    "tpch_q18",
    _Q18.format(fmt="strftime(o.o_orderdate, '%Y-%m-%d')"),
)
def q_tpch_q18(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q18 large-volume customers: the HAVING subquery becomes an
    aggregate feeding a semi-join on orderkey (never a materialized
    IN-list); threshold 250 keeps the result non-empty from sf0.001 up."""
    return _sql(
        spark, sf_dir,
        _Q18.format(fmt="date_format(o.o_orderdate, 'yyyy-MM-dd')"),
    )


# --- round-4 late suite growth: Q4, Q12, Q14, Q19, Q22 -------------------------
# Adapted to the slimmed synthetic schemas like Q1-Q18 above (no
# commitdate/receiptdate/shipmode/container/phone columns), preserving
# each query's CHARACTERISTIC plan shape: Q4 correlated EXISTS -> semi
# join, Q12 join + conditional aggregation, Q14 conditional revenue
# share, Q19 OR-of-ANDs disjunctive pushdown, Q22 scalar subquery +
# NOT EXISTS anti join. Determinism: counts/cents are BIGINT; each
# double appears as ONE division of integer-exact operands (identical
# IEEE inputs -> identical result on both engines).

_Q4 = """
SELECT o_orderpriority, count(*) AS order_count
FROM orders o
WHERE o.o_orderdate >= TIMESTAMP '1998-01-01 00:00:00'
  AND o.o_orderdate < TIMESTAMP '1998-07-01 00:00:00'
  AND EXISTS (
    SELECT 1 FROM lineitem l
    WHERE l.l_orderkey = o.o_orderkey AND l.l_shipdate > o.o_orderdate
  )
GROUP BY o_orderpriority
ORDER BY o_orderpriority
"""


@register("tpch_q4", _Q4)
def q_tpch_q4(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q4 order-priority checking: the correlated EXISTS must plan
    as a LEFT SEMI join on l_orderkey (pinned in tests/test_plans.py),
    never a per-row subquery."""
    return _sql(spark, sf_dir, _Q4)


_Q12 = """
SELECT l.l_returnflag,
  CAST(sum(CASE WHEN o.o_orderpriority IN ('1-URGENT', '2-HIGH')
    THEN 1 ELSE 0 END) AS BIGINT) AS high_line_count,
  CAST(sum(CASE WHEN o.o_orderpriority NOT IN ('1-URGENT', '2-HIGH')
    THEN 1 ELSE 0 END) AS BIGINT) AS low_line_count
FROM orders o
JOIN lineitem l ON o.o_orderkey = l.l_orderkey
WHERE l.l_shipdate >= TIMESTAMP '1999-01-01 00:00:00'
  AND l.l_shipdate < TIMESTAMP '2000-01-01 00:00:00'
GROUP BY l.l_returnflag
ORDER BY l.l_returnflag
"""


@register("tpch_q12", _Q12)
def q_tpch_q12(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q12 shipping-priority split (returnflag standing in for the
    slimmed-away shipmode): fact-fact join + conditional counts."""
    return _sql(spark, sf_dir, _Q12)


_Q14 = """
SELECT
  CAST(100 * sum(CASE WHEN p.p_type = 'PROMO' THEN {rev} ELSE 0 END)
    AS DOUBLE)
  / CAST(sum({rev}) AS DOUBLE) AS promo_revenue
FROM lineitem l
JOIN part p ON l.l_partkey = p.p_partkey
WHERE l.l_shipdate >= TIMESTAMP '1999-06-01 00:00:00'
  AND l.l_shipdate < TIMESTAMP '1999-08-01 00:00:00'
""".format(rev=_REV)


@register("tpch_q14", _Q14)
def q_tpch_q14(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q14 promotion-revenue share: both sums are exact BIGINT
    cents^2, the division is the only float op."""
    return _sql(spark, sf_dir, _Q14)


_Q19 = """
SELECT CAST(sum({rev}) AS DOUBLE) / 10000.0 AS revenue
FROM lineitem l
JOIN part p ON p.p_partkey = l.l_partkey
WHERE
  (p.p_brand = 'Brand#1' AND p.p_size BETWEEN 1 AND 15
   AND l.l_quantity BETWEEN 1 AND 20)
  OR (p.p_brand = 'Brand#7' AND p.p_size BETWEEN 10 AND 30
   AND l.l_quantity BETWEEN 5 AND 30)
  OR (p.p_brand = 'Brand#15' AND p.p_size BETWEEN 20 AND 50
   AND l.l_quantity BETWEEN 10 AND 40)
""".format(rev=_REV)


@register("tpch_q19", _Q19)
def q_tpch_q19(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q19 discounted revenue under OR-of-ANDs: the disjunction
    mixes join-side and scan-side predicates — the planner must still
    hash-join on partkey and evaluate the residual post-join rather than
    falling back to a nested loop."""
    return _sql(spark, sf_dir, _Q19)


_Q22 = """
SELECT cntrycode, count(*) AS numcust,
  CAST(sum(acctbal_cents) AS DOUBLE) / 100.0 AS totacctbal
FROM (
  SELECT substring(c.c_name, 17, 2) AS cntrycode,
    CAST(round(c.c_acctbal * 100, 0) AS BIGINT) AS acctbal_cents
  FROM customer c
  WHERE CAST(round(c.c_acctbal * 100, 0) AS BIGINT) > (
      SELECT sum(CAST(round(c_acctbal * 100, 0) AS BIGINT)) / count(*)
      FROM customer WHERE c_acctbal > 0.0
    )
    AND NOT EXISTS (
      SELECT 1 FROM orders o
      WHERE o.o_custkey = c.c_custkey
        AND o.o_orderpriority = '1-URGENT'
    )
)
GROUP BY cntrycode
ORDER BY cntrycode
"""


@register("tpch_q22", _Q22)
def q_tpch_q22(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q22 global-sales-opportunity: an uncorrelated scalar
    subquery (integer-cents average — the sum is exact, the one divide
    sees identical operands on both engines) plus a NOT EXISTS that must
    plan as a LEFT ANTI join on custkey ('customers with no urgent
    order' standing in for the slimmed-away phone prefix)."""
    return _sql(spark, sf_dir, _Q22)


_Q13 = """
SELECT c_count, count(*) AS custdist
FROM (
  SELECT c.c_custkey AS custkey, count(o.o_orderkey) AS c_count
  FROM customer c
  LEFT OUTER JOIN orders o
    ON c.c_custkey = o.o_custkey
    AND o.o_orderpriority <> '5-LOW'
  GROUP BY c.c_custkey
)
GROUP BY c_count
ORDER BY custdist DESC, c_count DESC
"""


@register("tpch_q13", _Q13)
def q_tpch_q13(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q13 customer distribution: LEFT OUTER with an ON-clause
    residual (zero-order customers must survive as c_count = 0), then a
    second aggregation over the first's output — the classic two-level
    agg whose inner keys are the outer's values."""
    return _sql(spark, sf_dir, _Q13)
