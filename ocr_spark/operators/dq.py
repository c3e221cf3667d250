"""Declarative data-quality constraint suite (the Deequ pattern): a list
of constraints over ONE table is compiled into a SINGLE global
aggregation pass, then unpivoted to one verdict row per constraint.

Why this shape at 100 TB: naive DQ runners issue one job per check
(N scans of the table); here every constraint becomes one aggregate
expression inside the same two-stage (partial/final) agg, so the whole
suite costs exactly one scan + one single-row Exchange regardless of how
many constraints are registered. Uniqueness checks add a distinct
aggregate (Spark plans the Expand rewrite); everything else is a
count_if/sum over the scan.

Determinism contract: every reported metric is an integer —
``metric_e6`` is floor(satisfied * 1e6 / total) for ratio kinds,
floor(sum * 1e6 / total) for means, and the raw row count for size
checks — so verdict rows hash identically across engines (no float
division anywhere).

Constraint tuples (kind first):
  ("complete", name, col, min_e6)            null-free ratio >= min
  ("unique", name, col, min_e6)              distinct/total >= min
  ("in_set", name, col, values, min_e6)      membership ratio >= min
  ("between", name, col, lo, hi, min_e6)     lo<=col<=hi ratio >= min
  ("matches", name, col, regex, min_e6)      RLIKE ratio >= min
  ("satisfies", name, predicate_sql, min_e6) arbitrary row predicate
  ("mean_between", name, col, lo_e6, hi_e6)  1e6-scaled mean in range
  ("row_count_between", name, lo, hi)        total row count in range
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

_E6 = 1_000_000


def _sat_expr(c) -> tuple[str, str]:
    """Return (satisfied-count SQL, kind) for one constraint tuple."""
    kind = c[0]
    if kind == "complete":
        return f"count_if({c[2]} IS NOT NULL)", kind
    if kind == "unique":
        return f"count(DISTINCT {c[2]})", kind
    if kind == "in_set":
        vals = ", ".join(f"'{v}'" for v in c[3])
        return f"count_if({c[2]} IN ({vals}))", kind
    if kind == "between":
        return (
            f"count_if({c[2]} >= {c[3]} AND {c[2]} <= {c[4]})",
            kind,
        )
    if kind == "matches":
        return f"count_if({c[2]} RLIKE '{c[3]}')", kind
    if kind == "satisfies":
        return f"count_if({c[2]})", kind
    if kind == "mean_between":
        return f"sum(CAST({c[2]} AS BIGINT))", kind
    if kind == "row_count_between":
        return "count(*)", kind
    raise ValueError(f"unknown constraint kind {kind!r}")


def _bounds(c) -> tuple[int, int]:
    """(lo_e6, hi_e6) pass window for one constraint."""
    kind = c[0]
    if kind in (
        "complete", "unique", "satisfies", "in_set", "between", "matches"
    ):
        return int(c[-1]), _E6
    if kind == "mean_between":
        return int(c[3]), int(c[4])
    if kind == "row_count_between":
        return int(c[2]), int(c[3])
    raise ValueError(kind)


def dq_check(df: DataFrame, constraints: list[tuple]) -> DataFrame:
    """Compile the suite into one aggregation and return one row per
    constraint: (name, kind, metric_e6, lo_e6, hi_e6, passed). The plan
    is scan -> partial agg -> single-row final agg -> generate (explode):
    one table pass total."""
    aggs = [F.count(F.lit(1)).alias("_total")]
    for i, c in enumerate(constraints):
        sat_sql, _ = _sat_expr(c)
        aggs.append(F.expr(sat_sql).cast("bigint").alias(f"_s{i}"))
    return _verdicts_from_counters(df.agg(*aggs), constraints)


def _verdicts_from_counters(row: DataFrame, constraints) -> DataFrame:
    """Single counter row (_total, _s0..) -> one verdict row per
    constraint."""
    metas = [(c[1], c[0], *_bounds(c)) for c in constraints]
    verdicts = []
    for i, (name, kind, lo, hi) in enumerate(metas):
        if kind == "row_count_between":
            metric = F.col("_total")
        else:
            metric = F.expr(f"CASE WHEN _total = 0 THEN 0 "
                            f"ELSE (_s{i} * {_E6}) div _total END")
        verdicts.append(
            F.struct(
                F.lit(name).alias("name"),
                F.lit(kind).alias("kind"),
                metric.cast("bigint").alias("metric_e6"),
                F.lit(lo).cast("bigint").alias("lo_e6"),
                F.lit(hi).cast("bigint").alias("hi_e6"),
                ((metric >= F.lit(lo)) & (metric <= F.lit(hi))).alias(
                    "passed"
                ),
            )
        )
    return (
        row.select(F.explode(F.array(*verdicts)).alias("v"))
        .select("v.*")
    )


# --- streaming-mergeable split --------------------------------------------------------
# Every counter above except ``unique`` is SUM-mergeable across disjoint
# data slices: count_if/count/sum partials add. count(DISTINCT) does NOT
# (per-slice distincts over-count shared values), which is exactly why
# streaming uniqueness belongs to a sketch (stream_hll_registers), not a
# counter — enforced here rather than silently mis-merged.


def dq_partial_counts(df: DataFrame, constraints: list[tuple]) -> DataFrame:
    """One-row counter frame (_total, _s0..) for ONE data slice — the
    per-micro-batch unit of the streaming DQ path. Rejects non-mergeable
    kinds up front."""
    for c in constraints:
        if c[0] == "unique":
            raise ValueError(
                "uniqueness is not sum-mergeable across batches; use an "
                "HLL sketch (streaming/incremental.incremental_hll)"
            )
    aggs = [F.count(F.lit(1)).alias("_total")]
    for i, c in enumerate(constraints):
        sat_sql, _ = _sat_expr(c)
        aggs.append(F.expr(sat_sql).cast("bigint").alias(f"_s{i}"))
    return df.agg(*aggs)


def dq_fold_verdicts(
    counters: DataFrame, constraints: list[tuple]
) -> DataFrame:
    """Fold committed per-slice counter rows (SUM — the merge law) and
    produce the same verdict rows dq_check would emit over the union of
    the slices. Exact, not approximate: integer counters add losslessly,
    so incremental DQ equals batch DQ by construction."""
    cols = ["_total"] + [f"_s{i}" for i in range(len(constraints))]
    folded = counters.agg(
        *[F.sum(c).cast("bigint").alias(c) for c in cols]
    )
    return _verdicts_from_counters(folded, constraints)
