"""Z-order (Morton) interleaving for multi-column data layout (SURVEY §2
scale block): the curve that makes ONE sort serve range queries on
SEVERAL columns.

A linear `cluster_by=x` compaction gives perfect file skipping on x and
NONE on y (every file's y-[min,max] spans the whole domain). Sorting by
the bit-interleave of (x, y) instead makes each output file cover a small
square-ish tile of the (x, y) plane, so the per-file footer [min, max]
recorded in the snapshot manifest is narrow on BOTH columns and
`read_where` prunes on either — the layout trick behind
Delta/Iceberg OPTIMIZE ZORDER, rebuilt here from arithmetic.

Exactness contract, as everywhere in this engine: the z-value is pure
BIGINT shift/mask arithmetic (an UNROLLED sum of per-bit terms — the
MinHash hoisting lesson: no lambda re-materialization), identical in
Spark and DuckDB, so a driver entry can put every interleaved key under
the value hash.

Inputs must already be integers in [0, 2^bits); :func:`scaled_expr`
provides the order-preserving linear quantization used by the table
compaction path (min/max come from one aggregate over the table being
rewritten — cheap next to the rewrite itself).
"""

from __future__ import annotations

from pyspark.sql import functions as F


def _check(n_cols: int, bits: int) -> None:
    if n_cols * bits > 62:
        raise ValueError(f"{n_cols} cols x {bits} bits exceeds BIGINT")


def zvalue_spark(cols: list[str], bits: int) -> str:
    """Spark SQL expression: interleave ``bits`` low bits of each column
    (col j contributes bit i to output position i*n + j). Columns must be
    non-negative BIGINTs < 2^bits."""
    _check(len(cols), bits)
    n = len(cols)
    terms = [
        f"shiftleft(shiftright({c}, {i}) % 2, {i * n + j})"
        for i in range(bits)
        for j, c in enumerate(cols)
    ]
    return "CAST(" + " + ".join(terms) + " AS BIGINT)"


def zvalue_duck(cols: list[str], bits: int) -> str:
    """The same interleave in DuckDB SQL (>>/<</% on BIGINT)."""
    _check(len(cols), bits)
    n = len(cols)
    terms = [
        f"((({c} >> {i}) % 2) << {i * n + j})"
        for i in range(bits)
        for j, c in enumerate(cols)
    ]
    return "CAST(" + " + ".join(terms) + " AS BIGINT)"


def zvalue_py(vals: list[int], bits: int) -> int:
    """Reference implementation for tests."""
    _check(len(vals), bits)
    n = len(vals)
    z = 0
    for i in range(bits):
        for j, v in enumerate(vals):
            z += ((v >> i) & 1) << (i * n + j)
    return z


def scaled_expr(col: str, lo: int, hi: int, bits: int) -> str:
    """Order-preserving linear quantization of ``col`` (known [lo, hi])
    into [0, 2^bits): q = (v - lo)·(2^bits − 1) div max(1, hi − lo).
    All BIGINT; safe while range·2^bits stays under 2^63 (bits=16 over
    any realistic id/count domain)."""
    top = (1 << bits) - 1
    span = max(1, hi - lo)
    return (
        f"CAST((CAST({col} AS BIGINT) - CAST({lo} AS BIGINT))"
        f" * {top} div {span} AS BIGINT)"
    )


def with_zvalue(df, cols: list[str], bits: int = 16, out: str = "_z"):
    """df + a ``_z`` column: each input column linearly scaled to
    ``bits`` bits from its OWN observed [min, max] (one aggregate job),
    then interleaved. Used by the snapshot table's z-order compaction."""
    ranges = df.agg(
        *[F.min(c).cast("long").alias(f"_lo_{c}") for c in cols],
        *[F.max(c).cast("long").alias(f"_hi_{c}") for c in cols],
    ).collect()[0]
    scaled = [
        scaled_expr(c, ranges[f"_lo_{c}"], ranges[f"_hi_{c}"], bits)
        for c in cols
    ]
    return df.withColumn("_zs", F.expr(
        "struct(" + ", ".join(
            f"{s} AS _q{j}" for j, s in enumerate(scaled)
        ) + ")"
    )).withColumn(
        out,
        F.expr(zvalue_spark([f"_zs._q{j}" for j in range(len(cols))], bits)),
    ).drop("_zs")
