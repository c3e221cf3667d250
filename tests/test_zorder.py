"""Z-order layout gates (functions/zorder.py + snapshot-table
compact(zorder_by=...)): the interleave arithmetic against a pure-Python
reference, and the property the whole feature exists for — after ONE
z-order rewrite, read_where file-skips on BOTH columns, where a linear
cluster_by rewrite skips on exactly one.
"""

from __future__ import annotations

import shutil
import tempfile

import pytest
from pyspark.sql import functions as F

from ocr_spark import tables_snapshot as snap
from ocr_spark.functions import zorder as zo


def test_zvalue_matches_reference(spark):
    rows = [(a, b) for a in (0, 1, 5, 255, 254) for b in (0, 3, 128, 255)]
    df = spark.createDataFrame(rows, "x bigint, y bigint")
    got = {
        (r.x, r.y): r.z
        for r in df.selectExpr(
            "x", "y", zo.zvalue_spark(["x", "y"], 8) + " AS z"
        ).collect()
    }
    for a, b in rows:
        assert got[(a, b)] == zo.zvalue_py([a, b], 8)


def test_zvalue_three_columns_and_bit_budget(spark):
    df = spark.createDataFrame([(3, 5, 7)], "x bigint, y bigint, z bigint")
    got = df.selectExpr(
        zo.zvalue_spark(["x", "y", "z"], 4) + " AS v"
    ).collect()[0].v
    assert got == zo.zvalue_py([3, 5, 7], 4)
    with pytest.raises(ValueError):
        zo.zvalue_spark(["a", "b", "c"], 21)  # 63 bits: over budget


def test_zvalue_locality_tiles(spark):
    """Keys in the same quadrant of the plane are contiguous in z: the
    top interleaved bits ARE the quadrant id — the property that makes
    one sort yield tight per-file ranges on both columns."""
    for a, b in [(10, 200), (99, 255), (200, 10), (255, 99)]:
        z = zo.zvalue_py([a, b], 8)
        # top two bits of z = (b_hi, a_hi): quadrant
        assert (z >> 14) & 3 == ((a >> 7) | ((b >> 7) << 1))


@pytest.fixture()
def root():
    d = tempfile.mkdtemp(prefix="zorder-tbl-")
    yield f"{d}/tbl"
    shutil.rmtree(d, ignore_errors=True)


def _grid(spark, n=4096):
    # x and y independent: the worst case for single-column clustering
    return (
        spark.range(n)
        .selectExpr(
            "id AS doc_id",
            "CAST(id % 64 AS BIGINT) AS x",
            "CAST((id * 37) % 64 AS BIGINT) AS y",
        )
    )


def test_zorder_compact_prunes_both_columns(spark, root):
    snap.create(_grid(spark).repartition(8), root)
    snap.compact(spark, root, target_file_bytes=4 << 10, zorder_by=("x", "y"))
    # data identity after the rewrite
    assert snap.read(spark, root).count() == 4096
    assert (
        snap.read(spark, root).agg(F.sum("x"), F.sum("y")).collect()
        == _grid(spark).agg(F.sum("x"), F.sum("y")).collect()
    )
    dfx, readx, skipx = snap.read_where(spark, root, "x", 0, 7)
    dfy, ready, skipy = snap.read_where(spark, root, "y", 0, 7)
    assert dfx.count() == 4096 // 8 and dfy.count() == 4096 // 8
    assert skipx > 0, "z-order must prune on x"
    assert skipy > 0, "z-order must prune on y"


def test_linear_cluster_prunes_one_column_only(spark, root):
    """The contrast case: cluster_by=x prunes x ranges but reads every
    file for a y range — the gap zorder_by closes."""
    snap.create(_grid(spark).repartition(8), root)
    snap.compact(spark, root, target_file_bytes=4 << 10, cluster_by="x")
    _, _, skipx = snap.read_where(spark, root, "x", 0, 7)
    _, ready, skipy = snap.read_where(spark, root, "y", 0, 7)
    assert skipx > 0
    assert skipy == 0 and ready > 1


def test_zorder_key_query_matches_oracle_shape(spark):
    from ocr_spark.queries_tables import q_table_zorder_key
    from tests.conftest import SF_SMALL

    out = q_table_zorder_key(spark, SF_SMALL)
    rows = out.collect()
    assert len(rows) > 0
    assert set(out.columns) == {"doc_id", "zval"}
    assert all(r.zval >= 0 for r in rows)
