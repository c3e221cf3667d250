"""Table-format layer (ocr_spark.tables): parquet fallback exercised here;
the Iceberg branch runs for real iff the runtime jar is on the classpath
(absent in this sandbox — the test skips cleanly, per VERDICT item 6).
"""

from __future__ import annotations

import pytest

from pyspark.sql import functions as F


def test_parquet_fallback_roundtrip(spark, tmp_path):
    from ocr_spark.tables import read_table, write_table

    df = spark.range(100).select(
        F.col("id"), (F.col("id") % 4).cast("int").alias("part_id")
    )
    loc = str(tmp_path / "tbl")
    write_table(df, loc, mode="create", partition_by=("part_id",))
    back = read_table(spark, loc)
    assert back.count() == 100
    assert set(back.columns) == {"id", "part_id"}

    write_table(
        df.filter(F.col("id") < 10), loc, mode="append",
        partition_by=("part_id",),
    )
    assert read_table(spark, loc).count() == 110


def test_read_pages_dispatches_on_prefix(spark, tmp_path, fixture_df):
    from ocr_spark.operators.runner import read_pages

    d = str(tmp_path / "pages")
    fixture_df.write.parquet(d)
    assert read_pages(spark, d).count() == fixture_df.count()


def test_iceberg_roundtrip_when_runtime_present(spark, tmp_path):
    from ocr_spark.tables import iceberg_available, read_table, write_table

    if not iceberg_available(spark):
        pytest.skip("iceberg-spark-runtime jar not on classpath")
    # runs for real once the jar + a configured catalog exist
    spark.conf.set("spark.sql.catalog.local.type", "hadoop")
    spark.conf.set(
        "spark.sql.catalog.local", "org.apache.iceberg.spark.SparkCatalog"
    )
    spark.conf.set("spark.sql.catalog.local.warehouse", str(tmp_path / "wh"))
    df = spark.range(50).select(
        F.col("id"), (F.col("id") % 4).cast("int").alias("part_id")
    )
    loc = "iceberg:local.db.pages_t"
    write_table(df, loc, mode="create", partition_by=("part_id",))
    assert read_table(spark, loc).count() == 50
    write_table(df, loc, mode="overwrite_partitions")
    assert read_table(spark, loc).count() == 50  # idempotent re-commit
