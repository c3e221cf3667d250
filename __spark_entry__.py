"""Driver contract for the spark-graft builder (PySpark target).

The driver's verify runs ``entry(spark)`` as a smoke check, runs each
``queries()[name]`` at sf=0.01 and compares it against the matching
``oracle_sql()[name]`` via DuckDB (row-count + schema + order-insensitive
value-hash -> CORRECTNESS_r{N}.json).

Implementation lives in the ``ocr_spark`` package; the registry is built in
``ocr_spark/queries*.py`` (one entry per SURVEY.md §2 operator).
"""

from __future__ import annotations

import pathlib
import sys
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parent))


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on /root/testdata/sf0.001: wrap documents into
    Common-Crawl-style HTML pages and run the full extraction pipeline
    (mapInArrow HTML parse -> jusText classify/smooth -> assemble)."""
    from ocr_spark.queries import all_queries

    return all_queries()["extract_wrapped"](spark, "/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    from ocr_spark.queries import all_queries

    return all_queries()


def oracle_sql() -> dict[str, str]:
    from ocr_spark.queries import all_oracles

    return all_oracles()
