"""Ad-hoc single-query oracle check: python scripts/check_oracle.py name [name...]

Runs the named registry queries against their DuckDB oracles at sf0.01 with
the same canonicalization as tests/test_oracle.py, printing PASS/FAIL and the
first few diffs. Dev tool only — the real gates are tests/test_oracle.py and
the driver's CORRECTNESS file.
"""

from __future__ import annotations

import pathlib
import sys

REPO = pathlib.Path(__file__).resolve().parents[1]
sys.path.insert(0, str(REPO))
sys.path.insert(0, str(REPO / "tests"))

import duckdb  # noqa: E402

from tests.test_oracle import _canon, _duck_rows, _spark_rows, TABLES  # noqa: E402
from tests.conftest import SF_ORACLE  # noqa: E402


def main() -> None:
    names = sys.argv[1:]
    import __spark_entry__ as entrymod

    qs = entrymod.queries()
    os_ = entrymod.oracle_sql()
    from ocr_spark.session import build_session

    spark = build_session(master="local[8]", app_name="check-oracle",
                          shuffle_partitions=8)
    con = duckdb.connect()
    for tb in TABLES:
        con.sql(f"CREATE VIEW {tb} AS SELECT * FROM '{SF_ORACLE}/{tb}.parquet'")
    bad = 0
    for name in names:
        if name not in qs:
            print(f"{name}: NOT REGISTERED")
            bad += 1
            continue
        if name not in os_:
            print(f"{name}: no oracle (rows-only)")
            df = qs[name](spark, SF_ORACLE)
            print(f"  spark rows = {df.count()}")
            continue
        try:
            scols, srows = _spark_rows(qs[name](spark, SF_ORACLE))
        except Exception as e:  # noqa: BLE001
            print(f"{name}: SPARK ERROR {e}")
            bad += 1
            continue
        try:
            dcols, drows = _duck_rows(con, os_[name])
        except Exception as e:  # noqa: BLE001
            print(f"{name}: DUCKDB ERROR {e}")
            bad += 1
            continue
        ok = scols == dcols and srows == drows
        print(f"{name}: {'PASS' if ok else 'FAIL'} "
              f"(spark {len(srows)} rows, duck {len(drows)} rows)")
        if not ok:
            bad += 1
            if scols != dcols:
                print(f"  cols spark={scols} duck={dcols}")
            sset, dset = set(srows), set(drows)
            for r in list(sset - dset)[:3]:
                print(f"  spark-only: {r}")
            for r in list(dset - sset)[:3]:
                print(f"  duck-only:  {r}")
    spark.stop()
    sys.exit(1 if bad else 0)


if __name__ == "__main__":
    main()
