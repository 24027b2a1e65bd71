"""Dev harness mirroring the driver's t2 check: run every registered query
in Spark AND its DuckDB oracle on the same parquet, compare row count,
column names, and order-insensitive values (floats rounded to 1e-6).

Usage: python scripts/check_correctness.py [sf_dir] [query ...]
"""

from __future__ import annotations

import os
import sys
import time

import duckdb

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from kafka_connect_spark.catalog import TABLES
from kafka_connect_spark.queries import ORACLE, QUERIES
from kafka_connect_spark.session import get_spark
from kafka_connect_spark.testing import compare_frames


def main() -> int:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    only = sys.argv[2:]
    spark = get_spark("correctness-check")
    con = duckdb.connect()
    for t in TABLES:
        con.sql(f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")

    names = only or list(QUERIES)
    failed = []
    for name in names:
        t0 = time.time()
        try:
            spdf = QUERIES[name](spark, sf_dir).toPandas()
        except Exception as ex:  # noqa: BLE001
            failed.append(name)
            print(f"FAIL {name}: spark raised {type(ex).__name__}: {ex}")
            continue
        if name not in ORACLE:
            print(f"ok   {name}: rows-only ({len(spdf)} rows, {time.time()-t0:.1f}s)")
            continue
        try:
            dpdf = con.sql(ORACLE[name]).df()
        except Exception as ex:  # noqa: BLE001
            failed.append(name)
            print(f"FAIL {name}: duckdb raised {type(ex).__name__}: {ex}")
            continue
        problems = compare_frames(spdf, dpdf)
        if problems:
            failed.append(name)
            print(f"FAIL {name}: " + "; ".join(problems))
        else:
            print(f"ok   {name}: {len(spdf)} rows match ({time.time()-t0:.1f}s)")
    print(f"\n{len(names) - len(failed)}/{len(names)} passed")
    return 1 if failed else 0


if __name__ == "__main__":
    raise SystemExit(main())
