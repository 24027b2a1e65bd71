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
import numpy as np
import pandas as pd

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from kafka_connect_spark.catalog import TABLES
from kafka_connect_spark.queries import ORACLE, QUERIES
from kafka_connect_spark.session import get_spark


def canon(df: pd.DataFrame) -> pd.DataFrame:
    df = df[sorted(df.columns)].copy()
    for c in df.columns:
        s = df[c]
        if pd.api.types.is_float_dtype(s):
            df[c] = s.round(6)
        elif pd.api.types.is_datetime64_any_dtype(s):
            df[c] = pd.to_datetime(s).dt.floor("ms")
        elif s.dtype == object:
            df[c] = s.map(lambda v: v.hex() if isinstance(v, (bytes, bytearray)) else v)
    df = df.sort_values(by=list(df.columns), ignore_index=True)
    return df


def compare(name: str, spark_pdf: pd.DataFrame, duck_pdf: pd.DataFrame) -> list[str]:
    problems = []
    if sorted(spark_pdf.columns) != sorted(duck_pdf.columns):
        problems.append(f"columns differ: spark={sorted(spark_pdf.columns)} duck={sorted(duck_pdf.columns)}")
        return problems
    if len(spark_pdf) != len(duck_pdf):
        problems.append(f"row count differs: spark={len(spark_pdf)} duck={len(duck_pdf)}")
    a, b = canon(spark_pdf), canon(duck_pdf)
    if len(a) == len(b):
        for c in a.columns:
            av, bv = a[c], b[c]
            if pd.api.types.is_float_dtype(av) or pd.api.types.is_float_dtype(bv):
                ok = np.allclose(
                    av.astype(float).fillna(-9e99),
                    bv.astype(float).fillna(-9e99),
                    atol=1e-6,
                    rtol=0,
                )
            else:
                ok = av.astype(str).equals(bv.astype(str))
            if not ok:
                bad = (av.astype(str) != bv.astype(str)).idxmax() if len(av) else 0
                problems.append(
                    f"values differ in {c!r}: e.g. row {bad}: spark={av.iloc[bad]!r} duck={bv.iloc[bad]!r}"
                )
    return problems


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
        problems = compare(name, spdf, dpdf)
        if problems:
            failed.append(name)
            print(f"FAIL {name}: " + "; ".join(problems))
        else:
            print(f"ok   {name}: {len(spdf)} rows match ({time.time()-t0:.1f}s)")
    print(f"\n{len(names) - len(failed)}/{len(names)} passed")
    return 1 if failed else 0


if __name__ == "__main__":
    raise SystemExit(main())
