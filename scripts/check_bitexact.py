"""Stricter twin of check_correctness: BIT-EXACT value comparison.

The driver's hash check covers the exact value representation, so a 1-ulp
double difference (or -0.0 vs 0.0) that passes the 1e-6-tolerance dev check
still flips a driver row red (p14_deriv, round 5). This harness compares
float columns by their IEEE-754 bit patterns after canonical row ordering —
any query green here hashes green on the driver.

Usage: python scripts/check_bitexact.py [sf_dir] [query ...]
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


def _canon(df: pd.DataFrame) -> pd.DataFrame:
    df = df[sorted(df.columns)].copy()
    for c in df.columns:
        s = df[c]
        if pd.api.types.is_datetime64_any_dtype(s):
            df[c] = pd.to_datetime(s).dt.floor("ms")
        elif s.dtype == object:
            df[c] = s.map(lambda v: v.hex() if isinstance(v, (bytes, bytearray)) else v)
    return df.sort_values(by=list(df.columns), ignore_index=True)


def _col_mismatches(av: pd.Series, bv: pd.Series) -> int:
    if pd.api.types.is_float_dtype(av) or pd.api.types.is_float_dtype(bv):
        # bit-level: exact representation match, NaN == NaN
        ab = av.astype(np.float64).to_numpy().view(np.uint64)
        bb = bv.astype(np.float64).to_numpy().view(np.uint64)
        return int((ab != bb).sum())
    return int((av.astype(str) != bv.astype(str)).sum())


def main() -> int:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    only = sys.argv[2:]
    spark = get_spark("bitexact-check")
    spark.sparkContext.setLogLevel("ERROR")
    con = duckdb.connect()
    for t in TABLES:
        con.sql(f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")

    names = [n for n in (only or list(QUERIES)) if n in ORACLE]
    failed = []
    for name in names:
        t0 = time.time()
        try:
            spdf = QUERIES[name](spark, sf_dir).toPandas()
            dpdf = con.sql(ORACLE[name]).df()
        except Exception as ex:  # noqa: BLE001
            failed.append(name)
            print(f"FAIL {name}: raised {type(ex).__name__}: {ex}")
            continue
        if sorted(spdf.columns) != sorted(dpdf.columns) or len(spdf) != len(dpdf):
            failed.append(name)
            print(f"FAIL {name}: shape/columns differ")
            continue
        a, b = _canon(spdf), _canon(dpdf)
        bad = {c: _col_mismatches(a[c], b[c]) for c in a.columns}
        bad = {c: n for c, n in bad.items() if n}
        if bad:
            failed.append(name)
            print(f"FAIL {name}: bit-level mismatches {bad}")
        else:
            print(f"ok   {name}: {len(spdf)} rows bit-exact ({time.time()-t0:.1f}s)")
    print(f"\n{len(names) - len(failed)}/{len(names)} bit-exact")
    return 1 if failed else 0


if __name__ == "__main__":
    raise SystemExit(main())
