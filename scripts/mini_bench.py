"""Targeted re-bench: time named queries EXACTLY like bench.py (noop sink,
median of N reps, no UI) for before/after comparisons during optimization.

Usage: python scripts/mini_bench.py [sf_dir] query [query ...]
Env: SPARK_GRAFT_BENCH_REPS (default 3)
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from kafka_connect_spark.catalog import load
from kafka_connect_spark.queries import QUERIES
from kafka_connect_spark.session import get_spark


def _median(xs):
    s = sorted(xs)
    m = len(s) // 2
    return s[m] if len(s) % 2 else (s[m - 1] + s[m]) / 2


def main() -> int:
    args = sys.argv[1:]
    sf_dir = "/root/testdata/sf0.1"
    if args and os.path.isdir(args[0]):
        sf_dir, args = args[0], args[1:]
    reps = max(1, int(os.environ.get("SPARK_GRAFT_BENCH_REPS", "3")))
    spark = get_spark(
        "mini-bench", extra_conf={"spark.ui.showConsoleProgress": "false"}
    )
    spark.sparkContext.setLogLevel("ERROR")
    load(spark, sf_dir, "lineitem").count()  # warm JVM + footers
    out = {}
    for name in args:
        fn = QUERIES[name]
        runs = []
        for _ in range(reps):
            t0 = time.time()
            fn(spark, sf_dir).write.format("noop").mode("overwrite").save()
            runs.append(time.time() - t0)
        out[name] = round(_median(runs), 3)
        print(json.dumps({"name": name, "median": out[name], "runs": [round(r, 3) for r in runs]}), flush=True)
    print(json.dumps({"total": round(sum(out.values()), 3), "n": len(out)}))
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
