"""Job-timeline drill-down for one query: run it warm, then print every
job's [submission..completion] and the GAPS between consecutive jobs —
the scheduler/driver dead time that dominates small-SF wall clock.

Usage: python scripts/profile_timeline.py <query> [sf_dir]
"""

from __future__ import annotations

import datetime as dt
import json
import os
import sys
import time
import urllib.request

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from kafka_connect_spark.queries import QUERIES
from kafka_connect_spark.session import get_spark


def _api(base: str, path: str):
    with urllib.request.urlopen(base + path, timeout=10) as r:
        return json.load(r)


def _ts(s: str) -> float:
    return dt.datetime.strptime(s[:-3], "%Y-%m-%dT%H:%M:%S.%f").timestamp()


def main() -> int:
    name = sys.argv[1]
    sf_dir = sys.argv[2] if len(sys.argv) > 2 else "/root/testdata/sf0.1"
    spark = get_spark(
        "profile-timeline",
        extra_conf={
            "spark.ui.enabled": "true",
            "spark.ui.port": "4056",
            "spark.ui.showConsoleProgress": "false",
        },
    )
    spark.sparkContext.setLogLevel("ERROR")
    base = "http://127.0.0.1:4056/api/v1"
    app_id = _api(base, "/applications")[0]["id"]
    app = f"/applications/{app_id}"

    from kafka_connect_spark.catalog import load

    load(spark, sf_dir, "lineitem").count()

    fn = QUERIES[name]
    fn(spark, sf_dir).write.format("noop").mode("overwrite").save()  # warm

    jobs_before = {j["jobId"] for j in _api(base, app + "/jobs")}
    t0 = time.time()
    df = fn(spark, sf_dir)
    t1 = time.time()
    df.write.format("noop").mode("overwrite").save()
    t2 = time.time()

    jobs = sorted(
        (j for j in _api(base, app + "/jobs") if j["jobId"] not in jobs_before),
        key=lambda j: j["jobId"],
    )
    print(f"{name}: build={t1-t0:.3f}s exec={t2-t1:.3f}s total={t2-t0:.3f}s")
    prev_end = t0
    total_gap = 0.0
    for j in jobs:
        sub = _ts(j["submissionTime"])
        end = _ts(j["completionTime"]) if j.get("completionTime") else sub
        gap = sub - prev_end
        total_gap += max(gap, 0)
        print(
            f"  job {j['jobId']:>4} gap={gap:6.3f}s run={end-sub:6.3f}s "
            f"tasks={j.get('numCompletedTasks', 0):>4} stages={len(j['stageIds'])} "
            f"{(j.get('description') or j.get('name') or '')[:80]}"
        )
        prev_end = end
    print(f"  tail gap={t2-prev_end:.3f}s; total inter-job gap={total_gap:.3f}s")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
