"""Per-query profiling harness (optimization guide §1): for each named
query, time the BUILDER (Python plan construction, incl. any build-time
jobs) and the EXECUTION (noop sink) separately, and attribute Spark
jobs/stages/tasks via the UI REST API so the cost is decomposable into
scheduler rounds vs actual task work.

Usage: python scripts/profile_queries.py [sf_dir] [query ...]
  (no query args => the bench HEADLINE list)

Emits one JSON line per query to stdout:
  {"name": ..., "build_sec": ..., "exec_sec": ..., "n_jobs": ...,
   "n_stages": ..., "n_tasks": ..., "task_time_sec": ...,
   "max_task_sec": ...}
and a final summary line. Timings are a single warm rep (one untimed
warmup first), which is what the bench's median-of-3 converges to.
"""

from __future__ import annotations

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


def main() -> int:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    names = sys.argv[2:]
    if not names:
        from bench import HEADLINE

        names = list(HEADLINE)

    spark = get_spark(
        "profile",
        extra_conf={
            "spark.ui.enabled": "true",
            "spark.ui.port": "4055",
            "spark.ui.showConsoleProgress": "false",
        },
    )
    spark.sparkContext.setLogLevel("ERROR")
    base = "http://127.0.0.1:4055/api/v1"
    app_id = _api(base, "/applications")[0]["id"]
    app = f"/applications/{app_id}"

    # warm JVM + parquet footers
    from kafka_connect_spark.catalog import load

    load(spark, sf_dir, "lineitem").count()

    rows = []
    for name in names:
        fn = QUERIES[name]
        # untimed warmup (codegen compile, JIT)
        try:
            fn(spark, sf_dir).write.format("noop").mode("overwrite").save()
        except Exception as ex:  # noqa: BLE001
            print(json.dumps({"name": name, "error": str(ex)[:200]}), flush=True)
            continue
        jobs_before = {j["jobId"] for j in _api(base, app + "/jobs")}
        spark.sparkContext.setJobDescription(f"profile:{name}")
        t0 = time.time()
        df = fn(spark, sf_dir)
        t1 = time.time()
        df.write.format("noop").mode("overwrite").save()
        t2 = time.time()
        spark.sparkContext.setJobDescription(None)
        jobs = [
            j
            for j in _api(base, app + "/jobs")
            if j["jobId"] not in jobs_before
        ]
        stage_ids = sorted({s for j in jobs for s in j["stageIds"]})
        n_tasks = sum(j.get("numCompletedTasks", 0) for j in jobs)
        task_time_ms = 0
        max_task_ms = 0
        n_stages = 0
        for sid in stage_ids:
            try:
                for att in _api(base, app + f"/stages/{sid}"):
                    if att.get("status") not in ("COMPLETE", "SKIPPED"):
                        continue
                    n_stages += 1
                    task_time_ms += att.get("executorRunTime", 0)
                    # per-task max from the summary endpoint is heavy; use
                    # stage-level executorRunTime / numCompleteTasks instead
                    nt = max(att.get("numCompleteTasks", 1), 1)
                    max_task_ms = max(
                        max_task_ms, att.get("executorRunTime", 0) / nt
                    )
            except Exception:  # noqa: BLE001
                pass
        row = {
            "name": name,
            "build_sec": round(t1 - t0, 3),
            "exec_sec": round(t2 - t1, 3),
            "total_sec": round(t2 - t0, 3),
            "n_jobs": len(jobs),
            "n_stages": n_stages,
            "n_tasks": n_tasks,
            "task_time_sec": round(task_time_ms / 1000, 3),
            "stage_max_avg_task_sec": round(max_task_ms / 1000, 3),
        }
        rows.append(row)
        print(json.dumps(row), flush=True)

    rows.sort(key=lambda r: -r["total_sec"])
    print(
        json.dumps(
            {
                "summary_total_sec": round(sum(r["total_sec"] for r in rows), 1),
                "summary_build_sec": round(sum(r["build_sec"] for r in rows), 1),
                "summary_task_time_sec": round(
                    sum(r["task_time_sec"] for r in rows), 1
                ),
                "n": len(rows),
            }
        ),
        flush=True,
    )
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
