"""CLI: run pipeline specs / start the herder / list the query surface.

    python -m kafka_connect_spark run spec.json          # batch: one poll
    python -m kafka_connect_spark stream spec.json       # streaming drain
    python -m kafka_connect_spark herder CONFIG_DIR      # herder + REST
    python -m kafka_connect_spark queries                # list registry
    python -m kafka_connect_spark query NAME [SF_DIR]    # run one query

The process-level equivalent of the reference's worker + curl workflow:
specs are connector-config-shaped JSON (plans/pipeline.py)."""

from __future__ import annotations

import json
import sys


def main(argv: list[str] | None = None) -> int:
    argv = sys.argv[1:] if argv is None else argv
    if not argv:
        print(__doc__)
        return 2
    cmd, *rest = argv

    if cmd == "queries":
        from kafka_connect_spark.queries import ORACLE, QUERIES

        for name in sorted(QUERIES):
            kind = "oracle" if name in ORACLE else "rows-only"
            print(f"{name}\t{kind}")
        return 0

    from kafka_connect_spark.session import get_spark

    spark = get_spark("kafka-connect-spark-cli")

    if cmd in ("run", "stream"):
        from kafka_connect_spark.plans import Pipeline

        with open(rest[0]) as fh:
            spec = json.load(fh)
        if (spec.get("source") or {}).get("tables"):
            # multi-table whitelist spec (tasks.max shape): expand per
            # table with independent offsets, like Herder.run_once
            from kafka_connect_spark.plans.herder import (
                expand_table_spec,
                task_configs,
            )

            total = 0
            for tc in task_configs(spec):
                for table in tc["tables"]:
                    total += Pipeline(expand_table_spec(spec, table)).run(spark)
            print(json.dumps({"name": spec.get("name", "pipeline"), "rows": total}))
            return 0
        p = Pipeline(spec)
        if cmd == "stream" or p.streaming:
            q = p.start_stream(spark)
            q.awaitTermination()
            print(json.dumps({"name": p.name, "state": "DRAINED"}))
        else:
            n = p.run(spark)
            print(json.dumps({"name": p.name, "rows": n}))
        return 0

    if cmd == "herder":
        from kafka_connect_spark.plans import Herder, serve_http

        herder = Herder(spark, rest[0])
        httpd = serve_http(herder, port=int(rest[1]) if len(rest) > 1 else 0)
        print(json.dumps({"rest_port": httpd.server_address[1]}), flush=True)
        try:
            import threading

            threading.Event().wait()
        except KeyboardInterrupt:
            herder.shutdown()
            httpd.shutdown()
        return 0

    if cmd == "query":
        from kafka_connect_spark.catalog import DEFAULT_SF_DIR
        from kafka_connect_spark.queries import QUERIES

        name = rest[0]
        sf_dir = rest[1] if len(rest) > 1 else DEFAULT_SF_DIR
        df = QUERIES[name](spark, sf_dir)
        df.show(20, truncate=False)
        print(json.dumps({"name": name, "rows": df.count()}))
        return 0

    print(f"unknown command: {cmd}", file=sys.stderr)
    return 2


if __name__ == "__main__":
    raise SystemExit(main())
