"""The herder: named-pipeline lifecycle management — the engine's analog of
Kafka Connect's REST surface (worker on :8083, reference
docker-compose.yaml:110,121; connector CRUD + status in README.md:73-131).

Connect's DistributedHerder validates configs, persists them to
connect-config-storage, and reconciles running tasks on config change
(rebalance log, README.md:270-275). Here:

- configs persist as JSON files in ``config_dir`` (the config-storage
  analog — swap for a shared store on a real cluster);
- PUT of an existing name stops the old query and starts the new config
  (the restart-on-reconfigure behavior);
- status reports RUNNING / STOPPED / FAILED(+cause) per pipeline, like
  GET /connectors/<name>/status (README.md:115-131);
- an optional HTTP facade mirrors the REST shape for observability
  (read-only; mutation stays in-process).
"""

from __future__ import annotations

import json
import os
import threading

from pyspark.sql import SparkSession

from .pipeline import SINKS, SOURCES, STREAM_SINKS, STREAM_SOURCES, TRANSFORMS, Pipeline


def plugin_list() -> list[dict]:
    """GET /connector-plugins analog (reference README.md:29-67 lists the
    worker's installed connector classes): every registered source, sink,
    and transform type with its role."""
    out = []
    for role, reg in (
        ("source", SOURCES),
        ("source", STREAM_SOURCES),
        ("sink", SINKS),
        ("sink", STREAM_SINKS),
        ("transformation", TRANSFORMS),
    ):
        for name in reg:
            out.append({"class": name, "type": role})
    return sorted(out, key=lambda d: (d["type"], d["class"]))


def _try_compile(field_prefix: str, fn, section: dict, errors: dict) -> None:
    """Dry-run one spec section, folding failures into per-field errors: a
    KeyError names the exact missing option (Connect's per-field validation
    shape); anything else lands on the section itself. Compile functions
    read their options LAZILY (inside the returned closure), so after
    compiling, the closure is invoked once with a mock Spark/DataFrame —
    dict accesses on the real section still raise KeyError for missing
    options, while the mock absorbs every Spark call without doing I/O."""
    from unittest.mock import MagicMock

    try:
        compiled = fn(section)
    except KeyError as ke:
        key = ke.args[0] if ke.args else str(ke)
        errors.setdefault(f"{field_prefix}.{key}", []).append(
            f'Missing required configuration "{key}"'
        )
        return
    except Exception as ex:  # noqa: BLE001 - config errors, not bugs
        errors.setdefault(field_prefix, []).append(str(ex))
        return
    if not callable(compiled):
        return
    try:
        compiled(MagicMock())
    except KeyError as ke:
        key = ke.args[0] if ke.args else str(ke)
        errors.setdefault(f"{field_prefix}.{key}", []).append(
            f'Missing required configuration "{key}"'
        )
    except Exception:  # noqa: BLE001, S110 - mock-execution artifacts only
        pass


def validate_config(plugin_type: str, spec: dict) -> dict:
    """PUT /connector-plugins/<type>/config/validate analog: dry-run the
    pipeline spec against the registries WITHOUT starting anything and
    report Connect's validation result shape — ``error_count`` plus one
    ``configs`` entry per offending field, each with its ``errors`` list
    (the worker API the reference README drives at README.md:16-23).
    Like Connect, a spec that fails validation still returns HTTP 200
    with error_count > 0; only an unknown plugin type is a 404."""
    streaming = bool(spec.get("streaming", False))
    src_reg = STREAM_SOURCES if streaming else SOURCES
    sink_reg = STREAM_SINKS if streaming else SINKS
    errors: dict[str, list[str]] = {}

    source = dict(spec.get("source") or {})
    source.setdefault("type", plugin_type)
    if source["type"] not in src_reg:
        errors.setdefault("source.type", []).append(
            f"Unknown source type {source['type']!r}"
            + (" (streaming)" if streaming else "")
        )
    else:
        _try_compile("source", src_reg[source["type"]], source, errors)

    for i, t in enumerate(spec.get("transforms", [])):
        ttype = t.get("type")
        if ttype not in TRANSFORMS:
            errors.setdefault(f"transforms.{i}.type", []).append(
                f"Unknown transform type {ttype!r}"
            )
        else:
            _try_compile(f"transforms.{i}", TRANSFORMS[ttype], t, errors)

    sink = spec.get("sink")
    if not sink or "type" not in sink:
        errors.setdefault("sink.type", []).append('Missing required configuration "type"')
    elif sink["type"] not in sink_reg:
        errors.setdefault("sink.type", []).append(f"Unknown sink type {sink['type']!r}")
    else:
        _try_compile("sink", sink_reg[sink["type"]], sink, errors)

    configs = [
        {
            "definition": {"name": field, "type": "STRING", "required": True},
            "value": {
                "name": field,
                "value": None,
                "recommended_values": [],
                "errors": errs,
                "visible": True,
            },
        }
        for field, errs in sorted(errors.items())
    ]
    return {
        "name": plugin_type,
        "error_count": sum(len(e) for e in errors.values()),
        "groups": ["Common"],
        "configs": configs,
    }


def task_configs(spec: dict) -> list[dict]:
    """Connect's ``Connector.taskConfigs(maxTasks)`` analog: split a
    multi-table source across tasks. The reference JDBC source connector
    takes a table whitelist plus ``tasks.max`` (README.md:92 shows
    ``tasks.max=1``; the Connect herder round-robins the whitelist across
    ``min(len(tables), tasks.max)`` tasks, each polling its subset with
    independent per-table offsets). Here: a source spec carrying
    ``tables: [...]`` and ``tasks.max: N`` yields one task config per
    group; a single-table spec yields the one task the r1-r5 herder always
    modeled. Partitioning WITHIN a table stays Spark's job (the scan is
    partition-parallel regardless) — tasks multiply only across tables."""
    source = dict(spec.get("source") or {})
    tables = source.get("tables")
    if not tables:
        return [dict(source, **{"task.class": "pipeline"})]
    tasks_max = int(source.get("tasks.max", 1))
    n = max(1, min(len(tables), tasks_max))
    groups = [list(tables[i::n]) for i in range(n)]
    return [
        dict(source, tables=g, **{"task.class": "pipeline"}) for g in groups
    ]


def expand_table_spec(spec: dict, table: str) -> dict:
    """Expand a multi-table pipeline spec into the single-table spec one
    task runs for one of its tables: ``{table}`` placeholders in the source
    and sink paths resolve to the table name (Connect's topic-per-table
    routing analog), ``jdbc_incremental`` gets its ``table`` option set,
    and ``state.dir`` gains a per-table subdirectory so every table's
    offset advances independently — the Connect JDBC source keeps one
    source-offset map entry per table for exactly this reason."""
    sub = json.loads(json.dumps(spec))  # deep copy; specs are plain JSON
    src = sub["source"]
    src.pop("tables", None)
    src.pop("tasks.max", None)
    for key in ("path", "connection.url"):
        if isinstance(src.get(key), str):
            src[key] = src[key].replace("{table}", table)
    if src.get("type") == "jdbc_incremental":
        src["table"] = table
    if isinstance(src.get("state.dir"), str):
        src["state.dir"] = os.path.join(src["state.dir"], table)
    sink = sub.get("sink") or {}
    if isinstance(sink.get("path"), str):
        sink["path"] = sink["path"].replace("{table}", table)
    sub["name"] = f"{sub.get('name', 'pipeline')}-{table}"
    return sub


class Herder:
    def __init__(self, spark: SparkSession, config_dir: str) -> None:
        self.spark = spark
        self.config_dir = config_dir
        os.makedirs(config_dir, exist_ok=True)
        self._queries: dict[str, object] = {}
        self._failed: dict[str, str] = {}
        self._lock = threading.Lock()

    # -- config storage ------------------------------------------------------

    def _config_path(self, name: str) -> str:
        return os.path.join(self.config_dir, f"{name}.json")

    def list(self) -> list[str]:
        return sorted(
            f[: -len(".json")] for f in os.listdir(self.config_dir) if f.endswith(".json")
        )

    def get_config(self, name: str) -> dict:
        with open(self._config_path(name)) as fh:
            return json.load(fh)

    # -- lifecycle -----------------------------------------------------------

    def put(self, name: str, spec: dict) -> dict:
        """Create or update a pipeline config; (re)start streaming specs.
        Batch specs are stored and executed via ``run_once``."""
        spec = dict(spec, name=name)
        # validate before persisting (fail-fast like Connect); a
        # multi-table spec validates via its first per-table expansion —
        # the template spec itself isn't runnable until a table binds
        tables = (spec.get("source") or {}).get("tables")
        if tables:
            if spec.get("streaming"):
                raise ValueError(
                    "tables/tasks.max applies to polled (batch) sources; "
                    "streaming specs parallelize within the query"
                )
            Pipeline(expand_table_spec(spec, tables[0]))
        else:
            Pipeline(spec)
        with self._lock:
            self._stop_locked(name)
            tmp = self._config_path(name) + ".tmp"
            with open(tmp, "w") as fh:
                json.dump(spec, fh, indent=2)
            os.replace(tmp, self._config_path(name))
            # a PAUSED target state persists across reconfigure, like
            # Connect's target-state records
            if spec.get("streaming") and not self.is_paused(name):
                try:
                    self._queries[name] = Pipeline(spec).start_stream(
                        self.spark, available_now=False
                    )
                    self._failed.pop(name, None)
                except Exception as ex:  # noqa: BLE001
                    self._failed[name] = str(ex)
        return self.status(name)

    def run_once(self, name: str) -> int:
        """Execute a batch pipeline (one poll for incremental sources).
        A multi-table spec runs one poll per table across all its tasks —
        every table's offset commits independently (per-table state dir,
        see ``expand_table_spec``), so a failure mid-way re-polls only the
        tables that hadn't committed, exactly Connect's per-table
        source-offset contract."""
        spec = self.get_config(name)
        if not (spec.get("source") or {}).get("tables"):
            return Pipeline(spec).run(self.spark)
        total = 0
        for tc in task_configs(spec):
            for table in tc["tables"]:
                total += Pipeline(expand_table_spec(spec, table)).run(self.spark)
        return total

    def _stop_locked(self, name: str) -> bool:
        """Internal: caller holds self._lock."""
        q = self._queries.pop(name, None)
        if q is not None:
            q.stop()
            return True
        return False

    def stop(self, name: str) -> bool:
        with self._lock:
            return self._stop_locked(name)

    # -- target state (PUT /connectors/<name>/pause|/resume, reference
    #    Connect worker API; target state survives a herder restart via a
    #    side file, like Connect's persisted target-state records) ---------

    def _state_path(self, name: str) -> str:
        return os.path.join(self.config_dir, f"{name}.state")

    def is_paused(self, name: str) -> bool:
        return os.path.exists(self._state_path(name))

    def pause(self, name: str) -> dict:
        """Stop the running query but KEEP the config; status -> PAUSED."""
        if name not in self.list():
            return {"name": name, "state": "NOT_FOUND"}
        with self._lock:
            self._stop_locked(name)
            with open(self._state_path(name), "w") as fh:
                fh.write("PAUSED")
        return self.status(name)

    def resume(self, name: str) -> dict:
        """Clear the paused target state and restart a streaming spec."""
        if name not in self.list():
            return {"name": name, "state": "NOT_FOUND"}
        with self._lock:
            if os.path.exists(self._state_path(name)):
                os.remove(self._state_path(name))
            spec = self.get_config(name)
            if spec.get("streaming") and name not in self._queries:
                try:
                    self._queries[name] = Pipeline(spec).start_stream(
                        self.spark, available_now=False
                    )
                    self._failed.pop(name, None)
                except Exception as ex:  # noqa: BLE001
                    self._failed[name] = str(ex)
        return self.status(name)

    def restart(self, name: str) -> dict:
        """POST /connectors/<name>/restart: bounce the query in place."""
        if name not in self.list():
            return {"name": name, "state": "NOT_FOUND"}
        with self._lock:
            self._stop_locked(name)
            spec = self.get_config(name)
            if spec.get("streaming") and not self.is_paused(name):
                try:
                    self._queries[name] = Pipeline(spec).start_stream(
                        self.spark, available_now=False
                    )
                    self._failed.pop(name, None)
                except Exception as ex:  # noqa: BLE001
                    self._failed[name] = str(ex)
        return self.status(name)

    def delete(self, name: str) -> None:
        with self._lock:
            self._stop_locked(name)
            self._failed.pop(name, None)
            for path in (self._config_path(name), self._state_path(name)):
                if os.path.exists(path):
                    os.remove(path)

    def status(self, name: str) -> dict:
        """Mirrors GET /connectors/<name>/status (reference README.md:115-131).
        Runs from HTTP handler threads concurrently with put()/delete(), so
        all reads/mutations of shared state happen under the lock."""
        if name not in self.list():
            return {"name": name, "state": "NOT_FOUND"}
        with self._lock:
            q = self._queries.get(name)
            if self.is_paused(name) and q is None:
                state = "PAUSED"
            elif q is not None:
                if q.isActive:
                    state = "RUNNING"
                elif q.exception() is not None:
                    state, self._failed[name] = "FAILED", str(q.exception())
                else:
                    state = "STOPPED"
            elif name in self._failed:
                state = "FAILED"
            else:
                spec = self.get_config(name)
                state = "STOPPED" if spec.get("streaming") else "BATCH"
            out = {"name": name, "state": state}
            if name in self._failed:
                out["trace"] = self._failed[name]
        return out

    def tasks(self, name: str) -> list[dict] | None:
        """GET /connectors/<name>/tasks analog (reference README.md:115-131
        shows the task array inside the status payload; tasks.max in the
        walkthrough README.md:92): one task per ``task_configs`` group — a
        single-table pipeline keeps the one task the Connect walkthrough
        shows, a ``tables``+``tasks.max`` spec fans out like the Connect
        JDBC connector's whitelist split. Within a table, a Spark query
        parallelizes via partitions instead of multiplying tasks."""
        if name not in self.list():
            return None
        spec = self.get_config(name)
        return [
            {"id": {"connector": name, "task": i}, "config": tc}
            for i, tc in enumerate(task_configs(spec))
        ]

    def task_status(self, name: str, task_id: int) -> dict:
        """GET /connectors/<name>/tasks/<id>/status analog: the single
        task's state tracks the query state."""
        tasks = self.tasks(name)
        if tasks is None or task_id >= len(tasks):
            return {"error": "not found"}
        state = self.status(name)["state"]
        if state == "BATCH":
            state = "UNASSIGNED"  # batch specs have no long-running task
        return {"id": task_id, "state": state, "worker_id": "local"}

    def shutdown(self) -> None:
        with self._lock:
            for name in list(self._queries):
                self._stop_locked(name)


def serve_http(herder: Herder, host: str = "127.0.0.1", port: int = 0):
    """REST facade mirroring the Connect worker API the reference drives
    with curl (README.md:73-76,115-131):

    - GET    /connectors                     list names
    - GET    /connectors/<name>              stored config
    - GET    /connectors/<name>/status       RUNNING/PAUSED/STOPPED/FAILED(+trace)
    - GET    /connectors/<name>/tasks        task list (single-task pipelines)
    - GET    /connectors/<name>/tasks/<id>/status  per-task state
    - GET    /connector-plugins              registered source/sink/transform types
    - PUT    /connector-plugins/<type>/config/validate  dry-run validation,
             Connect's error_count + per-field errors shape (200 even when
             invalid, like the reference worker; unknown type -> 404)
    - PUT    /connectors/<name>/config       create/update (restarts query)
    - PUT    /connectors/<name>/pause        stop query, keep config (PAUSED)
    - PUT    /connectors/<name>/resume       clear pause, restart streaming spec
    - POST   /connectors/<name>/restart      bounce the query in place
    - DELETE /connectors/<name>              stop + remove config

    Mutations delegate to the herder, whose lock serializes them against
    concurrent status() calls from other handler threads."""
    import http.server

    class Handler(http.server.BaseHTTPRequestHandler):
        def _json(self, obj, code=200):
            body = json.dumps(obj).encode()
            self.send_response(code)
            self.send_header("Content-Type", "application/json")
            self.send_header("Content-Length", str(len(body)))
            self.end_headers()
            self.wfile.write(body)

        def _body(self):
            n = int(self.headers.get("Content-Length", 0))
            return json.loads(self.rfile.read(n) or b"{}")

        def do_GET(self):  # noqa: N802
            parts = [p for p in self.path.split("/") if p]
            if parts == ["connectors"]:
                self._json(herder.list())
            elif len(parts) == 2 and parts[0] == "connectors":
                name = parts[1]
                if name in herder.list():
                    self._json(herder.get_config(name))
                else:
                    self._json({"error": "not found"}, 404)
            elif len(parts) == 3 and parts[:1] == ["connectors"] and parts[2] == "status":
                self._json(herder.status(parts[1]))
            elif len(parts) == 3 and parts[0] == "connectors" and parts[2] == "tasks":
                tasks = herder.tasks(parts[1])
                if tasks is None:
                    self._json({"error": "not found"}, 404)
                else:
                    self._json(tasks)
            elif (
                len(parts) == 5
                and parts[0] == "connectors"
                and parts[2] == "tasks"
                and parts[4] == "status"
            ):
                out = herder.task_status(parts[1], int(parts[3]))
                self._json(out, 404 if "error" in out else 200)
            elif parts == ["connector-plugins"]:
                self._json(plugin_list())
            else:
                self._json({"error": "not found"}, 404)

        def do_PUT(self):  # noqa: N802
            parts = [p for p in self.path.split("/") if p]
            if len(parts) == 3 and parts[0] == "connectors" and parts[2] == "config":
                try:
                    self._json(herder.put(parts[1], self._body()))
                except Exception as ex:  # noqa: BLE001 — config errors -> 400, like Connect
                    self._json({"error": str(ex)}, 400)
            elif len(parts) == 3 and parts[0] == "connectors" and parts[2] == "pause":
                self._json(herder.pause(parts[1]))
            elif len(parts) == 3 and parts[0] == "connectors" and parts[2] == "resume":
                self._json(herder.resume(parts[1]))
            elif (
                len(parts) == 4
                and parts[0] == "connector-plugins"
                and parts[2:] == ["config", "validate"]
            ):
                spec = self._body()
                known = (
                    parts[1] in SOURCES
                    or parts[1] in STREAM_SOURCES
                    or (spec.get("source") or {}).get("type") is not None
                )
                if not known:
                    self._json({"error": f"unknown plugin {parts[1]!r}"}, 404)
                else:
                    self._json(validate_config(parts[1], spec))
            else:
                self._json({"error": "not found"}, 404)

        def do_POST(self):  # noqa: N802
            parts = [p for p in self.path.split("/") if p]
            if len(parts) == 3 and parts[0] == "connectors" and parts[2] == "restart":
                self._json(herder.restart(parts[1]))
            else:
                self._json({"error": "not found"}, 404)

        def do_DELETE(self):  # noqa: N802
            parts = [p for p in self.path.split("/") if p]
            if len(parts) == 2 and parts[0] == "connectors":
                if parts[1] not in herder.list():
                    self._json({"error": "not found"}, 404)
                    return
                herder.delete(parts[1])
                self._json({"deleted": parts[1]})
            else:
                self._json({"error": "not found"}, 404)

        def log_message(self, *args):
            pass

    httpd = http.server.ThreadingHTTPServer((host, port), Handler)
    thread = threading.Thread(target=httpd.serve_forever, daemon=True)
    thread.start()
    return httpd
