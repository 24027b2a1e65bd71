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

from .pipeline import Pipeline


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
        Pipeline(spec)  # validate before persisting (fail-fast like Connect)
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
        """Execute a batch pipeline (one poll for incremental sources)."""
        return Pipeline(self.get_config(name)).run(self.spark)

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
