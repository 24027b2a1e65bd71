"""HTTP Schema Registry client + stub server (Confluent REST shapes).

The reference wires converters to a Schema Registry *service* by URL
(reference docker-compose.yaml:63-75: ``schema-registry`` container +
``value.converter.schema.registry.url``). This module closes that delta:

- ``RestSchemaRegistry`` — a thin client speaking the public Confluent
  subjects/versions/ids REST API, drop-in compatible with
  ``FileSchemaRegistry`` (same ``register`` / ``by_id`` / ``latest``
  surface, so ``to_avro_envelope``/``from_avro_envelope`` accept either).
  The client holds only the URL string, so it pickles to executors; each
  call opens a short-lived connection (registry round-trips happen once
  per envelope CALL, not per row — the schema id is resolved on the
  driver and closed over by the codec UDF).
- ``serve_schema_registry`` — a stdlib stub server exposing the same REST
  shapes over any backing registry (tests back it with a
  ``FileSchemaRegistry``), mirroring how ``plans/herder.serve_http``
  stands up the Connect REST facade.

REST shapes implemented (the public Confluent API subset converters use):
- ``POST /subjects/{subject}/versions``  body ``{"schema": "<json str>"}``
  -> ``{"id": N}`` (idempotent for an already-registered schema)
- ``GET /schemas/ids/{id}``              -> ``{"schema": "<json str>"}``
- ``GET /subjects/{subject}/versions/latest``
  -> ``{"subject": s, "version": V, "id": N, "schema": "<json str>"}``
Errors use Confluent's envelope: ``{"error_code": 404xx, "message": ...}``.
"""

from __future__ import annotations

import json
import re
import threading
import urllib.error
import urllib.request

_CONTENT_TYPE = "application/vnd.schemaregistry.v1+json"


class RestSchemaRegistry:
    """Schema Registry client over HTTP — same interface as
    ``FileSchemaRegistry`` (transforms/avro.py), so the Avro envelope
    converters take either backend unchanged."""

    def __init__(self, url: str, timeout: float = 10.0) -> None:
        self.url = url.rstrip("/")
        self.timeout = timeout

    def _request(self, path: str, payload: dict | None = None) -> dict:
        req = urllib.request.Request(
            f"{self.url}{path}",
            data=json.dumps(payload).encode() if payload is not None else None,
            headers={"Content-Type": _CONTENT_TYPE},
            method="POST" if payload is not None else "GET",
        )
        try:
            with urllib.request.urlopen(req, timeout=self.timeout) as resp:
                return json.load(resp)
        except urllib.error.HTTPError as ex:
            try:
                err = json.load(ex)
            except Exception:  # noqa: BLE001
                err = {"error_code": ex.code, "message": str(ex)}
            if ex.code == 404:
                raise KeyError(err.get("message", path)) from None
            raise RuntimeError(
                f"schema registry error {err.get('error_code')}: {err.get('message')}"
            ) from None

    def register(self, subject: str, schema: dict) -> int:
        out = self._request(
            f"/subjects/{subject}/versions", {"schema": json.dumps(schema)}
        )
        return out["id"]

    def by_id(self, sid: int) -> dict:
        return json.loads(self._request(f"/schemas/ids/{sid}")["schema"])

    def latest(self, subject: str) -> tuple[int, dict]:
        out = self._request(f"/subjects/{subject}/versions/latest")
        return out["id"], json.loads(out["schema"])


def serve_schema_registry(backing, host: str = "127.0.0.1", port: int = 0):
    """Serve any registry object (``register``/``by_id``/``latest``) over
    the Confluent REST shapes. Returns the started ``ThreadingHTTPServer``;
    the bound URL is ``f"http://{host}:{server.server_address[1]}"``."""
    import http.server

    post_subject = re.compile(r"^/subjects/([^/]+)/versions$")
    get_by_id = re.compile(r"^/schemas/ids/(\d+)$")
    get_latest = re.compile(r"^/subjects/([^/]+)/versions/latest$")

    class Handler(http.server.BaseHTTPRequestHandler):
        def _send(self, code: int, body: dict) -> None:
            data = json.dumps(body).encode()
            self.send_response(code)
            self.send_header("Content-Type", _CONTENT_TYPE)
            self.send_header("Content-Length", str(len(data)))
            self.end_headers()
            self.wfile.write(data)

        def do_GET(self) -> None:  # noqa: N802
            m = get_by_id.match(self.path)
            if m:
                try:
                    schema = backing.by_id(int(m.group(1)))
                except (KeyError, FileNotFoundError):
                    return self._send(
                        404, {"error_code": 40403, "message": "Schema not found"}
                    )
                return self._send(200, {"schema": json.dumps(schema)})
            m = get_latest.match(self.path)
            if m:
                try:
                    sid, schema = backing.latest(m.group(1))
                except KeyError:
                    return self._send(
                        404, {"error_code": 40401, "message": "Subject not found"}
                    )
                version = next(
                    (
                        e["version"]
                        for e in getattr(backing, "_entries", list)()
                        if e.get("id") == sid
                    ),
                    1,
                )
                return self._send(
                    200,
                    {
                        "subject": m.group(1),
                        "version": version,
                        "id": sid,
                        "schema": json.dumps(schema),
                    },
                )
            self._send(404, {"error_code": 40401, "message": "Not found"})

        def do_POST(self) -> None:  # noqa: N802
            m = post_subject.match(self.path)
            if not m:
                return self._send(404, {"error_code": 40401, "message": "Not found"})
            length = int(self.headers.get("Content-Length", 0))
            try:
                payload = json.loads(self.rfile.read(length))
                schema = json.loads(payload["schema"])
            except Exception:  # noqa: BLE001
                return self._send(
                    422, {"error_code": 42201, "message": "Invalid schema"}
                )
            self._send(200, {"id": backing.register(m.group(1), schema)})

        def log_message(self, *args) -> None:  # quiet test output
            pass

    httpd = http.server.ThreadingHTTPServer((host, port), Handler)
    thread = threading.Thread(target=httpd.serve_forever, daemon=True)
    thread.start()
    return httpd
