"""S7/§3.3 — observability: query-progress metrics in Prometheus text
exposition format.

The reference's task 2 is a FastAPI service rendering gauges/counters as
``# HELP / # TYPE / name{labels} value`` lines scraped by Prometheus
(fastapi/main.py:18-63; prometheus/prometheus.yml:34-37). Engine analog:

- ``MetricsListener``   StreamingQueryListener capturing per-batch progress
                        (inputRowsPerSecond / processedRowsPerSecond /
                        numInputRows / batch duration — direct analogs of
                        the dashboard's Source Record Poll/Write rates)
- ``to_exposition``     samples -> exposition text
- ``parse_exposition``  exposition text -> rows (the ingest direction, via
                        regexp extraction — usable as a Spark DataFrame
                        transform for scraped payloads)
- ``MetricsServer``     threaded HTTP /metrics endpoint
"""

from __future__ import annotations

import http.server
import re
import threading

from pyspark.sql.streaming import StreamingQueryListener

HELP = {
    "input_rows_per_second": "Rate of rows arriving from sources",
    "processed_rows_per_second": "Rate of rows processed by the query",
    "num_input_rows": "Rows ingested in the batch",
    "batch_duration_ms": "Microbatch wall-clock duration",
}

TYPE = {
    "input_rows_per_second": "gauge",
    "processed_rows_per_second": "gauge",
    "num_input_rows": "counter",
    "batch_duration_ms": "gauge",
}


class MetricsListener(StreamingQueryListener):
    """Collects metric samples from query progress events."""

    def __init__(self) -> None:
        self.samples: list[dict] = []

    def onQueryStarted(self, event) -> None:  # noqa: N802
        pass

    def onQueryProgress(self, event) -> None:  # noqa: N802
        p = event.progress
        labels = {"query": p.name or str(p.id)}
        for name, value in [
            ("input_rows_per_second", p.inputRowsPerSecond),
            ("processed_rows_per_second", p.processedRowsPerSecond),
            ("num_input_rows", p.numInputRows),
            ("batch_duration_ms", (p.durationMs or {}).get("triggerExecution")),
        ]:
            if value is not None:
                self.samples.append(
                    {"name": name, "labels": labels, "ts": p.timestamp, "value": float(value)}
                )

    def onQueryTerminated(self, event) -> None:  # noqa: N802
        pass

    def onQueryIdle(self, event) -> None:  # noqa: N802
        pass


def _fmt_labels(labels: dict[str, str]) -> str:
    if not labels:
        return ""
    inner = ",".join(f'{k}="{v}"' for k, v in sorted(labels.items()))
    return "{" + inner + "}"


def to_exposition(samples: list[dict]) -> str:
    """Render samples in Prometheus text exposition format (the format the
    reference's FastAPI template produces, fastapi/main.py:18-63)."""
    out: list[str] = []
    seen: set[str] = set()
    for s in samples:
        name = s["name"]
        if name not in seen:
            seen.add(name)
            out.append(f"# HELP {name} {HELP.get(name, name)}")
            out.append(f"# TYPE {name} {TYPE.get(name, 'gauge')}")
        out.append(f"{name}{_fmt_labels(s.get('labels', {}))} {s['value']}")
    return "\n".join(out) + "\n"


_LINE = re.compile(
    r"^(?P<name>[a-zA-Z_:][a-zA-Z0-9_:]*)(?:\{(?P<labels>[^}]*)\})?\s+(?P<value>[-+0-9.eENaninf]+)\s*$"
)
_LABEL = re.compile(r'(\w+)="([^"]*)"')


def parse_exposition(text: str) -> list[dict]:
    """Parse exposition text back to samples (ingest path S7)."""
    rows = []
    for line in text.splitlines():
        line = line.strip()
        if not line or line.startswith("#"):
            continue
        m = _LINE.match(line)
        if not m:
            continue
        labels = dict(_LABEL.findall(m.group("labels") or ""))
        rows.append(
            {"name": m.group("name"), "labels": labels, "value": float(m.group("value"))}
        )
    return rows


def exposition_to_df(spark, text: str):
    """Ingest path as a Spark plan: exposition text -> typed rows via
    regexp extraction (SURVEY.md §2.1 S7 'parse exposition format with
    regexp_extract'). Labels kept as a raw string column; per-label access
    via ``str_to_map`` downstream."""
    from pyspark.sql import functions as F

    lines = spark.createDataFrame(
        [(line,) for line in text.splitlines()], ["line"]
    ).filter(~F.col("line").startswith("#") & (F.trim("line") != ""))
    pat = r"^([a-zA-Z_:][a-zA-Z0-9_:]*)(?:\{([^}]*)\})?\s+([-+0-9.eE]+)\s*$"
    return lines.select(
        F.regexp_extract("line", pat, 1).alias("name"),
        F.regexp_extract("line", pat, 2).alias("labels"),
        F.regexp_extract("line", pat, 3).cast("double").alias("value"),
    ).filter(F.col("name") != "")


class MetricsServer:
    """Minimal threaded /metrics endpoint over a MetricsListener."""

    def __init__(self, listener: MetricsListener, host: str = "127.0.0.1", port: int = 0):
        listener_ref = listener

        class Handler(http.server.BaseHTTPRequestHandler):
            def do_GET(self):  # noqa: N802
                if self.path != "/metrics":
                    self.send_response(404)
                    self.end_headers()
                    return
                body = to_exposition(listener_ref.samples).encode()
                self.send_response(200)
                self.send_header("Content-Type", "text/plain; version=0.0.4")
                self.send_header("Content-Length", str(len(body)))
                self.end_headers()
                self.wfile.write(body)

            def log_message(self, *args):
                pass

        self._httpd = http.server.ThreadingHTTPServer((host, port), Handler)
        self.port = self._httpd.server_address[1]
        self._thread = threading.Thread(target=self._httpd.serve_forever, daemon=True)

    def start(self) -> None:
        self._thread.start()

    def stop(self) -> None:
        self._httpd.shutdown()
