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
        # Observed metrics (df.observe) ride the SAME progress event — zero
        # extra jobs; the DLQ split publishes its per-batch error counters
        # this way (Connect's task error metrics: total-record-errors,
        # deadletterqueue-produce-requests analogs).
        for obs_name, row in dict(p.observedMetrics or {}).items():
            for field, value in row.asDict().items():
                if isinstance(value, (int, float)):
                    self.samples.append(
                        {
                            "name": f"{obs_name}_{field}",
                            "labels": labels,
                            "ts": p.timestamp,
                            "value": float(value),
                        }
                    )

    def onQueryTerminated(self, event) -> None:  # noqa: N802
        pass

    def onQueryIdle(self, event) -> None:  # noqa: N802
        pass


# -- JMX-exporter-style rename rules -----------------------------------------
#
# The reference pipes Connect's JMX beans through the prometheus
# jmx-exporter with a regex rule file (kafka-connect/kafka-connect.yml:1-106:
# pattern -> name template with $n captures, label templates, valueFactor,
# lowercaseOutputName). Engine analog: each sample renders as the
# jmx-ish source string ``spark.streaming<query=NAME><>metric`` and the
# first matching rule rewrites name/labels/value. Unmatched samples pass
# through unchanged (the exporter's default behavior).


class MetricRenameRule:
    def __init__(
        self,
        pattern: str,
        name: str,
        labels: dict[str, str] | None = None,
        value_factor: float = 1.0,
        help: str | None = None,
        type: str | None = None,
    ) -> None:
        self.pattern = re.compile(pattern)
        self.name = name
        self.labels = labels or {}
        self.value_factor = value_factor
        self.help = help
        self.type = type

    @classmethod
    def from_dict(cls, d: dict) -> "MetricRenameRule":
        """Accepts the jmx-exporter rule-file keys (pattern/name/labels/
        valueFactor/help/type)."""
        return cls(
            d["pattern"],
            d["name"],
            labels=d.get("labels"),
            value_factor=float(d.get("valueFactor", 1.0)),
            help=d.get("help"),
            type=d.get("type", "").lower() or None,
        )


def _expand(template: str, m: re.Match) -> str:
    out = template
    for i in range(m.re.groups, 0, -1):
        out = out.replace(f"${i}", m.group(i) or "")
    return out


def source_string(sample: dict) -> str:
    """Render a sample the way a JMX bean + attribute renders for the
    exporter: ``domain<key=value, ...><>attribute``."""
    labels = sample.get("labels", {})
    inner = ", ".join(f"{k}={v}" for k, v in sorted(labels.items()))
    return f"spark.streaming<{inner}><>{sample['name']}"


def relabel(
    samples: list[dict],
    rules: list[MetricRenameRule],
    lowercase_output_name: bool = True,
) -> list[dict]:
    """Apply the first matching rename rule to each sample (jmx-exporter
    semantics: first match wins, no match passes through)."""
    out = []
    for s in samples:
        src = source_string(s)
        for r in rules:
            m = r.pattern.search(src)
            if m is None:
                continue
            name = _expand(r.name, m)
            if lowercase_output_name:
                name = name.lower()
            renamed = {
                "name": name,
                "labels": {k: _expand(v, m) for k, v in r.labels.items()},
                "value": s["value"] * r.value_factor,
            }
            if "ts" in s:
                renamed["ts"] = s["ts"]
            if r.help:
                renamed["help"] = r.help
            if r.type:
                renamed["type"] = r.type
            out.append(renamed)
            break
        else:
            out.append(s)
    return out


# Default rules mapping Spark progress metrics onto the reference's
# kafka_connect_* metric names (the names its Grafana dashboard queries —
# Source Record Poll/Write rates, batch timing).
CONNECT_RENAME_RULES = [
    MetricRenameRule(
        r"spark\.streaming<query=(.+)><>input_rows_per_second",
        "kafka_connect_source_task_source_record_poll_rate",
        labels={"connector": "$1"},
        type="gauge",
        help="Rate of records polled from the source",
    ),
    MetricRenameRule(
        r"spark\.streaming<query=(.+)><>processed_rows_per_second",
        "kafka_connect_source_task_source_record_write_rate",
        labels={"connector": "$1"},
        type="gauge",
        help="Rate of records written to the sink",
    ),
    MetricRenameRule(
        r"spark\.streaming<query=(.+)><>num_input_rows",
        "kafka_connect_source_task_source_record_poll_total",
        labels={"connector": "$1"},
        type="counter",
        help="Records polled in the batch",
    ),
    MetricRenameRule(
        r"spark\.streaming<query=(.+)><>batch_duration_ms",
        "kafka_connect_connector_task_batch_time_seconds",
        labels={"connector": "$1"},
        value_factor=0.001,
        type="gauge",
        help="Microbatch duration in seconds",
    ),
]


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
            out.append(f"# HELP {name} {s.get('help', HELP.get(name, name))}")
            out.append(f"# TYPE {name} {s.get('type', TYPE.get(name, 'gauge'))}")
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
