"""Observability (S7/§3.3): exposition format roundtrip, listener capture
from a real streaming query, HTTP endpoint."""

from __future__ import annotations

import time
import urllib.request

from kafka_connect_spark.streaming.metrics import (
    MetricsListener,
    MetricsServer,
    parse_exposition,
    to_exposition,
)


def test_exposition_roundtrip():
    samples = [
        {"name": "num_input_rows", "labels": {"query": "q1"}, "value": 100.0},
        {"name": "num_input_rows", "labels": {"query": "q2"}, "value": 50.0},
        {"name": "batch_duration_ms", "labels": {"query": "q1"}, "value": 12.5},
    ]
    text = to_exposition(samples)
    assert "# HELP num_input_rows" in text and "# TYPE num_input_rows counter" in text
    back = parse_exposition(text)
    assert [(s["name"], s["labels"], s["value"]) for s in back] == [
        (s["name"], s["labels"], s["value"]) for s in samples
    ]


def test_listener_captures_progress(spark, tmp_path):
    listener = MetricsListener()
    spark.streams.addListener(listener)
    try:
        df = spark.readStream.format("rate").option("rowsPerSecond", 50).load()
        q = (
            df.writeStream.format("noop")
            .option("checkpointLocation", str(tmp_path / "ckpt"))
            .start()
        )
        deadline = time.time() + 60
        while not listener.samples and time.time() < deadline:
            time.sleep(0.5)
        q.stop()
        q.awaitTermination(30)
    finally:
        spark.streams.removeListener(listener)
    names = {s["name"] for s in listener.samples}
    assert "num_input_rows" in names
    assert all("query" in s["labels"] for s in listener.samples)


def test_metrics_http_endpoint():
    listener = MetricsListener()
    listener.samples.append(
        {"name": "num_input_rows", "labels": {"query": "q"}, "value": 7.0}
    )
    server = MetricsServer(listener)
    server.start()
    try:
        body = urllib.request.urlopen(
            f"http://127.0.0.1:{server.port}/metrics", timeout=10
        ).read().decode()
    finally:
        server.stop()
    assert 'num_input_rows{query="q"} 7.0' in body
