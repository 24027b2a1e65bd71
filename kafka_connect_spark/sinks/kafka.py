"""K3 — Kafka producer sink with the reference's tuned passthrough options.

The reference's iterations 2-5 tune batch.size / linger.ms /
compression.type / buffer.memory (README.md:165-194, 218-221). On Spark's
Kafka sink these are plain passthrough options with the ``kafka.`` prefix.
No Kafka broker exists in this container, so the module builds and
validates the option map (unit-tested) and exposes the writer wiring; the
records themselves are produced by transforms.to_json_envelope +
transforms.with_topic."""

from __future__ import annotations

from pyspark.sql import DataFrame

TUNED_DEFAULTS = {
    # iteration-5 config of the reference's tuning experiment (README.md:194)
    "kafka.batch.size": "52800",        # batch.max.rows x avg record size (100 x 528 B)
    "kafka.linger.ms": "10",
    "kafka.compression.type": "snappy",
    "kafka.buffer.memory": str(128 * 1024 * 1024),
}


def kafka_sink_options(
    bootstrap_servers: str, overrides: dict[str, str] | None = None
) -> dict[str, str]:
    opts = {"kafka.bootstrap.servers": bootstrap_servers, **TUNED_DEFAULTS}
    for k, v in (overrides or {}).items():
        if not k.startswith("kafka.") and k != "topic":
            k = f"kafka.{k}"  # accept raw producer names (producer.override.*)
        opts[k] = str(v)
    return opts


def write_kafka(sdf: DataFrame, bootstrap_servers: str, checkpoint: str, **overrides):
    """Streaming Kafka sink: requires key/value (+ optional topic) columns,
    exactly the Connect record contract. At-least-once (Kafka sink is not
    transactional in Spark) — matching the reference (README.md:285)."""
    w = sdf.writeStream.format("kafka").option("checkpointLocation", checkpoint)
    for k, v in kafka_sink_options(bootstrap_servers, overrides).items():
        w = w.option(k, v)
    return w.start()
