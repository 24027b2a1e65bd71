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


def exactly_once_sink_options(
    bootstrap_servers: str,
    transactional_id: str | None = None,
    overrides: dict[str, str] | None = None,
) -> dict[str, str]:
    """The reference declares ``exactly.once.support=requested`` on the
    worker (README.md:285) — Connect satisfies it with an idempotent /
    transactional producer per task. Spark's Kafka sink COMMITS outside
    the producer transaction, so the end-to-end guarantee stays
    at-least-once (documented in SURVEY.md §2.3 T8); this builds the same
    producer-level option surface so a pipeline spec can request it:

    - ``kafka.enable.idempotence=true`` + ``kafka.acks=all`` — no broker-
      side duplicates from producer retries (the idempotent producer);
    - ``kafka.transactional.id`` (when given) — fences zombie producers
      across query restarts, the transactional half of Connect's
      exactly-once source support;
    - in-flight window capped at 5, the idempotence-compatible maximum.

    Downstream consumers should read ``isolation.level=read_committed``
    for the transactional path to matter."""
    opts = kafka_sink_options(bootstrap_servers, overrides)
    opts.setdefault("kafka.enable.idempotence", "true")
    opts.setdefault("kafka.acks", "all")
    opts.setdefault("kafka.max.in.flight.requests.per.connection", "5")
    if transactional_id is not None:
        opts["kafka.transactional.id"] = transactional_id
    return opts


def write_kafka(
    sdf: DataFrame,
    bootstrap_servers: str,
    checkpoint: str,
    exactly_once: bool = False,
    transactional_id: str | None = None,
    **overrides,
):
    """Streaming Kafka sink: requires key/value (+ optional topic) columns,
    exactly the Connect record contract. Default delivery is
    at-least-once, matching the reference's effective guarantee
    (README.md:285); ``exactly_once=True`` requests the idempotent /
    transactional producer options (see ``exactly_once_sink_options``)."""
    if exactly_once:
        opts = exactly_once_sink_options(bootstrap_servers, transactional_id, overrides)
    else:
        opts = kafka_sink_options(bootstrap_servers, overrides)
    w = sdf.writeStream.format("kafka").option("checkpointLocation", checkpoint)
    for k, v in opts.items():
        w = w.option(k, v)
    return w.start()
