"""S4/S6 — Kafka source wiring and MirrorMaker-style passthrough.

No broker runs in this container, so the live path is exercised only as
option-map construction + the record-schema contract; the passthrough and
CDC-consume transforms operate on any DataFrame with the Kafka source
schema (key/value/topic/partition/offset/timestamp/headers — FIXTURES.md
§kafka_record), which tests synthesize.

- ``kafka_source_options``  subscribe / subscribePattern config
  (reference postgres/connector.json:15-19 auto-created CDC topics =>
  ``subscribePattern='customers\\..*'``)
- ``mirror``                MirrorSourceConnector analog (reference
  README.md:52-65): preserve key/value/headers, rewrite topic with the
  source-cluster alias prefix (MirrorMaker2's ``alias.topic`` naming)
- ``read_cdc_stream``       Kafka bytes -> typed Debezium envelope
  (chain transforms.extract_new_record_state after this)
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

KAFKA_RECORD_SCHEMA = T.StructType(
    [
        T.StructField("key", T.BinaryType()),
        T.StructField("value", T.BinaryType()),
        T.StructField("topic", T.StringType()),
        T.StructField("partition", T.IntegerType()),
        T.StructField("offset", T.LongType()),
        T.StructField("timestamp", T.TimestampType()),
        T.StructField(
            "headers",
            T.ArrayType(
                T.StructType(
                    [
                        T.StructField("key", T.StringType()),
                        T.StructField("value", T.BinaryType()),
                    ]
                )
            ),
        ),
    ]
)


def kafka_source_options(
    bootstrap_servers: str,
    subscribe: str | None = None,
    subscribe_pattern: str | None = None,
    starting_offsets: str = "earliest",
    max_offsets_per_trigger: int | None = None,
) -> dict[str, str]:
    """Kafka source options; ``max_offsets_per_trigger`` is the engine's
    batch.max.rows analog (poll-rate limiting, reference README.md:100-101)."""
    if (subscribe is None) == (subscribe_pattern is None):
        raise ValueError("exactly one of subscribe / subscribe_pattern required")
    opts = {
        "kafka.bootstrap.servers": bootstrap_servers,
        "startingOffsets": starting_offsets,
        "includeHeaders": "true",
    }
    if subscribe:
        opts["subscribe"] = subscribe
    if subscribe_pattern:
        opts["subscribePattern"] = subscribe_pattern
    if max_offsets_per_trigger is not None:
        opts["maxOffsetsPerTrigger"] = str(max_offsets_per_trigger)
    return opts


def read_kafka_stream(spark: SparkSession, **options) -> DataFrame:
    reader = spark.readStream.format("kafka")
    for k, v in kafka_source_options(**options).items():
        reader = reader.option(k, v)
    return reader.load()


def mirror(records: DataFrame, source_alias: str) -> DataFrame:
    """Kafka->Kafka replication record transform: key/value/headers pass
    through untouched; topic gets the source-cluster alias prefix
    (MirrorMaker2 naming: ``<alias>.<topic>``)."""
    return records.select(
        "key",
        "value",
        F.concat(F.lit(source_alias), F.lit("."), F.col("topic")).alias("topic"),
        "headers",
    )


def read_cdc_stream(records: DataFrame, row_schema: T.StructType) -> DataFrame:
    """Kafka value bytes -> typed Debezium envelope {before,after,op,ts_ms,
    source} (FIXTURES.md §cdc_event). Null values (tombstones) yield a null
    envelope => op NULL, which extract_new_record_state treats as tombstone."""
    env_schema = T.StructType(
        [
            T.StructField("before", row_schema),
            T.StructField("after", row_schema),
            T.StructField("op", T.StringType()),
            T.StructField("ts_ms", T.LongType()),
            T.StructField(
                "source",
                T.StructType(
                    [
                        T.StructField("db", T.StringType()),
                        T.StructField("schema", T.StringType()),
                        T.StructField("table", T.StringType()),
                    ]
                ),
            ),
        ]
    )
    parsed = records.withColumn(
        "env", F.from_json(F.col("value").cast("string"), env_schema)
    )
    # keep the log coordinates: downstream MERGE ordering keys on offset
    keep = [c for c in ("topic", "partition", "offset", "timestamp") if c in records.columns]
    return parsed.select("env.*", *keep)
