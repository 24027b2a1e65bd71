"""S6 — MirrorMaker 2 semantics: replication with offset translation,
heartbeats, and checkpoints (reference README.md:52-65 ships all three MM2
connectors: MirrorSource / MirrorHeartbeat / MirrorCheckpoint).

MM2's core subtlety is that a replicated record's offset DIFFERS between
clusters (retention/compaction mean source offset 100 may land at target
offset 0), so consumer failover needs an upstream->downstream offset
mapping. The three pieces here:

- ``mirror_with_offsets`` — MirrorSourceConnector: rename the topic to
  ``<alias>.<topic>``, assign contiguous per-partition target offsets in
  replication order, and KEEP ``upstream_offset`` — the offset-sync
  stream MM2 writes to ``mm2-offset-syncs``. The target offset is a
  per-(topic,partition) row_number: Kafka-partition-parallel, no global
  shuffle beyond the partition hash.
- ``heartbeats`` — MirrorHeartbeatConnector: deterministic interval
  records (source_cluster, target_cluster, ts) for the ``heartbeats``
  topic; replication lag = consumption ts - heartbeat ts downstream.
- ``checkpoints`` — MirrorCheckpointConnector: translate each consumer
  group's committed upstream offset to the downstream offset a failed-over
  consumer should resume from: the smallest downstream offset whose
  upstream offset is >= the committed offset (records the group had not
  yet read), or end-of-partition when fully caught up. One broadcast-able
  join of the (tiny) group-offset relation against the offset-sync
  mapping plus a partial+final min — no per-group scans.

The kill-and-resume replay contract (no loss, no dup after failover) is
proven in tests/test_mirror.py."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

HEARTBEATS_TOPIC = "heartbeats"


def mirror_with_offsets(
    records: DataFrame,
    source_alias: str,
    base_offsets: DataFrame | None = None,
) -> DataFrame:
    """Replicate kafka-shaped records, assigning target offsets.

    ``base_offsets`` (topic, partition, base) carries the next free target
    offset per partition when resuming an interrupted mirror; absent
    partitions start at 0. Output keeps ``upstream_offset`` (the source
    offset) next to the new ``offset`` — the offset-sync mapping."""
    w = Window.partitionBy("topic", "partition").orderBy("offset")
    out = records.withColumn("__rk", F.row_number().over(w) - 1)
    if base_offsets is not None:
        out = out.join(
            F.broadcast(base_offsets), ["topic", "partition"], "left"
        ).withColumn("__rk", F.col("__rk") + F.coalesce(F.col("base"), F.lit(0)))
        out = out.drop("base")
    keep = [c for c in ("key", "value", "headers") if c in records.columns]
    return out.select(
        *keep,
        F.concat(F.lit(source_alias), F.lit("."), F.col("topic")).alias("topic"),
        "partition",
        F.col("__rk").alias("offset"),
        F.col("offset").alias("upstream_offset"),
    )


def offset_syncs(replicated: DataFrame, source_alias: str) -> DataFrame:
    """The ``mm2-offset-syncs`` stream: (topic, partition, upstream_offset,
    downstream_offset), topic in SOURCE naming (what checkpoints join on)."""
    prefix = source_alias + "."
    return replicated.select(
        F.expr(f"substring(topic, {len(prefix) + 1})").alias("topic"),
        "partition",
        "upstream_offset",
        F.col("offset").alias("downstream_offset"),
    )


def heartbeats(
    spark: SparkSession,
    source_alias: str,
    target_alias: str,
    start_ms: int,
    end_ms: int,
    interval_ms: int = 1000,
) -> DataFrame:
    """MirrorHeartbeatConnector emission: one record per interval tick in
    [start_ms, end_ms]. Deterministic (no wall clock) so replays are exact."""
    ticks = F.explode(
        F.sequence(F.lit(start_ms), F.lit(end_ms), F.lit(interval_ms))
    ).alias("ts_ms")
    return (
        spark.range(1)
        .select(ticks)
        .select(
            F.lit(HEARTBEATS_TOPIC).alias("topic"),
            F.lit(source_alias).alias("source_cluster"),
            F.lit(target_alias).alias("target_cluster"),
            "ts_ms",
            F.timestamp_millis(F.col("ts_ms")).alias("ts"),
        )
    )


def checkpoints(
    group_offsets: DataFrame,
    syncs: DataFrame,
    source_alias: str,
) -> DataFrame:
    """MirrorCheckpointConnector: translate committed consumer offsets.

    ``group_offsets``: (group, topic, partition, committed_offset) in SOURCE
    coordinates — committed_offset is the next offset the group would read.
    Result: (group, topic=<alias>.<topic>, partition, upstream_offset,
    downstream_offset) where downstream_offset is the resume position on
    the target cluster: min downstream of records not yet read, else
    end-of-partition (max downstream + 1), else 0 for an empty mapping."""
    j = group_offsets.join(syncs, ["topic", "partition"], "left")
    agg = j.groupBy("group", "topic", "partition", "committed_offset").agg(
        F.min(
            F.when(
                F.col("upstream_offset") >= F.col("committed_offset"),
                F.col("downstream_offset"),
            )
        ).alias("__next"),
        F.max("downstream_offset").alias("__max"),
    )
    return agg.select(
        "group",
        F.concat(F.lit(source_alias), F.lit("."), F.col("topic")).alias("topic"),
        "partition",
        F.col("committed_offset").alias("upstream_offset"),
        F.coalesce(
            F.col("__next"), F.col("__max") + 1, F.lit(0)
        ).alias("downstream_offset"),
    )
