"""MirrorMaker 2 semantics: offset-translating replication, checkpoint
translation, heartbeat emission, and the kill-and-resume failover contract
(a consumer resuming at the translated offset sees no loss and no dup)."""

from __future__ import annotations

from pyspark.sql import functions as F

from kafka_connect_spark.sources.mirror import (
    checkpoints,
    heartbeats,
    mirror_with_offsets,
    offset_syncs,
)


def _records(spark, rows):
    return spark.createDataFrame(
        rows, "key string, value string, topic string, partition int, offset long"
    )


def test_translation_no_loss_no_dup(spark):
    # head-truncated source partitions: offsets start at 5 (retention), so
    # upstream and downstream offsets MUST differ
    rows = [(None, f"v{p}{o}", "orders", p, o) for p in (0, 1) for o in range(5, 15)]
    src = _records(spark, rows)
    rep = mirror_with_offsets(src, "primary")
    got = {(r["partition"], r["upstream_offset"]): r["offset"] for r in rep.collect()}
    assert got[(0, 5)] == 0 and got[(0, 14)] == 9  # contiguous from 0

    groups = spark.createDataFrame(
        [("g1", "orders", 0, 8), ("g1", "orders", 1, 12)],
        ["group", "topic", "partition", "committed_offset"],
    )
    cp = {
        (r["partition"]): r["downstream_offset"]
        for r in checkpoints(groups, offset_syncs(rep, "primary"), "primary").collect()
    }
    assert cp == {0: 3, 1: 7}

    # failover: consume the target from the translated offset; the upstream
    # records seen must be exactly those the group had not yet read
    for p, committed in ((0, 8), (1, 12)):
        seen = {
            r["upstream_offset"]
            for r in rep.filter(
                (F.col("partition") == p) & (F.col("offset") >= cp[p])
            ).collect()
        }
        assert seen == set(range(committed, 15))  # no loss, no dup


def test_caught_up_group_resumes_at_end(spark):
    src = _records(spark, [(None, "v", "t", 0, o) for o in range(3)])
    rep = mirror_with_offsets(src, "a")
    groups = spark.createDataFrame(
        [("g", "t", 0, 3)], ["group", "topic", "partition", "committed_offset"]
    )
    row = checkpoints(groups, offset_syncs(rep, "a"), "a").first()
    assert row["downstream_offset"] == 3  # end of partition, nothing re-read
    assert row["topic"] == "a.t"


def test_kill_and_resume_mirror(spark):
    """Mirror 5 records, die, resume with base offsets, mirror 5 more; the
    stitched offset-sync mapping still translates exactly."""
    chunk1 = _records(spark, [(None, f"v{o}", "orders", 0, o) for o in range(5, 10)])
    rep1 = mirror_with_offsets(chunk1, "primary")
    # restart: next free target offset per partition, recovered from the sink
    base = rep1.groupBy(
        F.expr("substring(topic, 9)").alias("topic"), "partition"
    ).agg((F.max("offset") + 1).alias("base"))
    chunk2 = _records(spark, [(None, f"v{o}", "orders", 0, o) for o in range(10, 15)])
    rep2 = mirror_with_offsets(chunk2, "primary", base_offsets=base)
    rep = rep1.unionByName(rep2)
    offs = sorted(r["offset"] for r in rep.collect())
    assert offs == list(range(10))  # contiguous across the restart, no dup

    groups = spark.createDataFrame(
        [("g1", "orders", 0, 12)], ["group", "topic", "partition", "committed_offset"]
    )
    cp = checkpoints(groups, offset_syncs(rep, "primary"), "primary").first()
    assert cp["downstream_offset"] == 7
    seen = {
        r["upstream_offset"] for r in rep.filter(F.col("offset") >= 7).collect()
    }
    assert seen == {12, 13, 14}


def test_heartbeats_deterministic(spark):
    hb = heartbeats(spark, "primary", "backup", 1000, 5000, interval_ms=1000)
    rows = hb.collect()
    assert [r["ts_ms"] for r in rows] == [1000, 2000, 3000, 4000, 5000]
    assert rows[0]["topic"] == "heartbeats"
    assert rows[0]["source_cluster"] == "primary"
    assert rows[0]["target_cluster"] == "backup"
    # replay yields the identical frame (no wall clock involved)
    assert hb.collect() == rows
