"""The incremental table as a NATIVE streaming source: offsets live in the
query checkpoint; appends surface as new microbatches; restart resumes."""

from __future__ import annotations

import time

from kafka_connect_spark.sources.incremental_stream import IncrementalTableDataSource


def _wait_count(spark, view: str, expected: int, timeout: float = 60.0) -> int:
    deadline = time.time() + timeout
    n = -1
    while time.time() < deadline:
        n = spark.sql(f"SELECT count(*) c FROM {view}").collect()[0]["c"]
        if n >= expected:
            return n
        time.sleep(0.5)
    return n


def test_incremental_stream_source(spark, tmp_path):
    spark.dataSource.register(IncrementalTableDataSource)
    src = str(tmp_path / "users")
    spark.createDataFrame([(1, "a"), (2, "b")], ["id", "name"]).write.parquet(src)

    sdf = (
        spark.readStream.format("incremental_table")
        .option("path", src)
        .option("offset.column", "id")
        .load()
    )
    assert sdf.isStreaming and [f.name for f in sdf.schema.fields] == ["id", "name"]

    seen: list[tuple] = []

    def collect(df, _id):
        seen.extend((r["id"], r["name"]) for r in df.collect())

    def wait_rows(n, timeout=60.0):
        deadline = time.time() + timeout
        while len(seen) < n and time.time() < deadline:
            time.sleep(0.5)
        return len(seen)

    ckpt = str(tmp_path / "ckpt")
    q = sdf.writeStream.foreachBatch(collect).option("checkpointLocation", ckpt).start()
    try:
        assert wait_rows(2) == 2
        # live append: the next poll must pick up ONLY the new row
        spark.createDataFrame([(3, "c")], ["id", "name"]).write.mode("append").parquet(src)
        assert wait_rows(3) == 3
        assert set(seen) == {(1, "a"), (2, "b"), (3, "c")}
    finally:
        q.stop()
        q.awaitTermination(30)

    # restart from the same checkpoint: nothing re-emitted, new rows flow
    spark.createDataFrame([(4, "d")], ["id", "name"]).write.mode("append").parquet(src)
    seen.clear()
    q2 = sdf.writeStream.foreachBatch(collect).option("checkpointLocation", ckpt).start()
    try:
        assert wait_rows(1) >= 1
        ids = sorted(i for i, _ in seen)
        assert 1 not in ids and 4 in ids  # resumed past committed offset
    finally:
        q2.stop()
        q2.awaitTermination(30)


def _drain(rdr, start: dict, end: dict) -> list[tuple]:
    """Run the reader's partition plan + executor read path locally and
    flatten the Arrow batches to tuples."""
    rows: list[tuple] = []
    for part in rdr.partitions(start, end):
        for batch in rdr.read(part):
            cols = [batch.column(i).to_pylist() for i in range(batch.num_columns)]
            rows.extend(zip(*cols))
    return rows


def test_incremental_stream_cap_keeps_tie_group_whole(spark, tmp_path):
    """batch.max.rows must cut at an offset boundary: a tie group sharing
    the boundary value comes out in one batch, or the committed max would
    skip the tied remainder forever."""
    from kafka_connect_spark.sources.incremental_stream import _IncrementalStreamReader

    src = str(tmp_path / "t")
    # offset column `k`: five rows at k=1 (tie group > cap), two at k=2
    spark.createDataFrame(
        [(i, 1 if i <= 5 else 2) for i in range(1, 8)], ["id", "k"]
    ).coalesce(1).write.parquet(src)
    rdr = _IncrementalStreamReader(
        {"path": src, "offset.column": "k", "batch.max.rows": "3"}
    )
    start = rdr.initialOffset()
    end1 = rdr.latestOffset()
    assert end1 == {"offset": 1}  # whole k=1 tie group despite cap=3
    assert len(_drain(rdr, start, end1)) == 5
    end2 = rdr.latestOffset()
    assert end2 == {"offset": 2}
    assert len(_drain(rdr, end1, end2)) == 2
    # drained: latestOffset stays put -> Spark plans no batch
    assert rdr.latestOffset() == end2


def test_incremental_stream_reads_are_per_partition(spark, tmp_path):
    """The scale contract: one InputPartition per parquet file in range,
    each read() yields only that file's rows (executor-side scan), and
    files wholly below the committed offset are PRUNED from the plan via
    row-group statistics — the driver never materializes data."""
    from kafka_connect_spark.sources.incremental_stream import _IncrementalStreamReader

    src = str(tmp_path / "t")
    # three appends -> three physical files with disjoint offset ranges
    for lo in (1, 4, 7):
        spark.createDataFrame(
            [(i, f"n{i}") for i in range(lo, lo + 3)], ["id", "name"]
        ).coalesce(1).write.mode("append").parquet(src)
    rdr = _IncrementalStreamReader({"path": src, "offset.column": "id"})

    parts = rdr.partitions({"offset": None}, {"offset": 9})
    assert len(parts) == 3  # one per file, not one per table
    per_part = [sorted(r[0] for r in _drain_one(rdr, p)) for p in parts]
    assert sorted(map(tuple, per_part)) == [(1, 2, 3), (4, 5, 6), (7, 8, 9)]

    # increment (3, 9]: the first file's stats (max=3) prune it entirely
    parts2 = rdr.partitions({"offset": 3}, {"offset": 9})
    assert len(parts2) == 2
    got = sorted(r[0] for p in parts2 for r in _drain_one(rdr, p))
    assert got == [4, 5, 6, 7, 8, 9]


def _drain_one(rdr, part) -> list[tuple]:
    rows: list[tuple] = []
    for batch in rdr.read(part):
        cols = [batch.column(i).to_pylist() for i in range(batch.num_columns)]
        rows.extend(zip(*cols))
    return rows


def test_incremental_stream_timestamp_offsets(spark, tmp_path):
    """Timestamp offset columns round-trip through the JSON checkpoint as
    isoformat strings; the decoded bound must still prune and filter."""
    from datetime import datetime

    from kafka_connect_spark.sources.incremental_stream import _IncrementalStreamReader

    src = str(tmp_path / "ts")
    rows = [
        (i, datetime(2024, 1, 1, 0, i)) for i in range(1, 5)
    ]
    spark.createDataFrame(rows, ["id", "updated_at"]).coalesce(1).write.parquet(src)
    rdr = _IncrementalStreamReader(
        {"path": src, "offset.column": "updated_at", "batch.max.rows": "2"}
    )
    start = rdr.initialOffset()
    end1 = rdr.latestOffset()
    assert end1 == {"offset": "2024-01-01T00:02:00"}
    got1 = _drain(rdr, start, end1)
    assert sorted(r[0] for r in got1) == [1, 2]
    # simulate a restart: fresh reader learns the offset from partitions()
    rdr2 = _IncrementalStreamReader({"path": src, "offset.column": "updated_at"})
    end2 = rdr2.latestOffset()  # unknown cursor -> uncapped global max
    assert end2 == {"offset": "2024-01-01T00:04:00"}
    got2 = _drain(rdr2, end1, end2)
    assert sorted(r[0] for r in got2) == [3, 4]


def test_incremental_stream_batch_cap(spark, tmp_path):
    spark.dataSource.register(IncrementalTableDataSource)
    src = str(tmp_path / "t")
    spark.createDataFrame([(i, f"n{i}") for i in range(1, 8)], ["id", "name"]).write.parquet(src)
    sdf = (
        spark.readStream.format("incremental_table")
        .option("path", src)
        .option("offset.column", "id")
        .option("batch.max.rows", "3")
        .load()
    )
    q = (
        sdf.writeStream.format("memory")
        .queryName("inc_stream_cap")
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .start()
    )
    try:
        assert _wait_count(spark, "inc_stream_cap", 7) == 7  # paged 3+3+1
    finally:
        q.stop()
        q.awaitTermination(30)
