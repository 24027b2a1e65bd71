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
    rows, new_max = rdr._scan(None)
    assert len(rows) == 5 and new_max == 1  # whole k=1 group despite cap=3
    rows2, new_max2 = rdr._scan(new_max)
    assert len(rows2) == 2 and new_max2 == 2


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
