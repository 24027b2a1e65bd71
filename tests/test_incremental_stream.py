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


def test_probe_is_streaming_not_materialized(spark, tmp_path, monkeypatch):
    """The driver-side offset probe must fold Arrow batches incrementally —
    it may NEVER materialize the offset column as one table (cold start on
    a 100× table would put the whole column on the driver)."""
    import pyarrow.dataset as pads

    from kafka_connect_spark.sources.incremental_stream import _IncrementalStreamReader

    src = str(tmp_path / "t")
    for lo in (1, 6, 11):
        spark.createDataFrame(
            [(i, f"n{i}") for i in range(lo, lo + 5)], ["id", "name"]
        ).coalesce(1).write.mode("append").parquet(src)

    class _NoToTable:
        def __init__(self, ds):
            self._ds = ds

        def to_table(self, *a, **k):  # noqa: ANN001
            raise AssertionError("offset probe materialized the column via to_table")

        def __getattr__(self, name):
            return getattr(self._ds, name)

    orig_factory = pads.dataset
    monkeypatch.setattr(
        pads, "dataset", lambda *a, **k: _NoToTable(orig_factory(*a, **k))
    )

    rdr = _IncrementalStreamReader(
        {"path": src, "offset.column": "id", "batch.max.rows": "4"}
    )
    rdr.initialOffset()
    assert rdr.latestOffset() == {"offset": 4}  # capped: 4th smallest
    rdr._cursor = 4
    assert rdr.latestOffset() == {"offset": 8}
    # uncapped cold-start probe streams too
    rdr2 = _IncrementalStreamReader({"path": src, "offset.column": "id"})
    assert rdr2.latestOffset() == {"offset": 15}


def test_probe_early_stops_on_fragment_stats(spark, tmp_path, monkeypatch):
    """Capped probe visits fragments in ascending stat-min order and stops
    once the cap-th smallest beats every remaining fragment's minimum —
    steady state touches one file regardless of table size."""
    import pyarrow.dataset as pads

    from kafka_connect_spark.sources.incremental_stream import _IncrementalStreamReader

    src = str(tmp_path / "t")
    for lo in (1, 101, 201):  # disjoint offset ranges, one file each
        spark.createDataFrame(
            [(i,) for i in range(lo, lo + 50)], ["id"]
        ).coalesce(1).write.mode("append").parquet(src)

    scanned: list[str] = []

    class _CountingFragment:
        def __init__(self, frag):
            self._frag = frag

        def to_batches(self, *a, **k):  # noqa: ANN001
            scanned.append(self._frag.path)
            return self._frag.to_batches(*a, **k)

        def __getattr__(self, name):
            return getattr(self._frag, name)

    class _CountingDataset:
        def __init__(self, ds):
            self._ds = ds

        def get_fragments(self, *a, **k):  # noqa: ANN001
            return [_CountingFragment(f) for f in self._ds.get_fragments(*a, **k)]

        def __getattr__(self, name):
            return getattr(self._ds, name)

    orig_factory = pads.dataset
    monkeypatch.setattr(
        pads, "dataset", lambda *a, **k: _CountingDataset(orig_factory(*a, **k))
    )
    rdr = _IncrementalStreamReader(
        {"path": src, "offset.column": "id", "batch.max.rows": "10"}
    )
    rdr.initialOffset()
    assert rdr.latestOffset() == {"offset": 10}
    assert len(set(scanned)) == 1  # only the lowest-range file was read


def test_restart_honors_batch_cap_via_mirror(spark, tmp_path):
    """With offset.mirror.dir set, a restarted reader resumes CAPPED from
    the commit-time mirror instead of announcing the uncapped global max —
    the reference's ≤ batch.max.rows-per-poll contract holds across
    restarts (README.md:101)."""
    from kafka_connect_spark.sources.incremental_stream import _IncrementalStreamReader

    src = str(tmp_path / "t")
    spark.createDataFrame(
        [(i, f"n{i}") for i in range(1, 101)], ["id", "name"]
    ).coalesce(1).write.parquet(src)
    opts = {
        "path": src,
        "offset.column": "id",
        "batch.max.rows": "10",
        "offset.mirror.dir": str(tmp_path / "mirror"),
    }
    rdr = _IncrementalStreamReader(opts)
    start = rdr.initialOffset()
    end1 = rdr.latestOffset()
    assert end1 == {"offset": 10}
    assert len(_drain(rdr, start, end1)) == 10
    rdr.commit(end1)

    # restart: a FRESH reader (unknown cursor) with the same options
    rdr2 = _IncrementalStreamReader(opts)
    end2 = rdr2.latestOffset()
    assert end2 == {"offset": 20}  # capped from mirrored offset, not 100
    assert len(_drain(rdr2, end1, end2)) == 10

    # without a mirror the restart path still works (uncapped, documented)
    rdr3 = _IncrementalStreamReader({k: v for k, v in opts.items() if k != "offset.mirror.dir"})
    assert rdr3.latestOffset() == {"offset": 100}


def test_stale_mirror_never_loses_data(spark, tmp_path):
    """Mirror trailing the checkpoint (crash between epoch commit and
    commit()) yields one empty batch, then normal capped paging — the
    cursor never regresses and no rows are skipped or duplicated."""
    from kafka_connect_spark.sources.incremental_stream import _IncrementalStreamReader

    src = str(tmp_path / "t")
    spark.createDataFrame(
        [(i,) for i in range(1, 31)], ["id"]
    ).coalesce(1).write.parquet(src)
    mirror = str(tmp_path / "mirror")
    opts = {
        "path": src,
        "offset.column": "id",
        "batch.max.rows": "10",
        "offset.mirror.dir": mirror,
    }
    rdr = _IncrementalStreamReader(opts)
    rdr.initialOffset()
    rdr.commit(rdr.latestOffset())  # mirror = 10
    committed = {"offset": 15}  # checkpoint got further before the crash

    rdr2 = _IncrementalStreamReader(opts)
    stale_end = rdr2.latestOffset()  # probes from mirror=10 -> 20... but
    assert stale_end == {"offset": 20}
    # ...Spark plans (checkpoint committed=15, announced 20]: a SHORT batch,
    # never a re-read of rows ≤ 15
    assert [r[0] for r in _drain(rdr2, committed, stale_end)] == [16, 17, 18, 19, 20]
    rdr2.commit(stale_end)
    end_next = rdr2.latestOffset()
    assert end_next == {"offset": 30}
    assert len(_drain(rdr2, stale_end, end_next)) == 10

    # fully-behind announcement (mirror two batches back): empty batch,
    # cursor must NOT regress below the checkpointed start
    rdr3 = _IncrementalStreamReader(opts)
    rdr3._cursor = None
    rdr3.commit({"offset": 10})  # force mirror back to 10
    rdr4 = _IncrementalStreamReader(opts)
    behind_end = rdr4.latestOffset()  # 20, but checkpoint committed = 25
    assert behind_end == {"offset": 20}
    assert _drain(rdr4, {"offset": 25}, behind_end) == []  # no re-reads
    rdr4.commit(behind_end)  # regress guard: cursor stays at 25
    end5 = rdr4.latestOffset()
    assert end5 == {"offset": 30}  # capped page from 25, forward progress
    assert [r[0] for r in _drain(rdr4, {"offset": 25}, end5)] == [26, 27, 28, 29, 30]


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


def test_restart_across_timestamp_tie_page_boundary(spark, tmp_path):
    """s2c promoted to a replay proof on the NATIVE stream (verdict r4 #5):
    kill/resume with batch.max.rows capped where the cap lands INSIDE a
    timestamp tie group. Exactness depends on two interacting rules: the
    capped probe's inclusive bound pulls the whole tie group into the batch
    (or the committed max would skip the tied remainder forever), and the
    restarted reader resumes capped from the commit-time mirror. Across the
    kill there must be no duplicate and no gap."""
    import datetime as dt

    from kafka_connect_spark.sources.incremental_stream import _IncrementalStreamReader

    src = str(tmp_path / "t")
    base = dt.datetime(2024, 1, 1)
    # tie groups: 7 rows @t1, 6 @t2, 8 @t3, 9 @t4  (cap=10 lands mid-group
    # at every page boundary)
    groups = [(1, 7), (2, 6), (3, 8), (4, 9)]
    rows, rid = [], 0
    for g, n in groups:
        for _ in range(n):
            rid += 1
            rows.append((rid, base + dt.timedelta(minutes=g)))
    spark.createDataFrame(rows, ["id", "ts"]).coalesce(1).write.parquet(src)
    opts = {
        "path": src,
        "offset.column": "ts",
        "batch.max.rows": "10",
        "offset.mirror.dir": str(tmp_path / "mirror"),
    }

    rdr = _IncrementalStreamReader(opts)
    start = rdr.initialOffset()
    end1 = rdr.latestOffset()
    got1 = _drain(rdr, start, end1)
    # 10th smallest ts is t2; inclusive bound pulls the whole t2 group
    assert len(got1) == 13
    rdr.commit(end1)

    # kill: fresh reader resumes from the mirror, capped — the next page
    # boundary again lands mid-tie (10th smallest above t2 is t4)
    rdr2 = _IncrementalStreamReader(opts)
    end2 = rdr2.latestOffset()
    got2 = _drain(rdr2, end1, end2)
    assert len(got2) == 17  # whole t3+t4 groups
    rdr2.commit(end2)

    ids = sorted(r[0] for r in got1 + got2)
    assert ids == list(range(1, 31))  # no dup, no gap across the restart

    # drained: a third restart announces no new batch
    rdr3 = _IncrementalStreamReader(opts)
    end3 = rdr3.latestOffset()
    assert _drain(rdr3, end2, end3) == []
