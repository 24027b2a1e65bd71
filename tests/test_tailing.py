"""Byte-position file tailing (S5 exact semantics): append-only text file
replayed as one record per line, offsets = (file, position) byte pairs in
the checkpoint; kill/restart resumes with no loss and no duplicates."""

from __future__ import annotations

import os
import time

from kafka_connect_spark.sources.tailing import (
    TailingFileDataSource,
    _TailingFileStreamReader,
)


def _append(path, text: str) -> None:
    with open(path, "a") as fh:
        fh.write(text)


def test_tailing_reader_unit(tmp_path):
    """Driver probe honors line boundaries: a partial trailing line is
    invisible until its newline arrives; batch.max.bytes cuts at a line
    boundary."""
    f = str(tmp_path / "app.log")
    _append(f, "one\ntwo\npart")
    rdr = _TailingFileStreamReader({"path": f})
    start = rdr.initialOffset()
    end1 = rdr.latestOffset()
    assert end1["position"] == len("one\ntwo\n")  # 'part' not yet complete
    parts = rdr.partitions(start, end1)
    assert len(parts) == 1  # one file tail = one sequential task
    assert [r[0] for r in rdr.read(parts[0])] == ["one", "two"]
    # completing the line moves the bound; only the new line is read
    _append(f, "ial\n")
    end2 = rdr.latestOffset()
    assert [r[0] for p in rdr.partitions(end1, end2) for r in rdr.read(p)] == [
        "partial"
    ]
    # no new data -> same offset -> Spark plans no batch
    assert rdr.latestOffset() == end2


def test_tailing_batch_max_bytes_cuts_at_line_boundary(tmp_path):
    f = str(tmp_path / "cap.log")
    _append(f, "aaaa\nbbbb\ncccc\n")
    rdr = _TailingFileStreamReader({"path": f, "batch.max.bytes": "7"})
    rdr.initialOffset()
    end1 = rdr.latestOffset()
    assert end1["position"] == 5  # cap 7 cut back to after 'aaaa\n'
    end2 = rdr.latestOffset()
    assert end2["position"] == 10
    end3 = rdr.latestOffset()
    assert end3["position"] == 15


def test_tailing_truncation_restarts_from_top(tmp_path):
    """Truncation bumps the offset GENERATION, so the next batch is planned
    from the COMMITTED offset (as Spark does) and still reads the new
    file's head — the old upper<=lower guard silently skipped it."""
    f = str(tmp_path / "rot.log")
    _append(f, "old-1\nold-2\n")
    rdr = _TailingFileStreamReader({"path": f})
    start = rdr.initialOffset()
    end1 = rdr.latestOffset()
    assert end1["position"] == 12
    assert [r[0] for p in rdr.partitions(start, end1) for r in rdr.read(p)] == [
        "old-1",
        "old-2",
    ]
    rdr.commit(end1)
    with open(f, "w") as fh:  # truncation: new, shorter file in place
        fh.write("new\n")
    end2 = rdr.latestOffset()
    assert end2["position"] == 4 and end2["gen"] == end1["gen"] + 1
    # planned from the committed offset, exactly as Spark replays it
    assert [r[0] for p in rdr.partitions(end1, end2) for r in rdr.read(p)] == ["new"]


def test_tailing_rotation_follows_renamed_tail(tmp_path):
    """logrotate flow with rotation.glob: the renamed old file's unread
    tail is emitted FIRST (same generation — positions carry over), then
    the stream switches to the new file from byte 0. No loss, no dups."""
    f = str(tmp_path / "app.log")
    _append(f, "a-1\na-2\na-3\n")
    rdr = _TailingFileStreamReader(
        {"path": f, "rotation.glob": str(tmp_path / "app.log.*")}
    )
    start = rdr.initialOffset()
    end1 = rdr.latestOffset()
    got1 = [r[0] for p in rdr.partitions(start, end1) for r in rdr.read(p)]
    assert got1 == ["a-1", "a-2", "a-3"]
    rdr.commit(end1)

    # rotate: two more lines land in the old file, then it is renamed and
    # a fresh live file starts
    _append(f, "a-4\na-5\n")
    os.rename(f, str(tmp_path / "app.log.1"))
    _append(f, "b-1\n")

    end2 = rdr.latestOffset()  # old file's tail, same generation
    assert end2["gen"] == end1["gen"] and end2["file"].endswith("app.log.1")
    got2 = [r[0] for p in rdr.partitions(end1, end2) for r in rdr.read(p)]
    assert got2 == ["a-4", "a-5"]
    rdr.commit(end2)

    end3 = rdr.latestOffset()  # switch: new generation, new file from 0
    assert end3["gen"] == end2["gen"] + 1 and end3["file"] == f
    got3 = [r[0] for p in rdr.partitions(end2, end3) for r in rdr.read(p)]
    assert got3 == ["b-1"]
    rdr.commit(end3)

    # steady state on the new file
    _append(f, "b-2\n")
    end4 = rdr.latestOffset()
    assert end4["gen"] == end3["gen"]
    assert [r[0] for p in rdr.partitions(end3, end4) for r in rdr.read(p)] == ["b-2"]


def test_tailing_rotation_without_glob_loses_only_unpolled_tail(tmp_path):
    """Without rotation.glob the renamed file's tail is unreachable (the
    reference's FileStreamSource behaves the same) — but the NEW file's
    head must still be read via the generation bump, never skipped."""
    f = str(tmp_path / "app.log")
    _append(f, "a-1\n")
    rdr = _TailingFileStreamReader({"path": f})
    start = rdr.initialOffset()
    end1 = rdr.latestOffset()
    assert [r[0] for p in rdr.partitions(start, end1) for r in rdr.read(p)] == ["a-1"]
    rdr.commit(end1)
    os.rename(f, str(tmp_path / "app.log.1"))
    _append(f, "b-1\nb-2\n")  # new inode, LARGER than committed position

    end2 = rdr.latestOffset()
    assert end2["gen"] == end1["gen"] + 1
    got = [r[0] for p in rdr.partitions(end1, end2) for r in rdr.read(p)]
    assert got == ["b-1", "b-2"]


def test_tailing_stream_end_to_end_with_restart(spark, tmp_path):
    """Appends across triggers surface as new microbatches; restarting
    from the checkpoint emits nothing already committed, then picks up
    post-restart appends (the reference's FILENAME/POSITION offset
    contract)."""
    spark.dataSource.register(TailingFileDataSource)
    f = str(tmp_path / "tail.log")
    _append(f, "r1\nr2\n")

    sdf = spark.readStream.format("tailing_file").option("path", f).load()
    assert sdf.isStreaming and sdf.columns == ["value"]

    seen: list[str] = []

    def collect(df, _id):
        seen.extend(r["value"] for r in df.collect())

    def wait_rows(n, timeout=60.0):
        deadline = time.time() + timeout
        while len(seen) < n and time.time() < deadline:
            time.sleep(0.5)
        return len(seen)

    ckpt = str(tmp_path / "ckpt")
    q = sdf.writeStream.foreachBatch(collect).option("checkpointLocation", ckpt).start()
    try:
        assert wait_rows(2) == 2
        _append(f, "r3\n")
        assert wait_rows(3) == 3
        assert seen == ["r1", "r2", "r3"]
    finally:
        q.stop()
        q.awaitTermination(30)

    # kill/restart: committed lines are not re-emitted, new ones flow
    _append(f, "r4\n")
    seen.clear()
    q2 = sdf.writeStream.foreachBatch(collect).option("checkpointLocation", ckpt).start()
    try:
        assert wait_rows(1) >= 1
        assert "r4" in seen and "r1" not in seen and "r2" not in seen
    finally:
        q2.stop()
        q2.awaitTermination(30)
