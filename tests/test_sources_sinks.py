"""Incremental source offset bookkeeping (S1/S2), upsert sink idempotency
(K2), Kafka producer option passthrough (K3)."""

from __future__ import annotations

from kafka_connect_spark.sinks.kafka import kafka_sink_options
from kafka_connect_spark.sinks.upsert import UpsertParquetSink
from kafka_connect_spark.sources.incremental import IncrementalTableSource


def _write_users(spark, path, rows):
    spark.createDataFrame(rows, ["id", "name", "updated_at"]).coalesce(1).write.mode(
        "overwrite"
    ).parquet(path)


def test_incrementing_mode_two_polls(spark, tmp_path):
    data = str(tmp_path / "users")
    state = str(tmp_path / "state")
    _write_users(spark, data, [(1, "a", "2024-01-01"), (2, "b", "2024-01-02")])
    src = IncrementalTableSource(data, "id", "incrementing", state)

    sunk: list[list] = []
    n1 = src.run_once(spark, lambda df: sunk.append(df.collect()))
    assert n1 == 2 and src.last_offset() == 2

    n_idle = src.run_once(spark, lambda df: sunk.append(df.collect()))
    assert n_idle == 0  # caught up: nothing re-emitted

    _write_users(
        spark,
        data,
        [(1, "a", "2024-01-01"), (2, "b", "2024-01-02"), (3, "c", "2024-01-03")],
    )
    n2 = src.run_once(spark, lambda df: sunk.append(df.collect()))
    assert n2 == 1 and {r["id"] for r in sunk[-1]} == {3}


def test_poll_schema_memo_sees_evolution(spark, tmp_path):
    """r16: _base_df memoizes the inferred parquet schema per instance
    (keyed on file mtime+size) so a poll loop stops paying a schema-
    inference job per poll — but an upstream schema EVOLUTION (table
    rewritten with a new column) must still surface on the next poll."""
    data = str(tmp_path / "users")
    state = str(tmp_path / "state")
    _write_users(spark, data, [(1, "a", "2024-01-01")])
    src = IncrementalTableSource(data, "id", "incrementing", state)

    sunk: list[list] = []
    assert src.run_once(spark, lambda df: sunk.append(df.collect())) == 1
    assert "email" not in sunk[-1][0].asDict()

    spark.createDataFrame(
        [(1, "a", "2024-01-01", "a@x"), (2, "b", "2024-01-02", "b@x")],
        ["id", "name", "updated_at", "email"],
    ).coalesce(1).write.mode("overwrite").parquet(data)
    assert src.run_once(spark, lambda df: sunk.append(df.collect())) == 1
    row = sunk[-1][0].asDict()
    assert row["id"] == 2 and row["email"] == "b@x"


def test_offset_survives_restart(spark, tmp_path):
    data = str(tmp_path / "users")
    state = str(tmp_path / "state")
    _write_users(spark, data, [(1, "a", "2024-01-01")])
    src = IncrementalTableSource(data, "id", "incrementing", state)
    src.run_once(spark, lambda df: None)

    # new instance over the same state dir resumes, not re-reads
    src2 = IncrementalTableSource(data, "id", "incrementing", state)
    assert src2.last_offset() == 1
    assert src2.run_once(spark, lambda df: None) == 0


def test_batch_max_rows_paging(spark, tmp_path):
    data = str(tmp_path / "users")
    state = str(tmp_path / "state")
    _write_users(spark, data, [(i, f"n{i}", "2024-01-01") for i in range(1, 8)])
    src = IncrementalTableSource(data, "id", "incrementing", state, batch_max_rows=3)
    sizes = []
    while (n := src.run_once(spark, lambda df: None)) > 0:
        sizes.append(n)
    assert sizes == [3, 3, 1]  # batch.max.rows pages through the backlog


def test_batch_cap_never_splits_offset_tie_group(spark, tmp_path):
    """Timestamp mode + batch.max.rows: rows sharing the boundary timestamp
    must be emitted in ONE batch — truncating mid-group and committing the
    boundary would skip the rest of the tie group forever."""
    data = str(tmp_path / "users")
    state = str(tmp_path / "state")
    # ids 1-5 share ts T1 (tie group bigger than the cap), 6-7 at T2
    spark.sql(
        "SELECT id, CASE WHEN id <= 5 THEN TIMESTAMP '2024-01-01 00:00:00' "
        "ELSE TIMESTAMP '2024-01-02 00:00:00' END AS updated_at "
        "FROM range(1, 8) AS t(id)"
    ).write.mode("overwrite").parquet(data)
    src = IncrementalTableSource(data, "updated_at", "timestamp", state, batch_max_rows=3)
    seen: list[set] = []
    while src.run_once(spark, lambda df: seen.append({r["id"] for r in df.collect()})) > 0:
        pass
    # cap=3 but the T1 tie group (5 rows) comes out whole, then T2's pair
    assert seen == [{1, 2, 3, 4, 5}, {6, 7}]
    # nothing lost, nothing duplicated
    assert sorted(x for s in seen for x in s) == list(range(1, 8))


def test_timestamp_incrementing_dual_mode_pages_through_ties(spark, tmp_path):
    """timestamp+incrementing (the reference JDBC source's dual mode): the
    composite (ts, id) offset is unique, so a capped poll pages THROUGH a
    timestamp tie group exactly at the cap — unlike single-timestamp mode,
    which must emit the whole group at once — with no loss or duplication."""
    data = str(tmp_path / "users")
    state = str(tmp_path / "state")
    # ids 1-5 share ts T1, 6-7 at T2 (same fixture as the tie-group test)
    spark.sql(
        "SELECT id, CASE WHEN id <= 5 THEN TIMESTAMP '2024-01-01 00:00:00' "
        "ELSE TIMESTAMP '2024-01-02 00:00:00' END AS updated_at "
        "FROM range(1, 8) AS t(id)"
    ).write.mode("overwrite").parquet(data)
    src = IncrementalTableSource(
        data, "updated_at", "timestamp+incrementing", state,
        batch_max_rows=3, incrementing_column="id",
    )
    seen: list[list] = []
    while src.run_once(spark, lambda df: seen.append(sorted(r["id"] for r in df.collect()))) > 0:
        pass
    assert seen == [[1, 2, 3], [4, 5, 6], [7]]  # exact cap, ties split safely
    assert src.last_offset() == {"ts": "2024-01-02 00:00:00", "id": 7}
    # restart: a fresh instance resumes from the committed composite offset
    src2 = IncrementalTableSource(
        data, "updated_at", "timestamp+incrementing", state,
        batch_max_rows=3, incrementing_column="id",
    )
    assert src2.run_once(spark, lambda df: None) == 0


def test_read_increment_is_deterministic_under_reevaluation(spark, tmp_path):
    """The capped batch is a pure range filter — separate evaluations (offset
    snapshot, count, sink) must agree on the row set even without caching."""
    data = str(tmp_path / "users")
    state = str(tmp_path / "state")
    _write_users(spark, data, [(i, f"n{i}", "2024-01-01") for i in range(1, 20)])
    src = IncrementalTableSource(data, "id", "incrementing", state, batch_max_rows=5)
    batch = src.read_increment(spark)
    ids1 = {r["id"] for r in batch.collect()}
    ids2 = {r["id"] for r in batch.collect()}
    assert ids1 == ids2 == {1, 2, 3, 4, 5}
    assert src.max_offset_of(batch) == 5


def test_timestamp_mode(spark, tmp_path):
    data = str(tmp_path / "users")
    state = str(tmp_path / "state")
    spark.sql(
        "SELECT 1 AS id, 'a' AS name, TIMESTAMP '2024-01-01 00:00:00' AS updated_at "
        "UNION ALL SELECT 2, 'b', TIMESTAMP '2024-01-02 00:00:00'"
    ).write.mode("overwrite").parquet(data)
    src = IncrementalTableSource(data, "updated_at", "timestamp", state)
    assert src.run_once(spark, lambda df: None) == 2
    assert src.last_offset() == "2024-01-02 00:00:00"
    assert src.run_once(spark, lambda df: None) == 0


def test_upsert_sink_idempotent_merge(spark, tmp_path):
    path = str(tmp_path / "tbl")
    sink = UpsertParquetSink(path, key_cols=["id"], order_col="ver")

    b1 = spark.createDataFrame([(1, 1, "a"), (2, 1, "b")], ["id", "ver", "v"])
    sink.apply_batch(b1)
    # batch 2: update id=2 (two versions in one batch -> last writer wins), insert id=3
    b2 = spark.createDataFrame([(2, 2, "b2"), (2, 3, "b3"), (3, 1, "c")], ["id", "ver", "v"])
    sink.apply_batch(b2)
    got = {r["id"]: r["v"] for r in sink.read(spark).collect()}
    assert got == {1: "a", 2: "b3", 3: "c"}

    # replaying batch 2 (at-least-once redelivery) changes nothing
    sink.apply_batch(b2)
    got2 = {r["id"]: r["v"] for r in sink.read(spark).collect()}
    assert got2 == got


def test_upsert_sink_schema_evolution(spark, tmp_path):
    """'limited auto-evolution' (reference manifest.json:5): later batches
    may ADD columns; existing rows read back with NULL in the new column."""
    path = str(tmp_path / "tbl")
    sink = UpsertParquetSink(path, key_cols=["id"], order_col="ver")
    sink.apply_batch(spark.createDataFrame([(1, 1, "a")], ["id", "ver", "v"]))
    sink.apply_batch(
        spark.createDataFrame([(2, 1, "b", "extra")], ["id", "ver", "v", "w"])
    )
    got = {r["id"]: (r["v"], r["w"]) for r in sink.read(spark).collect()}
    assert got == {1: ("a", None), 2: ("b", "extra")}

    strict = UpsertParquetSink(path, ["id"], "ver", auto_evolve=False)
    import pytest as _pytest

    with _pytest.raises(ValueError, match="schema evolution disabled"):
        strict.apply_batch(
            spark.createDataFrame([(3, 1, "c", 1.0)], ["id", "ver", "v", "z"])
        )


def test_upsert_sink_crash_safety(spark, tmp_path):
    """Versioned commit protocol: a crash mid-merge never loses the last
    complete table, and a stranded pointer is repaired on the next call."""
    import os
    import shutil

    path = str(tmp_path / "tbl")
    sink = UpsertParquetSink(path, key_cols=["id"], order_col="ver")
    sink.apply_batch(spark.createDataFrame([(1, 1, "a")], ["id", "ver", "v"]))
    assert os.path.islink(path)  # pointer onto .data.v0

    # crash scenario 1: a half-written NEW version dir (no _SUCCESS) exists;
    # the pointer still serves the old complete version and the partial dir
    # is GC'd by the next successful merge
    partial = path + ".data.v99"
    os.makedirs(partial)
    got = {r["id"]: r["v"] for r in sink.read(spark).collect()}
    assert got == {1: "a"}
    sink.apply_batch(spark.createDataFrame([(2, 1, "b")], ["id", "ver", "v"]))
    assert not os.path.exists(partial)
    assert {r["id"] for r in sink.read(spark).collect()} == {1, 2}

    # crash scenario 2: pointer lost between rename and flip — recover from
    # the newest complete version dir
    target = os.readlink(path)
    os.unlink(path)
    got = {r["id"]: r["v"] for r in sink.read(spark).collect()}
    assert got == {1: "a", 2: "b"}
    assert os.path.islink(path) and os.readlink(path) == target

    # no superseded version dirs or legacy staging left behind
    vers = [f for f in os.listdir(tmp_path) if ".data.v" in f]
    assert len(vers) == 1
    shutil.rmtree(tmp_path / "tbl.data.v1", ignore_errors=True)


def test_upsert_sink_time_travel(spark, tmp_path):
    """keep_versions retains superseded snapshots for rollback/audit."""
    path = str(tmp_path / "tbl")
    sink = UpsertParquetSink(path, key_cols=["id"], order_col="ver", keep_versions=2)
    sink.apply_batch(spark.createDataFrame([(1, 1, "a")], ["id", "ver", "v"]))
    sink.apply_batch(spark.createDataFrame([(1, 2, "a2"), (2, 1, "b")], ["id", "ver", "v"]))
    sink.apply_batch(spark.createDataFrame([(3, 1, "c")], ["id", "ver", "v"]))
    vs = sink.versions()
    assert len(vs) == 2  # current + one superseded
    prev, cur = vs
    assert {r["id"]: r["v"] for r in sink.read_version(spark, cur).collect()} == {
        1: "a2", 2: "b", 3: "c"
    }
    assert {r["id"]: r["v"] for r in sink.read_version(spark, prev).collect()} == {
        1: "a2", 2: "b"
    }
    import pytest as _pytest

    with _pytest.raises(ValueError, match="not retained"):
        sink.read_version(spark, 999)


def test_upsert_sink_migrates_legacy_plain_dir(spark, tmp_path):
    """Tables written by the pre-versioned layout (plain parquet dir) are
    adopted in place on the next merge."""
    import os

    path = str(tmp_path / "tbl")
    spark.createDataFrame([(1, 1, "a")], ["id", "ver", "v"]).write.parquet(path)
    assert not os.path.islink(path)
    sink = UpsertParquetSink(path, key_cols=["id"], order_col="ver")
    sink.apply_batch(spark.createDataFrame([(1, 2, "a2"), (2, 1, "b")], ["id", "ver", "v"]))
    assert os.path.islink(path)
    got = {r["id"]: r["v"] for r in sink.read(spark).collect()}
    assert got == {1: "a2", 2: "b"}


def test_kafka_options_passthrough():
    opts = kafka_sink_options("broker:9092", {"batch.size": 16384, "linger.ms": 5})
    assert opts["kafka.bootstrap.servers"] == "broker:9092"
    assert opts["kafka.batch.size"] == "16384"  # override beats tuned default
    assert opts["kafka.linger.ms"] == "5"
    assert opts["kafka.compression.type"] == "snappy"  # tuned default kept


def test_kafka_exactly_once_option_surface():
    """The reference worker declares exactly.once.support=requested
    (README.md:285): the idempotent/transactional producer options must be
    emittable, with the documented at-least-once default unchanged."""
    from kafka_connect_spark.sinks.kafka import exactly_once_sink_options

    opts = exactly_once_sink_options("broker:9092", transactional_id="pipe-1")
    assert opts["kafka.enable.idempotence"] == "true"
    assert opts["kafka.acks"] == "all"
    assert opts["kafka.transactional.id"] == "pipe-1"
    assert opts["kafka.max.in.flight.requests.per.connection"] == "5"
    assert opts["kafka.compression.type"] == "snappy"  # tuned defaults kept

    # no transactional id -> idempotence only (no zombie fencing)
    assert "kafka.transactional.id" not in exactly_once_sink_options("b:9092")

    # explicit user overrides win over the exactly-once defaults
    opts = exactly_once_sink_options(
        "b:9092", overrides={"enable.idempotence": "false", "acks": "1"}
    )
    assert opts["kafka.enable.idempotence"] == "false"
    assert opts["kafka.acks"] == "1"

    # the at-least-once default path emits none of the EO options
    base = kafka_sink_options("b:9092")
    assert "kafka.enable.idempotence" not in base
    assert "kafka.transactional.id" not in base


def test_compact_parquet_flat(spark, tmp_path):
    """Compaction: 40 tiny files -> few files, rows and values unchanged,
    swap leaves no temp/backup dirs behind."""
    import os

    from kafka_connect_spark.sinks.file import compact_parquet, small_file_report

    path = str(tmp_path / "frag")
    df = spark.range(0, 10_000).selectExpr("id", "id % 7 AS k", "id * 1.5 AS v")
    df.repartition(40).write.parquet(path)
    before = small_file_report(spark, path)
    assert before["n_files"] >= 40
    checksum = spark.read.parquet(path).selectExpr(
        "sum(hash(id, k, v)) AS h", "count(*) AS n"
    ).collect()[0]

    out = compact_parquet(spark, path, target_file_bytes=64 * 1024 * 1024)
    after = out["after"]
    assert after["n_rows"] == before["n_rows"]
    assert after["n_files"] < before["n_files"]
    post = spark.read.parquet(path).selectExpr(
        "sum(hash(id, k, v)) AS h", "count(*) AS n"
    ).collect()[0]
    assert (post["h"], post["n"]) == (checksum["h"], checksum["n"])
    assert not os.path.exists(path + ".compact.tmp")
    assert not os.path.exists(path + ".compact.bak")


def test_compact_parquet_partitioned(spark, tmp_path):
    """Partitioned layout: each partition directory collapses to one file."""
    import glob

    from kafka_connect_spark.sinks.file import compact_parquet

    path = str(tmp_path / "part")
    df = spark.range(0, 5_000).selectExpr("id", "CAST(id % 4 AS INT) AS p")
    df.repartition(25).write.partitionBy("p").parquet(path)
    assert len(glob.glob(path + "/p=0/*.parquet")) > 1

    compact_parquet(spark, path, partition_by=["p"])
    for p in range(4):
        files = glob.glob(path + f"/p={p}/*.parquet")
        assert len(files) == 1, f"partition p={p} has {len(files)} files"
    assert spark.read.parquet(path).count() == 5_000


def test_range_sorted_layout_skips_files(spark, tmp_path):
    """Range-sorted layout: per-file key ranges are pairwise disjoint, a
    point predicate touches exactly one file, and the same data written
    hash-partitioned touches (nearly) all of them."""
    from kafka_connect_spark.sinks.layout import (
        file_key_ranges,
        skipping_effectiveness,
        write_range_sorted,
    )

    df = spark.range(0, 20_000).selectExpr("id AS k", "id * 2 AS v")
    sorted_path = str(tmp_path / "sorted")
    hashed_path = str(tmp_path / "hashed")
    write_range_sorted(df, sorted_path, "k", n_files=8)
    df.repartition(8, "k").write.parquet(hashed_path)

    ranges = sorted(
        (r["key_min"], r["key_max"]) for r in file_key_ranges(spark, sorted_path, "k").collect()
    )
    assert len(ranges) == 8
    for (a_lo, a_hi), (b_lo, b_hi) in zip(ranges, ranges[1:]):
        assert a_hi < b_lo, "file key ranges must be disjoint"

    eff_sorted = skipping_effectiveness(spark, sorted_path, "k", 12_345)
    eff_hashed = skipping_effectiveness(spark, hashed_path, "k", 12_345)
    assert eff_sorted["n_needed"] == 1
    assert eff_hashed["n_needed"] == eff_hashed["n_files"]

    # range predicate: contiguous file subset
    eff_range = skipping_effectiveness(spark, sorted_path, "k", 1_000, 6_000)
    assert eff_range["n_needed"] <= 3

    # the layout preserves the data
    assert spark.read.parquet(sorted_path).count() == 20_000


def test_zorder_layout_skips_on_both_dims(spark, tmp_path):
    """Z-order layout: with two independent keys, a single-key range sort
    skips perfectly on its key and not at all on the other; the Morton
    layout gives substantial file-level skipping on BOTH keys."""
    from kafka_connect_spark.sinks.layout import (
        skipping_effectiveness,
        write_range_sorted,
        write_zorder,
    )

    # two independent dimensions (decorrelated via a multiplicative hash)
    df = spark.range(0, 40_000).selectExpr(
        "id AS x", "CAST((id * 2654435761) % 40000 AS BIGINT) AS y"
    )
    zpath, spath = str(tmp_path / "zorder"), str(tmp_path / "xsorted")
    write_zorder(df, zpath, "x", "y", n_files=64, bits=8)
    write_range_sorted(df, spath, "x", n_files=64)

    # narrow range predicates on each dimension (1% of the domain)
    ex_z_x = skipping_effectiveness(spark, zpath, "x", 10_000, 10_400)
    ex_z_y = skipping_effectiveness(spark, zpath, "y", 10_000, 10_400)
    ex_s_x = skipping_effectiveness(spark, spath, "x", 10_000, 10_400)
    ex_s_y = skipping_effectiveness(spark, spath, "y", 10_000, 10_400)

    assert ex_s_x["n_needed"] <= 3          # single-key sort: perfect on x...
    assert ex_s_y["n_needed"] == 64         # ...useless on y
    assert ex_z_x["skip_ratio"] >= 0.5      # z-order: skips most files on x
    assert ex_z_y["skip_ratio"] >= 0.5      # AND on y
    assert spark.read.parquet(zpath).count() == 40_000
