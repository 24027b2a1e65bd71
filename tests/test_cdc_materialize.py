"""§3.2 end-to-end: Debezium-style CDC stream -> unwrap(rewrite) ->
foreachBatch MERGE -> current-state table, deletes removing keys."""

from __future__ import annotations

import json

import pandas as pd
from pyspark.sql import types as T

from kafka_connect_spark.sinks.upsert import UpsertParquetSink
from kafka_connect_spark.sources.kafka import KAFKA_RECORD_SCHEMA, read_cdc_stream
from kafka_connect_spark.transforms import extract_new_record_state

ROW = T.StructType(
    [T.StructField("id", T.LongType()), T.StructField("name", T.StringType())]
)


def _event(offset, op, id_, before=None, after=None):
    import datetime

    env = {
        "before": {"id": id_, "name": before} if before else None,
        "after": {"id": id_, "name": after} if after else None,
        "op": op,
        "ts_ms": offset,
        "source": {"db": "d", "schema": "public", "table": "users"},
    }
    return (
        b"k",
        json.dumps(env).encode(),
        "customers.public.users",
        0,
        offset,
        datetime.datetime(2024, 1, 1),
        [],
    )


def test_cdc_stream_materializes_current_state(spark, tmp_path):
    """insert a, insert b, update a, delete b, insert c  =>  {a(v2), c}."""
    events = [
        _event(0, "c", 1, after="a1"),
        _event(1, "c", 2, after="b1"),
        _event(2, "u", 1, before="a1", after="a2"),
        _event(3, "d", 2, before="b1"),
        _event(4, "c", 3, after="c1"),
    ]
    records = spark.createDataFrame(events, KAFKA_RECORD_SCHEMA)
    env = read_cdc_stream(records, ROW)
    flat = extract_new_record_state(
        env.select("before", "after", "op", "offset"), drop_tombstones=True
    )
    # carry the log offset for last-writer ordering
    sink = UpsertParquetSink(
        str(tmp_path / "state"), ["id"], "offset", delete_col="__deleted"
    )
    sink.apply_batch(flat)
    got = {r["id"]: r["name"] for r in sink.read(spark).collect()}
    assert got == {1: "a2", 3: "c1"}

    # late redelivery of the delete (at-least-once) is a no-op
    redelivery = spark.createDataFrame([_event(3, "d", 2, before="b1")], KAFKA_RECORD_SCHEMA)
    env2 = read_cdc_stream(redelivery, ROW)
    flat2 = extract_new_record_state(
        env2.select("before", "after", "op", "offset"), drop_tombstones=True
    )
    sink.apply_batch(flat2)
    got2 = {r["id"]: r["name"] for r in sink.read(spark).collect()}
    assert got2 == got


def test_delete_then_reinsert_across_batches(spark, tmp_path):
    sink = UpsertParquetSink(str(tmp_path / "s"), ["id"], "off", delete_col="__deleted")
    b1 = spark.createDataFrame(
        [(1, 0, "x", "false"), (2, 1, "y", "false")], ["id", "off", "v", "__deleted"]
    )
    sink.apply_batch(b1)
    b2 = spark.createDataFrame([(1, 2, "x", "true")], ["id", "off", "v", "__deleted"])
    sink.apply_batch(b2)
    assert {r["id"] for r in sink.read(spark).collect()} == {2}
    b3 = spark.createDataFrame([(1, 3, "x2", "false")], ["id", "off", "v", "__deleted"])
    sink.apply_batch(b3)
    got = {r["id"]: r["v"] for r in sink.read(spark).collect()}
    assert got == {1: "x2", 2: "y"}


def test_streaming_aggregate_maintenance_equals_batch(spark, sf_dir, tmp_path):
    """x33's delta algebra as a STREAMING aggregate: fold CDC deltas per
    key in update mode across microbatches; the final maintained sums
    equal the registered batch query over the same envelope."""
    import pandas as pd
    from pyspark.sql import functions as F

    from kafka_connect_spark.queries.cdc import cdc_envelope, x33_cdc_aggregate_maintenance

    env = cdc_envelope(spark, sf_dir)
    d = str(tmp_path / "cdc-replay")
    env.repartition(3).write.parquet(d)

    schema = spark.read.parquet(d).schema
    sdf = spark.readStream.schema(schema).option("maxFilesPerTrigger", 1).parquet(d)
    dec = lambda c: c.cast("decimal(38,6)")  # noqa: E731
    delta = (
        F.when(F.col("op") == "c", dec(F.col("after.value")))
        .when(F.col("op") == "u", dec(F.col("after.value")) - dec(F.col("before.value")))
        .when(F.col("op") == "d", -dec(F.col("before.value")))
        .otherwise(dec(F.col("after.value")))
    )
    key = F.coalesce(F.col("after.user_id"), F.col("before.user_id"))
    agg = sdf.select(key.alias("user_id"), delta.alias("d")).groupBy("user_id").agg(
        F.sum("d").alias("s")
    )
    latest: dict = {}
    n_batches = [0]

    def upd(b, _i):
        n_batches[0] += 1
        for r in b.collect():
            latest[r["user_id"]] = float(r["s"])

    q = (
        agg.writeStream.foreachBatch(upd)
        .outputMode("update")
        .option("checkpointLocation", str(tmp_path / "ck"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    assert n_batches[0] >= 2  # state genuinely crossed microbatches

    batch = {
        r["user_id"]: r["maintained_sum"]
        for r in x33_cdc_aggregate_maintenance(spark, sf_dir).collect()
    }
    assert set(latest) == set(batch)
    for k, v in batch.items():
        assert abs(latest[k] - v) < 1e-3, (k, latest[k], v)


def test_scd2_incremental_equals_full_recompute(spark, sf_dir):
    """Fold the events fixture into an SCD2 table in 4 chronological
    chunks via scd2_apply_increment; the result must equal the one-shot
    x59 build row-for-row (the incremental maintenance <-> full recompute
    equivalence that makes the operator trustworthy as a CDC sink)."""
    from pyspark.sql import functions as F

    from kafka_connect_spark.catalog import load
    from kafka_connect_spark.queries import QUERIES
    from kafka_connect_spark.queries.cdc import scd2_apply_increment

    ev = load(spark, sf_dir, "events").select(
        "user_id", "ts", "event_type", "event_id"
    )
    # chronological chunks split on ts quantiles
    cuts = ev.selectExpr(
        "percentile(unix_micros(ts), array(0.25, 0.5, 0.75)) AS c"
    ).collect()[0]["c"]
    chunks = []
    lo = None
    for hi in [*cuts, None]:
        cond = F.lit(True)
        if lo is not None:
            cond = cond & (F.unix_micros("ts") > lo)
        if hi is not None:
            cond = cond & (F.unix_micros("ts") <= hi)
        chunks.append(ev.filter(cond))
        lo = hi
    schema = (
        "user_id long, version long, event_type string, "
        "effective_from timestamp, effective_to timestamp, is_current boolean"
    )
    table = spark.createDataFrame([], schema)
    for ch in chunks:
        table = scd2_apply_increment(table, ch)
        table = spark.createDataFrame(  # materialize like a real sink would
            table.collect(), table.schema
        )
    got = table.orderBy("user_id", "version").toPandas()
    want = (
        QUERIES["x59_scd2_history"](spark, sf_dir)
        .orderBy("user_id", "version")
        .toPandas()
    )
    assert len(got) == len(want)
    import pandas as pd

    pd.testing.assert_frame_equal(
        got.reset_index(drop=True), want.reset_index(drop=True), check_dtype=False
    )


def test_scd2_sink_spec_end_to_end(spark, sf_dir, tmp_path):
    """Spec-driven SCD2: incremental source in timestamp mode pages the
    change stream in chronological chunks into the scd2_parquet sink; the
    folded history equals the one-shot x59 build. Also exercises the
    crash-safe versioned storage (pointer flips per poll)."""
    from kafka_connect_spark.plans import Pipeline
    from kafka_connect_spark.queries import QUERIES

    spec = {
        "name": "scd2-history",
        "source": {
            "type": "incremental",
            "path": f"{sf_dir}/events.parquet",
            "offset.column": "ts",
            "mode": "timestamp",
            "batch.max.rows": 700,
            "state.dir": str(tmp_path / "state"),
        },
        "sink": {"type": "scd2_parquet", "path": str(tmp_path / "dim")},
    }
    p = Pipeline(spec)
    polls = 0
    while p.run(spark) > 0:
        polls += 1
        p = Pipeline(spec)  # fresh pipeline per poll, like the herder
    assert polls >= 2  # actually paged, not one big chunk
    got = (
        spark.read.parquet(str(tmp_path / "dim"))
        .orderBy("user_id", "version")
        .toPandas()
    )
    want = (
        QUERIES["x59_scd2_history"](spark, sf_dir)
        .orderBy("user_id", "version")
        .toPandas()
    )
    import pandas as pd

    pd.testing.assert_frame_equal(
        got.reset_index(drop=True), want.reset_index(drop=True), check_dtype=False
    )


def test_x166_product_rule_equals_direct(spark, sf_dir):
    """The bilinear join-maintenance rule d(ab) = da*b + a*db + da*db,
    folded over 3 microbatches of the CDC envelope, must land on exactly
    the direct evaluation (x166) — per user, for both side counts and the
    maintained join cardinality. This is the incremental path the x166
    docstring claims; the batch registry query is its fixpoint."""
    from pyspark.sql import functions as F

    from kafka_connect_spark.queries.cdc import cdc_envelope, x166_cdc_join_maintenance

    env = cdc_envelope(spark, sf_dir)
    etype = F.coalesce(F.col("after.event_type"), F.col("before.event_type"))
    key = F.coalesce(F.col("after.user_id"), F.col("before.user_id"))
    eid = F.coalesce(F.col("after.event_id"), F.col("before.event_id"))
    live = (
        F.when(F.col("op") == "d", F.lit(-1))
        .when(F.col("op") == "u", F.lit(0))
        .otherwise(F.lit(1))
    )
    deltas = (
        env.filter(etype.isin("click", "view"))
        .select(
            key.alias("user_id"),
            (eid % 3).alias("batch"),
            F.when(etype == "click", live).otherwise(F.lit(0)).alias("da"),
            F.when(etype == "view", live).otherwise(F.lit(0)).alias("db"),
        )
        .groupBy("batch", "user_id")
        .agg(F.sum("da").alias("da"), F.sum("db").alias("db"))
        .toPandas()
    )
    a: dict[int, int] = {}
    b: dict[int, int] = {}
    ab: dict[int, int] = {}
    for batch in sorted(deltas["batch"].unique()):
        for _, r in deltas[deltas["batch"] == batch].iterrows():
            u, da, db = int(r["user_id"]), int(r["da"]), int(r["db"])
            ao, bo = a.get(u, 0), b.get(u, 0)
            ab[u] = ab.get(u, 0) + da * bo + ao * db + da * db  # product rule
            a[u] = ao + da
            b[u] = bo + db
    want = x166_cdc_join_maintenance(spark, sf_dir).toPandas()
    assert len(want) == len(ab)
    for _, r in want.iterrows():
        u = int(r["user_id"])
        assert a.get(u, 0) == r["clicks_live"], u
        assert b.get(u, 0) == r["views_live"], u
        assert ab.get(u, 0) == r["join_rows"], u
