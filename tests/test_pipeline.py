"""Pipeline-spec compiler e2e (SURVEY.md §3.1): config in -> data out,
mirroring the reference's task-1 pipeline (incremental source -> MaskField
-> sink), plus error tolerance/DLQ (T6)."""

from __future__ import annotations

import pytest

from kafka_connect_spark.plans import Pipeline


def test_task1_analog_pipeline(spark, tmp_path, sf_dir):
    """The reference's JDBC-bulk + MaskField + sink exercise as a spec."""
    out = str(tmp_path / "out")
    spec = {
        "name": "jdbc-bulk-users-analog",
        "source": {"type": "parquet", "path": f"{sf_dir}/customer.parquet"},
        "transforms": [
            {"type": "mask_field", "fields": ["c_mktsegment"], "replacement": "CENSORED"}
        ],
        "sink": {"type": "parquet", "path": out, "mode": "overwrite"},
    }
    n = Pipeline(spec).run(spark)
    got = spark.read.parquet(out)
    assert got.count() == n > 0
    assert got.select("c_mktsegment").distinct().collect()[0][0] == "CENSORED"


def test_incremental_pipeline_commits_after_sink(spark, tmp_path):
    data = str(tmp_path / "src")
    out = str(tmp_path / "out")
    spark.createDataFrame([(1, "x"), (2, "y")], ["id", "v"]).write.parquet(data)
    spec = {
        "source": {
            "type": "incremental",
            "path": data,
            "offset.column": "id",
            "state.dir": str(tmp_path / "state"),
        },
        "sink": {"type": "parquet", "path": out},
    }
    p = Pipeline(spec)
    assert p.run(spark) == 2
    assert p.run(spark) == 0  # second poll: caught up
    # backfill arrives
    spark.createDataFrame([(3, "z")], ["id", "v"]).write.mode("append").parquet(data)
    assert Pipeline(spec).run(spark) == 1  # fresh compile resumes from state
    assert spark.read.parquet(out).count() == 3


def test_error_tolerance_all_routes_to_dlq(spark, tmp_path):
    data = str(tmp_path / "src")
    out = str(tmp_path / "out")
    dlq = str(tmp_path / "dlq")
    spark.createDataFrame(
        [(1, 10.0), (2, None), (3, 30.0)], ["id", "amount"]
    ).write.parquet(data)
    spec = {
        "source": {"type": "parquet", "path": data},
        "sink": {"type": "parquet", "path": out},
        "errors": {
            "tolerance": "all",
            "validate.condition": "amount IS NOT NULL",
            "dlq": {"type": "parquet", "path": dlq},
        },
    }
    assert Pipeline(spec).run(spark) == 2
    assert {r["id"] for r in spark.read.parquet(out).collect()} == {1, 3}
    assert {r["id"] for r in spark.read.parquet(dlq).collect()} == {2}


def test_avro_envelope_transform_in_spec(spark, tmp_path):
    """Spec-driven AvroConverter: source rows serialize to the wire format
    inside a pipeline, and decode back losslessly with the registry."""
    from kafka_connect_spark.transforms.avro import FileSchemaRegistry, from_avro_envelope

    data = str(tmp_path / "src")
    out = str(tmp_path / "out")
    reg_path = str(tmp_path / "registry")
    spark.createDataFrame([(1, "a", 1.5), (2, "b", None)], "id bigint, v string, x double").write.parquet(data)
    spec = {
        "source": {"type": "parquet", "path": data},
        "transforms": [
            {
                "type": "avro_envelope",
                "schema.registry.path": reg_path,
                "subject": "t-value",
                "key.fields": ["id"],
            }
        ],
        "sink": {"type": "parquet", "path": out},
    }
    assert Pipeline(spec).run(spark) == 2
    env = spark.read.parquet(out)
    assert set(env.columns) == {"key", "value"}
    back = from_avro_envelope(env, FileSchemaRegistry(reg_path), subject="t-value")
    got = {r["id"]: (r["v"], r["x"]) for r in back.collect()}
    assert got == {1: ("a", 1.5), 2: ("b", None)}


def test_streaming_dlq_splits_each_microbatch(spark, tmp_path):
    """T6 streaming parity: a streaming spec with errors.tolerance=all
    routes invalid rows to the DLQ and valid rows through the transform
    chain, split inside each microbatch via foreachBatch."""
    data = str(tmp_path / "src")
    out = str(tmp_path / "out")
    dlq = str(tmp_path / "dlq")
    spark.createDataFrame(
        [(1, 10.0, "s1"), (2, None, "s2"), (3, 30.0, "s3"), (4, None, "s4")],
        "id bigint, amount double, ssn string",
    ).write.parquet(data)
    spec = {
        "streaming": True,
        "source": {"type": "file_stream", "path": data},
        "transforms": [{"type": "mask_field", "fields": ["ssn"]}],
        "sink": {
            "type": "parquet",
            "path": out,
            "checkpoint": str(tmp_path / "ckpt"),
        },
        "errors": {
            "tolerance": "all",
            "validate.condition": "amount IS NOT NULL",
            "dlq": {"type": "parquet", "path": dlq},
        },
    }
    from kafka_connect_spark.streaming.metrics import MetricsListener, to_exposition

    listener = MetricsListener()
    spark.streams.addListener(listener)
    try:
        q = Pipeline(spec).start_stream(spark, available_now=True)
        q.awaitTermination(120)
    finally:
        spark.streams.removeListener(listener)
    good = {r["id"]: r["ssn"] for r in spark.read.parquet(out).collect()}
    assert good == {1: "CENSORED", 3: "CENSORED"}  # transformed, valid only
    assert {r["id"] for r in spark.read.parquet(dlq).collect()} == {2, 4}

    # DLQ counters surface as OBSERVED metrics on the same progress events
    # (no extra job): Connect's total-record-errors analog, scrapeable
    # through the exposition endpoint.
    by_name: dict[str, float] = {}
    for s in listener.samples:
        by_name[s["name"]] = by_name.get(s["name"], 0.0) + s["value"]
    assert by_name.get("errors_records_dlq") == 2.0
    assert by_name.get("errors_records_read") == 4.0
    text = to_exposition([s for s in listener.samples if s["name"].startswith("errors_")])
    assert "errors_records_dlq" in text


def test_unknown_plugin_fails_fast():
    with pytest.raises(KeyError):
        Pipeline({"source": {"type": "nope"}, "sink": {"type": "noop"}})


def test_config_placeholder_in_spec(spark, tmp_path, sf_dir):
    creds = tmp_path / "c.properties"
    creds.write_text(f"path={sf_dir}/region.parquet\n")
    spec = {
        "source": {"type": "parquet", "path": f"${{file:{creds}:path}}"},
        "sink": {"type": "noop"},
    }
    assert Pipeline(spec).run(spark) == 5  # region has 5 rows at every SF
