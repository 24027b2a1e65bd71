"""Unit tests for the SMT-analog transforms (SURVEY.md §2.3): envelope
unwrap modes incl. tombstones/deletes, masking, predicates, config
provider, JSON envelope roundtrip."""

from __future__ import annotations

import pytest
from pyspark.sql import Row
from pyspark.sql import functions as F
from pyspark.sql import types as T

from kafka_connect_spark.transforms import (
    apply_when,
    extract_new_record_state,
    from_json_envelope,
    mask_fields,
    resolve_config_placeholders,
    to_json_envelope,
    with_topic,
)

ROW_SCHEMA = T.StructType(
    [T.StructField("id", T.LongType()), T.StructField("name", T.StringType())]
)
ENV_SCHEMA = T.StructType(
    [
        T.StructField("before", ROW_SCHEMA),
        T.StructField("after", ROW_SCHEMA),
        T.StructField("op", T.StringType()),
    ]
)


@pytest.fixture()
def envelope(spark):
    rows = [
        Row(before=None, after=Row(id=1, name="a"), op="c"),
        Row(before=Row(id=2, name="old"), after=Row(id=2, name="new"), op="u"),
        Row(before=Row(id=3, name="gone"), after=None, op="d"),
        Row(before=None, after=Row(id=4, name="snap"), op="r"),
        Row(before=None, after=None, op=None),  # tombstone
    ]
    return spark.createDataFrame(rows, ENV_SCHEMA)


def test_unwrap_rewrite_keeps_deletes_and_tombstones(envelope):
    out = extract_new_record_state(envelope, drop_tombstones=False).collect()
    by_id = {r["id"]: r for r in out}
    assert len(out) == 5
    assert by_id[3]["name"] == "gone" and by_id[3]["__deleted"] == "true"
    assert by_id[2]["name"] == "new" and by_id[2]["__deleted"] == "false"
    tombs = [r for r in out if r["id"] is None]
    assert len(tombs) == 1 and tombs[0]["__deleted"] == "false"


def test_unwrap_drop_tombstones_and_deletes(envelope):
    out = extract_new_record_state(
        envelope, drop_tombstones=True, delete_handling="drop"
    ).collect()
    assert sorted(r["id"] for r in out) == [1, 2, 4]
    assert "__deleted" not in out[0].asDict()


def test_unwrap_none_mode(envelope):
    out = extract_new_record_state(
        envelope, drop_tombstones=True, delete_handling="none"
    ).collect()
    by_name = {r["name"] for r in out}
    assert "gone" in by_name  # delete flattened from before, no marker column


def test_mask_fields(spark):
    df = spark.createDataFrame([(1, "secret")], ["id", "private_info"])
    out = mask_fields(df, ["private_info"]).collect()[0]
    assert out["private_info"] == "CENSORED" and out["id"] == 1


def test_mask_preserves_type(spark):
    df = spark.createDataFrame([(1, "x")], ["id", "v"])
    out = mask_fields(df, ["v"], "M")
    assert out.schema["v"].dataType == df.schema["v"].dataType


def test_with_topic_static_and_column(spark):
    df = spark.createDataFrame([(1, "users")], ["id", "tbl"])
    static = with_topic(df, "postgresql-jdbc-bulk-", "users").collect()[0]
    assert static["topic"] == "postgresql-jdbc-bulk-users"
    dynamic = with_topic(df, "cdc.", F.col("tbl")).collect()[0]
    assert dynamic["topic"] == "cdc.users"


def test_json_envelope_roundtrip(spark):
    df = spark.createDataFrame([(1, "a"), (2, "b")], ["id", "name"])
    env = to_json_envelope(df, key_cols=["id"])
    assert env.columns == ["key", "value"]
    first = env.orderBy("key").collect()[0]
    assert '"schema"' in first["value"] and '"payload"' in first["value"]
    back = from_json_envelope(env, df.schema)
    assert sorted((r["id"], r["name"]) for r in back.collect()) == [(1, "a"), (2, "b")]


def test_json_envelope_bytes_match_per_row_serialization(spark):
    """r16: the envelope's constant schema half is rendered once at plan
    build and concat'd around the per-row payload JSON. This pins the
    CONTRACT that made the rewrite safe: the emitted bytes equal the
    r15-era form that serialized the whole {schema, payload} struct
    per row with to_json — across int/string/double/bool/timestamp
    columns, NULLs included."""
    from pyspark.sql import functions as F

    from kafka_connect_spark.transforms import _connect_type

    df = spark.createDataFrame(
        [
            (1, "a", 1.5, True, "2024-01-01 00:00:00"),
            (2, None, None, False, None),
        ],
        ["id", "name", "score", "ok", "ts_s"],
    ).withColumn("ts", F.col("ts_s").cast("timestamp")).drop("ts_s")
    fields = F.array(
        *[
            F.struct(
                F.lit(f.name).alias("field"),
                F.lit(_connect_type(f.dataType)).alias("type"),
            )
            for f in df.schema.fields
        ]
    )
    legacy = df.select(
        F.to_json(F.struct(*["id"])).alias("key"),
        F.to_json(
            F.struct(
                F.struct(
                    F.lit("struct").alias("type"), fields.alias("fields")
                ).alias("schema"),
                F.struct(*df.columns).alias("payload"),
            )
        ).alias("value"),
    )
    new = to_json_envelope(df, key_cols=["id"])
    got = {r["key"]: r["value"] for r in new.collect()}
    want = {r["key"]: r["value"] for r in legacy.collect()}
    assert got == want


def test_apply_when_predicate(spark):
    df = spark.createDataFrame([(1, "keep"), (2, "mask")], ["id", "v"])
    out = apply_when(df, F.col("id") == 2, lambda d: mask_fields(d, ["v"]))
    got = {r["id"]: r["v"] for r in out.collect()}
    assert got == {1: "keep", 2: "CENSORED"}


def test_unwrap_add_fields_headers_route(spark):
    """Debezium unwrap option surface (reference README.md:316-329):
    add.fields promotes envelope metadata as __-prefixed columns (dots
    flattened, rename supported), add.headers emits the Kafka headers
    shape, route.by.field routes the topic from a row field — exercised
    through the spec-level 'unwrap' transform plugin with Connect-style
    comma-joined lists."""
    from pyspark.sql import Row

    from kafka_connect_spark.plans.pipeline import TRANSFORMS

    schema = T.StructType(
        [
            T.StructField("before", ROW_SCHEMA),
            T.StructField("after", ROW_SCHEMA),
            T.StructField("op", T.StringType()),
            T.StructField("ts_ms", T.LongType()),
            T.StructField(
                "source",
                T.StructType([T.StructField("table", T.StringType())]),
            ),
        ]
    )
    env = spark.createDataFrame(
        [
            Row(before=None, after=Row(id=1, name="a"), op="c", ts_ms=111,
                source=Row(table="users")),
            Row(before=Row(id=2, name="gone"), after=None, op="d", ts_ms=222,
                source=Row(table="users")),
        ],
        schema,
    )
    fn = TRANSFORMS["unwrap"](
        {
            "type": "unwrap",
            "add.fields": "op,ts_ms,source.table",
            "add.headers": "op:operation",
            "route.by.field": "name",
        }
    )
    out = {r["id"]: r for r in fn(env).collect()}
    assert out[1]["__op"] == "c" and out[1]["__ts_ms"] == 111
    assert out[1]["__source_table"] == "users"
    assert out[1]["topic"] == "a"
    assert out[2]["__op"] == "d" and out[2]["__deleted"] == "true"
    assert out[2]["topic"] == "gone"  # deletes route by the before-state
    hdr = out[1]["headers"]
    assert len(hdr) == 1 and hdr[0]["key"] == "__operation"
    assert bytes(hdr[0]["value"]) == b"c"


def test_apply_when_row_dropping_transform(spark):
    """A row-dropping transform (Filter SMT analog) under a predicate must
    drop only the MATCHING rows — non-matching rows pass through even when
    they'd fail the inner filter (ADVICE r2: the single-pass plan applied
    the drop globally)."""
    df = spark.createDataFrame(
        [(1, "keep", 0), (2, "evaluated", 0), (3, "evaluated", 99)],
        ["id", "kind", "score"],
    )
    out = apply_when(
        df,
        F.col("kind") == "evaluated",
        lambda d: d.filter(F.col("score") > 50),
        row_preserving=False,
    )
    assert sorted(r["id"] for r in out.collect()) == [1, 3]
    # and the column order survives the union
    assert out.columns == ["id", "kind", "score"]


def test_apply_when_row_preserving_counts(spark):
    """The default single-pass plan is row-preserving by construction:
    same count in, same count out, regardless of predicate selectivity."""
    df = spark.createDataFrame([(i, f"v{i}") for i in range(10)], ["id", "v"])
    out = apply_when(df, F.col("id") % 2 == 0, lambda d: mask_fields(d, ["v"]))
    assert out.count() == 10
    got = {r["id"]: r["v"] for r in out.collect()}
    assert got[2] == "CENSORED" and got[3] == "v3"


def test_pipeline_spec_level_predicate(spark, tmp_path):
    """Connect's transforms.X.predicate + negate as spec fields: the filter
    transform (row-dropping) under a predicate drops only matching rows."""
    from kafka_connect_spark.plans.pipeline import Pipeline

    src = str(tmp_path / "src")
    spark.createDataFrame(
        [(1, "a", 10), (2, "b", 99), (3, "a", 99)], ["id", "grp", "score"]
    ).write.parquet(src)
    sunk = str(tmp_path / "out")
    p = Pipeline(
        {
            "source": {"type": "parquet", "path": src},
            "transforms": [
                {
                    "type": "filter",
                    "condition": "score > 50",
                    "predicate": "grp = 'a'",
                }
            ],
            "sink": {"type": "parquet", "path": sunk},
        }
    )
    p.run(spark)
    got = sorted(r["id"] for r in spark.read.parquet(sunk).collect())
    # id=1: matched (grp a), fails score>50 -> dropped.
    # id=2: unmatched (grp b) -> bypasses the filter, kept.
    # id=3: matched, passes -> kept.
    assert got == [2, 3]


def test_pipeline_spec_level_predicate_negate(spark, tmp_path):
    from kafka_connect_spark.plans.pipeline import Pipeline

    src = str(tmp_path / "srcn")
    spark.createDataFrame([(1, "a"), (2, "b")], ["id", "grp"]).write.parquet(src)
    sunk = str(tmp_path / "outn")
    p = Pipeline(
        {
            "source": {"type": "parquet", "path": src},
            "transforms": [
                {
                    "type": "mask_field",
                    "fields": ["grp"],
                    "predicate": "grp = 'a'",
                    "negate": "true",
                }
            ],
            "sink": {"type": "parquet", "path": sunk},
        }
    )
    p.run(spark)
    got = {r["id"]: r["grp"] for r in spark.read.parquet(sunk).collect()}
    assert got == {1: "a", 2: "CENSORED"}


def test_config_provider(tmp_path):
    secrets = tmp_path / "creds.properties"
    secrets.write_text("user=admin\npassword=hunter2\n")
    spec = {"connection.user": f"${{file:{secrets}:user}}", "n": 3}
    out = resolve_config_placeholders(spec)
    assert out == {"connection.user": "admin", "n": 3}
