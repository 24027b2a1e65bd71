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


def test_apply_when_predicate(spark):
    df = spark.createDataFrame([(1, "keep"), (2, "mask")], ["id", "v"])
    out = apply_when(df, F.col("id") == 2, lambda d: mask_fields(d, ["v"]))
    got = {r["id"]: r["v"] for r in out.collect()}
    assert got == {1: "keep", 2: "CENSORED"}


def test_config_provider(tmp_path):
    secrets = tmp_path / "creds.properties"
    secrets.write_text("user=admin\npassword=hunter2\n")
    spec = {"connection.user": f"${{file:{secrets}:user}}", "n": 3}
    out = resolve_config_placeholders(spec)
    assert out == {"connection.user": "admin", "n": 3}
