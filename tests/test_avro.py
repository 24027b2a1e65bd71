"""Avro converter surface: binary codec correctness, registry semantics,
Spark roundtrip, and schema evolution (old readers decode new data)."""

from __future__ import annotations

import pytest

from kafka_connect_spark.transforms.avro import (
    FileSchemaRegistry,
    _decoder_of,
    _encoder_of,
    avro_schema_of,
    from_avro_envelope,
    spark_schema_of,
    to_avro_envelope,
)


def test_codec_roundtrip_primitives():
    avro = {
        "type": "record",
        "name": "R",
        "fields": [
            {"name": "i", "type": ["null", "long"], "default": None},
            {"name": "d", "type": ["null", "double"], "default": None},
            {"name": "s", "type": ["null", "string"], "default": None},
            {"name": "b", "type": ["null", "boolean"], "default": None},
        ],
    }
    enc, dec = _encoder_of(avro), _decoder_of(avro)
    cases = [
        {"i": 0, "d": 0.0, "s": "", "b": False},
        {"i": -1, "d": -2.5, "s": "héllo ✓", "b": True},
        {"i": 2**62, "d": 1e308, "s": "x" * 1000, "b": None},
        {"i": None, "d": None, "s": None, "b": None},
        {"i": -(2**62), "d": 5e-324, "s": "\n\t", "b": False},
    ]
    for row in cases:
        assert dec(enc(row)) == row


def test_registry_idempotent_and_persistent(tmp_path):
    reg = FileSchemaRegistry(str(tmp_path))
    s1 = {"type": "record", "name": "R", "fields": [{"name": "a", "type": ["null", "long"], "default": None}]}
    s2 = {"type": "record", "name": "R", "fields": [{"name": "a", "type": ["null", "long"], "default": None},
                                                    {"name": "b", "type": ["null", "string"], "default": None}]}
    id1 = reg.register("subj", s1)
    assert reg.register("subj", s1) == id1  # idempotent
    id2 = reg.register("subj", s2)
    assert id2 != id1
    # a fresh instance over the same dir sees everything (file-backed)
    reg2 = FileSchemaRegistry(str(tmp_path))
    assert reg2.by_id(id1) == s1
    assert reg2.latest("subj") == (id2, s2)
    with pytest.raises(KeyError):
        reg2.latest("nope")


@pytest.fixture()
def rest_registry(tmp_path):
    """A RestSchemaRegistry client against a stub Confluent-REST server
    backed by a FileSchemaRegistry."""
    from kafka_connect_spark.transforms.schema_registry import (
        RestSchemaRegistry,
        serve_schema_registry,
    )

    backing = FileSchemaRegistry(str(tmp_path / "rest-backing"))
    server = serve_schema_registry(backing)
    url = f"http://127.0.0.1:{server.server_address[1]}"
    yield RestSchemaRegistry(url)
    server.shutdown()


def _registry_of(kind, tmp_path, rest_registry):
    if kind == "file":
        return FileSchemaRegistry(str(tmp_path / "reg"))
    return rest_registry


def test_rest_registry_confluent_shapes(rest_registry):
    """Client/server speak the public Confluent REST subset: register is
    idempotent, ids resolve globally, latest is per-subject, 404s map to
    KeyError."""
    s1 = {"type": "record", "name": "R",
          "fields": [{"name": "a", "type": ["null", "long"], "default": None}]}
    s2 = {"type": "record", "name": "R",
          "fields": [{"name": "a", "type": ["null", "long"], "default": None},
                     {"name": "b", "type": ["null", "string"], "default": None}]}
    id1 = rest_registry.register("subj", s1)
    assert rest_registry.register("subj", s1) == id1  # idempotent
    id2 = rest_registry.register("subj", s2)
    assert id2 != id1
    assert rest_registry.by_id(id1) == s1
    assert rest_registry.latest("subj") == (id2, s2)
    with pytest.raises(KeyError):
        rest_registry.latest("nope")
    with pytest.raises(KeyError):
        rest_registry.by_id(999)


@pytest.mark.parametrize("kind", ["file", "rest"])
def test_spark_avro_roundtrip(spark, tmp_path, rest_registry, kind):
    reg = _registry_of(kind, tmp_path, rest_registry)
    df = spark.createDataFrame(
        [(1, "a", 1.5, True), (2, None, None, False), (3, "c", -0.25, None)],
        ["id", "name", "score", "flag"],
    )
    env = to_avro_envelope(df, reg, "t-value", key_cols=["id"])
    assert env.columns == ["key", "value"]
    first = env.first()
    assert bytes(first["value"])[:1] == b"\x00"  # wire-format magic
    assert first["key"] == '{"id":1}'
    back = from_avro_envelope(env, reg, subject="t-value")
    got = sorted(back.collect(), key=lambda r: r["id"])
    want = sorted(df.collect(), key=lambda r: r["id"])
    assert [tuple(r) for r in got] == [tuple(r) for r in want]


@pytest.mark.parametrize("kind", ["file", "rest"])
def test_schema_evolution_both_directions(spark, tmp_path, rest_registry, kind):
    reg = _registry_of(kind, tmp_path, rest_registry)
    v1 = spark.createDataFrame([(1, "a")], ["id", "name"])
    v2 = spark.createDataFrame([(2, "b", 9.5)], ["id", "name", "score"])
    env1 = to_avro_envelope(v1, reg, "u-value")
    env2 = to_avro_envelope(v2, reg, "u-value")
    mixed = env1.unionByName(env2)

    # new reader (latest = v2 schema) over old+new data: old rows null-fill
    new_read = {r["id"]: (r["name"], r["score"])
                for r in from_avro_envelope(mixed, reg, subject="u-value").collect()}
    assert new_read == {1: ("a", None), 2: ("b", 9.5)}

    # old reader (v1 schema) over new data: added field is ignored
    reader_v1 = avro_schema_of(v1.schema)
    old_read = {r["id"]: r["name"]
                for r in from_avro_envelope(env2, reg, reader_schema=reader_v1).collect()}
    assert old_read == {2: "b"}


def test_jvm_avro_detection_and_fallback(spark, tmp_path):
    """The sandbox ships no spark-avro module: detection must say so (and
    cache it), and the envelope encoder must take the Python path and
    still produce valid wire-format bytes."""
    from kafka_connect_spark.transforms.avro import jvm_avro_available

    assert jvm_avro_available(spark) is False
    assert jvm_avro_available(spark) is False  # cached second call
    reg = FileSchemaRegistry(str(tmp_path / "reg"))
    df = spark.createDataFrame([(1, "a")], ["id", "name"])
    env = to_avro_envelope(df, reg, "d-value")
    assert bytes(env.first()["value"])[:1] == b"\x00"


def test_spark_schema_of_is_inverse(spark):
    df = spark.createDataFrame([(1, "a", 2.0)], ["id", "name", "score"])
    assert spark_schema_of(avro_schema_of(df.schema)).fieldNames() == df.schema.fieldNames()


def test_nested_record_roundtrip_debezium_shape(spark, tmp_path):
    """Nested records (the Debezium envelope shape: before/after structs)
    encode and decode through the wire format."""
    reg = FileSchemaRegistry(str(tmp_path / "reg"))
    df = spark.createDataFrame(
        [
            (1, (10, "old"), (10, "new"), "u"),
            (2, None, (20, "ins"), "c"),
            (3, (30, "del"), None, "d"),
        ],
        "id bigint, before struct<k:bigint,v:string>, "
        "after struct<k:bigint,v:string>, op string",
    )
    env = to_avro_envelope(df, reg, "cdc-value")
    back = from_avro_envelope(env, reg, subject="cdc-value")
    got = {r["id"]: (r["before"], r["after"], r["op"]) for r in back.collect()}
    want = {r["id"]: (r["before"], r["after"], r["op"]) for r in df.collect()}
    assert got == want


def test_codec_property_roundtrip():
    """Property: decode(encode(row)) == row for arbitrary nullable rows."""
    from hypothesis import given, settings
    from hypothesis import strategies as st

    avro = {
        "type": "record",
        "name": "R",
        "fields": [
            {"name": "i", "type": ["null", "long"], "default": None},
            {"name": "d", "type": ["null", "double"], "default": None},
            {"name": "s", "type": ["null", "string"], "default": None},
            {"name": "b", "type": ["null", "boolean"], "default": None},
            {
                "name": "n",
                "type": ["null", {
                    "type": "record", "name": "N",
                    "fields": [{"name": "x", "type": ["null", "long"], "default": None}],
                }],
                "default": None,
            },
        ],
    }
    enc, dec = _encoder_of(avro), _decoder_of(avro)
    row_st = st.fixed_dictionaries(
        {
            "i": st.none() | st.integers(min_value=-(2**63), max_value=2**63 - 1),
            "d": st.none() | st.floats(allow_nan=False),
            "s": st.none() | st.text(max_size=200),
            "b": st.none() | st.booleans(),
            "n": st.none() | st.fixed_dictionaries({"x": st.none() | st.integers(-(2**31), 2**31)}),
        }
    )

    @settings(max_examples=200, deadline=None)
    @given(row_st)
    def check(row):
        assert dec(enc(row)) == row

    check()


def test_avro_cdc_envelope_composes_with_unwrap(spark, tmp_path):
    """Debezium-over-Avro end to end: nested envelope -> wire format ->
    decode -> ExtractNewRecordState, the reference's converter+SMT chain
    with Avro in place of JSON."""
    from kafka_connect_spark.transforms import extract_new_record_state

    reg = FileSchemaRegistry(str(tmp_path / "reg"))
    cdc = spark.createDataFrame(
        [
            ((10, "old"), (10, "new"), "u", 1000),
            (None, (20, "ins"), "c", 2000),
            ((30, "gone"), None, "d", 3000),
        ],
        "before struct<k:bigint,v:string>, after struct<k:bigint,v:string>, "
        "op string, ts_ms bigint",
    )
    env = to_avro_envelope(cdc, reg, "dbz-value")
    decoded = from_avro_envelope(env, reg, subject="dbz-value")
    out = extract_new_record_state(decoded, delete_handling="rewrite")
    got = {(r["k"]): (r["v"], r["__deleted"]) for r in out.collect()}
    assert got == {10: ("new", "false"), 20: ("ins", "false"), 30: ("gone", "true")}


def test_registry_concurrent_registrations_unique_ids_and_versions(tmp_path):
    """Concurrent registrations under ONE subject must mint unique ids AND
    unique (subject, version) pairs — the post-claim version recompute
    covers a writer that linked a lower id between our version read and
    our link. Identical schemas registered concurrently resolve to one
    canonical id."""
    import threading

    from kafka_connect_spark.transforms.avro import FileSchemaRegistry

    path = str(tmp_path / "reg")
    n_threads, per_thread = 8, 6
    results: dict[int, list[int]] = {}

    def work(t: int) -> None:
        reg = FileSchemaRegistry(path)  # own handle, like separate pipelines
        ids = []
        for i in range(per_thread):
            schema = {
                "type": "record",
                "name": f"R{t}_{i}",
                "fields": [{"name": "x", "type": "long"}],
            }
            ids.append(reg.register("events-value", schema))
        results[t] = ids

    threads = [threading.Thread(target=work, args=(t,)) for t in range(n_threads)]
    for th in threads:
        th.start()
    for th in threads:
        th.join()

    reg = FileSchemaRegistry(path)
    entries = reg._entries()
    assert len(entries) == n_threads * per_thread
    ids = [e["id"] for e in entries]
    assert ids == sorted(ids) and len(set(ids)) == len(ids)
    assert ids == list(range(1, len(ids) + 1))  # contiguous claims
    versions = [e["version"] for e in entries if e["subject"] == "events-value"]
    assert len(set(versions)) == len(versions), "duplicate (subject, version)"

    # identical schema raced from many threads -> exactly one canonical id
    same: list[int] = []
    dup_schema = {"type": "record", "name": "Dup", "fields": []}

    def race_same() -> None:
        same.append(FileSchemaRegistry(path).register("dup-subj", dup_schema))

    threads = [threading.Thread(target=race_same) for _ in range(8)]
    for th in threads:
        th.start()
    for th in threads:
        th.join()
    assert len(set(same)) == 1
