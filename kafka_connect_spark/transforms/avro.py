"""Avro value converter + schema-registry analog (reference
docker-compose.yaml:63-75,144: AvroConverter with
``value.converter.schema.registry.url``).

Three pieces, mirroring the Connect converter stack:

- ``FileSchemaRegistry`` — the Schema Registry analog: subjects hold
  versioned Avro record schemas, each assigned a global integer id;
  persisted as JSON files (atomic write-then-rename) so any executor on a
  shared filesystem resolves ids. Registering an identical schema is
  idempotent (same id back), like the real registry.
- ``to_avro_envelope`` — serialize rows to the Confluent wire format:
  ``0x00 magic + 4-byte big-endian schema id + Avro binary body``
  (the public wire format every Kafka Avro consumer speaks).
- ``from_avro_envelope`` — decode using the WRITER schema embedded in each
  record's id, then project onto the reader schema: added columns read as
  null for old data, dropped writer fields are ignored — standard Avro
  schema evolution, tested in tests/test_avro.py.

The Avro binary codec here is a minimal pure-Python implementation of the
public Avro 1.x binary encoding (zigzag varints, little-endian IEEE
floats, length-prefixed utf8) covering records of primitive /
nullable-primitive fields — exactly the shape Connect's flat envelopes
use. It runs inside Arrow-batched UDFs; encoding is inherently row-wise,
so this is the deliberate Python slow path (a JVM deployment would drop
in the spark-avro package's ``to_avro``/``from_avro`` with the same
envelope layout — this module exists so the engine has a complete,
dependency-free converter surface)."""

from __future__ import annotations

import json
import logging
import os
import struct as _struct

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

_log = logging.getLogger(__name__)

# -- schema registry analog ---------------------------------------------------


class FileSchemaRegistry:
    """Subject -> versioned Avro schemas with global ids, file-backed."""

    def __init__(self, path: str) -> None:
        self.path = path
        os.makedirs(path, exist_ok=True)

    def _entries(self) -> list[dict]:
        out = []
        for f in os.listdir(self.path):
            if f.endswith(".json") and f[:-5].isdigit():
                with open(os.path.join(self.path, f)) as fh:
                    out.append(json.load(fh))
        return sorted(out, key=lambda e: e["id"])

    def register(self, subject: str, schema: dict) -> int:
        """Assign (or find) the id of ``schema`` under ``subject``."""
        canon = json.dumps(schema, sort_keys=True)
        entries = self._entries()
        for e in entries:
            if e["subject"] == subject and json.dumps(e["schema"], sort_keys=True) == canon:
                return e["id"]
        sid = (entries[-1]["id"] + 1) if entries else 1
        # Claim the id file exclusively so two concurrent registrations
        # (pipelines sharing one registry path) can never both take the same
        # id — a last-wins os.replace would silently discard one schema and
        # later decode those records with the wrong writer schema. The
        # claim is a hard link of a fully-written temp file: link() fails
        # with FileExistsError if the id is taken (retry with the next id),
        # and the final name appears atomically with complete content, so
        # concurrent readers never observe a half-written entry.
        tmp = os.path.join(self.path, f".claim-{os.getpid()}-{id(self)}.tmp")
        try:
            while True:
                entries = self._entries()
                for e in entries:
                    # re-run the duplicate scan every attempt: a concurrent
                    # identical registration may have landed since the last
                    # read — return its id instead of minting a second one
                    if (
                        e["subject"] == subject
                        and json.dumps(e["schema"], sort_keys=True) == canon
                    ):
                        return e["id"]
                if entries:
                    sid = max(sid, entries[-1]["id"] + 1)
                version = 1 + sum(1 for e in entries if e["subject"] == subject)
                rec = {"id": sid, "subject": subject, "version": version, "schema": schema}
                with open(tmp, "w") as fh:
                    json.dump(rec, fh)
                try:
                    os.link(tmp, os.path.join(self.path, f"{sid}.json"))
                except FileExistsError:
                    sid += 1
                    continue
                # Claim won. Ids are claimed contiguously upward, so every
                # entry with id < sid is now immutable — but one may have
                # LINKED between our version read and our link (a writer
                # finishing on a lower id). Recompute the version against
                # the final smaller-id set and rewrite our entry if stale,
                # so (subject, version) pairs stay unique.
                smaller = [e for e in self._entries() if e["id"] < sid]
                true_version = 1 + sum(1 for e in smaller if e["subject"] == subject)
                if true_version != version:
                    rec["version"] = true_version
                    fix = tmp + ".fix"
                    with open(fix, "w") as fh:
                        json.dump(rec, fh)
                    os.replace(fix, os.path.join(self.path, f"{sid}.json"))
                for e in smaller:
                    # concurrent identical registration that won a lower id:
                    # report the canonical (smaller) id
                    if (
                        e["subject"] == subject
                        and json.dumps(e["schema"], sort_keys=True) == canon
                    ):
                        return e["id"]
                return sid
        finally:
            if os.path.exists(tmp):
                os.unlink(tmp)

    def by_id(self, sid: int) -> dict:
        with open(os.path.join(self.path, f"{sid}.json")) as fh:
            return json.load(fh)["schema"]

    def latest(self, subject: str) -> tuple[int, dict]:
        subj = [e for e in self._entries() if e["subject"] == subject]
        if not subj:
            raise KeyError(f"subject {subject!r} not registered")
        return subj[-1]["id"], subj[-1]["schema"]


# -- Spark schema <-> Avro schema --------------------------------------------

_SPARK_TO_AVRO = {
    T.LongType: "long",
    T.IntegerType: "int",
    T.ShortType: "int",
    T.DoubleType: "double",
    T.FloatType: "float",
    T.StringType: "string",
    T.BooleanType: "boolean",
    T.BinaryType: "bytes",
}

_AVRO_TO_SPARK = {
    "long": T.LongType(),
    "int": T.IntegerType(),
    "double": T.DoubleType(),
    "float": T.FloatType(),
    "string": T.StringType(),
    "boolean": T.BooleanType(),
    "bytes": T.BinaryType(),
}


def avro_schema_of(schema: T.StructType, name: str = "Envelope") -> dict:
    """Derive the Avro record schema for a Spark schema. Every field is a
    nullable union (matching Spark column nullability); StructType fields
    recurse into nested records (the shape Debezium envelopes need)."""
    fields = []
    for f in schema.fields:
        if isinstance(f.dataType, T.StructType):
            t: object = avro_schema_of(f.dataType, name=f"{name}_{f.name}")
        elif isinstance(f.dataType, T.TimestampType):
            t = {"type": "long", "logicalType": "timestamp-micros"}
        else:
            base = _SPARK_TO_AVRO.get(type(f.dataType))
            if base is None:
                raise ValueError(f"no Avro mapping for {f.dataType.simpleString()}")
            t = base
        fields.append({"name": f.name, "type": ["null", t], "default": None})
    return {"type": "record", "name": name, "fields": fields}


def spark_schema_of(avro: dict) -> T.StructType:
    """Inverse of ``avro_schema_of`` (reader-schema construction)."""
    out = []
    for f in avro["fields"]:
        t = f["type"]
        if isinstance(t, list):  # ["null", X]
            t = next(x for x in t if x != "null")
        if isinstance(t, dict):
            if t.get("type") == "record":
                dt: T.DataType = spark_schema_of(t)
            elif t.get("logicalType") == "timestamp-micros":
                dt = T.TimestampType()
            else:
                dt = _AVRO_TO_SPARK[t["type"]]
        else:
            dt = _AVRO_TO_SPARK[t]
        out.append(T.StructField(f["name"], dt, True))
    return T.StructType(out)


# -- minimal Avro binary codec (public Avro 1.x spec) -------------------------


def _write_varint(buf: bytearray, n: int) -> None:
    n = (n << 1) ^ (n >> 63)  # zigzag
    while True:
        b = n & 0x7F
        n >>= 7
        if n:
            buf.append(b | 0x80)
        else:
            buf.append(b)
            return


def _read_varint(data: bytes, pos: int) -> tuple[int, int]:
    acc = shift = 0
    while True:
        b = data[pos]
        pos += 1
        acc |= (b & 0x7F) << shift
        if not (b & 0x80):
            break
        shift += 7
    return (acc >> 1) ^ -(acc & 1), pos


def _base_type(t):
    """Unwrap the ["null", X] union; keep record dicts whole."""
    if isinstance(t, list):
        t = next(x for x in t if x != "null")
    if isinstance(t, dict):
        if t.get("type") == "record":
            return t
        if t.get("logicalType") == "timestamp-micros":
            return "timestamp-micros"
        return t["type"]
    return t


def _encoder_of(avro: dict):
    """Returns encode(row_dict) -> bytes for a record of nullable fields;
    nested records (dict values) recurse."""
    fields = [(f["name"], _base_type(f["type"])) for f in avro["fields"]]
    nested = {
        name: _encoder_of(t) for name, t in fields if isinstance(t, dict)
    }

    def encode(row: dict) -> bytes:
        buf = bytearray()
        for name, t in fields:
            v = row.get(name) if row is not None else None
            is_nan = isinstance(v, float) and v != v
            if v is None or (is_nan and t not in ("double", "float")):
                _write_varint(buf, 0)  # union branch: null (or pandas NaN)
                continue
            _write_varint(buf, 1)  # union branch: value
            if isinstance(t, dict):
                body = nested[name](dict(v) if not isinstance(v, dict) else v)
                buf += body
            elif t in ("long", "int"):
                _write_varint(buf, int(v))
            elif t == "timestamp-micros":
                _write_varint(buf, int(pd.Timestamp(v).value // 1000))
            elif t == "double":
                buf += _struct.pack("<d", float(v))
            elif t == "float":
                buf += _struct.pack("<f", float(v))
            elif t == "string":
                raw = str(v).encode("utf-8")
                _write_varint(buf, len(raw))
                buf += raw
            elif t == "bytes":
                raw = bytes(v)
                _write_varint(buf, len(raw))
                buf += raw
            elif t == "boolean":
                buf.append(1 if v else 0)
            else:
                raise ValueError(f"unsupported Avro type {t!r}")
        return bytes(buf)

    return encode


def _decoder_of(avro: dict):
    """Returns decode(body, pos=0) -> dict keyed by the WRITER field names;
    nested records decode to dicts."""
    fields = [(f["name"], _base_type(f["type"])) for f in avro["fields"]]
    nested = {
        name: _decoder_of(t) for name, t in fields if isinstance(t, dict)
    }

    def _decode_at(data: bytes, pos: int) -> tuple[dict, int]:
        out: dict = {}
        for name, t in fields:
            branch, pos = _read_varint(data, pos)
            if branch == 0:
                out[name] = None
                continue
            if isinstance(t, dict):
                out[name], pos = nested[name].at(data, pos)
            elif t in ("long", "int"):
                out[name], pos = _read_varint(data, pos)
            elif t == "timestamp-micros":
                micros, pos = _read_varint(data, pos)
                out[name] = pd.Timestamp(micros * 1000)
            elif t == "double":
                out[name] = _struct.unpack_from("<d", data, pos)[0]
                pos += 8
            elif t == "float":
                out[name] = _struct.unpack_from("<f", data, pos)[0]
                pos += 4
            elif t == "string":
                ln, pos = _read_varint(data, pos)
                out[name] = data[pos : pos + ln].decode("utf-8")
                pos += ln
            elif t == "bytes":
                ln, pos = _read_varint(data, pos)
                out[name] = data[pos : pos + ln]
                pos += ln
            elif t == "boolean":
                out[name] = data[pos] == 1
                pos += 1
            else:
                raise ValueError(f"unsupported Avro type {t!r}")
        return out, pos

    def decode(data: bytes, pos: int = 0) -> dict:
        out, _ = _decode_at(data, pos)
        return out

    decode.at = _decode_at
    return decode


# -- the converter pair -------------------------------------------------------

_MAGIC = b"\x00"

# Per-session cache of the JVM avro probe (keyed by the JVM session id so a
# restarted session re-probes).
_jvm_avro_cache: dict[str, bool] = {}


def jvm_avro_available(spark) -> bool:
    """True when the spark-avro datasource module is loaded in the JVM, so
    ``to_avro``/``from_avro`` run as native expressions. The default Spark
    distribution (and this sandbox) ships only the Avro core jars, not the
    datasource — the probe analyzes a trivial plan and caches the answer."""
    key = spark.sparkContext.applicationId
    hit = _jvm_avro_cache.get(key)
    if hit is not None:
        return hit
    try:
        from pyspark.sql.avro.functions import to_avro as _jvm_to_avro

        _ = spark.range(1).select(_jvm_to_avro(F.struct("id"))).schema
        ok = True
    except Exception:  # noqa: BLE001 - any analysis failure = not loaded
        ok = False
    _jvm_avro_cache[key] = ok
    return ok


def to_avro_envelope(
    df: DataFrame,
    registry,  # FileSchemaRegistry | RestSchemaRegistry (duck-typed)
    subject: str,
    key_cols: list[str] | None = None,
) -> DataFrame:
    """AvroConverter with schemas.enable: register the schema, serialize
    each row as magic + schema-id + Avro binary. Output:
    ``key:string?, value:binary``.

    Encode path selection (logged once per call): when the spark-avro
    module is loaded, the body is produced by the JVM ``to_avro``
    expression against OUR registered writer schema (same bytes, no Python
    in the hot path — whole-stage codegen end to end); otherwise the
    pure-Python Arrow-batched codec runs (the sandbox fallback)."""
    avro = avro_schema_of(df.schema)
    sid = registry.register(subject, avro)
    prefix = _MAGIC + sid.to_bytes(4, "big")
    cols = list(df.columns)

    spark = df.sparkSession
    if jvm_avro_available(spark):
        from pyspark.sql.avro.functions import to_avro as _jvm_to_avro

        _log.info("avro encode: JVM to_avro (schema id %d)", sid)
        value = F.concat(
            F.lit(bytearray(prefix)),
            _jvm_to_avro(F.struct(*cols), json.dumps(avro)),
        )
    else:
        _log.info("avro encode: pure-Python codec (schema id %d)", sid)
        encode = _encoder_of(avro)

        @F.pandas_udf("binary")
        def enc(batch: pd.DataFrame) -> pd.Series:
            return pd.Series(
                [prefix + encode(rec) for rec in batch.to_dict(orient="records")]
            )

        value = enc(F.struct(*cols))

    out = [value.alias("value")]
    if key_cols:
        out.insert(0, F.to_json(F.struct(*key_cols)).alias("key"))
    return df.select(*out)


def from_avro_envelope(
    df: DataFrame,
    registry,  # FileSchemaRegistry | RestSchemaRegistry (duck-typed)
    reader_schema: T.StructType | dict | None = None,
    subject: str | None = None,
) -> DataFrame:
    """Decode an Avro envelope column ``value`` back to typed columns.

    Each record decodes with its embedded WRITER schema id; the result is
    projected onto the reader schema (default: the subject's latest):
    fields the writer lacked come back null, writer-only fields drop —
    Avro's evolution contract.

    Decode stays on the Arrow-batched Python codec even when spark-avro is
    loaded: JVM ``from_avro`` takes ONE static schema, but a Confluent
    envelope stream carries per-record writer ids, so a JVM route would
    need a split-by-id/decode/union plan per distinct schema — worth it
    only for single-schema topics; the registry lookup here is cached per
    (executor, schema id), so Python cost is the codec itself."""
    if reader_schema is None:
        if subject is None:
            raise ValueError("pass reader_schema or subject")
        _, reader_schema = registry.latest(subject)
    if isinstance(reader_schema, dict):
        out_schema = spark_schema_of(reader_schema)
    else:
        out_schema = reader_schema
    names = [f.name for f in out_schema.fields]
    # the registry handle (a path or URL) pickles to executors; writer
    # schemas are fetched once per (executor, schema id), not per row
    reg = registry

    def gen(batches):
        decoders: dict[int, object] = {}
        for pdf in batches:
            rows = []
            for raw in pdf["value"]:
                b = bytes(raw)
                if b[:1] != _MAGIC:
                    raise ValueError("bad envelope: missing magic byte")
                sid = int.from_bytes(b[1:5], "big")
                dec = decoders.get(sid)
                if dec is None:
                    dec = decoders[sid] = _decoder_of(reg.by_id(sid))
                full = dec(b[5:])
                rows.append({n: full.get(n) for n in names})
            yield pd.DataFrame(rows, columns=names)

    return df.select("value").mapInPandas(gen, out_schema)
