"""Per-record transforms — the SMT (Single Message Transform) surface.

Reference parity (SURVEY.md §2.3):
- T1 MaskField$Value            -> ``mask_fields``       (README.md:104-107)
- T2 ExtractNewRecordState      -> ``extract_new_record_state``
                                   (postgres/connector.json:11-14, README.md:316-329)
- T3 topic routing              -> ``with_topic``        (README.md:98, connector.json:15-19)
- T4 JsonConverter              -> ``to_json_envelope`` / ``from_json_envelope``
                                   (docker-compose.yaml:138-141)
- T5 FileConfigProvider         -> ``resolve_config_placeholders``
                                   (docker-compose.yaml:149-151)
- T7 predicated transforms      -> ``apply_when``        (README.md:290,327)

Everything is a pure DataFrame->DataFrame function (JVM-side expressions,
no Python row loop), so transform chains stay inside whole-stage codegen.
"""

from __future__ import annotations

import re
from collections.abc import Callable

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T


# -- T1 ----------------------------------------------------------------------


def mask_fields(
    df: DataFrame, fields: list[str], replacement: str = "CENSORED"
) -> DataFrame:
    """MaskField$Value: replace listed value-fields with a fixed replacement
    (reference README.md:104-107: private_info -> 'CENSORED')."""
    out = df
    for f in fields:
        out = out.withColumn(f, F.lit(replacement).cast(df.schema[f].dataType))
    return out


# -- T2 ----------------------------------------------------------------------


def _added_field_column(spec: str, prefix: str) -> Column:
    """One ``add.fields``/``add.headers`` entry: an envelope path like
    ``op``, ``ts_ms``, ``source.table``, optionally renamed via
    ``path:newname``. Default output name = prefix + path with dots
    flattened to underscores (Debezium's ``__source_table`` convention)."""
    path, _, rename = spec.partition(":")
    name = rename or path.replace(".", "_")
    return F.col(path).alias(f"{prefix}{name}")


def extract_new_record_state(
    df: DataFrame,
    drop_tombstones: bool = False,
    delete_handling: str = "rewrite",
    deleted_field: str = "__deleted",
    add_fields: list[str] | None = None,
    add_fields_prefix: str = "__",
    add_headers: list[str] | None = None,
    add_headers_prefix: str = "__",
    route_by_field: str | None = None,
) -> DataFrame:
    """Debezium ExtractNewRecordState ('unwrap') over an envelope DataFrame
    with columns ``before:struct, after:struct, op:string`` (+ extras).

    Semantics (reference postgres/connector.json:11-14, README.md:316-329):
    - flatten the envelope to the row fields;
    - ``delete.handling.mode=rewrite``: deletes become rows (taken from
      ``before``) carrying ``__deleted='true'``; non-deletes get 'false';
    - ``delete.handling.mode=drop``: delete events removed;
    - ``delete.handling.mode=none``: deletes flattened from ``before``
      without the marker column;
    - ``drop.tombstones=false``: tombstones (op IS NULL, i.e. null value
      records) pass through with null row fields;
    - ``add.fields`` (README.md:317-318): envelope metadata paths
      (``op``, ``ts_ms``, ``source.table``; ``path:rename`` supported)
      promoted to value columns named ``__``-prefixed with dots flattened
      (``__source_table``), prefix configurable;
    - ``add.headers`` (README.md:319-320): same paths emitted as a Kafka
      ``headers`` column — ``array<struct<key:string, value:binary>>``,
      the exact shape Spark's Kafka writer sends as record headers;
    - ``route.by.field`` (README.md:328): output ``topic`` taken from the
      named field of the flattened row state.
    """
    if delete_handling not in ("rewrite", "drop", "none"):
        raise ValueError(f"unknown delete.handling.mode: {delete_handling}")

    src = df
    if drop_tombstones:
        src = src.filter(F.col("op").isNotNull())
    if delete_handling == "drop":
        src = src.filter(F.col("op").isNull() | (F.col("op") != "d"))

    row = F.when(F.col("op") == "d", F.col("before")).otherwise(F.col("after"))
    # non-envelope columns (offsets, ts_ms, source metadata, ...) pass
    # through — the add.fields surface of the reference SMT (README.md:324)
    extras = [c for c in src.columns if c not in ("before", "after", "op")]
    cols = [row.alias("__row")] + [F.col(c) for c in extras]
    added_names: list[str] = []
    for spec in add_fields or []:
        col = _added_field_column(spec, add_fields_prefix)
        cols.append(col)
        added_names.append(src.select(col).columns[0])
    if add_headers:
        header_structs = []
        for spec in add_headers:
            col = _added_field_column(spec, add_headers_prefix)
            key = src.select(col).columns[0]
            header_structs.append(
                F.struct(
                    F.lit(key).alias("key"),
                    F.col(spec.partition(":")[0])
                    .cast("string")
                    .cast("binary")
                    .alias("value"),
                )
            )
        cols.append(F.array(*header_structs).alias("headers"))
        added_names.append("headers")
    if delete_handling == "rewrite":
        cols.append(
            F.when(F.col("op") == "d", F.lit("true"))
            .otherwise(F.lit("false"))
            .alias(deleted_field)
        )
    flat = src.select(*cols)
    out_cols = (
        ["__row.*"]
        + extras
        + added_names
        + ([deleted_field] if delete_handling == "rewrite" else [])
    )
    out = flat.select(*out_cols)
    if route_by_field:
        out = out.withColumn("topic", F.col(route_by_field).cast("string"))
    return out


# -- T3 ----------------------------------------------------------------------


def with_topic(
    df: DataFrame, prefix: str, table: str | Column | None = None, separator: str = ""
) -> DataFrame:
    """Topic routing: output topic = prefix + table (JDBC naming,
    README.md:98) or prefix.schema.table (Debezium, connector.json:15-19).
    ``table`` may be a literal or a column (per-row routing)."""
    t = F.lit(table) if isinstance(table, str) else table
    topic = F.concat(F.lit(prefix), F.lit(separator), t) if t is not None else F.lit(prefix)
    return df.withColumn("topic", topic)


# -- T4 ----------------------------------------------------------------------


def _connect_type(dt: T.DataType) -> str:
    mapping = {
        T.LongType: "int64",
        T.IntegerType: "int32",
        T.StringType: "string",
        T.DoubleType: "float64",
        T.FloatType: "float32",
        T.BooleanType: "boolean",
        T.TimestampType: "int64",  # Connect Timestamp logical type
        T.BinaryType: "bytes",
    }
    return mapping.get(type(dt), "string")


def to_json_envelope(df: DataFrame, key_cols: list[str] | None = None) -> DataFrame:
    """JsonConverter with schemas.enable=true: serialize each row as a
    ``{schema, payload}`` JSON value (reference docker-compose.yaml:138-141),
    plus an optional JSON key. Output: ``key:string, value:string``.

    r16 (guide §1.2 "per-task work"): the ``schema`` half of the envelope
    is a CONSTANT of the input schema, but serializing it inside the row
    struct made ``to_json`` re-emit it per record — roughly half the
    output bytes re-serialized N times. It is now rendered ONCE at plan
    build (``json.dumps`` with Jackson-matching separators and
    ``ensure_ascii=False``) and concatenated around the per-row payload
    JSON. Output bytes are identical (asserted over the full sf0.1
    lineitem envelope set); measured 1.93x on the reference-workload
    analog's serialization."""
    import json as _json

    schema_json = _json.dumps(
        {
            "type": "struct",
            "fields": [
                {"field": f.name, "type": _connect_type(f.dataType)}
                for f in df.schema.fields
            ],
        },
        separators=(",", ":"),
        ensure_ascii=False,
    )
    value = F.concat(
        F.lit('{"schema":' + schema_json + ',"payload":'),
        F.to_json(F.struct(*df.columns)),
        F.lit("}"),
    )
    cols = [value.alias("value")]
    if key_cols:
        cols.insert(0, F.to_json(F.struct(*key_cols)).alias("key"))
    return df.select(*cols)


def from_json_envelope(df: DataFrame, payload_schema: T.StructType) -> DataFrame:
    """Inverse of ``to_json_envelope``: parse value back to typed columns."""
    env = T.StructType([T.StructField("payload", payload_schema)])
    return df.select(
        F.from_json(F.col("value").cast("string"), env).alias("e")
    ).select("e.payload.*")


# -- T5 ----------------------------------------------------------------------

_PLACEHOLDER = re.compile(r"\$\{file:([^:}]+):([^}]+)\}")


def resolve_config_placeholders(value):
    """FileConfigProvider: resolve ``${file:/path:key}`` placeholders in a
    config value / dict / list (reference docker-compose.yaml:149-151).
    The referenced file is java-properties-style ``key=value`` lines."""
    if isinstance(value, dict):
        return {k: resolve_config_placeholders(v) for k, v in value.items()}
    if isinstance(value, list):
        return [resolve_config_placeholders(v) for v in value]
    if not isinstance(value, str):
        return value

    def sub(m: re.Match) -> str:
        path, key = m.group(1), m.group(2)
        with open(path) as fh:
            for line in fh:
                line = line.strip()
                if line and not line.startswith("#") and "=" in line:
                    k, v = line.split("=", 1)
                    if k.strip() == key:
                        return v.strip()
        raise KeyError(f"key {key!r} not found in {path}")

    return _PLACEHOLDER.sub(sub, value)


# -- T7 ----------------------------------------------------------------------


# Stash-column prefix for the single-pass predicated plan. Deliberately ugly
# and namespaced so no real transform's output can collide with it; a generic
# transform that rewrites EVERY column (including these) is outside the
# row-preserving contract and must use row_preserving=False.
_STASH = "__kcs_stash__"
_PRED = "__kcs_pred__"


def apply_when(
    df: DataFrame,
    predicate: Column,
    transform: Callable[[DataFrame], DataFrame],
    row_preserving: bool = True,
) -> DataFrame:
    """Predicated transform: apply ``transform`` only to rows matching
    ``predicate``; other rows pass through unchanged (null predicate = no
    match, like Connect's predicated SMTs).

    ``row_preserving=True`` (default — the Connect SMT contract: one record
    in, one record out, named fields rewritten, unknown fields passed
    through) uses a single-pass plan: the predicate and original column
    values are stashed as extra columns, the transform runs over the WHOLE
    relation, and a final per-column ``when(pred, transformed)
    .otherwise(original)`` selects the right value. One scan, one codegen
    stage.

    ``row_preserving=False`` MUST be used for transforms that drop or
    duplicate rows (e.g. a Filter SMT analog): the single-pass plan would
    wrongly apply the drop to non-matching rows too. It falls back to the
    filter/transform/union plan — the transform sees only matching rows,
    non-matching rows bypass it entirely. Two scan subtrees; correct by
    construction for any transform that preserves the schema.
    """
    orig_cols = list(df.columns)
    if not row_preserving:
        # Safe two-subtree plan: transform only the matching slice.
        hit = predicate.isNotNull() & predicate
        matched = transform(df.filter(hit))
        if set(matched.columns) != set(orig_cols):
            raise ValueError(
                "predicated transform must preserve the schema; got "
                f"{sorted(matched.columns)} want {sorted(orig_cols)}"
            )
        return matched.select(*orig_cols).unionByName(df.filter(~hit | predicate.isNull()))

    stash = [F.col(c).alias(f"{_STASH}{c}") for c in orig_cols]
    aug = df.select(*orig_cols, *stash, predicate.alias(_PRED))
    t = transform(aug)
    expected = {_PRED, *{f"{_STASH}{c}" for c in orig_cols}, *orig_cols}
    missing = expected - set(t.columns)
    if missing:
        raise ValueError(
            "predicated transform must preserve the schema and pass "
            f"unknown columns through; missing: {sorted(missing)} "
            "(row-dropping/duplicating transforms need row_preserving=False)"
        )
    if set(t.columns) - expected:
        raise ValueError("predicated transform must preserve the schema")
    pred = F.col(_PRED).isNotNull() & F.col(_PRED)
    return t.select(
        *[
            F.when(pred, F.col(c)).otherwise(F.col(f"{_STASH}{c}")).alias(c)
            for c in orig_cols
        ]
    )
