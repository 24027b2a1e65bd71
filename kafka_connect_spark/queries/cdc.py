"""CDC / SMT query surface: T1 MaskField, T2 Debezium unwrap, T4 JSON
envelope roundtrip (SURVEY.md §2.3).

The CDC envelope is synthesized deterministically from the ``events``
fixture (FIXTURES.md §1 cdc_event): op = event_id % 4 -> {c,u,d,r};
``before`` carries a negated value so the oracle can prove deletes are
flattened from ``before`` (not ``after``)."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..catalog import load
from ..transforms import extract_new_record_state, mask_fields
from .registry import dround, dround_sql, query


@query(
    "t1_mask_field",
    oracle="""
    SELECT c_custkey, c_name, CAST('CENSORED' AS VARCHAR) AS c_mktsegment
    FROM customer ORDER BY c_custkey
    """,
)
def t1_mask_field(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MaskField$Value SMT (reference README.md:104-107): c_mktsegment plays
    the reference's private_info column (FIXTURES.md §1)."""
    c = load(spark, sf_dir, "customer").select("c_custkey", "c_name", "c_mktsegment")
    return mask_fields(c, ["c_mktsegment"], "CENSORED").orderBy("c_custkey")


def cdc_envelope(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic Debezium-style envelope view over ``events``
    (FIXTURES.md §1 cdc_event). op by event_id % 4 -> [c, u, d, r];
    before present for u/d (value negated), after present for c/u/r."""
    events = load(spark, sf_dir, "events")
    op = F.element_at(F.array(F.lit("c"), F.lit("u"), F.lit("d"), F.lit("r")),
                      (F.col("event_id") % 4 + 1).cast("int"))
    after_row = F.struct("event_id", "user_id", "event_type", "value")
    before_row = F.struct(
        F.col("event_id"),
        F.col("user_id"),
        F.col("event_type"),
        (-F.col("value")).alias("value"),
    )
    return events.select(
        F.when(op.isin("u", "d"), before_row).alias("before"),
        F.when(op != "d", after_row).alias("after"),
        op.alias("op"),
        F.unix_millis(F.col("ts")).alias("ts_ms"),
        F.struct(
            F.lit("fixtures").alias("db"),
            F.lit("public").alias("schema"),
            F.lit("events").alias("table"),
        ).alias("source"),
    )


@query(
    "t2_cdc_unwrap_rewrite",
    oracle="""
    SELECT event_id, user_id, event_type,
           CASE WHEN event_id % 4 = 2 THEN -value ELSE value END AS value,
           CASE WHEN event_id % 4 = 2 THEN 'true' ELSE 'false' END AS __deleted
    FROM events ORDER BY event_id
    """,
)
def t2_cdc_unwrap_rewrite(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ExtractNewRecordState with delete.handling.mode=rewrite
    (reference postgres/connector.json:11-14, README.md:321-329): deletes
    flatten from ``before`` and carry __deleted='true'."""
    env = cdc_envelope(spark, sf_dir).select("before", "after", "op")
    return extract_new_record_state(
        env, drop_tombstones=False, delete_handling="rewrite"
    ).orderBy("event_id")


@query(
    "t2b_cdc_unwrap_drop_deletes",
    oracle="""
    SELECT event_id, user_id, event_type, value
    FROM events WHERE event_id % 4 <> 2 ORDER BY event_id
    """,
)
def t2b_cdc_unwrap_drop_deletes(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ExtractNewRecordState with delete.handling.mode=drop."""
    env = cdc_envelope(spark, sf_dir).select("before", "after", "op")
    return extract_new_record_state(
        env, drop_tombstones=True, delete_handling="drop"
    ).orderBy("event_id")


@query(
    "t2c_unwrap_add_fields_route",
    oracle="""
    SELECT event_id, user_id, event_type,
           CASE WHEN event_id % 4 = 2 THEN -value ELSE value END AS value,
           CASE event_id % 4 WHEN 0 THEN 'c' WHEN 1 THEN 'u' WHEN 2 THEN 'd' ELSE 'r' END AS __op,
           CAST(epoch_ms(ts) AS BIGINT) AS __ts_ms,
           'events' AS __source_table,
           CASE WHEN event_id % 4 = 2 THEN 'true' ELSE 'false' END AS __deleted,
           event_type AS topic
    FROM events ORDER BY event_id
    """,
)
def t2c_unwrap_add_fields_route(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ExtractNewRecordState add.fields + route.by.field (reference
    README.md:316-329): envelope metadata promoted as __-prefixed value
    columns (__op, __ts_ms, __source_table) and the topic routed from a
    field of the flattened row — all single-pass JVM expressions."""
    env = cdc_envelope(spark, sf_dir)
    return (
        extract_new_record_state(
            env,
            drop_tombstones=False,
            delete_handling="rewrite",
            add_fields=["op", "ts_ms", "source.table"],
            route_by_field="event_type",
        )
        .drop("ts_ms", "source")  # raw extras; keep the promoted copies
        .orderBy("event_id")
    )


@query(
    "t4_json_envelope_roundtrip",
    oracle="""
    SELECT event_id, CAST(json_extract_string(props, '$.k') AS INTEGER) AS k,
           event_type
    FROM events ORDER BY event_id
    """,
)
def t4_json_envelope_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    """JsonConverter surface (reference docker-compose.yaml:138-141): typed
    extraction from a JSON payload column."""
    events = load(spark, sf_dir, "events")
    return events.select(
        "event_id",
        F.get_json_object("props", "$.k").cast("int").alias("k"),
        "event_type",
    ).orderBy("event_id")


@query(
    "t4b_avro_envelope_roundtrip",
    oracle="""
    SELECT event_id, event_type, value FROM events ORDER BY event_id
    """,
)
def t4b_avro_envelope_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    """AvroConverter surface (reference docker-compose.yaml:63-75,144):
    serialize rows to the Confluent wire format (magic + schema id + Avro
    binary) against a file-backed schema-registry analog, then decode back
    to typed columns via the registered writer schema. Values round-trip
    bit-exactly (zigzag longs, IEEE doubles, utf8 strings)."""
    import tempfile

    from ..transforms.avro import (
        FileSchemaRegistry,
        from_avro_envelope,
        to_avro_envelope,
    )

    ev = load(spark, sf_dir, "events").select("event_id", "event_type", "value")
    # r16 (guide §2.5/§4): the single-split fixture scan serialized the
    # avro encode and the mapInPandas decode on ONE task (~2.2 CPU-s).
    # The guarded repartition runs AFTER the 3-column projection, so the
    # added shuffle carries narrow rows — the r16 full-events (wide
    # props) variant measured inside noise and was not shipped; this
    # post-select form measured 1.69 -> 1.45s interleaved at sf0.1 with
    # outputs asserted equal. No-op at production split counts.
    target = spark.sparkContext.defaultParallelism
    from ..catalog import _planned_scan_partitions

    if _planned_scan_partitions(spark, f"{sf_dir}/events.parquet") < target:
        ev = ev.repartition(target)
    reg = FileSchemaRegistry(tempfile.mkdtemp(prefix="schema-registry-"))
    env = to_avro_envelope(ev, reg, "events-value")
    return from_avro_envelope(env, reg, subject="events-value").orderBy("event_id")


@query(
    "t7_predicated_transform",
    oracle="""
    SELECT event_id,
           CASE WHEN event_type = 'click' THEN 'CENSORED' ELSE props END AS props,
           event_type
    FROM events ORDER BY event_id
    """,
)
def t7_predicated_transform(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Predicated SMT (reference README.md:290,327): the mask applies only
    to rows matching the predicate; others pass through untouched."""
    from pyspark.sql import functions as F

    from ..transforms import apply_when

    events = load(spark, sf_dir, "events").select("event_id", "props", "event_type")
    out = apply_when(
        events, F.col("event_type") == "click", lambda d: mask_fields(d, ["props"])
    )
    return out.orderBy("event_id")


@query(
    "t3_topic_routing",
    oracle="""
    SELECT event_id, 'postgresql-jdbc-bulk-' || event_type AS topic
    FROM events ORDER BY event_id
    """,
)
def t3_topic_routing(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Topic routing (reference README.md:98: topic = prefix + table);
    per-row routing keyed on event_type as the 'table'."""
    from ..transforms import with_topic

    events = load(spark, sf_dir, "events")
    return with_topic(events, "postgresql-jdbc-bulk-", F.col("event_type")).select(
        "event_id", "topic"
    ).orderBy("event_id")


@query(
    "x31_emit_on_change",
    oracle="""
    WITH g AS (
      SELECT user_id, ts, event_id,
             CAST(FLOOR(value / 100) AS BIGINT) AS gauge
      FROM events
    ),
    d AS (
      SELECT user_id, event_id, gauge,
             lag(gauge) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS pv
      FROM g
    )
    SELECT user_id, event_id, gauge FROM d
    WHERE pv IS NULL OR gauge <> pv
    ORDER BY event_id
    """,
)
def x31_emit_on_change(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CDC compaction ('drop unchanged'): per series, keep a sample only
    when its quantized gauge differs from the previous emitted value —
    the batch twin of streaming.stateful.emit_on_change (equivalence
    asserted in tests/test_stateful_and_stream_specs.py). One per-series
    lag window; FLOOR quantization keeps the comparison integer-exact in
    both engines."""
    ev = load(spark, sf_dir, "events")
    g = ev.select(
        "user_id", "ts", "event_id", F.floor(F.col("value") / 100).alias("gauge")
    )
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    d = g.withColumn("pv", F.lag("gauge").over(w))
    return (
        d.filter(F.col("pv").isNull() | (F.col("gauge") != F.col("pv")))
        .select("user_id", "event_id", "gauge")
        .orderBy("event_id")
    )


_X33_SUM = dround_sql(
    "CAST(SUM(CASE event_id % 4 "
    "WHEN 0 THEN CAST(value AS DECIMAL(38,6)) "
    "WHEN 1 THEN CAST(value AS DECIMAL(38,6)) - CAST(-value AS DECIMAL(38,6)) "
    "WHEN 2 THEN -CAST(-value AS DECIMAL(38,6)) "
    "ELSE CAST(value AS DECIMAL(38,6)) END) AS DOUBLE)", 4
)


@query(
    "x33_cdc_aggregate_maintenance",
    oracle=f"""
    SELECT user_id,
           {_X33_SUM} AS maintained_sum,
           CAST(COUNT(CASE WHEN event_id % 4 IN (0, 3) THEN 1 END) AS BIGINT)
             - CAST(COUNT(CASE WHEN event_id % 4 = 2 THEN 1 END) AS BIGINT)
             AS maintained_count
    FROM events GROUP BY user_id ORDER BY user_id
    """,
)
def x33_cdc_aggregate_maintenance(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Incremental VIEW MAINTENANCE under CDC: keep a per-key SUM/COUNT
    aggregate current by folding each change event's DELTA instead of
    recomputing — insert adds after, update adds (after - before), delete
    subtracts before; counts move by +1/0/-1. This is the algebra that
    maintains a 100 TB materialized aggregate with work proportional to
    the CHANGE stream, not the base table. Decimal accumulation keeps the
    folded total bit-identical to the oracle's direct evaluation."""
    env = cdc_envelope(spark, sf_dir)
    dec = lambda c: c.cast("decimal(38,6)")  # noqa: E731
    delta = (
        F.when(F.col("op") == "c", dec(F.col("after.value")))
        .when(F.col("op") == "u", dec(F.col("after.value")) - dec(F.col("before.value")))
        .when(F.col("op") == "d", -dec(F.col("before.value")))
        .otherwise(dec(F.col("after.value")))
    )
    cnt_delta = (
        F.when(F.col("op") == "c", F.lit(1))
        .when(F.col("op") == "u", F.lit(0))
        .when(F.col("op") == "d", F.lit(-1))
        .otherwise(F.lit(1))
    )
    key = F.coalesce(F.col("after.user_id"), F.col("before.user_id"))
    return (
        env.groupBy(key.alias("user_id"))
        .agg(
            dround(F.sum(delta).cast("double"), 4).alias("maintained_sum"),
            F.sum(cnt_delta).alias("maintained_count"),
        )
        .orderBy("user_id")
    )


@query(
    "x59_scd2_history",
    oracle="""
    WITH ch AS (
      SELECT user_id, ts, event_type,
             lag(event_type) OVER (PARTITION BY user_id ORDER BY ts, event_id)
               AS prev_type,
             event_id
      FROM events),
    changes AS (
      SELECT user_id, ts, event_type, event_id FROM ch
      WHERE prev_type IS NULL OR event_type <> prev_type)
    SELECT user_id,
           CAST(row_number() OVER (PARTITION BY user_id ORDER BY ts, event_id)
                AS BIGINT) AS version,
           event_type, ts AS effective_from,
           lead(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id)
             AS effective_to,
           lead(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id) IS NULL
             AS is_current
    FROM changes ORDER BY user_id, version
    """,
)
def x59_scd2_history(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Slowly-Changing-Dimension Type 2 build from a change stream: collapse
    consecutive duplicate states per key (lag), then derive each surviving
    state's validity interval (effective_from = its ts, effective_to = the
    NEXT state's ts, open interval = current row) and a version counter —
    the standard CDC-to-warehouse dimension-history materialization
    (Debezium topic -> SCD2 table; reference pipeline's postgres source
    feeding an analytical sink). All three windows share one
    hash-partitioning on user_id, so the whole build is a single shuffle
    of the change stream — work tracks |changes|, never |dimension|;
    (ts, event_id) ordering makes tie order total and engine-exact."""
    ev = load(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    changes = (
        ev.withColumn("prev_type", F.lag("event_type").over(w))
        .filter(F.col("prev_type").isNull() | (F.col("event_type") != F.col("prev_type")))
        .select("user_id", "ts", "event_type", "event_id")
    )
    w2 = Window.partitionBy("user_id").orderBy("ts", "event_id")
    return (
        changes.select(
            "user_id",
            F.row_number().over(w2).cast("bigint").alias("version"),
            "event_type",
            F.col("ts").alias("effective_from"),
            F.lead("ts").over(w2).alias("effective_to"),
            F.lead("ts").over(w2).isNull().alias("is_current"),
        )
        .orderBy("user_id", "version")
    )


def scd2_apply_increment(existing: DataFrame, batch: DataFrame) -> DataFrame:
    """Incremental SCD2 maintenance: fold one chronological chunk of
    change events into an existing SCD2 table (the per-poll work of a
    CDC-topic -> dimension-history pipeline; x59 is the full-recompute
    twin and the correctness oracle — tests fold the fixture in chunks
    and assert frame equality with the one-shot build).

    ``existing``: (user_id, version, event_type, effective_from,
    effective_to, is_current) — empty on the first poll. ``batch``:
    (user_id, ts, event_type, event_id) with every ts >= the table's
    horizon (chronological chunks, the incremental source's contract).

    Algebra: sessionize the BATCH alone (lag-collapse, x59's window), then
    reconcile at the boundary: a user's first batch state equal to their
    open state merges into it (no new version — the cross-chunk
    consecutive-duplicate collapse); otherwise the open interval CLOSES at
    the first new state's timestamp. Versions continue from the per-user
    max. Work tracks |batch| + |touched users| — untouched history rows
    pass through by construction, so at scale this is a key-partitioned
    join against only the CURRENT slice of the dimension."""
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    mini = (
        batch.withColumn("prev_type", F.lag("event_type").over(w))
        .filter(
            F.col("prev_type").isNull()
            | (F.col("event_type") != F.col("prev_type"))
        )
        .select(
            "user_id",
            "ts",
            "event_type",
            "event_id",
            F.row_number().over(w).alias("bseq"),
        )
    )
    cur = existing.filter("is_current").select(
        "user_id",
        F.col("event_type").alias("cur_type"),
        F.col("version").alias("cur_version"),
    )
    # boundary merge: drop a leading batch state equal to the open state
    first = mini.filter(F.col("bseq") == 1).select(
        "user_id", F.col("event_type").alias("first_type")
    )
    merged = first.join(cur, "user_id", "left").withColumn(
        "drop_first", F.col("cur_type").isNotNull() & (F.col("first_type") == F.col("cur_type"))
    ).select("user_id", "drop_first")
    keep = (
        mini.join(merged, "user_id")
        .filter(~(F.col("drop_first") & (F.col("bseq") == 1)))
        .join(cur.select("user_id", "cur_version"), "user_id", "left")
    )
    w2 = Window.partitionBy("user_id").orderBy("ts", "event_id")
    new_rows = keep.select(
        "user_id",
        (F.coalesce(F.col("cur_version"), F.lit(0)) + F.row_number().over(w2)).alias("version"),
        "event_type",
        F.col("ts").alias("effective_from"),
        F.lead("ts").over(w2).alias("effective_to"),
        F.lead("ts").over(w2).isNull().alias("is_current"),
    )
    # close each touched user's open interval at their first NEW state's ts
    closes = keep.groupBy("user_id").agg(F.min("ts").alias("close_ts"))
    closed = (
        existing.join(closes, "user_id", "left")
        .withColumn(
            "effective_to",
            F.when(
                F.col("is_current") & F.col("close_ts").isNotNull(), F.col("close_ts")
            ).otherwise(F.col("effective_to")),
        )
        .withColumn(
            "is_current",
            F.when(F.col("close_ts").isNotNull(), F.lit(False)).otherwise(
                F.col("is_current")
            ),
        )
        .drop("close_ts")
    )
    return closed.unionByName(new_rows)


@query(
    "x88_scd2_asof",
    oracle="""
    WITH ch AS (
      SELECT user_id, ts, event_type,
             lag(event_type) OVER (PARTITION BY user_id ORDER BY ts, event_id)
               AS prev_type,
             event_id
      FROM events),
    changes AS (
      SELECT user_id, ts, event_type, event_id FROM ch
      WHERE prev_type IS NULL OR event_type <> prev_type),
    hist AS (
      SELECT user_id,
             CAST(row_number() OVER (PARTITION BY user_id ORDER BY ts, event_id)
                  AS BIGINT) AS version,
             event_type, ts AS effective_from,
             lead(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id)
               AS effective_to
      FROM changes)
    SELECT user_id, version, event_type AS state, effective_from
    FROM hist
    WHERE effective_from <= TIMESTAMP '2024-01-15 00:00:00'
      AND (effective_to IS NULL OR effective_to > TIMESTAMP '2024-01-15 00:00:00')
    ORDER BY user_id
    """,
)
def x88_scd2_asof(spark: SparkSession, sf_dir: str) -> DataFrame:
    """AS-OF (time-travel) read over the SCD2 dimension history: the state
    every key had at a fixed past instant — one interval-containment
    filter over x59's validity intervals (effective_from <= T < 
    effective_to, open interval = current). This is the query SCD2 exists
    to answer ('what did the dimension look like when the model
    trained?'); on a range-sorted layout (sinks/layout.py) the
    effective_from predicate also prunes files. Exactly one row per key
    active at T, by the non-overlapping-interval invariant x59's tests
    pin."""
    hist = x59_scd2_history.__wrapped__(spark, sf_dir) if hasattr(
        x59_scd2_history, "__wrapped__"
    ) else x59_scd2_history(spark, sf_dir)
    t = F.lit("2024-01-15 00:00:00").cast("timestamp")
    return (
        hist.filter(
            (F.col("effective_from") <= t)
            & (F.col("effective_to").isNull() | (F.col("effective_to") > t))
        )
        .select("user_id", "version", F.col("event_type").alias("state"), "effective_from")
        .orderBy("user_id")
    )


@query(
    "x166_cdc_join_maintenance",
    oracle="""
    WITH live AS (
      SELECT user_id, event_type,
             SUM(CASE event_id % 4 WHEN 2 THEN -1 WHEN 1 THEN 0 ELSE 1 END)
               AS n_live
      FROM events
      WHERE event_type IN ('click', 'view')
      GROUP BY user_id, event_type),
    ab AS (SELECT user_id,
                  coalesce(min(CASE WHEN event_type = 'click' THEN n_live END), 0)
                    AS clicks_live,
                  coalesce(min(CASE WHEN event_type = 'view' THEN n_live END), 0)
                    AS views_live
           FROM live GROUP BY user_id)
    SELECT user_id,
           CAST(clicks_live AS BIGINT) AS clicks_live,
           CAST(views_live AS BIGINT) AS views_live,
           CAST(clicks_live * views_live AS BIGINT) AS join_rows
    FROM ab ORDER BY user_id
    """,
)
def x166_cdc_join_maintenance(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Incremental JOIN maintenance under CDC — the bilinear companion to
    x33's aggregate maintenance: for the per-user equi-join of live click
    rows with live view rows, the maintained quantity is the join
    CARDINALITY |A_u| x |B_u|, and under change streams it moves by the
    product rule d(ab) = da*b + a*db + da*db (the DBSP / differential-
    dataflow bilinear operator; each term joins a DELTA against state or
    delta, never base x base). That rule is what keeps a 100 TB
    materained join current with work proportional to the change stream;
    tests/test_cdc_materialize.py replays the envelope in 3 microbatches,
    folds the product rule batch-by-batch, and pins the folded state to
    this query's direct evaluation row-for-row. The batch registry shape
    folds row-liveness deltas (insert +1 / update 0 / delete -1) per
    side, then takes the product — one change-stream scan, one hash agg,
    no join of the base tables anywhere."""
    env = cdc_envelope(spark, sf_dir)
    etype = F.coalesce(F.col("after.event_type"), F.col("before.event_type"))
    key = F.coalesce(F.col("after.user_id"), F.col("before.user_id"))
    live_delta = (
        F.when(F.col("op") == "d", F.lit(-1))
        .when(F.col("op") == "u", F.lit(0))
        .otherwise(F.lit(1))
    )
    ab = (
        env.filter(etype.isin("click", "view"))
        .groupBy(key.alias("user_id"))
        .agg(
            F.coalesce(
                F.sum(F.when(etype == "click", live_delta)), F.lit(0)
            ).alias("clicks_live"),
            F.coalesce(
                F.sum(F.when(etype == "view", live_delta)), F.lit(0)
            ).alias("views_live"),
        )
    )
    return ab.select(
        "user_id",
        "clicks_live",
        "views_live",
        (F.col("clicks_live") * F.col("views_live")).alias("join_rows"),
    ).orderBy("user_id")


@query(
    "x258_variant_props_profile",
    oracle="""
    SELECT event_type,
           CAST(count(*) AS BIGINT) AS n,
           CAST(sum(CAST(json_extract_string(props, '$.k') AS BIGINT))
                AS BIGINT) AS k_sum,
           CAST(min(CAST(json_extract_string(props, '$.k') AS BIGINT))
                AS BIGINT) AS k_min,
           CAST(max(CAST(json_extract_string(props, '$.k') AS BIGINT))
                AS BIGINT) AS k_max,
           CAST(sum(CASE WHEN json_extract_string(props, '$.k') IS NULL
                         THEN 1 ELSE 0 END) AS BIGINT) AS k_missing
    FROM events GROUP BY event_type ORDER BY event_type
    """,
)
def x258_variant_props_profile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Semi-structured payload profiling through Spark 4's VARIANT type:
    parse the JSON props column ONCE into a variant, then typed
    variant_get extraction feeds the per-event-type field profile
    (count / sum / min / max / missing) — the schema-drift audit a CDC
    pipeline runs on loosely-typed payloads. VARIANT is the scale-
    correct shape for this: the binary-encoded variant parses each JSON
    text once per row and every downstream field access is a typed
    O(depth) lookup, where the get_json_object alternative re-parses
    the string per extraction (x31's emit-on-change path already uses
    one-off extraction; this is the many-fields-per-payload pattern).
    The oracle extracts the same field with DuckDB's JSON functions —
    typed results agree exactly because the field is integral."""
    e = load(spark, sf_dir, "events")
    v = e.select(
        "event_type", F.parse_json(F.col("props")).alias("v")
    ).select(
        "event_type",
        F.expr("variant_get(v, '$.k', 'bigint')").alias("k"),
    )
    return (
        v.groupBy("event_type")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n"),
            F.sum("k").cast("long").alias("k_sum"),
            F.min("k").cast("long").alias("k_min"),
            F.max("k").cast("long").alias("k_max"),
            F.sum(F.col("k").isNull().cast("long"))
            .cast("long")
            .alias("k_missing"),
        )
        .orderBy("event_type")
    )
