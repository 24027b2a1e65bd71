"""Metric-aggregation surface — the PromQL workload of the reference's
Grafana dashboard (SURVEY.md §2.5, grafana/dashboards/connect.json) plus the
streaming window family X11, expressed over the ``events`` fixture
(FIXTURES.md metric_sample mapping)."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..catalog import load
from .registry import dround, dround_sql, dsum, dsum_sql, query


@query(
    "p1_filtered_sum",
    oracle=f"""
    SELECT {dsum_sql("value")} AS total_value FROM events
    WHERE event_type <> '' AND regexp_matches(event_type, '^(click|view)$')
    """,
)
def p1_filtered_sum(spark: SparkSession, sf_dir: str) -> DataFrame:
    """sum(metric{label=~"re", label!=""}) — filtered global sum
    (reference grafana/dashboards/connect.json:87,143,...)."""
    events = load(spark, sf_dir, "events")
    return events.filter(
        (F.col("event_type") != "") & F.col("event_type").rlike("^(click|view)$")
    ).agg(dsum(F.col("value")).alias("total_value"))


@query(
    "p2_grouped_sum",
    oracle=f"""
    SELECT event_type, {dsum_sql("value")} AS sum_value, count(*) AS cnt
    FROM events GROUP BY event_type ORDER BY event_type
    """,
)
def p2_grouped_sum(spark: SparkSession, sf_dir: str) -> DataFrame:
    """sum(...) by (k) — grouped sum (connect.json:467,1089-1129)."""
    events = load(spark, sf_dir, "events")
    return (
        events.groupBy("event_type")
        .agg(dsum(F.col("value")).alias("sum_value"), F.count(F.lit(1)).alias("cnt"))
        .orderBy("event_type")
    )


@query(
    "p3_rate_window",
    oracle=f"""
    SELECT time_bucket(INTERVAL '1 minute', ts) AS w,
           {dround_sql("(max(value) - min(value)) / 60.0", 6)} AS rate_per_sec
    FROM events WHERE event_type = 'click'
    GROUP BY w ORDER BY w
    """,
)
def p3_rate_window(spark: SparkSession, sf_dir: str) -> DataFrame:
    """rate(counter[1m]) — per-second rate over 1-minute windows
    (connect.json:1722,1825). Tumbling-window batch analog; the streaming
    sliding-window version lives in streaming.windows."""
    events = load(spark, sf_dir, "events").filter(F.col("event_type") == "click")
    return (
        events.groupBy(F.window("ts", "1 minute").alias("win"))
        .agg(dround((F.max("value") - F.min("value")) / 60.0, 6).alias("rate_per_sec"))
        .select(F.col("win.start").alias("w"), "rate_per_sec")
        .orderBy("w")
    )


@query(
    "p4_gauge_last_value",
    oracle="""
    SELECT user_id, value AS last_value
    FROM (SELECT user_id, value, row_number() OVER
            (PARTITION BY user_id ORDER BY ts DESC, event_id DESC) AS rn
          FROM events)
    WHERE rn = 1 ORDER BY user_id
    """,
)
def p4_gauge_last_value(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Instant-vector gauge read: latest sample per series
    (connect.json:1928,2030). Spark side uses max_by over a (ts, event_id)
    struct — one hash-agg pass, no window shuffle-and-sort."""
    events = load(spark, sf_dir, "events")
    return (
        events.groupBy("user_id")
        .agg(F.expr("max_by(value, struct(ts, event_id))").alias("last_value"))
        .orderBy("user_id")
    )


@query(
    "p5_label_replace",
    oracle="""
    SELECT event_id,
           CASE event_type WHEN 'click' THEN '1' WHEN 'view' THEN '2'
                ELSE event_type END AS status_ord
    FROM events ORDER BY event_id
    """,
)
def p5_label_replace(spark: SparkSession, sf_dir: str) -> DataFrame:
    """label_replace chain -> ordinal mapping (connect.json:1581)."""
    events = load(spark, sf_dir, "events")
    return events.select(
        "event_id",
        F.when(F.col("event_type") == "click", F.lit("1"))
        .when(F.col("event_type") == "view", F.lit("2"))
        .otherwise(F.col("event_type"))
        .alias("status_ord"),
    ).orderBy("event_id")


_P6_WSUM = (
    "CAST(SUM(CAST(value AS DECIMAL(38,6))) OVER "
    "(PARTITION BY user_id ORDER BY ts, event_id "
    "ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS DOUBLE)"
)


@query(
    "p6_running_total",
    oracle=f"""
    SELECT event_id,
           {dround_sql(_P6_WSUM, 4)} AS running_total
    FROM events ORDER BY event_id
    """,
)
def p6_running_total(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Counter cumulative total (connect.json:2235): running sum per series.
    Decimal accumulation keeps the prefix sums bit-identical across engines."""
    events = load(spark, sf_dir, "events")
    w = (
        Window.partitionBy("user_id")
        .orderBy("ts", "event_id")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return events.select(
        "event_id",
        dround(
            F.sum(F.col("value").cast("decimal(38,6)")).over(w).cast("double"), 4
        ).alias("running_total"),
    ).orderBy("event_id")


@query(
    "x11_tumbling_window",
    oracle=f"""
    SELECT time_bucket(INTERVAL '10 minutes', ts) AS w, event_type,
           count(*) AS cnt, {dsum_sql("value")} AS sum_value
    FROM events GROUP BY w, event_type ORDER BY w, event_type
    """,
)
def x11_tumbling_window(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Tumbling event-time window aggregation (batch-checkable analog of the
    streaming path in streaming.windows; same F.window operator)."""
    events = load(spark, sf_dir, "events")
    return (
        events.groupBy(F.window("ts", "10 minutes").alias("win"), "event_type")
        .agg(F.count(F.lit(1)).alias("cnt"), dsum(F.col("value")).alias("sum_value"))
        .select(F.col("win.start").alias("w"), "event_type", "cnt", "sum_value")
        .orderBy("w", "event_type")
    )


@query(
    "x11b_sliding_window",
    oracle=f"""
    SELECT time_bucket(INTERVAL '5 minutes', ts) AS slide_start,
           count(*) AS cnt
    FROM events WHERE event_type = 'purchase'
    GROUP BY slide_start ORDER BY slide_start
    """,
)
def x11b_sliding_window(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sliding windows (10 min window / 5 min slide): each event lands in 2
    windows. Checked via the 5-minute slide grain (every sliding window is a
    union of slide buckets, so the bucket counts pin the semantics); the
    full sliding output is exercised in tests/test_streaming.py."""
    events = load(spark, sf_dir, "events").filter(F.col("event_type") == "purchase")
    return (
        events.groupBy(F.window("ts", "5 minutes").alias("win"))
        .agg(F.count(F.lit(1)).alias("cnt"))
        .select(F.col("win.start").alias("slide_start"), "cnt")
        .orderBy("slide_start")
    )


@query(
    "p7_avg_over_time",
    oracle=f"""
    SELECT event_id, user_id,
           {dround_sql("CAST(SUM(CAST(value AS DECIMAL(38,6))) OVER w AS DOUBLE) / (COUNT(*) OVER w)", 4)} AS avg_5m
    FROM events
    WINDOW w AS (PARTITION BY user_id ORDER BY ts
                 RANGE BETWEEN INTERVAL 5 MINUTES PRECEDING AND CURRENT ROW)
    ORDER BY event_id
    """,
)
def p7_avg_over_time(spark: SparkSession, sf_dir: str) -> DataFrame:
    """avg_over_time(metric[5m]) — trailing time-range window frame (the
    PromQL range-vector average), computed per series. PromQL range vectors
    are per-series by definition, and partitionBy keeps the WindowExec
    distributed: each series' history stays inside one hash partition instead
    of forcing the whole table through a single global-window task."""
    events = load(spark, sf_dir, "events")
    # epoch MICROS, not seconds: unix_timestamp truncates and would shift
    # the frame boundary vs DuckDB's full-precision interval arithmetic
    w = (
        Window.partitionBy("user_id")
        .orderBy(F.unix_micros("ts"))
        .rangeBetween(-300 * 1_000_000, 0)
    )
    return events.select(
        "event_id",
        "user_id",
        dround(
            F.sum(F.col("value").cast("decimal(38,6)")).over(w).cast("double")
            / F.count(F.lit(1)).over(w),
            4,
        ).alias("avg_5m"),
    ).orderBy("event_id")


_PIVOT_TYPES = ["click", "error", "purchase", "signup", "view"]
_pivot_cells = ", ".join(
    dround_sql(
        f"CAST(SUM(CAST(CASE WHEN event_type = '{t}' THEN value END AS DECIMAL(38,6))) AS DOUBLE)",
        4,
    )
    + f" AS {t}"
    for t in _PIVOT_TYPES
)


@query(
    "x17_pivot",
    oracle=f"""
    SELECT user_id, {_pivot_cells}
    FROM events GROUP BY user_id ORDER BY user_id
    """,
)
def x17_pivot(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pivot (wide metric matrix per series): explicit value list keeps the
    plan a single pass — without it Spark runs an extra distinct job to
    discover the columns."""
    events = load(spark, sf_dir, "events")
    return (
        events.groupBy("user_id")
        .pivot("event_type", _PIVOT_TYPES)
        .agg(dsum(F.col("value")))
        .orderBy("user_id")
    )


@query(
    "x11c_session_window",
    # gap-sessionization is SQL-expressible with the lag + cumulative-sum
    # idiom: a session breaks when the gap to the previous event is >= the
    # 5-minute gap (Spark's session window is [start, last_ts + gap), end
    # EXCLUSIVE — an event exactly gap after the last starts a new session),
    # and session_end = last event + gap.
    oracle=f"""
    WITH o AS (
      SELECT user_id, ts, value,
             CASE WHEN lag(ts) OVER (PARTITION BY user_id ORDER BY ts) IS NULL
                    OR ts - lag(ts) OVER (PARTITION BY user_id ORDER BY ts)
                       >= INTERVAL 5 MINUTE
                  THEN 1 ELSE 0 END AS new_s
      FROM events
    ), s AS (
      SELECT user_id, ts, value,
             SUM(new_s) OVER (PARTITION BY user_id ORDER BY ts
                              ROWS UNBOUNDED PRECEDING) AS sid
      FROM o
    )
    SELECT user_id,
           MIN(ts) AS session_start,
           MAX(ts) + INTERVAL 5 MINUTE AS session_end,
           COUNT(*) AS n_events,
           {dsum_sql("value")} AS sum_value
    FROM s GROUP BY user_id, sid
    ORDER BY user_id, session_start
    """,
)
def x11c_session_window(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Session windows (5-minute gap) per user. Also verified Spark-vs-Spark
    in tests/test_streaming.py (batch session_window == streaming
    session_window over the same replay); the DuckDB oracle uses the
    lag + cumulative-sum sessionization idiom (verdict r4 #6)."""
    events = load(spark, sf_dir, "events")
    return (
        events.groupBy(F.session_window("ts", "5 minutes").alias("sw"), "user_id")
        .agg(F.count(F.lit(1)).alias("n_events"), dsum(F.col("value")).alias("sum_value"))
        .select(
            "user_id",
            F.col("sw.start").alias("session_start"),
            F.col("sw.end").alias("session_end"),
            "n_events",
            "sum_value",
        )
        .orderBy("user_id", "session_start")
    )


@query(
    "p8_irate",
    oracle=f"""
    WITH o AS (
      SELECT user_id, ts, value, event_id,
             lag(value) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS pv,
             lag(ts)    OVER (PARTITION BY user_id ORDER BY ts, event_id) AS pt,
             row_number() OVER (PARTITION BY user_id ORDER BY ts DESC, event_id DESC) AS rn
      FROM events
    )
    SELECT user_id,
           {dround_sql("(value - pv) / (epoch(ts) - epoch(pt))", 6)} AS irate
    FROM o WHERE rn = 1 AND pt IS NOT NULL AND ts > pt
    ORDER BY user_id
    """,
)
def p8_irate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PromQL irate(): instantaneous rate from the LAST TWO samples of each
    series — one per-series window (lag + row_number), no self-join. Series
    with a single sample (or a zero interval) drop, as in Prometheus."""
    ev = load(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    wd = Window.partitionBy("user_id").orderBy(F.col("ts").desc(), F.col("event_id").desc())
    o = ev.select(
        "user_id", "ts", "value", "event_id",
        F.lag("value").over(w).alias("pv"),
        F.lag("ts").over(w).alias("pt"),
        F.row_number().over(wd).alias("rn"),
    )
    return (
        o.filter((F.col("rn") == 1) & F.col("pt").isNotNull() & (F.col("ts") > F.col("pt")))
        .select(
            "user_id",
            dround(
                (F.col("value") - F.col("pv"))
                / (F.unix_micros("ts") - F.unix_micros("pt")).cast("double")
                * 1e6,
                6,
            ).alias("irate"),
        )
        .orderBy("user_id")
    )


@query(
    "p9_delta",
    oracle=f"""
    WITH o AS (
      SELECT user_id, value,
             first_value(value) OVER (PARTITION BY user_id ORDER BY ts, event_id
               ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING) AS first_v,
             last_value(value) OVER (PARTITION BY user_id ORDER BY ts, event_id
               ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING) AS last_v
      FROM events
    )
    SELECT DISTINCT user_id, {dround_sql("last_v - first_v", 6)} AS delta
    FROM o ORDER BY user_id
    """,
)
def p9_delta(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PromQL delta(): last minus first sample per series over the range —
    min_by/max_by style endpoints via unbounded windows, one shuffle."""
    ev = load(spark, sf_dir, "events")
    w = (
        Window.partitionBy("user_id")
        .orderBy("ts", "event_id")
        .rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
    )
    return (
        ev.select(
            "user_id",
            F.first("value").over(w).alias("first_v"),
            F.last("value").over(w).alias("last_v"),
        )
        .select("user_id", dround(F.col("last_v") - F.col("first_v"), 6).alias("delta"))
        .distinct()
        .orderBy("user_id")
    )


@query(
    "p10_histogram_quantile",
    oracle=f"""
    WITH b AS (SELECT unnest([50.0, 100.0, 150.0, 200.0, 250.0, 1e308]) AS le),
    cum AS (
      SELECT e.event_type, b.le,
             CAST(count(CASE WHEN e.value <= b.le THEN 1 END) AS DOUBLE) AS c
      FROM events e CROSS JOIN b GROUP BY e.event_type, b.le
    ),
    tot AS (SELECT event_type, max(c) AS total FROM cum GROUP BY event_type),
    w AS (
      SELECT cum.event_type, le, c, total, 0.9 * total AS rank,
             COALESCE(lag(c)  OVER (PARTITION BY cum.event_type ORDER BY le), 0.0) AS pc,
             COALESCE(lag(le) OVER (PARTITION BY cum.event_type ORDER BY le), 0.0) AS ple
      FROM cum JOIN tot USING (event_type)
    ),
    hit AS (
      SELECT *, row_number() OVER (PARTITION BY event_type ORDER BY le) AS rn
      FROM w WHERE c >= rank
    )
    SELECT event_type,
           {dround_sql("CASE WHEN le >= 1e308 THEN 250.0 ELSE ple + (rank - pc) / (c - pc) * (le - ple) END", 6)} AS q90
    FROM hit WHERE rn = 1 ORDER BY event_type
    """,
)
def p10_histogram_quantile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PromQL histogram_quantile(0.9, ...): linear interpolation inside the
    first cumulative bucket whose count crosses the target rank, +Inf
    bucket clamping to the highest finite boundary — the exact Prometheus
    estimator over le-bucketed counters. Bucketing is an explode over a
    6-literal array (x6 row fan-out, map-side) + one hash agg; the
    quantile pick is a per-series window over 6 rows."""
    ev = load(spark, sf_dir, "events")
    les = [50.0, 100.0, 150.0, 200.0, 250.0, 1e308]
    cum = (
        ev.select(
            "event_type",
            "value",
            F.explode(F.array(*[F.lit(x) for x in les])).alias("le"),
        )
        .groupBy("event_type", "le")
        .agg(F.count(F.when(F.col("value") <= F.col("le"), 1)).cast("double").alias("c"))
    )
    tot = cum.groupBy("event_type").agg(F.max("c").alias("total"))
    w = Window.partitionBy("event_type").orderBy("le")
    scored = (
        cum.join(tot, "event_type")
        .withColumn("rank", F.lit(0.9) * F.col("total"))
        .withColumn("pc", F.coalesce(F.lag("c").over(w), F.lit(0.0)))
        .withColumn("ple", F.coalesce(F.lag("le").over(w), F.lit(0.0)))
    )
    hit = (
        scored.filter(F.col("c") >= F.col("rank"))
        .withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
    )
    q = F.when(F.col("le") >= 1e308, F.lit(250.0)).otherwise(
        F.col("ple")
        + (F.col("rank") - F.col("pc")) / (F.col("c") - F.col("pc"))
        * (F.col("le") - F.col("ple"))
    )
    return hit.select("event_type", dround(q, 6).alias("q90")).orderBy("event_type")


@query(
    "p11_increase_and_resets",
    oracle="""
    WITH c AS (
      SELECT user_id, ts, event_id,
             (row_number() OVER (PARTITION BY user_id ORDER BY ts, event_id) * 7)
               % 1000 AS counter
      FROM events
    ),
    d AS (
      SELECT user_id, counter,
             lag(counter) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS pv
      FROM c
    )
    SELECT user_id,
           CAST(SUM(CASE WHEN pv IS NULL THEN 0
                         WHEN counter >= pv THEN counter - pv
                         ELSE counter END) AS BIGINT) AS total_increase,
           CAST(COUNT(CASE WHEN counter < pv THEN 1 END) AS BIGINT) AS n_resets
    FROM d GROUP BY user_id ORDER BY user_id
    """,
)
def p11_increase_and_resets(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PromQL increase() + resets() over a counter with wraparound: on a
    reset (sample below its time-predecessor) increase() credits the full
    new value and resets() counts one. The counter is synthesized
    deterministically (7x the per-series sample index mod 1000) so both
    engines see identical integer series; every series longer than 143
    samples genuinely wraps. One per-series time-ordered lag window + one
    hash agg — no self-join, scales per series like every PromQL op."""
    ev = load(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    c = ev.select(
        "user_id", "ts", "event_id",
        ((F.row_number().over(w) * 7) % 1000).alias("counter"),
    )
    d = c.withColumn("pv", F.lag("counter").over(w))
    inc = (
        F.when(F.col("pv").isNull(), F.lit(0))
        .when(F.col("counter") >= F.col("pv"), F.col("counter") - F.col("pv"))
        .otherwise(F.col("counter"))
    )
    return (
        d.groupBy("user_id")
        .agg(
            F.sum(inc).alias("total_increase"),
            F.count(F.when(F.col("counter") < F.col("pv"), F.lit(1))).alias(
                "n_resets"
            ),
        )
        .orderBy("user_id")
    )


@query(
    "p12_zscore_anomalies",
    oracle=f"""
    WITH s AS (
      SELECT user_id,
             CAST(SUM(CAST(value AS DECIMAL(38,6))) AS DOUBLE) AS sv,
             CAST(SUM(CAST(value AS DECIMAL(38,6)) * CAST(value AS DECIMAL(38,6)))
                  AS DOUBLE) AS svv,
             count(*) AS n
      FROM events GROUP BY user_id
    )
    SELECT e.event_id, e.user_id,
           {dround_sql("(e.value - s.sv / s.n) / sqrt((s.svv - s.sv * s.sv / s.n) / s.n)", 4)} AS z
    FROM events e JOIN s USING (user_id)
    WHERE s.n > 1
      AND abs((e.value - s.sv / s.n)
              / sqrt((s.svv - s.sv * s.sv / s.n) / s.n)) > 2.5
    ORDER BY e.event_id
    """,
)
def p12_zscore_anomalies(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-series anomaly flags: samples more than 2.5 population standard
    deviations from their series mean. Mean and variance come from EXACT
    decimal sums (sum, sum of squares) so both engines derive identical
    doubles before the single sqrt/divide/round — the determinism trick
    that makes a statistical filter hash-checkable. One grouped agg +
    one broadcastable re-join; no window, no second scan of wide rows."""
    ev = load(spark, sf_dir, "events")
    dec = F.col("value").cast("decimal(38,6)")
    s = ev.groupBy("user_id").agg(
        F.sum(dec).cast("double").alias("sv"),
        F.sum(dec * dec).cast("double").alias("svv"),
        F.count(F.lit(1)).alias("n"),
    )
    j = ev.join(F.broadcast(s), "user_id").filter(F.col("n") > 1)
    z = (F.col("value") - F.col("sv") / F.col("n")) / F.sqrt(
        (F.col("svv") - F.col("sv") * F.col("sv") / F.col("n")) / F.col("n")
    )
    return (
        j.filter(F.abs(z) > 2.5)
        .select("event_id", "user_id", dround(z, 4).alias("z"))
        .orderBy("event_id")
    )


@query(
    "p13_quantile_over_time",
    oracle=f"""
    SELECT event_id, user_id,
           {dround_sql("quantile_cont(value, 0.5) OVER w", 4)} AS p50_20,
           {dround_sql("quantile_cont(value, 0.9) OVER w", 4)} AS p90_20
    FROM events
    WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id
                 ROWS BETWEEN 19 PRECEDING AND CURRENT ROW)
    ORDER BY event_id
    """,
)
def p13_quantile_over_time(spark: SparkSession, sf_dir: str) -> DataFrame:
    """quantile_over_time: trailing per-series quantiles over the last 20
    samples (Spark's exact `percentile` and DuckDB's `quantile_cont` both
    linear-interpolate, so the window frames hash-match). Partitioned
    per series like every range-vector op — each series' trailing state
    stays inside its hash partition; the frame bound caps per-row work at
    O(20 log 20) regardless of history length."""
    ev = load(spark, sf_dir, "events")
    w = (
        Window.partitionBy("user_id")
        .orderBy("ts", "event_id")
        .rowsBetween(-19, Window.currentRow)
    )
    # BOTH quantiles from ONE percentile(value, array(...)) window buffer —
    # two separate calls would maintain (and re-sort) two frame buffers
    # per row; the array form halves the window work
    q = F.expr("percentile(value, array(0.5D, 0.9D))").over(w)
    return (
        ev.select("event_id", "user_id", q.alias("q"))
        .select(
            "event_id",
            "user_id",
            dround(F.col("q")[0], 4).alias("p50_20"),
            dround(F.col("q")[1], 4).alias("p90_20"),
        )
        .orderBy("event_id")
    )


# Minute index of 2024-01-01T00:00:00Z — the fixture epoch; keeps the
# regression sums small enough (< 2^53) that BOTH engines hold them exactly.
_REG_EPOCH_MIN = 1704067200 // 60

_REG_SUMS_SQL = f"""
    WITH s AS (
      SELECT user_id,
             CAST(FLOOR(epoch_ms(ts) / 60000) AS BIGINT) - {_REG_EPOCH_MIN} AS x,
             CAST(FLOOR(value * 100) AS BIGINT) AS y
      FROM events
    ),
    a AS (
      SELECT user_id,
             CAST(COUNT(*) AS BIGINT)   AS n,
             CAST(SUM(x) AS BIGINT)     AS sx,
             CAST(SUM(y) AS BIGINT)     AS sy,
             CAST(SUM(x * y) AS BIGINT) AS sxy,
             CAST(SUM(x * x) AS BIGINT) AS sxx,
             CAST(MAX(x) AS BIGINT)     AS maxx
      FROM s GROUP BY user_id
    )
    SELECT user_id, n, sx, sy, sxy, sxx, maxx,
           n * sxy - sx * sy AS num,
           n * sxx - sx * sx AS den
    FROM a WHERE n >= 2 AND n * sxx - sx * sx <> 0
"""


def _regression_sums(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-series least-squares sums over (minute index, centi-value) —
    ALL-INTEGER accumulation, so Spark and DuckDB reach bit-identical
    sums before the one double division. One hash agg per series; the
    regression state is five bigints regardless of series length, the
    same map-side-partial shape as every PromQL estimator here."""
    ev = load(spark, sf_dir, "events")
    s = ev.select(
        "user_id",
        (F.floor(F.unix_millis("ts") / F.lit(60000)).cast("long") - _REG_EPOCH_MIN).alias("x"),
        F.floor(F.col("value") * 100).cast("long").alias("y"),
    )
    a = s.groupBy("user_id").agg(
        F.count(F.lit(1)).alias("n"),
        F.sum("x").alias("sx"),
        F.sum("y").alias("sy"),
        F.sum(F.col("x") * F.col("y")).alias("sxy"),
        F.sum(F.col("x") * F.col("x")).alias("sxx"),
        F.max("x").alias("maxx"),
    )
    a = a.withColumn("num", F.col("n") * F.col("sxy") - F.col("sx") * F.col("sy"))
    a = a.withColumn("den", F.col("n") * F.col("sxx") - F.col("sx") * F.col("sx"))
    return a.filter((F.col("n") >= 2) & (F.col("den") != 0))


@query(
    "p14_deriv",
    oracle=f"""
    SELECT user_id,
           {dround_sql("CAST(num AS DOUBLE) / CAST(den AS DOUBLE) / 6000.0", 6)} AS deriv_per_sec
    FROM ({_REG_SUMS_SQL})
    ORDER BY user_id
    """,
)
def p14_deriv(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PromQL deriv(gauge[w]): per-second least-squares slope of each
    series (the dashboard family's trend estimator). Minute-resolution x
    and centi-quantized y keep every sum integer-exact in both engines;
    the single slope division happens once, in double, from identical
    inputs. /6000 = minutes->seconds x centi->units."""
    a = _regression_sums(spark, sf_dir)
    return a.select(
        "user_id",
        dround(
            F.col("num").cast("double") / F.col("den").cast("double") / F.lit(6000.0), 6
        ).alias("deriv_per_sec"),
    ).orderBy("user_id")


@query(
    "p15_predict_linear",
    oracle=f"""
    SELECT user_id,
           {dround_sql("(CAST(sy AS DOUBLE) + (CAST(num AS DOUBLE) / CAST(den AS DOUBLE)) * CAST(n * (maxx + 60) - sx AS DOUBLE)) / CAST(n AS DOUBLE) / 100.0", 6)} AS predicted
    FROM ({_REG_SUMS_SQL})
    ORDER BY user_id
    """,
)
def p15_predict_linear(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PromQL predict_linear(gauge[w], 1h): extrapolate each series' linear
    fit one hour past its newest sample — the dashboard's capacity-planning
    estimator (disk-full style alerts). Same integer-exact sums as p14;
    prediction = intercept + slope * (max_x + 60min), algebraically folded
    to avoid a second pass."""
    a = _regression_sums(spark, sf_dir)
    slope = F.col("num").cast("double") / F.col("den").cast("double")
    pred = (
        (
            F.col("sy").cast("double")
            + slope
            * (F.col("n") * (F.col("maxx") + F.lit(60)) - F.col("sx")).cast("double")
        )
        / F.col("n").cast("double")
        / F.lit(100.0)
    )
    return a.select("user_id", dround(pred, 6).alias("predicted")).orderBy("user_id")


@query(
    "p16_topk_bottomk",
    oracle=f"""
    WITH a AS (
      SELECT event_type, user_id,
             {dsum_sql("value")} AS series_sum
      FROM events GROUP BY event_type, user_id
    ), r AS (
      SELECT *,
             row_number() OVER (PARTITION BY event_type
                                ORDER BY series_sum DESC, user_id) AS rk_top,
             row_number() OVER (PARTITION BY event_type
                                ORDER BY series_sum ASC, user_id) AS rk_bot
      FROM a
    )
    SELECT event_type, user_id, series_sum,
           CASE WHEN rk_top <= 3 THEN 'top' ELSE 'bottom' END AS side
    FROM r WHERE rk_top <= 3 OR rk_bot <= 3
    ORDER BY event_type, side, user_id
    """,
)
def p16_topk_bottomk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PromQL ``topk(3, sum by (series)(metric))`` and ``bottomk`` in one
    pass — the dashboard's 'worst offenders' panel over AGGREGATED series
    (two-level: per-series sum, then rank within metric). Distinct from
    x34's row-level grouped top-k: the rank runs over the aggregate, so
    the window input is |series|, not |events|, and both directions reuse
    ONE sort per partition (rk_bot = n - rk_top reversal is not used only
    because ties-by-key must stay deterministic). At scale: the series agg
    is the usual partial+final hash agg; the rank window sees the already
    tiny series table."""
    ev = load(spark, sf_dir, "events")
    agg = ev.groupBy("event_type", "user_id").agg(
        dsum(F.col("value")).alias("series_sum")
    )
    wt = Window.partitionBy("event_type").orderBy(F.col("series_sum").desc(), "user_id")
    wb = Window.partitionBy("event_type").orderBy(F.col("series_sum").asc(), "user_id")
    return (
        agg.withColumn("rk_top", F.row_number().over(wt))
        .withColumn("rk_bot", F.row_number().over(wb))
        .filter((F.col("rk_top") <= 3) | (F.col("rk_bot") <= 3))
        .select(
            "event_type",
            "user_id",
            "series_sum",
            F.when(F.col("rk_top") <= 3, F.lit("top"))
            .otherwise(F.lit("bottom"))
            .alias("side"),
        )
        .orderBy("event_type", "side", "user_id")
    )


@query(
    "x41_session_funnel",
    oracle="""
    WITH o AS (
      SELECT user_id, ts, event_id, event_type,
             CASE WHEN lag(ts) OVER w IS NULL
                    OR epoch_us(ts) - epoch_us(lag(ts) OVER w) >= 300000000
                  THEN 1 ELSE 0 END AS new_s
      FROM events WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
    ), s AS (
      SELECT user_id, ts, event_type,
             SUM(new_s) OVER (PARTITION BY user_id ORDER BY ts, event_id
                              ROWS UNBOUNDED PRECEDING) AS sid
      FROM o
    ), per_sess AS (
      SELECT user_id, sid,
             MIN(CASE WHEN event_type = 'click' THEN ts END) AS first_click,
             MAX(CASE WHEN event_type = 'purchase' THEN ts END) AS last_purchase
      FROM s GROUP BY user_id, sid
    )
    SELECT user_id, count(*) AS n_sessions,
           CAST(COALESCE(SUM(CASE WHEN first_click IS NOT NULL
                              AND last_purchase > first_click
                             THEN 1 ELSE 0 END), 0) AS BIGINT) AS n_converting
    FROM per_sess GROUP BY user_id ORDER BY user_id
    """,
)
def x41_session_funnel(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Session funnel conversion: per user, how many 5-minute-gap sessions
    contain a purchase AFTER the session's first click — the product
    analytics staple (funnel over sessionized clickstream). Gap compare in
    exact integer MICROSECONDS on both engines (truncated-seconds vs
    fractional-seconds mismatches would flip boundary sessions). All
    per-user windows hash-partition on user_id; the funnel flags are two
    conditional min/max aggregates, no self-join."""
    ev = load(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    s = (
        ev.withColumn("prev_us", F.lag(F.unix_micros("ts")).over(w))
        .withColumn(
            "new_s",
            (
                F.col("prev_us").isNull()
                | (F.unix_micros("ts") - F.col("prev_us") >= 300_000_000)
            ).cast("int"),
        )
        .withColumn(
            "sid", F.sum("new_s").over(w.rowsBetween(Window.unboundedPreceding, 0))
        )
    )
    per_sess = s.groupBy("user_id", "sid").agg(
        F.min(F.when(F.col("event_type") == "click", F.col("ts"))).alias("first_click"),
        F.max(F.when(F.col("event_type") == "purchase", F.col("ts"))).alias(
            "last_purchase"
        ),
    )
    return (
        per_sess.groupBy("user_id")
        .agg(
            F.count(F.lit(1)).alias("n_sessions"),
            F.coalesce(
                F.sum(
                    (
                        F.col("first_click").isNotNull()
                        & (F.col("last_purchase") > F.col("first_click"))
                    ).cast("long")
                ),
                F.lit(0),
            ).alias("n_converting"),
        )
        .orderBy("user_id")
    )


@query(
    "x42_cohort_retention",
    oracle="""
    WITH first AS (
      SELECT user_id, MIN(CAST(ts AS DATE)) AS cohort_day FROM events GROUP BY user_id
    ),
    act AS (SELECT DISTINCT user_id, CAST(ts AS DATE) AS day FROM events)
    SELECT cohort_day, date_diff('day', cohort_day, day) AS day_offset,
           count(DISTINCT a.user_id) AS active_users
    FROM act a JOIN first f USING (user_id)
    GROUP BY cohort_day, day_offset ORDER BY cohort_day, day_offset
    """,
)
def x42_cohort_retention(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cohort retention matrix: users grouped by first-seen day, activity
    counted per day-offset — the other product-analytics staple. Two hash
    aggs + one equi-join on user_id; the (user, day) distinct pre-shrinks
    the join input to at most |users| x |days| rows, so the join never sees
    raw events. Integer/date arithmetic only — engine-exact."""
    ev = load(spark, sf_dir, "events")
    first = ev.groupBy("user_id").agg(F.min(F.to_date("ts")).alias("cohort_day"))
    act = ev.select("user_id", F.to_date("ts").alias("day")).distinct()
    return (
        act.join(first, "user_id")
        .withColumn("day_offset", F.datediff("day", "cohort_day"))
        .groupBy("cohort_day", "day_offset")
        .agg(F.countDistinct("user_id").alias("active_users"))
        .orderBy("cohort_day", "day_offset")
    )


@query(
    "x56_time_range_rolling",
    oracle="""
    SELECT event_id, user_id, ts,
           CAST(SUM(CAST(value AS DECIMAL(38,6))) OVER (
             PARTITION BY user_id ORDER BY ts
             RANGE BETWEEN INTERVAL 1 HOUR PRECEDING AND CURRENT ROW
           ) AS DECIMAL(38,6)) AS rolling_1h
    FROM events ORDER BY event_id
    """,
)
def x56_time_range_rolling(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Time-RANGE window frame: per-user rolling 1-hour sum, the frame
    bounded by the TIMESTAMP DISTANCE (RANGE BETWEEN INTERVAL), not a row
    count — irregular event spacing means ROWS frames are simply wrong
    here. Spark expresses interval ranges as ``rangeBetween`` over the
    epoch-seconds ordering key (bounds inclusive on both engines; ts ties
    are frame peers in both). One shuffle on user_id, each partition sorts
    once and the frame slides linearly; values accumulate in
    DECIMAL(38,6) so the running sum is order-exact cross-engine."""
    ev = load(spark, sf_dir, "events")
    w = (
        Window.partitionBy("user_id")
        .orderBy(F.unix_timestamp("ts"))
        .rangeBetween(-3600, 0)
    )
    return (
        ev.select(
            "event_id",
            "user_id",
            "ts",
            F.sum(F.col("value").cast("decimal(38,6)"))
            .over(w)
            .cast("decimal(38,6)")
            .alias("rolling_1h"),
        )
        .orderBy("event_id")
    )


@query(
    "x60_transition_matrix",
    oracle=f"""
    WITH seq AS (
      SELECT event_type AS from_type,
             lead(event_type) OVER (PARTITION BY user_id ORDER BY ts, event_id)
               AS to_type
      FROM events),
    c AS (SELECT from_type, to_type, CAST(count(*) AS BIGINT) AS n
          FROM seq WHERE to_type IS NOT NULL GROUP BY from_type, to_type),
    t AS (SELECT from_type, CAST(sum(n) AS BIGINT) AS tot FROM c GROUP BY from_type)
    SELECT c.from_type, c.to_type, n,
           {dround_sql("CAST(n AS DOUBLE) / tot", 6)} AS p
    FROM c JOIN t USING (from_type)
    ORDER BY from_type, to_type
    """,
)
def x60_transition_matrix(spark: SparkSession, sf_dir: str) -> DataFrame:
    """First-order event-transition matrix: P(next event_type | event_type)
    from per-user ordered sequences — the sequence-statistics primitive
    under funnel discovery, Markov attribution, and behavioral anomaly
    scoring. One lead window partitioned on user_id (sequences never cross
    users, so no global order), then two hash aggs on the tiny type-pair
    domain; the row-normalizing totals join broadcasts. Counts are exact
    integers; the single probability division rounds deterministically."""
    ev = load(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    seq = ev.select(
        F.col("event_type").alias("from_type"),
        F.lead("event_type").over(w).alias("to_type"),
    ).filter(F.col("to_type").isNotNull())
    c = seq.groupBy("from_type", "to_type").agg(F.count(F.lit(1)).alias("n"))
    t = c.groupBy("from_type").agg(F.sum("n").alias("tot"))
    return (
        c.join(F.broadcast(t), "from_type")
        .select(
            "from_type",
            "to_type",
            "n",
            dround(F.col("n").cast("double") / F.col("tot"), 6).alias("p"),
        )
        .orderBy("from_type", "to_type")
    )


@query(
    "p17_clamp",
    oracle="""
    SELECT event_id, user_id, value,
           greatest(least(value, 200.0), 50.0) AS clamped,
           greatest(value, 50.0) AS clamp_min,
           least(value, 200.0) AS clamp_max
    FROM events ORDER BY event_id
    """,
)
def p17_clamp(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PromQL clamp()/clamp_min()/clamp_max(): pure map-side greatest/least
    on identical input doubles — no arithmetic, engine-exact, fully
    pushdown-transparent (stays inside WholeStageCodegen with the scan)."""
    ev = load(spark, sf_dir, "events")
    v = F.col("value")
    return ev.select(
        "event_id",
        "user_id",
        "value",
        F.greatest(F.least(v, F.lit(200.0)), F.lit(50.0)).alias("clamped"),
        F.greatest(v, F.lit(50.0)).alias("clamp_min"),
        F.least(v, F.lit(200.0)).alias("clamp_max"),
    ).orderBy("event_id")


@query(
    "p18_offset_delta",
    oracle=f"""
    WITH s AS (
      SELECT user_id,
             SUM(CAST(CASE WHEN ts >= TIMESTAMP '2024-01-30'
                            AND ts < TIMESTAMP '2024-01-31'
                           THEN value ELSE 0 END AS DECIMAL(38,6))) AS cur,
             SUM(CAST(CASE WHEN ts >= TIMESTAMP '2024-01-29'
                            AND ts < TIMESTAMP '2024-01-30'
                           THEN value ELSE 0 END AS DECIMAL(38,6))) AS prev
      FROM events GROUP BY user_id)
    SELECT user_id, {dround_sql("CAST(cur AS DOUBLE)", 4)} AS sum_cur,
           {dround_sql("CAST(prev AS DOUBLE)", 4)} AS sum_prev,
           {dround_sql("CAST(cur - prev AS DOUBLE)", 4)} AS day_over_day
    FROM s ORDER BY user_id
    """,
)
def p18_offset_delta(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PromQL offset modifier: the same range expression evaluated now and
    shifted back 24h, compared per series (day-over-day drift — the
    alerting staple sum(x) - sum(x offset 1d)). ONE scan with two
    conditional decimal sums — not two scans joined — so the offset costs
    nothing extra; the difference is taken on exact decimals and rounded
    once."""
    ev = load(spark, sf_dir, "events")

    def win_sum(lo: str, hi: str):
        cond = (F.col("ts") >= F.lit(lo).cast("timestamp")) & (
            F.col("ts") < F.lit(hi).cast("timestamp")
        )
        return F.sum(F.when(cond, F.col("value")).otherwise(0.0).cast("decimal(38,6)"))

    s = ev.groupBy("user_id").agg(
        win_sum("2024-01-30", "2024-01-31").alias("cur"),
        win_sum("2024-01-29", "2024-01-30").alias("prev"),
    )
    return s.select(
        "user_id",
        dround(F.col("cur").cast("double"), 4).alias("sum_cur"),
        dround(F.col("prev").cast("double"), 4).alias("sum_prev"),
        dround((F.col("cur") - F.col("prev")).cast("double"), 4).alias("day_over_day"),
    ).orderBy("user_id")


@query(
    "p19_absent",
    oracle="""
    SELECT user_id FROM events
    GROUP BY user_id
    HAVING max(CASE WHEN ts >= TIMESTAMP '2024-01-30' THEN 1 ELSE 0 END) = 0
    ORDER BY user_id
    """,
)
def p19_absent(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PromQL absent()-style staleness report: series that exist in the
    corpus but produced NO samples in the current window (dead exporters —
    the alert Prometheus fires when a scrape target disappears). One scan,
    one hash agg with a conditional max — no join against an expected-set
    table, because the expected set IS the historical key domain."""
    ev = load(spark, sf_dir, "events")
    in_win = (F.col("ts") >= F.lit("2024-01-30").cast("timestamp")).cast("int")
    return (
        ev.groupBy("user_id")
        .agg(F.max(in_win).alias("seen"))
        .filter(F.col("seen") == 0)
        .select("user_id")
        .orderBy("user_id")
    )


@query(
    "p20_holt_winters",
    oracle=f"""
    WITH RECURSIVE base AS (
      SELECT user_id, list(CAST(value AS DOUBLE) ORDER BY ts, event_id) AS xs,
             CAST(count(*) AS BIGINT) AS n_samples
      FROM events GROUP BY user_id),
    fold AS (
      SELECT user_id, n_samples, xs, 1 AS i,
             xs[1] AS s, CAST(0.0 AS DOUBLE) AS b
      FROM base
      UNION ALL
      SELECT user_id, n_samples, xs, i + 1,
             CAST(0.4 * xs[i+1] + 0.6 * (s + b) AS DOUBLE),
             CAST(0.3 * ((0.4 * xs[i+1] + 0.6 * (s + b)) - s) + 0.7 * b AS DOUBLE)
      FROM fold WHERE i < n_samples)
    SELECT user_id, n_samples, {dround_sql("s", 6)} AS smoothed
    FROM fold WHERE i = n_samples ORDER BY user_id
    """,
)
def p20_holt_winters(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PromQL holt_winters(v, 0.4, 0.3): double exponential smoothing per
    series, emitting the smoothed level after the last sample. The
    recurrence is inherently sequential, so each series folds ONCE over
    its time-ordered samples via a JVM higher-order ``aggregate`` (struct
    accumulator carrying level + trend) — no Python, no window
    re-evaluation per row; the DuckDB twin is the same recurrence as a
    recursive CTE, so every IEEE step sees identical operands in
    identical order (init: level = first sample, trend = 0 in both
    engines). NOT list_reduce: DuckDB's list_reduce rebinds accumulator
    fields as each struct field is computed, so a lambda whose second
    field reads acc.s observes the NEW level — a mutation quirk the
    recursive-CTE formulation avoids. The
    per-series array is bounded by the range window in practice (PromQL
    evaluates over a range, not all history); ordering is made total by
    (ts, event_id) before the fold."""
    ev = load(spark, sf_dir, "events")
    xs = F.transform(
        F.array_sort(
            F.collect_list(
                F.struct(
                    F.unix_micros("ts").alias("t"),
                    F.col("event_id").alias("e"),
                    F.col("value").cast("double").alias("v"),
                )
            )
        ),
        lambda r: r["v"],
    )
    st = F.aggregate(
        F.slice(F.col("xs"), 2, F.greatest(F.size("xs") - 1, F.lit(0))),
        F.struct(
            F.element_at(F.col("xs"), 1).alias("s"),
            F.lit(0.0).alias("b"),
        ),
        lambda acc, v: F.struct(
            (F.lit(0.4) * v + F.lit(0.6) * (acc["s"] + acc["b"])).alias("s"),
            (
                F.lit(0.3)
                * ((F.lit(0.4) * v + F.lit(0.6) * (acc["s"] + acc["b"])) - acc["s"])
                + F.lit(0.7) * acc["b"]
            ).alias("b"),
        ),
    )
    return (
        ev.groupBy("user_id")
        .agg(xs.alias("xs"), F.count(F.lit(1)).alias("n_samples"))
        .select(
            "user_id",
            "n_samples",
            dround(st["s"], 6).alias("smoothed"),
        )
        .orderBy("user_id")
    )


@query(
    "p21_changes",
    oracle="""
    WITH o AS (
      SELECT user_id, value,
             lag(value) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS pv
      FROM events)
    SELECT user_id,
           CAST(COALESCE(SUM(CASE WHEN pv IS NOT NULL AND value <> pv
                                  THEN 1 ELSE 0 END), 0) AS BIGINT) AS n_changes
    FROM o GROUP BY user_id ORDER BY user_id
    """,
)
def p21_changes(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PromQL changes(v[range]): how many times each series' value CHANGED
    (flapping detector — config reloads, leader elections). One lag window
    per series + one hash agg; the comparison is raw-double equality on
    the SAME stored bits in both engines, so no epsilon is needed — the
    only hazard would be computed floats, and none are computed here."""
    ev = load(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    o = ev.select("user_id", "value", F.lag("value").over(w).alias("pv"))
    return (
        o.groupBy("user_id")
        .agg(
            F.coalesce(
                F.sum(
                    (F.col("pv").isNotNull() & (F.col("value") != F.col("pv"))).cast(
                        "long"
                    )
                ),
                F.lit(0),
            ).alias("n_changes")
        )
        .orderBy("user_id")
    )


@query(
    "p22_count_values",
    oracle="""
    WITH last AS (
      SELECT user_id, value FROM (
        SELECT user_id, value,
               row_number() OVER
                 (PARTITION BY user_id ORDER BY ts DESC, event_id DESC) AS rn
        FROM events) WHERE rn = 1)
    SELECT CAST(floor(value / 50.0) * 50 AS BIGINT) AS value_bucket,
           CAST(count(*) AS BIGINT) AS n_series
    FROM last GROUP BY value_bucket ORDER BY value_bucket
    """,
)
def p22_count_values(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PromQL count_values("le", v): histogram of the CURRENT instant
    vector — how many series sit at each value right now (version-skew /
    capacity panels). Composition of the p4 instant-read (max_by over a
    (ts, event_id) struct — hash agg, no sort) and one more tiny hash agg
    over the bucketed value; bucketing by floor-division is exact on
    IEEE doubles in both engines."""
    ev = load(spark, sf_dir, "events")
    last = ev.groupBy("user_id").agg(
        F.expr("max_by(value, struct(ts, event_id))").alias("value")
    )
    return (
        last.select(
            (F.floor(F.col("value") / F.lit(50.0)) * 50).cast("long").alias("value_bucket")
        )
        .groupBy("value_bucket")
        .agg(F.count(F.lit(1)).alias("n_series"))
        .orderBy("value_bucket")
    )


@query(
    "p23_stddev_over_time",
    oracle=f"""
    WITH s AS (
      SELECT user_id, CAST(FLOOR(value * 100) AS BIGINT) AS y FROM events),
    a AS (
      SELECT user_id, CAST(COUNT(*) AS BIGINT) AS n,
             CAST(SUM(y) AS BIGINT) AS sy, CAST(SUM(y * y) AS BIGINT) AS syy
      FROM s GROUP BY user_id)
    SELECT user_id,
           {dround_sql("sqrt(CAST(n * syy - sy * sy AS DOUBLE)) / CAST(n AS DOUBLE) / 100.0", 6)} AS stddev,
           {dround_sql("CAST(n * syy - sy * sy AS DOUBLE) / CAST(n * n AS DOUBLE) / 10000.0", 6)} AS stdvar
    FROM a WHERE n >= 1 ORDER BY user_id
    """,
)
def p23_stddev_over_time(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PromQL stddev_over_time / stdvar_over_time: population deviation per
    series, the dispersion half of the z-score alert (p12 consumes it).
    Same integer-exact discipline as the p14 regression family: centi-
    quantized values make n/sy/syy exact BIGINTs in both engines, so the
    variance numerator n*syy - sy^2 is bit-identical; the final
    sqrt-and-scale is IEEE-correctly-rounded from identical operands.
    One partial+final hash agg — five-long state per series, no window."""
    ev = load(spark, sf_dir, "events")
    s = ev.select("user_id", F.floor(F.col("value") * 100).cast("long").alias("y"))
    a = s.groupBy("user_id").agg(
        F.count(F.lit(1)).alias("n"),
        F.sum("y").alias("sy"),
        F.sum(F.col("y") * F.col("y")).alias("syy"),
    )
    num = (F.col("n") * F.col("syy") - F.col("sy") * F.col("sy")).cast("double")
    return (
        a.filter(F.col("n") >= 1)
        .select(
            "user_id",
            dround(
                F.sqrt(num) / F.col("n").cast("double") / F.lit(100.0), 6
            ).alias("stddev"),
            dround(
                num / (F.col("n") * F.col("n")).cast("double") / F.lit(10000.0), 6
            ).alias("stdvar"),
        )
        .orderBy("user_id")
    )


@query(
    "p24_range_aggregates",
    oracle=f"""
    SELECT user_id,
           CAST(count(*) AS BIGINT) AS n_samples,
           min(value) AS min_v, max(value) AS max_v,
           {dsum_sql("value")} AS sum_v,
           (SELECT e2.value FROM events e2 WHERE e2.user_id = e.user_id
            ORDER BY e2.ts DESC, e2.event_id DESC LIMIT 1) AS last_v
    FROM events e GROUP BY user_id ORDER BY user_id
    """,
)
def p24_range_aggregates(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PromQL min/max/sum/count/last_over_time in ONE pass: the whole
    *_over_time family shares a single partial+final hash agg (min and max
    select stored doubles — exact; the sum accumulates in decimal; last is
    the max_by instant-read). Five range functions, one shuffle — the
    fused form a dashboard row of sparkline panels compiles to."""
    ev = load(spark, sf_dir, "events")
    return (
        ev.groupBy("user_id")
        .agg(
            F.count(F.lit(1)).alias("n_samples"),
            F.min("value").alias("min_v"),
            F.max("value").alias("max_v"),
            dsum(F.col("value")).alias("sum_v"),
            F.expr("max_by(value, struct(ts, event_id))").alias("last_v"),
        )
        .orderBy("user_id")
    )


@query(
    "p25_hourly_profile",
    oracle=f"""
    SELECT CAST(hour(ts) AS INTEGER) AS hour_of_day, event_type,
           CAST(count(*) AS BIGINT) AS n,
           {dsum_sql("value")} AS sum_v
    FROM events GROUP BY hour_of_day, event_type
    ORDER BY hour_of_day, event_type
    """,
)
def p25_hourly_profile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Diurnal load profile: sample volume by hour-of-day x type — the
    capacity-planning heatmap behind every traffic dashboard (and the
    date-part half of the PromQL time-function family: hour()/
    day_of_week() routed into a grouping key). Timestamps are UTC in both
    engines (session.py pins spark.sql.session.timeZone), so the hour
    extraction is engine-exact; one map-side-partial hash agg on a
    48-key domain — at 100 TB this is the textbook near-free aggregate."""
    ev = load(spark, sf_dir, "events")
    return (
        ev.groupBy(
            F.hour("ts").alias("hour_of_day"), F.col("event_type")
        )
        .agg(F.count(F.lit(1)).alias("n"), dsum(F.col("value")).alias("sum_v"))
        .orderBy("hour_of_day", "event_type")
    )


@query(
    "x73_downsample_tiers",
    oracle=f"""
    WITH t5 AS (
      SELECT time_bucket(INTERVAL '5 minutes', ts) AS bucket_start, event_type,
             CAST(count(*) AS BIGINT) AS n,
             SUM(CAST(value AS DECIMAL(38,6))) AS s,
             min(value) AS min_v, max(value) AS max_v
      FROM events GROUP BY bucket_start, event_type),
    t1h AS (
      SELECT time_bucket(INTERVAL '1 hour', ts) AS bucket_start, event_type,
             CAST(count(*) AS BIGINT) AS n,
             SUM(CAST(value AS DECIMAL(38,6))) AS s,
             min(value) AS min_v, max(value) AS max_v
      FROM events GROUP BY bucket_start, event_type),
    t1d AS (
      SELECT time_bucket(INTERVAL '1 day', ts) AS bucket_start, event_type,
             CAST(count(*) AS BIGINT) AS n,
             SUM(CAST(value AS DECIMAL(38,6))) AS s,
             min(value) AS min_v, max(value) AS max_v
      FROM events GROUP BY bucket_start, event_type)
    SELECT tier, bucket_start, event_type, n,
           {dround_sql("CAST(s AS DOUBLE)", 4)} AS sum_v, min_v, max_v
    FROM (
      SELECT '5m' AS tier, * FROM t5
      UNION ALL SELECT '1h', * FROM t1h
      UNION ALL SELECT '1d', * FROM t1d)
    ORDER BY tier, bucket_start, event_type
    """,
)
def x73_downsample_tiers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Tiered downsampling (the hypertable continuous-aggregate /
    metrics-retention story): 5-minute rollups computed from raw events,
    then the 1-hour tier RE-AGGREGATED FROM THE 5-MINUTE PARTIALS and the
    1-day tier from the 1-hour tier — raw data is scanned exactly ONCE;
    every coarser tier reads the tier below (count sums, decimal sums
    add exactly, min/max fold), which is why a 100 TB metrics store can
    afford all three tiers: the 5m tier is ~|raw|/300 rows, 1h is /12 of
    that, and each rollup is a near-free hash agg on already-tiny input.
    The DuckDB oracle computes every tier flat from raw — decomposable
    aggregates make hierarchical == flat bit-exactly, which is precisely
    the property the tiering relies on."""
    ev = load(spark, sf_dir, "events")
    dec = "decimal(38,6)"

    t5 = ev.groupBy(
        F.window("ts", "5 minutes")["start"].alias("bucket_start"),
        "event_type",
    ).agg(
        F.count(F.lit(1)).alias("n"),
        F.sum(F.col("value").cast(dec)).alias("s"),
        F.min("value").alias("min_v"),
        F.max("value").alias("max_v"),
    )
    # the 5m tier feeds its own emit branch AND the 1h rollup (which feeds
    # 1d): without a persist Catalyst expands each union branch into its own
    # full raw scan (verified: 3x "Scan parquet", zero ReusedExchange even
    # under AQE). Persisting the ~|raw|/300-row tier makes "raw scanned
    # once" literally true — in a real retention pipeline each tier is
    # written out as a table anyway, which is this persist's durable form.
    t5 = t5.persist()

    def rollup_from(lower: DataFrame, trunc: str) -> DataFrame:
        return lower.groupBy(
            F.date_trunc(trunc, "bucket_start").alias("bucket_start"),
            "event_type",
        ).agg(
            F.sum("n").alias("n"),
            F.sum("s").cast(dec).alias("s"),
            F.min("min_v").alias("min_v"),
            F.max("max_v").alias("max_v"),
        )

    t1h = rollup_from(t5, "hour")
    t1d = rollup_from(t1h, "day")

    def emit(df: DataFrame, tier: str) -> DataFrame:
        return df.select(
            F.lit(tier).alias("tier"),
            "bucket_start",
            "event_type",
            "n",
            dround(F.col("s").cast("double"), 4).alias("sum_v"),
            "min_v",
            "max_v",
        )

    return (
        emit(t5, "5m")
        .unionAll(emit(t1h, "1h"))
        .unionAll(emit(t1d, "1d"))
        .orderBy("tier", "bucket_start", "event_type")
    )


@query(
    "x78_series_correlation_matrix",
    oracle=f"""
    WITH s AS (
      SELECT event_type AS et, CAST(FLOOR(epoch_ms(ts) / 600000) AS BIGINT) AS bk,
             CAST(SUM(CAST(FLOOR(value * 100) AS BIGINT)) AS HUGEINT) AS v
      FROM events GROUP BY 1, 2),
    j AS (SELECT a.et AS etype_a, b.et AS etype_b, a.v AS x, b.v AS y
          FROM s a JOIN s b ON a.bk = b.bk AND a.et < b.et),
    g AS (SELECT etype_a, etype_b, CAST(count(*) AS HUGEINT) AS n,
                 SUM(x) AS sx, SUM(y) AS sy, SUM(x*y) AS sxy,
                 SUM(x*x) AS sxx, SUM(y*y) AS syy
          FROM j GROUP BY 1, 2)
    SELECT etype_a, etype_b, CAST(n AS BIGINT) AS n_buckets,
           {dround_sql(
               "CAST(n*sxy - sx*sy AS DOUBLE) / "
               "sqrt(CAST(n*sxx - sx*sx AS DOUBLE) * CAST(n*syy - sy*sy AS DOUBLE))",
               6,
           )} AS corr
    FROM g ORDER BY etype_a, etype_b
    """,
)
def x78_series_correlation_matrix(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pairwise Pearson correlation between metric series (the 'which
    metrics move together' dashboard companion — PromQL has no corr();
    TimescaleDB ships stats_agg/corr for exactly this). Series = per-type
    10-minute rollups with integer-quantized values; all five correlation
    sums (n, Σx, Σy, Σxy, Σx², Σy²) accumulate EXACTLY in DECIMAL(38,0)
    (HUGEINT in DuckDB), so both engines feed bit-identical integers into
    one IEEE sqrt/divide — the same discipline as p14/p15. Plan: one hash
    agg to K×buckets rollup rows, one bucket-aligned self-join (K small —
    output is inherently O(K²) pairs), one pair agg. At 100 TB the rollup
    is the only pass over raw data."""
    ev = load(spark, sf_dir, "events")
    dec = "decimal(38,0)"
    s = (
        ev.select(
            F.col("event_type").alias("et"),
            F.floor(F.unix_millis("ts") / F.lit(600_000)).cast("long").alias("bk"),
            F.floor(F.col("value") * 100).cast("long").alias("y"),
        )
        .groupBy("et", "bk")
        .agg(F.sum("y").cast(dec).alias("v"))
    )
    a, b = s.alias("a"), s.alias("b")
    g = (
        a.join(b, (F.col("a.bk") == F.col("b.bk")) & (F.col("a.et") < F.col("b.et")))
        .groupBy(F.col("a.et").alias("etype_a"), F.col("b.et").alias("etype_b"))
        .agg(
            F.count(F.lit(1)).cast(dec).alias("n"),
            F.sum(F.col("a.v")).alias("sx"),
            F.sum(F.col("b.v")).alias("sy"),
            F.sum(F.col("a.v") * F.col("b.v")).alias("sxy"),
            F.sum(F.col("a.v") * F.col("a.v")).alias("sxx"),
            F.sum(F.col("b.v") * F.col("b.v")).alias("syy"),
        )
    )
    num = (F.col("n") * F.col("sxy") - F.col("sx") * F.col("sy")).cast("double")
    var_x = (F.col("n") * F.col("sxx") - F.col("sx") * F.col("sx")).cast("double")
    var_y = (F.col("n") * F.col("syy") - F.col("sy") * F.col("sy")).cast("double")
    return g.select(
        "etype_a",
        "etype_b",
        F.col("n").cast("long").alias("n_buckets"),
        dround(num / F.sqrt(var_x * var_y), 6).alias("corr"),
    ).orderBy("etype_a", "etype_b")


@query(
    "p26_quantile_across_series",
    oracle="""
    WITH s AS (
      SELECT CAST(FLOOR(epoch_ms(ts) / 3600000) AS BIGINT) AS bk, user_id,
             CAST(SUM(CAST(FLOOR(value * 100) AS BIGINT)) AS BIGINT) AS v
      FROM events GROUP BY 1, 2),
    r AS (SELECT bk, v,
                 row_number() OVER (PARTITION BY bk ORDER BY v, user_id) AS rn,
                 count(*) OVER (PARTITION BY bk) AS n
          FROM s)
    SELECT bk, CAST(max(n) AS BIGINT) AS n_series,
           min(CASE WHEN rn = CAST(ceil(0.50 * n) AS BIGINT) THEN v END) AS q50,
           min(CASE WHEN rn = CAST(ceil(0.90 * n) AS BIGINT) THEN v END) AS q90,
           min(CASE WHEN rn = CAST(ceil(0.99 * n) AS BIGINT) THEN v END) AS q99
    FROM r GROUP BY bk ORDER BY bk
    """,
)
def p26_quantile_across_series(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PromQL quantile(phi, metric) by (bucket): the ACROSS-series
    quantile (p10/p13 are along-time). Per-user hourly totals are the
    series; each bucket reports nearest-rank (exact, discrete) q50/q90/q99
    — value at row_number ceil(phi*n) ordered by (value, user_id), the
    SAME explicit construction in both engines, so tie-handling and
    interpolation can't diverge (quantile_disc/percentile built-ins
    differ across engines on exactly those points). Integer-quantized
    values => BIGINT all the way. Plan: one hash agg + one per-bucket
    window sort + one final agg; at 100 TB the window partitions by
    bucket — bounded by series count, never by raw rows."""
    ev = load(spark, sf_dir, "events")
    s = (
        ev.select(
            F.floor(F.unix_millis("ts") / F.lit(3_600_000)).cast("long").alias("bk"),
            "user_id",
            F.floor(F.col("value") * 100).cast("long").alias("y"),
        )
        .groupBy("bk", "user_id")
        .agg(F.sum("y").alias("v"))
    )
    w = Window.partitionBy("bk").orderBy("v", "user_id")
    r = s.select(
        "bk",
        "v",
        F.row_number().over(w).alias("rn"),
        F.count(F.lit(1)).over(Window.partitionBy("bk")).alias("n"),
    )

    def pick(phi: float):
        return F.min(
            F.when(F.col("rn") == F.ceil(F.lit(phi) * F.col("n")).cast("long"), F.col("v"))
        )

    return (
        r.groupBy("bk")
        .agg(
            F.max("n").cast("long").alias("n_series"),
            pick(0.50).alias("q50"),
            pick(0.90).alias("q90"),
            pick(0.99).alias("q99"),
        )
        .orderBy("bk")
    )


@query(
    "p27_mad_anomalies",
    oracle="""
    WITH s AS (
      SELECT event_id, user_id, CAST(FLOOR(value * 100) AS BIGINT) AS y
      FROM events),
    r1 AS (SELECT *, row_number() OVER (PARTITION BY user_id ORDER BY y, event_id) AS rn,
                    count(*) OVER (PARTITION BY user_id) AS n
           FROM s),
    med AS (SELECT user_id, min(CASE WHEN rn = CAST(ceil(0.5 * n) AS BIGINT) THEN y END) AS med
            FROM r1 GROUP BY user_id),
    d AS (SELECT s.event_id, s.user_id, s.y, med.med, abs(s.y - med.med) AS dev
          FROM s JOIN med USING (user_id)),
    r2 AS (SELECT *, row_number() OVER (PARTITION BY user_id ORDER BY dev, event_id) AS rn,
                    count(*) OVER (PARTITION BY user_id) AS n
           FROM d),
    mad AS (SELECT user_id, min(CASE WHEN rn = CAST(ceil(0.5 * n) AS BIGINT) THEN dev END) AS mad
            FROM r2 GROUP BY user_id)
    SELECT d.event_id, d.user_id, d.y, d.med, mad.mad
    FROM d JOIN mad USING (user_id)
    WHERE d.dev > 3 * mad.mad
    ORDER BY d.event_id
    """,
)
def p27_mad_anomalies(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Robust per-series anomaly detection: |y - median| > 3 x MAD (median
    absolute deviation). The robust twin of p12's z-score — mean/stddev
    are themselves dragged by the outliers they're meant to flag; median/
    MAD have a 50% breakdown point. Both medians are nearest-rank
    (rank ceil(n/2) ordered by (value, event_id)) on integer-quantized
    values — the same explicit construction in both engines, everything
    BIGINT until the final comparison, so no float divergence is
    possible. Plan: two per-series window sorts + one join back; at
    100 TB both windows partition by series key, never a global sort."""
    ev = load(spark, sf_dir, "events")
    s = ev.select(
        "event_id", "user_id", F.floor(F.col("value") * 100).cast("long").alias("y")
    )

    def nearest_rank_median(df: DataFrame, col: str, out: str) -> DataFrame:
        w = Window.partitionBy("user_id").orderBy(col, "event_id")
        r = df.select(
            "user_id",
            F.col(col),
            F.row_number().over(w).alias("rn"),
            F.count(F.lit(1)).over(Window.partitionBy("user_id")).alias("n"),
        )
        return r.groupBy("user_id").agg(
            F.min(
                F.when(
                    F.col("rn") == F.ceil(F.lit(0.5) * F.col("n")).cast("long"),
                    F.col(col),
                )
            ).alias(out)
        )

    med = nearest_rank_median(s, "y", "med")
    d = s.join(med, "user_id").withColumn("dev", F.abs(F.col("y") - F.col("med")))
    mad = nearest_rank_median(
        d.select("user_id", "dev", "event_id"), "dev", "mad"
    )
    return (
        d.join(mad, "user_id")
        .filter(F.col("dev") > 3 * F.col("mad"))
        .select("event_id", "user_id", "y", "med", "mad")
        .orderBy("event_id")
    )


_PK_SQL = "CAST(epoch_us(ts) AS HUGEINT) * 10000000 + event_id"


@query(
    "x82_ordered_funnel",
    oracle=f"""
    WITH e AS (SELECT user_id, event_type, ts, event_id, {_PK_SQL} AS pk FROM events),
    s1 AS (SELECT user_id, min(pk) AS pk1 FROM e WHERE event_type = 'view' GROUP BY user_id),
    s2 AS (SELECT e.user_id, min(pk) AS pk2 FROM e JOIN s1 USING (user_id)
           WHERE event_type = 'click' AND pk > pk1 GROUP BY e.user_id),
    s3 AS (SELECT e.user_id, min(pk) AS pk3 FROM e JOIN s2 USING (user_id)
           WHERE event_type = 'purchase' AND pk > pk2 GROUP BY e.user_id)
    SELECT u.user_id,
           CAST(s1.user_id IS NOT NULL AS BIGINT) AS reached_view,
           CAST(s2.user_id IS NOT NULL AS BIGINT) AS reached_click,
           CAST(s3.user_id IS NOT NULL AS BIGINT) AS reached_purchase,
           CAST(CASE WHEN s3.pk3 IS NOT NULL
                THEN (s3.pk3 // 10000000 - s1.pk1 // 10000000) // 1000000 END AS BIGINT)
             AS secs_to_convert
    FROM (SELECT DISTINCT user_id FROM e) u
    LEFT JOIN s1 USING (user_id) LEFT JOIN s2 USING (user_id) LEFT JOIN s3 USING (user_id)
    ORDER BY user_id
    """,
)
def x82_ordered_funnel(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Three-step ORDERED funnel (ClickHouse windowFunnel shape): per user,
    the earliest view, the earliest click strictly AFTER that view, the
    earliest purchase strictly after that click — x41's two-step funnel
    generalized to strict event-order chains. Each step is one min-agg
    over a (ts, event_id)-packed DECIMAL(38,0) ordinal (the x75 idiom:
    exact, total order, engine-identical tie-breaks), joined back on
    user_id — three hash aggs + three joins all on the same key, which
    at 100 TB is one partitioning reused across every step, never a
    per-user sort or a range join."""
    ev = load(spark, sf_dir, "events")
    pk = (
        F.unix_micros("ts").cast("decimal(38,0)") * F.lit(10_000_000) + F.col("event_id")
    )
    e = ev.select("user_id", "event_type", pk.alias("pk"))
    s1 = (
        e.filter(F.col("event_type") == "view")
        .groupBy("user_id")
        .agg(F.min("pk").alias("pk1"))
    )
    s2 = (
        e.join(s1, "user_id")
        .filter((F.col("event_type") == "click") & (F.col("pk") > F.col("pk1")))
        .groupBy("user_id")
        .agg(F.min("pk").alias("pk2"))
    )
    s3 = (
        e.join(s2, "user_id")
        .filter((F.col("event_type") == "purchase") & (F.col("pk") > F.col("pk2")))
        .groupBy("user_id")
        .agg(F.min("pk").alias("pk3"))
    )
    u = e.select("user_id").distinct()
    out = (
        u.join(s1, "user_id", "left")
        .join(s2, "user_id", "left")
        .join(s3, "user_id", "left")
    )
    secs = F.floor(
        (F.floor(F.col("pk3") / 10_000_000) - F.floor(F.col("pk1") / 10_000_000))
        / 1_000_000
    ).cast("long")
    return out.select(
        "user_id",
        F.col("pk1").isNotNull().cast("long").alias("reached_view"),
        F.col("pk2").isNotNull().cast("long").alias("reached_click"),
        F.col("pk3").isNotNull().cast("long").alias("reached_purchase"),
        F.when(F.col("pk3").isNotNull(), secs).alias("secs_to_convert"),
    ).orderBy("user_id")


@query(
    "x83_top_session_paths",
    oracle=f"""
    WITH e AS (
      SELECT user_id, event_type, ts, event_id,
             CASE WHEN epoch_us(ts) - lag(epoch_us(ts))
                    OVER (PARTITION BY user_id ORDER BY ts, event_id)
                  > 1800000000 THEN 1 ELSE 0 END AS brk
      FROM events),
    s AS (SELECT *, sum(brk) OVER (PARTITION BY user_id ORDER BY ts, event_id
                 ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS sess
          FROM e),
    p AS (SELECT user_id, sess,
                 string_agg(event_type, '->' ORDER BY ts, event_id) AS path
          FROM s GROUP BY user_id, sess),
    c AS (SELECT path, CAST(count(*) AS BIGINT) AS n_sessions FROM p GROUP BY path)
    SELECT path, n_sessions FROM c
    ORDER BY n_sessions DESC, path LIMIT 10
    """,
)
def x83_top_session_paths(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-10 most common session event paths (path analysis): sessionize
    on 30-minute inactivity gaps (the x41 lag+cumsum idiom, integer
    microseconds), concatenate each session's event types in (ts,
    event_id) order, count identical paths. Path assembly is
    array_join(transform(array_sort(collect_list(struct(...))))) — the
    struct sort key makes the order deterministic under any partitioning
    (plain collect_list order is not). One user-partitioned window + two
    hash aggs + TakeOrdered(10): nothing global except the 10-row sort."""
    ev = load(spark, sf_dir, "events")
    us = F.unix_micros("ts")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    brk = (
        F.when(us - F.lag(us).over(w) > 1_800_000_000, F.lit(1)).otherwise(F.lit(0))
    )
    s = ev.select("user_id", "event_type", "ts", "event_id", brk.alias("brk")).select(
        "user_id",
        "event_type",
        "ts",
        "event_id",
        F.sum("brk").over(w.rowsBetween(Window.unboundedPreceding, Window.currentRow)).alias("sess"),
    )
    p = (
        s.groupBy("user_id", "sess")
        .agg(
            F.array_join(
                F.transform(
                    F.array_sort(
                        F.collect_list(F.struct(F.unix_micros("ts").alias("t"), F.col("event_id").alias("i"), F.col("event_type").alias("et")))
                    ),
                    lambda x: x["et"],
                ),
                "->",
            ).alias("path")
        )
    )
    return (
        p.groupBy("path")
        .agg(F.count(F.lit(1)).alias("n_sessions"))
        .orderBy(F.col("n_sessions").desc(), "path")
        .limit(10)
    )


@query(
    "x84_decay_score",
    oracle="""
    WITH e AS (SELECT user_id,
                      CAST(FLOOR(epoch_us(ts) / 86400000000) AS BIGINT) AS d
               FROM events),
    mx AS (SELECT max(d) AS md FROM e),
    t AS (SELECT user_id, md - d AS age FROM e, mx WHERE md - d <= 40)
    SELECT user_id,
           CAST(sum(CAST(2 AS BIGINT) ** (40 - age)) AS BIGINT) AS score_scaled,
           CAST(sum(CAST(2 AS BIGINT) ** (40 - age)) AS DOUBLE) / 1099511627776.0
             AS score
    FROM t GROUP BY user_id ORDER BY user_id
    """,
)
def x84_decay_score(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-user exponential time-decay engagement score with a one-day
    half-life: score = sum over events of 2^(-age_days), ages measured
    from the corpus max day, cutoff at 40 days (older events contribute
    0 — documented horizon). The decay sum is computed as an INTEGER:
    sum of 2^(40-age) in BIGINT (exact, order-independent), divided by
    2^40 once at the end — a dyadic rational that doubles represent
    exactly, so both engines emit bit-identical scores with no decimal
    machinery and no float-sum ordering hazard. One scalar max + one
    hash agg; the decay weighting is map-side arithmetic."""
    ev = load(spark, sf_dir, "events")
    e = ev.select(
        "user_id",
        F.floor(F.unix_micros("ts") / F.lit(86_400_000_000)).cast("long").alias("d"),
    )
    mx = e.agg(F.max("d").alias("md"))
    t = (
        e.crossJoin(F.broadcast(mx))
        .select("user_id", (F.col("md") - F.col("d")).alias("age"))
        .filter(F.col("age") <= 40)
    )
    scaled = F.sum(F.pow(F.lit(2.0), (F.lit(40) - F.col("age")).cast("double")).cast("long"))
    return (
        t.groupBy("user_id")
        .agg(
            scaled.cast("long").alias("score_scaled"),
            (scaled.cast("double") / F.lit(1_099_511_627_776.0)).alias("score"),
        )
        .orderBy("user_id")
    )


@query(
    "p28_label_join",
    oracle="""
    SELECT event_id,
           event_type || '/' || CAST(user_id AS VARCHAR) AS series,
           value
    FROM events ORDER BY event_id
    """,
)
def p28_label_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PromQL label_join(v, dst, sep, src...): synthesize one label from
    several — pure map-side string concat, codegen-resident, closing the
    last named function in the PromQL surface (label_replace is p5)."""
    ev = load(spark, sf_dir, "events")
    return ev.select(
        "event_id",
        F.concat_ws("/", F.col("event_type"), F.col("user_id").cast("string")).alias(
            "series"
        ),
        "value",
    ).orderBy("event_id")


def _chi2_sql_expr() -> str:
    terms = []
    for k in range(4):
        for conv in ("a", "b"):  # converting / non-converting cells
            o = f"CAST({conv}{k} AS DOUBLE)"
            rowtot = "CAST(ta AS DOUBLE)" if conv == "a" else "CAST(tn - ta AS DOUBLE)"
            e = f"(CAST(n{k} AS DOUBLE) * {rowtot} / CAST(tn AS DOUBLE))"
            terms.append(f"(({o} - {e}) * ({o} - {e}) / {e})")
    return " + ".join(terms)


@query(
    "x94_conversion_chi2",
    oracle=f"""
    WITH u AS (
      SELECT user_id, CAST(user_id % 4 AS BIGINT) AS seg,
             CAST(max(CASE WHEN event_type = 'purchase' AND value > 200
                           THEN 1 ELSE 0 END) AS BIGINT)
               AS conv
      FROM events GROUP BY user_id),
    w AS (SELECT
        {", ".join(f"CAST(sum(CASE WHEN seg = {k} THEN conv ELSE 0 END) AS BIGINT) AS a{k}, "
                   f"CAST(sum(CASE WHEN seg = {k} THEN 1 - conv ELSE 0 END) AS BIGINT) AS b{k}, "
                   f"CAST(sum(CASE WHEN seg = {k} THEN 1 ELSE 0 END) AS BIGINT) AS n{k}"
                   for k in range(4))},
        CAST(sum(conv) AS BIGINT) AS ta, CAST(count(*) AS BIGINT) AS tn
      FROM u)
    SELECT tn AS n_users, ta AS n_converting,
           {{CHI}} AS chi2, CAST(3 AS BIGINT) AS dof
    FROM w
    """.replace("{CHI}", f"round({_chi2_sql_expr()}, 6)"),
)
def x94_conversion_chi2(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Chi-square homogeneity test of conversion rate across four user
    segments (the experiment-readout / cohort-drift significance number);
    'conversion' is a deliberately rare event (high-value purchase) so
    both contingency rows are populated.
    Per-user conversion flags aggregate to a 2x4 contingency table in
    ONE conditional-sum pass; the statistic is a single fixed-order
    arithmetic expression over those 10 integers — the Spark and DuckDB
    expression trees are generated from the SAME python loop, so the
    IEEE evaluation order is identical and the rounded statistic is
    engine-exact (no decimal machinery, no float aggregation). At
    100 TB: one user-keyed agg + one 1-row reduction."""
    ev = load(spark, sf_dir, "events")
    u = (
        ev.select(
            "user_id",
            (F.col("user_id") % 4).cast("long").alias("seg"),
            ((F.col("event_type") == "purchase") & (F.col("value") > 200))
            .cast("long")
            .alias("is_p"),
        )
        .groupBy("user_id", "seg")
        .agg(F.max("is_p").alias("conv"))
    )
    aggs = []
    for k in range(4):
        aggs += [
            F.sum(F.when(F.col("seg") == k, F.col("conv")).otherwise(0)).alias(f"a{k}"),
            F.sum(F.when(F.col("seg") == k, 1 - F.col("conv")).otherwise(0)).alias(f"b{k}"),
            F.sum(F.when(F.col("seg") == k, 1).otherwise(0)).alias(f"n{k}"),
        ]
    aggs += [F.sum("conv").alias("ta"), F.count(F.lit(1)).alias("tn")]
    w = u.agg(*aggs)
    chi = None
    for k in range(4):
        for conv in ("a", "b"):
            o = F.col(f"{conv}{k}").cast("double")
            rowtot = (
                F.col("ta").cast("double")
                if conv == "a"
                else (F.col("tn") - F.col("ta")).cast("double")
            )
            e = F.col(f"n{k}").cast("double") * rowtot / F.col("tn").cast("double")
            term = (o - e) * (o - e) / e
            chi = term if chi is None else chi + term
    return w.select(
        F.col("tn").alias("n_users"),
        F.col("ta").alias("n_converting"),
        F.round(chi, 6).alias("chi2"),
        F.lit(3).cast("long").alias("dof"),
    )


@query(
    "x95_histogram_export",
    oracle="""
    WITH b AS (SELECT unnest([50, 100, 200, 400, 1000000]) AS le),
    s AS (SELECT event_type, CAST(FLOOR(epoch_ms(ts) / 3600000) AS BIGINT) AS bk,
                 value
          FROM events)
    SELECT event_type, bk, CAST(le AS BIGINT) AS le,
           CAST(sum(CASE WHEN value <= le THEN 1 ELSE 0 END) AS BIGINT)
             AS cumulative_count
    FROM s CROSS JOIN b
    GROUP BY event_type, bk, le
    ORDER BY event_type, bk, le
    """,
)
def x95_histogram_export(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Prometheus-histogram EXPORT: raw samples -> cumulative le-bucket
    counts per (series, hour) — the inverse of p10's histogram_quantile
    (which consumes exactly this shape) and the reference exporter's
    missing histogram type (fastapi/main.py serves only gauge/counter).
    The bucket list is a 5-row broadcast; counts are one conditional
    hash agg — cumulative by construction (value <= le), so no window
    pass is needed. Integer counts only."""
    ev = load(spark, sf_dir, "events")
    buckets = spark.createDataFrame([(50,), (100,), (200,), (400,), (1_000_000,)], "le long")
    s = ev.select(
        "event_type",
        F.floor(F.unix_millis("ts") / F.lit(3_600_000)).cast("long").alias("bk"),
        "value",
    )
    return (
        s.crossJoin(F.broadcast(buckets))
        .groupBy("event_type", "bk", "le")
        .agg(
            F.sum((F.col("value") <= F.col("le")).cast("long")).alias("cumulative_count")
        )
        .orderBy("event_type", "bk", "le")
    )


@query(
    "x96_session_entry_exit",
    oracle="""
    WITH e AS (
      SELECT user_id, event_type, ts, event_id,
             CASE WHEN epoch_us(ts) - lag(epoch_us(ts))
                    OVER (PARTITION BY user_id ORDER BY ts, event_id)
                  > 1800000000 THEN 1 ELSE 0 END AS brk
      FROM events),
    s AS (SELECT *, sum(brk) OVER (PARTITION BY user_id ORDER BY ts, event_id
                 ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS sess
          FROM e),
    g AS (SELECT user_id, sess,
                 CAST(count(*) AS BIGINT) AS n_events,
                 min_by(event_type, CAST(epoch_us(ts) AS HUGEINT) * 10000000 + event_id)
                   AS entry_type,
                 max_by(event_type, CAST(epoch_us(ts) AS HUGEINT) * 10000000 + event_id)
                   AS exit_type
          FROM s GROUP BY user_id, sess)
    SELECT entry_type, exit_type,
           CAST(count(*) AS BIGINT) AS n_sessions,
           CAST(sum(CASE WHEN n_events = 1 THEN 1 ELSE 0 END) AS BIGINT)
             AS n_bounces
    FROM g GROUP BY entry_type, exit_type
    ORDER BY entry_type, exit_type
    """,
)
def x96_session_entry_exit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Session entry/exit matrix with bounce counts (the landing-page /
    exit-page product report): sessionize on 30-minute gaps (the shared
    x41/x83 idiom), take each session's first and last event type via
    min_by/max_by on the exact (epoch_us, event_id) ordering tuple —
    supported identically in Spark 4 and DuckDB, no collect/sort per
    session — and aggregate to the entry x exit grid. One user-
    partitioned window + two hash aggs."""
    ev = load(spark, sf_dir, "events")
    us = F.unix_micros("ts")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    brk = F.when(us - F.lag(us).over(w) > 1_800_000_000, F.lit(1)).otherwise(F.lit(0))
    s = ev.select(
        "user_id", "event_type", "ts", "event_id", brk.alias("brk")
    ).select(
        "user_id",
        "event_type",
        "ts",
        "event_id",
        F.sum("brk")
        .over(w.rowsBetween(Window.unboundedPreceding, Window.currentRow))
        .alias("sess"),
    )
    ordk = (
        F.unix_micros("ts").cast("decimal(38,0)") * F.lit(10_000_000) + F.col("event_id")
    )
    g = s.groupBy("user_id", "sess").agg(
        F.count(F.lit(1)).alias("n_events"),
        F.min_by("event_type", ordk).alias("entry_type"),
        F.max_by("event_type", ordk).alias("exit_type"),
    )
    return (
        g.groupBy("entry_type", "exit_type")
        .agg(
            F.count(F.lit(1)).alias("n_sessions"),
            F.sum((F.col("n_events") == 1).cast("long")).alias("n_bounces"),
        )
        .orderBy("entry_type", "exit_type")
    )


@query(
    "x98_rfm_segments",
    oracle="""
    WITH mx AS (SELECT CAST(max(FLOOR(epoch_us(ts) / 86400000000)) AS BIGINT) AS md
                FROM events),
    u AS (SELECT user_id,
                 md - CAST(max(FLOOR(epoch_us(ts) / 86400000000)) AS BIGINT)
                   AS recency_days,
                 CAST(sum(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END)
                      AS BIGINT) AS frequency,
                 CAST(COALESCE(sum(CASE WHEN event_type = 'purchase'
                                        THEN CAST(FLOOR(value * 100) AS BIGINT) END), 0)
                      AS BIGINT) AS monetary_cents
          FROM events CROSS JOIN mx GROUP BY user_id, md),
    r AS (SELECT *,
            CAST(ceil(row_number() OVER (ORDER BY recency_days, user_id) * 4.0
                      / count(*) OVER ()) AS BIGINT) AS r_q,
            CAST(ceil(row_number() OVER (ORDER BY frequency DESC, user_id) * 4.0
                      / count(*) OVER ()) AS BIGINT) AS f_q,
            CAST(ceil(row_number() OVER (ORDER BY monetary_cents DESC, user_id) * 4.0
                      / count(*) OVER ()) AS BIGINT) AS m_q
          FROM u)
    SELECT user_id, recency_days, frequency, monetary_cents, r_q, f_q, m_q,
           CAST(r_q AS VARCHAR) || '-' || CAST(f_q AS VARCHAR) || '-' ||
             CAST(m_q AS VARCHAR) AS segment
    FROM r ORDER BY user_id
    """,
)
def x98_rfm_segments(spark: SparkSession, sf_dir: str) -> DataFrame:
    """RFM customer segmentation (recency / frequency / monetary
    quartiles — the workhorse marketing segmentation): per-user integer
    metrics (days-since-last-event off the corpus max day, purchase
    count, purchase cents), each quartiled by the EXPLICIT rank rule
    ceil(rank * 4 / n) with (metric, user_id) total ordering — the exact
    integer construction both engines compute identically, where ntile
    built-ins differ on remainder placement. Best segment = 1-1-1. One
    user agg + three rank windows over |users| rows (at 100 TB: the x58
    two-phase decomposition replaces the global windows)."""
    ev = load(spark, sf_dir, "events")
    day = F.floor(F.unix_micros("ts") / F.lit(86_400_000_000)).cast("long")
    mx = ev.agg(F.max(day).alias("md"))
    u = (
        ev.crossJoin(F.broadcast(mx))
        .groupBy("user_id", "md")
        .agg(
            (F.col("md") - F.max(day)).alias("recency_days"),
            F.sum((F.col("event_type") == "purchase").cast("long")).alias("frequency"),
            F.coalesce(
                F.sum(
                    F.when(
                        F.col("event_type") == "purchase",
                        F.floor(F.col("value") * 100).cast("long"),
                    )
                ),
                F.lit(0),
            ).alias("monetary_cents"),
        )
        .drop("md")
    )
    n = Window.partitionBy()

    def quart(order_cols, name):
        rk = F.row_number().over(Window.orderBy(*order_cols))
        return F.ceil(rk * 4.0 / F.count(F.lit(1)).over(n)).cast("long").alias(name)

    r = u.select(
        "*",
        quart([F.col("recency_days"), F.col("user_id")], "r_q"),
        quart([F.col("frequency").desc(), F.col("user_id")], "f_q"),
        quart([F.col("monetary_cents").desc(), F.col("user_id")], "m_q"),
    )
    return r.select(
        "user_id",
        "recency_days",
        "frequency",
        "monetary_cents",
        "r_q",
        "f_q",
        "m_q",
        F.concat_ws("-", "r_q", "f_q", "m_q").alias("segment"),
    ).orderBy("user_id")


@query(
    "x99_markov_eval",
    oracle="""
    WITH e AS (
      SELECT user_id, event_type, ts, event_id,
             lead(event_type) OVER (PARTITION BY user_id ORDER BY ts, event_id)
               AS next_type
      FROM events),
    t AS (SELECT event_type AS cur, next_type,
                 CAST(count(*) AS BIGINT) AS cnt
          FROM e WHERE next_type IS NOT NULL GROUP BY 1, 2),
    best AS (SELECT cur,
                    min(next_type) FILTER (cnt = mx) AS predicted
             FROM (SELECT *, max(cnt) OVER (PARTITION BY cur) AS mx FROM t)
             GROUP BY cur),
    scored AS (SELECT e.event_type AS cur, e.next_type, b.predicted
               FROM e JOIN best b ON b.cur = e.event_type
               WHERE e.next_type IS NOT NULL)
    SELECT cur, predicted,
           CAST(count(*) AS BIGINT) AS n_transitions,
           CAST(sum(CASE WHEN next_type = predicted THEN 1 ELSE 0 END) AS BIGINT)
             AS n_hits,
           CAST(sum(CASE WHEN next_type = predicted THEN 1 ELSE 0 END) * 1000000
                // count(*) AS BIGINT) AS hit_rate_ppm
    FROM scored GROUP BY cur, predicted ORDER BY cur
    """,
)
def x99_markov_eval(spark: SparkSession, sf_dir: str) -> DataFrame:
    """In-engine evaluation of the first-order Markov next-event model
    (x60's transition matrix turned into a predictor): per current type,
    predict the modal next type (ties to the lexicographically smallest —
    an explicit, engine-identical argmax), then score top-1 accuracy over
    every observed transition. Train and eval in one plan: the model is
    a K x K count table (broadcast-sized for any real event taxonomy),
    scoring is one join + one conditional agg, accuracy emitted as an
    exact ppm integer. The shape generalizes to any 'aggregate a model,
    join it back, score it' evaluation at 100 TB."""
    ev = load(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    e = ev.select(
        "event_type", F.lead("event_type").over(w).alias("next_type")
    ).filter(F.col("next_type").isNotNull())
    t = e.groupBy(F.col("event_type").alias("cur"), "next_type").agg(
        F.count(F.lit(1)).alias("cnt")
    )
    mx = t.withColumn("mx", F.max("cnt").over(Window.partitionBy("cur")))
    best = (
        mx.filter(F.col("cnt") == F.col("mx"))
        .groupBy("cur")
        .agg(F.min("next_type").alias("predicted"))
    )
    scored = e.join(F.broadcast(best), e.event_type == best.cur)
    return (
        scored.groupBy("cur", "predicted")
        .agg(
            F.count(F.lit(1)).alias("n_transitions"),
            F.sum((F.col("next_type") == F.col("predicted")).cast("long")).alias("n_hits"),
            F.floor(
                F.sum((F.col("next_type") == F.col("predicted")).cast("long"))
                * F.lit(1_000_000)
                / F.count(F.lit(1))
            )
            .cast("long")
            .alias("hit_rate_ppm"),
        )
        .orderBy("cur")
    )


# Poisson(1) inverse-CDF thresholds (cumulative), shared literal-for-literal
# by both engines so the per-(row, replicate) weights are identical.
_POIS = [
    0.36787944117144233,
    0.7357588823428846,
    0.9196986029286058,
    0.9810118431238462,
    0.9963401531726563,
    0.9994058151824183,
    0.9999167588507642,
    0.9999897508033253,
]


def _pois_case_sql(u: str) -> str:
    cases = " ".join(
        f"WHEN {u} < {t!r} THEN {k}" for k, t in enumerate(_POIS)
    )
    return f"(CASE {cases} ELSE 8 END)"


@query(
    "x100_bootstrap_ci",
    oracle=f"""
    WITH p AS (SELECT event_id, CAST(FLOOR(value * 100) AS BIGINT) AS y
               FROM events WHERE event_type = 'purchase'),
    r AS (SELECT p.event_id, p.y, b.b,
                 CAST(CAST('0x' || substring(md5(CAST(p.event_id AS VARCHAR)
                        || ':' || CAST(b.b AS VARCHAR)), 1, 13) AS BIGINT)
                      AS DOUBLE) / 4503599627370496.0 AS u
          FROM p CROSS JOIN (SELECT unnest(range(0, 32)) AS b) b),
    wtd AS (SELECT b, y, {_pois_case_sql("u")} AS w FROM r),
    reps AS (SELECT b, CAST(sum(w * y) AS BIGINT) AS swy,
                    CAST(sum(w) AS BIGINT) AS sw
             FROM wtd GROUP BY b),
    means AS (SELECT b, CAST(swy AS DOUBLE) / sw AS m FROM reps),
    ranked AS (SELECT m, row_number() OVER (ORDER BY m, b) AS rk FROM means),
    pt AS (SELECT CAST(count(*) AS BIGINT) AS n,
                  CAST(sum(y) AS BIGINT) AS sy FROM p)
    SELECT n,
           {dround_sql("CAST(sy AS DOUBLE) / n", 6)} AS mean_cents,
           {dround_sql("(SELECT min(CASE WHEN rk = 2 THEN m END) FROM ranked)", 6)} AS ci_lo,
           {dround_sql("(SELECT min(CASE WHEN rk = 31 THEN m END) FROM ranked)", 6)} AS ci_hi
    FROM pt
    """,
)
def x100_bootstrap_ci(spark: SparkSession, sf_dir: str) -> DataFrame:
    """90% bootstrap confidence interval for the mean purchase value via
    the POISSON bootstrap (Chamandy et al., the resampling scheme that
    works in one distributed pass: each row's multiplicity in replicate
    b is Poisson(1), independent per (row, replicate), so no global
    resample index is ever materialized). Determinism: the uniform is 52
    bits of md5(event_id:b) — exactly representable as a double — pushed
    through a literal-for-literal shared inverse-CDF table, so both
    engines draw IDENTICAL weights; replicate sums are pure integers and
    each replicate mean is one exact-integer division. CI bounds are
    nearest-rank over the 32 replicate means. At 100 TB: one explode by
    B and one hash agg — the bootstrap without a driver in the loop."""
    ev = load(spark, sf_dir, "events")
    p = ev.filter(F.col("event_type") == "purchase").select(
        "event_id", F.floor(F.col("value") * 100).cast("long").alias("y")
    )
    r = p.select(
        "event_id", "y", F.explode(F.sequence(F.lit(0), F.lit(31))).alias("b")
    ).withColumn(
        "u",
        F.conv(
            F.substring(
                F.md5(F.concat_ws(":", F.col("event_id"), F.col("b"))), 1, 13
            ),
            16,
            10,
        ).cast("double")
        / F.lit(4503599627370496.0),
    )
    w = F.lit(8)
    for k in range(len(_POIS) - 1, -1, -1):
        w = F.when(F.col("u") < _POIS[k], k).otherwise(w)
    reps = (
        r.withColumn("w", w)
        .groupBy("b")
        .agg(F.sum(F.col("w") * F.col("y")).alias("swy"), F.sum("w").alias("sw"))
        .select("b", (F.col("swy").cast("double") / F.col("sw")).alias("m"))
    )
    ranked = reps.select(
        "m", F.row_number().over(Window.orderBy("m", "b")).alias("rk")
    )
    lohi = ranked.agg(
        F.min(F.when(F.col("rk") == 2, F.col("m"))).alias("lo"),
        F.min(F.when(F.col("rk") == 31, F.col("m"))).alias("hi"),
    )
    pt = p.agg(F.count(F.lit(1)).alias("n"), F.sum("y").alias("sy"))
    return pt.crossJoin(F.broadcast(lohi)).select(
        "n",
        dround(F.col("sy").cast("double") / F.col("n"), 6).alias("mean_cents"),
        dround(F.col("lo"), 6).alias("ci_lo"),
        dround(F.col("hi"), 6).alias("ci_hi"),
    )


@query(
    "x101_lead_lag_xcorr",
    oracle=f"""
    WITH s AS (
      SELECT event_type AS et, CAST(FLOOR(epoch_ms(ts) / 3600000) AS BIGINT) AS bk,
             CAST(SUM(CAST(FLOOR(value * 100) AS BIGINT)) AS HUGEINT) AS v
      FROM events WHERE event_type IN ('click', 'purchase') GROUP BY 1, 2),
    lags AS (SELECT unnest(range(-3, 4)) AS lag),
    j AS (SELECT l.lag, a.v AS x, b.v AS y
          FROM s a JOIN lags l ON a.et = 'click'
          JOIN s b ON b.et = 'purchase' AND b.bk = a.bk + l.lag),
    g AS (SELECT lag, CAST(count(*) AS HUGEINT) AS n,
                 SUM(x) AS sx, SUM(y) AS sy, SUM(x*y) AS sxy,
                 SUM(x*x) AS sxx, SUM(y*y) AS syy
          FROM j GROUP BY lag)
    SELECT CAST(lag AS BIGINT) AS lag, CAST(n AS BIGINT) AS n_buckets,
           {dround_sql(
               "CAST(n*sxy - sx*sy AS DOUBLE) / "
               "sqrt(CAST(n*sxx - sx*sx AS DOUBLE) * CAST(n*syy - sy*sy AS DOUBLE))",
               6,
           )} AS xcorr
    FROM g ORDER BY lag
    """,
)
def x101_lead_lag_xcorr(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Lead-lag cross-correlation between the click and purchase series:
    corr(click[t], purchase[t+lag]) for lag in -3..+3 hours — the 'which
    metric leads which' diagnostic behind alerts-cause analysis and
    marketing-lag estimation (x78's correlation machinery swept across a
    shifted-bucket join). Same exactness scheme: all five sums in
    HUGEINT/DECIMAL, one IEEE sqrt per lag. The lag shift is pure key
    arithmetic (bk + lag) — seven joins' worth of work expressed as one
    join against a 7-row broadcast."""
    ev = load(spark, sf_dir, "events")
    dec = "decimal(38,0)"
    s = (
        ev.filter(F.col("event_type").isin("click", "purchase"))
        .select(
            F.col("event_type").alias("et"),
            F.floor(F.unix_millis("ts") / F.lit(3_600_000)).cast("long").alias("bk"),
            F.floor(F.col("value") * 100).cast("long").alias("y"),
        )
        .groupBy("et", "bk")
        .agg(F.sum("y").cast(dec).alias("v"))
    )
    lags = spark.range(-3, 4).select(F.col("id").alias("lag"))
    a = s.filter(F.col("et") == "click").select(F.col("bk").alias("abk"), F.col("v").alias("x"))
    b = s.filter(F.col("et") == "purchase").select(F.col("bk").alias("bbk"), F.col("v").alias("yv"))
    j = (
        a.crossJoin(F.broadcast(lags))
        .join(b, F.col("bbk") == F.col("abk") + F.col("lag"))
    )
    g = j.groupBy("lag").agg(
        F.count(F.lit(1)).cast(dec).alias("n"),
        F.sum("x").alias("sx"),
        F.sum("yv").alias("sy"),
        F.sum(F.col("x") * F.col("yv")).alias("sxy"),
        F.sum(F.col("x") * F.col("x")).alias("sxx"),
        F.sum(F.col("yv") * F.col("yv")).alias("syy"),
    )
    num = (F.col("n") * F.col("sxy") - F.col("sx") * F.col("sy")).cast("double")
    vx = (F.col("n") * F.col("sxx") - F.col("sx") * F.col("sx")).cast("double")
    vy = (F.col("n") * F.col("syy") - F.col("sy") * F.col("sy")).cast("double")
    return g.select(
        F.col("lag").cast("long").alias("lag"),
        F.col("n").cast("long").alias("n_buckets"),
        dround(num / F.sqrt(vx * vy), 6).alias("xcorr"),
    ).orderBy("lag")


@query(
    "x102_forecast_backtest",
    oracle="""
    WITH s AS (
      SELECT event_type AS et, CAST(FLOOR(epoch_ms(ts) / 3600000) AS BIGINT) AS bk,
             CAST(SUM(CAST(FLOOR(value * 100) AS BIGINT)) AS BIGINT) AS v
      FROM events GROUP BY 1, 2),
    w AS (SELECT et, bk, v,
                 lag(v, 1)  OVER (PARTITION BY et ORDER BY bk) AS naive_pred,
                 lag(v, 24) OVER (PARTITION BY et ORDER BY bk) AS seasonal_pred
          FROM s),
    e AS (SELECT et, abs(v - naive_pred) AS ae_n, abs(v - seasonal_pred) AS ae_s
          FROM w WHERE naive_pred IS NOT NULL AND seasonal_pred IS NOT NULL)
    SELECT et AS event_type,
           CAST(count(*) AS BIGINT) AS n_points,
           CAST(sum(ae_n) AS BIGINT) AS naive_abs_err,
           CAST(sum(ae_s) AS BIGINT) AS seasonal_abs_err,
           CAST(sum(ae_s) * 1000000 // sum(ae_n) AS BIGINT) AS mase_ppm
    FROM e GROUP BY et ORDER BY et
    """,
)
def x102_forecast_backtest(spark: SparkSession, sf_dir: str) -> DataFrame:
    """In-engine forecast backtest: one-step-ahead absolute error of the
    seasonal-naive predictor (value 24 hours ago) against the naive
    baseline (previous hour), per series — MASE-style ratio as an exact
    ppm integer (the denominator IS the naive error, per Hyndman's MASE
    definition). ppm < 1e6 means daily seasonality carries signal. All
    arithmetic on integer-quantized hourly sums: two lag windows on one
    per-series partitioning, one agg — a model-selection harness with no
    model artifacts."""
    ev = load(spark, sf_dir, "events")
    s = (
        ev.select(
            F.col("event_type").alias("et"),
            F.floor(F.unix_millis("ts") / F.lit(3_600_000)).cast("long").alias("bk"),
            F.floor(F.col("value") * 100).cast("long").alias("y"),
        )
        .groupBy("et", "bk")
        .agg(F.sum("y").alias("v"))
    )
    w = Window.partitionBy("et").orderBy("bk")
    e = (
        s.select(
            "et",
            "v",
            F.lag("v", 1).over(w).alias("naive_pred"),
            F.lag("v", 24).over(w).alias("seasonal_pred"),
        )
        .filter(F.col("naive_pred").isNotNull() & F.col("seasonal_pred").isNotNull())
        .select(
            "et",
            F.abs(F.col("v") - F.col("naive_pred")).alias("ae_n"),
            F.abs(F.col("v") - F.col("seasonal_pred")).alias("ae_s"),
        )
    )
    return (
        e.groupBy(F.col("et").alias("event_type"))
        .agg(
            F.count(F.lit(1)).alias("n_points"),
            F.sum("ae_n").alias("naive_abs_err"),
            F.sum("ae_s").alias("seasonal_abs_err"),
            F.floor(F.sum("ae_s") * F.lit(1_000_000) / F.sum("ae_n"))
            .cast("long")
            .alias("mase_ppm"),
        )
        .orderBy("event_type")
    )


@query(
    "p29_alert_firing",
    oracle="""
    WITH s AS (
      SELECT event_type AS et, CAST(FLOOR(epoch_ms(ts) / 600000) AS BIGINT) AS bk,
             CAST(count(*) AS BIGINT) AS n
      FROM events GROUP BY 1, 2),
    breach AS (SELECT et, bk FROM s WHERE n >= 3),
    runs AS (SELECT et, bk,
                    bk - row_number() OVER (PARTITION BY et ORDER BY bk) AS grp
             FROM breach),
    firing AS (SELECT et, min(bk) AS pending_since, max(bk) AS last_bk,
                      CAST(count(*) AS BIGINT) AS run_len
               FROM runs GROUP BY et, grp)
    SELECT et AS event_type, pending_since,
           pending_since + 3 AS firing_from, last_bk, run_len
    FROM firing WHERE run_len >= 4
    ORDER BY event_type, pending_since
    """,
)
def p29_alert_firing(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PromQL/Alertmanager 'for:' semantics — the alert-rule evaluator the
    reference's Grafana stack implies but the dashboard JSON only hints
    at: a rule (rate >= threshold) must hold for N CONSECUTIVE
    evaluation intervals before it fires (pending -> firing). Contiguous
    breach runs fall out of the classic gaps-and-islands trick
    (bk - row_number is constant within a run — one per-series window,
    no self-join); each run of >= 4 ten-minute buckets reports its
    pending start, firing transition, and length. Integer bucket ids
    only."""
    ev = load(spark, sf_dir, "events")
    s = (
        ev.select(
            F.col("event_type").alias("et"),
            F.floor(F.unix_millis("ts") / F.lit(600_000)).cast("long").alias("bk"),
        )
        .groupBy("et", "bk")
        .agg(F.count(F.lit(1)).alias("n"))
    )
    breach = s.filter(F.col("n") >= 3)
    w = Window.partitionBy("et").orderBy("bk")
    runs = breach.select(
        "et", "bk", (F.col("bk") - F.row_number().over(w)).alias("grp")
    )
    firing = runs.groupBy("et", "grp").agg(
        F.min("bk").alias("pending_since"),
        F.max("bk").alias("last_bk"),
        F.count(F.lit(1)).alias("run_len"),
    )
    return (
        firing.filter(F.col("run_len") >= 4)
        .select(
            F.col("et").alias("event_type"),
            "pending_since",
            (F.col("pending_since") + 3).alias("firing_from"),
            "last_bk",
            "run_len",
        )
        .orderBy("event_type", "pending_since")
    )


@query(
    "x103_robust_trend",
    oracle="""
    WITH s AS (
      SELECT user_id, CAST(FLOOR(epoch_ms(ts) / 3600000) AS BIGINT) AS bk,
             CAST(SUM(CAST(FLOOR(value * 100) AS BIGINT)) AS BIGINT) AS v
      FROM events GROUP BY 1, 2),
    d AS (SELECT user_id, bk, v,
                 lag(bk) OVER (PARTITION BY user_id ORDER BY bk) AS pbk,
                 lag(v)  OVER (PARTITION BY user_id ORDER BY bk) AS pv
          FROM s),
    sl AS (SELECT user_id, bk,
                  CAST(floor((v - pv) * 1000000.0 / (bk - pbk)) AS BIGINT)
                    AS slope_ppm
           FROM d WHERE pbk IS NOT NULL),
    r AS (SELECT user_id, slope_ppm,
                 row_number() OVER (PARTITION BY user_id ORDER BY slope_ppm, bk) AS rn,
                 count(*) OVER (PARTITION BY user_id) AS n
          FROM sl)
    SELECT user_id, CAST(max(n) AS BIGINT) AS n_slopes,
           CAST(min(CASE WHEN rn = CAST(ceil(0.5 * n) AS BIGINT)
                         THEN slope_ppm END) AS BIGINT) AS median_slope_ppm
    FROM r GROUP BY user_id ORDER BY user_id
    """,
)
def x103_robust_trend(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Robust per-series trend: the MEDIAN of successive-difference slopes
    (a streaming-friendly cousin of the Theil-Sen estimator — resistant
    to the spikes that drag p14's least-squares slope around). Slopes
    are floor(dv * 1e6 / dt) on quantized hourly sums — the numerator is
    exactly double-representable, so one IEEE divide + floor is
    engine-identical (integer // is NOT: DuckDB truncates toward zero,
    Spark's floor-div floors — they differ on every negative slope);
    the median is the p26/p27 nearest-rank construction. Two windows on
    one per-series partitioning."""
    ev = load(spark, sf_dir, "events")
    s = (
        ev.select(
            "user_id",
            F.floor(F.unix_millis("ts") / F.lit(3_600_000)).cast("long").alias("bk"),
            F.floor(F.col("value") * 100).cast("long").alias("y"),
        )
        .groupBy("user_id", "bk")
        .agg(F.sum("y").alias("v"))
    )
    w = Window.partitionBy("user_id").orderBy("bk")
    sl = (
        s.select(
            "user_id",
            "bk",
            "v",
            F.lag("bk").over(w).alias("pbk"),
            F.lag("v").over(w).alias("pv"),
        )
        .filter(F.col("pbk").isNotNull())
        .select(
            "user_id",
            "bk",
            F.floor((F.col("v") - F.col("pv")) * 1_000_000 / (F.col("bk") - F.col("pbk")))
            .cast("long")
            .alias("slope_ppm"),
        )
    )
    w2 = Window.partitionBy("user_id").orderBy("slope_ppm", "bk")
    r = sl.select(
        "user_id",
        "slope_ppm",
        F.row_number().over(w2).alias("rn"),
        F.count(F.lit(1)).over(Window.partitionBy("user_id")).alias("n"),
    )
    return (
        r.groupBy("user_id")
        .agg(
            F.max("n").cast("long").alias("n_slopes"),
            F.min(
                F.when(
                    F.col("rn") == F.ceil(F.lit(0.5) * F.col("n")).cast("long"),
                    F.col("slope_ppm"),
                )
            )
            .cast("long")
            .alias("median_slope_ppm"),
        )
        .orderBy("user_id")
    )


@query(
    "x104_burst_detection",
    oracle="""
    WITH s AS (
      SELECT event_type AS et, CAST(FLOOR(epoch_ms(ts) / 3600000) AS BIGINT) AS bk,
             CAST(count(*) AS BIGINT) AS n
      FROM events GROUP BY 1, 2),
    l AS (SELECT et, bk, n,
                 [lag(n, 1) OVER w, lag(n, 2) OVER w, lag(n, 3) OVER w,
                  lag(n, 4) OVER w, lag(n, 5) OVER w, lag(n, 6) OVER w,
                  lag(n, 7) OVER w, lag(n, 8) OVER w, lag(n, 9) OVER w,
                  lag(n, 10) OVER w, lag(n, 11) OVER w, lag(n, 12) OVER w]
                   AS tr
          FROM s WINDOW w AS (PARTITION BY et ORDER BY bk)),
    m AS (SELECT et, bk, n,
                 list_sort(tr)[7] AS trailing_median
          FROM l
          WHERE len(list_filter(tr, x -> x IS NOT NULL)) = 12)
    SELECT et AS event_type, bk, n, trailing_median
    FROM m WHERE n > 2 * trailing_median
    ORDER BY et, bk
    """,
)
def x104_burst_detection(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Burst detection against a TRAILING median baseline: an hour fires
    when its event count exceeds 2x the median of the previous 12 hours.
    Neither engine has a median-over-frame window, so the frame is
    materialized as a 12-element lag array and the median is one
    array_sort + element_at — exact, engine-identical, and O(12 log 12)
    per row instead of a quadratic frame re-aggregation. The trailing
    (not centered) baseline is what makes it an ONLINE detector: the
    same arithmetic runs in a streaming twin with a 12-slot state
    ring."""
    ev = load(spark, sf_dir, "events")
    s = (
        ev.select(
            F.col("event_type").alias("et"),
            F.floor(F.unix_millis("ts") / F.lit(3_600_000)).cast("long").alias("bk"),
        )
        .groupBy("et", "bk")
        .agg(F.count(F.lit(1)).alias("n"))
    )
    w = Window.partitionBy("et").orderBy("bk")
    trailing = F.array(*[F.lag("n", k).over(w) for k in range(1, 13)])
    l = s.select("et", "bk", "n", trailing.alias("trailing"))
    m = l.filter(
        F.size(F.filter(F.col("trailing"), lambda x: x.isNotNull())) == 12
    ).select(
        "et",
        "bk",
        "n",
        F.element_at(F.array_sort("trailing"), 7).alias("trailing_median"),
    )
    return (
        m.filter(F.col("n") > 2 * F.col("trailing_median"))
        .select(F.col("et").alias("event_type"), "bk", "n", "trailing_median")
        .orderBy("et", "bk")
    )


@query(
    "p30_burn_rate",
    oracle="""
    WITH s AS (
      SELECT CAST(FLOOR(epoch_ms(ts) / 3600000) AS BIGINT) AS bk,
             CAST(count(*) AS BIGINT) AS total,
             CAST(sum(CASE WHEN event_type = 'error' THEN 1 ELSE 0 END) AS BIGINT)
               AS errs
      FROM events GROUP BY 1),
    w AS (SELECT bk,
                 errs * 1000000 // total AS short_ratio_ppm,
                 CAST(sum(errs) OVER win * 1000000
                      // sum(total) OVER win AS BIGINT) AS long_ratio_ppm,
                 CAST(count(*) OVER win AS BIGINT) AS n_win
          FROM s
          WINDOW win AS (ORDER BY bk ROWS BETWEEN 5 PRECEDING AND CURRENT ROW))
    SELECT bk, CAST(short_ratio_ppm AS BIGINT) AS short_ratio_ppm, long_ratio_ppm
    FROM w
    WHERE n_win = 6
      AND short_ratio_ppm * 2 > 3 * 200000
      AND long_ratio_ppm * 2 > 3 * 200000
    ORDER BY bk
    """,
)
def p30_burn_rate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Multiwindow error-budget burn-rate alert (the Google SRE workbook
    pattern): fire only when BOTH the fast window (1 h) and the slow
    window (6 h) burn the 20% error budget at >= 1.5x — the fast window
    gives low latency, the slow one suppresses blips. All ratios are
    exact ppm integers (numerators and thresholds cross-multiplied, no
    division compare); the 6-bucket frame is a ROWS window over the
    hourly rollup — per-service partitions at scale (the global series
    here is the single-service dashboard case)."""
    ev = load(spark, sf_dir, "events")
    s = (
        ev.select(
            F.floor(F.unix_millis("ts") / F.lit(3_600_000)).cast("long").alias("bk"),
            (F.col("event_type") == "error").cast("long").alias("e"),
        )
        .groupBy("bk")
        .agg(F.count(F.lit(1)).alias("total"), F.sum("e").alias("errs"))
    )
    win = Window.orderBy("bk").rowsBetween(-5, 0)
    w = s.select(
        "bk",
        F.floor(F.col("errs") * 1_000_000 / F.col("total")).cast("long").alias("short_ratio_ppm"),
        F.floor(F.sum("errs").over(win) * 1_000_000 / F.sum("total").over(win))
        .cast("long")
        .alias("long_ratio_ppm"),
        F.count(F.lit(1)).over(win).alias("n_win"),
    )
    return (
        w.filter(
            (F.col("n_win") == 6)
            & (F.col("short_ratio_ppm") * 2 > 3 * 200_000)
            & (F.col("long_ratio_ppm") * 2 > 3 * 200_000)
        )
        .select("bk", "short_ratio_ppm", "long_ratio_ppm")
        .orderBy("bk")
    )


@query(
    "x105_rolling_active_users",
    oracle="""
    WITH pres AS (
      SELECT DISTINCT user_id, CAST(FLOOR(epoch_ms(ts) / 3600000) AS BIGINT) AS bk
      FROM events),
    mx AS (SELECT min(bk) AS lo, max(bk) AS hi FROM pres),
    isl AS (SELECT user_id, bk,
                   CASE WHEN bk - lag(bk) OVER (PARTITION BY user_id ORDER BY bk) <= 23
                        THEN 0 ELSE 1 END AS brk
            FROM pres),
    grp AS (SELECT user_id, bk,
                   sum(brk) OVER (PARTITION BY user_id ORDER BY bk
                        ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS g
            FROM isl),
    cover AS (SELECT user_id, min(bk) AS s, max(bk) + 23 AS e
              FROM grp GROUP BY user_id, g),
    t AS (SELECT unnest(range(s, e + 1)) AS bk FROM cover)
    SELECT t.bk, CAST(count(*) AS BIGINT) AS active_users
    FROM t, mx WHERE t.bk BETWEEN lo + 23 AND hi
    GROUP BY t.bk ORDER BY t.bk
    """,
)
def x105_rolling_active_users(spark: SparkSession, sf_dir: str) -> DataFrame:
    """EXACT rolling 24-hour active users per hour — the sliding-window
    DISTINCT count that resists naive windowing (per-bucket distincts
    don't add; re-counting 24 buckets per output point re-scans the data
    24x). The coverage-interval trick makes it one pass: a user's
    presence hour covers windows [bk, bk+23]; presences within 23 hours
    chain into disjoint coverage islands (gaps-and-islands window), each
    island explodes to its covered hours, and because islands of one
    user never overlap, a plain COUNT per hour IS the distinct-user
    count. Work = presence rows + total coverage length (<= presences x
    24, no distinct agg at the end); first/last-23 edge hours are
    excluded as partial windows. The same shape answers rolling MAU/WAU
    at any window length."""
    ev = load(spark, sf_dir, "events")
    pres = (
        ev.select(
            "user_id",
            F.floor(F.unix_millis("ts") / F.lit(3_600_000)).cast("long").alias("bk"),
        )
        .distinct()
    )
    mx = pres.agg(F.min("bk").alias("lo"), F.max("bk").alias("hi"))
    w = Window.partitionBy("user_id").orderBy("bk")
    isl = pres.select(
        "user_id",
        "bk",
        F.when(F.col("bk") - F.lag("bk").over(w) <= 23, 0).otherwise(1).alias("brk"),
    )
    grp = isl.select(
        "user_id",
        "bk",
        F.sum("brk")
        .over(w.rowsBetween(Window.unboundedPreceding, Window.currentRow))
        .alias("g"),
    )
    cover = grp.groupBy("user_id", "g").agg(
        F.min("bk").alias("s"), (F.max("bk") + 23).alias("e")
    )
    t = cover.select(
        F.explode(F.sequence(F.col("s"), F.col("e"))).alias("bk")
    )
    return (
        t.crossJoin(F.broadcast(mx))
        .filter((F.col("bk") >= F.col("lo") + 23) & (F.col("bk") <= F.col("hi")))
        .groupBy("bk")
        .agg(F.count(F.lit(1)).alias("active_users"))
        .orderBy("bk")
    )


@query(
    "x108_distributed_median",
    oracle="""
    WITH s AS (SELECT event_type AS et, CAST(FLOOR(value * 100) AS BIGINT) AS y
               FROM events),
    r AS (SELECT et, y,
                 row_number() OVER (PARTITION BY et ORDER BY y) AS rn,
                 count(*) OVER (PARTITION BY et) AS n
          FROM s)
    SELECT et AS event_type, CAST(max(n) AS BIGINT) AS n_samples,
           CAST(min(CASE WHEN rn = CAST(ceil(0.5 * n) AS BIGINT) THEN y END)
                AS BIGINT) AS median_cents
    FROM r GROUP BY et ORDER BY et
    """,
)
def x108_distributed_median(spark: SparkSession, sf_dir: str) -> DataFrame:
    """EXACT global median per series WITHOUT a sort: two-pass histogram
    refinement. Pass 1 buckets values into 1024-cent cells (one hash
    agg) and walks the tiny per-series histogram to find the cell
    holding rank ceil(n/2); pass 2 counts exact values inside only the
    winning cells (a second hash agg over a broadcast-filtered slice)
    and picks the rank within. Both passes are scans + aggs — no
    row_number window, no per-series sort — which is the difference
    between 'works' and 'works at 100 TB' for full-table medians (the
    p26/p27 construction sorts inside each partition; this never sorts
    at all). The ORACLE is the straightforward nearest-rank sort — the
    two plans must agree exactly."""
    ev = load(spark, sf_dir, "events")
    s = ev.select(
        F.col("event_type").alias("et"),
        F.floor(F.col("value") * 100).cast("long").alias("y"),
    )
    # pass 1: coarse histogram + cumulative walk (per-series histograms are
    # tiny: value domain / 1024 cells — collect-free via window over cells)
    cells = s.groupBy("et", (F.floor(F.col("y") / 1024)).alias("cell")).agg(
        F.count(F.lit(1)).alias("c")
    )
    wc = Window.partitionBy("et").orderBy("cell")
    cum = cells.select(
        "et",
        "cell",
        "c",
        (F.sum("c").over(wc) - F.col("c")).alias("below"),
        F.sum("c").over(Window.partitionBy("et")).alias("n"),
    )
    target = F.ceil(F.lit(0.5) * F.col("n")).cast("long")
    win = cum.filter(
        (F.col("below") < target) & (F.col("below") + F.col("c") >= target)
    ).select("et", "cell", "below", "n")
    # pass 2: exact counts inside winning cells only
    sv = s.alias("sv")
    wn = win.alias("wn")
    inwin = sv.join(
        F.broadcast(wn),
        (F.col("sv.et") == F.col("wn.et"))
        & (F.floor(F.col("sv.y") / 1024) == F.col("wn.cell")),
    ).select(F.col("sv.et").alias("et"), F.col("sv.y").alias("y"), "below", "n")
    vals = inwin.groupBy("et", "y", "below", "n").agg(F.count(F.lit(1)).alias("vc"))
    wv = Window.partitionBy("et").orderBy("y")
    ranked = vals.select(
        "et",
        "y",
        "n",
        (F.col("below") + F.sum("vc").over(wv)).alias("cum_rank"),
    )
    t2 = F.ceil(F.lit(0.5) * F.col("n")).cast("long")
    return (
        ranked.filter(F.col("cum_rank") >= t2)
        .groupBy("et")
        .agg(F.max("n").cast("long").alias("n_samples"), F.min("y").alias("median_cents"))
        .select(F.col("et").alias("event_type"), "n_samples", "median_cents")
        .orderBy("event_type")
    )


@query(
    "x111_basket_lift",
    oracle="""
    WITH e AS (
      SELECT user_id, event_type, ts, event_id,
             CASE WHEN epoch_us(ts) - lag(epoch_us(ts))
                    OVER (PARTITION BY user_id ORDER BY ts, event_id)
                  > 1800000000 THEN 1 ELSE 0 END AS brk
      FROM events),
    s AS (SELECT *, sum(brk) OVER (PARTITION BY user_id ORDER BY ts, event_id
                 ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS sess
          FROM e),
    sid AS (SELECT DISTINCT user_id, sess, event_type FROM s),
    n AS (SELECT CAST(count(DISTINCT (user_id, sess)) AS BIGINT) AS n_sess FROM s),
    single AS (SELECT event_type, CAST(count(*) AS BIGINT) AS n FROM sid GROUP BY 1),
    pair AS (SELECT a.event_type AS type_a, b.event_type AS type_b,
                    CAST(count(*) AS BIGINT) AS n_ab
             FROM sid a JOIN sid b
               ON a.user_id = b.user_id AND a.sess = b.sess
              AND a.event_type < b.event_type
             GROUP BY 1, 2)
    SELECT type_a, type_b, n_ab,
           CAST(n_ab * n_sess * 1000000 // (sa.n * sb.n) AS BIGINT) AS lift_ppm
    FROM pair
    JOIN single sa ON sa.event_type = type_a
    JOIN single sb ON sb.event_type = type_b
    CROSS JOIN n
    WHERE n_ab >= 5
    ORDER BY type_a, type_b
    """,
)
def x111_basket_lift(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Market-basket lift between event types co-occurring in the SAME
    session: lift = P(a,b) / (P(a)·P(b)) over session baskets — the
    set-co-occurrence complement of x90's sequential PMI (PMI asks
    'adjacent'; lift asks 'together at all'). Sessions are the x41/x83
    30-minute-gap idiom; baskets are DISTINCT (session, type) rows so a
    type spamming one session can't inflate support; lift is an exact
    ppm integer (n_ab·N·1e6 // (n_a·n_b) — all BIGINT, no float). Plan:
    one sessionize window, one distinct, one self-join on session key
    (baskets are tiny: <= K types per session), two broadcast count
    joins."""
    ev = load(spark, sf_dir, "events")
    us = F.unix_micros("ts")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    brk = F.when(us - F.lag(us).over(w) > 1_800_000_000, F.lit(1)).otherwise(F.lit(0))
    s = ev.select("user_id", "event_type", "ts", "event_id", brk.alias("brk")).select(
        "user_id",
        "event_type",
        F.sum("brk")
        .over(w.rowsBetween(Window.unboundedPreceding, Window.currentRow))
        .alias("sess"),
    )
    sid = s.select("user_id", "sess", "event_type").distinct()
    n = s.select("user_id", "sess").distinct().agg(F.count(F.lit(1)).alias("n_sess"))
    single = sid.groupBy("event_type").agg(F.count(F.lit(1)).alias("n"))
    a, b = sid.alias("a"), sid.alias("b")
    pair = (
        a.join(
            b,
            (F.col("a.user_id") == F.col("b.user_id"))
            & (F.col("a.sess") == F.col("b.sess"))
            & (F.col("a.event_type") < F.col("b.event_type")),
        )
        .groupBy(
            F.col("a.event_type").alias("type_a"), F.col("b.event_type").alias("type_b")
        )
        .agg(F.count(F.lit(1)).alias("n_ab"))
    )
    sa = single.select(F.col("event_type").alias("type_a"), F.col("n").alias("na"))
    sb = single.select(F.col("event_type").alias("type_b"), F.col("n").alias("nb"))
    return (
        pair.join(F.broadcast(sa), "type_a")
        .join(F.broadcast(sb), "type_b")
        .crossJoin(F.broadcast(n))
        .filter(F.col("n_ab") >= 5)
        .select(
            "type_a",
            "type_b",
            "n_ab",
            F.floor(
                F.col("n_ab") * F.col("n_sess") * 1_000_000 / (F.col("na") * F.col("nb"))
            )
            .cast("long")
            .alias("lift_ppm"),
        )
        .orderBy("type_a", "type_b")
    )


@query(
    "x112_changepoint",
    oracle="""
    WITH s AS (
      SELECT event_type AS et, CAST(FLOOR(epoch_ms(ts) / 3600000) AS BIGINT) AS bk,
             CAST(SUM(CAST(FLOOR(value * 100) AS BIGINT)) AS BIGINT) AS v
      FROM events GROUP BY 1, 2),
    r AS (SELECT et, bk, v,
                 CAST(sum(v) OVER w AS BIGINT) AS pre_sum,
                 row_number() OVER w AS t,
                 CAST(sum(v) OVER (PARTITION BY et) AS BIGINT) AS tot,
                 count(*) OVER (PARTITION BY et) AS n
          FROM s WINDOW w AS (PARTITION BY et ORDER BY bk
                 ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)),
    sc AS (SELECT et, bk, t, n, pre_sum, tot,
                  abs(CAST(pre_sum * (n - t) - (tot - pre_sum) * t AS DOUBLE))
                    / (CAST(t AS DOUBLE) * (n - t)) AS score
           FROM r WHERE t < n AND t >= 6 AND n - t >= 6),
    best AS (SELECT et, bk, t, n, pre_sum, tot,
                    row_number() OVER (PARTITION BY et ORDER BY score DESC, bk) AS rk
             FROM sc)
    SELECT et AS event_type, bk AS changepoint_bk,
           CAST(t AS BIGINT) AS n_before, CAST(n - t AS BIGINT) AS n_after,
           CAST(pre_sum * 100 // t AS BIGINT) AS mean_before_x100,
           CAST((tot - pre_sum) * 100 // (n - t) AS BIGINT) AS mean_after_x100
    FROM best WHERE rk = 1 ORDER BY event_type
    """,
)
def x112_changepoint(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Single-changepoint detection per series: the split hour maximizing
    the mean-shift statistic |mean_before - mean_after| (binary
    segmentation's scoring step, computed for EVERY candidate split from
    one prefix-sum window — no per-candidate rescans; 6-point minimum
    segments). The score ranks on a double built from exact sub-2^53
    integers — identical in both engines — and ties break on the
    earlier bucket; reported means are exact integer ratios. One
    per-series cumulative window + one rank window."""
    ev = load(spark, sf_dir, "events")
    s = (
        ev.select(
            F.col("event_type").alias("et"),
            F.floor(F.unix_millis("ts") / F.lit(3_600_000)).cast("long").alias("bk"),
            F.floor(F.col("value") * 100).cast("long").alias("y"),
        )
        .groupBy("et", "bk")
        .agg(F.sum("y").alias("v"))
    )
    w = Window.partitionBy("et").orderBy("bk").rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    wp = Window.partitionBy("et")
    r = s.select(
        "et",
        "bk",
        F.sum("v").over(w).alias("pre_sum"),
        F.row_number().over(Window.partitionBy("et").orderBy("bk")).alias("t"),
        F.sum("v").over(wp).alias("tot"),
        F.count(F.lit(1)).over(wp).alias("n"),
    )
    sc = r.filter(
        (F.col("t") < F.col("n")) & (F.col("t") >= 6) & (F.col("n") - F.col("t") >= 6)
    ).withColumn(
        "score",
        F.abs(
            (
                F.col("pre_sum") * (F.col("n") - F.col("t"))
                - (F.col("tot") - F.col("pre_sum")) * F.col("t")
            ).cast("double")
        )
        / (F.col("t").cast("double") * (F.col("n") - F.col("t"))),
    )
    best = sc.withColumn(
        "rk",
        F.row_number().over(
            Window.partitionBy("et").orderBy(F.col("score").desc(), "bk")
        ),
    ).filter(F.col("rk") == 1)
    return best.select(
        F.col("et").alias("event_type"),
        F.col("bk").alias("changepoint_bk"),
        F.col("t").cast("long").alias("n_before"),
        (F.col("n") - F.col("t")).cast("long").alias("n_after"),
        F.floor(F.col("pre_sum") * 100 / F.col("t")).cast("long").alias("mean_before_x100"),
        F.floor((F.col("tot") - F.col("pre_sum")) * 100 / (F.col("n") - F.col("t")))
        .cast("long")
        .alias("mean_after_x100"),
    ).orderBy("event_type")


@query(
    "p31_alert_flap_report",
    oracle="""
    WITH s AS (
      SELECT event_type AS et, CAST(FLOOR(epoch_ms(ts) / 600000) AS BIGINT) AS bk,
             CAST(count(*) AS BIGINT) AS n
      FROM events GROUP BY 1, 2),
    breach AS (SELECT et, bk FROM s WHERE n >= 3),
    runs AS (SELECT et, bk,
                    bk - row_number() OVER (PARTITION BY et ORDER BY bk) AS grp
             FROM breach),
    rl AS (SELECT et, CAST(count(*) AS BIGINT) AS run_len
           FROM runs GROUP BY et, grp)
    SELECT et AS event_type,
           CAST(count(*) AS BIGINT) AS n_runs,
           CAST(sum(CASE WHEN run_len >= 4 THEN 1 ELSE 0 END) AS BIGINT) AS n_fired,
           CAST(sum(CASE WHEN run_len < 4 THEN 1 ELSE 0 END) AS BIGINT) AS n_flaps,
           CAST(max(run_len) AS BIGINT) AS longest_run,
           CAST(sum(CASE WHEN run_len < 4 THEN 1 ELSE 0 END) * 1000000
                // count(*) AS BIGINT) AS flap_ratio_ppm
    FROM rl GROUP BY et ORDER BY et
    """,
)
def p31_alert_flap_report(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Alert-fatigue report over p29's breach runs: per series, how many
    breach episodes fired (reached the for-duration) vs flapped
    (resolved early), the longest episode, and the flap ratio in exact
    ppm — the number that says whether the threshold or the
    for-duration needs retuning. Same gaps-and-islands pass as p29 plus
    one run-length agg."""
    ev = load(spark, sf_dir, "events")
    s = (
        ev.select(
            F.col("event_type").alias("et"),
            F.floor(F.unix_millis("ts") / F.lit(600_000)).cast("long").alias("bk"),
        )
        .groupBy("et", "bk")
        .agg(F.count(F.lit(1)).alias("n"))
    )
    breach = s.filter(F.col("n") >= 3)
    w = Window.partitionBy("et").orderBy("bk")
    runs = breach.select("et", "bk", (F.col("bk") - F.row_number().over(w)).alias("grp"))
    rl = runs.groupBy("et", "grp").agg(F.count(F.lit(1)).alias("run_len"))
    return (
        rl.groupBy(F.col("et").alias("event_type"))
        .agg(
            F.count(F.lit(1)).alias("n_runs"),
            F.sum((F.col("run_len") >= 4).cast("long")).alias("n_fired"),
            F.sum((F.col("run_len") < 4).cast("long")).alias("n_flaps"),
            F.max("run_len").alias("longest_run"),
            F.floor(
                F.sum((F.col("run_len") < 4).cast("long")) * 1_000_000 / F.count(F.lit(1))
            )
            .cast("long")
            .alias("flap_ratio_ppm"),
        )
        .orderBy("event_type")
    )


@query(
    "p32_scrape_gaps",
    oracle="""
    WITH s AS (SELECT DISTINCT event_type AS et,
                      CAST(FLOOR(epoch_ms(ts) / 600000) AS BIGINT) AS bk
               FROM events),
    g AS (SELECT et, bk,
                 lag(bk) OVER (PARTITION BY et ORDER BY bk) AS pbk
          FROM s)
    SELECT et AS event_type, pbk + 1 AS gap_start, bk - 1 AS gap_end,
           CAST(bk - pbk - 1 AS BIGINT) AS missed_intervals
    FROM g WHERE bk - pbk > 3
    ORDER BY event_type, gap_start
    """,
)
def p32_scrape_gaps(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-series data-gap report: stretches of more than 3 consecutive
    10-minute intervals with NO samples — the scrape-outage /
    ingestion-stall diagnostic that complements p19's absent() (which
    asks about NOW; this audits history). One distinct + one lag per
    series partition; gap bounds are pure integer arithmetic on the
    bucket ids."""
    ev = load(spark, sf_dir, "events")
    s = (
        ev.select(
            F.col("event_type").alias("et"),
            F.floor(F.unix_millis("ts") / F.lit(600_000)).cast("long").alias("bk"),
        )
        .distinct()
    )
    w = Window.partitionBy("et").orderBy("bk")
    g = s.select("et", "bk", F.lag("bk").over(w).alias("pbk"))
    return (
        g.filter(F.col("bk") - F.col("pbk") > 3)
        .select(
            F.col("et").alias("event_type"),
            (F.col("pbk") + 1).alias("gap_start"),
            (F.col("bk") - 1).alias("gap_end"),
            (F.col("bk") - F.col("pbk") - 1).alias("missed_intervals"),
        )
        .orderBy("event_type", "gap_start")
    )


@query(
    "x121_session_length_histogram",
    oracle="""
    WITH e AS (
      SELECT user_id, ts, event_id,
             CASE WHEN epoch_us(ts) - lag(epoch_us(ts))
                    OVER (PARTITION BY user_id ORDER BY ts, event_id)
                  > 1800000000 THEN 1 ELSE 0 END AS brk
      FROM events),
    s AS (SELECT user_id,
                 sum(brk) OVER (PARTITION BY user_id ORDER BY ts, event_id
                      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS sess
          FROM e),
    sl AS (SELECT CAST(count(*) AS BIGINT) AS session_len
           FROM s GROUP BY user_id, sess)
    SELECT session_len, CAST(count(*) AS BIGINT) AS n_sessions
    FROM sl GROUP BY session_len ORDER BY session_len
    """,
)
def x121_session_length_histogram(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Session-length distribution (count of sessions per event count) —
    the engagement-shape histogram behind bounce analysis (x96) and
    session-window sizing (x11c's gap parameter should sit past the
    histogram's knee). The count-of-counts double aggregation: sessions
    from the shared 30-minute-gap idiom, then two hash aggs."""
    ev = load(spark, sf_dir, "events")
    us = F.unix_micros("ts")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    brk = F.when(us - F.lag(us).over(w) > 1_800_000_000, F.lit(1)).otherwise(F.lit(0))
    s = ev.select("user_id", "ts", "event_id", brk.alias("brk")).select(
        "user_id",
        F.sum("brk")
        .over(w.rowsBetween(Window.unboundedPreceding, Window.currentRow))
        .alias("sess"),
    )
    sl = s.groupBy("user_id", "sess").agg(F.count(F.lit(1)).alias("session_len"))
    return (
        sl.groupBy("session_len")
        .agg(F.count(F.lit(1)).alias("n_sessions"))
        .orderBy("session_len")
    )


@query(
    "x128_purchase_cadence",
    oracle="""
    WITH p AS (SELECT user_id, CAST(user_id % 4 AS BIGINT) AS seg, ts, event_id
               FROM events WHERE event_type = 'purchase'),
    g AS (SELECT seg,
                 epoch_us(ts) - lag(epoch_us(ts))
                   OVER (PARTITION BY user_id ORDER BY ts, event_id) AS gap_us
          FROM p),
    gaps AS (SELECT seg, CAST(gap_us // 1000000 AS BIGINT) AS gap_s
             FROM g WHERE gap_us IS NOT NULL),
    r AS (SELECT seg, gap_s,
                 row_number() OVER (PARTITION BY seg ORDER BY gap_s) AS rn,
                 count(*) OVER (PARTITION BY seg) AS n
          FROM gaps)
    SELECT seg, CAST(max(n) AS BIGINT) AS n_gaps,
           CAST(min(CASE WHEN rn = CAST(ceil(0.5 * n) AS BIGINT) THEN gap_s END)
                AS BIGINT) AS p50_gap_s,
           CAST(min(CASE WHEN rn = CAST(ceil(0.9 * n) AS BIGINT) THEN gap_s END)
                AS BIGINT) AS p90_gap_s
    FROM r GROUP BY seg ORDER BY seg
    """,
)
def x128_purchase_cadence(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Purchase-cadence profile per user segment: nearest-rank p50/p90 of
    the time between a user's consecutive purchases — the repeat-buying
    rhythm behind replenishment campaigns and churn windows (a customer
    past their segment's p90 gap is the churn-risk definition). Gaps in
    whole seconds (integer floor of non-negative microseconds — no
    truncate/floor divergence possible); quantiles by the shared
    explicit rank rule. One per-user lag window + one per-segment rank
    window."""
    ev = load(spark, sf_dir, "events")
    p = ev.filter(F.col("event_type") == "purchase").select(
        "user_id",
        (F.col("user_id") % 4).cast("long").alias("seg"),
        "ts",
        "event_id",
    )
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    g = p.select(
        "seg", (F.unix_micros("ts") - F.lag(F.unix_micros("ts")).over(w)).alias("gap_us")
    ).filter(F.col("gap_us").isNotNull())
    gaps = g.select("seg", F.floor(F.col("gap_us") / 1_000_000).cast("long").alias("gap_s"))
    wr = Window.partitionBy("seg").orderBy("gap_s")
    r = gaps.select(
        "seg",
        "gap_s",
        F.row_number().over(wr).alias("rn"),
        F.count(F.lit(1)).over(Window.partitionBy("seg")).alias("n"),
    )

    def pick(phi):
        return F.min(
            F.when(F.col("rn") == F.ceil(F.lit(phi) * F.col("n")).cast("long"), F.col("gap_s"))
        ).cast("long")

    return (
        r.groupBy("seg")
        .agg(
            F.max("n").cast("long").alias("n_gaps"),
            pick(0.5).alias("p50_gap_s"),
            pick(0.9).alias("p90_gap_s"),
        )
        .orderBy("seg")
    )


@query(
    "p33_counter_sanity",
    oracle="""
    WITH s AS (SELECT user_id, ts, event_id,
                      CAST(FLOOR(value * 100) AS BIGINT) AS y,
                      lag(CAST(FLOOR(value * 100) AS BIGINT))
                        OVER (PARTITION BY user_id ORDER BY ts, event_id) AS py
               FROM events WHERE event_type = 'counter' OR event_type = 'click'),
    d AS (SELECT user_id, event_id, y, py FROM s WHERE py IS NOT NULL AND y < py)
    SELECT user_id,
           CAST(count(*) AS BIGINT) AS n_decreases,
           CAST(sum(CASE WHEN y * 2 >= py THEN 1 ELSE 0 END) AS BIGINT)
             AS n_suspect_jitter,
           CAST(sum(CASE WHEN y * 2 < py THEN 1 ELSE 0 END) AS BIGINT)
             AS n_likely_resets
    FROM d GROUP BY user_id
    HAVING sum(CASE WHEN y * 2 >= py THEN 1 ELSE 0 END) > 0
    ORDER BY user_id
    """,
)
def p33_counter_sanity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Counter-monotonicity audit: for counter-like series, classify every
    decrease as a LIKELY RESET (drop below half the previous value — the
    process-restart signature rate()/increase() already handle) or
    SUSPECT JITTER (a small decrease, which monotonic counters must
    never legitimately do: clock skew, duplicate-with-stale-value, or a
    mislabeled gauge). Series with any jitter are the rows an SRE
    actually has to look at — p11 counts resets; this separates the
    benign ones from the data bugs. Integer comparisons only."""
    ev = load(spark, sf_dir, "events")
    s = (
        ev.filter(F.col("event_type").isin("counter", "click"))
        .select(
            "user_id",
            "ts",
            "event_id",
            F.floor(F.col("value") * 100).cast("long").alias("y"),
        )
    )
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    d = (
        s.withColumn("py", F.lag("y").over(w))
        .filter(F.col("py").isNotNull() & (F.col("y") < F.col("py")))
    )
    return (
        d.groupBy("user_id")
        .agg(
            F.count(F.lit(1)).alias("n_decreases"),
            F.sum((F.col("y") * 2 >= F.col("py")).cast("long")).alias("n_suspect_jitter"),
            F.sum((F.col("y") * 2 < F.col("py")).cast("long")).alias("n_likely_resets"),
        )
        .filter(F.col("n_suspect_jitter") > 0)
        .orderBy("user_id")
    )


@query(
    "x132_seasonality_strength",
    oracle="""
    WITH s AS (
      SELECT event_type AS et,
             CAST(FLOOR(epoch_ms(ts) / 3600000) AS BIGINT) AS bk,
             CAST(FLOOR(epoch_ms(ts) / 3600000) % 24 AS BIGINT) AS hod,
             CAST(count(*) AS BIGINT) AS n
      FROM events GROUP BY 1, 2, 3),
    tot AS (SELECT et, CAST(count(*) AS HUGEINT) AS k,
                   CAST(sum(n) AS HUGEINT) AS sn,
                   CAST(sum(n*n) AS HUGEINT) AS snn
            FROM s GROUP BY et),
    prof AS (SELECT et, hod, CAST(count(*) AS HUGEINT) AS kc,
                    CAST(sum(n) AS HUGEINT) AS snc
             FROM s GROUP BY et, hod),
    bet AS (SELECT et, CAST(sum(snc * snc * 1000000 // kc) AS HUGEINT) AS ssb_scaled
            FROM prof GROUP BY et)
    SELECT t.et AS event_type, CAST(t.k AS BIGINT) AS n_buckets,
           CAST((b.ssb_scaled - t.sn * t.sn * 1000000 // t.k)
                * 1000000
                // (t.snn * 1000000 - t.sn * t.sn * 1000000 // t.k)
                AS BIGINT) AS seasonality_ppm
    FROM tot t JOIN bet b ON b.et = t.et
    ORDER BY event_type
    """,
)
def x132_seasonality_strength(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Daily-seasonality strength per series: the fraction of hourly-count
    variance explained by the hour-of-day profile (the one-way-ANOVA
    R^2, between-group sum of squares over total) — near 1 means p25's
    hourly profile IS the signal and x102's seasonal-naive will win;
    near 0 means 'seasonality' panels are reading noise. Computed
    entirely in HUGEINT/DECIMAL integer arithmetic (sums of squares
    scaled by 1e6 before the integer divisions, all values
    non-negative so // is engine-identical) — an exact ppm with no
    float anywhere. Two hash aggs over the hourly rollup."""
    ev = load(spark, sf_dir, "events")
    dec = "decimal(38,0)"
    s = (
        ev.select(
            F.col("event_type").alias("et"),
            F.floor(F.unix_millis("ts") / F.lit(3_600_000)).cast("long").alias("bk"),
        )
        .withColumn("hod", F.pmod(F.col("bk"), F.lit(24)))
        .groupBy("et", "bk", "hod")
        .agg(F.count(F.lit(1)).alias("n"))
    )
    tot = s.groupBy("et").agg(
        F.count(F.lit(1)).cast(dec).alias("k"),
        F.sum("n").cast(dec).alias("sn"),
        F.sum(F.col("n") * F.col("n")).cast(dec).alias("snn"),
    )
    prof = s.groupBy("et", "hod").agg(
        F.count(F.lit(1)).cast(dec).alias("kc"), F.sum("n").cast(dec).alias("snc")
    )
    bet = prof.groupBy("et").agg(
        F.sum(F.floor(F.col("snc") * F.col("snc") * 1_000_000 / F.col("kc"))).alias(
            "ssb_scaled"
        )
    )
    grand = F.floor(F.col("sn") * F.col("sn") * 1_000_000 / F.col("k"))
    return (
        tot.join(bet, "et")
        .select(
            F.col("et").alias("event_type"),
            F.col("k").cast("long").alias("n_buckets"),
            F.floor(
                (F.col("ssb_scaled") - grand)
                * 1_000_000
                / (F.col("snn") * 1_000_000 - grand)
            )
            .cast("long")
            .alias("seasonality_ppm"),
        )
        .orderBy("event_type")
    )


@query(
    "x133_retention_half_life",
    oracle="""
    WITH act AS (SELECT DISTINCT user_id, CAST(ts AS DATE) AS day FROM events),
    first AS (SELECT user_id, MIN(day) AS cohort_day FROM act GROUP BY user_id),
    off AS (SELECT CAST(date_diff('day', cohort_day, day) AS BIGINT) AS day_offset,
                   a.user_id
            FROM act a JOIN first USING (user_id)),
    curve AS (SELECT day_offset, CAST(count(DISTINCT user_id) AS BIGINT) AS active
              FROM off WHERE day_offset BETWEEN 1 AND 14 GROUP BY day_offset),
    q AS (SELECT CAST(day_offset AS DECIMAL(18,6)) AS x,
                 CAST(ln(CAST(active AS DOUBLE)) AS DECIMAL(18,6)) AS y
          FROM curve WHERE active > 0),
    s AS (SELECT CAST(count(*) AS BIGINT) AS n,
                 CAST(sum(x) AS DECIMAL(38,6)) AS sx,
                 CAST(sum(y) AS DECIMAL(38,6)) AS sy,
                 CAST(sum(x*y) AS DECIMAL(38,12)) AS sxy,
                 CAST(sum(x*x) AS DECIMAL(38,12)) AS sxx
          FROM q)
    SELECT n AS n_points,
           CAST(floor((CAST(n AS DOUBLE) * sxy - CAST(sx AS DOUBLE) * sy)
                / (CAST(n AS DOUBLE) * sxx - CAST(sx AS DOUBLE) * sx) * 1000000)
                AS BIGINT) AS decay_ppm
    FROM s
    """,
)
def x133_retention_half_life(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Retention decay fit: the exponential-decay rate of the aggregate
    day-1..14 retention curve (ln(active) vs day-offset regression — the
    half-life is ln(2)/|rate|), collapsing x42's cohort matrix to THE
    retention number product teams track. Same decimal-exact regression
    skeleton as x122/x123."""
    ev = load(spark, sf_dir, "events")
    act = ev.select("user_id", F.to_date("ts").alias("day")).distinct()
    first = act.groupBy("user_id").agg(F.min("day").alias("cohort_day"))
    off = act.join(first, "user_id").select(
        F.datediff("day", "cohort_day").cast("long").alias("day_offset"), "user_id"
    )
    curve = (
        off.filter((F.col("day_offset") >= 1) & (F.col("day_offset") <= 14))
        .groupBy("day_offset")
        .agg(F.countDistinct("user_id").alias("active"))
    )
    q = curve.filter(F.col("active") > 0).select(
        F.col("day_offset").cast("decimal(18,6)").alias("x"),
        F.log(F.col("active").cast("double")).cast("decimal(18,6)").alias("y"),
    )
    s = q.agg(
        F.count(F.lit(1)).alias("n"),
        F.sum("x").cast("decimal(38,6)").alias("sx"),
        F.sum("y").cast("decimal(38,6)").alias("sy"),
        F.sum(F.col("x") * F.col("y")).cast("decimal(38,12)").alias("sxy"),
        F.sum(F.col("x") * F.col("x")).cast("decimal(38,12)").alias("sxx"),
    )
    slope = (
        F.col("n").cast("double") * F.col("sxy").cast("double")
        - F.col("sx").cast("double") * F.col("sy").cast("double")
    ) / (
        F.col("n").cast("double") * F.col("sxx").cast("double")
        - F.col("sx").cast("double") * F.col("sx").cast("double")
    )
    return s.select(
        F.col("n").alias("n_points"),
        F.floor(slope * 1_000_000).cast("long").alias("decay_ppm"),
    )


_P34_CASE = """CASE
             WHEN 10 * c1 >= 9 * total THEN
               0.0 + (10.0 - 0.0) * (0.9 * total - 0) / c1
             WHEN 10 * c2 >= 9 * total THEN
               10.0 + (25.0 - 10.0) * (0.9 * total - c1) / (c2 - c1)
             WHEN 10 * c3 >= 9 * total THEN
               25.0 + (50.0 - 25.0) * (0.9 * total - c2) / (c3 - c2)
             WHEN 10 * c4 >= 9 * total THEN
               50.0 + (100.0 - 50.0) * (0.9 * total - c3) / (c4 - c3)
             WHEN 10 * c5 >= 9 * total THEN
               100.0 + (250.0 - 100.0) * (0.9 * total - c4) / (c5 - c4)
             ELSE 250.0 END"""


@query(
    "p34_histogram_quantile",
    oracle=f"""
    WITH b AS (
      SELECT user_id,
             CAST(count(*) AS BIGINT) AS total,
             CAST(sum(CASE WHEN value <= 10 THEN 1 ELSE 0 END) AS BIGINT) AS c1,
             CAST(sum(CASE WHEN value <= 25 THEN 1 ELSE 0 END) AS BIGINT) AS c2,
             CAST(sum(CASE WHEN value <= 50 THEN 1 ELSE 0 END) AS BIGINT) AS c3,
             CAST(sum(CASE WHEN value <= 100 THEN 1 ELSE 0 END) AS BIGINT) AS c4,
             CAST(sum(CASE WHEN value <= 250 THEN 1 ELSE 0 END) AS BIGINT) AS c5
      FROM events GROUP BY user_id)
    SELECT user_id, total, c1, c2, c3, c4, c5,
           {dround_sql(_P34_CASE, 6)} AS p90
    FROM b ORDER BY user_id
    """,
)
def p34_histogram_quantile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PromQL ``histogram_quantile(0.9, ...)`` over classic cumulative
    le-buckets, built and inverted in ONE pass: per-series bucket counts
    are conditional sums (map-side partial agg — the histogram never
    exists as rows), and the quantile inverts the cumulative counts with
    Prometheus's linear within-bucket interpolation, falling back to the
    highest finite bound when the quantile lands in +Inf (the documented
    histogram_quantile behavior). The bucket pick compares exact integers
    (10*cum >= 9*total — no float threshold), and the interpolation is
    one fixed-order double expression from exact counts, rounded with the
    shared dround. At 100 TB: one hash agg keyed by series, a wide
    conditional-sum row per series, O(|buckets|) CASE per row — the same
    cost as a plain per-series count."""
    ev = load(spark, sf_dir, "events")
    b = ev.groupBy("user_id").agg(
        F.count(F.lit(1)).alias("total"),
        *[
            F.sum((F.col("value") <= le).cast("long")).alias(f"c{i+1}")
            for i, le in enumerate([10, 25, 50, 100, 250])
        ],
    )
    return b.select(
        "user_id", "total", "c1", "c2", "c3", "c4", "c5",
        dround(histogram_quantile_expr(), 6).alias("p90"),
    ).orderBy("user_id")


def histogram_quantile_expr(
    les: tuple[float, ...] = (10.0, 25.0, 50.0, 100.0, 250.0),
    q_num: int = 9,
    q_den: int = 10,
):
    """The histogram_quantile inversion ladder over cumulative bucket
    columns c1..cN + total: bucket pick by exact integer compare
    (q_den*cum >= q_num*total), Prometheus linear interpolation inside
    the bucket, highest finite bound for +Inf. Shared by batch p34 and
    the streaming windowed twin — bucket counts are decomposable sums,
    so the SAME expression closes each streaming window."""
    t = F.col("total")
    bounds = [0.0] + list(les)
    cums = [F.lit(0)] + [F.col(f"c{i}") for i in range(1, len(les) + 1)]
    phi = q_num / q_den
    expr = F.lit(bounds[-1])
    # build the CASE ladder bottom-up so the FIRST satisfied bucket wins
    for i in range(len(les), 0, -1):
        lo, hi = bounds[i - 1], bounds[i]
        clo, chi = cums[i - 1], cums[i]
        interp = F.lit(lo) + (F.lit(hi) - F.lit(lo)) * (
            F.lit(phi) * t - clo
        ) / (chi - clo)
        expr = F.when(q_den * chi >= q_num * t, interp).otherwise(expr)
    return expr


@query(
    "x169_daily_anomaly_flags",
    oracle="""
    WITH day AS (SELECT event_type, strftime(ts, '%Y-%m-%d') AS day,
                        CAST(count(*) AS BIGINT) AS n_events
                 FROM events GROUP BY 1, 2),
    st AS (SELECT event_type,
                  CAST(count(*) AS BIGINT) AS n_days,
                  CAST(sum(n_events) AS BIGINT) AS s,
                  CAST(sum(n_events * n_events) AS BIGINT) AS ss
           FROM day GROUP BY event_type)
    SELECT day.event_type, day.day, day.n_events,
           CAST((day.n_events * st.n_days - st.s)
                * (day.n_events * st.n_days - st.s) AS BIGINT) AS dev2_n2,
           CAST(4 * (st.n_days * st.ss - st.s * st.s) AS BIGINT) AS thresh_n2
    FROM day JOIN st USING (event_type)
    WHERE (day.n_events * st.n_days - st.s)
          * (day.n_events * st.n_days - st.s)
          > 4 * (st.n_days * st.ss - st.s * st.s)
    ORDER BY event_type, day
    """,
)
def x169_daily_anomaly_flags(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Daily volume anomaly flags per event type: days whose count sits
    more than 2 sigma from that type's across-days mean — the on-call
    "traffic cliff / bot spike" report. The z-test runs ENTIRELY in
    integers: (x - mean)^2 > (2 sigma)^2 is multiplied through by
    n_days^2 into (x*N - S)^2 > 4*(N*SS - S^2) over the exact count
    sums, so there is no float mean/stddev to representation-diverge
    and the flag is engine-exact (both squared sides are emitted for
    auditability). BIGINT holds to ~3e9 events/day; beyond that the
    same identity runs in DECIMAL(38,0). Plan: one (type, day) hash agg
    — partial-aggregated map-side — then a broadcast of the per-type
    stats (|event_types| rows) back onto the day rows; nothing else
    shuffles at any scale."""
    e = load(spark, sf_dir, "events")
    day = e.groupBy(
        "event_type", F.date_format("ts", "yyyy-MM-dd").alias("day")
    ).agg(F.count(F.lit(1)).alias("n_events"))
    st = day.groupBy("event_type").agg(
        F.count(F.lit(1)).alias("n_days"),
        F.sum("n_events").alias("s"),
        F.sum(F.col("n_events") * F.col("n_events")).alias("ss"),
    )
    dev = F.col("n_events") * F.col("n_days") - F.col("s")
    thresh = 4 * (F.col("n_days") * F.col("ss") - F.col("s") * F.col("s"))
    return (
        day.join(F.broadcast(st), "event_type")
        .filter(dev * dev > thresh)
        .select(
            "event_type",
            "day",
            "n_events",
            (dev * dev).cast("long").alias("dev2_n2"),
            thresh.cast("long").alias("thresh_n2"),
        )
        .orderBy("event_type", "day")
    )


@query(
    "x172_cusum_changepoint",
    oracle="""
    WITH day AS (SELECT event_type, strftime(ts, '%Y-%m-%d') AS day,
                        CAST(count(*) AS BIGINT) AS n_events
                 FROM events GROUP BY 1, 2),
    st AS (SELECT event_type,
                  CAST(count(*) AS BIGINT) AS n_days,
                  CAST(sum(n_events) AS BIGINT) AS s,
                  CAST(sum(n_events * n_events) AS BIGINT) AS ss
           FROM day GROUP BY event_type),
    y AS (SELECT day.event_type, day.day, day.n_events,
                 day.n_events * st.n_days - st.s AS yv,
                 16 * (st.n_days * st.ss - st.s * st.s) AS thresh2
          FROM day JOIN st USING (event_type)),
    c AS (SELECT event_type, day, n_events, thresh2,
                 sum(yv) OVER (PARTITION BY event_type ORDER BY day
                               ROWS UNBOUNDED PRECEDING) AS cum
          FROM y),
    s2 AS (SELECT event_type, day, n_events, thresh2, cum,
                  least(CAST(0 AS BIGINT),
                        min(cum) OVER (PARTITION BY event_type ORDER BY day
                                       ROWS UNBOUNDED PRECEDING)) AS lo,
                  greatest(CAST(0 AS BIGINT),
                           max(cum) OVER (PARTITION BY event_type ORDER BY day
                                          ROWS UNBOUNDED PRECEDING)) AS hi
           FROM c),
    g AS (SELECT event_type, day, n_events,
                 CAST(cum - lo AS BIGINT) AS cusum_up,
                 CAST(hi - cum AS BIGINT) AS cusum_down,
                 thresh2
          FROM s2)
    SELECT event_type, day, n_events, cusum_up, cusum_down,
           CAST(CASE WHEN cusum_up * cusum_up > thresh2 THEN 1 ELSE 0 END
                AS BIGINT) AS alarm_up,
           CAST(CASE WHEN cusum_down * cusum_down > thresh2 THEN 1 ELSE 0 END
                AS BIGINT) AS alarm_down
    FROM g
    WHERE cusum_up * cusum_up > thresh2 OR cusum_down * cusum_down > thresh2
    ORDER BY event_type, day
    """,
)
def x172_cusum_changepoint(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CUSUM change-point detection on daily event volume — the
    level-SHIFT detector that catches what x169's pointwise z-test
    cannot: a sustained small drift (each day under 2 sigma) that
    accumulates. The max(0, S+y) recursion is not window-expressible,
    but its closed form IS: S_t = C_t - min(0, min_{j<=t} C_j) for the
    upward side (and the mirror for downward), where C is the plain
    cumulative sum of scaled deviations y_t = x_t * N - S — so the
    whole detector is two integer window chains, no recursion, no
    floats; the alarm S_t > 4*sigma_scaled squares through to
    S_t^2 > 16*(N*SS - S^2), the x169 idiom. Emits alarm days with
    both one-sided statistics. Plan: one (type, day) agg, a broadcast
    of per-type stats, then per-type ordered windows over ~365 rows per
    type-year — partition count = |types|, each tiny at any corpus
    scale because days, not events, are the window rows."""
    e = load(spark, sf_dir, "events")
    day = e.groupBy(
        "event_type", F.date_format("ts", "yyyy-MM-dd").alias("day")
    ).agg(F.count(F.lit(1)).alias("n_events"))
    st = day.groupBy("event_type").agg(
        F.count(F.lit(1)).alias("n_days"),
        F.sum("n_events").alias("s"),
        F.sum(F.col("n_events") * F.col("n_events")).alias("ss"),
    )
    y = day.join(F.broadcast(st), "event_type").select(
        "event_type",
        "day",
        "n_events",
        (F.col("n_events") * F.col("n_days") - F.col("s")).alias("yv"),
        (16 * (F.col("n_days") * F.col("ss") - F.col("s") * F.col("s"))).alias(
            "thresh2"
        ),
    )
    w = (
        Window.partitionBy("event_type")
        .orderBy("day")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    c = y.withColumn("cum", F.sum("yv").over(w))
    s2 = c.select(
        "event_type",
        "day",
        "n_events",
        "thresh2",
        "cum",
        F.least(F.lit(0).cast("long"), F.min("cum").over(w)).alias("lo"),
        F.greatest(F.lit(0).cast("long"), F.max("cum").over(w)).alias("hi"),
    )
    g = s2.select(
        "event_type",
        "day",
        "n_events",
        (F.col("cum") - F.col("lo")).alias("cusum_up"),
        (F.col("hi") - F.col("cum")).alias("cusum_down"),
        "thresh2",
    )
    up = F.col("cusum_up") * F.col("cusum_up") > F.col("thresh2")
    down = F.col("cusum_down") * F.col("cusum_down") > F.col("thresh2")
    return (
        g.filter(up | down)
        .select(
            "event_type",
            "day",
            "n_events",
            "cusum_up",
            "cusum_down",
            up.cast("long").alias("alarm_up"),
            down.cast("long").alias("alarm_down"),
        )
        .orderBy("event_type", "day")
    )


@query(
    "x175_event_transition_matrix",
    oracle="""
    WITH o AS (SELECT user_id, event_type, ts, event_id,
                      lead(event_type) OVER (PARTITION BY user_id
                                             ORDER BY ts, event_id) AS nxt
               FROM events),
    big AS (SELECT event_type AS cur, nxt, CAST(count(*) AS BIGINT) AS n
            FROM o WHERE nxt IS NOT NULL GROUP BY 1, 2),
    tot AS (SELECT cur, CAST(sum(n) AS BIGINT) AS n_cur FROM big GROUP BY cur)
    SELECT big.cur, big.nxt, big.n, tot.n_cur,
           CAST(big.n * 1000000 // tot.n_cur AS BIGINT) AS p_ppm
    FROM big JOIN tot USING (cur)
    ORDER BY cur, nxt
    """,
)
def x175_event_transition_matrix(spark: SparkSession, sf_dir: str) -> DataFrame:
    """First-order Markov transition matrix over per-user event streams
    (next-event given current, ordered by (ts, event_id)) — the behavior
    model behind next-action prediction, funnel-shortcut discovery, and
    bot fingerprinting (bots have near-deterministic rows; humans
    don't). Probabilities are exact ppm integers (n_ab * 1e6 // n_a).
    Plan: ONE user-keyed window (the same partitioning every session op
    reuses) emits bigrams via lead — no self-join — then a tiny
    |types|^2 agg; at 100 TB the window rides the events table's
    user-bucketed layout and only the matrix shuffles."""
    e = load(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    o = e.select(
        F.col("event_type").alias("cur"),
        F.lead("event_type").over(w).alias("nxt"),
    ).filter(F.col("nxt").isNotNull())
    big = o.groupBy("cur", "nxt").agg(F.count(F.lit(1)).alias("n"))
    tot = big.groupBy("cur").agg(F.sum("n").alias("n_cur"))
    return (
        big.join(F.broadcast(tot), "cur")
        .select(
            "cur",
            "nxt",
            "n",
            "n_cur",
            F.expr("n * 1000000 div n_cur").cast("long").alias("p_ppm"),
        )
        .orderBy("cur", "nxt")
    )


@query(
    "x179_theil_sen_trend",
    oracle="""
    WITH day AS (SELECT strftime(ts, '%Y-%m-%d') AS day,
                        CAST(count(*) AS BIGINT) AS n
                 FROM events GROUP BY 1),
    ix AS (SELECT day, n,
                  CAST(row_number() OVER (ORDER BY day) AS BIGINT) AS i
           FROM day),
    sl AS (SELECT a.i AS i, b.i AS j,
                  CAST(((b.n - a.n) * 1000000
                        + 1125899906842624 * (b.i - a.i)) // (b.i - a.i)
                       - 1125899906842624 AS BIGINT) AS slope_ppm
           FROM ix a JOIN ix b ON a.i < b.i),
    r AS (SELECT slope_ppm,
                 row_number() OVER (ORDER BY slope_ppm, i, j) AS rn,
                 count(*) OVER () AS np
          FROM sl)
    SELECT CAST(max(np) AS BIGINT) AS n_pairs,
           CAST(min(CASE WHEN rn = (np + 1) // 2 THEN slope_ppm END)
                AS BIGINT) AS theil_sen_slope_ppm,
           CAST(min(CASE WHEN rn = np // 2 + 1 THEN slope_ppm END)
                AS BIGINT) AS upper_median_ppm
    FROM r
    """,
)
def x179_theil_sen_trend(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Theil-Sen robust trend of daily event volume: the median of all
    pairwise slopes — the trend estimate that (unlike OLS, p14/p15)
    shrugs off the outlier days x169 flags, with a 29% breakdown point;
    the go-to 'is traffic actually growing' number when the series has
    incident spikes. Slopes are exact scaled integers
    (floor((n_j - n_i) * 1e6 / (j - i)) over day INDICES, so gaps in
    the calendar do not skew the x-axis) computed through a +2^50
    offset shift keeping division operands non-negative — Spark's
    `div` truncates toward zero while DuckDB's `//` floors, and they
    only agree on non-negative operands (the x177 lesson). Validity
    bound of the shift: operands stay non-negative only while
    |n_j - n_i| * 1e6 <= 2^50 * (j - i), i.e. a day-over-day swing of
    up to ~1.125e9 events per unit of index gap — an asserted guard
    column trips past it rather than silently diverging from the
    oracle (a wider offset or decimal(38,0) would be the fix). Both
    medians come from the registry's exact rank idiom (x149). The pair set is |days|^2/2 —
    days, not events: at 100 TB of raw data this is still ~66K pairs
    per year of daily series, a broadcast-size problem riding one
    (day) pre-agg; the heavy lifting is the same single hash agg every
    daily rollup here shares."""
    e = load(spark, sf_dir, "events")
    day = e.groupBy(F.date_format("ts", "yyyy-MM-dd").alias("day")).agg(
        F.count(F.lit(1)).alias("n")
    )
    ix = day.select(
        "n", F.row_number().over(Window.orderBy("day")).cast("long").alias("i")
    )
    a = ix.select(F.col("i").alias("ia"), F.col("n").alias("na"))
    b = ix.select(F.col("i").alias("jb"), F.col("n").alias("nb"))
    sl = (
        a.join(F.broadcast(b), F.col("ia") < F.col("jb"))
        .select(
            "ia",
            "jb",
            F.expr(
                "CASE WHEN abs(nb - na) * 1000000 > 1125899906842624 * (jb - ia)"
                " THEN raise_error('x179_theil_sen_trend: |n_j-n_i|*1e6 exceeds"
                " the +2^50 offset validity bound (~1.125e9 events/day per"
                " index gap); widen the offset or move to decimal(38,0)')"
                " ELSE ((nb - na) * 1000000 + 1125899906842624 * (jb - ia))"
                " div (jb - ia) - 1125899906842624 END"
            ).alias("slope_ppm"),
        )
    )
    r = sl.select(
        "slope_ppm",
        F.row_number()
        .over(Window.orderBy("slope_ppm", "ia", "jb"))
        .alias("rn"),
        F.count(F.lit(1)).over(Window.partitionBy()).alias("np"),
    )
    return r.agg(
        F.max("np").cast("long").alias("n_pairs"),
        F.min(
            F.when(F.col("rn") == F.expr("(np + 1) div 2"), F.col("slope_ppm"))
        )
        .cast("long")
        .alias("theil_sen_slope_ppm"),
        F.min(F.when(F.col("rn") == F.expr("np div 2 + 1"), F.col("slope_ppm")))
        .cast("long")
        .alias("upper_median_ppm"),
    )


@query(
    "x186_kaplan_meier_conversion",
    oracle="""
    WITH s AS (SELECT user_id, min(ts) AS t0 FROM events
               WHERE event_type = 'signup' GROUP BY 1),
    p AS (SELECT s.user_id,
                 min(CASE WHEN e.event_type = 'purchase' AND e.ts >= s.t0
                          THEN e.ts END) AS tp
          FROM s JOIN events e ON e.user_id = s.user_id
          GROUP BY 1),
    horizon AS (SELECT max(ts) AS tmax FROM events),
    subj AS (SELECT sp.user_id,
                    CASE WHEN tp IS NOT NULL
                         THEN date_diff('day', t0, tp) ELSE
                         date_diff('day', t0, tmax) END AS dur,
                    CASE WHEN tp IS NOT NULL THEN 1 ELSE 0 END AS converted
             FROM s JOIN p sp ON sp.user_id = s.user_id CROSS JOIN horizon),
    days AS (SELECT dur AS d, CAST(count(*) AS BIGINT) AS d_events
             FROM subj WHERE converted = 1 GROUP BY 1),
    risk AS (SELECT days.d, days.d_events,
                    CAST((SELECT count(*) FROM subj WHERE subj.dur >= days.d)
                         AS BIGINT) AS n_risk
             FROM days),
    t AS (SELECT d, d_events, n_risk,
                 CASE WHEN n_risk = d_events THEN NULL
                      ELSE CAST(ln(CAST(n_risk - d_events AS DOUBLE) / n_risk)
                           AS DECIMAL(18,9)) END AS lnf
          FROM risk),
    c AS (SELECT d, d_events, n_risk,
                 CAST(sum(lnf) OVER (ORDER BY d
                      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                      AS DECIMAL(18,9)) AS lns
          FROM t)
    SELECT d AS day, d_events, n_risk,
           CASE WHEN n_risk = d_events THEN NULL ELSE {lnv} END AS ln_surv,
           CASE WHEN n_risk = d_events THEN 0.0 ELSE {sv} END AS survival
    FROM c ORDER BY day
    """.format(
        lnv=dround_sql("CAST(lns AS DOUBLE)", 6),
        sv=dround_sql("exp(CAST(lns AS DOUBLE))", 6),
    ),
)
def x186_kaplan_meier_conversion(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Kaplan-Meier time-to-conversion curve: for signup cohort users,
    the survival function of 'still has not purchased by day d' with
    right-censoring at the observation horizon — the censoring-correct
    answer to 'how long until users convert' that x133's half-life fit
    (which ignores censoring) approximates. Per event-day d: d_events
    (conversions at d), n_risk (subjects with min(conversion, censor)
    time >= d), and S(d) = prod(1 - d_i/n_i) computed as a cumulative
    window SUM of per-day DECIMAL(18,9)-quantized ln factors, exp'd and
    rounded once per row (each factor is one IEEE division + one ln on
    exact integers, so both engines quantize identically — the x138 exp
    discipline). Plan: two user-keyed hash aggs (first signup, first
    qualifying purchase via conditional min — no self-join of raw
    events), a day-level agg, then windows over <= |distinct days| rows;
    the at-risk counts come from one descending cumulative sum, never a
    per-day rescan."""
    e = load(spark, sf_dir, "events")
    # r15 optimization (guide §2.4): the signup aggregate used to be
    # JOINED back to the event stream (an extra exchange + join) only so
    # each user's t0 sat next to their purchases. A window min over
    # user_id computes t0 in place, and the follow-up groupBy is on the
    # SAME key, so it reuses the window's partitioning — one exchange,
    # no join, identical (user_id, t0, tp) rows.
    p = (
        e.withColumn(
            "t0",
            F.min(
                F.when(F.col("event_type") == "signup", F.col("ts"))
            ).over(Window.partitionBy("user_id")),
        )
        .filter(F.col("t0").isNotNull())
        .groupBy("user_id", "t0")
        .agg(
            F.min(
                F.when(
                    (F.col("event_type") == "purchase")
                    & (F.col("ts") >= F.col("t0")),
                    F.col("ts"),
                )
            ).alias("tp")
        )
    )
    horizon = e.agg(F.max("ts").alias("tmax"))
    subj = p.crossJoin(F.broadcast(horizon)).select(
        F.when(
            F.col("tp").isNotNull(), F.datediff(F.col("tp"), F.col("t0"))
        )
        .otherwise(F.datediff(F.col("tmax"), F.col("t0")))
        .alias("dur"),
        F.col("tp").isNotNull().cast("int").alias("converted"),
    )
    # n_risk(d) = #subjects with dur >= d: one agg over ALL durations
    # (censored included) + a reverse cumulative sum over distinct days
    alldur = subj.groupBy("dur").agg(
        F.count(F.lit(1)).alias("n_at"),
        F.sum("converted").alias("d_events"),
    )
    w_desc = (
        Window.orderBy(F.col("dur").desc())
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    risk = alldur.select(
        "dur",
        "d_events",
        F.sum("n_at").over(w_desc).alias("n_risk"),
    ).filter(F.col("d_events") > 0)
    t = risk.select(
        F.col("dur").alias("day"),
        F.col("d_events").cast("long"),
        F.col("n_risk").cast("long"),
        # S hits exactly 0 when the whole remaining risk set converts at
        # d (necessarily the last output day): no ln exists, emit
        # survival 0 / ln_surv NULL instead of -inf
        F.when(
            F.col("n_risk") > F.col("d_events"),
            F.log(
                (F.col("n_risk") - F.col("d_events")).cast("double")
                / F.col("n_risk")
            ).cast("decimal(18,9)"),
        ).alias("lnf"),
    )
    w_asc = Window.orderBy("day").rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    c = t.select(
        "day",
        "d_events",
        "n_risk",
        F.sum("lnf").over(w_asc).cast("decimal(18,9)").alias("lns"),
    )
    deg = F.col("n_risk") == F.col("d_events")
    return c.select(
        "day",
        "d_events",
        "n_risk",
        F.when(~deg, dround(F.col("lns").cast("double"), 6)).alias("ln_surv"),
        F.when(deg, F.lit(0.0))
        .otherwise(dround(F.exp(F.col("lns").cast("double")), 6))
        .alias("survival"),
    ).orderBy("day")


@query(
    "x189_theta_sketch_overlap",
    oracle="""
    WITH u AS (SELECT DISTINCT event_type, user_id FROM events
               WHERE event_type IN ('view', 'purchase')),
    h AS (SELECT event_type, user_id,
                 CAST('0x' || substring(md5(CAST(user_id AS VARCHAR)), 1, 15)
                      AS BIGINT) AS hv
          FROM u),
    rk AS (SELECT event_type, hv,
                  row_number() OVER (PARTITION BY event_type ORDER BY hv)
                    AS rn,
                  count(*) OVER (PARTITION BY event_type) AS n_set
           FROM h),
    smp AS (SELECT event_type, hv, n_set FROM rk WHERE rn <= 256),
    th AS (SELECT event_type,
                  CAST(max(n_set) AS BIGINT) AS n_set,
                  CASE WHEN max(n_set) >= 256 THEN CAST(max(hv) AS BIGINT)
                       ELSE 1152921504606846976 END AS theta
           FROM smp GROUP BY event_type),
    tmin AS (SELECT CAST(min(theta) AS BIGINT) AS theta FROM th),
    common AS (SELECT CAST(count(*) AS BIGINT) AS c
               FROM smp a JOIN smp b
                 ON a.hv = b.hv AND a.event_type = 'view'
                    AND b.event_type = 'purchase'
               CROSS JOIN tmin WHERE a.hv < tmin.theta),
    exact AS (SELECT CAST(count(*) AS BIGINT) AS both
              FROM (SELECT user_id FROM u WHERE event_type = 'view'
                    INTERSECT
                    SELECT user_id FROM u WHERE event_type = 'purchase')),
    na AS (SELECT CAST(n_set AS BIGINT) AS n_view FROM th
           WHERE event_type = 'view'),
    nb AS (SELECT CAST(n_set AS BIGINT) AS n_purchase FROM th
           WHERE event_type = 'purchase')
    SELECT na.n_view, nb.n_purchase, exact.both AS exact_both,
           CAST(CAST(common.c AS HUGEINT) * 1152921504606846976
                // tmin.theta AS BIGINT) AS est_both,
           CAST(abs(CAST(common.c AS HUGEINT) * 1152921504606846976
                    // tmin.theta - exact.both) * 1000000
                // greatest(exact.both, 1) AS BIGINT) AS err_ppm
    FROM na CROSS JOIN nb CROSS JOIN exact CROSS JOIN common CROSS JOIN tmin
    """,
)
def x189_theta_sketch_overlap(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Theta-sketch (KMV-family) set-intersection estimate of the
    view/purchase audience overlap, audited against the exact distinct
    intersection — the sketch that answers 'how many users did BOTH'
    from two fixed-size samples when the user sets live on different
    clusters or arrive at different times (HLL unions but cannot
    intersect without inclusion-exclusion blowup; the theta sketch
    intersects by construction). k = 256 smallest 60-bit md5 hashes per
    set; theta = min of the two set thresholds (a set smaller than k is
    exact, theta = 2^60); estimate = |common hashes below theta| *
    2^60 div theta — deterministic integers end-to-end (the x178 hash
    idiom), so the ESTIMATE itself is oracle-checkable, and err_ppm
    records the sketch error against truth. 100 TB shape: each set's
    sample is a per-type top-k over hashes (partitioned window +
    mergeable min-k, the x177 reservoir contract) — 256 rows per set
    cross the wire, never the user sets."""
    k = 256
    two60 = 1_152_921_504_606_846_976
    e = load(spark, sf_dir, "events")
    u = (
        e.filter(F.col("event_type").isin("view", "purchase"))
        .select("event_type", "user_id")
        .distinct()
    )
    h = u.select(
        "event_type",
        F.expr(
            "cast(conv(substring(md5(cast(user_id as string)), 1, 15),"
            " 16, 10) as bigint)"
        ).alias("hv"),
    )
    wr = Window.partitionBy("event_type").orderBy("hv")
    wc = Window.partitionBy("event_type")
    rk = h.select(
        "event_type",
        "hv",
        F.row_number().over(wr).alias("rn"),
        F.count(F.lit(1)).over(wc).alias("n_set"),
    )
    smp = rk.filter(F.col("rn") <= k)
    th = smp.groupBy("event_type").agg(
        F.max("n_set").cast("long").alias("n_set"),
        F.when(F.max("n_set") >= k, F.max("hv"))
        .otherwise(F.lit(two60))
        .cast("long")
        .alias("theta"),
    )
    tmin = th.agg(F.min("theta").cast("long").alias("theta"))
    sa = smp.filter(F.col("event_type") == "view").select(
        F.col("hv").alias("ha")
    )
    sb = smp.filter(F.col("event_type") == "purchase").select(
        F.col("hv").alias("hb")
    )
    common = (
        sa.join(sb, F.col("ha") == F.col("hb"))
        .crossJoin(F.broadcast(tmin))
        .filter(F.col("ha") < F.col("theta"))
        .agg(F.count(F.lit(1)).cast("long").alias("c"))
    )
    ev = u.filter(F.col("event_type") == "view").select("user_id")
    ep = u.filter(F.col("event_type") == "purchase").select("user_id")
    exact = (
        ev.intersect(ep).agg(F.count(F.lit(1)).cast("long").alias("both"))
    )
    na = th.filter(F.col("event_type") == "view").select(
        F.col("n_set").alias("n_view")
    )
    nb = th.filter(F.col("event_type") == "purchase").select(
        F.col("n_set").alias("n_purchase")
    )
    est = F.expr(
        "cast(c as decimal(38,0)) * {t} div theta".format(t=two60)
    )
    return (
        na.crossJoin(F.broadcast(nb))
        .crossJoin(F.broadcast(exact))
        .crossJoin(F.broadcast(common))
        .crossJoin(F.broadcast(tmin))
        .select(
            "n_view",
            "n_purchase",
            F.col("both").alias("exact_both"),
            est.cast("long").alias("est_both"),
            F.expr(
                "cast(abs(cast(c as decimal(38,0)) * {t} div theta - both)"
                " * 1000000 div greatest(both, 1) as bigint)".format(t=two60)
            ).alias("err_ppm"),
        )
    )


@query(
    "x201_volume_autocorrelation",
    oracle=f"""
    WITH day AS (SELECT event_type, CAST(ts AS DATE) AS day,
                        CAST(count(*) AS BIGINT) AS c
                 FROM events GROUP BY 1, 2),
    st AS (SELECT event_type, CAST(count(*) AS BIGINT) AS n,
                  CAST(sum(c) AS BIGINT) AS s
           FROM day GROUP BY event_type),
    dev AS (SELECT day.event_type, day.day,
                   day.c * st.n - st.s AS d
            FROM day JOIN st USING (event_type)),
    den AS (SELECT event_type,
                   CAST(sum(CAST(d AS HUGEINT) * d) AS HUGEINT) AS den
            FROM dev GROUP BY event_type),
    lags AS (SELECT unnest(range(1, 8)) AS lag_days),
    p AS (SELECT a.event_type, lags.lag_days,
                 CAST(count(*) AS BIGINT) AS n_pairs,
                 CAST(sum(CAST(a.d AS HUGEINT) * b.d) AS HUGEINT) AS num
          FROM dev a CROSS JOIN lags
          JOIN dev b ON b.event_type = a.event_type
                    AND b.day = a.day + CAST(lags.lag_days AS INTEGER)
          GROUP BY 1, 2)
    SELECT p.event_type, CAST(p.lag_days AS BIGINT) AS lag_days, p.n_pairs,
           {dround_sql("CAST(num AS DOUBLE) / CAST(den AS DOUBLE)", 6)} AS acf
    FROM p JOIN den USING (event_type)
    ORDER BY p.event_type, lag_days
    """,
)
def x201_volume_autocorrelation(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Autocorrelation of daily event volume at lags 1..7 per event type —
    the weekly-seasonality / burst-persistence diagnostic (x132's ANOVA
    asks "does day-of-week explain variance"; the ACF asks "how long does
    a deviation PERSIST", which is what capacity planning and anomaly
    windows key on; lag-7 spikes = weekly cycle). Exactness: deviations
    are multiplied through by n_days (d_t = c_t*n - S, the x169 identity,
    so no float mean), numerator and denominator accumulate exact
    128-bit/decimal products — cast BEFORE the multiply (the x167/x182
    overflow lesson) — and the single double division per row is rounded
    once. Lag pairing joins day d with day d+k on the calendar, so gap
    days pair with nothing rather than silently shifting the series.
    Plan: one (type, day) hash agg, then everything runs on the
    |types| x |days| day table — broadcast joins, bounded shuffles; the
    corpus is scanned exactly once at any scale."""
    e = load(spark, sf_dir, "events")
    day = e.groupBy("event_type", F.to_date("ts").alias("day")).agg(
        F.count(F.lit(1)).alias("c")
    )
    st = day.groupBy("event_type").agg(
        F.count(F.lit(1)).alias("n"), F.sum("c").alias("s")
    )
    dev = day.join(F.broadcast(st), "event_type").select(
        "event_type",
        "day",
        (F.col("c") * F.col("n") - F.col("s")).alias("d"),
    )
    den = dev.groupBy("event_type").agg(
        F.sum(F.col("d").cast("decimal(38,0)") * F.col("d")).alias("den")
    )
    a = dev.select(
        "event_type",
        "day",
        F.col("d").alias("da"),
        F.explode(F.sequence(F.lit(1), F.lit(7))).alias("lag_days"),
    )
    b = dev.select(
        "event_type", F.col("day").alias("day_b"), F.col("d").alias("db")
    )
    p = (
        a.join(
            b,
            (a["event_type"] == b["event_type"])
            & (F.col("day_b") == F.date_add(F.col("day"), F.col("lag_days"))),
        )
        .drop(b["event_type"])
        .groupBy("event_type", "lag_days")
        .agg(
            F.count(F.lit(1)).alias("n_pairs"),
            F.sum(F.col("da").cast("decimal(38,0)") * F.col("db")).alias("num"),
        )
    )
    return (
        p.join(F.broadcast(den), "event_type")
        .select(
            "event_type",
            F.col("lag_days").cast("long").alias("lag_days"),
            F.col("n_pairs").cast("long").alias("n_pairs"),
            dround(
                F.col("num").cast("double") / F.col("den").cast("double"), 6
            ).alias("acf"),
        )
        .orderBy("event_type", "lag_days")
    )


@query(
    "x202_interarrival_profile",
    oracle="""
    WITH g AS (SELECT event_type,
                      (epoch_us(ts) - epoch_us(lag(ts) OVER (
                          PARTITION BY event_type ORDER BY ts, event_id)))
                      // 1000000 AS gap_s
               FROM events),
    gg AS (SELECT event_type, CAST(gap_s AS BIGINT) AS gap_s
           FROM g WHERE gap_s IS NOT NULL),
    hist AS (SELECT event_type, gap_s, CAST(count(*) AS BIGINT) AS c
             FROM gg GROUP BY 1, 2),
    cum AS (SELECT event_type, gap_s, c,
                   CAST(sum(c) OVER (PARTITION BY event_type ORDER BY gap_s
                        ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                     AS BIGINT) AS cum_c
            FROM hist),
    tot AS (SELECT event_type, CAST(sum(c) AS BIGINT) AS n_gaps,
                   CAST(max(gap_s) AS BIGINT) AS max_s
            FROM hist GROUP BY event_type)
    SELECT cum.event_type, tot.n_gaps,
           CAST(min(CASE WHEN cum_c >= (n_gaps + 1) // 2
                    THEN gap_s END) AS BIGINT) AS p50_s,
           CAST(min(CASE WHEN cum_c >= (9 * n_gaps + 9) // 10
                    THEN gap_s END) AS BIGINT) AS p90_s,
           CAST(min(CASE WHEN cum_c >= (99 * n_gaps + 99) // 100
                    THEN gap_s END) AS BIGINT) AS p99_s,
           tot.max_s
    FROM cum JOIN tot ON cum.event_type = tot.event_type
    GROUP BY cum.event_type, tot.n_gaps, tot.max_s
    ORDER BY cum.event_type
    """,
)
def x202_interarrival_profile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Inter-arrival time profile per event type: p50/p90/p99/max of the
    gap (whole seconds) between consecutive events — the arrival-process
    health check behind poll-interval tuning, SLA alerting ("p99 silence
    is 40 minutes — page after an hour"), and bot detection (p50 near 0).

    The naive plan is ONE lag window per event type over every event —
    exactly the corpus-sized-partition shape this repo's x182/x58 work
    exists to kill. Instead the lag is DAY-SHARDED with a boundary
    stitch, which reproduces the global gap multiset exactly: (a) lag
    within (type, day) partitions — bounded by a day's traffic; (b) each
    day's first event pairs with the PREVIOUS data-day's last event via
    a lag over the per-(type, day) min/max table, which has |types| x
    |days| rows — so calendar gap days contribute one long gap, same as
    the global window would. (Tie order within equal ts never changes
    the gap MULTISET: equal timestamps yield zero gaps in any order.)
    Quantiles then read a (type, gap_s) value histogram cumulated over
    the bounded gap-value domain (the x200/x188 selection idiom), never
    ranking raw events. The oracle runs the naive global-window form —
    agreeing with it IS the exactness claim for the decomposition."""
    e = load(spark, sf_dir, "events").select(
        "event_type", "ts", "event_id", F.to_date("ts").alias("day")
    )
    wd = Window.partitionBy("event_type", "day").orderBy("ts", "event_id")
    within = (
        e.withColumn("prev_ts", F.lag("ts").over(wd))
        .filter(F.col("prev_ts").isNotNull())
        .select(
            "event_type",
            F.expr(
                "(unix_micros(ts) - unix_micros(prev_ts)) div 1000000"
            ).alias("gap_s"),
        )
    )
    daily = e.groupBy("event_type", "day").agg(
        F.min("ts").alias("first_ts"), F.max("ts").alias("last_ts")
    )
    wb = Window.partitionBy("event_type").orderBy("day")
    boundary = (
        daily.withColumn("prev_last", F.lag("last_ts").over(wb))
        .filter(F.col("prev_last").isNotNull())
        .select(
            "event_type",
            F.expr(
                "(unix_micros(first_ts) - unix_micros(prev_last)) div 1000000"
            ).alias("gap_s"),
        )
    )
    gaps = within.unionByName(boundary)
    hist = gaps.groupBy("event_type", "gap_s").agg(
        F.count(F.lit(1)).alias("c")
    )
    wc = (
        Window.partitionBy("event_type")
        .orderBy("gap_s")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    cum = hist.select(
        "event_type", "gap_s", F.sum("c").over(wc).alias("cum_c")
    )
    tot = hist.groupBy("event_type").agg(
        F.sum("c").alias("n_gaps"), F.max("gap_s").alias("max_s")
    )
    pick = lambda r: F.min(F.when(F.col("cum_c") >= r, F.col("gap_s")))  # noqa: E731
    return (
        cum.join(F.broadcast(tot), "event_type")
        .groupBy("event_type", "n_gaps", "max_s")
        .agg(
            pick(F.expr("(n_gaps + 1) div 2")).cast("long").alias("p50_s"),
            pick(F.expr("(9 * n_gaps + 9) div 10")).cast("long").alias("p90_s"),
            pick(F.expr("(99 * n_gaps + 99) div 100")).cast("long").alias("p99_s"),
        )
        .select(
            "event_type",
            F.col("n_gaps").cast("long").alias("n_gaps"),
            "p50_s",
            "p90_s",
            "p99_s",
            F.col("max_s").cast("long").alias("max_s"),
        )
        .orderBy("event_type")
    )


@query(
    "x204_mann_kendall_trend",
    oracle=f"""
    WITH day AS (SELECT event_type, CAST(ts AS DATE) AS day,
                        CAST(count(*) AS BIGINT) AS c
                 FROM events GROUP BY 1, 2),
    s AS (SELECT a.event_type,
                 CAST(sum(CASE WHEN b.c > a.c THEN 1
                               WHEN b.c < a.c THEN -1 ELSE 0 END)
                      AS BIGINT) AS s_stat
          FROM day a JOIN day b
            ON a.event_type = b.event_type AND a.day < b.day
          GROUP BY 1),
    ties AS (SELECT event_type,
                    CAST(sum(t * (t - 1) * (2 * t + 5)) AS BIGINT) AS tie_corr
             FROM (SELECT event_type, c, CAST(count(*) AS BIGINT) AS t
                   FROM day GROUP BY 1, 2)
             GROUP BY event_type),
    st AS (SELECT event_type, CAST(count(*) AS BIGINT) AS n_days
           FROM day GROUP BY event_type)
    SELECT st.event_type, st.n_days, s.s_stat,
           CAST(st.n_days * (st.n_days - 1) * (2 * st.n_days + 5)
                - ties.tie_corr AS BIGINT) AS var18,
           {dround_sql(
               "CASE WHEN s.s_stat > 0 THEN (s.s_stat - 1) / "
               "sqrt((st.n_days * (st.n_days - 1) * (2 * st.n_days + 5)"
               " - ties.tie_corr) / 18.0) "
               "WHEN s.s_stat < 0 THEN (s.s_stat + 1) / "
               "sqrt((st.n_days * (st.n_days - 1) * (2 * st.n_days + 5)"
               " - ties.tie_corr) / 18.0) ELSE 0.0 END", 6)} AS z
    FROM st JOIN s USING (event_type) JOIN ties USING (event_type)
    ORDER BY st.event_type
    """,
)
def x204_mann_kendall_trend(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Mann-Kendall monotonic-trend test on daily event volume per type —
    the significance HALF of the robust-trend pair (x179's Theil-Sen
    slope says how steep; this says whether the trend is real): S counts
    concordant minus discordant day pairs, and the normal approximation
    z = (S -+ 1) / sqrt(Var(S)) applies the standard continuity
    correction with the exact tie-corrected variance
    Var = [n(n-1)(2n+5) - sum t(t-1)(2t+5)] / 18. Everything up to the
    final z is EXACT integers (S from sign comparisons, var x 18 emitted
    as var18 for auditability); z itself is the query's one double
    expression, rounded once. Plan: the pair join and tie grouping run
    on the (type, day) table — |types| x |days| rows, day-pair work
    O(|days|^2) per type regardless of corpus size; the corpus is
    scanned exactly once for the day agg."""
    e = load(spark, sf_dir, "events")
    day = e.groupBy("event_type", F.to_date("ts").alias("day")).agg(
        F.count(F.lit(1)).alias("c")
    )
    a = day.select("event_type", F.col("day").alias("day_a"), F.col("c").alias("ca"))
    b = day.select("event_type", F.col("day").alias("day_b"), F.col("c").alias("cb"))
    s = (
        a.join(b, ["event_type"])
        .filter(F.col("day_a") < F.col("day_b"))
        .groupBy("event_type")
        .agg(
            F.sum(
                F.when(F.col("cb") > F.col("ca"), 1)
                .when(F.col("cb") < F.col("ca"), -1)
                .otherwise(0)
            ).alias("s_stat")
        )
    )
    ties = (
        day.groupBy("event_type", "c")
        .agg(F.count(F.lit(1)).alias("t"))
        .groupBy("event_type")
        .agg(
            F.sum(
                F.col("t") * (F.col("t") - 1) * (2 * F.col("t") + 5)
            ).alias("tie_corr")
        )
    )
    st = day.groupBy("event_type").agg(F.count(F.lit(1)).alias("n_days"))
    var18 = (
        F.col("n_days") * (F.col("n_days") - 1) * (2 * F.col("n_days") + 5)
        - F.col("tie_corr")
    )
    z = (
        F.when(
            F.col("s_stat") > 0,
            (F.col("s_stat") - 1) / F.sqrt(var18 / 18.0),
        )
        .when(
            F.col("s_stat") < 0,
            (F.col("s_stat") + 1) / F.sqrt(var18 / 18.0),
        )
        .otherwise(F.lit(0.0))
    )
    return (
        st.join(s, "event_type")
        .join(ties, "event_type")
        .select(
            "event_type",
            F.col("n_days").cast("long").alias("n_days"),
            F.col("s_stat").cast("long").alias("s_stat"),
            var18.cast("long").alias("var18"),
            dround(z, 6).alias("z"),
        )
        .orderBy("event_type")
    )


@query(
    "x205_conversion_wilson_ci",
    oracle=f"""
    WITH du AS (SELECT strftime(ts, '%Y-%m-%d') AS day, user_id,
                       max(CASE WHEN event_type = 'purchase'
                           THEN 1 ELSE 0 END) AS conv
                FROM events GROUP BY 1, 2),
    agg AS (SELECT day, CAST(count(*) AS BIGINT) AS n_users,
                   CAST(sum(conv) AS BIGINT) AS k_conv
            FROM du GROUP BY day)
    SELECT day, n_users, k_conv,
           CAST(k_conv * 1000000 // n_users AS BIGINT) AS rate_ppm,
           {dround_sql(
               "((k_conv * 1.0 / n_users) + 3.8416 / (2 * n_users)"
               " - 1.96 * sqrt((k_conv * 1.0 / n_users)"
               " * (1 - k_conv * 1.0 / n_users) / n_users"
               " + 3.8416 / (4.0 * n_users * n_users)))"
               " / (1 + 3.8416 / n_users)", 6)} AS wilson_lo,
           {dround_sql(
               "((k_conv * 1.0 / n_users) + 3.8416 / (2 * n_users)"
               " + 1.96 * sqrt((k_conv * 1.0 / n_users)"
               " * (1 - k_conv * 1.0 / n_users) / n_users"
               " + 3.8416 / (4.0 * n_users * n_users)))"
               " / (1 + 3.8416 / n_users)", 6)} AS wilson_hi
    FROM agg ORDER BY day
    """,
)
def x205_conversion_wilson_ci(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Daily user-level conversion rate (distinct users with a purchase /
    distinct active users) with its 95% WILSON score interval — the
    interval that behaves at small n and extreme rates where the normal
    (Wald) interval collapses, i.e. the number an experiment dashboard
    should print instead of a bare rate. k and n are exact integer
    distinct-user counts (one (day, user) hash agg with a conditional
    max — no count-distinct shuffle per metric); the rate is exact
    integer ppm; the interval bounds are each ONE mirrored double
    expression (z = 1.96, z^2 = 3.8416 as shared literals) rounded once
    — the same both-engines-evaluate-the-identical-expression-tree
    discipline as x40/x184. Plan: (day, user) agg then a |days|-row
    table; nothing else shuffles."""
    e = load(spark, sf_dir, "events")
    du = e.groupBy(
        F.date_format("ts", "yyyy-MM-dd").alias("day"), "user_id"
    ).agg(
        F.max(
            F.when(F.col("event_type") == "purchase", 1).otherwise(0)
        ).alias("conv")
    )
    agg = du.groupBy("day").agg(
        F.count(F.lit(1)).alias("n_users"), F.sum("conv").alias("k_conv")
    )
    p = F.col("k_conv") * 1.0 / F.col("n_users")
    z2n = 3.8416 / F.col("n_users")
    half = 1.96 * F.sqrt(
        p * (1 - p) / F.col("n_users")
        + 3.8416 / (4.0 * F.col("n_users") * F.col("n_users"))
    )
    center = p + 3.8416 / (2 * F.col("n_users"))
    return agg.select(
        "day",
        F.col("n_users").cast("long").alias("n_users"),
        F.col("k_conv").cast("long").alias("k_conv"),
        F.expr("k_conv * 1000000 div n_users").cast("long").alias("rate_ppm"),
        dround((center - half) / (1 + z2n), 6).alias("wilson_lo"),
        dround((center + half) / (1 + z2n), 6).alias("wilson_hi"),
    ).orderBy("day")


@query(
    "x207_markov_stationary",
    oracle="""
    WITH o AS (SELECT event_type,
                      lead(event_type) OVER (PARTITION BY user_id
                                             ORDER BY ts, event_id) AS nxt
               FROM events),
    big AS (SELECT event_type AS cur, nxt, CAST(count(*) AS BIGINT) AS n
            FROM o WHERE nxt IS NOT NULL GROUP BY 1, 2),
    tot AS (SELECT cur, CAST(sum(n) AS BIGINT) AS n_cur FROM big GROUP BY cur),
    k AS (SELECT CAST(count(*) AS BIGINT) AS nt FROM tot),
    p0 AS (SELECT cur AS t, CAST(1000000 // nt AS BIGINT) AS pi FROM tot, k),
    p1 AS (SELECT big.nxt AS t,
                  CAST(sum(CAST(p.pi AS HUGEINT) * big.n // tot.n_cur)
                       AS BIGINT) AS pi
           FROM big JOIN p0 p ON big.cur = p.t JOIN tot ON big.cur = tot.cur
           GROUP BY big.nxt),
    p2 AS (SELECT big.nxt AS t,
                  CAST(sum(CAST(p.pi AS HUGEINT) * big.n // tot.n_cur)
                       AS BIGINT) AS pi
           FROM big JOIN p1 p ON big.cur = p.t JOIN tot ON big.cur = tot.cur
           GROUP BY big.nxt),
    p3 AS (SELECT big.nxt AS t,
                  CAST(sum(CAST(p.pi AS HUGEINT) * big.n // tot.n_cur)
                       AS BIGINT) AS pi
           FROM big JOIN p2 p ON big.cur = p.t JOIN tot ON big.cur = tot.cur
           GROUP BY big.nxt)
    SELECT p3.t AS event_type, CAST(p3.pi AS BIGINT) AS pi_ppm
    FROM p3 ORDER BY event_type
    """,
)
def x207_markov_stationary(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Stationary distribution of x175's event-transition chain by three
    unrolled integer power iterations — where user behavior settles if
    the observed next-action dynamics keep running, the equilibrium the
    per-step matrix can't show directly (a type can be rare as an
    entry point yet dominant at equilibrium because chains funnel into
    it). Same hash-checkability scheme as x168/x203: pi starts uniform
    in ppm, each step computes pi'_j = sum_i (pi_i * n_ij) div n_i with
    the product cast wide BEFORE multiplying (x167 rule) and exact floor
    division per term on non-negative operands — both engines evaluate
    the identical integer recursion, so three iterations are three CTEs.
    Mass lost to floor-rounding (and to types with no outgoing edges)
    is part of the defined arithmetic, identical in both engines. Plan:
    the one user-keyed lead window x175 already pays, a |types|^2 agg,
    then iterations on |types|-row broadcasts — no corpus access after
    the first pass."""
    e = load(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    o = e.select(
        F.col("event_type").alias("cur"),
        F.lead("event_type").over(w).alias("nxt"),
    ).filter(F.col("nxt").isNotNull())
    # ONE corpus pass (the lead window), materialized at |types|^2 rows:
    # without the checkpoint the nt probe and each of the 3 iterations
    # replays the window over the corpus (the x203 lesson)
    big = (
        o.groupBy("cur", "nxt")
        .agg(F.count(F.lit(1)).alias("n"))
        .localCheckpoint(eager=True)
    )
    tot = big.groupBy("cur").agg(F.sum("n").alias("n_cur"))
    bigt = big.join(tot, "cur")
    nt = tot.count()  # |event types|: bounded driver probe, like x71's
    pi = tot.select(
        F.col("cur").alias("t"), F.lit(1_000_000 // nt).cast("long").alias("pi")
    )
    for _ in range(3):
        pi = (
            bigt.join(F.broadcast(pi), bigt["cur"] == pi["t"])
            .groupBy(F.col("nxt").alias("t2"))
            .agg(
                F.sum(
                    F.expr("cast(pi as decimal(38,0)) * n div n_cur")
                )
                .cast("long")
                .alias("pi")
            )
            .withColumnRenamed("t2", "t")
        )
    return pi.select(
        F.col("t").alias("event_type"), F.col("pi").cast("long").alias("pi_ppm")
    ).orderBy("event_type")


@query(
    "x208_session_profile",
    oracle="""
    WITH o AS (SELECT user_id, ts, epoch_us(ts) AS us,
                      CASE WHEN epoch_us(ts) - lag(epoch_us(ts)) OVER w
                                >= 300000000
                           OR lag(ts) OVER w IS NULL
                           THEN 1 ELSE 0 END AS brk
               FROM events
               WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)),
    s AS (SELECT user_id, us,
                 CAST(sum(brk) OVER (PARTITION BY user_id ORDER BY us
                      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                   AS BIGINT) AS sess
          FROM o),
    per AS (SELECT user_id, sess, CAST(count(*) AS BIGINT) AS n_events,
                   CAST((max(us) - min(us)) // 1000000 AS BIGINT) AS dur_s
            FROM s GROUP BY 1, 2),
    dh AS (SELECT dur_s AS v, CAST(count(*) AS BIGINT) AS c
           FROM per GROUP BY 1),
    dc AS (SELECT v, CAST(sum(c) OVER (ORDER BY v
                 ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
              AS BIGINT) AS cum
           FROM dh),
    dt AS (SELECT CAST(sum(c) AS BIGINT) AS n, CAST(max(v) AS BIGINT) AS mx
           FROM dh),
    eh AS (SELECT n_events AS v, CAST(count(*) AS BIGINT) AS c
           FROM per GROUP BY 1),
    ec AS (SELECT v, CAST(sum(c) OVER (ORDER BY v
                 ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
              AS BIGINT) AS cum
           FROM eh),
    dq AS (SELECT CAST(min(CASE WHEN cum >= (n + 1) // 2 THEN v END)
                    AS BIGINT) AS p50_dur_s,
                  CAST(min(CASE WHEN cum >= (9 * n + 9) // 10 THEN v END)
                    AS BIGINT) AS p90_dur_s
           FROM dc, dt),
    eq AS (SELECT CAST(min(CASE WHEN cum >= (n + 1) // 2 THEN v END)
                    AS BIGINT) AS p50_events,
                  CAST(min(CASE WHEN cum >= (9 * n + 9) // 10 THEN v END)
                    AS BIGINT) AS p90_events
           FROM ec, dt)
    SELECT dt.n AS n_sessions, dq.p50_dur_s, dq.p90_dur_s, dt.mx AS max_dur_s,
           eq.p50_events, eq.p90_events
    FROM dt, dq, eq
    """,
)
def x208_session_profile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Corpus-level session profile: p50/p90/max session DURATION and
    p50/p90 events-per-session under 5-minute gap sessionization — the
    engagement shape a product/capacity review reads (x11c materializes
    the session rows themselves; this is the distribution summary you'd
    actually alert on). Sessionization is the x11c lag + cumulative-sum
    idiom inside per-USER windows (bounded by one user's activity, the
    same partitioning x175/x82 reuse — never corpus- or type-sized);
    quantiles read (value, count) histograms cumulated over the bounded
    value domain (the x200/x202 selection idiom) with exact integer
    ceil-ranks. Everything is integer microseconds/counts end to end —
    no doubles anywhere. Plan at 100 TB: one user-keyed window pass,
    one (user, session) agg riding the same partitioning, then two
    value-domain histograms; output is a single row."""
    e = load(spark, sf_dir, "events")
    wu = Window.partitionBy("user_id").orderBy("ts", "event_id")
    o = e.select(
        "user_id",
        F.unix_micros("ts").alias("us"),
        F.when(
            (
                F.unix_micros("ts") - F.lag(F.unix_micros("ts")).over(wu)
                >= 300_000_000
            )
            | F.lag("ts").over(wu).isNull(),
            1,
        )
        .otherwise(0)
        .alias("brk"),
    )
    ws = (
        Window.partitionBy("user_id")
        .orderBy("us")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    s = o.select("user_id", "us", F.sum("brk").over(ws).alias("sess"))
    per = s.groupBy("user_id", "sess").agg(
        F.count(F.lit(1)).alias("n_events"),
        F.expr("(max(us) - min(us)) div 1000000").alias("dur_s"),
    )

    def hist_quantiles(col, p50_name, p90_name):
        h = per.groupBy(F.col(col).alias("v")).agg(
            F.count(F.lit(1)).alias("c")
        )
        wc = Window.orderBy("v").rowsBetween(
            Window.unboundedPreceding, Window.currentRow
        )
        cum = h.select("v", F.sum("c").over(wc).alias("cum"))
        t = h.agg(F.sum("c").alias("n"), F.max("v").alias("mx"))
        return (
            cum.crossJoin(F.broadcast(t))
            .agg(
                F.min(
                    F.when(F.expr("cum >= (n + 1) div 2"), F.col("v"))
                ).cast("long").alias(p50_name),
                F.min(
                    F.when(F.expr("cum >= (9 * n + 9) div 10"), F.col("v"))
                ).cast("long").alias(p90_name),
            )
        )

    dt = per.agg(
        F.count(F.lit(1)).cast("long").alias("n_sessions"),
        F.max("dur_s").cast("long").alias("max_dur_s"),
    )
    dq = hist_quantiles("dur_s", "p50_dur_s", "p90_dur_s")
    eq = hist_quantiles("n_events", "p50_events", "p90_events")
    return (
        dt.crossJoin(F.broadcast(dq))
        .crossJoin(F.broadcast(eq))
        .select(
            "n_sessions",
            "p50_dur_s",
            "p90_dur_s",
            "max_dur_s",
            "p50_events",
            "p90_events",
        )
    )


@query(
    "x209_funnel_step_timing",
    oracle="""
    WITH v AS (SELECT user_id, min(epoch_us(ts)) AS v_us
               FROM events WHERE event_type = 'view' GROUP BY user_id),
    c AS (SELECT e.user_id, min(epoch_us(e.ts)) AS c_us
          FROM events e JOIN v ON e.user_id = v.user_id
          WHERE e.event_type = 'click' AND epoch_us(e.ts) > v.v_us
          GROUP BY e.user_id),
    p AS (SELECT e.user_id, min(epoch_us(e.ts)) AS p_us
          FROM events e JOIN c ON e.user_id = c.user_id
          WHERE e.event_type = 'purchase' AND epoch_us(e.ts) > c.c_us
          GROUP BY e.user_id),
    g AS (SELECT 'view_to_click' AS step,
                 CAST((c.c_us - v.v_us) // 1000000 AS BIGINT) AS gap_s
          FROM c JOIN v ON c.user_id = v.user_id
          UNION ALL
          SELECT 'click_to_purchase' AS step,
                 CAST((p.p_us - c.c_us) // 1000000 AS BIGINT) AS gap_s
          FROM p JOIN c ON p.user_id = c.user_id),
    h AS (SELECT step, gap_s, CAST(count(*) AS BIGINT) AS cnt
          FROM g GROUP BY 1, 2),
    cum AS (SELECT step, gap_s, CAST(sum(cnt) OVER (PARTITION BY step
                 ORDER BY gap_s
                 ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
              AS BIGINT) AS cum
            FROM h),
    t AS (SELECT step, CAST(sum(cnt) AS BIGINT) AS n_users,
                 CAST(max(gap_s) AS BIGINT) AS max_s
          FROM h GROUP BY step)
    SELECT cum.step, t.n_users,
           CAST(min(CASE WHEN cum >= (n_users + 1) // 2 THEN gap_s END)
             AS BIGINT) AS p50_s,
           CAST(min(CASE WHEN cum >= (9 * n_users + 9) // 10 THEN gap_s END)
             AS BIGINT) AS p90_s,
           t.max_s
    FROM cum JOIN t ON cum.step = t.step
    GROUP BY cum.step, t.n_users, t.max_s
    ORDER BY cum.step
    """,
)
def x209_funnel_step_timing(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Time-to-next-step distribution along the view -> click -> purchase
    funnel (greedy earliest chain, x82's semantics): p50/p90/max seconds
    from first view to first subsequent click and from that click to the
    first subsequent purchase — the latency companion to x82's WHO
    converts and x186's censoring-corrected WHETHER; this is the
    'how long does conversion take for those who convert' curve an
    attribution window must be sized against. Steps resolve by
    min-timestamp aggs chained through strictly-later joins (no per-user
    window needed at all); quantiles read a (step, gap_s) value
    histogram with exact integer ceil-ranks (the x200/x202/x208
    selection idiom). All integer microseconds end to end. Plan: three
    user-keyed hash aggs + broadcast-sized step joins, then a
    two-partition histogram window over the gap-value domain."""
    e = load(spark, sf_dir, "events").select(
        "user_id", "event_type", F.unix_micros("ts").alias("us")
    )
    v = (
        e.filter(F.col("event_type") == "view")
        .groupBy("user_id")
        .agg(F.min("us").alias("v_us"))
    )
    c = (
        e.filter(F.col("event_type") == "click")
        .join(v, "user_id")
        .filter(F.col("us") > F.col("v_us"))
        .groupBy("user_id")
        .agg(F.min("us").alias("c_us"))
    )
    p = (
        e.filter(F.col("event_type") == "purchase")
        .join(c, "user_id")
        .filter(F.col("us") > F.col("c_us"))
        .groupBy("user_id")
        .agg(F.min("us").alias("p_us"))
    )
    g = (
        c.join(v, "user_id")
        .select(
            F.lit("view_to_click").alias("step"),
            F.expr("(c_us - v_us) div 1000000").alias("gap_s"),
        )
        .unionByName(
            p.join(c, "user_id").select(
                F.lit("click_to_purchase").alias("step"),
                F.expr("(p_us - c_us) div 1000000").alias("gap_s"),
            )
        )
    )
    h = g.groupBy("step", "gap_s").agg(F.count(F.lit(1)).alias("cnt"))
    wc = (
        Window.partitionBy("step")
        .orderBy("gap_s")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    cum = h.select("step", "gap_s", F.sum("cnt").over(wc).alias("cum"))
    t = h.groupBy("step").agg(
        F.sum("cnt").alias("n_users"), F.max("gap_s").alias("max_s")
    )
    return (
        cum.join(F.broadcast(t), "step")
        .groupBy("step", "n_users", "max_s")
        .agg(
            F.min(
                F.when(F.expr("cum >= (n_users + 1) div 2"), F.col("gap_s"))
            ).cast("long").alias("p50_s"),
            F.min(
                F.when(
                    F.expr("cum >= (9 * n_users + 9) div 10"), F.col("gap_s")
                )
            ).cast("long").alias("p90_s"),
        )
        .select(
            "step",
            F.col("n_users").cast("long").alias("n_users"),
            "p50_s",
            "p90_s",
            F.col("max_s").cast("long").alias("max_s"),
        )
        .orderBy("step")
    )


@query(
    "x219_peak_concurrency",
    oracle="""
    WITH o AS (SELECT user_id, ts, event_id,
                      epoch_us(ts) - epoch_us(lag(ts) OVER (
                          PARTITION BY user_id ORDER BY ts, event_id))
                          AS gap_us
               FROM events),
    sess AS (SELECT user_id, ts,
                    sum(CASE WHEN gap_us IS NULL OR gap_us > 1800000000
                        THEN 1 ELSE 0 END) OVER (
                        PARTITION BY user_id ORDER BY ts, event_id
                        ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                        AS sid
             FROM o),
    b AS (SELECT user_id, sid,
                 date_trunc('minute', min(ts)) AS s_min,
                 date_trunc('minute', max(ts)) AS e_min
          FROM sess GROUP BY 1, 2),
    mins AS (SELECT unnest(generate_series(s_min, e_min,
                    INTERVAL 1 MINUTE)) AS minute
             FROM b),
    conc AS (SELECT minute, CAST(count(*) AS BIGINT) AS c
             FROM mins GROUP BY minute),
    dmax AS (SELECT CAST(minute AS DATE) AS day, max(c) AS peak
             FROM conc GROUP BY 1)
    SELECT strftime(d.day, '%Y-%m-%d') AS day,
           CAST(d.peak AS BIGINT) AS peak_sessions,
           strftime(min(c.minute), '%Y-%m-%d %H:%M') AS first_peak_minute
    FROM dmax d JOIN conc c
         ON CAST(c.minute AS DATE) = d.day AND c.c = d.peak
    GROUP BY d.day, d.peak ORDER BY day
    """,
)
def x219_peak_concurrency(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Peak concurrent sessions per day (and the first minute it was
    hit) — the interval-overlap counting problem behind capacity
    planning ("how many users were on AT ONCE", vs x105's rolling
    ACTIVE-in-window count, which ignores overlap). Sessionization is
    the x208 30-minute-gap rule on a user-partitioned window (exact
    microsecond gaps); each session then covers its minute RANGE via
    sequence-explode, so concurrency is a hash count on the MINUTE
    value domain and the daily peak is a max over |days| rows — the
    classic +1/-1 sweep-line collapsed onto a bounded time grid, with
    no global ordering anywhere. Explode fan-out is bounded by session
    minutes (gap rule caps idle stretches at 30 min). Ties on the peak
    resolve to the earliest minute, deterministically."""
    e = load(spark, sf_dir, "events")
    wu = Window.partitionBy("user_id").orderBy("ts", "event_id")
    gap = F.unix_micros("ts") - F.lag(F.unix_micros("ts")).over(wu)
    sess = e.select(
        "user_id",
        "ts",
        F.sum(
            F.when(gap.isNull() | (gap > 1_800_000_000), 1).otherwise(0)
        )
        .over(wu.rowsBetween(Window.unboundedPreceding, 0))
        .alias("sid"),
    )
    b = sess.groupBy("user_id", "sid").agg(
        F.date_trunc("minute", F.min("ts")).alias("s_min"),
        F.date_trunc("minute", F.max("ts")).alias("e_min"),
    )
    mins = b.select(
        F.explode(
            F.sequence("s_min", "e_min", F.expr("INTERVAL 1 MINUTE"))
        ).alias("minute")
    )
    conc = mins.groupBy("minute").agg(F.count(F.lit(1)).alias("c"))
    dmax = conc.groupBy(F.to_date("minute").alias("day")).agg(
        F.max("c").alias("peak")
    )
    return (
        conc.join(
            F.broadcast(dmax),
            (F.to_date("minute") == F.col("day"))
            & (F.col("c") == F.col("peak")),
        )
        .groupBy("day", "peak")
        .agg(F.min("minute").alias("pm"))
        .select(
            F.date_format("day", "yyyy-MM-dd").alias("day"),
            F.col("peak").cast("long").alias("peak_sessions"),
            F.date_format("pm", "yyyy-MM-dd HH:mm").alias(
                "first_peak_minute"
            ),
        )
        .orderBy("day")
    )


@query(
    "x254_session_gap_sweep",
    oracle="""
    WITH g AS (SELECT user_id, ts,
                      lag(ts) OVER (PARTITION BY user_id ORDER BY ts,
                                    event_id) AS prev_ts,
                      lead(ts) OVER (PARTITION BY user_id ORDER BY ts,
                                     event_id) AS next_ts
               FROM events),
    f AS (SELECT CASE WHEN prev_ts IS NULL THEN NULL
                      ELSE CAST(date_diff('second', prev_ts, ts) AS BIGINT)
                 END AS gap_prev,
                 CASE WHEN next_ts IS NULL THEN NULL
                      ELSE CAST(date_diff('second', ts, next_ts) AS BIGINT)
                 END AS gap_next
          FROM g),
    t AS (SELECT unnest([60, 300, 900, 3600]) AS threshold_s),
    n AS (SELECT CAST(count(*) AS BIGINT) AS n_events FROM events)
    SELECT CAST(t.threshold_s AS BIGINT) AS threshold_s,
           CAST(sum(CASE WHEN f.gap_prev IS NULL
                         OR f.gap_prev > t.threshold_s
                         THEN 1 ELSE 0 END) AS BIGINT) AS n_sessions,
           CAST(CAST(any_value(n.n_events) AS HUGEINT) * 1000000
                // sum(CASE WHEN f.gap_prev IS NULL
                            OR f.gap_prev > t.threshold_s
                            THEN 1 ELSE 0 END) AS BIGINT)
               AS events_per_session_ppm,
           CAST(sum(CASE WHEN (f.gap_prev IS NULL
                               OR f.gap_prev > t.threshold_s)
                         AND (f.gap_next IS NULL
                              OR f.gap_next > t.threshold_s)
                         THEN 1 ELSE 0 END) AS BIGINT)
               AS singleton_sessions
    FROM f, t, n GROUP BY t.threshold_s ORDER BY t.threshold_s
    """,
)
def x254_session_gap_sweep(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sessionization-threshold sensitivity sweep: session count, mean
    events per session, and singleton-session count at gap timeouts of
    1/5/15/60 minutes, from ONE per-user lag/lead pass — the evidence
    for choosing the session gap (x208 profiles sessions at a FIXED
    5-minute gap; this is the x109/x114-style sweep that justifies the
    5). A session starts where the preceding same-user gap exceeds the
    threshold, so n_sessions is a conditional count over gaps — no
    per-threshold re-sessionization — and a singleton is an event
    isolated on BOTH sides. Plan: one user-partitioned window (hash
    partition on user_id, never global), a 4-row threshold explode over
    the gap table's conditional sums, exact integer seconds
    throughout."""
    e = load(spark, sf_dir, "events")
    wu = Window.partitionBy("user_id").orderBy("ts", "event_id")
    g = e.select(
        "user_id",
        "ts",
        F.lag("ts").over(wu).alias("prev_ts"),
        F.lead("ts").over(wu).alias("next_ts"),
    ).select(
        (
            F.unix_timestamp("ts") - F.unix_timestamp("prev_ts")
        ).alias("gap_prev"),
        (
            F.unix_timestamp("next_ts") - F.unix_timestamp("ts")
        ).alias("gap_next"),
    )
    n = e.agg(F.count(F.lit(1)).cast("long").alias("n_events"))
    t = spark.range(0, 4).select(
        F.element_at(
            F.array(F.lit(60), F.lit(300), F.lit(900), F.lit(3600)),
            (F.col("id") + 1).cast("int"),
        )
        .cast("long")
        .alias("threshold_s")
    )
    starts = F.col("gap_prev").isNull() | (
        F.col("gap_prev") > F.col("threshold_s")
    )
    ends = F.col("gap_next").isNull() | (
        F.col("gap_next") > F.col("threshold_s")
    )
    return (
        g.crossJoin(F.broadcast(t))
        .crossJoin(F.broadcast(n))
        .groupBy("threshold_s")
        .agg(
            F.sum(starts.cast("long")).cast("long").alias("n_sessions"),
            F.expr(
                "cast(cast(any_value(n_events) as decimal(38,0)) * 1000000"
                " div sum(cast((gap_prev is null or gap_prev > threshold_s)"
                " as long)) as bigint)"
            ).alias("events_per_session_ppm"),
            F.sum((starts & ends).cast("long"))
            .cast("long")
            .alias("singleton_sessions"),
        )
        .orderBy("threshold_s")
    )
