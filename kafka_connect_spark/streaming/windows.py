"""X11 — event-time windowed aggregation with watermarks.

Works on both batch and streaming DataFrames (same F.window/session_window
operators); tests/test_streaming.py asserts streaming-over-replay equals
the batch run, and that watermarks drop late data.

Watermark semantics: state for a window closes once the watermark (max
event time seen minus the delay) passes the window end; later events for
that window are dropped. At 100 TB-scale streaming this bounds state size —
without it, windowed state grows with the key x window cross product
forever."""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from ..functions.rounding import dround


def _aggs(value_col: str) -> list[Column]:
    return [
        F.count(F.lit(1)).alias("cnt"),
        dround(F.sum(F.col(value_col).cast("decimal(38,6)")).cast("double"), 4).alias(
            "sum_value"
        ),
    ]


def tumbling_agg(
    df: DataFrame,
    ts_col: str = "ts",
    key_col: str | None = "event_type",
    window: str = "10 minutes",
    value_col: str = "value",
    watermark: str | None = None,
) -> DataFrame:
    if watermark:
        df = df.withWatermark(ts_col, watermark)
    keys = [F.window(ts_col, window).alias("win")] + ([key_col] if key_col else [])
    out = df.groupBy(*keys).agg(*_aggs(value_col))
    return out.select(
        F.col("win.start").alias("w"), *([key_col] if key_col else []), "cnt", "sum_value"
    )


def sliding_agg(
    df: DataFrame,
    ts_col: str = "ts",
    window: str = "10 minutes",
    slide: str = "5 minutes",
    value_col: str = "value",
    watermark: str | None = None,
) -> DataFrame:
    if watermark:
        df = df.withWatermark(ts_col, watermark)
    out = df.groupBy(F.window(ts_col, window, slide).alias("win")).agg(*_aggs(value_col))
    return out.select(F.col("win.start").alias("w"), "cnt", "sum_value")


def rate_agg(
    df: DataFrame,
    ts_col: str = "ts",
    window: str = "1 minute",
    slide: str | None = None,
    value_col: str = "value",
    window_seconds: float = 60.0,
    watermark: str | None = None,
) -> DataFrame:
    """PromQL ``rate(counter[1m])`` as a windowed aggregation: per-second
    rate from the counter's (max - min) span inside each window — the
    dashboard's headline Source Record Poll/Write rate panels
    (reference grafana/dashboards/connect.json:1722,1825). Same operator
    for batch (the p3 oracle-checked analog) and STREAMING input: with a
    watermark, closed windows emit in append mode and state stays bounded
    by the watermark horizon; a ``slide`` gives the dashboard's refresh
    cadence (overlapping windows, each event in window/slide states)."""
    if watermark:
        df = df.withWatermark(ts_col, watermark)
    win = (
        F.window(ts_col, window, slide) if slide else F.window(ts_col, window)
    ).alias("win")
    return (
        df.groupBy(win)
        .agg(
            dround(
                (F.max(value_col) - F.min(value_col)) / F.lit(window_seconds), 6
            ).alias("rate_per_sec")
        )
        .select(F.col("win.start").alias("w"), "rate_per_sec")
    )


def _regression_window_agg(
    df: DataFrame,
    ts_col: str,
    key_col: str,
    window: str,
    slide: str | None,
    value_col: str,
    watermark: str | None,
) -> DataFrame:
    """Per-(window, series) least-squares sums over (minute index,
    centi-value) — the windowed twin of queries.metrics._regression_sums.
    The regression state is five bigints per group regardless of series
    length (pure sums => map-side partial aggregation, and in streaming the
    same sums are the incremental state Spark keeps per open window), so
    state scales with open windows x series, not with events — the property
    that makes the PromQL trend estimators viable on an unbounded stream."""
    if watermark:
        df = df.withWatermark(ts_col, watermark)
    # epoch offset keeps x small => n*sxx and sx*sx stay far from int64
    # overflow even for year-long windows
    epoch_min = 1704067200 // 60
    s = df.select(
        ts_col,
        key_col,
        (F.floor(F.unix_millis(ts_col) / F.lit(60000)).cast("long") - epoch_min).alias(
            "x"
        ),
        F.floor(F.col(value_col) * 100).cast("long").alias("y"),
    )
    win = (F.window(ts_col, window, slide) if slide else F.window(ts_col, window)).alias(
        "win"
    )
    a = s.groupBy(win, key_col).agg(
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


def deriv_agg(
    df: DataFrame,
    ts_col: str = "ts",
    key_col: str = "user_id",
    window: str = "30 minutes",
    slide: str | None = None,
    value_col: str = "value",
    watermark: str | None = None,
) -> DataFrame:
    """PromQL ``deriv(gauge[w])`` on a LIVE stream: per-second least-squares
    slope of each series inside each (sliding) window — the streaming twin
    of the batch p14 estimator, same integer-exact sums, same /6000
    (minutes->seconds x centi->units) final division."""
    a = _regression_window_agg(df, ts_col, key_col, window, slide, value_col, watermark)
    return a.select(
        F.col("win.start").alias("w"),
        key_col,
        dround(
            F.col("num").cast("double") / F.col("den").cast("double") / F.lit(6000.0), 6
        ).alias("deriv_per_sec"),
    )


def predict_linear_agg(
    df: DataFrame,
    ts_col: str = "ts",
    key_col: str = "user_id",
    window: str = "30 minutes",
    slide: str | None = None,
    value_col: str = "value",
    watermark: str | None = None,
    ahead_minutes: int = 60,
) -> DataFrame:
    """PromQL ``predict_linear(gauge[w], t)`` on a LIVE stream: extrapolate
    each series' in-window linear fit ``ahead_minutes`` past its newest
    sample (capacity alerts on live dashboards) — streaming twin of the
    batch p15 estimator, prediction algebraically folded to one pass."""
    a = _regression_window_agg(df, ts_col, key_col, window, slide, value_col, watermark)
    slope = F.col("num").cast("double") / F.col("den").cast("double")
    pred = (
        (
            F.col("sy").cast("double")
            + slope
            * (
                F.col("n") * (F.col("maxx") + F.lit(ahead_minutes)) - F.col("sx")
            ).cast("double")
        )
        / F.col("n").cast("double")
        / F.lit(100.0)
    )
    return a.select(
        F.col("win.start").alias("w"), key_col, dround(pred, 6).alias("predicted")
    )


def dedup_within_watermark(
    df: DataFrame,
    key_cols: list[str],
    ts_col: str = "ts",
    watermark: str = "10 minutes",
) -> DataFrame:
    """X11 streaming exact-dedup: ``dropDuplicatesWithinWatermark`` — the
    stateful twin of batch ``dropDuplicates`` (x12b) for at-least-once
    upstreams (Kafka redelivery, CDC replay). Dedup state for a key is kept
    only until the watermark passes its event time, so state is bounded by
    the redelivery horizon instead of growing with the full key history —
    the property that makes streaming dedup viable at 100 TB/day. Events
    older than the watermark are dropped outright (they cannot be checked
    against expired state), matching the watermark contract everywhere
    else in the engine."""
    return df.withWatermark(ts_col, watermark).dropDuplicatesWithinWatermark(key_cols)


def session_agg(
    df: DataFrame,
    ts_col: str = "ts",
    key_col: str = "user_id",
    gap: str = "5 minutes",
    value_col: str = "value",
    watermark: str | None = None,
) -> DataFrame:
    if watermark:
        df = df.withWatermark(ts_col, watermark)
    out = df.groupBy(F.session_window(ts_col, gap).alias("sw"), key_col).agg(
        *_aggs(value_col)
    )
    return out.select(
        key_col,
        F.col("sw.start").alias("session_start"),
        F.col("sw.end").alias("session_end"),
        "cnt",
        "sum_value",
    )


def downsample_tier_stream(
    sdf: DataFrame,
    ts_col: str = "ts",
    key_col: str = "event_type",
    window: str = "5 minutes",
    value_col: str = "value",
    watermark: str = "10 minutes",
) -> DataFrame:
    """Continuous maintenance of the FINEST downsample tier (the streaming
    half of queries.metrics.x73_downsample_tiers): tumbling event-time
    windows with a watermark, emitting decomposable partials
    (n, decimal sum, min, max) per closed window. Append mode + the
    watermark bound the open-window state; each emitted row is final, so
    the sink append IS the tier table and coarser tiers derive from it
    batch-side via ``rollup_tier`` — raw events are aggregated exactly
    once, in-flight, and never re-scanned."""
    out = (
        sdf.withWatermark(ts_col, watermark)
        .groupBy(F.window(ts_col, window).alias("win"), key_col)
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sum(F.col(value_col).cast("decimal(38,6)")).alias("s"),
            F.min(value_col).alias("min_v"),
            F.max(value_col).alias("max_v"),
        )
    )
    return out.select(
        F.col("win.start").alias("bucket_start"), key_col, "n", "s", "min_v", "max_v"
    )


def rollup_tier(tier: DataFrame, trunc: str, key_col: str = "event_type") -> DataFrame:
    """Derive a coarser tier from a finer one by re-aggregating its
    decomposable partials (count sums, exact decimal sums, min/max fold) —
    identical math to the batch x73 rollup, so streamed-then-rolled-up
    equals batch-from-raw bit-for-bit."""
    return tier.groupBy(
        F.date_trunc(trunc, "bucket_start").alias("bucket_start"), key_col
    ).agg(
        F.sum("n").alias("n"),
        F.sum("s").cast("decimal(38,6)").alias("s"),
        F.min("min_v").alias("min_v"),
        F.max("max_v").alias("max_v"),
    )


def windowed_histogram_quantile(
    sdf: DataFrame,
    ts_col: str = "ts",
    value_col: str = "value",
    window: str = "1 hour",
    watermark: str = "2 hours",
    les: tuple[float, ...] = (10.0, 25.0, 50.0, 100.0, 250.0),
    q_num: int = 9,
    q_den: int = 10,
) -> DataFrame:
    """Streaming ``histogram_quantile`` over tumbling event-time windows —
    the Prometheus recording-rule shape (bucketed counters -> quantile)
    as ONE stateful aggregation: per window, cumulative le-bucket counts
    are plain conditional sums (decomposable, so they fold incrementally
    across microbatches with watermark-bounded state), and the window
    closes through the SAME inversion ladder as batch p34
    (queries.metrics.histogram_quantile_expr) — stream equals batch
    bit-for-bit because counts are exact integers and the interpolation
    is one fixed-order double expression. State per window = |buckets|+1
    longs, regardless of event volume."""
    from ..queries.metrics import histogram_quantile_expr

    aggs = [F.count(F.lit(1)).alias("total")] + [
        F.sum((F.col(value_col) <= le).cast("long")).alias(f"c{i+1}")
        for i, le in enumerate(les)
    ]
    b = (
        sdf.withWatermark(ts_col, watermark)
        .groupBy(F.window(ts_col, window).alias("win"))
        .agg(*aggs)
    )
    return b.select(
        F.col("win.start").alias("bucket_start"),
        "total",
        dround(histogram_quantile_expr(les, q_num, q_den), 6).alias("p"),
    )
