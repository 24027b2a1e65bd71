"""Behavioral evidence for the round-7 curation/eval operators beyond the
oracle hash checks: planted inputs with known answers (the planted-extract
pattern from test_dedup)."""

from __future__ import annotations

import datetime

from pyspark.sql import functions as F

from kafka_connect_spark.queries import QUERIES


def test_x142_quota_sums_to_budget_and_is_proportional(spark, sf_dir):
    out = QUERIES["x142_stratified_eval_sample"](spark, sf_dir).toPandas()
    quotas = out.drop_duplicates("lang").set_index("lang")["lang_quota"]
    assert quotas.sum() == 100
    # Hamilton apportionment: every quota within 1 of the exact share
    from kafka_connect_spark.catalog import load

    counts = (
        load(spark, sf_dir, "documents")
        .groupBy("lang")
        .count()
        .toPandas()
        .set_index("lang")["count"]
    )
    total = counts.sum()
    for lang, q in quotas.items():
        exact = 100 * counts[lang] / total
        assert abs(q - exact) < 1, f"{lang}: quota {q} vs exact {exact:.2f}"
    # per-lang selections are the quota (strata are big enough here) and
    # ranks are contiguous from 1
    for lang, grp in out.groupby("lang"):
        assert len(grp) == quotas[lang]
        assert sorted(grp["rank"]) == list(range(1, len(grp) + 1))


def test_x144_metronome_bot_vs_bursty_human(spark):
    """A metronome script (exact 10s period, one event type) must score
    near-zero on BOTH signals; a bursty multi-action user scores high on
    both. The thresholds consumers would use must separate the two."""
    t0 = datetime.datetime(2026, 1, 1)
    rows = []
    # user 1: bot — exact 10s cadence, only "click"
    for i in range(20):
        rows.append((i, t0 + datetime.timedelta(seconds=10 * i), 1, "click", 1.0, ""))
    # user 2: human — bursts (1s..20m gaps), mixed types
    gaps = [1, 2, 1200, 3, 1, 900, 5, 2, 600, 1, 4, 300, 2, 1, 60, 3, 2, 30, 1]
    t, types = t0, ["click", "view", "buy", "scroll"]
    for i, g in enumerate(gaps):
        t = t + datetime.timedelta(seconds=g)
        rows.append((100 + i, t, 2, types[i % 4], 1.0, ""))
    df = spark.createDataFrame(
        rows, "event_id long, ts timestamp, user_id long, event_type string, value double, props string"
    )
    import kafka_connect_spark.queries.quality as q

    # drive the registry body directly on the planted frame
    import kafka_connect_spark.catalog as cat

    orig = cat.load
    try:
        cat.load = lambda s, d, name: df if name == "events" else orig(s, d, name)
        q.load = cat.load
        out = {r["user_id"]: r for r in QUERIES["x144_bot_likeness_panel"](spark, "unused").collect()}
    finally:
        cat.load = orig
        q.load = orig
    bot, human = out[1], out[2]
    assert bot["gap_cv_ppm"] == 0  # exact metronome
    assert bot["type_entropy_micronats"] == 0  # single action type
    assert human["gap_cv_ppm"] > 1_000_000  # CV > 1: bursty
    assert human["type_entropy_micronats"] > 1_000_000  # mixed types


def test_x143_benford_on_lognormal_like_data(spark):
    """Multiplicative (log-uniform) data must hug the Benford curve; the
    audit's dev_ppm should be small for it. Uses a deterministic
    log-spaced grid — no rand()."""
    import math

    vals = [(i, math.exp(math.log(10) * ((i * 997 % 4001) / 4001.0 * 4)))
            for i in range(4001)]
    df = spark.createDataFrame(
        [(i, datetime.datetime(2026, 1, 1), 1, "x", v, "") for i, v in vals],
        "event_id long, ts timestamp, user_id long, event_type string, value double, props string",
    )
    import kafka_connect_spark.catalog as cat
    import kafka_connect_spark.queries.quality as q

    orig = cat.load
    try:
        cat.load = lambda s, d, name: df if name == "events" else orig(s, d, name)
        q.load = cat.load
        out = QUERIES["x143_benford_audit"](spark, "unused").toPandas()
    finally:
        cat.load = orig
        q.load = orig
    assert list(out["digit"]) == list(range(1, 10))
    assert out["n_obs"].sum() == 4001
    # log-uniform over 4 decades ~ Benford: every digit within 2% absolute
    assert (out["dev_ppm"].abs() < 20_000).all(), out.to_dict("records")


def test_x146_ess_bounds(spark, sf_dir):
    out = QUERIES["x146_dsir_ess"](spark, sf_dir).collect()[0]
    # 1 <= ESS <= n by Cauchy-Schwarz; ratio in (0, 1]
    assert 1 <= out["ess"] <= out["n_docs"]
    assert 0 < out["ess_ratio_ppm"] <= 1_000_000


def test_x138_streaming_scoring_equals_batch(spark, sf_dir, tmp_path):
    """The DSIR claim that matters at 100 TB: a FROZEN bucket model scores
    future corpus increments incrementally. Replay documents as a file
    stream (3 microbatches), score each batch with the model built once
    from the full fixture, and require row-for-row equality with the
    batch x138 output."""
    import pandas as pd

    from kafka_connect_spark.catalog import load
    from kafka_connect_spark.queries.text import dsir_bucket_scores, dsir_score_docs
    from kafka_connect_spark.sources.replay import file_replay_stream, write_replay_files

    d = load(spark, sf_dir, "documents")
    model = dsir_bucket_scores(d).cache()
    want = (
        dsir_score_docs(d, model)
        .orderBy("doc_id")
        .toPandas()
    )

    rdir = str(tmp_path / "docs-replay")
    write_replay_files(d, rdir, n_files=3, order_col="doc_id")
    sdf = file_replay_stream(spark, rdir, d.schema)
    out: list[pd.DataFrame] = []
    q = (
        sdf.writeStream.foreachBatch(
            lambda df, i: out.append(dsir_score_docs(df, model).toPandas())
        )
        .option("checkpointLocation", str(tmp_path / "ckpt-dsir"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(180)
    got = (
        pd.concat(out, ignore_index=True)
        .sort_values("doc_id", ignore_index=True)
    )
    assert got.equals(want)


def test_p34_streaming_windowed_histogram_quantile_equals_batch(spark, sf_dir, tmp_path):
    """The streaming histogram_quantile twin closes each tumbling window
    to the SAME value as running the batch expression over that window's
    rows — counts are decomposable and the inversion is shared code."""
    import pandas as pd

    from kafka_connect_spark.catalog import load
    from kafka_connect_spark.queries.metrics import histogram_quantile_expr
    from kafka_connect_spark.queries.registry import dround
    from kafka_connect_spark.sources.replay import file_replay_stream, write_replay_files
    from kafka_connect_spark.streaming.windows import windowed_histogram_quantile

    ev = load(spark, sf_dir, "events").filter(F.col("user_id") < 20)
    rdir = str(tmp_path / "ev-replay")
    write_replay_files(ev, rdir, n_files=4, order_col="ts")
    sdf = file_replay_stream(spark, rdir, ev.schema)
    out: list[pd.DataFrame] = []
    q = (
        windowed_histogram_quantile(sdf, window="6 hours", watermark="12 hours")
        .writeStream.foreachBatch(lambda df, i: out.append(df.toPandas()))
        .option("checkpointLocation", str(tmp_path / "ckpt-hq"))
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(180)
    got = (
        pd.concat(out, ignore_index=True)
        .sort_values("bucket_start", ignore_index=True)
    )
    aggs = [F.count(F.lit(1)).alias("total")] + [
        F.sum((F.col("value") <= le).cast("long")).alias(f"c{i+1}")
        for i, le in enumerate([10.0, 25.0, 50.0, 100.0, 250.0])
    ]
    want = (
        ev.groupBy(F.window("ts", "6 hours").alias("win"))
        .agg(*aggs)
        .select(
            F.col("win.start").alias("bucket_start"),
            "total",
            dround(histogram_quantile_expr(), 6).alias("p"),
        )
        .orderBy("bucket_start")
        .toPandas()
    )
    # append mode only emits watermark-CLOSED windows: the final windows
    # are withheld at stream end; everything emitted must match batch.
    merged = got.merge(want, on="bucket_start", suffixes=("_s", "_b"))
    assert len(merged) == len(got) > 0
    assert len(got) >= len(want) - 4  # only the tail can be withheld
    assert (merged["total_s"] == merged["total_b"]).all()
    assert (merged["p_s"] == merged["p_b"]).all()


def test_x156_char_entropy_separates_spam(spark):
    """A constant-character doc must land at exactly 0 micronats; natural
    mixed text sits in the 2-4 nat band — the threshold (2.5 nats) the
    query's n_low_entropy column uses must separate the two."""
    rows = [
        (1, "a" * 400, "en", "spam", 400),
        (2, "the quick brown fox jumps over the lazy dog while "
            "seventy wizards quietly mix bright hexagonal potions", "en",
         "web", 101),
    ]
    df = spark.createDataFrame(
        rows, "doc_id long, text string, lang string, source string, n_chars long"
    )
    import kafka_connect_spark.catalog as cat
    import kafka_connect_spark.queries.text as t

    orig = cat.load
    try:
        cat.load = lambda s, d, name: df if name == "documents" else orig(s, d, name)
        t.load = cat.load
        t.load_parallel = lambda s, d, name, **kw: df
        out = {
            r["source"]: r
            for r in QUERIES["x156_char_entropy_profile"](spark, "unused").collect()
        }
    finally:
        cat.load = orig
        t.load = orig
        from kafka_connect_spark.catalog import load_parallel as lp

        t.load_parallel = lp
    assert out["spam"]["avg_entropy_micronats"] == 0
    assert out["spam"]["n_low_entropy"] == 1
    assert out["web"]["avg_entropy_micronats"] > 2_500_000
    assert out["web"]["n_low_entropy"] == 0


def test_x272_encoded_clock_assumption_holds(spark, sf_dir):
    """The segment family's encoded keep-first clock (doc_id * 1e6 +
    b_idx, segment_blocks) assumes b_idx < 1e6 — a 20M-token document at
    block=20. This IS the assertion the x272 docstring points at: the
    fixture corpus must sit far under the bound, and the encoding must
    be collision-free across documents (clock count == block count)."""
    from kafka_connect_spark.catalog import load
    from kafka_connect_spark.functions.dedupfns import segment_blocks

    blocks = segment_blocks(
        load(spark, sf_dir, "documents").select("doc_id", "source", "text")
    )
    row = blocks.agg(
        F.max("b_idx").alias("max_b"),
        F.count(F.lit(1)).alias("n_blocks"),
        F.countDistinct("clock").alias("n_clocks"),
    ).collect()[0]
    assert row["max_b"] < 1_000_000, "encoded-clock bound violated"
    assert row["n_clocks"] == row["n_blocks"], "clock collision across docs"


def test_x272_clock_collision_shape_detected():
    """Documents the failure mode the bound guards: if b_idx could reach
    1e6, doc 1 block 0 and doc 0 block 1e6 would share clock 1_000_000 —
    the arithmetic fact the fixture assertion above keeps at bay."""
    assert 1 * 1_000_000 + 0 == 0 * 1_000_000 + 1_000_000
