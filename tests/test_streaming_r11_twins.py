"""Round-11 streaming twins pinned to their batch registry rows: the
x187 ROC-AUC and x194 gains/lift chart, both derived from ONE mergeable
(score value, label) count aggregation (streaming/drift.py
score_label_counts) whose complete-mode state is bounded by the score
value domain — the two online-eval curves the r9/r10 verdicts asked for."""

from __future__ import annotations

import pandas as pd
from pyspark.sql import functions as F

from kafka_connect_spark.catalog import load
from kafka_connect_spark.queries import QUERIES
from kafka_connect_spark.sources.replay import (
    file_replay_stream,
    write_replay_files,
)
from kafka_connect_spark.streaming.drift import (
    auc_from_counts,
    gain_chart_from_counts,
    operating_point_from_counts,
    score_label_counts,
)

N_FILES = 128


def _score_labels(df):
    return df.select(
        (F.col("lang") == "en").cast("long").alias("y"),
        F.least(
            F.expr(
                "cast(size(filter(split(text, ' '),"
                " t -> array_contains(array('a','the','of','and','to','in'), t)))"
                " as bigint) * 5000000 div size(split(text, ' '))"
            ),
            F.lit(1_000_000).cast("bigint"),
        ).alias("p"),
    )


def _replay_counts(spark, sf_dir, tmp_path, name):
    """Stream the fixture docs through score_label_counts in complete mode;
    return the FINAL state table (as a batch DataFrame) plus the state-row
    trace across all microbatches."""
    spark.conf.set("spark.sql.streaming.numRecentProgressUpdates", "256")
    docs = load(spark, sf_dir, "documents").select("doc_id", "lang", "text")
    d = str(tmp_path / f"{name}-replay")
    write_replay_files(docs, d, N_FILES, "doc_id")
    sdf = file_replay_stream(spark, d, spark.read.parquet(d).schema)
    out: list[pd.DataFrame] = []
    q = (
        score_label_counts(_score_labels(sdf))
        .writeStream.foreachBatch(lambda df, bid: out.append(df.toPandas()))
        .option("checkpointLocation", str(tmp_path / f"{name}-ckpt"))
        .outputMode("complete")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(300)
    trace = [
        (p["batchId"], p["stateOperators"][0]["numRowsTotal"])
        for p in q.recentProgress
        if p.get("stateOperators")
    ]
    final = spark.createDataFrame(out[-1])
    return final, trace


def test_streaming_auc_and_gain_equal_batch(spark, sf_dir, tmp_path):
    """The final complete-mode count table must reproduce x187's AUC row
    and x194's chart EXACTLY — the closed forms are pure functions of the
    (p, y) counts, so the streamed state carries everything the two
    curves need. Also the state-bound leg: the aggregation state is the
    count table itself, <= 2 x |distinct scores| rows for all 128
    microbatches, never stream-length."""
    counts, trace = _replay_counts(spark, sf_dir, tmp_path, "slc")

    got_auc = auc_from_counts(counts).toPandas()
    want_auc = QUERIES["x187_quality_auc"](spark, sf_dir).toPandas()
    pd.testing.assert_frame_equal(got_auc, want_auc, check_dtype=False)

    got_gain = (
        gain_chart_from_counts(counts)
        .toPandas()
        .sort_values("decile", ignore_index=True)
    )
    want_gain = (
        QUERIES["x194_gain_chart"](spark, sf_dir)
        .toPandas()
        .sort_values("decile", ignore_index=True)
    )
    pd.testing.assert_frame_equal(got_gain, want_gain, check_dtype=False)

    got_op = (
        operating_point_from_counts(counts)
        .toPandas()
        .sort_values("criterion", ignore_index=True)
    )
    want_op = (
        QUERIES["x263_operating_point"](spark, sf_dir)
        .toPandas()
        .sort_values("criterion", ignore_index=True)
    )
    pd.testing.assert_frame_equal(got_op, want_op, check_dtype=False)

    # state bound: <= 2 x distinct score values observed in the corpus
    # (the (p, y) key space), for EVERY microbatch
    n_scores = _score_labels(
        load(spark, sf_dir, "documents")
    ).select("p").distinct().count()
    assert len(trace) >= 100, f"only {len(trace)} microbatches recorded"
    assert max(rows for _, rows in trace) <= 2 * n_scores


def test_gain_chart_closed_form_on_batch(spark, sf_dir):
    """Engine-independent leg: the chart derivation applied to a BATCH
    count table (no streaming machinery) equals x194 — isolates the
    closed form from the replay harness."""
    counts = score_label_counts(
        _score_labels(load(spark, sf_dir, "documents"))
    )
    got = (
        gain_chart_from_counts(counts)
        .toPandas()
        .sort_values("decile", ignore_index=True)
    )
    want = (
        QUERIES["x194_gain_chart"](spark, sf_dir)
        .toPandas()
        .sort_values("decile", ignore_index=True)
    )
    pd.testing.assert_frame_equal(got, want, check_dtype=False)


def test_streaming_ipf_raking_equals_x249(spark, sf_dir, tmp_path):
    """Complete-mode (source, lang) counts replayed over 128 microbatches
    + the shared ipf_rake closed form == the batch x249 rows exactly;
    state is the cell table (<= |sources| x |langs|), asserted per
    microbatch."""
    from kafka_connect_spark.queries.quality import ipf_rake
    from kafka_connect_spark.streaming.drift import source_lang_counts

    spark.conf.set("spark.sql.streaming.numRecentProgressUpdates", "256")
    docs = load(spark, sf_dir, "documents").select("doc_id", "source", "lang")
    d = str(tmp_path / "ipf-replay")
    write_replay_files(docs, d, N_FILES, "doc_id")
    sdf = file_replay_stream(spark, d, spark.read.parquet(d).schema)
    out: list[pd.DataFrame] = []
    q = (
        source_lang_counts(sdf)
        .writeStream.foreachBatch(lambda df, bid: out.append(df.toPandas()))
        .option("checkpointLocation", str(tmp_path / "ipf-ckpt"))
        .outputMode("complete")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(300)
    trace = [
        (p["batchId"], p["stateOperators"][0]["numRowsTotal"])
        for p in q.recentProgress
        if p.get("stateOperators")
    ]
    n_cells = (
        load(spark, sf_dir, "documents")
        .select("source", "lang")
        .distinct()
        .count()
    )
    assert len(trace) >= 100
    assert max(rows for _, rows in trace) <= n_cells

    got = (
        ipf_rake(spark.createDataFrame(out[-1]))
        .toPandas()
        .sort_values(["source", "lang"], ignore_index=True)
    )
    want = (
        QUERIES["x249_ipf_raking"](spark, sf_dir)
        .toPandas()
        .sort_values(["source", "lang"], ignore_index=True)
    )
    pd.testing.assert_frame_equal(got, want, check_dtype=False)

