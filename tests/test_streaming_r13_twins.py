"""Round-13 streaming twins pinned to their batch registry rows: the
x270 filter funnel (state = ONE mergeable count/sum row) and the x269
decontamination census (state = |sources| rows), both complete-mode
aggregations whose derivations are shared with the batch queries."""

from __future__ import annotations

import pandas as pd
from pyspark.sql import functions as F

from kafka_connect_spark.catalog import load
from kafka_connect_spark.queries import QUERIES
from kafka_connect_spark.sources.replay import (
    file_replay_stream,
    write_replay_files,
)

N_FILES = 128

def test_streaming_funnel_equals_x270(spark, sf_dir, tmp_path):
    """Round-13 twin: x270's filter funnel maintained live. The
    sufficient statistic is ONE mergeable count/sum row
    (functions/textfns.py funnel_state) — the complete-mode state is
    exactly 1 row for every microbatch — and funnel_table fanned from
    the final state must equal the batch x270 rows exactly."""
    from kafka_connect_spark.functions.textfns import (
        funnel_flags,
        funnel_signals,
        funnel_state,
        funnel_table,
    )

    spark.conf.set("spark.sql.streaming.numRecentProgressUpdates", "256")
    docs = load(spark, sf_dir, "documents").select("doc_id", "text", "n_chars")
    d = str(tmp_path / "funnel-replay")
    write_replay_files(docs, d, N_FILES, "doc_id")
    sdf = file_replay_stream(spark, d, spark.read.parquet(d).schema)
    out: list[pd.DataFrame] = []
    q = (
        funnel_state(funnel_flags(funnel_signals(sdf)))
        .writeStream.foreachBatch(lambda df, bid: out.append(df.toPandas()))
        .option("checkpointLocation", str(tmp_path / "funnel-ckpt"))
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
    assert len(trace) >= 100, f"only {len(trace)} microbatches recorded"
    assert max(rows for _, rows in trace) == 1  # the one agg row IS the state

    final = spark.createDataFrame(out[-1])
    got = funnel_table(final).toPandas().sort_values("stage", ignore_index=True)
    want = (
        QUERIES["x270_filter_funnel"](spark, sf_dir)
        .toPandas()
        .sort_values("stage", ignore_index=True)
    )
    pd.testing.assert_frame_equal(got, want, check_dtype=False)


def test_streaming_decontamination_equals_x269(spark, sf_dir, tmp_path):
    """The decontamination monitor replayed over the candidate corpus
    (doc_id >= 10) in 128 microbatches must land on exactly x269's
    per-source rows, with the state bounded by |sources| every
    microbatch."""
    from kafka_connect_spark.streaming.drift import (
        decontamination_counts,
        decontamination_table,
    )

    spark.conf.set("spark.sql.streaming.numRecentProgressUpdates", "256")
    d = load(spark, sf_dir, "documents")
    gram5 = F.expr(
        "case when size(split(text, ' ')) >= 5 then"
        " array_distinct(transform(sequence(1, size(split(text, ' ')) - 4),"
        " i -> array_join(slice(split(text, ' '), i, 5), ' ')))"
        " else array() end"
    )
    eval_grams = [
        r["gram"]
        for r in d.filter(F.col("doc_id") < 10)
        .select(F.explode(gram5).alias("gram"))
        .distinct()
        .collect()
    ]
    assert eval_grams

    corpus = d.filter(F.col("doc_id") >= 10).select(
        "doc_id", "source", "text"
    )
    n_sources = corpus.select("source").distinct().count()
    rd = str(tmp_path / "decon-replay")
    write_replay_files(corpus, rd, N_FILES, "doc_id")
    sdf = file_replay_stream(spark, rd, spark.read.parquet(rd).schema)
    out: list[pd.DataFrame] = []
    q = (
        decontamination_counts(sdf, eval_grams)
        .writeStream.foreachBatch(lambda df, bid: out.append(df.toPandas()))
        .option("checkpointLocation", str(tmp_path / "decon-ckpt"))
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
    assert len(trace) >= 100, f"only {len(trace)} microbatches recorded"
    assert max(rows for _, rows in trace) <= n_sources

    final = spark.createDataFrame(out[-1])
    got = (
        decontamination_table(final)
        .toPandas()
        .sort_values("source", ignore_index=True)
    )
    want = (
        QUERIES["x269_eval_ngram_decontamination"](spark, sf_dir)
        .toPandas()
        .sort_values("source", ignore_index=True)
    )
    pd.testing.assert_frame_equal(got, want, check_dtype=False)


def test_streaming_block_keeper_equals_x272(spark, sf_dir, tmp_path):
    """Round-13 third-wave twin: segment-level keep-first dedup
    maintained as ONE complete-mode min/min_by agg keyed on the block
    hash. The final state's per-source kept mass must equal the batch
    x272 prune plan exactly ((n_blocks - dup_blocks), (tokens_total -
    tokens_dropped)) — replay order can't flip a keeper because min
    over the encoded clock is order-free. State rows = distinct blocks
    (the x37 exact-dedup bound, inherent to the semantics)."""
    from kafka_connect_spark.functions.dedupfns import segment_blocks
    from kafka_connect_spark.streaming.drift import (
        block_keeper_state,
        segment_keeper_table,
    )

    spark.conf.set("spark.sql.streaming.numRecentProgressUpdates", "256")
    docs = load(spark, sf_dir, "documents").select("doc_id", "source", "text")
    n_distinct_blocks = (
        segment_blocks(docs).select("h").distinct().count()
    )
    rd = str(tmp_path / "blocks-replay")
    write_replay_files(docs, rd, N_FILES, "doc_id")
    sdf = file_replay_stream(spark, rd, spark.read.parquet(rd).schema)
    out: list[pd.DataFrame] = []
    q = (
        block_keeper_state(sdf)
        .writeStream.foreachBatch(lambda df, bid: out.append(df.toPandas()))
        .option("checkpointLocation", str(tmp_path / "blocks-ckpt"))
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
    assert len(trace) >= 100, f"only {len(trace)} microbatches recorded"
    assert max(rows for _, rows in trace) <= n_distinct_blocks

    final = spark.createDataFrame(out[-1])
    assert final.count() == n_distinct_blocks
    got = (
        segment_keeper_table(final)
        .toPandas()
        .sort_values("source", ignore_index=True)
    )
    batch = QUERIES["x272_segment_dedup_prune"](spark, sf_dir).toPandas()
    batch["kept_blocks"] = batch["n_blocks"] - batch["dup_blocks"]
    batch["kept_tokens"] = batch["tokens_total"] - batch["tokens_dropped"]
    want = batch[["source", "kept_blocks", "kept_tokens"]].sort_values(
        "source", ignore_index=True
    )
    pd.testing.assert_frame_equal(got, want, check_dtype=False)


def test_streaming_block_sources_equals_x276(spark, sf_dir, tmp_path):
    """Round-13 fifth-wave twin: the segment-sharing provenance matrix
    maintained as ONE complete-mode collect_set agg keyed on the block
    hash. Set union is order-free, so the 128-microbatch replay must
    land on exactly x276's pair matrix; state rows = distinct blocks
    (the exact-dedup bound), each row's set bounded by |sources|."""
    from kafka_connect_spark.functions.dedupfns import segment_blocks
    from kafka_connect_spark.streaming.drift import (
        block_source_state,
        share_matrix_table,
    )

    spark.conf.set("spark.sql.streaming.numRecentProgressUpdates", "256")
    docs = load(spark, sf_dir, "documents").select("doc_id", "source", "text")
    n_distinct_blocks = segment_blocks(docs).select("h").distinct().count()
    rd = str(tmp_path / "blocksrc-replay")
    write_replay_files(docs, rd, N_FILES, "doc_id")
    sdf = file_replay_stream(spark, rd, spark.read.parquet(rd).schema)
    out: list[pd.DataFrame] = []
    q = (
        block_source_state(sdf)
        .writeStream.foreachBatch(lambda df, bid: out.append(df.toPandas()))
        .option("checkpointLocation", str(tmp_path / "blocksrc-ckpt"))
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
    assert len(trace) >= 100, f"only {len(trace)} microbatches recorded"
    assert max(rows for _, rows in trace) <= n_distinct_blocks

    final = spark.createDataFrame(out[-1])
    assert final.count() == n_distinct_blocks
    got = (
        share_matrix_table(final)
        .toPandas()
        .sort_values(["source_a", "source_b"], ignore_index=True)
    )
    want = (
        QUERIES["x276_segment_share_matrix"](spark, sf_dir)
        .toPandas()
        .sort_values(["source_a", "source_b"], ignore_index=True)
    )
    pd.testing.assert_frame_equal(got, want, check_dtype=False)
