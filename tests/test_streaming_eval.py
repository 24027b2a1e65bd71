"""Streaming online-eval twin (functions/evalfns.py) pinned to the batch
x190 registry row: the confusion/McNemar counters are commutative sums,
so replaying the corpus in microbatches through a complete-mode
aggregation must land on EXACTLY the batch answer, with state = 5
counters regardless of corpus size."""

from __future__ import annotations

import pandas as pd

from kafka_connect_spark.catalog import load
from kafka_connect_spark.functions.evalfns import confusion_mcnemar, lid_labels
from kafka_connect_spark.queries import QUERIES
from kafka_connect_spark.sources.replay import (
    file_replay_stream,
    write_replay_files,
)


def test_streaming_mcnemar_equals_x190(spark, sf_dir, tmp_path):
    batch = (
        QUERIES["x190_mcnemar_lid"](spark, sf_dir)
        .toPandas()
        .reset_index(drop=True)
    )
    docs = load(spark, sf_dir, "documents").select("doc_id", "lang", "text")
    d = str(tmp_path / "eval-replay")
    write_replay_files(docs, d, 4, "doc_id")
    sdf = file_replay_stream(spark, d, spark.read.parquet(d).schema)
    out: list[pd.DataFrame] = []
    q = (
        confusion_mcnemar(lid_labels(sdf))
        .writeStream.foreachBatch(lambda df, bid: out.append(df.toPandas()))
        .option("checkpointLocation", str(tmp_path / "ckpt-eval"))
        .outputMode("complete")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    final = out[-1].reset_index(drop=True)
    pd.testing.assert_frame_equal(final, batch, check_dtype=False)
    # every intermediate emission is a valid partial answer: counts
    # monotone, n never exceeds the corpus
    ns = [int(df["n"].iloc[0]) for df in out if len(df)]
    assert ns == sorted(ns) and ns[-1] == int(batch["n"].iloc[0])
