"""Incremental datasheet maintenance: folding the corpus in chunks must
reproduce the one-shot x93 report exactly (functions/datasheetfns.py)."""

from __future__ import annotations

from pyspark.sql import functions as F

from kafka_connect_spark.catalog import load
from kafka_connect_spark.functions.datasheetfns import (
    datasheet_from_state,
    datasheet_state,
    fold_batch,
)
from kafka_connect_spark.queries.text import x93_corpus_datasheet


def test_chunk_fold_equals_one_shot(spark, sf_dir):
    d = load(spark, sf_dir, "documents")
    chunks = [d.filter(F.col("doc_id") % 4 == k) for k in range(4)]
    state = datasheet_state(chunks[0])
    for c in chunks[1:]:
        state = fold_batch(state, c)
    folded = datasheet_from_state(state).toPandas()
    oneshot = x93_corpus_datasheet(spark, sf_dir).toPandas()
    assert folded.reset_index(drop=True).equals(oneshot.reset_index(drop=True))


def test_fold_counts_duplicates_across_chunks(spark):
    """A duplicate arriving in a LATER chunk must count as a dup (the
    hash index carries cross-chunk memory), and the index stays distinct."""
    rows1 = [(1, "alpha beta gamma", "web", 16)]
    rows2 = [(2, "alpha beta gamma", "web", 16), (3, "delta epsilon", "web", 13)]
    schema = "doc_id long, text string, source string, n_chars long"
    c1 = spark.createDataFrame(rows1, schema)
    c2 = spark.createDataFrame(rows2, schema)
    state = fold_batch(datasheet_state(c1), c2)
    report = datasheet_from_state(state).collect()[0]
    assert report["n_docs"] == 3 and report["n_unique"] == 2
    assert report["n_exact_dups"] == 1
    # index distinct: folding the same batch again adds docs but no hashes
    state2 = fold_batch(state, c2)
    r2 = datasheet_from_state(state2).collect()[0]
    assert r2["n_docs"] == 5 and r2["n_unique"] == 2
