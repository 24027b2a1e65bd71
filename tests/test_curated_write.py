"""curated_write (plans/curate.py) — the curation family's OUTPUT stage.

Pins the side-effecting write to its hash-checked twins: the emitted
parquet must reconcile row-for-row with the x282 accounting query, the
manifest's verdict table with x278, and the strip pass must really
remove exactly the published blocklist blocks while leaving untouched
documents byte-identical."""

from __future__ import annotations

import json

from pyspark.sql import functions as F

from kafka_connect_spark.catalog import load
from kafka_connect_spark.plans.curate import (
    MANIFEST_NAME,
    curated_write,
    read_manifest,
)
from kafka_connect_spark.queries import QUERIES


def _curate(spark, sf_dir, tmp_path):
    out = str(tmp_path / "curated")
    manifest = curated_write(spark, sf_dir, out)
    return out, manifest


def test_written_corpus_reconciles_with_x282(spark, sf_dir, tmp_path):
    out, _ = _curate(spark, sf_dir, tmp_path)
    acct = QUERIES["x282_curated_accounting"](spark, sf_dir).toPandas()
    got = (
        spark.read.parquet(out)
        .groupBy("source")
        .agg(
            F.count(F.lit(1)).cast("long").alias("docs_emitted"),
            F.sum("n_tok").cast("long").alias("tokens_out"),
            F.sum("n_blocks_stripped").cast("long").alias("blocks_stripped"),
            F.sum("n_tok_stripped").cast("long").alias("tokens_stripped"),
        )
        .toPandas()
        .set_index("source")
        .sort_index()
    )
    want = acct[acct.docs_emitted > 0].set_index("source").sort_index()
    assert list(got.index) == list(want.index)
    for col in ("docs_emitted", "tokens_out", "blocks_stripped", "tokens_stripped"):
        assert list(got[col]) == list(want[col]), col


def test_manifest_pins_x278_and_blocklist(spark, sf_dir, tmp_path):
    out, manifest = _curate(spark, sf_dir, tmp_path)
    assert read_manifest(out) == manifest
    x278 = [
        r.asDict() for r in QUERIES["x278_freeze_manifest"](spark, sf_dir).collect()
    ]
    assert manifest["verdicts"] == x278
    bl = [
        r.asDict()
        for r in QUERIES["x279_boilerplate_blocklist"](spark, sf_dir).collect()
    ]
    assert manifest["blocklist"] == bl
    tot = manifest["totals"]
    assert tot["docs_kept"] == sum(
        r["n_docs"] for r in x278 if r["verdict"] == "keep"
    )
    assert tot["docs_emitted"] + tot["docs_fully_stripped"] == tot["docs_kept"]
    # the underscore-prefixed manifest is INVISIBLE to parquet readers
    assert MANIFEST_NAME.startswith("_")
    n_direct = spark.read.parquet(out).count()
    assert n_direct == tot["docs_emitted"]


def test_strip_is_exact_and_untouched_docs_are_byte_identical(
    spark, sf_dir, tmp_path
):
    out, manifest = _curate(spark, sf_dir, tmp_path)
    cur = spark.read.parquet(out)
    orig = load(spark, sf_dir, "documents").select(
        "doc_id", F.col("text").alias("orig_text")
    )
    joined = cur.join(orig, "doc_id")
    # documents with nothing stripped re-assemble to the EXACT original
    untouched = joined.filter(F.col("n_blocks_stripped") == 0)
    assert untouched.filter(F.col("text") != F.col("orig_text")).count() == 0
    # stripped docs: token count dropped by exactly n_tok_stripped
    stripped = joined.filter(F.col("n_blocks_stripped") > 0)
    bad = stripped.filter(
        F.size(F.split("orig_text", " "))
        - F.size(F.split("text", " "))
        != F.col("n_tok_stripped")
    )
    assert bad.count() == 0
    # independent re-derivation: for every stripped doc, rebuild the
    # expected curated text in plain Python (split on space, drop the
    # 20-token blocks whose md5 is blocklisted, rejoin) and compare
    import hashlib

    bl_hashes = {r["block_hash"] for r in manifest["blocklist"]}
    for row in stripped.select("doc_id", "text", "orig_text").collect():
        toks = row["orig_text"].split(" ")
        kept_blocks = []
        for b in range(0, (len(toks) + 19) // 20):
            blk = toks[b * 20 : b * 20 + 20]
            h = hashlib.md5(" ".join(blk).encode()).hexdigest()
            if h not in bl_hashes:
                kept_blocks.append(" ".join(blk))
        assert " ".join(kept_blocks) == row["text"], row["doc_id"]


def test_only_keep_verdicts_are_emitted(spark, sf_dir, tmp_path):
    out, _ = _curate(spark, sf_dir, tmp_path)
    cur = spark.read.parquet(out).select("doc_id")
    from kafka_connect_spark.queries.quality import freeze_verdicts

    v = freeze_verdicts(load(spark, sf_dir, "documents"))
    non_keep = v.filter(F.col("verdict") != "keep").select("doc_id")
    assert cur.join(non_keep, "doc_id").count() == 0
    assert cur.filter(F.col("doc_id") < 10).count() == 0  # eval seeds out


def test_task8_curated_corpus_spec(spark, sf_dir, tmp_path):
    """The examples/ spec drives the same write through the pipeline
    herder (source: parquet documents -> sink: curated_corpus)."""
    import os

    from kafka_connect_spark.plans.pipeline import Pipeline
    from test_examples import _load_spec

    spec = _load_spec(
        "task8_curated_corpus.json",
        {
            "documents_path": os.path.join(sf_dir, "documents.parquet"),
            "curated_dir": str(tmp_path / "curated_pipe"),
        },
        tmp_path,
    )
    Pipeline(spec).run(spark)
    manifest = read_manifest(str(tmp_path / "curated_pipe"))
    direct = curated_write(spark, sf_dir, str(tmp_path / "curated_direct"))
    # identical decision + identical accounting, whichever entry point
    for key in ("verdicts", "blocklist", "totals", "gates", "parameters"):
        assert manifest[key] == direct[key]
    a = spark.read.parquet(str(tmp_path / "curated_pipe"))
    b = spark.read.parquet(str(tmp_path / "curated_direct"))
    assert a.exceptAll(b).count() == 0 and b.exceptAll(a).count() == 0


def test_rerun_is_idempotent(spark, sf_dir, tmp_path):
    out, m1 = _curate(spark, sf_dir, tmp_path)
    first = spark.read.parquet(out).toPandas().sort_values("doc_id")
    m2 = curated_write(spark, sf_dir, out)  # overwrite in place
    second = spark.read.parquet(out).toPandas().sort_values("doc_id")
    assert m1 == m2
    assert first.reset_index(drop=True).equals(second.reset_index(drop=True))


def test_curated_stream_equals_batch_in_doc_id_order(spark, sf_dir, tmp_path):
    """curated_stream replayed in doc_id order with the batch run's own
    published inputs (x279 blocklist, eval-seed 5-grams) and an empty
    index must emit EXACTLY the batch curated_corpus rows: the quality
    and contamination gates are per-row (order-free), the exact-dup
    keeper is first-arrival which equals the batch min-doc_id keeper
    under ordered replay, and the strip/reassembly builders are shared
    verbatim."""
    from kafka_connect_spark.plans.curate import curated_corpus, curated_stream
    from kafka_connect_spark.sources.replay import (
        file_replay_stream,
        write_replay_files,
    )

    docs = load(spark, sf_dir, "documents")
    bl = [
        r["block_hash"]
        for r in QUERIES["x279_boilerplate_blocklist"](spark, sf_dir).collect()
    ]
    toks = docs.select("doc_id", F.split("text", " ").alias("toks"))
    ev = [
        r["gram"]
        for r in toks.filter(F.col("doc_id") < 10)
        .select(
            F.explode(
                F.expr(
                    "case when size(toks) >= 5 then"
                    " array_distinct(transform(sequence(1, size(toks) - 4),"
                    " i -> array_join(slice(toks, i, 5), ' ')))"
                    " else array() end"
                )
            ).alias("gram")
        )
        .distinct()
        .collect()
    ]
    rd = str(tmp_path / "curated-replay")
    write_replay_files(docs, rd, 8, "doc_id")
    sdf = file_replay_stream(spark, rd, spark.read.parquet(rd).schema)
    q = curated_stream(
        sdf,
        out_dir=str(tmp_path / "curated-stream-out"),
        checkpoint=str(tmp_path / "curated-stream-ckpt"),
        blocklist_hashes=bl,
        eval_grams=ev,
        index_dir=str(tmp_path / "curated-stream-index"),
    )
    q.awaitTermination(300)
    got = (
        spark.read.parquet(str(tmp_path / "curated-stream-out"))
        .toPandas()
        .sort_values("doc_id", ignore_index=True)
    )
    want = (
        curated_corpus(docs)
        .toPandas()
        .sort_values("doc_id", ignore_index=True)
    )
    import pandas as pd

    pd.testing.assert_frame_equal(
        got[want.columns.tolist()], want, check_dtype=False
    )
    # the index absorbed every kept-doc hash exactly once per distinct text
    idx = spark.read.parquet(str(tmp_path / "curated-stream-index"))
    assert idx.count() == idx.distinct().count()
