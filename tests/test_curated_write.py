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


def test_blocklist_and_eval_gram_artifact_roundtrip(spark, sf_dir, tmp_path):
    """publish_blocklist / publish_eval_grams write the freeze artifacts;
    the readers hand back exactly the lists the literal-parameter form
    takes — including the _MANIFEST.json route, which must agree with
    the parquet route because both publish the same x279 rows."""
    from kafka_connect_spark.plans.curate import (
        publish_blocklist,
        publish_eval_grams,
        read_blocklist_hashes,
        read_eval_grams,
    )

    docs = load(spark, sf_dir, "documents")
    bl_dir = str(tmp_path / "blocklist")
    n = publish_blocklist(docs, bl_dir)
    want = sorted(
        r["block_hash"]
        for r in QUERIES["x279_boilerplate_blocklist"](spark, sf_dir).collect()
    )
    got = sorted(read_blocklist_hashes(spark, bl_dir))
    assert got == want and n == len(want)
    # manifest route: a curated_write dataset's _MANIFEST.json holds the
    # same published rows
    out, _ = _curate(spark, sf_dir, tmp_path)
    via_manifest = sorted(
        read_blocklist_hashes(spark, str(tmp_path / "curated" / MANIFEST_NAME))
    )
    assert via_manifest == want

    ev_dir = str(tmp_path / "eval_grams")
    n_ev = publish_eval_grams(
        docs.filter(F.col("doc_id") < 10).select("text"), ev_dir
    )
    grams = read_eval_grams(spark, ev_dir)
    assert n_ev == len(grams) == len(set(grams)) > 0
    assert all(len(g.split(" ")) == 5 for g in grams)


def test_curated_stream_spec_driven_from_artifacts(spark, sf_dir, tmp_path):
    """The spec-driven form (examples/task8b_curated_stream.json): the
    pipeline herder drives curated_stream with BOTH inputs as published
    artifacts, and a doc_id-ordered replay emits exactly the batch
    curated_corpus rows — the literal-list parity test's claim, now
    through the artifact readers + spec plumbing."""
    import os

    import pandas as pd

    from kafka_connect_spark.plans.curate import (
        curated_corpus,
        publish_blocklist,
        publish_eval_grams,
    )
    from kafka_connect_spark.plans.pipeline import Pipeline
    from kafka_connect_spark.sources.replay import write_replay_files
    from test_examples import _load_spec

    docs = load(spark, sf_dir, "documents")
    bl_dir = str(tmp_path / "bl")
    ev_dir = str(tmp_path / "ev")
    publish_blocklist(docs, bl_dir)
    publish_eval_grams(docs.filter(F.col("doc_id") < 10).select("text"), ev_dir)
    rd = str(tmp_path / "crawl")
    write_replay_files(docs, rd, 8, "doc_id")
    spec = _load_spec(
        "task8b_curated_stream.json",
        {
            "crawl_dir": rd,
            "curated_dir": str(tmp_path / "curated_stream_out"),
            "ckpt_dir": str(tmp_path / "ckpt"),
            "index_dir": str(tmp_path / "index"),
            "blocklist_dir": bl_dir,
            "eval_grams_dir": ev_dir,
        },
        tmp_path,
    )
    Pipeline(spec).run(spark)
    got = (
        spark.read.parquet(str(tmp_path / "curated_stream_out"))
        .toPandas()
        .sort_values("doc_id", ignore_index=True)
    )
    want = curated_corpus(docs).toPandas().sort_values("doc_id", ignore_index=True)
    pd.testing.assert_frame_equal(
        got[want.columns.tolist()], want, check_dtype=False
    )


def test_curated_stream_restart_picks_up_republished_blocklist(
    spark, sf_dir, tmp_path
):
    """The freeze-artifact loop, end to end: a stream started against
    blocklist v1 (empty) strips nothing; after the crawl re-publishes v2
    (the real x279 blocklist) a RESTART of the same query — same
    checkpoint, same fingerprint index — applies v2 from the very next
    microbatch. Pins that artifact sources resolve at (re)start, not at
    first start / inside the checkpoint."""
    import os
    import shutil

    from kafka_connect_spark.functions.dedupfns import segment_blocks
    from kafka_connect_spark.plans.curate import (
        curated_stream,
        publish_blocklist,
        publish_eval_grams,
    )
    from kafka_connect_spark.sources.replay import (
        file_replay_stream,
        write_replay_files,
    )

    docs = load(spark, sf_dir, "documents")
    ev_dir = str(tmp_path / "ev")
    publish_eval_grams(docs.filter(F.col("doc_id") < 10).select("text"), ev_dir)
    bl_dir = str(tmp_path / "bl")
    # v1: an EMPTY blocklist (publish from a corpus slice with no block
    # reaching the df floor — doc_id < 10 only)
    publish_blocklist(docs.filter(F.col("doc_id") < 10), bl_dir, df_floor=9999)
    assert spark.read.parquet(bl_dir).count() == 0

    even = docs.filter(F.col("doc_id") % 2 == 0)
    odd = docs.filter(F.col("doc_id") % 2 == 1)
    rd = str(tmp_path / "crawl")
    write_replay_files(even, rd, 4, "doc_id")
    out_dir = str(tmp_path / "out")
    ckpt = str(tmp_path / "ckpt")
    idx = str(tmp_path / "index")

    def start():
        sdf = file_replay_stream(spark, rd, spark.read.parquet(rd).schema)
        return curated_stream(
            sdf,
            out_dir=out_dir,
            checkpoint=ckpt,
            blocklist_source=bl_dir,
            eval_grams_source=ev_dir,
            index_dir=idx,
        )

    start().awaitTermination(300)
    phase1 = spark.read.parquet(out_dir).toPandas()
    assert len(phase1) > 0
    assert (phase1["n_blocks_stripped"] == 0).all()  # v1 strips nothing

    # the crawl re-publishes: v2 = the real corpus blocklist
    publish_blocklist(docs, bl_dir)
    v2 = set(
        r["block_hash"] for r in spark.read.parquet(bl_dir).collect()
    )
    assert v2
    # new crawl files land (the odd half), stamped later than phase 1's
    staging = str(tmp_path / "staging")
    write_replay_files(odd, staging, 4, "doc_id")
    import time as _t

    base = _t.time()
    for i, f in enumerate(
        sorted(x for x in os.listdir(staging) if x.endswith(".parquet"))
    ):
        dst = os.path.join(rd, f"b-{f}")
        shutil.copy(os.path.join(staging, f), dst)
        os.utime(dst, (base + i, base + i))

    start().awaitTermination(300)  # RESTART: same checkpoint + index
    all_rows = spark.read.parquet(out_dir).toPandas()
    phase2 = all_rows[all_rows["doc_id"] % 2 == 1]
    assert len(phase2) > 0
    # v2 took effect on the restarted stream's first microbatch: every
    # phase-2 doc's strip count equals its v2-blocklisted block count
    blocks = (
        segment_blocks(odd.select("doc_id", "source", "text"))
        .toPandas()
        .groupby("doc_id")["h"]
        .apply(lambda hs: sum(h in v2 for h in hs))
    )
    for _, row in phase2.iterrows():
        assert row["n_blocks_stripped"] == blocks.get(row["doc_id"], 0)
    assert (phase2["n_blocks_stripped"] > 0).any(), (
        "no phase-2 doc exercised the re-published blocklist"
    )
    # phase-1 rows are immutable history: still unstripped
    phase1_after = all_rows[all_rows["doc_id"] % 2 == 0]
    assert (phase1_after["n_blocks_stripped"] == 0).all()
