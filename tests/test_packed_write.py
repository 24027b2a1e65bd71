"""packed_write / packed_stream — the packing family's OUTPUT stage
(plans/pack.py), pinned to the published accounting the same way
curated_write is pinned to x282:

- the written parquet reconciles ROW-FOR-ROW with x29's hash-checked
  per-(lang, seq) accounting;
- the packed text obeys the split-join token identity exactly;
- every sequence is exactly ctx tokens except each language's last;
- the curate -> pack chain composes (packing the curated corpus);
- the streaming twin's emissions replay equal to the batch rows under
  doc_id-ordered replay, with ONE bounded state row per language.
"""

from __future__ import annotations

import json
import os

import pandas as pd
from pyspark.sql import functions as F

from kafka_connect_spark.catalog import load
from kafka_connect_spark.plans.pack import (
    _fold_pack,
    packed_sequences,
    packed_stream,
    packed_write,
)
from kafka_connect_spark.queries import QUERIES

CTX = 512


def test_packed_write_matches_x29_accounting(spark, sf_dir, tmp_path):
    """The emitted parquet's per-(lang, seq_id) doc/token counts must
    equal the hash-checked x29 accounting row-for-row, and the packed
    text must contain exactly n_tokens whitespace tokens (the split-join
    identity)."""
    out = str(tmp_path / "packed")
    manifest = packed_write(spark, sf_dir, out, ctx=CTX)
    written = spark.read.parquet(out)

    got = (
        written.select("lang", "seq_id", "n_docs", "n_tokens")
        .toPandas()
        .sort_values(["lang", "seq_id"], ignore_index=True)
    )
    want = (
        QUERIES["x29_sequence_packing"](spark, sf_dir)
        .toPandas()
        .sort_values(["lang", "seq_id"], ignore_index=True)
    )
    pd.testing.assert_frame_equal(got, want, check_dtype=False)

    # token identity on the emitted text itself
    bad = written.filter(
        F.size(F.split("text", " ")).cast("long") != F.col("n_tokens")
    ).count()
    assert bad == 0

    # every sequence full except each language's last
    w_last = written.groupBy("lang").agg(F.max("seq_id").alias("last_seq"))
    not_full = (
        written.join(w_last, "lang")
        .filter(
            (F.col("n_tokens") != CTX) & (F.col("seq_id") != F.col("last_seq"))
        )
        .count()
    )
    assert not_full == 0

    # manifest reconciles with the written data and is written once
    assert manifest["n_sequences"] == written.count()
    assert manifest["total_tokens"] == (
        written.agg(F.sum("n_tokens")).collect()[0][0]
    )
    assert manifest["source_dir"] == sf_dir
    with open(os.path.join(out, "_MANIFEST.json")) as f:
        on_disk = json.load(f)
    assert on_disk == manifest


def test_packed_write_over_curated_corpus(spark, sf_dir, tmp_path):
    """The curate -> pack chain: packing the curated corpus (the r14
    OUTPUT stage's parquet read back) must conserve the curated token
    mass exactly — total packed tokens == total curated tokens, since
    packing moves every token into exactly one sequence."""
    from kafka_connect_spark.plans.curate import curated_write

    cur_dir = str(tmp_path / "curated")
    curated_write(spark, sf_dir, cur_dir)
    curated = spark.read.parquet(cur_dir)

    out = str(tmp_path / "packed-curated")
    manifest = packed_write(
        spark, sf_dir, out, ctx=CTX, docs=curated, source_dir=cur_dir
    )
    want_tokens = curated.agg(
        F.sum(F.size(F.split("text", " "))).cast("long")
    ).collect()[0][0]
    assert manifest["total_tokens"] == want_tokens
    assert manifest["source_dir"] == cur_dir


def test_task9_packed_corpus_spec(spark, sf_dir, tmp_path):
    """The examples/ spec drives the curate -> pack chain through the
    pipeline herder (source: the curated corpus parquet -> sink:
    packed_corpus) and must land on the same artifact as calling
    packed_write directly on the read-back curated corpus."""
    from kafka_connect_spark.plans.curate import curated_write
    from kafka_connect_spark.plans.pipeline import Pipeline
    from test_examples import _load_spec

    cur_dir = str(tmp_path / "curated")
    curated_write(spark, sf_dir, cur_dir)
    spec = _load_spec(
        "task9_packed_corpus.json",
        {
            "curated_dir": cur_dir,
            "packed_dir": str(tmp_path / "packed_pipe"),
        },
        tmp_path,
    )
    Pipeline(spec).run(spark)
    with open(os.path.join(str(tmp_path / "packed_pipe"), "_MANIFEST.json")) as f:
        manifest = json.load(f)
    direct = packed_write(
        spark,
        sf_dir,
        str(tmp_path / "packed_direct"),
        docs=spark.read.parquet(cur_dir),
        source_dir=cur_dir,
    )
    assert manifest == direct
    a = spark.read.parquet(str(tmp_path / "packed_pipe"))
    b = spark.read.parquet(str(tmp_path / "packed_direct"))
    assert a.exceptAll(b).count() == 0 and b.exceptAll(a).count() == 0


def test_curriculum_packed_write_matches_x292(spark, sf_dir, tmp_path):
    """packed_write_df(order='curriculum') emits the x292 layout: the
    written parquet's per-(lang, phase, seq) accounting equals the
    hash-checked x292 rows, the text obeys the token identity, and the
    manifest records the order."""
    from kafka_connect_spark.plans.pack import packed_write_df

    out = str(tmp_path / "packed-curriculum")
    manifest = packed_write_df(
        load(spark, sf_dir, "documents"),
        out,
        ctx=CTX,
        source_dir=sf_dir,
        order="curriculum",
    )
    assert manifest["order"] == "curriculum"
    written = spark.read.parquet(out)
    got = (
        written.select("lang", "phase", "seq_id", "n_docs", "n_tokens")
        .toPandas()
        .sort_values(["lang", "phase", "seq_id"], ignore_index=True)
    )
    want = (
        QUERIES["x292_curriculum_packed_accounting"](spark, sf_dir)
        .toPandas()
        .sort_values(["lang", "phase", "seq_id"], ignore_index=True)
    )
    pd.testing.assert_frame_equal(got, want, check_dtype=False)
    bad = written.filter(
        F.size(F.split("text", " ")).cast("long") != F.col("n_tokens")
    ).count()
    assert bad == 0


def test_fold_pack_chunking_invariant():
    """The pure packing fold is invariant to how the doc stream is cut
    into microbatches: any split of the same ordered docs produces
    identical emissions and final state."""
    docs = [
        (1, "a b c"),
        (2, "d e f g h"),
        (3, "i"),
        (4, " ".join(f"t{i}" for i in range(17))),  # spans multiple seqs
        (5, "x y"),
    ]
    ctx = 8
    full_out, full_state = _fold_pack("en", (0, 0, 0, ""), docs, ctx)
    for cut in range(len(docs) + 1):
        o1, s1 = _fold_pack("en", (0, 0, 0, ""), docs[:cut], ctx)
        o2, s2 = _fold_pack("en", s1, docs[cut:], ctx)
        assert o1 + o2 == full_out
        assert s2 == full_state
    # every emitted sequence is exactly ctx tokens
    for _lang, _seq, _nd, n_tok, text in full_out:
        assert n_tok == ctx
        assert len(text.split(" ")) == ctx


def test_fold_pack_equals_batch(spark, sf_dir):
    """Driving the fold over the whole corpus in one go lands on exactly
    the batch packed_sequences rows (the closed sequences) plus one open
    partial per language (the batch's last row)."""
    d = (
        load(spark, sf_dir, "documents")
        .select("lang", "doc_id", "text")
        .orderBy("lang", "doc_id")
        .toPandas()
    )
    want = (
        packed_sequences(load(spark, sf_dir, "documents"), ctx=CTX)
        .toPandas()
        .sort_values(["lang", "seq_id"], ignore_index=True)
    )
    got_rows = []
    partials = {}
    for lang, grp in d.groupby("lang"):
        out, (next_seq, fill, n_docs, partial) = _fold_pack(
            lang, (0, 0, 0, ""), list(zip(grp["doc_id"], grp["text"])), CTX
        )
        got_rows.extend(out)
        if fill > 0:
            partials[lang] = (next_seq, n_docs, fill, partial)
    closed = pd.DataFrame(
        got_rows, columns=["lang", "seq_id", "n_docs", "n_tokens", "text"]
    )
    want_closed = want[want["n_tokens"] == CTX].reset_index(drop=True)
    pd.testing.assert_frame_equal(
        closed.sort_values(["lang", "seq_id"], ignore_index=True),
        want_closed,
        check_dtype=False,
    )
    want_open = want[want["n_tokens"] != CTX]
    assert len(want_open) == len(partials)
    for _, row in want_open.iterrows():
        seq, n_docs, fill, partial = partials[row["lang"]]
        assert (seq, n_docs, fill, partial) == (
            row["seq_id"],
            row["n_docs"],
            row["n_tokens"],
            row["text"],
        )


def test_fold_nostraddle_chunking_invariant_and_policy():
    """The no-straddle fold (x290's rule) is carry-state
    chunking-invariant — any microbatch split of the same ordered doc
    stream produces identical spans and final state (the property a
    streaming or sharded form stitches on) — and honors the policy:
    no document crosses a boundary unless longer than ctx, every
    sequence holds <= ctx tokens, oversize docs are chunked alone."""
    from kafka_connect_spark.plans.pack import _fold_pack_nostraddle

    ctx = 8
    docs = [(1, 3), (2, 5), (3, 1), (4, 17), (5, 2), (6, 8), (7, 7), (8, 2)]
    full_out, full_state = _fold_pack_nostraddle((0, 0), docs, ctx)
    for cut in range(len(docs) + 1):
        o1, s1 = _fold_pack_nostraddle((0, 0), docs[:cut], ctx)
        o2, s2 = _fold_pack_nostraddle(s1, docs[cut:], ctx)
        assert o1 + o2 == full_out
        assert s2 == full_state
    # per-sequence fill never exceeds ctx
    fills: dict[int, int] = {}
    for seq, toks in full_out:
        fills[seq] = fills.get(seq, 0) + toks
    assert all(v <= ctx for v in fills.values())
    # doc 4 (17 tokens) chunks alone into ceil(17/8)=3 dedicated seqs
    spans4 = full_out[3:6]
    assert [t for _, t in spans4] == [8, 8, 1]
    seqs4 = {s for s, _ in spans4}
    assert all(
        s not in seqs4 for s, _ in full_out[:3] + full_out[6:]
    ), full_out
    # non-oversize docs appear exactly once (never straddle)
    assert len(full_out) == len(docs) + 2  # only doc 4 fans out (3 spans)


def test_packed_nostraddle_invariants(spark, sf_dir):
    """x290 over the fixture: every sequence holds <= ctx tokens, token
    mass is conserved vs the corpus, and sequence ids are dense per
    language starting at 0."""
    from kafka_connect_spark.plans.pack import packed_nostraddle

    docs = load(spark, sf_dir, "documents")
    got = packed_nostraddle(docs, ctx=CTX).toPandas()
    assert (got["n_tokens"] <= CTX).all()
    want_tokens = docs.agg(
        F.sum(F.size(F.split("text", " "))).cast("long")
    ).collect()[0][0]
    assert got["n_tokens"].sum() == want_tokens
    for _lang, grp in got.groupby("lang"):
        seqs = sorted(grp["seq_id"])
        assert seqs == list(range(len(seqs)))


def test_task9b_packed_stream_spec_and_restart_continuity(
    spark, sf_dir, tmp_path
):
    """The spec-driven streaming packer (examples/task9b): (1) driving
    the first 60% of the corpus emits exactly the batch-full sequences
    of that prefix; (2) a RESTART on the same checkpoint with the rest
    of the corpus arriving continues sequence numbering and the open
    partial from the state store — the union of both runs' emissions
    equals the batch full sequences over the WHOLE corpus."""
    from kafka_connect_spark.plans.pack import packed_sequences
    from kafka_connect_spark.plans.pipeline import Pipeline
    from kafka_connect_spark.sources.replay import write_replay_files
    from test_examples import _load_spec

    docs = load(spark, sf_dir, "documents").select("lang", "doc_id", "text")
    cut = docs.selectExpr(
        "percentile_approx(doc_id, 0.6) as c"
    ).collect()[0]["c"]
    stream_dir = str(tmp_path / "docs-stream")
    write_replay_files(docs.filter(F.col("doc_id") <= cut), stream_dir, 8, "doc_id")
    spec = _load_spec(
        "task9b_packed_stream.json",
        {
            "docs_stream_dir": stream_dir,
            "packed_dir": str(tmp_path / "packed-stream-out"),
            "checkpoint_dir": str(tmp_path / "packed-ckpt"),
        },
        tmp_path,
    )
    Pipeline(spec).run(spark)
    got1 = spark.read.parquet(str(tmp_path / "packed-stream-out")).toPandas()
    want1 = (
        packed_sequences(docs.filter(F.col("doc_id") <= cut), ctx=512)
        .filter(F.col("n_tokens") == 512)
        .toPandas()
    )
    pd.testing.assert_frame_equal(
        got1.sort_values(["lang", "seq_id"], ignore_index=True),
        want1.sort_values(["lang", "seq_id"], ignore_index=True),
        check_dtype=False,
    )

    # part 2 lands; the RESTARTED query continues from checkpointed state
    part2 = str(tmp_path / "part2")
    write_replay_files(docs.filter(F.col("doc_id") > cut), part2, 4, "doc_id")
    import shutil
    import time

    t = time.time()
    for i, f in enumerate(
        sorted(x for x in os.listdir(part2) if x.endswith(".parquet"))
    ):
        dst = os.path.join(stream_dir, f"z2-{f}")
        shutil.copy(os.path.join(part2, f), dst)
        os.utime(dst, (t + 10.0 * i, t + 10.0 * i))
    Pipeline(spec).run(spark)
    got = spark.read.parquet(str(tmp_path / "packed-stream-out")).toPandas()
    want = (
        packed_sequences(docs, ctx=512)
        .filter(F.col("n_tokens") == 512)
        .toPandas()
    )
    pd.testing.assert_frame_equal(
        got.sort_values(["lang", "seq_id"], ignore_index=True),
        want.sort_values(["lang", "seq_id"], ignore_index=True),
        check_dtype=False,
    )


def test_packed_stream_replays_to_batch(spark, sf_dir, tmp_path):
    """The streaming packer over a doc_id-ordered replay emits exactly
    the batch rows with n_tokens == ctx (every sequence except each
    language's open last), with state bounded by |languages|."""
    from kafka_connect_spark.sources.replay import (
        file_replay_stream,
        write_replay_files,
    )

    spark.conf.set("spark.sql.streaming.numRecentProgressUpdates", "256")
    docs = load(spark, sf_dir, "documents").select("lang", "doc_id", "text")
    n_langs = docs.select("lang").distinct().count()
    d = str(tmp_path / "pack-replay")
    write_replay_files(docs, d, 64, "doc_id")
    sdf = file_replay_stream(spark, d, spark.read.parquet(d).schema)
    out: list[pd.DataFrame] = []
    q = (
        packed_stream(sdf, ctx=CTX)
        .writeStream.foreachBatch(lambda df, bid: out.append(df.toPandas()))
        .option("checkpointLocation", str(tmp_path / "pack-ckpt"))
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(300)
    state_rows = [
        p["stateOperators"][0]["numRowsTotal"]
        for p in q.recentProgress
        if p.get("stateOperators")
    ]
    assert state_rows and max(state_rows) <= n_langs

    got = (
        pd.concat([p for p in out if len(p)], ignore_index=True)
        .sort_values(["lang", "seq_id"], ignore_index=True)
        if any(len(p) for p in out)
        else pd.DataFrame()
    )
    want = (
        packed_sequences(docs, ctx=CTX)
        .filter(F.col("n_tokens") == CTX)
        .toPandas()
        .sort_values(["lang", "seq_id"], ignore_index=True)
    )
    assert len(want) > 0, "fixture too small: no full sequence to check"
    pd.testing.assert_frame_equal(got, want, check_dtype=False)
