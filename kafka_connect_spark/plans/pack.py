"""packed_write — the packing family's OUTPUT stage: concatenate the
corpus in deterministic (lang, doc_id) order, split it into fixed
``ctx``-token training sequences, and EMIT them (parquet + manifest) —
the artifact a dataloader actually memory-maps.

x148 prices the no-packing padding waste and x29 lays out the packed
accounting (per-sequence doc/token counts); this module is the
corresponding action, completing the audit -> action -> ARTIFACT loop
the curation family closed in round 14 (plans/curate.py). The span
math is shared VERBATIM with x29 (same window, same explode bounds,
same least/greatest fill arithmetic) so the written sequences can
never drift from the published accounting; the x288 registry query
(queries/text.py) hash-checks the packed CONTENT itself — text
included — against an independent DuckDB reassembly.

Scale shape (100 TB): each doc's global token offset rides
``skew.distributed_group_prefix_sum`` over the NARROW (lang, doc_id,
n_tok) projection — range partitions spread a dominant language over
num_partitions tasks; a plain partitionBy(lang) window would funnel
that language through ONE sorted task, the r15 de-single-tasking this
module exists to avoid — and the offsets join back to the text rows
by doc_id, so the token arrays move exactly once, hash-distributed by
doc_id, never collapsed per language; a sequence() explode fans each
doc to the >= 1 training sequences it spans (~1 row on average); the
token SLICE for each (doc, sequence) span is cut map-side BEFORE the
reassembly shuffle (only the cut pieces move, never the full token
array); one hash agg on (lang, seq_id) reassembles each sequence with
an in-row array_sort(collect_list(struct)). No driver loop — the
packing layout for a trillion tokens.

Streaming twin: ``packed_stream`` folds the same packing rule per
language with applyInPandasWithState — state is ONE bounded row per
language (the open partial sequence, <= ctx tokens by construction);
completed sequences emit as they close and replay equal to the batch
rows under doc_id-ordered replay (tests/test_packed_write.py).
"""

from __future__ import annotations

import json
import os
from collections.abc import Iterable, Iterator

import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from .curate import MANIFEST_NAME


def _packed_spans(
    d: DataFrame,
    ctx: int,
    part_cols: tuple[str, ...],
    order_cols: tuple[str, ...],
    with_text: bool,
) -> DataFrame:
    """Shared span math (x29's arithmetic, generalized over the
    concat partition/order): ``d`` carries the partition and order
    columns plus ``toks``/``n_tok``; output is one row per packed
    sequence keyed by (part_cols..., seq_id). When ``with_text`` the
    token slice is cut MAP-SIDE before the shuffle (only the cut
    pieces move, never the token array) and reassembled in-row.

    The running token offset rides ``distributed_group_prefix_sum``
    (skew.py), NOT a plain partitionBy window: a partitionBy(lang)
    window funnels each language through ONE sorted task — the thing
    that dies first when one language dominates a 100 TB corpus. The
    prefix sum runs over the NARROW (keys, n_tok) projection (range
    partitions spread a dominant group; the pinned cache holds only
    the narrow columns), and when text is needed the offsets JOIN back
    by doc_id — the token arrays move exactly once, hash-distributed
    by doc_id rather than collapsed per language."""
    from ..functions.skew import distributed_group_prefix_sum

    order_exprs = [F.col(c) for c in order_cols]
    if with_text:
        narrow = d.select(*part_cols, "doc_id", "n_tok")
        csum = distributed_group_prefix_sum(
            narrow, list(part_cols), order_exprs, "n_tok"
        )
        off = d.join(
            csum.select(
                "doc_id",
                (F.col("__csum") - F.col("n_tok")).alias("start_off"),
            ),
            "doc_id",
        )
    else:
        off = distributed_group_prefix_sum(
            d, list(part_cols), order_exprs, "n_tok"
        ).withColumn("start_off", F.col("__csum") - F.col("n_tok"))
    spans = off.filter(F.col("n_tok") > 0).select(
        *part_cols,
        *(("toks",) if with_text else ()),  # counts-only: arrays pruned
        "n_tok",
        "start_off",
        F.explode(
            F.sequence(
                F.expr(f"start_off div {ctx}"),
                F.expr(f"(start_off + n_tok - 1) div {ctx}"),
            )
        ).alias("seq_id"),
    )
    lo = F.greatest(F.col("start_off"), F.col("seq_id") * ctx)
    hi = F.least(F.col("start_off") + F.col("n_tok"), (F.col("seq_id") + 1) * ctx)
    filled = hi - lo
    cols = [
        *part_cols,
        "seq_id",
        "start_off",
        filled.alias("filled"),
    ]
    aggs = [
        F.count(F.lit(1)).cast("long").alias("n_docs"),
        F.sum("filled").cast("long").alias("n_tokens"),
    ]
    if with_text:
        piece = F.array_join(
            F.slice(
                F.col("toks"),
                (lo - F.col("start_off") + 1).cast("int"),
                filled.cast("int"),
            ),
            " ",
        )
        cols.append(piece.alias("piece"))
        aggs.append(
            F.array_join(
                F.expr(
                    "transform(array_sort(collect_list(struct(start_off,"
                    " piece))), s -> s.piece)"
                ),
                " ",
            ).alias("text")
        )
    return spans.select(*cols).groupBy(*part_cols, "seq_id").agg(*aggs)


def packed_sequences(docs: DataFrame, ctx: int = 512) -> DataFrame:
    """The packed training corpus as a LAZY DataFrame: documents
    concatenate in (lang, doc_id) order and split into fixed
    ``ctx``-token sequences (GPT-style concat-and-chunk; a document
    straddling a boundary contributes its token span to both sides).
    Output: (lang, seq_id, n_docs, n_tokens, text) — one row per
    training sequence, text reassembled exactly (split-on-space /
    join-with-space identity), every sequence ctx tokens except each
    language's last. Span arithmetic shared verbatim with
    x29_sequence_packing (queries/text.py:526)."""
    d = docs.select(
        "lang",
        "doc_id",
        F.split("text", " ").alias("toks"),
        F.size(F.split("text", " ")).cast("long").alias("n_tok"),
    )
    return _packed_spans(
        d, ctx, ("lang",), ("doc_id",), with_text=True
    ).select("lang", "seq_id", "n_docs", "n_tokens", "text")


def curriculum_packed(
    docs: DataFrame, ctx: int = 512, phases: int = 4
) -> DataFrame:
    """Curriculum-ordered packing accounting as a LAZY DataFrame: the
    corpus is cut into ``phases`` equal-count phases by global
    (n_tokens, doc_id) ntile (x155's schedule, via the scale-safe
    distributed_ntile — no SinglePartition sort), then each
    (lang, phase) cell packs INDEPENDENTLY in short->long
    (n_tokens, doc_id) order — a phase boundary never mixes into one
    training sequence, which is the property a curriculum schedule
    needs from its dataloader. Output: (lang, phase, seq_id, n_docs,
    n_tokens); x292 hash-checks it against the plain-window oracle."""
    from ..functions.skew import distributed_ntile

    t = docs.select(
        "lang",
        "doc_id",
        F.size(F.split("text", " ")).cast("long").alias("n_tok"),
    )
    p = distributed_ntile(
        t, phases, [F.col("n_tok"), F.col("doc_id")], tile_name="phase"
    ).withColumn("phase", F.col("phase").cast("long"))
    return _packed_spans(
        p, ctx, ("lang", "phase"), ("n_tok", "doc_id"), with_text=False
    ).select("lang", "phase", "seq_id", "n_docs", "n_tokens")


def curriculum_packed_texts(
    docs: DataFrame, ctx: int = 512, phases: int = 4
) -> DataFrame:
    """:func:`curriculum_packed` WITH the sequence text reassembled
    (packed_write's ``order="curriculum"`` emit path). Same plan plus
    the map-side slice; accounting columns pinned to x292's
    hash-checked rows in tests/test_packed_write.py."""
    from ..functions.skew import distributed_ntile

    t = docs.select(
        "lang",
        "doc_id",
        F.split("text", " ").alias("toks"),
        F.size(F.split("text", " ")).cast("long").alias("n_tok"),
    )
    p = distributed_ntile(
        t, phases, [F.col("n_tok"), F.col("doc_id")], tile_name="phase"
    ).withColumn("phase", F.col("phase").cast("long"))
    return _packed_spans(
        p, ctx, ("lang", "phase"), ("n_tok", "doc_id"), with_text=True
    ).select("lang", "phase", "seq_id", "n_docs", "n_tokens", "text")


def packed_write(
    spark: SparkSession,
    sf_dir: str,
    out_dir: str,
    ctx: int = 512,
    docs: DataFrame | None = None,
    source_dir: str | None = None,
) -> dict:
    """Execute the packing pipeline end-to-end over the sf_dir documents
    table (or ``docs`` — e.g. the curated corpus read back from
    plans/curate.py's output, the curate -> pack chain). See
    :func:`packed_write_df` for the write itself; this entry point only
    resolves the input and provenance."""
    from ..catalog import load_parallel

    if docs is None:
        docs = load_parallel(spark, sf_dir, "documents")
    return packed_write_df(
        docs,
        out_dir,
        ctx=ctx,
        source_dir=source_dir if source_dir is not None else sf_dir,
    )


def packed_write_df(
    docs: DataFrame,
    out_dir: str,
    ctx: int = 512,
    source_dir: str | None = None,
    order: str = "sequential",
    phases: int = 4,
) -> dict:
    """Write the packed sequences of an in-hand documents DataFrame as
    parquet under ``out_dir`` and a dataset-card manifest as
    ``out_dir/_MANIFEST.json`` alongside (ctx, per-language sequence
    counts, fill accounting, provenance). Returns the manifest dict.

    Side-effecting pipeline op like curated_write_df (also the
    ``packed_corpus`` pipeline sink) — correctness is pinned by the
    x288 registry query (packed content hash-checked vs DuckDB) plus
    the e2e row-for-row parity with x29 in tests/test_packed_write.py.
    The manifest is written ONCE, here (the r14 ADVICE's double-write
    lesson from curate.py). ``order="curriculum"`` packs per
    (lang, phase) in short->long order instead (x292's layout — phase
    boundaries never mix into one sequence; phase rides in the output
    schema and the manifest)."""
    spark = docs.sparkSession
    if order == "curriculum":
        seqs = curriculum_packed_texts(docs, ctx=ctx, phases=phases)
    elif order == "sequential":
        seqs = packed_sequences(docs, ctx=ctx)
    else:
        raise ValueError(f"unknown pack order: {order!r}")
    seqs.write.mode("overwrite").parquet(out_dir)
    written = spark.read.parquet(out_dir)
    per_lang = [
        row.asDict()
        for row in written.groupBy("lang")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_sequences"),
            F.sum("n_tokens").cast("long").alias("n_tokens"),
            F.sum((F.col("n_tokens") == ctx).cast("long"))
            .cast("long")
            .alias("n_full"),
        )
        .orderBy("lang")
        .collect()  # bounded: |langs| rows
    ]
    n_seqs = sum(r["n_sequences"] for r in per_lang)
    n_toks = sum(r["n_tokens"] for r in per_lang)
    slots = n_seqs * ctx
    manifest = {
        "op": "packed_write",
        "ctx": ctx,
        "order": order,
        "source_dir": source_dir,
        "n_sequences": n_seqs,
        "n_full_sequences": sum(r["n_full"] for r in per_lang),
        "total_tokens": n_toks,
        "pad_tokens": slots - n_toks,
        "fill_ppm": (n_toks * 1_000_000) // slots if slots else 0,
        "per_lang": per_lang,
        "layout": (
            "(lang, phase) short->long concat; fixed ctx-token chunks,"
            " phase boundaries never mix (x292)"
            if order == "curriculum"
            else "(lang, doc_id) concat; fixed ctx-token chunks (x29/x288)"
        ),
        "identity": "split-on-space/join-with-space; x29 span math",
    }
    with open(os.path.join(out_dir, MANIFEST_NAME), "w") as f:
        json.dump(manifest, f, indent=2, sort_keys=True)
    return manifest


# ---------------------------------------------------------------------------
# boundary-respecting variant (no-straddle greedy)


def _fold_pack_nostraddle(
    state: tuple[int, int],
    docs: Iterable[tuple[int, int]],
    ctx: int,
) -> tuple[list[tuple[int, int]], tuple[int, int]]:
    """Pure no-straddle packing fold over (doc_id, n_tok) pairs in
    doc_id order: a document never crosses a sequence boundary — if it
    does not fit in the open sequence, the sequence closes (its
    remainder is padding) and the doc starts the next one; a document
    LONGER than ctx is chunk-split alone (it cannot avoid crossing) and
    its last chunk closes. Returns [(seq_id, tokens)] spans — one per
    (doc, sequence) — plus the (seq, fill) carry state. The policy a
    dataloader uses when cross-document attention is NOT masked, traded
    against x29's zero-padding concat-and-chunk by x290."""
    seq, fill = state
    out: list[tuple[int, int]] = []
    for _doc_id, t in docs:
        if t > ctx:
            start = seq + (1 if fill > 0 else 0)
            nch = (t + ctx - 1) // ctx
            for i in range(nch):
                out.append((start + i, min(ctx, t - i * ctx)))
            seq, fill = start + nch, 0
        elif fill + t <= ctx:
            out.append((seq, t))
            fill += t
        else:
            seq += 1
            fill = t
            out.append((seq, t))
    return out, (seq, fill)


def packed_nostraddle(docs: DataFrame, ctx: int = 512) -> DataFrame:
    """Boundary-respecting packing accounting as a LAZY DataFrame:
    (lang, seq_id, n_docs, n_tokens) under the no-straddle greedy rule
    (:func:`_fold_pack_nostraddle`), documents taken in (lang, doc_id)
    order. Every sequence has n_tokens <= ctx with the shortfall being
    PADDING — the accounting x290 trades against x29's zero-pad
    straddling layout.

    Plan shape: greedy packing is order-sequential (not prefix-sum
    decomposable — a window cannot express it), so each language folds
    in one applyInPandas group over (doc_id, n_tok) PAIRS ONLY — 16
    bytes per doc, never text; the fold is the bounded-memory driver of
    the decision, the token slices themselves are NOT materialized
    here. At extreme per-language cardinality the same fold shards by
    (lang, shard) with carry-state stitching — exactly what the
    streaming twin's per-key carry state does microbatch-to-microbatch."""
    meta = docs.select(
        "lang",
        "doc_id",
        F.size(F.split("text", " ")).cast("long").alias("n_tok"),
    )

    def pack(pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.sort_values("doc_id")
        lang = pdf["lang"].iloc[0]
        spans, _ = _fold_pack_nostraddle(
            (0, 0), zip(pdf["doc_id"], pdf["n_tok"]), ctx
        )
        agg: dict[int, list[int]] = {}
        for seq_id, toks in spans:
            cur = agg.setdefault(seq_id, [0, 0])
            cur[0] += 1
            cur[1] += toks
        return pd.DataFrame(
            [(lang, s, c[0], c[1]) for s, c in sorted(agg.items())],
            columns=["lang", "seq_id", "n_docs", "n_tokens"],
        )

    return meta.groupBy("lang").applyInPandas(
        pack, "lang string, seq_id long, n_docs long, n_tokens long"
    )


# ---------------------------------------------------------------------------
# streaming twin


#: output schema of the streaming packer (completed sequences only)
_PACK_OUT_SCHEMA = (
    "lang string, seq_id long, n_docs long, n_tokens long, text string"
)
#: state: the open partial sequence per language — bounded by ctx tokens
_PACK_STATE_SCHEMA = (
    "next_seq long, fill long, n_docs long, partial string"
)


def _fold_pack(
    lang: str,
    state: tuple[int, int, int, str],
    docs: Iterable[tuple[int, str]],
    ctx: int,
) -> tuple[list[tuple], tuple[int, int, int, str]]:
    """Pure packing fold (unit-testable without Spark): feed docs in
    doc_id order into the open partial sequence; emit each sequence the
    moment it reaches ctx tokens. Chunking-invariant: folding the same
    docs in any microbatch split lands on identical emissions + state,
    because the state (next seq id, fill, doc count, partial text) is
    the full suffix the batch window math depends on."""
    next_seq, fill, n_docs, partial = state
    out: list[tuple] = []
    for _doc_id, text in docs:
        toks = text.split(" ")
        pos = 0
        while pos < len(toks):
            # each loop iteration is one (doc, sequence) span — the doc
            # counts once in every sequence it touches (x29's rule)
            n_docs += 1
            take = min(ctx - fill, len(toks) - pos)
            piece = " ".join(toks[pos : pos + take])
            partial = piece if fill == 0 else partial + " " + piece
            fill += take
            pos += take
            if fill == ctx:
                out.append((lang, next_seq, n_docs, fill, partial))
                next_seq += 1
                fill = 0
                n_docs = 0
                partial = ""
    return out, (next_seq, fill, n_docs, partial)


def packed_stream(
    sdf: DataFrame, ctx: int = 512, timeout: str = "NoTimeout"
) -> DataFrame:
    """Streaming form of :func:`packed_sequences` over a stream of
    (lang, doc_id, text) rows arriving in doc_id order per language
    (the ordered-replay contract curated_stream also carries): one
    keyed state row per language holds the open partial sequence
    (<= ctx tokens — bounded state); completed sequences emit the
    microbatch they close. Under ordered replay the emissions equal
    exactly the batch rows with n_tokens == ctx (every batch sequence
    except each language's open last — x29's own invariant)."""
    from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

    def update(
        key: tuple, pdfs: Iterable[pd.DataFrame], state: GroupState
    ) -> Iterator[pd.DataFrame]:
        (lang,) = key
        st = state.get if state.exists else (0, 0, 0, "")
        rows = []
        for pdf in pdfs:
            pdf = pdf.sort_values("doc_id")
            rows.extend(zip(pdf["doc_id"], pdf["text"]))
        rows.sort(key=lambda r: r[0])
        out, st = _fold_pack(lang, tuple(st), rows, ctx)
        state.update(st)
        if out:
            yield pd.DataFrame(
                out, columns=["lang", "seq_id", "n_docs", "n_tokens", "text"]
            )

    return sdf.groupBy("lang").applyInPandasWithState(
        update,
        outputStructType=_PACK_OUT_SCHEMA,
        stateStructType=_PACK_STATE_SCHEMA,
        outputMode="append",
        timeoutConf=getattr(GroupStateTimeout, timeout),
    )


def packed_stream_writer(
    sdf: DataFrame, out_dir: str, checkpoint: str, ctx: int = 512
):
    """:func:`packed_stream` wired to an append-mode parquet sink — the
    ``packed_stream`` pipeline sink's body (a crawl lands, training
    sequences appear). The per-language carry state (open partial
    sequence) lives in the CHECKPOINTED state store, so a stopped and
    restarted stream continues sequence numbering and the open partial
    exactly where it left off — restart continuity is pinned e2e in
    tests/test_packed_write.py. Returns the unstarted writeStream
    builder (the pipeline herder calls .start())."""
    return (
        packed_stream(sdf, ctx=ctx)
        .writeStream.format("parquet")
        .option("path", out_dir)
        .option("checkpointLocation", checkpoint)
        .outputMode("append")
    )
