"""curated_write — the curation family's OUTPUT stage: apply x278's
freeze verdicts and x279's boilerplate blocklist and EMIT the cleaned
corpus (parquet + manifest), the artifact a training run actually
consumes.

The r13 family decides (x278 freeze manifest), prices (x272 segment
prune plan), and names the boilerplate (x279 blocklist) — this module is
the corresponding action. Everything here is shared verbatim with the
reporting queries so the emitted corpus can never drift from the
published numbers:

- verdicts: ``queries.quality.freeze_verdicts`` (x278's body — gates
  are FUNNEL_STAGES + x12b keeper + x269 contamination, precedence
  quality -> exact-dup -> contamination -> keep);
- blocklist: ``queries.dedup._boilerplate_blocklist`` (x279's body,
  df-floor/top-k parameterized);
- segmentation: ``functions.dedupfns.segment_blocks`` (x272's splitter,
  ``with_text=True`` so surviving blocks re-assemble the document
  exactly — split-on-space then join-with-space is the identity).

Scale shape (100 TB): one verdict pass (x278's plan — linear), one
blocklist build (x279's plan — linear + distributed top-k), then the
strip pass: segment the KEPT docs once, broadcast anti-join the <= top_k
block hashes, and re-assemble per doc with an in-row
array_sort(collect_list(struct)) — one shuffle on doc_id, no window, no
pair join. The manifest collects only bounded aggregates (|sources| x
|verdicts| rows + the blocklist itself)."""

from __future__ import annotations

import json
import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

#: manifest file name — underscore-prefixed so parquet readers (Spark,
#: DuckDB glob on *.parquet) skip it while it ships INSIDE the dataset
#: directory, the way _SUCCESS / _metadata sidecars do.
MANIFEST_NAME = "_MANIFEST.json"


def curated_corpus(
    docs: DataFrame,
    df_floor: int = 3,
    top_k: int = 20,
    block: int = 20,
) -> DataFrame:
    """The curated corpus as a LAZY DataFrame (the plan curated_write
    executes), over an in-hand documents DataFrame (doc_id, source,
    lang, text, n_chars): candidate docs with verdict='keep',
    blocklisted segment blocks stripped, text re-assembled from the
    surviving blocks in order. Docs whose every block is blocklisted
    drop out (nothing left to emit). Output schema: (doc_id, source,
    lang, text, n_chars, n_tok, n_blocks_stripped, n_tok_stripped) —
    n_chars/n_tok are recomputed over the EMITTED text."""
    from ..functions.dedupfns import segment_blocks
    from ..queries.dedup import boilerplate_blocklist_from_docs
    from ..queries.quality import freeze_verdicts

    d = docs
    keep = (
        freeze_verdicts(d)
        .filter(F.col("verdict") == "keep")
        .select("doc_id")
    )
    blocklist = boilerplate_blocklist_from_docs(
        d, df_floor=df_floor, top_k=top_k, block=block
    ).select(F.col("block_hash").alias("h"))
    kept_docs = d.join(keep, "doc_id")
    blocks = segment_blocks(
        kept_docs.select("doc_id", "source", "text"),
        block=block,
        with_text=True,
    )
    surviving = blocks.join(F.broadcast(blocklist), "h", "left_anti")
    stripped = blocks.join(F.broadcast(blocklist), "h", "left_semi")
    strip_stats = stripped.groupBy("doc_id").agg(
        F.count(F.lit(1)).cast("long").alias("n_blocks_stripped"),
        F.sum("n_tok").cast("long").alias("n_tok_stripped"),
    )
    assembled = surviving.groupBy("doc_id").agg(
        F.array_join(
            F.expr("transform(array_sort(collect_list(struct(b_idx, txt))), s -> s.txt)"),
            " ",
        ).alias("text"),
        F.sum("n_tok").cast("long").alias("n_tok"),
    )
    return (
        assembled.join(d.select("doc_id", "lang", "source"), "doc_id")
        .join(strip_stats, "doc_id", "left")
        .select(
            "doc_id",
            "source",
            "lang",
            "text",
            F.length("text").cast("long").alias("n_chars"),
            "n_tok",
            F.coalesce("n_blocks_stripped", F.lit(0)).cast("long").alias(
                "n_blocks_stripped"
            ),
            F.coalesce("n_tok_stripped", F.lit(0)).cast("long").alias(
                "n_tok_stripped"
            ),
        )
    )


def curated_write(
    spark: SparkSession,
    sf_dir: str,
    out_dir: str,
    df_floor: int = 3,
    top_k: int = 20,
    block: int = 20,
) -> dict:
    """Execute the curation pipeline end-to-end: write the curated
    corpus as parquet under ``out_dir`` and the freeze manifest as
    ``out_dir/_MANIFEST.json`` alongside (dataset-card style: verdict
    table, blocklist, strip accounting, gate definitions, parameters).
    Returns the manifest dict.

    Side-effecting pipeline op (like compact_parquet) — correctness is
    pinned by the x282 accounting query (hash-checked vs DuckDB) plus
    the e2e parity tests in tests/test_curated_write.py, not an oracle
    row."""
    from ..catalog import load_parallel

    docs = load_parallel(spark, sf_dir, "documents")
    manifest = curated_write_df(
        docs, out_dir, df_floor=df_floor, top_k=top_k, block=block
    )
    manifest["source_dir"] = sf_dir
    with open(os.path.join(out_dir, MANIFEST_NAME), "w") as f:
        json.dump(manifest, f, indent=2, sort_keys=True)
    return manifest


def curated_write_df(
    docs: DataFrame,
    out_dir: str,
    df_floor: int = 3,
    top_k: int = 20,
    block: int = 20,
) -> dict:
    """curated_write over an in-hand documents DataFrame (the pipeline
    sink form). Writes the parquet and the manifest; returns the
    manifest dict."""
    from ..functions.textfns import FUNNEL_STAGES
    from ..queries.dedup import boilerplate_blocklist_from_docs
    from ..queries.quality import freeze_verdicts

    spark = docs.sparkSession
    corpus = curated_corpus(
        docs, df_floor=df_floor, top_k=top_k, block=block
    )
    corpus.write.mode("overwrite").parquet(out_dir)

    # bounded collects only: |sources| x |verdicts| manifest rows, the
    # <= top_k blocklist, and one totals row over the WRITTEN files.
    verdict_rows = [
        r.asDict()
        for r in (
            freeze_verdicts(docs)
            .groupBy("source", "verdict")
            .agg(
                F.count(F.lit(1)).cast("long").alias("n_docs"),
                F.sum("n_chars").cast("long").alias("char_mass"),
            )
            .orderBy("source", "verdict")
            .collect()
        )
    ]
    blocklist_rows = [
        r.asDict()
        for r in boilerplate_blocklist_from_docs(
            docs, df_floor=df_floor, top_k=top_k, block=block
        ).collect()
    ]
    tot = (
        spark.read.parquet(out_dir)
        .agg(
            F.count(F.lit(1)).cast("long").alias("docs_emitted"),
            F.sum("n_tok").cast("long").alias("tokens_out"),
            F.sum("n_blocks_stripped").cast("long").alias("blocks_stripped"),
            F.sum("n_tok_stripped").cast("long").alias("tokens_stripped"),
        )
        .collect()[0]
    )
    docs_kept = sum(
        r["n_docs"] for r in verdict_rows if r["verdict"] == "keep"
    )
    manifest = {
        "format": "kafka_connect_spark.curated_corpus.v1",
        "parameters": {
            "block_tokens": block,
            "blocklist_df_floor": df_floor,
            "blocklist_top_k": top_k,
        },
        "gates": [
            {"name": name, "predicate": pred} for name, pred in FUNNEL_STAGES
        ],
        "verdict_precedence": [
            "drop_quality",
            "drop_exact_dup",
            "drop_contaminated",
            "keep",
        ],
        "verdicts": verdict_rows,
        "blocklist": blocklist_rows,
        "totals": {
            "docs_kept": int(docs_kept),
            "docs_emitted": int(tot["docs_emitted"]),
            "docs_fully_stripped": int(docs_kept - tot["docs_emitted"]),
            "tokens_out": int(tot["tokens_out"]),
            "blocks_stripped": int(tot["blocks_stripped"]),
            "tokens_stripped": int(tot["tokens_stripped"]),
        },
    }
    with open(os.path.join(out_dir, MANIFEST_NAME), "w") as f:
        json.dump(manifest, f, indent=2, sort_keys=True)
    return manifest


def read_manifest(out_dir: str) -> dict:
    with open(os.path.join(out_dir, MANIFEST_NAME)) as f:
        return json.load(f)
