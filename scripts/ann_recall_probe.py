"""Recall@k vs wall-time for the four ANN scale paths as the corpus grows.

Round-6 verdict item #8: fixture-scale recall alone doesn't justify the
registry's default parameters — at FIXED parameters (tables/planes, cells/
probes, codes), recall degrades as the corpus grows, because the candidate
sets stay the same size while the true top-k competition widens. This
probe measures recall@k against the exact ranking at 1x/4x/16x of sf0.1
embeddings (signed-permutation copies via scale_probe.build_scaled_embeddings
— within-copy geometry exact, cross-copy cosines ~0), for:

- LSH top-k      (x13b defaults: 12 tables x 4 planes)
- IVF top-k      (x13c defaults: 16 cells, probe 8) and the scaled
  discipline (cells ~ n/640, probe n_cells/2) the 100 TB plan prescribes
- PQ-ADC top-k   (x87 defaults: m=8, 16 codes, oversample 8)
- MIPS-LSH top-k (x79b defaults: 12 tables x 4 planes, norm-augmented)

Ground truth: cosine_topk / mips_topk_brute over the same scaled corpus,
same fixed 10-query set (vec_id < 10 — copy 0 keeps original ids, so the
query workload is constant across scales; only the corpus grows).

Recall@k counts a hit when the approximate list contains the exact
neighbor id at ANY rank <= k (set recall, the standard ANN metric —
rank-order inside the top-k is exact anyway after the rerank stage).

Emits the markdown rows for docs/SCALING.md.

Usage:
    python scripts/ann_recall_probe.py --mults 1,4,16 --k 3
"""

from __future__ import annotations

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from kafka_connect_spark.session import get_spark
from scripts.scale_probe import build_scaled_embeddings


def _topk_sets(df, k):
    """{query_id: frozenset(neighbor_id)} from a (query_id, neighbor_id, rank) frame."""
    rows = df.filter(F.col("rank") <= k).select("query_id", "neighbor_id").collect()
    out: dict[int, set[int]] = {}
    for r in rows:
        out.setdefault(r["query_id"], set()).add(r["neighbor_id"])
    return out


def _recall(exact: dict, approx: dict) -> float:
    hits = sum(len(exact[q] & approx.get(q, set())) for q in exact)
    total = sum(len(v) for v in exact.values())
    return hits / total if total else float("nan")


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--mults", default="1,4,16")
    ap.add_argument("--k", type=int, default=3)
    ap.add_argument("--scratch", default="/tmp/scale_probe_embeddings")
    args = ap.parse_args()
    mults = [int(m) for m in args.mults.split(",")]
    k = args.k

    from kafka_connect_spark.functions.simfns import (
        cosine_topk,
        ivf_cosine_topk,
        lsh_cosine_topk,
        mips_topk_brute,
        mips_topk_lsh,
        pq_topk,
    )

    os.environ.setdefault("SPARK_GRAFT_DRIVER_MEM", "32g")
    spark = get_spark()
    spark.sparkContext.setLogLevel("ERROR")

    results = []  # (path, mult, recall, seconds)
    for m in mults:
        d = build_scaled_embeddings(spark, m, args.scratch)
        emb = spark.read.parquet(f"{d}/embeddings.parquet")
        n = emb.count()
        queries = emb.filter(F.col("vec_id") < 10)

        exact_cos = _topk_sets(cosine_topk(emb, queries, k=k), k)
        exact_mips = _topk_sets(mips_topk_brute(emb, queries, k=k), k)

        paths = {
            "lsh_fixed": lambda: lsh_cosine_topk(emb, queries, k=k),
            "ivf_fixed": lambda: ivf_cosine_topk(emb, queries, k=k),
            # the 100 TB discipline: cells grow with the corpus, probe half
            "ivf_scaled": lambda: ivf_cosine_topk(
                emb, queries, k=k,
                n_centroids=max(16, n // 640),
                n_probe=max(8, n // 1280),
            ),
            "pq_fixed": lambda: pq_topk(emb, queries, k=k),
            # scaled discipline: the ADC candidate pool must grow with the
            # corpus (fixed k*oversample survivors compete against n)
            "pq_scaled": lambda: pq_topk(
                emb, queries, k=k, oversample=max(8, n // 2000)
            ),
            "mips_lsh_fixed": lambda: mips_topk_lsh(emb, queries, k=k),
        }
        for name, fn in paths.items():
            truth = exact_mips if name.startswith("mips") else exact_cos
            t0 = time.time()
            approx = _topk_sets(fn(), k)
            sec = time.time() - t0
            rec = _recall(truth, approx)
            results.append((name, m, rec, sec))
            print(f"m{m} {name}: recall@{k}={rec:.3f} ({sec:.1f}s)", flush=True)

    print(f"\n| path | " + " | ".join(f"recall@{k} {m}x" for m in mults)
          + " | " + " | ".join(f"{m}x (s)" for m in mults) + " |")
    print("|---|" + "---|" * (2 * len(mults)))
    by = {}
    for name, m, rec, sec in results:
        by.setdefault(name, {})[m] = (rec, sec)
    for name, vals in by.items():
        recs = " | ".join(f"{vals[m][0]:.3f}" for m in mults)
        secs = " | ".join(f"{vals[m][1]:.1f}" for m in mults)
        print(f"| {name} | {recs} | {secs} |")


if __name__ == "__main__":
    main()
