"""Scale-probe the dedup/similarity family beyond the sf0.1 fixtures.

The 100 TB claims in docs/PLANS.md rest on the assertion that the dedup
operators grow ~linearly in corpus size (bucketed joins, no all-pairs).
This script measures it: it synthesizes documents tables at K x sf0.1
(K = 1, 2, 4, 8 by default), runs the heavy dedup queries at each scale,
and fits the growth exponent  t ~ n^alpha  by least squares on
(log K, log t).  alpha ~ 1 = the linear scaling the plans claim;
alpha ~ 2 = a hidden all-pairs.

Scaling construction: copy k of the corpus is the sf0.1 documents table
with every TOKEN prefixed by a copy tag (``c<k>x``) and doc_id offset by
k * 10^9. Token-level tagging means no shingle ever matches ACROSS copies
(every token differs), while the duplicate structure WITHIN each copy is
preserved verbatim — so true pair/cluster cardinality scales exactly
linearly with K and any superlinear wall-time growth is the ENGINE's, not
the workload's. (A naive text-suffix tag would leave near-identical
cross-copy texts and inflate the true pair count quadratically,
contaminating the measurement.)

Synthetic data lands in a scratch dir (default /tmp/scale_probe) — never
in the committed fixtures. Non-documents tables are not needed by the
probed queries; the scratch dir holds only documents.parquet.

Usage:
    python scripts/scale_probe.py                # K=1,2,4,8, default queries
    python scripts/scale_probe.py --mults 1,2,4 --queries x12c,x43
"""

from __future__ import annotations

import argparse
import math
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from kafka_connect_spark.session import get_spark
from kafka_connect_spark.queries import QUERIES

BASE = "/root/testdata/sf0.1"
DEFAULT_QUERIES = ["x12c", "x12e", "x12h", "x12i", "x43", "x43b"]
# registry names are prefixed (x12c_ngram_jaccard_pairs etc.); resolve by prefix
def _resolve(short: str) -> str:
    hits = [k for k in QUERIES if k == short or k.startswith(short + "_")]
    if len(hits) != 1:
        raise SystemExit(f"query {short!r} resolves to {hits!r}")
    return hits[0]


def build_scaled(spark, mult: int, scratch: str) -> str:
    """Materialize K x sf0.1 documents into <scratch>/m<K>/documents.parquet."""
    out_dir = os.path.join(scratch, f"m{mult}")
    out = os.path.join(out_dir, "documents.parquet")
    # only reuse a COMPLETE prior materialization (a crashed run leaves the
    # directory without Spark's _SUCCESS marker)
    if os.path.exists(os.path.join(out, "_SUCCESS")):
        return out_dir
    base = spark.read.parquet(f"{BASE}/documents.parquet")
    copies = []
    for k in range(mult):
        tag = F.lit(f"c{k}x")
        copies.append(
            base.select(
                (F.col("doc_id") + F.lit(k * 1_000_000_000)).alias("doc_id"),
                F.array_join(
                    F.transform(
                        F.split(F.col("text"), " "), lambda t: F.concat(tag, t)
                    ),
                    " ",
                ).alias("text"),
                "lang",
                "source",
                F.length(
                    F.array_join(
                        F.transform(
                            F.split(F.col("text"), " "), lambda t: F.concat(tag, t)
                        ),
                        " ",
                    )
                ).alias("n_chars"),
            )
        )
    df = copies[0]
    for c in copies[1:]:
        df = df.unionAll(c)
    # spread copies across partitions like a real corpus (not copy-clustered)
    df.repartition(32, "doc_id").write.mode("overwrite").parquet(out)
    return out_dir


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--mults", default="1,2,4,8")
    ap.add_argument("--queries", default=",".join(DEFAULT_QUERIES))
    ap.add_argument("--scratch", default="/tmp/scale_probe")
    ap.add_argument("--reps", type=int, default=1)
    args = ap.parse_args()
    mults = [int(m) for m in args.mults.split(",")]
    names = [_resolve(q) for q in args.queries.split(",")]

    os.environ.setdefault("SPARK_GRAFT_DRIVER_MEM", "32g")
    spark = get_spark()
    spark.sparkContext.setLogLevel("ERROR")

    dirs = {}
    for m in mults:
        t0 = time.time()
        dirs[m] = build_scaled(spark, m, args.scratch)
        print(f"built m{m} in {time.time()-t0:.1f}s", flush=True)

    # warmup (JIT/codegen caches) on the smallest scale
    for name in names:
        QUERIES[name](spark, dirs[mults[0]]).write.format("noop").mode(
            "overwrite"
        ).save()

    results: dict[str, dict[int, float]] = {n: {} for n in names}
    rows_out: dict[str, dict[int, int]] = {n: {} for n in names}
    for m in mults:
        for name in names:
            best = math.inf
            for _ in range(args.reps):
                t0 = time.time()
                df = QUERIES[name](spark, dirs[m])
                df.write.format("noop").mode("overwrite").save()
                best = min(best, time.time() - t0)
            results[name][m] = best
            rows_out[name][m] = QUERIES[name](spark, dirs[m]).count()
            print(f"m{m} {name}: {best:.2f}s ({rows_out[name][m]} rows)", flush=True)

    # least-squares slope of log t vs log m = scaling exponent
    print("\n| query | " + " | ".join(f"{m}x (s)" for m in mults) + " | rows@max | alpha |")
    print("|---|" + "---|" * (len(mults) + 2))
    for name in names:
        xs = [math.log(m) for m in mults]
        ys = [math.log(results[name][m]) for m in mults]
        n = len(xs)
        mx, my = sum(xs) / n, sum(ys) / n
        denom = sum((x - mx) ** 2 for x in xs)
        alpha = sum((x - mx) * (y - my) for x, y in zip(xs, ys)) / denom if denom else float("nan")
        times = " | ".join(f"{results[name][m]:.2f}" for m in mults)
        print(f"| {name} | {times} | {rows_out[name][max(mults)]} | {alpha:.2f} |")


if __name__ == "__main__":
    main()
