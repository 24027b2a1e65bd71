"""Mergeable-summary sketches for corpus-scale term statistics.

The first member is Misra–Gries heavy-hitter candidate generation
(Misra & Gries 1982; merge rule per Agarwal et al., "Mergeable
Summaries", PODS'12): each input partition maintains at most
``capacity`` counters; whenever the map would exceed capacity, the
(capacity+1)-th largest count is subtracted from every counter and
non-positive counters are dropped. Each kept counter then undercounts
its true partition frequency by at most N_p/(capacity+1), so any term
with GLOBAL frequency > N/(capacity+1) must survive in at least one
partition (pigeonhole over partitions). The union of per-partition
survivors is therefore a guaranteed superset of the heavy hitters —
a bounded candidate set (≤ capacity × n_partitions rows) that gets
an exact second-pass recount.

Why this shape at 100 TB: the naive plan shuffles every distinct term
(a full wordcount over a web-scale vocabulary — billions of shuffle
keys for an output of a few hundred rows). The sketch pass reduces the
shuffle to ≤ capacity rows per partition, and the rescore pass shuffles
only occurrences of candidate terms (a broadcast semi-join keeps the
filter map-side). Two scans, both map-heavy, tiny shuffles — and the
final counts are EXACT, so the operator is oracle-checkable despite the
approximate intermediate.

The per-partition pass is an Arrow-batched ``mapInPandas`` iterator:
counts are merged per batch via vectorized ``value_counts`` (no
per-row Python), and the MG compaction runs only when the map
overflows. This is the deliberate Python stage of the operator; the
explode/recount stages stay JVM-side.

Reference scope note: the reference stack exposes per-topic record
counters only (fastapi/main.py:20-45); frequent-element mining over
record contents is part of the LLM-pipeline extension surface
(SURVEY.md §2.6).
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def misra_gries_candidates(
    terms: DataFrame, term_col: str = "term", capacity: int = 1024
) -> DataFrame:
    """Per-partition Misra–Gries survivors — a superset of all terms with
    global frequency > N/(capacity+1). Output: distinct ``term`` rows,
    bounded by capacity × n_partitions."""

    def mg(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        counters: dict[str, int] = {}
        for batch in batches:
            for t, c in batch[term_col].value_counts().items():
                counters[t] = counters.get(t, 0) + int(c)
            if len(counters) > capacity:
                # subtract the (capacity+1)-th largest count from everyone;
                # ≥ len-capacity counters go non-positive and drop, so the
                # map returns to ≤ capacity without per-increment decrements
                delta = sorted(counters.values(), reverse=True)[capacity]
                counters = {
                    t: c - delta for t, c in counters.items() if c - delta > 0
                }
        yield pd.DataFrame({term_col: list(counters.keys())})

    out = terms.select(term_col).mapInPandas(mg, schema=f"{term_col} string")
    return out.distinct()


def frequent_terms_exact(
    terms: DataFrame,
    term_col: str = "term",
    denom: int = 1024,
    capacity: int | None = None,
) -> DataFrame:
    """All terms whose exact global count satisfies cnt × denom > N, found
    via MG candidates + exact rescore. ``capacity`` defaults to ``denom``
    (valid because the survival guarantee covers count > N/(capacity+1),
    and cnt × denom > N implies cnt > N/denom > N/(denom+1)).

    The threshold compare is integer-exact (cnt * denom > N) — no
    float division, so Spark and DuckDB agree bit-for-bit."""
    cap = capacity if capacity is not None else denom
    cands = misra_gries_candidates(terms, term_col, cap)
    total = terms.agg(F.count(F.lit(1)).alias("n_total"))
    exact = (
        terms.join(F.broadcast(cands), term_col, "left_semi")
        .groupBy(term_col)
        .agg(F.count(F.lit(1)).alias("cnt"))
    )
    return (
        exact.crossJoin(F.broadcast(total))  # 1-row scalar, broadcast
        .filter(F.col("cnt") * denom > F.col("n_total"))
        .select(term_col, "cnt")
        .orderBy(term_col)
    )
