"""Misra–Gries heavy-hitter sketch (functions/sketchfns.py).

The fixture vocabulary is tiny, so the oracle row for x76 exercises the
plumbing but not the sketch regime. These tests build a Zipf-ish synthetic
stream whose vocabulary is far larger than the MG capacity and assert the
two properties the 100 TB claim rests on:

- candidate SUPERSET: every term with global count > N/(capacity+1)
  survives the per-partition pass (the mergeable-summaries pigeonhole);
- exact FINAL output: candidates + rescore equals the naive full
  wordcount, term for term and count for count.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from kafka_connect_spark.functions.sketchfns import (
    frequent_terms_exact,
    misra_gries_candidates,
)


def _skewed_terms(spark, n_heavy=12, n_tail=5000, heavy_reps=400, parts=8):
    """12 heavy terms (400 occurrences each) drowned in a 5000-term tail
    (3 occurrences each): N = 19_800, vocab = 5_012."""
    heavy = (
        spark.range(n_heavy * heavy_reps)
        .select(F.concat(F.lit("hot_"), (F.col("id") % n_heavy)).alias("term"))
    )
    tail = (
        spark.range(n_tail * 3)
        .select(F.concat(F.lit("cold_"), (F.col("id") % n_tail)).alias("term"))
    )
    return heavy.unionAll(tail).repartition(parts)  # scatter terms across partitions


def test_mg_candidates_are_superset(spark):
    terms = _skewed_terms(spark)
    n = terms.count()
    capacity = 64  # vocab 5_012 >> capacity: genuine sketch regime
    cands = {r.term for r in misra_gries_candidates(terms, "term", capacity).collect()}
    assert len(cands) <= capacity * 8  # bounded by capacity x partitions
    truth = {
        r.term
        for r in terms.groupBy("term")
        .agg(F.count(F.lit(1)).alias("c"))
        .filter(F.col("c") * (capacity + 1) > n)
        .collect()
    }
    assert truth  # the heavy terms really do clear the threshold
    assert truth <= cands


def test_frequent_terms_exact_equals_naive(spark):
    terms = _skewed_terms(spark)
    denom = 65
    got = frequent_terms_exact(terms, "term", denom=denom, capacity=64).collect()
    n = terms.count()
    want = (
        terms.groupBy("term")
        .agg(F.count(F.lit(1)).alias("cnt"))
        .filter(F.col("cnt") * denom > F.lit(n))
        .orderBy("term")
        .collect()
    )
    assert [(r.term, r.cnt) for r in got] == [(r.term, r.cnt) for r in want]
    assert len(got) == 12  # exactly the planted heavy terms


def test_mg_single_partition_classic_bound(spark):
    # one partition, capacity 2, stream 6xA 4xB 2xC 1xD: A and B must survive
    terms = spark.createDataFrame(
        [("a",)] * 6 + [("b",)] * 4 + [("c",)] * 2 + [("d",)],
        "term string",
    ).coalesce(1)
    cands = {r.term for r in misra_gries_candidates(terms, "term", 2).collect()}
    assert "a" in cands and "b" in cands and len(cands) <= 2
