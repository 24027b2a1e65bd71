"""k-core peel (x230): hand-checked graphs + pure-Python reference on the
fixture's own near-dup edges."""

from __future__ import annotations

from pyspark.sql import functions as F

from kafka_connect_spark.catalog import load_parallel
from kafka_connect_spark.functions.dedupfns import kcore_nodes, ngram_jaccard_pairs


def _py_kcore(edges, k):
    """Reference peel on a list of (a, b) tuples -> surviving node set."""
    edges = set(map(tuple, edges))
    while True:
        deg = {}
        for a, b in edges:
            deg[a] = deg.get(a, 0) + 1
            deg[b] = deg.get(b, 0) + 1
        keep = {n for n, d in deg.items() if d >= k}
        new = {(a, b) for a, b in edges if a in keep and b in keep}
        if new == edges:
            return keep
        edges = new


def _run(spark, pairs, k):
    df = spark.createDataFrame(pairs, "id_a long, id_b long")
    return {r.node for r in kcore_nodes(df, k).collect()}


def test_triangle_with_tail(spark):
    # triangle 1-2-3 plus pendant 4 and chain 5-6
    pairs = [(1, 2), (2, 3), (1, 3), (3, 4), (5, 6)]
    assert _run(spark, pairs, 2) == {1, 2, 3}
    assert _run(spark, pairs, 3) == set()


def test_k4_clique_survives_3core(spark):
    pairs = [(1, 2), (1, 3), (1, 4), (2, 3), (2, 4), (3, 4), (4, 5), (5, 6)]
    assert _run(spark, pairs, 3) == {1, 2, 3, 4}
    # the chain hangs on in the 1-core only
    assert _run(spark, pairs, 1) == {1, 2, 3, 4, 5, 6}


def test_long_chain_peels_fully(spark):
    pairs = [(i, i + 1) for i in range(1, 10)]
    assert _run(spark, pairs, 2) == set()


def test_matches_python_reference_on_fixture(spark, sf_dir):
    d = load_parallel(spark, sf_dir, "documents")
    e = ngram_jaccard_pairs(d, n=3, threshold=0.5).select("id_a", "id_b")
    pairs = [(r.id_a, r.id_b) for r in e.collect()]
    for k in (2, 3):
        want = _py_kcore(pairs, k)
        got = {r.node for r in kcore_nodes(e, k).collect()}
        assert got == want, f"k={k}: {got ^ want}"
