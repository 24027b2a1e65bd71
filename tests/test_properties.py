"""Property-based tests (hypothesis): transform invariants that must hold
for ANY input, not just the fixtures."""

from __future__ import annotations

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st
from pyspark.sql import Row
from pyspark.sql import types as T

from kafka_connect_spark.sinks.upsert import UpsertParquetSink
from kafka_connect_spark.transforms import extract_new_record_state, mask_fields

ROW = T.StructType([T.StructField("id", T.LongType()), T.StructField("v", T.StringType())])
ENV = T.StructType(
    [
        T.StructField("before", ROW),
        T.StructField("after", ROW),
        T.StructField("op", T.StringType()),
    ]
)

ops = st.sampled_from(["c", "u", "d", "r", None])
vals = st.text(alphabet="abcxyz", min_size=0, max_size=5)
envelopes = st.lists(
    st.tuples(st.integers(0, 50), vals, vals, ops), min_size=0, max_size=25
)

_SETTINGS = dict(
    max_examples=12,
    deadline=None,
    suppress_health_check=[HealthCheck.too_slow, HealthCheck.function_scoped_fixture],
)


def _mk_env(spark, items):
    rows = [
        Row(
            before=Row(id=i, v=b) if op in ("u", "d") else None,
            after=Row(id=i, v=a) if op in ("c", "u", "r") else None,
            op=op,
        )
        for i, b, a, op in items
    ]
    return spark.createDataFrame(rows, ENV)


@given(items=envelopes)
@settings(**_SETTINGS)
def test_unwrap_rewrite_preserves_row_count(spark, items):
    """rewrite mode never drops records: every envelope row (incl.
    tombstones) yields exactly one output row, and __deleted is 'true'
    exactly for op='d'."""
    env = _mk_env(spark, items)
    out = extract_new_record_state(env, drop_tombstones=False).collect()
    assert len(out) == len(items)
    n_deleted = sum(1 for r in out if r["__deleted"] == "true")
    assert n_deleted == sum(1 for it in items if it[3] == "d")


@given(items=envelopes)
@settings(**_SETTINGS)
def test_unwrap_drop_mode_drops_exactly_deletes(spark, items):
    env = _mk_env(spark, items)
    out = extract_new_record_state(env, drop_tombstones=True, delete_handling="drop")
    expected = sum(1 for it in items if it[3] in ("c", "u", "r"))
    assert out.count() == expected


@given(values=st.lists(st.tuples(st.integers(0, 9), vals), min_size=1, max_size=20))
@settings(**_SETTINGS)
def test_mask_touches_only_listed_column(spark, values):
    df = spark.createDataFrame(values, ["id", "v"])
    out = mask_fields(df, ["v"], "X").collect()
    assert all(r["v"] == "X" for r in out)
    assert sorted(r["id"] for r in out) == sorted(i for i, _ in values)


@given(
    batch=st.lists(
        st.tuples(st.integers(0, 5), st.integers(0, 9), vals), min_size=1, max_size=15
    )
)
@settings(**_SETTINGS)
def test_upsert_replay_idempotent(spark, tmp_path_factory, batch):
    """Applying any batch twice == applying it once (the invariant that
    turns at-least-once delivery into exactly-once)."""
    path = str(tmp_path_factory.mktemp("upsert"))
    sink = UpsertParquetSink(path, key_cols=["id"], order_col="ver")
    df = spark.createDataFrame(batch, ["id", "ver", "v"])
    sink.apply_batch(df)
    once = sorted(map(tuple, sink.read(spark).collect()))
    sink.apply_batch(df)
    twice = sorted(map(tuple, sink.read(spark).collect()))
    assert once == twice
    assert len({k for k, _, _ in once}) == len(once)  # one row per key


@settings(
    max_examples=12,
    deadline=None,
    suppress_health_check=[HealthCheck.too_slow, HealthCheck.function_scoped_fixture],
)
@given(
    offsets=st.lists(st.integers(min_value=0, max_value=30), min_size=1, max_size=40),
    cap=st.integers(min_value=1, max_value=7),
)
def test_incremental_paging_never_loses_or_duplicates(spark, tmp_path_factory, offsets, cap):
    """Property: paging through ANY offset multiset (ties included, cap
    smaller than tie groups included) with batch_max_rows emits every row
    exactly once — the at-least-once boundary-cut invariant."""
    from kafka_connect_spark.sources.incremental import IncrementalTableSource

    tmp = tmp_path_factory.mktemp("inc")
    data = str(tmp / "t")
    spark.createDataFrame(
        [(i, o) for i, o in enumerate(offsets)], ["row_id", "off"]
    ).coalesce(1).write.parquet(data)
    src = IncrementalTableSource(
        data, "off", "incrementing", str(tmp / "state"), batch_max_rows=cap
    )
    seen: list[int] = []
    rounds = 0
    while (n := src.run_once(spark, lambda df: seen.extend(r["row_id"] for r in df.collect()))) > 0:
        rounds += 1
        assert rounds <= len(offsets) + 2  # must terminate
    assert sorted(seen) == list(range(len(offsets)))  # no loss, no dup


@given(
    rows=st.lists(
        st.tuples(st.integers(0, 30), st.integers(0, 100), vals),
        min_size=0, max_size=25, unique_by=lambda t: t[0],
    ),
    pred_cut=st.integers(0, 100),
    filt_cut=st.integers(0, 100),
)
@settings(**_SETTINGS)
def test_apply_when_row_dropping_preserves_unmatched(spark, rows, pred_cut, filt_cut):
    """For ANY data and any predicate/filter pair: a row-dropping transform
    under apply_when(row_preserving=False) must drop exactly the rows that
    BOTH match the predicate AND fail the inner filter — unmatched rows
    survive regardless of the filter."""
    from pyspark.sql import functions as F

    from kafka_connect_spark.transforms import apply_when

    df = spark.createDataFrame(rows, "id long, score long, v string") if rows else (
        spark.createDataFrame([], "id long, score long, v string")
    )
    out = apply_when(
        df,
        F.col("score") >= pred_cut,
        lambda d: d.filter(F.col("score") < filt_cut),
        row_preserving=False,
    )
    got = sorted(r["id"] for r in out.collect())
    want = sorted(
        i for i, score, _ in rows if not (score >= pred_cut and score >= filt_cut)
    )
    assert got == want


texts = st.lists(
    st.text(alphabet="ab x", min_size=0, max_size=40), min_size=1, max_size=12
)


@given(docs=texts)
@settings(**_SETTINGS)
def test_containment_bounds_and_symmetric_emission(spark, docs):
    """For ANY corpus: containment values lie in (0, 1]; pairs are emitted
    once with id_a < id_b; and containment_a >= containment_b iff doc_a has
    the smaller shingle set (same intersection, smaller denominator)."""
    from kafka_connect_spark.functions.dedupfns import (
        ngram_containment_pairs,
        shingles,
    )
    from pyspark.sql import functions as F

    df = spark.createDataFrame(
        [(i, t) for i, t in enumerate(docs)], ["doc_id", "text"]
    )
    got = ngram_containment_pairs(df, threshold=0.0).collect()
    sizes = {
        r["doc_id"]: r["n"]
        for r in df.select(
            "doc_id", F.size(shingles("text", 3)).alias("n")
        ).collect()
    }
    for r in got:
        assert r["id_a"] < r["id_b"]
        assert 0 < r["containment_a"] <= 1 and 0 < r["containment_b"] <= 1
        if sizes[r["id_a"]] < sizes[r["id_b"]]:
            assert r["containment_a"] >= r["containment_b"]


@given(docs=texts)
@settings(**_SETTINGS)
def test_bpe_merge_counts_monotone_nonincreasing(spark, docs):
    """For ANY corpus: the argmax pair count per BPE round never increases
    (merging can only remove adjacencies of the remaining pairs' supply,
    never create new higher-frequency ones above the previous max)."""
    from kafka_connect_spark.functions.textfns import bpe_train

    df = spark.createDataFrame([(t,) for t in docs], ["text"])
    merges, _ = bpe_train(df, num_merges=4, min_freq=1)
    counts = [r["cnt"] for r in merges.orderBy("rank").collect()]
    assert all(a >= b for a, b in zip(counts, counts[1:]))


@given(docs=texts)
@settings(**_SETTINGS)
def test_incremental_dedup_keeps_subset_of_new(spark, docs):
    """For ANY corpus split: the incremental-dedup survivors are a subset
    of the new batch, contain no fingerprint present in the reference, and
    are fingerprint-unique among themselves."""
    from kafka_connect_spark.functions.textfns import fingerprint
    from pyspark.sql import Window
    from pyspark.sql import functions as F

    df = spark.createDataFrame(
        [(i, t, "src0" if i % 2 == 0 else "ref") for i, t in enumerate(docs)],
        ["doc_id", "text", "source"],
    )
    fp = df.select("doc_id", "source", fingerprint("text").alias("h"))
    new = fp.filter(F.col("source") == "src0")
    ref = fp.filter(F.col("source") != "src0").select("h").distinct()
    w = Window.partitionBy("h").orderBy("doc_id")
    kept = (
        new.join(ref, "h", "left_anti")
        .withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .collect()
    )
    new_ids = {r["doc_id"] for r in new.collect()}
    ref_hashes = {r["h"] for r in ref.collect()}
    kept_hashes = [r["h"] for r in kept]
    assert {r["doc_id"] for r in kept} <= new_ids
    assert not (set(kept_hashes) & ref_hashes)
    assert len(kept_hashes) == len(set(kept_hashes))


def test_x58_ntile_rule_with_remainder(spark, tmp_path):
    """The fixture doc counts are all divisible by 10, so the driver oracle
    never exercises NTILE's remainder allocation (first N%10 tiles get one
    extra row). Pin the decomposed integer rule against DuckDB's ntile on
    an N=23 corpus, including tied lengths straddling tile boundaries."""
    import duckdb

    from kafka_connect_spark.queries import QUERIES

    rows = [(i, "x" * 10, "en", "s", [30, 30, 30, 10, 20][i % 5] + i // 5) for i in range(23)]
    sf = tmp_path / "mini"
    sf.mkdir()
    spark.createDataFrame(
        rows, ["doc_id", "text", "lang", "source", "n_chars"]
    ).write.parquet(str(sf / "documents.parquet"))
    got = {
        r["decile"]: (r["n_docs"], r["min_chars"], r["max_chars"], r["sum_chars"])
        for r in QUERIES["x58_length_decile_stats"](spark, str(sf)).collect()
    }
    con = duckdb.connect()
    want = {
        int(d): (n, mn, mx, s)
        for d, n, mn, mx, s in con.sql(
            f"""
            WITH d AS (SELECT doc_id, n_chars,
                              ntile(10) OVER (ORDER BY n_chars, doc_id) AS decile
                       FROM '{sf}/documents.parquet/*.parquet')
            SELECT decile, count(*), min(n_chars), max(n_chars), sum(n_chars)
            FROM d GROUP BY decile
            """
        ).fetchall()
    }
    con.close()
    assert got == want
    # remainder rule visible: 23 = 3 tiles of 3 + 7 tiles of 2
    assert sorted(n for n, *_ in got.values()) == [2] * 7 + [3] * 3
