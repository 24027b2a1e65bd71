"""Fixture-schema canary.

Round 4 lesson: the driver regenerated ``events.parquet`` with ``ts`` as
timestamp[us] (previously TIMESTAMP(NANOS)), and a loader hard-coded to the
old shape took down 30/50 correctness rows, 53 tests, and the whole bench.
This module turns the next driver-side fixture drift into a one-test
diagnosis: it pins the post-``load()`` dtype contract for every table and
unit-tests both generations of the events loader branch.
"""

from __future__ import annotations

import pyarrow as pa
import pyarrow.parquet as pq
import pytest

from kafka_connect_spark.catalog import TABLES, load

# Post-load() dtype contract (FIXTURES.md). Whatever the on-disk parquet
# generation, load() must surface exactly these Spark dtypes — every query
# and oracle in the repo assumes them.
EXPECTED_DTYPES = {
    "region": {"r_regionkey": "int", "r_name": "string"},
    "nation": {"n_nationkey": "int", "n_name": "string", "n_regionkey": "int"},
    "customer": {
        "c_custkey": "bigint",
        "c_name": "string",
        "c_nationkey": "int",
        "c_acctbal": "double",
        "c_mktsegment": "string",
    },
    "supplier": {
        "s_suppkey": "bigint",
        "s_name": "string",
        "s_nationkey": "int",
        "s_acctbal": "double",
    },
    "part": {
        "p_partkey": "bigint",
        "p_name": "string",
        "p_brand": "string",
        "p_type": "string",
        "p_size": "int",
        "p_retailprice": "double",
    },
    "orders": {
        "o_orderkey": "bigint",
        "o_custkey": "bigint",
        "o_orderstatus": "string",
        "o_totalprice": "double",
        "o_orderdate": "timestamp_ntz",
        "o_orderpriority": "string",
    },
    "lineitem": {
        "l_orderkey": "bigint",
        "l_partkey": "bigint",
        "l_suppkey": "bigint",
        "l_linenumber": "int",
        "l_quantity": "double",
        "l_extendedprice": "double",
        "l_discount": "double",
        "l_tax": "double",
        "l_returnflag": "string",
        "l_linestatus": "string",
        "l_shipdate": "timestamp_ntz",
    },
    "events": {
        "event_id": "bigint",
        "ts": "timestamp",  # the r4 drifted column; load() must normalize it
        "user_id": "bigint",
        "event_type": "string",
        "value": "double",
        "props": "string",
    },
    "documents": {
        "doc_id": "bigint",
        "text": "string",
        "lang": "string",
        "source": "string",
        "n_chars": "bigint",
    },
    "embeddings": {
        "vec_id": "bigint",
        "embedding": "array<float>",
        "label": "int",
    },
}


@pytest.mark.parametrize("table", TABLES)
def test_fixture_dtype_contract(spark, sf_dir, table):
    """Every catalog table loads with the contracted dtypes.

    A failure here names the drifted column before the 100+ downstream
    queries fail with opaque DATATYPE_MISMATCH errors.
    """
    assert table in EXPECTED_DTYPES, f"no dtype contract recorded for {table}"
    actual = dict(load(spark, sf_dir, table).dtypes)
    expected = EXPECTED_DTYPES[table]
    drifted = {
        col: (exp, actual.get(col, "<missing>"))
        for col, exp in expected.items()
        if actual.get(col) != exp
    }
    assert not drifted, (
        f"fixture drift in table {table!r}: "
        + ", ".join(
            f"column {c!r} expected {e!r} got {g!r}" for c, (e, g) in drifted.items()
        )
        + " — update catalog.load() to normalize the new on-disk shape"
    )


def _events_rows():
    return {
        "event_id": [1, 2],
        "user_id": [10, 20],
        "event_type": ["click", "view"],
        "value": [1.5, 2.5],
        "props": ["{}", "{}"],
    }


def _write_events(tmp_path, ts_array):
    cols = _events_rows()
    table = pa.table(
        {
            "event_id": pa.array(cols["event_id"], pa.int64()),
            "ts": ts_array,
            "user_id": pa.array(cols["user_id"], pa.int64()),
            "event_type": pa.array(cols["event_type"], pa.string()),
            "value": pa.array(cols["value"], pa.float64()),
            "props": pa.array(cols["props"], pa.string()),
        }
    )
    pq.write_table(table, str(tmp_path / "events.parquet"))
    return str(tmp_path)


# One instant, two on-disk generations: 2024-01-01T00:00:01.234567 UTC.
_MICROS = 1_704_067_201_234_567


def test_load_events_micros_generation(spark, tmp_path):
    """Current fixture generation: plain timestamp[us]."""
    d = _write_events(tmp_path, pa.array([_MICROS, _MICROS + 1], pa.timestamp("us")))
    df = load(spark, d, "events")
    assert dict(df.dtypes)["ts"] == "timestamp"
    got = [r.ts.isoformat() for r in df.orderBy("event_id").collect()]
    assert got[0] == "2024-01-01T00:00:01.234567"


def test_load_events_nanos_generation(spark, tmp_path):
    """Legacy fixture generation: TIMESTAMP(NANOS), surfaced as bigint via
    the nanosAsLong conf; load() truncates to micros — same instant."""
    d = _write_events(
        tmp_path,
        pa.array([_MICROS * 1000 + 789, (_MICROS + 1) * 1000], pa.timestamp("ns")),
    )
    df = load(spark, d, "events")
    assert dict(df.dtypes)["ts"] == "timestamp"
    got = [r.ts.isoformat() for r in df.orderBy("event_id").collect()]
    # nanos truncate (not round) to micros
    assert got[0] == "2024-01-01T00:00:01.234567"


def test_load_parallel_fans_out_single_split(spark, sf_dir):
    """Single-row-group fixture files plan as ONE scan task; load_parallel
    must fan them out to the session's parallelism for CPU-heavy per-row
    operators — and stay a no-op (same partitioning, no added shuffle)
    when the scan already has enough splits."""
    from kafka_connect_spark.catalog import load_parallel

    plain = load(spark, sf_dir, "documents")
    assert plain.rdd.getNumPartitions() == 1  # the fixture premise
    fanned = load_parallel(spark, sf_dir, "documents")
    assert fanned.rdd.getNumPartitions() == spark.sparkContext.defaultParallelism
    assert fanned.count() == plain.count()

    # already-parallel input: returned untouched (no repartition node)
    wide = load_parallel(spark, sf_dir, "documents", min_partitions=1)
    assert "Exchange" not in wide._jdf.queryExecution().executedPlan().toString()
