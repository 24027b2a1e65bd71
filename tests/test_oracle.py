"""Golden tests: every oracle-backed query from SURVEY.md §2 must match
DuckDB on the fixture tables (the driver runs the same check at sf0.01;
these run at sf0.001 for speed — override with SPARK_TEST_SF_DIR)."""

from __future__ import annotations

import pytest

from kafka_connect_spark.queries import ORACLE, QUERIES
from kafka_connect_spark.testing import compare_frames


@pytest.mark.parametrize("name", sorted(ORACLE))
def test_oracle_parity(spark, duck, sf_dir, name):
    spdf = QUERIES[name](spark, sf_dir).toPandas()
    dpdf = duck.sql(ORACLE[name]).df()
    problems = compare_frames(spdf, dpdf)
    assert not problems, f"{name}: " + "; ".join(problems)


@pytest.mark.parametrize("name", sorted(set(QUERIES) - set(ORACLE)))
def test_rows_only_queries_run(spark, sf_dir, name):
    df = QUERIES[name](spark, sf_dir)
    assert df.count() >= 0
    assert len(df.schema.fields) > 0
