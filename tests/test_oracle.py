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


def test_redact_pii_patterns(spark):
    from kafka_connect_spark.functions.textfns import redact_pii
    from pyspark.sql import functions as F

    df = spark.createDataFrame(
        [
            ("mail bob.smith+x@corp-mail.io now", "mail [EMAIL] now"),
            ("ssn 123-45-6789 end", "ssn [SSN] end"),
            ("call 555-123-4567 or 555 987 6543", "call [PHONE] or [PHONE]"),
            ("card 4111-1111-1111-1111 or 4111111111111111", "card [CARD] or [CARD]"),
            ("clean text stays", "clean text stays"),
            ("version 1.2-3 stays", "version 1.2-3 stays"),
        ],
        ["t", "want"],
    )
    rows = df.select(redact_pii("t").alias("got"), "want").collect()
    for r in rows:
        assert r["got"] == r["want"]


def test_repetition_score_values(spark):
    from kafka_connect_spark.functions.textfns import repetition_score
    from pyspark.sql import functions as F

    df = spark.createDataFrame(
        [
            ("a b c a b c a b c", 3 / 7),   # 'a b c' appears 3x of 7 trigrams
            ("w x y z", 1 / 2),              # 2 distinct trigrams, max 1
            ("short one", 0.0),              # < n tokens
        ],
        ["t", "want"],
    )
    for r in df.select(repetition_score("t").alias("got"), "want").collect():
        assert abs(r["got"] - r["want"]) < 1e-6


def test_no_sql_line_comments_in_oracles():
    """The registry normalizes oracle SQL to one line, so a `--` comment
    would swallow everything after it — including WHERE predicates (the
    x126 near-miss: its second predicate vanished and the check happily
    compared against the wrong semantics). Ban line comments outright."""
    offenders = [name for name, sql in ORACLE.items() if "--" in sql]
    assert not offenders, f"line comments in oracle SQL: {offenders}"


def test_x264_n_need_bit_identical_across_engines(spark, duck):
    """Structural (not fixture-luck) check of the round-12 ADVICE fix:
    for a sweep of (k_j, n_j) proportions — including p1 values that put
    n_need within ulps of an integer — BOTH engines must produce the
    bit-identical dround'd n_need double and hence the same
    floor(n_need)+1. Before the fix DuckDB folded the z**2 / delta**2
    literals in exact DECIMAL while Spark folded Python doubles, so
    n_required could flip at an integer boundary on an unlucky
    fixture."""
    from pyspark.sql import functions as F

    from kafka_connect_spark.functions.rounding import dround, dround_sql
    from kafka_connect_spark.queries.stats import _X264_D2, _X264_Z2

    pairs = [(k, n) for n in (7, 97, 500, 1499, 65536) for k in range(0, n + 1, max(1, n // 37))]
    sdf = spark.createDataFrame(pairs, ["k_j", "n_j"])
    p1 = F.col("k_j").cast("double") / F.col("n_j")
    n_need = dround(
        F.lit(_X264_Z2)
        * ((p1 * (1.0 - p1)) + ((p1 + 0.02) * (1.0 - (p1 + 0.02))))
        / F.lit(_X264_D2),
        6,
    )
    got = {
        (r["k_j"], r["n_j"]): (r["v"], r["req"])
        for r in sdf.select(
            "k_j",
            "n_j",
            n_need.alias("v"),
            (F.floor(n_need).cast("long") + 1).alias("req"),
        ).collect()
    }
    expr = dround_sql(
        f"CAST('{_X264_Z2!r}' AS DOUBLE)"
        " * ((p1 * (1.0 - p1))"
        " + ((p1 + CAST('0.02' AS DOUBLE))"
        " * (1.0 - (p1 + CAST('0.02' AS DOUBLE)))))"
        f" / CAST('{_X264_D2!r}' AS DOUBLE)",
        6,
    )
    rows = duck.sql(
        "WITH c AS (SELECT k_j, n_j, CAST(k_j AS DOUBLE) / n_j AS p1"
        f" FROM (VALUES {', '.join(f'({k}, {n})' for k, n in pairs)})"
        " AS t(k_j, n_j))"
        f" SELECT k_j, n_j, {expr} AS v,"
        f" CAST(floor({expr}) AS BIGINT) + 1 AS req FROM c"
    ).fetchall()
    assert len(rows) == len(pairs)
    for k, n, v, req in rows:
        sv, sreq = got[(k, n)]
        assert sv == v, f"n_need diverges at k={k} n={n}: spark {sv!r} duck {v!r}"
        assert sreq == req, f"n_required diverges at k={k} n={n}"
