"""Batch relational surface: sources (S1-S3), SQL data-prep constructs
(Q2-Q9), and the extension operators X1-X10 (joins, aggregation, windows,
sort/top-k, set ops, scalar functions).

Reference parity notes cite /root/reference file:line per SURVEY.md §2.
All plans are declarative DataFrame API => Catalyst gets pushdown, pruning,
join selection, AQE. Explicit ``broadcast()`` only where the table is small
at EVERY scale factor (region/nation are fixed-size dimensions in TPC-H-like
schemas; customer/orders/lineitem scale with SF and must shuffle-join).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..catalog import load, register_views
from .registry import davg_sql, dround, dround_sql, dsum, dsum_sql, query


# ---------------------------------------------------------------------------
# S1-S3 — JDBC-source scan modes (reference: README.md:91-109,
# source-quickstart-sqlite.properties:27-29, manifest.json:5).
# Batch analogs of the three poll modes; the streaming offset-bookkeeping
# versions live in kafka_connect_spark.sources.incremental.
# ---------------------------------------------------------------------------


@query(
    "s1_jdbc_timestamp_scan",
    oracle="""
    SELECT * FROM orders WHERE o_orderdate > TIMESTAMP '1995-01-01'
    ORDER BY o_orderkey
    """,
)
def s1_jdbc_timestamp_scan(spark: SparkSession, sf_dir: str) -> DataFrame:
    """JDBC source `timestamp` mode: rows with offset column > last offset
    (reference README.md:96-100, mode=timestamp on updated_at). The filter
    is pushed into the parquet scan (PushedFilters), exactly as Catalyst
    pushes it into a JDBC subquery at scale."""
    orders = load(spark, sf_dir, "orders")
    return orders.filter(
        F.col("o_orderdate") > F.lit("1995-01-01").cast("timestamp")
    ).orderBy("o_orderkey")


@query(
    "s2_jdbc_incrementing_scan",
    oracle="""
    SELECT * FROM lineitem WHERE l_orderkey > 3000
    ORDER BY l_orderkey, l_linenumber
    """,
)
def s2_jdbc_incrementing_scan(spark: SparkSession, sf_dir: str) -> DataFrame:
    """JDBC source `incrementing` mode: autoincrement id > last max
    (reference source-quickstart-sqlite.properties:27-29)."""
    li = load(spark, sf_dir, "lineitem")
    return li.filter(F.col("l_orderkey") > 3000).orderBy("l_orderkey", "l_linenumber")


@query(
    "s2c_jdbc_ts_incrementing_scan",
    oracle="""
    SELECT event_id, user_id, ts, value FROM events
    WHERE date_trunc('hour', ts) > TIMESTAMP '2024-01-16 00:00:00'
       OR (date_trunc('hour', ts) = TIMESTAMP '2024-01-16 00:00:00'
           AND event_id > 5000)
    ORDER BY event_id
    """,
)
def s2c_jdbc_ts_incrementing_scan(spark: SparkSession, sf_dir: str) -> DataFrame:
    """JDBC source `timestamp+incrementing` mode (the reference source's
    dual-offset poll): the committed offset is the composite (timestamp,
    id), so the increment predicate is ts > last_ts OR (ts = last_ts AND
    id > last_id) — an OR-of-ranges Catalyst pushes into the scan. The
    hour-truncated timestamp gives the fixture real tie groups, so the
    id branch of the composite does real work here (capped-poll paging
    semantics are tested in tests/test_sources_sinks.py)."""
    ev = load(spark, sf_dir, "events").select("event_id", "user_id", "ts", "value")
    hts = F.date_trunc("hour", F.col("ts"))
    lts = F.lit("2024-01-16 00:00:00").cast("timestamp")
    return ev.filter(
        (hts > lts) | ((hts == lts) & (F.col("event_id") > 5000))
    ).orderBy("event_id")


@query("s3_jdbc_bulk_snapshot", oracle="SELECT * FROM customer ORDER BY c_custkey")
def s3_jdbc_bulk_snapshot(spark: SparkSession, sf_dir: str) -> DataFrame:
    """JDBC source `bulk` mode: full-table copy per poll (reference
    manifest.json:5 'all tables ... copied, each to its own output topic')."""
    return load(spark, sf_dir, "customer").orderBy("c_custkey")


@query(
    "s6b_mm2_offset_translation",
    oracle="""
    WITH recs AS (
      SELECT event_type AS topic, CAST(user_id % 4 AS INTEGER) AS partition,
             event_id AS upstream_offset
      FROM events
    ),
    map AS (
      SELECT topic, partition, upstream_offset,
             row_number() OVER (PARTITION BY topic, partition
                                ORDER BY upstream_offset) - 1 AS downstream_offset
      FROM recs
    ),
    grp AS (
      SELECT topic, partition,
             (MIN(upstream_offset) + MAX(upstream_offset)) // 2 AS committed
      FROM recs GROUP BY topic, partition
    )
    SELECT 'g1' AS "group", 'primary.' || g.topic AS topic, g.partition,
           g.committed AS upstream_offset,
           CAST(COALESCE(
             MIN(CASE WHEN m.upstream_offset >= g.committed
                      THEN m.downstream_offset END),
             MAX(m.downstream_offset) + 1, 0) AS BIGINT) AS downstream_offset
    FROM grp g LEFT JOIN map m USING (topic, partition)
    GROUP BY g.topic, g.partition, g.committed
    ORDER BY topic, partition
    """,
)
def s6b_mm2_offset_translation(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MirrorMaker 2 checkpoint translation (reference README.md:52-65),
    hash-checked: events become a kafka-shaped log (topic=event_type,
    partition=user_id%4, offset=event_id), replication assigns contiguous
    per-partition downstream offsets, and each consumer group's committed
    upstream offset translates to the downstream resume position."""
    from ..sources.mirror import checkpoints, mirror_with_offsets, offset_syncs

    ev = load(spark, sf_dir, "events")
    recs = ev.select(
        F.lit(None).cast("binary").alias("value"),
        F.col("event_type").alias("topic"),
        F.pmod("user_id", F.lit(4)).cast("int").alias("partition"),
        F.col("event_id").alias("offset"),
    )
    syncs = offset_syncs(mirror_with_offsets(recs, "primary"), "primary")
    groups = (
        recs.groupBy("topic", "partition")
        .agg(F.expr("(min(offset) + max(offset)) div 2").alias("committed_offset"))
        .withColumn("group", F.lit("g1"))
    )
    cp = checkpoints(groups, syncs, "primary")
    return cp.select(
        "group",
        "topic",
        "partition",
        F.col("upstream_offset").cast("long").alias("upstream_offset"),
        F.col("downstream_offset").cast("long").alias("downstream_offset"),
    ).orderBy("topic", "partition")


@query(
    "s3b_jdbc_live_roundtrip",
    oracle="""
    SELECT c_custkey, c_name, c_acctbal FROM customer
    WHERE c_acctbal > 0 ORDER BY c_custkey
    """,
)
def s3b_jdbc_live_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    """REAL JDBC wiring, hash-checked: load the customer table, write it to
    a live embedded Derby database over ``df.write.format("jdbc")``, read it
    back with ``spark.read.format("jdbc")`` with a filter pushed into the
    remote WHERE clause, and return the result (reference README.md:88-109
    ``connection.url`` — the same code path a Postgres deployment uses).
    DOUBLE/BIGINT/VARCHAR round-trip bit-exactly through the database."""
    import tempfile

    from ..sinks.jdbc import quiet_derby

    quiet_derby(spark)
    url = f"jdbc:derby:{tempfile.mkdtemp(prefix='derby-rt-')}/db;create=true"
    cust = load(spark, sf_dir, "customer").select("c_custkey", "c_name", "c_acctbal")
    (
        cust.write.format("jdbc")
        .option("url", url)
        .option("dbtable", "CUST")
        .mode("overwrite")
        .save()
    )
    back = spark.read.format("jdbc").option("url", url).option("dbtable", "CUST").load()
    return back.filter(F.col("c_acctbal") > 0).orderBy("c_custkey")


# ---------------------------------------------------------------------------
# K2 — JDBC sink upsert semantics (reference sink-quickstart-sqlite.properties:19-29,
# manifest.json:5 'idempotent writes with upserts'). Batch analog:
# last-writer-wins keyed dedup; the foreachBatch MERGE version lives in
# kafka_connect_spark.sinks.upsert.
# ---------------------------------------------------------------------------


@query(
    "k2_upsert_last_writer_wins",
    oracle="""
    SELECT user_id, event_id AS last_event_id, value AS last_value
    FROM (SELECT *, row_number() OVER
            (PARTITION BY user_id ORDER BY ts DESC, event_id DESC) AS rn
          FROM events)
    WHERE rn = 1 ORDER BY user_id
    """,
)
def k2_upsert_last_writer_wins(spark: SparkSession, sf_dir: str) -> DataFrame:
    events = load(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy(
        F.col("ts").desc(), F.col("event_id").desc()
    )
    return (
        events.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .select(
            "user_id",
            F.col("event_id").alias("last_event_id"),
            F.col("value").alias("last_value"),
        )
        .orderBy("user_id")
    )


# ---------------------------------------------------------------------------
# Q2-Q6 — the reference's SQL data-prep surface (README.md:143-150).
# ---------------------------------------------------------------------------


@query(
    "q2_generate_series",
    oracle="""
    SELECT i AS id, 'Name_' || CAST(i AS VARCHAR) AS name
    FROM range(1, 1001) t(i) ORDER BY id
    """,
)
def q2_generate_series(spark: SparkSession, sf_dir: str) -> DataFrame:
    """INSERT INTO ... SELECT ... FROM generate_series(1, N) + '||' concat
    (reference README.md:143-150). spark.range is the distributed analog."""
    return spark.range(1, 1001).select(
        F.col("id"),
        F.concat(F.lit("Name_"), F.col("id").cast("string")).alias("name"),
    )


@query(
    "q4_substring",
    oracle="""
    SELECT c_custkey, substring(c_name, 1, 8) AS name_prefix
    FROM customer ORDER BY c_custkey
    """,
)
def q4_substring(spark: SparkSession, sf_dir: str) -> DataFrame:
    """substring(str, pos, len) (reference README.md:146)."""
    return (
        load(spark, sf_dir, "customer")
        .select("c_custkey", F.substring("c_name", 1, 8).alias("name_prefix"))
        .orderBy("c_custkey")
    )


@query(
    "q5_deterministic_mix",
    oracle="""
    SELECT c_custkey,
           chr(CAST(65 + (c_custkey * 2654435761) % 67108864 % 26 AS INTEGER)) AS letter
    FROM customer ORDER BY c_custkey
    """,
)
def q5_deterministic_mix(spark: SparkSession, sf_dir: str) -> DataFrame:
    """random() in the reference's data-prep (README.md:146) replaced by a
    deterministic Knuth-multiplicative mix so the result is hash-checkable
    (FIXTURES.md §4 rule 1)."""
    mix = (F.col("c_custkey") * F.lit(2654435761)) % F.lit(67108864) % F.lit(26)
    return (
        load(spark, sf_dir, "customer")
        .select(
            "c_custkey",
            F.expr("char(CAST(65 + (c_custkey * 2654435761) % 67108864 % 26 AS INT))").alias(
                "letter"
            ),
        )
        .orderBy("c_custkey")
    )


@query(
    "q6_cast_to_int",
    oracle="""
    SELECT c_custkey, CAST(FLOOR(c_acctbal) AS INTEGER) AS acctbal_int
    FROM customer ORDER BY c_custkey
    """,
)
def q6_cast_to_int(spark: SparkSession, sf_dir: str) -> DataFrame:
    """(expr)::integer (reference README.md:146). FLOOR first: Spark ANSI
    CAST truncates toward zero while DuckDB rounds, so the checked query
    pins the semantics explicitly."""
    return (
        load(spark, sf_dir, "customer")
        .select("c_custkey", F.floor("c_acctbal").cast("int").alias("acctbal_int"))
        .orderBy("c_custkey")
    )


# ---------------------------------------------------------------------------
# X1-X3 — joins.
# ---------------------------------------------------------------------------


@query(
    "x1_inner_equijoin",
    oracle="""
    SELECT o_orderkey, c_name FROM orders JOIN customer ON o_custkey = c_custkey
    ORDER BY o_orderkey
    """,
)
def x1_inner_equijoin(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Inner equi-join. No explicit broadcast: customer scales with SF, so
    the right plan at 100 TB is a shuffle join on the key; AQE picks
    broadcast automatically when the built side is small."""
    orders = load(spark, sf_dir, "orders")
    customer = load(spark, sf_dir, "customer")
    return (
        orders.join(customer, orders.o_custkey == customer.c_custkey, "inner")
        .select("o_orderkey", "c_name")
        .orderBy("o_orderkey")
    )


@query(
    "x2_join_star_q5",
    oracle=f"""
    SELECT n_name, {dsum_sql("l_extendedprice * (1 - l_discount)")} AS revenue
    FROM customer, orders, lineitem, supplier, nation, region
    WHERE c_custkey = o_custkey AND l_orderkey = o_orderkey
      AND l_suppkey = s_suppkey AND c_nationkey = s_nationkey
      AND s_nationkey = n_nationkey AND n_regionkey = r_regionkey
      AND r_name = 'ASIA'
    GROUP BY n_name ORDER BY n_name
    """,
)
def x2_join_star_q5(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Multi-way star join (TPC-H Q5 shape). nation/region are fixed-size
    dimensions at any SF => explicit broadcast; the fact-side joins shuffle
    on their keys and Catalyst/AQE reorders."""
    c = load(spark, sf_dir, "customer")
    o = load(spark, sf_dir, "orders")
    li = load(spark, sf_dir, "lineitem")
    s = load(spark, sf_dir, "supplier")
    n = load(spark, sf_dir, "nation")
    r = load(spark, sf_dir, "region").filter(F.col("r_name") == "ASIA")
    return (
        c.join(o, c.c_custkey == o.o_custkey)
        .join(li, li.l_orderkey == o.o_orderkey)
        .join(s, (li.l_suppkey == s.s_suppkey) & (c.c_nationkey == s.s_nationkey))
        .join(F.broadcast(n), s.s_nationkey == n.n_nationkey)
        .join(F.broadcast(r), n.n_regionkey == r.r_regionkey)
        .groupBy("n_name")
        .agg(dsum(F.col("l_extendedprice") * (1 - F.col("l_discount"))).alias("revenue"))
        .orderBy("n_name")
    )


@query(
    "x3_anti_join",
    oracle="""
    SELECT c_custkey FROM customer
    WHERE c_custkey NOT IN (SELECT o_custkey FROM orders)
    ORDER BY c_custkey
    """,
)
def x3_anti_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Left-anti join (customers without orders)."""
    c = load(spark, sf_dir, "customer")
    o = load(spark, sf_dir, "orders")
    return (
        c.join(o, c.c_custkey == o.o_custkey, "left_anti")
        .select("c_custkey")
        .orderBy("c_custkey")
    )


@query(
    "x3b_semi_join",
    oracle="""
    SELECT c_custkey, c_name FROM customer
    WHERE c_custkey IN (SELECT o_custkey FROM orders WHERE o_totalprice > 400000)
    ORDER BY c_custkey
    """,
)
def x3b_semi_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = load(spark, sf_dir, "customer")
    o = load(spark, sf_dir, "orders").filter(F.col("o_totalprice") > 400000)
    return (
        c.join(o, c.c_custkey == o.o_custkey, "left_semi")
        .select("c_custkey", "c_name")
        .orderBy("c_custkey")
    )


@query(
    "x3c_left_outer_join",
    oracle="""
    SELECT c_custkey, count(o_orderkey) AS n_orders
    FROM customer LEFT JOIN orders ON c_custkey = o_custkey
    GROUP BY c_custkey ORDER BY c_custkey
    """,
)
def x3c_left_outer_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = load(spark, sf_dir, "customer")
    o = load(spark, sf_dir, "orders")
    return (
        c.join(o, c.c_custkey == o.o_custkey, "left")
        .groupBy("c_custkey")
        .agg(F.count("o_orderkey").alias("n_orders"))
        .orderBy("c_custkey")
    )


# ---------------------------------------------------------------------------
# X4/X6 — aggregation.
# ---------------------------------------------------------------------------


@query(
    "x3d_full_outer_join",
    oracle="""
    SELECT n.n_nationkey AS nationkey, n.n_name, r.r_name
    FROM nation n FULL OUTER JOIN region r ON n.n_regionkey = r.r_regionkey
    ORDER BY nationkey NULLS FIRST
    """,
)
def x3d_full_outer_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    n = load(spark, sf_dir, "nation")
    r = load(spark, sf_dir, "region")
    return (
        n.join(r, n.n_regionkey == r.r_regionkey, "full_outer")
        .select(F.col("n_nationkey").alias("nationkey"), "n_name", "r_name")
        .orderBy(F.col("nationkey").asc_nulls_first())
    )


@query(
    "x4_agg_tpch_q1",
    oracle=f"""
    SELECT l_returnflag, l_linestatus,
           {dsum_sql("l_quantity", 2)} AS sum_qty,
           {dsum_sql("l_extendedprice", 2)} AS sum_base_price,
           {dsum_sql("l_extendedprice * (1 - l_discount)", 2)} AS sum_disc_price,
           {davg_sql("l_quantity")} AS avg_qty,
           count(DISTINCT l_partkey) AS n_parts,
           count(*) AS count_order
    FROM lineitem GROUP BY l_returnflag, l_linestatus
    ORDER BY l_returnflag, l_linestatus
    """,
)
def x4_agg_tpch_q1(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hash aggregation with partial (map-side) + final phases and a
    distinct aggregate (TPC-H Q1 shape). Catalyst plans partial_sum before
    the shuffle — the map-side combine that matters at 100 TB."""
    li = load(spark, sf_dir, "lineitem")
    return (
        li.groupBy("l_returnflag", "l_linestatus")
        .agg(
            dsum(F.col("l_quantity"), 2).alias("sum_qty"),
            dsum(F.col("l_extendedprice"), 2).alias("sum_base_price"),
            dsum(F.col("l_extendedprice") * (1 - F.col("l_discount")), 2).alias(
                "sum_disc_price"
            ),
            dround(
                F.sum(F.col("l_quantity").cast("decimal(38,6)")).cast("double")
                / F.count(F.lit(1)),
                4,
            ).alias("avg_qty"),
            F.countDistinct("l_partkey").alias("n_parts"),
            F.count(F.lit(1)).alias("count_order"),
        )
        .orderBy("l_returnflag", "l_linestatus")
    )


@query(
    "x6_rollup",
    oracle="""
    SELECT l_returnflag, l_linestatus, count(*) AS cnt
    FROM lineitem GROUP BY ROLLUP(l_returnflag, l_linestatus)
    ORDER BY l_returnflag NULLS FIRST, l_linestatus NULLS FIRST
    """,
)
def x6_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load(spark, sf_dir, "lineitem")
    return (
        li.rollup("l_returnflag", "l_linestatus")
        .agg(F.count(F.lit(1)).alias("cnt"))
        .orderBy(
            F.col("l_returnflag").asc_nulls_first(),
            F.col("l_linestatus").asc_nulls_first(),
        )
    )


@query(
    "x6b_cube",
    oracle="""
    SELECT o_orderstatus, o_orderpriority, count(*) AS cnt
    FROM orders GROUP BY CUBE(o_orderstatus, o_orderpriority)
    ORDER BY o_orderstatus NULLS FIRST, o_orderpriority NULLS FIRST
    """,
)
def x6b_cube(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load(spark, sf_dir, "orders")
    return (
        o.cube("o_orderstatus", "o_orderpriority")
        .agg(F.count(F.lit(1)).alias("cnt"))
        .orderBy(
            F.col("o_orderstatus").asc_nulls_first(),
            F.col("o_orderpriority").asc_nulls_first(),
        )
    )


# ---------------------------------------------------------------------------
# X7/X8 — window functions, sort/top-k.
# ---------------------------------------------------------------------------


_GS_SQL = """
    SELECT l_returnflag, l_linestatus, count(*) AS cnt,
           CAST(grouping(l_returnflag) AS INTEGER) AS g_rf,
           CAST(grouping(l_linestatus) AS INTEGER) AS g_ls
    FROM lineitem
    GROUP BY GROUPING SETS ((l_returnflag), (l_linestatus), ())
    ORDER BY l_returnflag NULLS FIRST, l_linestatus NULLS FIRST
"""


@query("x6c_grouping_sets", oracle=_GS_SQL)
def x6c_grouping_sets(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Explicit GROUPING SETS with grouping() markers (distinguishes 'NULL
    because aggregated away' from data NULLs) — via the SQL surface; the
    physical plan is the same Expand + partial/final aggregate as rollup."""
    register_views(spark, sf_dir)
    return spark.sql(_GS_SQL)


@query(
    "x7b_analytic_funcs",
    oracle=f"""
    SELECT o_orderkey,
           CAST(ntile(4) OVER w AS BIGINT) AS quartile,
           {dround_sql("percent_rank() OVER w", 6)} AS pr,
           {dround_sql("cume_dist() OVER w", 6)} AS cd,
           first_value(o_orderkey) OVER w AS first_key,
           lead(o_totalprice) OVER w AS next_price
    FROM orders
    WINDOW w AS (PARTITION BY o_orderstatus ORDER BY o_totalprice, o_orderkey)
    ORDER BY o_orderkey
    """,
)
def x7b_analytic_funcs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Analytic-function breadth: ntile / percent_rank / cume_dist /
    first_value / lead over a deterministic (price, key) ordering."""
    o = load(spark, sf_dir, "orders")
    w = Window.partitionBy("o_orderstatus").orderBy("o_totalprice", "o_orderkey")
    return o.select(
        "o_orderkey",
        F.ntile(4).over(w).cast("long").alias("quartile"),
        dround(F.percent_rank().over(w), 6).alias("pr"),
        dround(F.cume_dist().over(w), 6).alias("cd"),
        F.first("o_orderkey").over(w).alias("first_key"),
        F.lead("o_totalprice").over(w).alias("next_price"),
    ).orderBy("o_orderkey")


@query(
    "x7_window_rank_lag",
    oracle="""
    SELECT o_custkey, o_orderkey,
           CAST(row_number() OVER
             (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey) AS BIGINT) AS rn,
           lag(o_totalprice) OVER
             (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey) AS prev_price
    FROM orders ORDER BY o_custkey, rn
    """,
)
def x7_window_rank_lag(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load(spark, sf_dir, "orders")
    w = Window.partitionBy("o_custkey").orderBy("o_orderdate", "o_orderkey")
    return o.select(
        "o_custkey",
        "o_orderkey",
        F.row_number().over(w).cast("long").alias("rn"),
        F.lag("o_totalprice").over(w).alias("prev_price"),
    ).orderBy("o_custkey", "rn")


@query(
    "x8_topk",
    oracle="""
    SELECT o_orderkey, o_totalprice FROM orders
    ORDER BY o_totalprice DESC, o_orderkey LIMIT 10
    """,
)
def x8_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sort + limit => TakeOrderedAndProject: per-partition top-k then a
    k-row merge on the driver — no global sort at any scale."""
    o = load(spark, sf_dir, "orders")
    return (
        o.select("o_orderkey", "o_totalprice")
        .orderBy(F.col("o_totalprice").desc(), F.col("o_orderkey"))
        .limit(10)
    )


# ---------------------------------------------------------------------------
# X9 — set operations.
# ---------------------------------------------------------------------------


@query(
    "x9_intersect",
    oracle="""
    SELECT c_nationkey AS nationkey FROM customer
    INTERSECT SELECT s_nationkey FROM supplier ORDER BY nationkey
    """,
)
def x9_intersect(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = load(spark, sf_dir, "customer").select(F.col("c_nationkey").alias("nationkey"))
    s = load(spark, sf_dir, "supplier").select(F.col("s_nationkey").alias("nationkey"))
    return c.intersect(s).orderBy("nationkey")


@query(
    "x9b_union_all_grouped",
    oracle="""
    SELECT nationkey, count(*) AS cnt FROM (
      SELECT c_nationkey AS nationkey FROM customer
      UNION ALL SELECT s_nationkey FROM supplier
    ) GROUP BY nationkey ORDER BY nationkey
    """,
)
def x9b_union_all_grouped(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = load(spark, sf_dir, "customer").select(F.col("c_nationkey").alias("nationkey"))
    s = load(spark, sf_dir, "supplier").select(F.col("s_nationkey").alias("nationkey"))
    return (
        c.unionByName(s)
        .groupBy("nationkey")
        .agg(F.count(F.lit(1)).alias("cnt"))
        .orderBy("nationkey")
    )


@query(
    "x9c_except",
    oracle="""
    SELECT c_custkey AS custkey FROM customer
    EXCEPT SELECT o_custkey FROM orders ORDER BY custkey
    """,
)
def x9c_except(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = load(spark, sf_dir, "customer").select(F.col("c_custkey").alias("custkey"))
    o = load(spark, sf_dir, "orders").select(F.col("o_custkey").alias("custkey"))
    return c.exceptAll(o.distinct()).distinct().orderBy("custkey")


# ---------------------------------------------------------------------------
# X10 — scalar function surface (string/math/date).
# ---------------------------------------------------------------------------


@query(
    "x10a_string_math_funcs",
    oracle="""
    SELECT p_partkey, upper(p_brand) AS brand_u, lower(p_type) AS type_l,
           FLOOR(p_retailprice * 10 + 0.5) / 10 AS price_r1,
           abs(p_size - 25) AS size_dist
    FROM part ORDER BY p_partkey
    """,
)
def x10a_string_math_funcs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """String/math scalar functions. Rounding spelled as FLOOR(x*10+0.5)/10
    in both engines — identical double arithmetic, no rounding-mode
    ambiguity at .x5 boundaries."""
    p = load(spark, sf_dir, "part")
    return p.select(
        "p_partkey",
        F.upper("p_brand").alias("brand_u"),
        F.lower("p_type").alias("type_l"),
        (F.floor(F.col("p_retailprice") * 10 + 0.5) / 10).alias("price_r1"),
        F.abs(F.col("p_size") - 25).alias("size_dist"),
    ).orderBy("p_partkey")


@query(
    "x10b_doc_length",
    oracle="""
    SELECT doc_id, length(text) AS text_len, lang FROM documents ORDER BY doc_id
    """,
)
def x10b_doc_length(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = load(spark, sf_dir, "documents")
    return d.select(
        "doc_id", F.length("text").cast("long").alias("text_len"), "lang"
    ).orderBy("doc_id")


@query(
    "x10d_string_funcs",
    oracle="""
    SELECT p_partkey,
           lpad(p_brand, 12, '*') AS brand_pad,
           translate(p_type, 'aeiou', 'AEIOU') AS type_tr,
           regexp_extract(p_name, '^(\\w+)', 1) AS first_word,
           p_type LIKE '%STEEL%' AS is_steel,
           trim(concat(' ', p_brand, ' ')) AS trimmed
    FROM part ORDER BY p_partkey
    """,
)
def x10d_string_funcs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Extended string-function surface: pad/translate/regexp/LIKE/trim."""
    p = load(spark, sf_dir, "part")
    return p.select(
        "p_partkey",
        F.lpad("p_brand", 12, "*").alias("brand_pad"),
        F.translate("p_type", "aeiou", "AEIOU").alias("type_tr"),
        F.regexp_extract("p_name", r"^(\w+)", 1).alias("first_word"),
        F.col("p_type").like("%STEEL%").alias("is_steel"),
        F.trim(F.concat(F.lit(" "), F.col("p_brand"), F.lit(" "))).alias("trimmed"),
    ).orderBy("p_partkey")


@query(
    "x10e_array_funcs",
    oracle="""
    WITH t AS (SELECT doc_id, string_split(text, ' ') AS toks FROM documents)
    SELECT doc_id,
           CAST(len(toks) AS INTEGER) AS n,
           list_contains(toks, 'spark') AS has_spark,
           CAST(list_position(toks, 'the') AS INTEGER) AS first_the,
           array_to_string(toks[1:3], '_') AS head3,
           array_to_string(list_reverse_sort(list_distinct(toks))[1:2], '|') AS top2_rev
    FROM t ORDER BY doc_id
    """,
)
def x10e_array_funcs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Array/collection function surface: size, contains, position, slice,
    sort — all JVM-side higher-order expressions."""
    d = load(spark, sf_dir, "documents")
    toks = F.split("text", " ")
    return d.select(
        "doc_id",
        F.size(toks).alias("n"),
        F.array_contains(toks, "spark").alias("has_spark"),
        F.array_position(toks, "the").cast("int").alias("first_the"),
        F.concat_ws("_", F.slice(toks, 1, 3)).alias("head3"),
        F.concat_ws(
            "|", F.slice(F.reverse(F.array_sort(F.array_distinct(toks))), 1, 2)
        ).alias("top2_rev"),
    ).orderBy("doc_id")


_CLICK_CELL = dround_sql(
    "CAST(SUM(CAST(CASE WHEN event_type = 'click' THEN value END AS DECIMAL(38,6))) AS DOUBLE)", 4
)
_VIEW_CELL = dround_sql(
    "CAST(SUM(CAST(CASE WHEN event_type = 'view' THEN value END AS DECIMAL(38,6))) AS DOUBLE)", 4
)


@query(
    "x17b_unpivot",
    oracle=f"""
    WITH w AS (
      SELECT user_id,
             {_CLICK_CELL} AS click,
             {_VIEW_CELL} AS view
      FROM events GROUP BY user_id
    )
    SELECT user_id, metric, amount
    FROM w UNPIVOT INCLUDE NULLS (amount FOR metric IN (click, view))
    ORDER BY user_id, metric
    """,
)
def x17b_unpivot(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Unpivot (melt): wide metric matrix back to long form — the inverse
    of x17, via the native unpivot operator (Expand, no shuffle)."""
    events = load(spark, sf_dir, "events")
    wide = events.groupBy("user_id").pivot("event_type", ["click", "view"]).agg(
        dsum(F.col("value"))
    )
    return (
        wide.unpivot("user_id", ["click", "view"], "metric", "amount")
        .orderBy("user_id", "metric")
    )


@query(
    "x19_histogram",
    oracle="""
    SELECT CAST(least(floor(o_totalprice / 60000), 9) AS INTEGER) AS bucket,
           count(*) AS cnt
    FROM orders GROUP BY bucket ORDER BY bucket
    """,
)
def x19_histogram(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Fixed-width histogram via integer bucket arithmetic (identical in
    both engines; width_bucket's edge semantics differ across systems)."""
    o = load(spark, sf_dir, "orders")
    bucket = F.least(F.floor(F.col("o_totalprice") / 60000), F.lit(9)).cast("int")
    return (
        o.groupBy(bucket.alias("bucket"))
        .agg(F.count(F.lit(1)).alias("cnt"))
        .orderBy("bucket")
    )


_SCALAR_SQL = """
    SELECT c_custkey, c_acctbal
    FROM customer
    WHERE c_acctbal > (SELECT CAST(SUM(CAST(c_acctbal AS DECIMAL(38,6))) AS DOUBLE)
                              / COUNT(*) FROM customer)
    ORDER BY c_custkey
"""


@query("x20_scalar_subquery", oracle=_SCALAR_SQL)
def x20_scalar_subquery(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Scalar subquery in a predicate (customers above the mean balance) —
    Catalyst plans the subquery once and broadcasts the scalar. Decimal-
    exact mean so both engines compare against the same threshold."""
    register_views(spark, sf_dir)
    return spark.sql(_SCALAR_SQL)


_Q3_SQL = f"""
    SELECT o_orderkey,
           {dsum_sql("l_extendedprice * (1 - l_discount)")} AS revenue,
           o_orderdate, o_orderpriority
    FROM customer, orders, lineitem
    WHERE c_mktsegment = 'BUILDING' AND c_custkey = o_custkey
      AND l_orderkey = o_orderkey
    GROUP BY o_orderkey, o_orderdate, o_orderpriority
    ORDER BY revenue DESC, o_orderkey LIMIT 10
"""


@query("x16_sql_api_q3", oracle=_Q3_SQL)
def x16_sql_api_q3(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The spark.sql entry point over registered views (TPC-H Q3 shape):
    the engine's relational surface is reachable as ANSI SQL text, not just
    the DataFrame API — same Catalyst plan either way."""
    register_views(spark, sf_dir)
    return spark.sql(_Q3_SQL)


@query(
    "x10c_date_funcs",
    oracle="""
    SELECT o_orderkey,
           CAST(year(o_orderdate) AS INTEGER) AS yr,
           CAST(month(o_orderdate) AS INTEGER) AS mo,
           date_trunc('month', o_orderdate) AS month_start,
           CAST(datediff('day', TIMESTAMP '1995-01-01', o_orderdate) AS BIGINT) AS days_since
    FROM orders ORDER BY o_orderkey
    """,
)
def x10c_date_funcs(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load(spark, sf_dir, "orders")
    return o.select(
        "o_orderkey",
        F.year("o_orderdate").cast("int").alias("yr"),
        F.month("o_orderdate").cast("int").alias("mo"),
        F.date_trunc("month", F.col("o_orderdate")).alias("month_start"),
        F.datediff(F.col("o_orderdate"), F.lit("1995-01-01").cast("date"))
        .cast("long")
        .alias("days_since"),
    ).orderBy("o_orderkey")


@query(
    "x21_asof_join",
    oracle="""
    WITH w AS (
      SELECT event_id, user_id, event_type, ts,
             last_value(CASE WHEN event_type = 'purchase' THEN event_id END IGNORE NULLS)
               OVER (PARTITION BY user_id ORDER BY ts, event_id
                     ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS last_purchase_id
      FROM events
    )
    SELECT event_id, user_id, ts, last_purchase_id
    FROM w WHERE event_type = 'click' ORDER BY event_id
    """,
)
def x21_asof_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """AS-OF join: each click picks the user's most recent prior-or-same-tick
    purchase. Implemented as ONE running window over the unioned event-time
    order (``last(..., ignorenulls)`` with rows-unbounded-preceding) — the
    scalable as-of plan: a single per-key sort-shuffle, no range-condition
    join explosion, no per-row probe. DuckDB's native ASOF JOIN is the
    oracle-side shorthand for the same semantics; the oracle mirrors the
    window form so tie-breaking (ts, then event_id) is bit-identical."""
    ev = load(spark, sf_dir, "events")
    w = (
        Window.partitionBy("user_id")
        .orderBy("ts", "event_id")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    last_purchase = F.last(
        F.when(F.col("event_type") == "purchase", F.col("event_id")), ignorenulls=True
    ).over(w)
    return (
        ev.select("event_id", "user_id", "event_type", "ts",
                  last_purchase.alias("last_purchase_id"))
        .filter(F.col("event_type") == "click")
        .select("event_id", "user_id", "ts", "last_purchase_id")
        .orderBy("event_id")
    )


@query(
    "x22_range_join",
    oracle="""
    WITH buckets AS (
      SELECT CAST(d AS TIMESTAMP) AS start_ts,
             CAST(d AS TIMESTAMP) + INTERVAL 1 DAY AS end_ts
      FROM (SELECT unnest(generate_series(DATE '2024-01-01', DATE '2024-01-31',
                                          INTERVAL 1 DAY)) AS d)
    )
    SELECT b.start_ts AS day_start, CAST(count(e.event_id) AS BIGINT) AS n_events,
           CAST(count(DISTINCT e.user_id) AS BIGINT) AS n_users
    FROM buckets b LEFT JOIN events e ON e.ts >= b.start_ts AND e.ts < b.end_ts
    GROUP BY b.start_ts ORDER BY day_start
    """,
)
def x22_range_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """RANGE join: events matched into half-open time intervals with NO equi
    key — the generic interval-overlap shape (maintenance windows, price
    epochs, sensor calibration ranges). The interval side is tiny, so the
    right physical plan is a broadcast nested-loop with the range predicate
    evaluated stream-side, which is exactly what Catalyst picks here; at
    100 TB the events side still never shuffles."""
    ev = load(spark, sf_dir, "events")
    buckets = spark.sql(
        "SELECT s AS start_ts, s + INTERVAL 1 DAY AS end_ts FROM ("
        "SELECT explode(sequence(TIMESTAMP '2024-01-01', TIMESTAMP '2024-01-31', "
        "INTERVAL 1 DAY)) AS s)"
    )
    joined = F.broadcast(buckets).join(
        ev, (F.col("ts") >= F.col("start_ts")) & (F.col("ts") < F.col("end_ts")), "left"
    )
    return (
        joined.groupBy(F.col("start_ts").alias("day_start"))
        .agg(
            F.count("event_id").alias("n_events"),
            F.countDistinct("user_id").cast("long").alias("n_users"),
        )
        .orderBy("day_start")
    )


@query(
    "x23_percentiles",
    oracle=f"""
    SELECT event_type,
           {dround_sql("quantile_cont(value, 0.5)", 4)} AS p50,
           {dround_sql("quantile_cont(value, 0.9)", 4)} AS p90,
           {dround_sql("quantile_cont(value, 0.99)", 4)} AS p99
    FROM events GROUP BY event_type ORDER BY event_type
    """,
)
def x23_percentiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact linear-interpolation percentiles per group (Spark `percentile`
    == DuckDB `quantile_cont`). Exact percentile is a per-group sort — fine
    up to huge groups; at 100 TB switch callers to `percentile_approx`
    (t-digest sketch, mergeable map-side) and accept the error band the X5
    tolerance test demonstrates."""
    ev = load(spark, sf_dir, "events")
    return (
        ev.groupBy("event_type")
        .agg(
            dround(F.expr("percentile(value, 0.5)"), 4).alias("p50"),
            dround(F.expr("percentile(value, 0.9)"), 4).alias("p90"),
            dround(F.expr("percentile(value, 0.99)"), 4).alias("p99"),
        )
        .orderBy("event_type")
    )


@query(
    "x27_salted_skew_join",
    oracle=f"""
    SELECT s_name,
           {dsum_sql("l_quantity")} AS sum_qty,
           CAST(COUNT(*) AS BIGINT) AS n_items
    FROM (SELECT CASE WHEN l_orderkey % 2 = 0 THEN 1 ELSE l_suppkey END AS sk,
                 l_quantity
          FROM lineitem) l
    JOIN supplier ON s_suppkey = sk
    GROUP BY s_name ORDER BY s_name
    """,
)
def x27_salted_skew_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hot-key join through ``salted_join`` (functions/skew.py) — the
    pathological-skew plan AQE can't fix (one key larger than an executor).
    Half of lineitem is funneled onto supplier key 1 (the fabricated hot
    key); the salt spreads that key's rows over 8 reducers while the oracle
    is the PLAIN join — salting must never change results. Salt-spread is
    plan-asserted in tests/test_scale_patterns.py."""
    from ..functions.skew import salted_join

    li = load(spark, sf_dir, "lineitem").select(
        F.when(F.col("l_orderkey") % 2 == 0, F.lit(1))
        .otherwise(F.col("l_suppkey"))
        .alias("sk"),
        "l_quantity",
    )
    sup = load(spark, sf_dir, "supplier").select(
        F.col("s_suppkey").alias("sk"), "s_name"
    )
    joined = salted_join(li, sup, "sk", n_salts=8)
    return (
        joined.groupBy("s_name")
        .agg(
            dsum(F.col("l_quantity")).alias("sum_qty"),
            F.count(F.lit(1)).alias("n_items"),
        )
        .orderBy("s_name")
    )


@query(
    "x34_topk_per_group",
    oracle="""
    SELECT o_custkey, o_orderkey, o_totalprice
    FROM (SELECT o_custkey, o_orderkey, o_totalprice,
                 row_number() OVER (PARTITION BY o_custkey
                                    ORDER BY o_totalprice DESC, o_orderkey) AS rn
          FROM orders)
    WHERE rn <= 3 ORDER BY o_custkey, o_totalprice DESC, o_orderkey
    """,
)
def x34_topk_per_group(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-k per group (each customer's 3 largest orders) — the grouped
    twin of x8's global TakeOrderedAndProject. The rank window partitions
    by the group key, so at scale every group sorts independently inside
    its hash partition (WindowGroupLimit pushes the k-limit below the sort
    in Spark 3.5+ — no group materializes more than k rows per partition).
    Ties broken by key for determinism."""
    o = load(spark, sf_dir, "orders")
    w = Window.partitionBy("o_custkey").orderBy(
        F.col("o_totalprice").desc(), "o_orderkey"
    )
    return (
        o.select("o_custkey", "o_orderkey", "o_totalprice",
                 F.row_number().over(w).alias("rn"))
        .filter(F.col("rn") <= 3)
        .drop("rn")
        .orderBy("o_custkey", F.col("o_totalprice").desc(), "o_orderkey")
    )


@query(
    "x45_returned_revenue_q10",
    oracle=f"""
    SELECT c_custkey, c_name, c_acctbal, n_name,
           {dsum_sql("l_extendedprice * (1 - l_discount)")} AS revenue
    FROM customer JOIN orders ON c_custkey = o_custkey
    JOIN lineitem ON o_orderkey = l_orderkey
    JOIN nation ON c_nationkey = n_nationkey
    WHERE l_returnflag = 'R'
    GROUP BY c_custkey, c_name, c_acctbal, n_name
    ORDER BY revenue DESC, c_custkey LIMIT 20
    """,
)
def x45_returned_revenue_q10(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q10 shape: returned-item revenue per customer, top 20 — the
    'who should we call' report. Plan: returnflag filter pushed into the
    lineitem scan, nation broadcast, two shuffle joins on the fact keys,
    partial+final agg, TakeOrderedAndProject for the limit (no global
    sort). Deterministic top-20: revenue rounds via the decimal trick and
    c_custkey breaks ties totally."""
    c = load(spark, sf_dir, "customer")
    o = load(spark, sf_dir, "orders")
    li = load(spark, sf_dir, "lineitem")
    n = load(spark, sf_dir, "nation")
    rev = dsum((F.col("l_extendedprice") * (1 - F.col("l_discount"))).cast("double"))
    return (
        c.join(o, c["c_custkey"] == o["o_custkey"])
        .join(
            li.filter(F.col("l_returnflag") == "R"),
            F.col("o_orderkey") == li["l_orderkey"],
        )
        .join(F.broadcast(n), c["c_nationkey"] == n["n_nationkey"])
        .groupBy("c_custkey", "c_name", "c_acctbal", "n_name")
        .agg(rev.alias("revenue"))
        .orderBy(F.desc("revenue"), "c_custkey")
        .limit(20)
    )


@query(
    "x46_large_orders_q18",
    oracle=f"""
    WITH big AS (
      SELECT l_orderkey, {dsum_sql("l_quantity")} AS sum_qty
      FROM lineitem GROUP BY l_orderkey HAVING {dsum_sql("l_quantity")} > 150
    )
    SELECT c_custkey, o_orderkey, o_totalprice, sum_qty
    FROM big JOIN orders ON l_orderkey = o_orderkey
    JOIN customer ON o_custkey = c_custkey
    ORDER BY o_totalprice DESC, o_orderkey LIMIT 100
    """,
)
def x46_large_orders_q18(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q18 shape: large-volume orders (HAVING over a fact-table agg,
    then joins back to the dimensions). The HAVING agg shrinks lineitem to
    qualifying orderkeys BEFORE any join — the aggregate-then-join order
    that keeps the join input |qualifying orders|, not |lineitem|."""
    c = load(spark, sf_dir, "customer")
    o = load(spark, sf_dir, "orders")
    li = load(spark, sf_dir, "lineitem")
    big = (
        li.groupBy("l_orderkey")
        .agg(dsum(F.col("l_quantity")).alias("sum_qty"))
        .filter(F.col("sum_qty") > 150)
    )
    return (
        big.join(o, big["l_orderkey"] == o["o_orderkey"])
        .join(c, o["o_custkey"] == c["c_custkey"])
        .select("c_custkey", "o_orderkey", "o_totalprice", "sum_qty")
        .orderBy(F.desc("o_totalprice"), "o_orderkey")
        .limit(100)
    )


# ---------------------------------------------------------------------------
# X47-X52 — correlated-subquery TPC-H shapes (Q4/Q21/Q22/Q15/Q16/Q17).
# The fixture schema has no l_commitdate/l_receiptdate, so "late" is
# l_shipdate > o_orderdate + 60 days throughout; every float boundary
# comparison is cross-multiplied into exact DECIMAL/BIGINT arithmetic so
# set membership can never flip on a 1-ulp engine difference.
# ---------------------------------------------------------------------------


@query(
    "x47_priority_check_q4",
    oracle="""
    SELECT o_orderpriority, CAST(COUNT(*) AS BIGINT) AS n_orders
    FROM orders o
    WHERE o.o_orderdate >= TIMESTAMP '1997-01-01'
      AND o.o_orderdate < TIMESTAMP '1997-07-01'
      AND EXISTS (SELECT 1 FROM lineitem l
                  WHERE l.l_orderkey = o.o_orderkey
                    AND l.l_shipdate > o.o_orderdate + INTERVAL 60 DAY)
    GROUP BY o_orderpriority ORDER BY o_orderpriority
    """,
)
def x47_priority_check_q4(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q4 shape: order-priority checking — count orders in a window
    that had at least one late-shipped line. The correlated EXISTS
    decorrelates to a LEFT SEMI join on the order key with the lateness
    predicate as a join-side condition: one shuffle on l_orderkey, the
    date-window filter pushed into the orders scan, and the semi join
    short-circuits per key (no row multiplication before the agg)."""
    o = load(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= F.lit("1997-01-01").cast("timestamp"))
        & (F.col("o_orderdate") < F.lit("1997-07-01").cast("timestamp"))
    )
    li = load(spark, sf_dir, "lineitem")
    late = li["l_shipdate"] > F.col("o_orderdate") + F.expr("INTERVAL 60 DAYS")
    return (
        o.join(li, (o["o_orderkey"] == li["l_orderkey"]) & late, "left_semi")
        .groupBy("o_orderpriority")
        .agg(F.count(F.lit(1)).alias("n_orders"))
        .orderBy("o_orderpriority")
    )


@query(
    "x48_suppliers_kept_waiting_q21",
    oracle="""
    WITH base AS (
      SELECT l.l_orderkey, l.l_suppkey,
             l.l_shipdate > o.o_orderdate + INTERVAL 60 DAY AS late
      FROM lineitem l JOIN orders o ON l.l_orderkey = o.o_orderkey
      WHERE o.o_orderstatus = 'F'
    ),
    cand AS (SELECT DISTINCT l_orderkey, l_suppkey FROM base WHERE late)
    SELECT s.s_name, CAST(COUNT(*) AS BIGINT) AS numwait
    FROM cand c JOIN supplier s ON c.l_suppkey = s.s_suppkey
    WHERE EXISTS (SELECT 1 FROM base b
                  WHERE b.l_orderkey = c.l_orderkey
                    AND b.l_suppkey <> c.l_suppkey)
      AND NOT EXISTS (SELECT 1 FROM base b
                      WHERE b.l_orderkey = c.l_orderkey
                        AND b.l_suppkey <> c.l_suppkey AND b.late)
    GROUP BY s.s_name ORDER BY numwait DESC, s.s_name LIMIT 10
    """,
)
def x48_suppliers_kept_waiting_q21(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q21 shape: suppliers who were the SOLE late shipper on
    multi-supplier finished orders. The two correlated subqueries
    decorrelate to one LEFT SEMI (some other supplier participated) and
    one LEFT ANTI (no other supplier was late) against the same derived
    ``base`` — all three joins hash on l_orderkey, so at scale they run in
    one partitioning (no re-shuffle between the semi and anti stages);
    supplier is a broadcast dim. DISTINCT before the joins keeps the
    candidate side |late (order,supp) pairs|, not |lineitem|."""
    o = load(spark, sf_dir, "orders").filter(F.col("o_orderstatus") == "F")
    li = load(spark, sf_dir, "lineitem")
    s = load(spark, sf_dir, "supplier")
    base = (
        li.join(o, li["l_orderkey"] == o["o_orderkey"])
        .select(
            "l_orderkey",
            "l_suppkey",
            (F.col("l_shipdate") > F.col("o_orderdate") + F.expr("INTERVAL 60 DAYS")).alias("late"),
        )
    )
    cand = base.filter("late").select("l_orderkey", "l_suppkey").distinct()
    other = base.select(
        F.col("l_orderkey").alias("b_orderkey"), F.col("l_suppkey").alias("b_suppkey"), "late"
    )
    kept = (
        cand.join(
            other,
            (F.col("l_orderkey") == F.col("b_orderkey"))
            & (F.col("l_suppkey") != F.col("b_suppkey")),
            "left_semi",
        )
        .join(
            other.filter("late"),
            (F.col("l_orderkey") == F.col("b_orderkey"))
            & (F.col("l_suppkey") != F.col("b_suppkey")),
            "left_anti",
        )
    )
    return (
        kept.join(F.broadcast(s), kept["l_suppkey"] == s["s_suppkey"])
        .groupBy("s_name")
        .agg(F.count(F.lit(1)).alias("numwait"))
        .orderBy(F.desc("numwait"), "s_name")
        .limit(10)
    )


@query(
    "x49_dormant_rich_customers_q22",
    oracle="""
    WITH pos AS (SELECT SUM(CAST(c_acctbal AS DECIMAL(38,6))) AS s,
                        CAST(COUNT(*) AS BIGINT) AS n
                 FROM customer WHERE c_acctbal > 0)
    SELECT c_mktsegment, CAST(COUNT(*) AS BIGINT) AS n_custs,
           SUM(CAST(c_acctbal AS DECIMAL(38,6))) AS total_bal
    FROM customer c CROSS JOIN pos
    WHERE CAST(c.c_acctbal AS DECIMAL(38,6)) * pos.n > pos.s
      AND NOT EXISTS (SELECT 1 FROM orders o
                      WHERE o.o_custkey = c.c_custkey
                        AND o.o_orderdate >= TIMESTAMP '2000-01-01')
    GROUP BY c_mktsegment ORDER BY c_mktsegment
    """,
)
def x49_dormant_rich_customers_q22(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q22 shape adapted to the fixture (every customer has SOME
    order, so 'no orders at all' is empty): above-average-balance
    customers with no RECENT order. The scalar AVG subquery broadcasts as
    a 1-row cross join; the above-average test cross-multiplies
    (bal * n > sum) in exact DECIMAL so the boundary can't flip on a
    float division ulp; the NOT EXISTS decorrelates to a LEFT ANTI join
    against date-filtered orders (filter pushed into the scan — the anti
    side is |recent orders|, not |orders|)."""
    c = load(spark, sf_dir, "customer")
    o = load(spark, sf_dir, "orders").filter(
        F.col("o_orderdate") >= F.lit("2000-01-01").cast("timestamp")
    )
    pos = (
        c.filter(F.col("c_acctbal") > 0)
        .agg(
            F.sum(F.col("c_acctbal").cast("decimal(38,6)")).alias("s"),
            F.count(F.lit(1)).alias("n"),
        )
    )
    return (
        c.crossJoin(F.broadcast(pos))  # 1-row scalar
        .filter(F.col("c_acctbal").cast("decimal(38,6)") * F.col("n") > F.col("s"))
        .join(o, c["c_custkey"] == o["o_custkey"], "left_anti")
        .groupBy("c_mktsegment")
        .agg(
            F.count(F.lit(1)).alias("n_custs"),
            F.sum(F.col("c_acctbal").cast("decimal(38,6)")).alias("total_bal"),
        )
        .orderBy("c_mktsegment")
    )


@query(
    "x50_top_supplier_q15",
    oracle=f"""
    WITH rev AS (
      SELECT l_suppkey,
             SUM(CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(38,6))) AS r
      FROM lineitem
      WHERE l_shipdate >= TIMESTAMP '1997-01-01'
        AND l_shipdate < TIMESTAMP '1997-04-01'
      GROUP BY l_suppkey)
    SELECT s_suppkey, s_name, {dround_sql("CAST(r AS DOUBLE)")} AS total_revenue
    FROM supplier JOIN rev ON s_suppkey = l_suppkey
    WHERE r = (SELECT MAX(r) FROM rev)
    ORDER BY s_suppkey
    """,
)
def x50_top_supplier_q15(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q15 shape: the revenue view + 'supplier(s) at the max'. The
    view aggregates lineitem once (ship-window filter pushed to the scan);
    the scalar MAX broadcasts back over the tiny aggregated view (|rev| =
    |suppliers|), so lineitem is scanned exactly once. Revenue accumulates
    in DECIMAL(38,6), making the r = MAX(r) equality exact — the classic
    Q15 float-equality trap never fires."""
    li = load(spark, sf_dir, "lineitem")
    s = load(spark, sf_dir, "supplier")
    rev = (
        li.filter(
            (F.col("l_shipdate") >= F.lit("1997-01-01").cast("timestamp"))
            & (F.col("l_shipdate") < F.lit("1997-04-01").cast("timestamp"))
        )
        .groupBy("l_suppkey")
        .agg(
            F.sum(
                (F.col("l_extendedprice") * (1 - F.col("l_discount"))).cast(
                    "decimal(38,6)"
                )
            ).alias("r")
        )
    )
    mx = rev.agg(F.max("r").alias("mr"))
    return (
        s.join(rev, s["s_suppkey"] == rev["l_suppkey"])
        .crossJoin(F.broadcast(mx))
        .filter(F.col("r") == F.col("mr"))
        .select("s_suppkey", "s_name", dround(F.col("r").cast("double")).alias("total_revenue"))
        .orderBy("s_suppkey")
    )


@query(
    "x51_supplier_count_q16",
    oracle="""
    SELECT p_brand, p_size, CAST(COUNT(DISTINCT l_suppkey) AS BIGINT) AS n_supp
    FROM part JOIN lineitem ON p_partkey = l_partkey
    WHERE p_brand <> 'Brand#45' AND p_size IN (1, 4, 9, 14, 19, 23, 36, 45)
      AND l_suppkey NOT IN (SELECT s_suppkey FROM supplier WHERE s_acctbal < 0)
    GROUP BY p_brand, p_size ORDER BY n_supp DESC, p_brand, p_size
    """,
)
def x51_supplier_count_q16(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q16 shape (partsupp stood in by lineitem's part-supplier
    pairs): distinct supplier count per part attribute, excluding an
    unwanted supplier set. The NOT IN subquery decorrelates to a LEFT
    ANTI against the (tiny, broadcast) negative-balance supplier list —
    s_suppkey is non-null in the fixture, so anti-join and NOT IN
    semantics coincide; the part filters prune before the fact join."""
    p = load(spark, sf_dir, "part").filter(
        (F.col("p_brand") != "Brand#45")
        & F.col("p_size").isin(1, 4, 9, 14, 19, 23, 36, 45)
    )
    li = load(spark, sf_dir, "lineitem")
    bad = load(spark, sf_dir, "supplier").filter(F.col("s_acctbal") < 0).select(
        F.col("s_suppkey").alias("l_suppkey")
    )
    return (
        li.join(bad, "l_suppkey", "left_anti")
        .join(F.broadcast(p), li["l_partkey"] == p["p_partkey"])
        .groupBy("p_brand", "p_size")
        .agg(F.countDistinct("l_suppkey").alias("n_supp"))
        .orderBy(F.desc("n_supp"), "p_brand", "p_size")
    )


@query(
    "x52_small_qty_revenue_q17",
    oracle=f"""
    WITH pa AS (
      SELECT l_partkey AS pk,
             SUM(CAST(l_quantity AS DECIMAL(38,6))) AS sq,
             CAST(COUNT(*) AS BIGINT) AS n
      FROM lineitem GROUP BY l_partkey)
    SELECT {dround_sql("CAST(SUM(CAST(l_extendedprice AS DECIMAL(38,6))) AS DOUBLE) / 7.0")} AS avg_yearly
    FROM lineitem JOIN part ON p_partkey = l_partkey
    JOIN pa ON pa.pk = l_partkey
    WHERE p_brand = 'Brand#23'
      AND CAST(l_quantity AS DECIMAL(38,6)) * 5 * n < sq
    """,
)
def x52_small_qty_revenue_q17(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q17 shape: revenue lost to small-quantity orders. The
    correlated 0.2*AVG(l_quantity) subquery decorrelates to a per-part
    aggregate joined back to lineitem — both sides hash on l_partkey, one
    shuffle. The quantity threshold cross-multiplies (qty*5*n < sum) in
    exact DECIMAL/BIGINT so the 0.2*avg boundary is ulp-proof; the brand
    filter broadcasts part to prune before the agg join."""
    li = load(spark, sf_dir, "lineitem")
    p = load(spark, sf_dir, "part").filter(F.col("p_brand") == "Brand#23")
    pa = li.groupBy(F.col("l_partkey").alias("pk")).agg(
        F.sum(F.col("l_quantity").cast("decimal(38,6)")).alias("sq"),
        F.count(F.lit(1)).alias("n"),
    )
    return (
        li.join(F.broadcast(p), li["l_partkey"] == p["p_partkey"])
        .join(pa, li["l_partkey"] == pa["pk"])
        .filter(F.col("l_quantity").cast("decimal(38,6)") * 5 * F.col("n") < F.col("sq"))
        .agg(
            dround(
                F.sum(F.col("l_extendedprice").cast("decimal(38,6)")).cast("double")
                / 7.0
            ).alias("avg_yearly")
        )
    )


# ---------------------------------------------------------------------------
# X62-X68 — the remaining TPC-H shapes expressible on the fixture schema
# (Q6/Q7/Q8/Q9/Q13/Q14/Q19; the partsupp-dependent Q2/Q11/Q20 have no
# fixture analog). Revenue/profit always accumulates in DECIMAL(38,6).
# ---------------------------------------------------------------------------


@query(
    "x62_forecast_revenue_q6",
    oracle=f"""
    SELECT {dsum_sql("l_extendedprice * l_discount")} AS revenue
    FROM lineitem
    WHERE l_shipdate >= TIMESTAMP '1997-01-01'
      AND l_shipdate < TIMESTAMP '1998-01-01'
      AND l_discount BETWEEN 0.05 AND 0.07 AND l_quantity < 24
    """,
)
def x62_forecast_revenue_q6(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q6: the pure filter-and-sum probe — every predicate reaches
    the parquet scan (PushedFilters on date, discount range, quantity),
    then one partial+final global agg. The canonical 'is pushdown
    working' canary; at 100 TB this is an embarrassingly parallel scan
    whose cost is decided entirely by how much the filters prune."""
    li = load(spark, sf_dir, "lineitem")
    return li.filter(
        (F.col("l_shipdate") >= F.lit("1997-01-01").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1998-01-01").cast("timestamp"))
        & (F.col("l_discount") >= 0.05)
        & (F.col("l_discount") <= 0.07)
        & (F.col("l_quantity") < 24)
    ).agg(dsum(F.col("l_extendedprice") * F.col("l_discount")).alias("revenue"))


@query(
    "x63_volume_shipping_q7",
    oracle=f"""
    SELECT n1.n_name AS supp_nation, n2.n_name AS cust_nation,
           CAST(year(l_shipdate) AS INTEGER) AS l_year,
           {dsum_sql("l_extendedprice * (1 - l_discount)")} AS revenue
    FROM lineitem
    JOIN supplier ON s_suppkey = l_suppkey
    JOIN orders ON o_orderkey = l_orderkey
    JOIN customer ON c_custkey = o_custkey
    JOIN nation n1 ON n1.n_nationkey = s_nationkey
    JOIN nation n2 ON n2.n_nationkey = c_nationkey
    WHERE (n1.n_name = 'NATION_1' AND n2.n_name = 'NATION_2')
       OR (n1.n_name = 'NATION_2' AND n2.n_name = 'NATION_1')
    GROUP BY supp_nation, cust_nation, l_year
    ORDER BY supp_nation, cust_nation, l_year
    """,
)
def x63_volume_shipping_q7(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q7: bilateral trade volume between two nations per year. The
    two nation dims broadcast with their name filters applied BEFORE the
    fact joins, so the disjunctive nation-pair predicate prunes supplier
    and customer rows early; the two fact joins hash on the lineitem
    keys."""
    li = load(spark, sf_dir, "lineitem")
    s = load(spark, sf_dir, "supplier")
    o = load(spark, sf_dir, "orders")
    c = load(spark, sf_dir, "customer")
    n = load(spark, sf_dir, "nation")
    names = ("NATION_1", "NATION_2")
    n1 = n.filter(F.col("n_name").isin(*names)).select(
        F.col("n_nationkey").alias("k1"), F.col("n_name").alias("supp_nation")
    )
    n2 = n.filter(F.col("n_name").isin(*names)).select(
        F.col("n_nationkey").alias("k2"), F.col("n_name").alias("cust_nation")
    )
    return (
        li.join(s, li["l_suppkey"] == s["s_suppkey"])
        .join(o, li["l_orderkey"] == o["o_orderkey"])
        .join(c, o["o_custkey"] == c["c_custkey"])
        .join(F.broadcast(n1), F.col("s_nationkey") == F.col("k1"))
        .join(F.broadcast(n2), F.col("c_nationkey") == F.col("k2"))
        .filter(F.col("supp_nation") != F.col("cust_nation"))
        .groupBy(
            "supp_nation",
            "cust_nation",
            F.year("l_shipdate").cast("int").alias("l_year"),
        )
        .agg(
            dsum((F.col("l_extendedprice") * (1 - F.col("l_discount")))).alias(
                "revenue"
            )
        )
        .orderBy("supp_nation", "cust_nation", "l_year")
    )


@query(
    "x64_market_share_q8",
    oracle=f"""
    WITH v AS (
      SELECT CAST(year(o_orderdate) AS INTEGER) AS o_year,
             CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(38,6)) AS vol,
             n1.n_name AS supp_nation
      FROM lineitem
      JOIN supplier ON s_suppkey = l_suppkey
      JOIN orders ON o_orderkey = l_orderkey
      JOIN customer ON c_custkey = o_custkey
      JOIN nation n1 ON n1.n_nationkey = s_nationkey
      JOIN nation n2 ON n2.n_nationkey = c_nationkey
      JOIN region ON r_regionkey = n2.n_regionkey
      WHERE r_name = 'EUROPE')
    SELECT o_year,
           {dround_sql("CAST(SUM(CASE WHEN supp_nation = 'NATION_7' THEN vol ELSE 0 END) AS DOUBLE) / CAST(SUM(vol) AS DOUBLE)", 6)}
             AS mkt_share
    FROM v GROUP BY o_year ORDER BY o_year
    """,
)
def x64_market_share_q8(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q8: one supplier-nation's share of a region's customer
    revenue per year — the conditional-sum-over-sum ratio computed in ONE
    aggregation (no self-join): both numerator and denominator accumulate
    as decimal conditional sums in the same hash agg, the ratio divides
    two bit-identical doubles. Region/nation dims broadcast; the region
    filter prunes the customer side before the fact join."""
    li = load(spark, sf_dir, "lineitem")
    s = load(spark, sf_dir, "supplier")
    o = load(spark, sf_dir, "orders")
    c = load(spark, sf_dir, "customer")
    n = load(spark, sf_dir, "nation")
    r = load(spark, sf_dir, "region").filter(F.col("r_name") == "EUROPE")
    n1 = n.select(F.col("n_nationkey").alias("k1"), F.col("n_name").alias("supp_nation"))
    n2 = n.select(F.col("n_nationkey").alias("k2"), F.col("n_regionkey").alias("rg"))
    vol = (F.col("l_extendedprice") * (1 - F.col("l_discount"))).cast("decimal(38,6)")
    v = (
        li.join(s, li["l_suppkey"] == s["s_suppkey"])
        .join(o, li["l_orderkey"] == o["o_orderkey"])
        .join(c, o["o_custkey"] == c["c_custkey"])
        .join(F.broadcast(n1), F.col("s_nationkey") == F.col("k1"))
        .join(F.broadcast(n2), c["c_nationkey"] == F.col("k2"))
        .join(F.broadcast(r), F.col("rg") == r["r_regionkey"])
        .select(
            F.year("o_orderdate").cast("int").alias("o_year"),
            vol.alias("vol"),
            "supp_nation",
        )
    )
    return (
        v.groupBy("o_year")
        .agg(
            dround(
                F.sum(
                    F.when(F.col("supp_nation") == "NATION_7", F.col("vol")).otherwise(
                        F.lit(0).cast("decimal(38,6)")
                    )
                ).cast("double")
                / F.sum("vol").cast("double"),
                6,
            ).alias("mkt_share")
        )
        .orderBy("o_year")
    )


@query(
    "x65_product_profit_q9",
    oracle=f"""
    SELECT n_name AS nation, CAST(year(o_orderdate) AS INTEGER) AS o_year,
           {dsum_sql("l_extendedprice * (1 - l_discount) - 0.6 * p_retailprice * l_quantity")}
             AS profit
    FROM lineitem
    JOIN part ON p_partkey = l_partkey
    JOIN supplier ON s_suppkey = l_suppkey
    JOIN orders ON o_orderkey = l_orderkey
    JOIN nation ON n_nationkey = s_nationkey
    WHERE p_name LIKE '%gear%'
    GROUP BY n_name, o_year ORDER BY nation, o_year DESC
    """,
)
def x65_product_profit_q9(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q9 shape: per-nation-per-year profit on a part-name subset.
    The fixture has no partsupp, so supply cost is modeled as
    0.6 * p_retailprice (the SHAPE under test is the 4-way fact join +
    name-pattern part filter + amount expression, not the cost constant).
    Part filter broadcasts pre-join; profit accumulates in decimal."""
    li = load(spark, sf_dir, "lineitem")
    p = load(spark, sf_dir, "part").filter(F.col("p_name").like("%gear%"))
    s = load(spark, sf_dir, "supplier")
    o = load(spark, sf_dir, "orders")
    n = load(spark, sf_dir, "nation")
    amount = (
        F.col("l_extendedprice") * (1 - F.col("l_discount"))
        - 0.6 * F.col("p_retailprice") * F.col("l_quantity")
    )
    return (
        li.join(F.broadcast(p), li["l_partkey"] == p["p_partkey"])
        .join(F.broadcast(s), li["l_suppkey"] == s["s_suppkey"])
        .join(o, li["l_orderkey"] == o["o_orderkey"])
        .join(F.broadcast(n), s["s_nationkey"] == n["n_nationkey"])
        .groupBy(
            F.col("n_name").alias("nation"),
            F.year("o_orderdate").cast("int").alias("o_year"),
        )
        .agg(dsum(amount).alias("profit"))
        .orderBy("nation", F.desc("o_year"))
    )


@query(
    "x66_customer_distribution_q13",
    oracle="""
    WITH co AS (
      SELECT c_custkey, CAST(count(o_orderkey) AS BIGINT) AS c_count
      FROM customer LEFT JOIN orders
        ON c_custkey = o_custkey AND o_orderpriority <> '1-URGENT'
      GROUP BY c_custkey)
    SELECT c_count, CAST(count(*) AS BIGINT) AS custdist
    FROM co GROUP BY c_count ORDER BY custdist DESC, c_count DESC
    """,
)
def x66_customer_distribution_q13(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q13: how many customers placed k orders — INCLUDING k = 0,
    which forces the LEFT join with the priority predicate INSIDE the
    join condition (a WHERE would silently drop the zero-order
    customers). count(o_orderkey) counts only matched rows, the exact
    LEFT-join-count idiom; the second agg runs on the tiny per-customer
    counts."""
    c = load(spark, sf_dir, "customer")
    o = load(spark, sf_dir, "orders")
    co = (
        c.join(
            o,
            (c["c_custkey"] == o["o_custkey"])
            & (o["o_orderpriority"] != "1-URGENT"),
            "left",
        )
        .groupBy("c_custkey")
        .agg(F.count("o_orderkey").alias("c_count"))
    )
    return (
        co.groupBy("c_count")
        .agg(F.count(F.lit(1)).alias("custdist"))
        .orderBy(F.desc("custdist"), F.desc("c_count"))
    )


@query(
    "x67_promo_revenue_q14",
    oracle=f"""
    WITH v AS (
      SELECT CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(38,6)) AS vol,
             p_type
      FROM lineitem JOIN part ON p_partkey = l_partkey
      WHERE l_shipdate >= TIMESTAMP '1997-03-01'
        AND l_shipdate < TIMESTAMP '1997-04-01')
    SELECT {dround_sql("100.0 * CAST(SUM(CASE WHEN p_type = 'PROMO' THEN vol ELSE 0 END) AS DOUBLE) / CAST(SUM(vol) AS DOUBLE)", 6)}
             AS promo_revenue
    FROM v
    """,
)
def x67_promo_revenue_q14(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q14: promo-class revenue share in a month — the same
    one-agg conditional ratio as Q8 (numerator and denominator in one
    hash agg, never a self-join); ship-window filter pushed to the scan,
    part broadcast."""
    li = load(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= F.lit("1997-03-01").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1997-04-01").cast("timestamp"))
    )
    p = load(spark, sf_dir, "part")
    vol = (F.col("l_extendedprice") * (1 - F.col("l_discount"))).cast("decimal(38,6)")
    return (
        li.join(F.broadcast(p), li["l_partkey"] == p["p_partkey"])
        .select(vol.alias("vol"), "p_type")
        .agg(
            dround(
                F.lit(100.0)
                * F.sum(
                    F.when(F.col("p_type") == "PROMO", F.col("vol")).otherwise(
                        F.lit(0).cast("decimal(38,6)")
                    )
                ).cast("double")
                / F.sum("vol").cast("double"),
                6,
            ).alias("promo_revenue")
        )
    )


@query(
    "x68_disjunctive_revenue_q19",
    oracle=f"""
    SELECT {dsum_sql("l_extendedprice * (1 - l_discount)")} AS revenue
    FROM lineitem JOIN part ON p_partkey = l_partkey
    WHERE (p_brand = 'Brand#12' AND p_size BETWEEN 1 AND 5
           AND l_quantity >= 1 AND l_quantity <= 11)
       OR (p_brand = 'Brand#23' AND p_size BETWEEN 1 AND 10
           AND l_quantity >= 10 AND l_quantity <= 20)
       OR (p_brand = 'Brand#34' AND p_size BETWEEN 1 AND 15
           AND l_quantity >= 20 AND l_quantity <= 30)
    """,
)
def x68_disjunctive_revenue_q19(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q19: the disjunctive-predicate join (OR of three
    brand/size/quantity clauses spanning BOTH tables). Catalyst extracts
    the common single-table conjuncts from the OR — the part side prunes
    to the three brands and the lineitem side to the quantity envelope
    BEFORE the join — then applies the full disjunction post-join; the
    part side broadcasts."""
    li = load(spark, sf_dir, "lineitem")
    p = load(spark, sf_dir, "part")
    j = li.join(F.broadcast(p), li["l_partkey"] == p["p_partkey"])
    q, b, sz = F.col("l_quantity"), F.col("p_brand"), F.col("p_size")
    clause = (
        ((b == "Brand#12") & sz.between(1, 5) & q.between(1, 11))
        | ((b == "Brand#23") & sz.between(1, 10) & q.between(10, 20))
        | ((b == "Brand#34") & sz.between(1, 15) & q.between(20, 30))
    )
    return j.filter(clause).agg(
        dsum(F.col("l_extendedprice") * (1 - F.col("l_discount"))).alias("revenue")
    )


@query(
    "x75_asof_forward_tolerance",
    oracle="""
    WITH w AS (
      SELECT event_id, user_id, ts, event_type,
             min(CASE WHEN event_type = 'purchase'
                      THEN CAST(epoch_us(ts) AS HUGEINT) * 10000000 + event_id END)
               OVER (PARTITION BY user_id ORDER BY ts, event_id
                     ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING)
               AS nxt_key
      FROM events
    )
    SELECT event_id, user_id, ts,
           CASE WHEN nxt_key IS NOT NULL
                 AND nxt_key // 10000000 - epoch_us(ts) <= 3600000000
                THEN CAST(nxt_key % 10000000 AS BIGINT) END AS next_purchase_id,
           CASE WHEN nxt_key IS NOT NULL
                 AND nxt_key // 10000000 - epoch_us(ts) <= 3600000000
                THEN CAST((nxt_key // 10000000 - epoch_us(ts)) // 1000000 AS BIGINT)
           END AS secs_to_purchase
    FROM w WHERE event_type = 'click' ORDER BY event_id
    """,
)
def x75_asof_forward_tolerance(spark: SparkSession, sf_dir: str) -> DataFrame:
    """FORWARD as-of join with tolerance (pandas merge_asof
    direction='forward'): each click picks the user's NEXT purchase, but
    only within 1 hour — the time-to-convert attribution query. Same
    single-window as-of plan as x21 (one per-user sort-shuffle, no range
    join): the forward scan is a min over a (ts, id)-packed integer key
    on a CURRENT-TO-FOLLOWING frame; packing (epoch_us * 1e7 + event_id)
    into one exact DECIMAL(38,0) (HUGEINT in DuckDB — int64 would
    overflow) makes 'earliest (ts, id)' a plain integer min —
    engine-exact, and the tolerance check unpacks the same integer. At
    100 TB this stays one shuffle on user_id; tolerance is a map-side
    filter after the window, never a join predicate."""
    ev = load(spark, sf_dir, "events")
    w = (
        Window.partitionBy("user_id")
        .orderBy("ts", "event_id")
        .rowsBetween(Window.currentRow, Window.unboundedFollowing)
    )
    # pack (ts, id) into ONE exact 128-bit ordinal: int64 would overflow
    # (epoch_us * 1e7 ~ 1.7e22), DECIMAL(38,0) / HUGEINT holds it exactly
    pk = (
        F.unix_micros("ts").cast("decimal(38,0)") * F.lit(10_000_000)
        + F.col("event_id")
    )
    nxt = F.min(F.when(F.col("event_type") == "purchase", pk)).over(w)
    dt_us = F.floor(F.col("nxt_key") / 10_000_000) - F.unix_micros("ts")
    ok = F.col("nxt_key").isNotNull() & (dt_us <= 3_600_000_000)
    return (
        ev.select("event_id", "user_id", "event_type", "ts", nxt.alias("nxt_key"))
        .filter(F.col("event_type") == "click")
        .select(
            "event_id",
            "user_id",
            "ts",
            F.when(ok, F.pmod(F.col("nxt_key"), F.lit(10_000_000)).cast("long")).alias(
                "next_purchase_id"
            ),
            F.when(ok, F.floor(dt_us / 1_000_000).cast("long")).alias(
                "secs_to_purchase"
            ),
        )
        .orderBy("event_id")
    )


@query(
    "x158_view_purchase_attribution",
    oracle="""
    SELECT v.user_id,
           v.event_id AS view_id,
           p.event_id AS purchase_id,
           CAST((epoch_us(p.ts) - epoch_us(v.ts)) // 1000000 AS BIGINT)
             AS gap_sec
    FROM events v JOIN events p
      ON v.user_id = p.user_id
     AND v.event_type = 'view' AND p.event_type = 'purchase'
     AND v.ts <= p.ts
     AND v.ts >= p.ts - INTERVAL 30 MINUTE
    ORDER BY purchase_id, view_id
    """,
)
def x158_view_purchase_attribution(spark: SparkSession, sf_dir: str) -> DataFrame:
    """View->purchase attribution pairs: every view by the same user in the
    30 minutes before a purchase (multi-touch attribution's raw pair set;
    x41's funnel counts sessions, this emits the evidence rows). The batch
    twin of the STREAM-STREAM interval join in streaming/joins.py — same
    condition, same output, and tests/test_streaming.py pins replayed
    streaming == this batch plan row-for-row. Plan: equi-join on user_id
    with the interval as a join-level range predicate; at 100 TB both
    sides shuffle-partition by user_id once (or co-locate via bucketing)
    and the per-user sort-merge keeps the range scan linear per key — the
    streaming variant instead holds only O(watermark + 30 min) of state
    per key, which is the reason it exists."""
    e = load(spark, sf_dir, "events")
    v = e.filter(F.col("event_type") == "view").select(
        "user_id", F.col("event_id").alias("view_id"), F.col("ts").alias("vts")
    )
    p = e.filter(F.col("event_type") == "purchase").select(
        F.col("user_id").alias("p_user"),
        F.col("event_id").alias("purchase_id"),
        F.col("ts").alias("pts"),
    )
    return (
        v.join(
            p,
            (F.col("user_id") == F.col("p_user"))
            & (F.col("vts") <= F.col("pts"))
            & (F.col("vts") >= F.col("pts") - F.expr("INTERVAL 30 MINUTES")),
        )
        .select(
            "user_id",
            "view_id",
            "purchase_id",
            F.expr("(unix_micros(pts) - unix_micros(vts)) DIV 1000000").alias(
                "gap_sec"
            ),
        )
        .orderBy("purchase_id", "view_id")
    )


@query(
    "x162_unattributed_purchases",
    oracle="""
    SELECT p.user_id, p.event_id AS purchase_id
    FROM events p
    WHERE p.event_type = 'purchase'
      AND NOT EXISTS (
        SELECT 1 FROM events v
        WHERE v.event_type = 'view'
          AND v.user_id = p.user_id
          AND v.ts <= p.ts
          AND v.ts >= p.ts - INTERVAL 30 MINUTE)
    ORDER BY purchase_id
    """,
)
def x162_unattributed_purchases(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The complement of x158: purchases with NO view by the same user in
    the preceding 30 minutes — the "dark conversions" the attribution
    model can't explain (organic/external traffic). Batch plan: left ANTI
    join on user_id with the interval as the join predicate — one
    user-keyed shuffle, same co-location story as x158. Streaming twin:
    the stream-stream LEFT OUTER interval join (streaming/joins.py emits
    null-matched purchases once the watermark proves no view can still
    arrive); tests/test_streaming.py pins the outer join's matched AND
    null rows against x158/x162 on the emitted region."""
    e = load(spark, sf_dir, "events")
    v = e.filter(F.col("event_type") == "view").select(
        F.col("user_id").alias("v_user"), F.col("ts").alias("vts")
    )
    p = e.filter(F.col("event_type") == "purchase").select(
        "user_id", F.col("event_id").alias("purchase_id"), F.col("ts").alias("pts")
    )
    return (
        p.join(
            v,
            (F.col("user_id") == F.col("v_user"))
            & (F.col("vts") <= F.col("pts"))
            & (F.col("vts") >= F.col("pts") - F.expr("INTERVAL 30 MINUTES")),
            "left_anti",
        )
        .select("user_id", "purchase_id")
        .orderBy("purchase_id")
    )


@query(
    "x167_copurchase_lift",
    oracle="""
    WITH d AS (SELECT DISTINCT l_orderkey, l_partkey FROM lineitem),
    n AS (SELECT CAST(count(DISTINCT l_orderkey) AS BIGINT) AS n_orders FROM d),
    pc AS (SELECT l_partkey, CAST(count(*) AS BIGINT) AS n_orders_with FROM d
           GROUP BY l_partkey),
    p AS (SELECT a.l_partkey AS part_a, b.l_partkey AS part_b,
                 CAST(count(*) AS BIGINT) AS n_both
          FROM d a JOIN d b
            ON a.l_orderkey = b.l_orderkey AND a.l_partkey < b.l_partkey
          GROUP BY 1, 2)
    SELECT part_a, part_b, n_both,
           ca.n_orders_with AS n_a, cb.n_orders_with AS n_b,
           CAST(n_both * n_orders * 1000000 // (ca.n_orders_with * cb.n_orders_with)
                AS BIGINT) AS lift_ppm
    FROM p JOIN pc ca ON ca.l_partkey = part_a
           JOIN pc cb ON cb.l_partkey = part_b
           CROSS JOIN n
    WHERE n_both >= 2
    ORDER BY n_both DESC, lift_ppm DESC, part_a, part_b
    LIMIT 20
    """,
)
def x167_copurchase_lift(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Market-basket co-purchase lift: for every pair of parts appearing
    in the same order, support (co-order count) and lift — the
    association signal behind recommendation candidates and inventory
    co-location, exact in ppm integers (floor(n_ab * N * 1e6 / (n_a *
    n_b)); >1e6 means the pair co-occurs more than independence
    predicts). Plan shape for 100 TB: pair generation happens INSIDE
    each order row — distinct (order, part), collect_set per order, then
    a JVM higher-order transform emits the pairs (the x153 idiom) — so
    join volume is sum-of-basket-squared, bounded by TPC-H's ~7-line
    orders, never |lineitem|^2; part totals ride a broadcast; the final
    top-20 is TakeOrdered. The oracle states the equivalent self-join
    formulation."""
    li = load(spark, sf_dir, "lineitem")
    d = li.select("l_orderkey", "l_partkey").distinct()
    n = d.agg(F.countDistinct("l_orderkey").alias("n_orders"))
    pc = d.groupBy("l_partkey").agg(F.count(F.lit(1)).alias("n_orders_with"))
    per_order = d.groupBy("l_orderkey").agg(
        F.array_sort(F.collect_set("l_partkey")).alias("ps")
    )
    pairs = (
        per_order.select(
            F.explode(
                F.expr(
                    """
                    flatten(transform(ps, (a, i) ->
                      transform(slice(ps, i + 2, size(ps)), b ->
                        struct(a AS part_a, b AS part_b))))
                    """
                )
            ).alias("p")
        )
        .select("p.part_a", "p.part_b")
        .groupBy("part_a", "part_b")
        .agg(F.count(F.lit(1)).alias("n_both"))
        .filter(F.col("n_both") >= 2)
    )
    ca = pc.select(F.col("l_partkey").alias("part_a"), F.col("n_orders_with").alias("n_a"))
    cb = pc.select(F.col("l_partkey").alias("part_b"), F.col("n_orders_with").alias("n_b"))
    return (
        pairs.join(ca, "part_a")
        .join(cb, "part_b")
        .crossJoin(F.broadcast(n))
        .select(
            "part_a",
            "part_b",
            "n_both",
            "n_a",
            "n_b",
            # Integer `div` through decimal(38,0), matching the oracle's
            # exact `//` (HUGEINT): double division floors wrong past 2^53
            # and the raw long product overflows far earlier than decimal.
            F.expr(
                "cast(cast(n_both as decimal(38,0)) * n_orders * 1000000"
                " div (cast(n_a as decimal(38,0)) * n_b) as bigint)"
            ).alias("lift_ppm"),
        )
        .orderBy(
            F.col("n_both").desc(), F.col("lift_ppm").desc(), "part_a", "part_b"
        )
        .limit(20)
    )


@query(
    "x182_join_key_skew_audit",
    oracle="""
    WITH kc AS (SELECT o_custkey AS key, CAST(count(*) AS BIGINT) AS n
                FROM orders GROUP BY 1),
    st AS (SELECT CAST(count(*) AS BIGINT) AS n_keys,
                  CAST(sum(n) AS BIGINT) AS n_rows,
                  CAST(max(n) AS BIGINT) AS max_n
           FROM kc),
    r AS (SELECT n,
                 row_number() OVER (ORDER BY n, key) AS rnk
          FROM kc),
    q AS (SELECT CAST(min(CASE WHEN rnk * 2 >= n_keys THEN n END) AS BIGINT)
                   AS p50,
                 CAST(min(CASE WHEN rnk * 100 > n_keys * 99 THEN n END)
                      AS BIGINT) AS p99
          FROM r CROSS JOIN st),
    g AS (SELECT sum(CAST(2 * rnk - n_keys - 1 AS HUGEINT) * n) AS gnum,
                 CAST(max(n_keys) AS BIGINT) AS nk,
                 CAST(sum(n) AS BIGINT) AS tot
          FROM r CROSS JOIN st)
    SELECT st.n_keys, st.n_rows, st.max_n,
           q.p50, q.p99,
           CAST(st.max_n * 1000000 // st.n_rows AS BIGINT)
             AS max_key_share_ppm,
           CAST(g.gnum * 1000000 // (CAST(g.nk AS HUGEINT) * g.tot)
                AS BIGINT) AS gini_ppm,
           CASE WHEN st.max_n * 32 > st.n_rows THEN 'salt'
                WHEN q.p99 > 4 * q.p50 THEN 'aqe_skew_join'
                ELSE 'plain_shuffle' END AS recommendation
    FROM st CROSS JOIN q CROSS JOIN g
    """,
)
def x182_join_key_skew_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pre-join skew diagnosis of a join key's frequency distribution —
    the report that decides between x27's salting, AQE's skew-join
    split, or a plain shuffle BEFORE launching a 100 TB join: key count,
    row count, the heaviest key's absolute and ppm share, exact p50/p99
    of per-key cardinality (the x149 exact-rank idiom over the KEY
    table, not the row table), and the Gini coefficient of key mass in
    exact ppm (sum((2i - n - 1) x_i) / (n sum x) over ascending-sorted
    counts). The recommendation thresholds encode the operational rules:
    one key holding > 1/32 of all rows serializes a 32-task stage ->
    salt; p99 > 4 x p50 -> let AQE split stragglers. Plan: one hash agg
    to the key table, then the x58 two-phase decomposition taken one
    step further — NO per-key rank at all: ranks over (n, key) are
    contiguous within each distinct count value n, so both percentile
    picks (the rank condition is monotone, so a value qualifies iff its
    TOP rank cb+c does) and the Gini numerator (sum_{i=C+1}^{C+c}
    (2i-N-1)*v = v*c*(2C+c-N), exact integer identity) collapse onto
    the count-of-counts table. The only single-partition work is a
    cumsum over |distinct per-key counts| rows — a power-law key table
    with billions of keys still has only ~thousands of distinct counts.
    The oracle computes the naive per-row window rank, proving the
    decomposition IS that rank. All Gini products ride decimal(38,0)
    from the first multiply (the x167 lesson, applied to numerator AND
    denominator)."""
    o = load(spark, sf_dir, "orders")
    kc = o.groupBy(F.col("o_custkey").alias("key")).agg(
        F.count(F.lit(1)).alias("n")
    )
    st = kc.agg(
        F.count(F.lit(1)).alias("n_keys"),
        F.sum("n").alias("n_rows"),
        F.max("n").alias("max_n"),
    )
    cc = kc.groupBy("n").agg(F.count(F.lit(1)).alias("c"))
    wcum = Window.orderBy("n").rowsBetween(Window.unboundedPreceding, -1)
    cum = cc.select(
        "n", "c", F.coalesce(F.sum("c").over(wcum), F.lit(0)).alias("cb")
    )
    cs = cum.crossJoin(F.broadcast(st))
    top_rnk = F.col("cb") + F.col("c")  # the value-group's highest rank
    q = cs.agg(
        F.min(F.when(top_rnk * 2 >= F.col("n_keys"), F.col("n")))
        .cast("long")
        .alias("p50"),
        F.min(F.when(top_rnk * 100 > F.col("n_keys") * 99, F.col("n")))
        .cast("long")
        .alias("p99"),
    )
    g = cs.agg(
        F.sum(
            F.col("n").cast("decimal(38,0)")
            * F.col("c").cast("decimal(38,0)")
            * (2 * F.col("cb") + F.col("c") - F.col("n_keys")).cast(
                "decimal(38,0)"
            )
        )
        .cast("decimal(38,0)")
        .alias("gnum"),
        F.max("n_keys").alias("nk"),
        F.sum(F.col("n").cast("decimal(38,0)") * F.col("c"))
        .cast("decimal(38,0)")
        .alias("tot"),
    )
    return (
        st.crossJoin(F.broadcast(q))
        .crossJoin(F.broadcast(g))
        .select(
            F.col("n_keys").cast("long"),
            F.col("n_rows").cast("long"),
            F.col("max_n").cast("long"),
            "p50",
            "p99",
            F.expr("max_n * 1000000 div n_rows")
            .cast("long")
            .alias("max_key_share_ppm"),
            # decimal(38,0): nk * tot overflows BIGINT at ~1e9 keys x
            # 1e11 rows (the x167 lesson); DuckDB // promotes to HUGEINT
            F.expr(
                "cast(gnum as decimal(38,0)) * 1000000"
                " div (cast(nk as decimal(38,0)) * tot)"
            )
            .cast("long")
            .alias("gini_ppm"),
            F.when(F.col("max_n") * 32 > F.col("n_rows"), F.lit("salt"))
            .when(F.col("p99") > 4 * F.col("p50"), F.lit("aqe_skew_join"))
            .otherwise(F.lit("plain_shuffle"))
            .alias("recommendation"),
        )
    )


@query(
    "x228_association_rules",
    oracle=f"""
    WITH b AS (SELECT DISTINCT l_orderkey, l_partkey FROM lineitem),
    n AS (SELECT CAST(count(DISTINCT l_orderkey) AS BIGINT) AS n_orders
          FROM b),
    item AS (SELECT l_partkey, CAST(count(*) AS BIGINT) AS n_i
             FROM b GROUP BY 1),
    pair AS (SELECT a.l_partkey AS pa, b2.l_partkey AS pb,
                    CAST(count(*) AS BIGINT) AS n_ab
             FROM b a JOIN b b2 ON a.l_orderkey = b2.l_orderkey
                  AND a.l_partkey < b2.l_partkey
             GROUP BY 1, 2 HAVING count(*) >= 3),
    rules AS (SELECT pa AS antecedent, pb AS consequent, n_ab FROM pair
              UNION ALL
              SELECT pb, pa, n_ab FROM pair)
    SELECT r.antecedent, r.consequent, r.n_ab,
           ia.n_i AS n_antecedent, ic.n_i AS n_consequent,
           {dround_sql("CAST(r.n_ab AS DOUBLE) / ia.n_i", 6)} AS confidence,
           {dround_sql(
               "CAST(r.n_ab AS DOUBLE) * n.n_orders"
               " / (CAST(ia.n_i AS DECIMAL(38,0)) * ic.n_i)", 6)} AS lift,
           {dround_sql(
               "CAST(r.n_ab AS DOUBLE) / n.n_orders"
               " - (CAST(ia.n_i AS DOUBLE) / n.n_orders)"
               " * (CAST(ic.n_i AS DOUBLE) / n.n_orders)", 6)} AS leverage,
           CASE WHEN r.n_ab = ia.n_i THEN NULL ELSE
               {dround_sql(
                   "(1.0 - CAST(ic.n_i AS DOUBLE) / n.n_orders)"
                   " / (1.0 - CAST(r.n_ab AS DOUBLE) / ia.n_i)", 6)}
           END AS conviction,
           {dround_sql(
               "CAST(r.n_ab AS DOUBLE) / (ia.n_i + ic.n_i - r.n_ab)", 6)}
               AS jaccard
    FROM rules r
    JOIN item ia ON ia.l_partkey = r.antecedent
    JOIN item ic ON ic.l_partkey = r.consequent
    CROSS JOIN n
    ORDER BY r.antecedent, r.consequent
    """,
)
def x228_association_rules(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Directed association-rule panel over order baskets (parts bought
    together): confidence, lift, leverage, conviction and Jaccard for
    every part pair with support >= 3, BOTH directions — the full
    measure set a recommender/curation pipeline ranks rules by, where
    x111 stops at symmetric lift (confidence and conviction are
    direction-specific: {{bread}}->{{milk}} can be strong while
    {{milk}}->{{bread}} is noise). Baskets are DISTINCT (order, part)
    so line-item repeats can't inflate support. Exactness: all supports
    are integers; each measure is IEEE arithmetic on them, rounded
    once; conviction is NULL at confidence=1 (division by zero) rather
    than a sentinel. Plan: one distinct, one self-join per order
    (baskets bounded at ~7 items, so pair fan-out is bounded per
    order), two broadcast item-count joins; the support filter runs in
    the pair agg HAVING, so low-support pairs never leave the first
    shuffle."""
    li = load(spark, sf_dir, "lineitem")
    b = li.select("l_orderkey", "l_partkey").distinct()
    n = b.agg(F.countDistinct("l_orderkey").alias("n_orders"))
    item = b.groupBy("l_partkey").agg(F.count(F.lit(1)).alias("n_i"))
    a2 = b.select(F.col("l_orderkey").alias("ok"), F.col("l_partkey").alias("pa"))
    b2 = b.select(F.col("l_orderkey").alias("ok"), F.col("l_partkey").alias("pb"))
    pair = (
        a2.join(b2, "ok")
        .filter(F.col("pa") < F.col("pb"))
        .groupBy("pa", "pb")
        .agg(F.count(F.lit(1)).alias("n_ab"))
        .filter(F.col("n_ab") >= 3)
    )
    # r16 (guide §2.4, the dup_clusters fix): both rule directions emit
    # from ONE pass via an in-row 2-way explode — the former 2-branch
    # union re-ran the basket self-join + pair agg once per direction.
    rules = pair.select(
        F.explode(
            F.expr(
                "array(struct(pa as antecedent, pb as consequent, n_ab),"
                " struct(pb as antecedent, pa as consequent, n_ab))"
            )
        ).alias("r")
    ).select("r.antecedent", "r.consequent", "r.n_ab")
    ia = item.select(
        F.col("l_partkey").alias("antecedent"), F.col("n_i").alias("n_antecedent")
    )
    ic = item.select(
        F.col("l_partkey").alias("consequent"), F.col("n_i").alias("n_consequent")
    )
    conf = F.col("n_ab").cast("double") / F.col("n_antecedent")
    p_c = F.col("n_consequent").cast("double") / F.col("n_orders")
    return (
        rules.join(F.broadcast(ia), "antecedent")
        .join(F.broadcast(ic), "consequent")
        .crossJoin(F.broadcast(n))
        .select(
            "antecedent",
            "consequent",
            "n_ab",
            "n_antecedent",
            "n_consequent",
            dround(conf, 6).alias("confidence"),
            dround(
                F.col("n_ab").cast("double")
                * F.col("n_orders")
                / (
                    F.col("n_antecedent").cast("decimal(38,0)")
                    * F.col("n_consequent")
                ),
                6,
            ).alias("lift"),
            dround(
                F.col("n_ab").cast("double") / F.col("n_orders")
                - (F.col("n_antecedent").cast("double") / F.col("n_orders"))
                * p_c,
                6,
            ).alias("leverage"),
            F.when(F.col("n_ab") == F.col("n_antecedent"), F.lit(None)).otherwise(
                dround((1.0 - p_c) / (1.0 - conf), 6)
            ).alias("conviction"),
            dround(
                F.col("n_ab").cast("double")
                / (F.col("n_antecedent") + F.col("n_consequent") - F.col("n_ab")),
                6,
            ).alias("jaccard"),
        )
        .orderBy("antecedent", "consequent")
    )


# ---------------------------------------------------------------------------
# X246-X248 — the three TPC-H shapes that need partsupp (Q2/Q11/Q20).
# The fixture has no partsupp table, so both engines DERIVE the identical
# one from part x supplier with pure integer arithmetic (the r10 verdict's
# "deterministic derived partsupp" item, minus any file: a shared closed
# form beats a written fixture because it works at every SF and cannot
# drift between engines). Per part, 4 suppliers at stride q = 1 +
# p_partkey % (S div 4) — q <= S/4 so i*q mod S never collides for
# i in 0..3 (distinctness guaranteed for S >= 4, dbgen's own trick);
# availqty/supplycost come off the md5 clock, cost carried in integer
# CENTS so every aggregate is exact.
# ---------------------------------------------------------------------------

_PARTSUPP_SQL = """
    scnt AS (SELECT CAST(count(*) AS BIGINT) AS s FROM supplier),
    psk AS (SELECT p_partkey, s,
                   1 + (p_partkey % (s // 4)) AS q
            FROM part, scnt),
    ps0 AS (SELECT p_partkey AS ps_partkey,
                   (p_partkey + i * q) % s AS ps_suppkey
            FROM psk, (SELECT unnest([0, 1, 2, 3]) AS i)),
    partsupp AS (SELECT ps_partkey, ps_suppkey,
        1 + CAST('0x' || substring(md5(CAST(ps_partkey AS VARCHAR) || ':'
                || CAST(ps_suppkey AS VARCHAR)), 1, 15) AS BIGINT) % 9999
            AS ps_availqty,
        100 + CAST('0x' || substring(md5(CAST(ps_partkey AS VARCHAR) || '@'
                || CAST(ps_suppkey AS VARCHAR)), 1, 15) AS BIGINT) % 99900
            AS ps_supplycost_cents
      FROM ps0)"""


def derived_partsupp(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The Spark side of the shared partsupp derivation (see
    ``_PARTSUPP_SQL`` — same arithmetic, same md5 clock). Plan shape: a
    map-side explode of the part scan against a 1-row broadcast supplier
    count — 4 rows per part, no shuffle, no file; stands in for reading
    a real partsupp table."""
    part = load(spark, sf_dir, "part")
    supp = load(spark, sf_dir, "supplier")
    scnt = supp.agg(F.count(F.lit(1)).cast("long").alias("s"))
    base = (
        part.select("p_partkey")
        .crossJoin(F.broadcast(scnt))
        .select(
            "p_partkey",
            "s",
            (1 + F.col("p_partkey") % F.expr("s div 4")).alias("q"),
            F.explode(F.sequence(F.lit(0), F.lit(3))).alias("i"),
        )
        .select(
            F.col("p_partkey").alias("ps_partkey"),
            ((F.col("p_partkey") + F.col("i") * F.col("q")) % F.col("s")).alias(
                "ps_suppkey"
            ),
        )
    )
    h_qty = F.expr(
        "cast(conv(substring(md5(concat(cast(ps_partkey as string), ':',"
        " cast(ps_suppkey as string))), 1, 15), 16, 10) as bigint)"
    )
    h_cost = F.expr(
        "cast(conv(substring(md5(concat(cast(ps_partkey as string), '@',"
        " cast(ps_suppkey as string))), 1, 15), 16, 10) as bigint)"
    )
    return base.select(
        "ps_partkey",
        "ps_suppkey",
        (1 + h_qty % 9999).alias("ps_availqty"),
        (100 + h_cost % 99900).alias("ps_supplycost_cents"),
    )


@query(
    "x246_min_cost_supplier_q2",
    oracle=f"""
    WITH {_PARTSUPP_SQL},
    eu AS (SELECT ps_partkey, ps_suppkey, ps_supplycost_cents,
                  s_name, s_acctbal, n_name
           FROM partsupp
           JOIN supplier ON s_suppkey = ps_suppkey
           JOIN nation ON n_nationkey = s_nationkey
           JOIN region ON r_regionkey = n_regionkey
           WHERE r_name = 'EUROPE'),
    mc AS (SELECT ps_partkey, min(ps_supplycost_cents) AS min_cents
           FROM eu GROUP BY ps_partkey)
    SELECT {dround_sql("s_acctbal", 6)} AS s_acctbal,
           eu.s_name, eu.n_name,
           p.p_partkey, p.p_brand,
           CAST(eu.ps_supplycost_cents AS BIGINT) AS supplycost_cents
    FROM part p
    JOIN eu ON eu.ps_partkey = p.p_partkey
    JOIN mc ON mc.ps_partkey = p.p_partkey
           AND eu.ps_supplycost_cents = mc.min_cents
    WHERE p.p_size = 15 AND p.p_type = 'ECONOMY'
    ORDER BY s_acctbal DESC, eu.n_name, eu.s_name, p.p_partkey
    LIMIT 100
    """,
)
def x246_min_cost_supplier_q2(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q2 shape (minimum-cost supplier): for every size-15 ECONOMY
    part, the EUROPE supplier offering it at the regional minimum cost —
    the correlated-subquery pattern rewritten as aggregate-then-rejoin
    (Catalyst gets a plain equi-join on (partkey, min_cents) instead of a
    per-row subquery). Plan: supplier/nation/region broadcast into the
    derived partsupp (4 rows/part, map-side); the min-cost table and the
    rejoin hash on ps_partkey; TakeOrderedAndProject caps the output at
    100 — no global sort. Cost stays in integer cents end to end; ties
    on the minimum keep EVERY minimal supplier (Q2's own semantics)."""
    ps = derived_partsupp(spark, sf_dir)
    part = load(spark, sf_dir, "part")
    supp = load(spark, sf_dir, "supplier")
    nat = load(spark, sf_dir, "nation")
    reg = load(spark, sf_dir, "region")
    eu = (
        ps.join(
            F.broadcast(
                supp.join(
                    F.broadcast(
                        nat.join(
                            F.broadcast(reg.filter(F.col("r_name") == "EUROPE")),
                            F.col("n_regionkey") == F.col("r_regionkey"),
                        )
                    ),
                    F.col("s_nationkey") == F.col("n_nationkey"),
                )
            ),
            F.col("s_suppkey") == F.col("ps_suppkey"),
        )
        .select(
            "ps_partkey", "ps_supplycost_cents", "s_name", "s_acctbal", "n_name"
        )
    )
    mc = eu.groupBy("ps_partkey").agg(
        F.min("ps_supplycost_cents").alias("min_cents")
    ).withColumnRenamed("ps_partkey", "mc_partkey")
    return (
        load(spark, sf_dir, "part")
        .filter((F.col("p_size") == 15) & (F.col("p_type") == "ECONOMY"))
        .join(eu, F.col("p_partkey") == F.col("ps_partkey"))
        .join(
            mc,
            (F.col("ps_partkey") == F.col("mc_partkey"))
            & (F.col("ps_supplycost_cents") == F.col("min_cents")),
        )
        .select(
            dround(F.col("s_acctbal"), 6).alias("s_acctbal"),
            "s_name",
            "n_name",
            "p_partkey",
            "p_brand",
            F.col("ps_supplycost_cents").cast("long").alias("supplycost_cents"),
        )
        .orderBy(
            F.col("s_acctbal").desc(), "n_name", "s_name", "p_partkey"
        )
        .limit(100)
    )


@query(
    "x247_important_stock_q11",
    oracle=f"""
    WITH {_PARTSUPP_SQL},
    home AS (SELECT n_nationkey FROM supplier
             JOIN nation ON n_nationkey = s_nationkey WHERE s_suppkey = 0),
    v AS (SELECT ps_partkey,
                 CAST(sum(CAST(ps_supplycost_cents AS DECIMAL(38,0))
                          * ps_availqty) AS DECIMAL(38,0)) AS value_cents
          FROM partsupp
          JOIN supplier ON s_suppkey = ps_suppkey
          JOIN home ON home.n_nationkey = supplier.s_nationkey
          GROUP BY ps_partkey),
    tot AS (SELECT CAST(sum(value_cents) AS DECIMAL(38,0)) AS total FROM v)
    SELECT ps_partkey, CAST(value_cents AS BIGINT) AS value_cents
    FROM v, tot
    WHERE value_cents * 2000 > total
    ORDER BY value_cents DESC, ps_partkey
    """,
)
def x247_important_stock_q11(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q11 shape (important stock): per-part inventory value
    (supplycost x availqty) over the suppliers of ONE nation — the home
    nation of supplier 0, a data-driven parameter so the query is
    non-degenerate at every SF — keeping parts whose value exceeds
    1/2000 of the nation total. The HAVING-subquery becomes a 1-row
    broadcast; the threshold compare is the integer cross-multiply
    (value * 2000 > total), no division, no floats anywhere. Products
    ride decimal(38,0) — cents x qty x corpus scale passes 2^63 long
    before 100 TB. Plan: one partsupp pass (itself map-side derived),
    supplier broadcast, hash agg on ps_partkey, 1-row total broadcast."""
    ps = derived_partsupp(spark, sf_dir)
    supp = load(spark, sf_dir, "supplier")
    nat = load(spark, sf_dir, "nation")
    home = (
        supp.filter(F.col("s_suppkey") == 0)
        .join(F.broadcast(nat), F.col("n_nationkey") == F.col("s_nationkey"))
        .select("n_nationkey")
    )
    v = (
        ps.join(
            F.broadcast(
                supp.join(
                    F.broadcast(home),
                    F.col("n_nationkey") == F.col("s_nationkey"),
                    "semi",
                )
            ),
            F.col("s_suppkey") == F.col("ps_suppkey"),
        )
        .groupBy("ps_partkey")
        .agg(
            F.sum(
                F.col("ps_supplycost_cents").cast("decimal(38,0)")
                * F.col("ps_availqty")
            )
            .cast("decimal(38,0)")
            .alias("value_cents")
        )
    )
    tot = v.agg(F.sum("value_cents").cast("decimal(38,0)").alias("total"))
    return (
        v.crossJoin(F.broadcast(tot))
        .filter(F.col("value_cents") * 2000 > F.col("total"))
        .select(
            "ps_partkey", F.col("value_cents").cast("long").alias("value_cents")
        )
        .orderBy(F.col("value_cents").desc(), "ps_partkey")
    )


@query(
    "x248_excess_inventory_q20",
    oracle=f"""
    WITH {_PARTSUPP_SQL},
    home AS (SELECT n_nationkey, n_name FROM supplier
             JOIN nation ON n_nationkey = s_nationkey WHERE s_suppkey = 1),
    redp AS (SELECT p_partkey FROM part WHERE p_name LIKE 'red%'),
    shipped AS (SELECT l_partkey, l_suppkey,
                       CAST(sum(CAST(l_quantity AS BIGINT)) AS BIGINT) AS qty
                FROM lineitem
                JOIN redp ON p_partkey = l_partkey
                WHERE l_shipdate >= TIMESTAMP '1997-01-01'
                  AND l_shipdate < TIMESTAMP '1998-01-01'
                GROUP BY l_partkey, l_suppkey),
    excess AS (SELECT DISTINCT ps_suppkey
               FROM partsupp
               JOIN shipped ON l_partkey = ps_partkey
                           AND l_suppkey = ps_suppkey
               WHERE ps_availqty * 2 > qty)
    SELECT s_name, n_name
    FROM supplier
    JOIN home ON home.n_nationkey = supplier.s_nationkey
    JOIN excess ON ps_suppkey = s_suppkey
    ORDER BY s_name
    """,
)
def x248_excess_inventory_q20(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q20 shape (excess inventory): suppliers in supplier 1's home
    nation holding more than half a year's shipments of some 'red' part
    — the candidates to drain before reordering. The nested IN-subquery
    chain becomes: lineitem agg per (part, supp) restricted by a
    broadcast semi-join on red parts and a pushed-down shipdate range,
    an equi-join against the derived partsupp on BOTH keys, the
    availqty > qty/2 predicate as the integer cross-multiply (quantity
    is integral in the fixture; summed as BIGINT so the compare is
    exact), and a distinct + semi-join into the supplier dim. Plan: the
    only corpus-sized pass is the filtered lineitem scan; everything
    downstream is |matched (part, supp)| rows."""
    ps = derived_partsupp(spark, sf_dir)
    li = load(spark, sf_dir, "lineitem")
    part = load(spark, sf_dir, "part")
    supp = load(spark, sf_dir, "supplier")
    nat = load(spark, sf_dir, "nation")
    home = (
        supp.filter(F.col("s_suppkey") == 1)
        .join(F.broadcast(nat), F.col("n_nationkey") == F.col("s_nationkey"))
        .select("n_nationkey", "n_name")
    )
    shipped = (
        li.filter(
            (F.col("l_shipdate") >= F.lit("1997-01-01").cast("timestamp"))
            & (F.col("l_shipdate") < F.lit("1998-01-01").cast("timestamp"))
        )
        .join(
            F.broadcast(
                part.filter(F.col("p_name").startswith("red")).select(
                    F.col("p_partkey").alias("l_partkey")
                )
            ),
            "l_partkey",
            "semi",
        )
        .groupBy("l_partkey", "l_suppkey")
        .agg(F.sum(F.col("l_quantity").cast("long")).cast("long").alias("qty"))
    )
    excess = (
        ps.join(
            shipped,
            (F.col("l_partkey") == F.col("ps_partkey"))
            & (F.col("l_suppkey") == F.col("ps_suppkey")),
        )
        .filter(F.col("ps_availqty") * 2 > F.col("qty"))
        .select("ps_suppkey")
        .distinct()
    )
    return (
        supp.join(
            F.broadcast(home), F.col("n_nationkey") == F.col("s_nationkey")
        )
        .join(
            excess.withColumnRenamed("ps_suppkey", "s_suppkey"),
            "s_suppkey",
            "semi",
        )
        .select("s_name", "n_name")
        .orderBy("s_name")
    )
