"""Scale patterns: salted joins (correctness under hot keys), bucketed
co-located joins (no Exchange), streaming dedup within watermark, and the
custom Python data source plugin."""

from __future__ import annotations

import pandas as pd
from pyspark.sql import functions as F

from kafka_connect_spark.functions.skew import (
    plan_has_shuffle,
    salted_join,
    write_bucketed,
)
from kafka_connect_spark.sources.exposition_datasource import ExpositionDataSource
from kafka_connect_spark.streaming.metrics import to_exposition


def test_salted_join_matches_plain_join(spark):
    # one pathologically hot key (0) + a long tail
    left = spark.range(0, 2000).select(
        (F.when(F.col("id") < 1500, 0).otherwise(F.col("id"))).alias("k"),
        F.col("id").alias("payload"),
    )
    right = spark.createDataFrame([(0, "hot"), (1600, "cold")], ["k", "label"])
    plain = salted = None
    plain = left.join(right, "k").orderBy("payload").collect()
    salted = salted_join(left, right, "k", n_salts=8).orderBy("payload").collect()
    assert [tuple(r) for r in salted] == [tuple(r) for r in plain]
    assert len(plain) == 1501


def test_x27_salt_spreads_hot_key_and_joins_on_salt(spark, sf_dir):
    """The registered x27 query's skew contract: the fabricated hot key
    (sk=1, ~half of lineitem) is spread across ALL 8 salt values — 8
    reducers instead of one straggler — and the physical join key is
    (sk, __salt), not sk alone."""
    from kafka_connect_spark.catalog import load

    li = load(spark, sf_dir, "lineitem").select(
        F.when(F.col("l_orderkey") % 2 == 0, F.lit(1))
        .otherwise(F.col("l_suppkey"))
        .alias("sk"),
        "l_quantity",
    )
    sup = load(spark, sf_dir, "supplier").select(
        F.col("s_suppkey").alias("sk"), "s_name"
    )
    salt = F.pmod(F.xxhash64(*li.columns), F.lit(8))
    spread = (
        li.filter(F.col("sk") == 1).select(salt.alias("s")).distinct().count()
    )
    assert spread == 8, f"hot key landed on only {spread}/8 salts"
    plan = salted_join(li, sup, "sk", n_salts=8)._jdf.queryExecution().toString()
    assert "__salt" in plan  # the shuffle key includes the salt


def test_salted_left_join(spark):
    left = spark.createDataFrame([(1, "a"), (2, "b")], ["k", "v"])
    right = spark.createDataFrame([(1, "x")], ["k", "w"])
    out = salted_join(left, right, "k", n_salts=4, how="left").collect()
    got = {(r["k"], r["w"]) for r in out}
    assert got == {(1, "x"), (2, None)}


def test_bucketed_join_skips_shuffle(spark, tmp_path):
    a = spark.range(0, 1000).select(F.col("id").alias("k"), (F.col("id") * 2).alias("a"))
    b = spark.range(0, 1000).select(F.col("id").alias("k"), (F.col("id") * 3).alias("b"))
    write_bucketed(a, "bkt_a", "k", 8)
    write_bucketed(b, "bkt_b", "k", 8)
    # disable broadcast: at test size the planner would broadcast (which
    # also skips the shuffle but proves nothing about bucketing); at scale
    # both sides are too big to broadcast and bucketing is what saves you.
    prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        joined = spark.table("bkt_a").join(spark.table("bkt_b"), "k")
        assert joined.count() == 1000
        assert not plan_has_shuffle(joined), "bucketed equi-join must not shuffle"
        # sanity: the same join over non-bucketed data DOES shuffle
        plain = a.join(b.withColumnRenamed("b", "b2"), "k")
        assert plan_has_shuffle(plain)
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
        spark.sql("DROP TABLE IF EXISTS bkt_a")
        spark.sql("DROP TABLE IF EXISTS bkt_b")


def test_drop_duplicates_within_watermark_streaming(spark, tmp_path):
    """X11 dedup surface: redelivered events within the watermark horizon are
    emitted once (stateful streaming dedup keyed on event_id)."""
    d = str(tmp_path / "dup")
    rows = [("2024-01-01 10:00:00", 1), ("2024-01-01 10:01:00", 2)]
    df = spark.createDataFrame(rows, ["ts_s", "event_id"]).select(
        F.col("ts_s").cast("timestamp").alias("ts"), "event_id"
    )
    df.coalesce(1).write.parquet(d)  # file 1
    df.coalesce(1).write.mode("append").parquet(d)  # file 2 = full redelivery

    schema = spark.read.parquet(d).schema
    sdf = spark.readStream.schema(schema).option("maxFilesPerTrigger", 1).parquet(d)
    deduped = sdf.withWatermark("ts", "10 minutes").dropDuplicatesWithinWatermark(
        ["event_id"]
    )
    out: list[pd.DataFrame] = []
    q = (
        deduped.writeStream.foreachBatch(lambda b, i: out.append(b.toPandas()))
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    got = pd.concat(out, ignore_index=True)
    assert sorted(got["event_id"]) == [1, 2]  # duplicates suppressed


def test_partition_pruning(spark, tmp_path, sf_dir):
    """Hive-partitioned layout + a partition-key filter => the scan plans
    PartitionFilters and touches only the matching directories — the
    data-skipping that makes 100 TB time-series tables queryable."""
    from kafka_connect_spark.catalog import load

    p = str(tmp_path / "orders_by_year")
    orders = load(spark, sf_dir, "orders")
    orders.withColumn("yr", F.year("o_orderdate")).write.partitionBy("yr").parquet(p)

    q = spark.read.parquet(p).filter(F.col("yr") == 1995)
    plan = q._jdf.queryExecution().executedPlan().toString()
    assert "PartitionFilters: [isnotnull(yr" in plan  # pruning reached the scan
    expected = orders.filter(F.year("o_orderdate") == 1995).count()
    assert q.count() == expected > 0
    # the single partition directory alone holds exactly the filtered rows,
    # and the table has other partitions that the scan never needs
    assert spark.read.parquet(f"{p}/yr=1995").count() == expected
    import os

    n_partitions = len([d for d in os.listdir(p) if d.startswith("yr=")])
    assert n_partitions > 1


def test_observability_loop_end_to_end(spark, tmp_path):
    """Close the reference's metrics loop ON the engine (SURVEY.md §3.3):
    run a streaming query -> listener captures progress -> exposition text
    -> ingest via the custom data source -> aggregate P2-style."""
    import time

    from kafka_connect_spark.streaming.metrics import MetricsListener, to_exposition

    listener = MetricsListener()
    spark.streams.addListener(listener)
    try:
        q = (
            spark.readStream.format("rate")
            .option("rowsPerSecond", 100)
            .load()
            .writeStream.format("noop")
            .option("checkpointLocation", str(tmp_path / "ck"))
            .start()
        )
        deadline = time.time() + 60
        while len(listener.samples) < 4 and time.time() < deadline:
            time.sleep(0.5)
        q.stop()
        q.awaitTermination(30)
    finally:
        spark.streams.removeListener(listener)

    scrape = tmp_path / "scrape.prom"
    scrape.write_text(to_exposition(listener.samples))
    spark.dataSource.register(ExpositionDataSource)
    metrics = spark.read.format("exposition").option("path", str(scrape)).load()
    agg = (
        metrics.groupBy("name")
        .agg(F.count(F.lit(1)).alias("n"), F.sum("value").alias("total"))
        .collect()
    )
    by_name = {r["name"]: r for r in agg}
    assert "num_input_rows" in by_name and by_name["num_input_rows"]["n"] >= 1


def test_exposition_batch_writer_plugin(spark, tmp_path):
    """Custom BATCH writer via the Python DataSource API (completes the
    plugin symmetry: batch read / stream read / stream write / batch
    write): executor part files -> one atomic snapshot.prom on commit;
    append without overwrite refuses."""
    import pytest

    from kafka_connect_spark.sinks.exposition_sink import ExpositionSinkDataSource

    spark.dataSource.register(ExpositionSinkDataSource)
    out = str(tmp_path / "snap")
    df = spark.createDataFrame(
        [("up", 'job="api"', 1.0), ("up", 'job="db"', 0.0)],
        "name string, labels string, value double",
    )
    df.write.format("exposition_sink").option("path", out).mode("overwrite").save()
    text = open(f"{out}/snapshot.prom").read()
    assert 'up{job="api"} 1.0' in text and 'up{job="db"} 0.0' in text
    # second overwrite replaces atomically; append onto an existing
    # snapshot refuses (the DataSource API only passes Append/Overwrite)
    df.write.format("exposition_sink").option("path", out).mode("overwrite").save()
    with pytest.raises(Exception, match="exists"):
        df.write.format("exposition_sink").option("path", out).mode("append").save()


def test_exposition_stream_sink_plugin(spark, tmp_path):
    """Custom streaming SINK via the Python DataSource API: per-batch
    atomic exposition files; roundtrips through the reader plugin."""
    import glob

    from kafka_connect_spark.sinks.exposition_sink import ExpositionSinkDataSource

    spark.dataSource.register(ExpositionSinkDataSource)
    src = str(tmp_path / "metrics_src")
    rows = [("num_input_rows", 'query="q1"', 10.0), ("num_input_rows", 'query="q2"', 20.0)]
    spark.createDataFrame(rows, "name string, labels string, value double").coalesce(
        1
    ).write.parquet(src)

    out = str(tmp_path / "scrapes")
    sdf = spark.readStream.schema("name string, labels string, value double").parquet(src)
    q = (
        sdf.writeStream.format("exposition_sink")
        .option("path", out)
        .option("checkpointLocation", str(tmp_path / "ck"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    files = glob.glob(f"{out}/batch-*.prom")
    assert len(files) == 1
    text = open(files[0]).read()
    assert 'num_input_rows{query="q1"} 10.0' in text

    # close the loop: the reader plugin ingests what the writer published
    spark.dataSource.register(ExpositionDataSource)
    back = spark.read.format("exposition").option("path", files[0]).load()
    assert {(r["name"], r["value"]) for r in back.collect()} == {
        ("num_input_rows", 10.0),
        ("num_input_rows", 20.0),
    }


def test_exposition_datasource_plugin(spark, tmp_path):
    spark.dataSource.register(ExpositionDataSource)
    for i, val in enumerate([1.5, 2.5]):
        (tmp_path / f"scrape{i}.prom").write_text(
            to_exposition(
                [{"name": "num_input_rows", "labels": {"query": f"q{i}"}, "value": val}]
            )
        )
    df = spark.read.format("exposition").option("path", str(tmp_path)).load()
    rows = df.orderBy("value").collect()
    assert [r["value"] for r in rows] == [1.5, 2.5]
    assert rows[0]["name"] == "num_input_rows"
    assert 'query="q0"' in rows[0]["labels"]
    assert df.rdd.getNumPartitions() == 2  # one partition per scrape file


def test_distributed_rank_matches_global_window(spark, sf_dir):
    """distributed_rank (range-repartition + within-range rank + P-row
    offset cumsum) is bit-identical to the naive SinglePartition global
    window on every rank — including desc keys and heavy ties broken by
    id — at several partition counts (boundary placement must never
    change ranks)."""
    from pyspark.sql import Window

    from kafka_connect_spark.catalog import load
    from kafka_connect_spark.functions.skew import distributed_rank

    d = load(spark, sf_dir, "documents").select("doc_id", "n_chars", "lang")
    order = [F.col("n_chars").desc(), F.col("doc_id")]
    naive = {
        r["doc_id"]: r["rk"]
        for r in d.select(
            "doc_id", F.row_number().over(Window.orderBy(*order)).alias("rk")
        ).collect()
    }
    for nparts in (1, 7, 32):
        got = {
            r["doc_id"]: r["rank"]
            for r in distributed_rank(d, order, num_partitions=nparts)
            .select("doc_id", "rank")
            .collect()
        }
        assert got == naive, f"rank mismatch at num_partitions={nparts}"


def test_distributed_ntile_matches_global_window(spark, sf_dir):
    """distributed_ntile reproduces window NTILE's exact allocation rule
    (first N%n tiles take the extra row), including n > distinct-key
    corners and N not divisible by n."""
    from pyspark.sql import Window

    from kafka_connect_spark.catalog import load
    from kafka_connect_spark.functions.skew import distributed_ntile

    d = (
        load(spark, sf_dir, "documents")
        .select("doc_id", "n_chars")
        .limit(403)  # force N % n != 0
    )
    order = [F.col("n_chars"), F.col("doc_id")]
    for n_tiles in (4, 10):
        naive = {
            r["doc_id"]: r["t"]
            for r in d.select(
                "doc_id",
                F.ntile(n_tiles).over(Window.orderBy(*order)).alias("t"),
            ).collect()
        }
        got = {
            r["doc_id"]: r["tile"]
            for r in distributed_ntile(d, n_tiles, order, num_partitions=7)
            .select("doc_id", "tile")
            .collect()
        }
        assert got == naive, f"ntile mismatch at n_tiles={n_tiles}"


def test_distributed_rank_window_is_partitioned(spark, sf_dir):
    """The corpus-sized Window in distributed_rank's plan is partitioned
    on the range-partition id — the full data NEVER crosses a
    SinglePartition exchange (the only SinglePartition work is the
    P-row offset cumsum over the counts aggregate)."""
    from kafka_connect_spark.catalog import load
    from kafka_connect_spark.functions.skew import distributed_rank

    d = load(spark, sf_dir, "documents").select("doc_id", "n_chars")
    out = distributed_rank(d, [F.col("n_chars").desc(), F.col("doc_id")])
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "Exchange rangepartitioning" in plan
    assert "partitionBy=[__pid]" in plan.replace(" ", "") or "__pid" in plan


def test_distributed_rank_consistent_across_branches_and_runs(spark):
    """Regression for the cross-branch boundary divergence found at the
    64x scale probe: repartitionByRange samples boundaries per physical
    execution, and when the counts (broadcast) job and the join job
    don't reuse the exchange, offsets from one partitioning meet
    positions from another — overlapping/missing ranks (x155's tiles
    read 80186/79355/79633/80826 where exact NTILE must give 80000
    each). The persist() in distributed_rank pins ONE partitioner for
    both branches. Invariants, each run, on a 50k synthetic: ranks are
    a 1..N permutation, tiles are exactly equal (N divisible by n), and
    repeated runs agree row-for-row."""
    from kafka_connect_spark.functions.skew import (
        distributed_ntile,
        distributed_rank,
    )

    n = 50_000
    df = spark.range(n).select(
        F.col("id"),
        F.pmod(F.xxhash64("id"), F.lit(997)).alias("k"),
    )
    r = distributed_rank(df, [F.col("k"), F.col("id")], rank_name="rk")
    stats = r.agg(
        F.count("*").alias("n"),
        F.countDistinct("rk").alias("nd"),
        F.min("rk").alias("mn"),
        F.max("rk").alias("mx"),
    ).collect()[0]
    assert (stats["n"], stats["nd"], stats["mn"], stats["mx"]) == (
        n,
        n,
        1,
        n,
    )

    t = distributed_ntile(df, 4, [F.col("k"), F.col("id")], tile_name="tile")
    sizes = (
        t.groupBy("tile").count().orderBy("tile").toPandas()["count"].tolist()
    )
    assert sizes == [n // 4] * 4, sizes

    a = t.toPandas().sort_values("id", ignore_index=True)
    b = t.toPandas().sort_values("id", ignore_index=True)
    pd.testing.assert_frame_equal(a, b)
