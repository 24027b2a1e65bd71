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
