"""Skew- and shuffle-management utilities for 100 TB plans.

- ``salted_join``        hot-key equi-join: the skewed (big) side gets a
                         per-row salt, the other side is replicated across
                         all salts, and the join key becomes (key, salt) —
                         a hot key's rows spread over ``n_salts`` reducers
                         instead of one straggler. AQE's skew-join split
                         handles moderate skew automatically; salting is
                         for the pathological keys AQE can't split (e.g. a
                         single key bigger than an executor).
- ``write_bucketed`` /   co-located joins: two tables bucketed by the same
  ``bucketed_join_ready`` key and count join WITHOUT a shuffle (no Exchange
                         in the plan) — the right layout for repeated
                         fact-fact joins at scale.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def salted_join(
    skewed: DataFrame,
    other: DataFrame,
    key: str,
    n_salts: int = 8,
    how: str = "inner",
) -> DataFrame:
    """Equi-join robust to hot keys on the ``skewed`` side.

    Deterministic: the salt is a hash of the skewed side's full row (not
    rand()), so replays produce identical partitioning. The ``other`` side
    is exploded n_salts times — keep it the smaller input."""
    salt = F.pmod(F.xxhash64(*skewed.columns), F.lit(n_salts))
    left = skewed.withColumn("__salt", salt)
    right = other.withColumn(
        "__salt", F.explode(F.array(*[F.lit(i) for i in range(n_salts)]))
    )
    out = left.join(right, [key, "__salt"], how)
    return out.drop("__salt")


def write_bucketed(
    df: DataFrame, table_name: str, key: str, n_buckets: int = 16
) -> None:
    """Persist as a bucketed table: co-partitioned AND co-sorted by key, so
    equi-joins between tables bucketed the same way skip the shuffle."""
    (
        df.write.mode("overwrite")
        .bucketBy(n_buckets, key)
        .sortBy(key)
        .format("parquet")
        .saveAsTable(table_name)
    )


def plan_has_shuffle(df: DataFrame) -> bool:
    """True if the physical plan contains a shuffle exchange (broadcast
    exchanges don't count) — test helper for asserting co-located joins."""
    plan = df._jdf.queryExecution().executedPlan().toString()
    return "Exchange hashpartitioning" in plan or "Exchange rangepartitioning" in plan


def distributed_rank(
    df: DataFrame,
    order_cols,
    rank_name: str = "rank",
    num_partitions: int = 32,
) -> DataFrame:
    """Exact global ``row_number() OVER (ORDER BY order_cols)`` WITHOUT the
    SinglePartition sort that a global window funnels every row through —
    the thing that dies first when the ranked set is corpus-sized at
    100 TB (the x58/x182 two-phase idiom handles small VALUE domains;
    this is the twin for near-unique keys like retrieval scores, where
    per-value aggregation wins nothing).

    Plan: (1) ``repartitionByRange`` on the order columns — ranges are
    ordered, so partition i's rows all precede partition i+1's — then
    ``sortWithinPartitions`` (post-shuffle, so partition-internal order
    never depends on how the exchange delivered blocks); (2) within-
    partition position via ``monotonically_increasing_id`` decomposed as
    (partition_id << 33) + row_index — a NARROW projection in the same
    stage as the sort, no second shuffle and no Window exec at all; (3)
    global rank = within-position + the cumulative row count of earlier
    partitions — a ``num_partitions``-row cumsum (the only single-
    partition work; its input is the map-side-combined per-partition
    counts, bytes ~ num_partitions) broadcast-joined back. Exactness does
    not depend on range boundaries (sampling skew only unbalances tasks,
    never reorders ranks; the explicit numPartitions also pins the
    exchange against AQE re-planning), and the order columns must make
    rows unique (include a tiebreak id, exactly as a deterministic global
    window already requires). Total cost over the unsafe global window:
    the range exchange replaces the SinglePartition exchange — same
    bytes moved, spread over num_partitions tasks instead of one.

    The partitioned frame is ``persist()``-ed (lazy — no build-time
    job) before it fans out to the counts branch and the join branch.
    This is CORRECTNESS, not caching courtesy: ``repartitionByRange``
    SAMPLES its boundaries per physical execution, and the broadcast
    (counts) side runs as its own job — when Catalyst's exchange reuse
    does not unify the two subtrees (column pruning alone can make the
    exchanges structurally unequal), each job samples boundaries
    independently, and offsets computed against one partitioning are
    added to positions computed against another: overlapping/missing
    ranks. Observed in the wild at the 64x scale probe — x155's tile
    sizes came out 80186/79355/79633/80826 where exact NTILE of 320k
    rows must give 80000 each, varying run to run. The persist pins ONE
    InMemoryRelation (one partitioner, one boundary sample) that both
    branches read; evicted blocks recompute through the same RDD
    lineage and partitioner object, so consistency survives memory
    pressure. Cost: one cached pass over the PROJECTED rank columns
    (callers select before ranking), LRU-evictable.

    ``order_cols``: list of Column expressions WITH sort order (e.g.
    ``[F.col("score").desc(), F.col("doc_id")]``) — passed identically to
    the range partitioner and the within-partition sort."""
    from pyspark.sql import Window

    d = (
        df.repartitionByRange(num_partitions, *order_cols)
        .sortWithinPartitions(*order_cols)
        .withColumn("__mid", F.monotonically_increasing_id())
        .withColumn("__pid", F.shiftright("__mid", 33))
        .withColumn(
            "__rin", F.col("__mid") - F.shiftleft(F.col("__pid"), 33) + 1
        )
    ).persist()
    counts = d.groupBy("__pid").agg(F.count(F.lit(1)).alias("__cnt"))
    w_off = Window.orderBy("__pid").rowsBetween(Window.unboundedPreceding, -1)
    # num_partitions rows — the bounded single-partition cumsum
    offs = counts.select(
        "__pid",
        F.coalesce(F.sum("__cnt").over(w_off), F.lit(0)).alias("__off"),
    )
    return (
        d.join(F.broadcast(offs), "__pid")
        .withColumn(
            rank_name, (F.col("__off") + F.col("__rin")).cast("long")
        )
        .drop("__pid", "__rin", "__off", "__mid")
    )


def distributed_ntile(
    df: DataFrame,
    n_tiles: int,
    order_cols,
    tile_name: str = "tile",
    num_partitions: int = 32,
) -> DataFrame:
    """Exact global ``ntile(n) OVER (ORDER BY order_cols)`` via
    ``distributed_rank`` + NTILE's allocation rule in integer arithmetic
    (q = N div n rows per tile; the first N mod n tiles take one extra) —
    same contract and caveats as ``distributed_rank``."""
    ranked = distributed_rank(
        df, order_cols, rank_name="__rk", num_partitions=num_partitions
    )
    tot = ranked.agg(F.count(F.lit(1)).alias("__n"))
    # all-integer allocation (exact at any N): q = N div n, r = N mod n;
    # rank rk lands in tile (rk-1) div (q+1) while inside the first
    # r*(q+1) rows, else r + (rk - r*(q+1) - 1) div q. CASE guards the
    # q=0 (N < n) corner: every row is then in the WHEN branch.
    expr = (
        f"cast(CASE WHEN __rk <= (__n % {n_tiles}) * ((__n div {n_tiles}) + 1)"
        f" THEN (__rk - 1) div ((__n div {n_tiles}) + 1)"
        f" ELSE (__n % {n_tiles})"
        f"  + (__rk - (__n % {n_tiles}) * ((__n div {n_tiles}) + 1) - 1)"
        f"    div (__n div {n_tiles})"
        f" END + 1 as int)"
    )
    return (
        ranked.crossJoin(F.broadcast(tot))
        .withColumn(tile_name, F.expr(expr))
        .drop("__rk", "__n")
    )


def distributed_group_prefix_sum(
    df: DataFrame,
    part_cols,
    order_cols,
    val_col: str,
    out: str = "__csum",
    num_partitions: int = 32,
) -> DataFrame:
    """Exact per-group running SUM — ``sum(val) OVER (PARTITION BY
    part_cols ORDER BY order_cols ROWS UNBOUNDED PRECEDING)`` — WITHOUT
    funneling each group through one task. A plain partitionBy window
    hash-partitions on the GROUP key, so a dominant group (one language
    of a trillion-token corpus, in the packing family's case) becomes a
    single sorted task: the thing that dies first at 100 TB.

    Plan (distributed_rank's two-phase idiom generalized from COUNT to
    SUM): (1) ``repartitionByRange`` on (part_cols + order_cols) — a
    group's rows land in consecutive range partitions, each partition
    holding a contiguous slice of one or more groups; (2) within each
    partition a (pid, group)-keyed window computes the LOCAL running
    sum — bounded by the partition, never the group; (3) per
    (pid, group) totals (<= num_partitions x |groups| rows — the only
    single-partition work) cumsum into offsets, broadcast-joined back;
    global running sum = local running sum + the group's offset from
    earlier partitions. The partitioned frame is persist()-pinned
    before fanning out to the totals branch and the join branch — the
    SAME cross-branch boundary-consistency requirement (and fix)
    documented on distributed_rank above.

    Cost note: the (pid, group)-keyed local window adds one hash
    exchange over the plain window's single exchange — the price of
    spreading a dominant group over num_partitions tasks instead of
    one. ``order_cols`` must totally order rows within a group
    (include a tiebreak id). ``part_cols``: list of column NAMES;
    ``order_cols``: list of Columns; output column ``out`` is the
    INCLUSIVE running sum."""
    from pyspark.sql import Window

    part_names = list(part_cols)
    d = (
        df.repartitionByRange(num_partitions, *part_names, *order_cols)
        .withColumn("__pid", F.spark_partition_id())
    ).persist()
    w_loc = (
        Window.partitionBy("__pid", *part_names)
        .orderBy(*order_cols)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    local = d.withColumn("__lsum", F.sum(val_col).over(w_loc))
    totals = d.groupBy("__pid", *part_names).agg(
        F.sum(val_col).alias("__tot")
    )
    w_off = (
        Window.partitionBy(*part_names)
        .orderBy("__pid")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    offs = totals.select(
        "__pid",
        *part_names,
        F.coalesce(F.sum("__tot").over(w_off), F.lit(0)).alias("__off"),
    )
    return (
        local.join(F.broadcast(offs), ["__pid", *part_names])
        .withColumn(out, (F.col("__off") + F.col("__lsum")).cast("long"))
        .drop("__pid", "__lsum", "__off")
    )
