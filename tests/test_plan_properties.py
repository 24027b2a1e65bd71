"""Physical-plan regression tests: the plan SHAPES the 100 TB design
depends on, asserted programmatically so they can't silently regress
(docs/PLANS.md is the human-readable dump of the same evidence).

Each assertion names the property that makes the operator scale: filters
reaching the scan, small sides broadcast, top-k avoiding global sorts,
windows partitioned, group limits pushed below the sort."""

from __future__ import annotations

import pytest

from kafka_connect_spark.queries import QUERIES


def _plan(spark, sf_dir, name: str) -> str:
    df = QUERIES[name](spark, sf_dir)
    return df._jdf.queryExecution().executedPlan().toString()


def _optimized(spark, sf_dir, name: str) -> str:
    df = QUERIES[name](spark, sf_dir)
    return df._jdf.queryExecution().toString()


def test_s1_filter_pushed_to_scan(spark, sf_dir):
    plan = _plan(spark, sf_dir, "s1_jdbc_timestamp_scan")
    assert "PushedFilters: [IsNotNull(o_orderdate), GreaterThan(o_orderdate" in plan


def test_x2_star_join_broadcasts_dimensions(spark, sf_dir):
    plan = _plan(spark, sf_dir, "x2_join_star_q5")
    assert "BroadcastHashJoin" in plan
    # partial+final aggregation (map-side combine before the shuffle)
    assert plan.count("HashAggregate") >= 2


def test_x8_topk_is_take_ordered(spark, sf_dir):
    plan = _plan(spark, sf_dir, "x8_topk")
    assert "TakeOrderedAndProject" in plan  # no global Sort + Limit


def test_p7_window_is_partitioned(spark, sf_dir):
    plan = _plan(spark, sf_dir, "p7_avg_over_time")
    assert "Window" in plan
    # per-series windows hash-partition on the series key; a global window
    # would funnel the whole table through one SinglePartition exchange
    assert "hashpartitioning(user_id" in plan


def test_x34_group_limit_pushed_below_sort(spark, sf_dir):
    plan = _plan(spark, sf_dir, "x34_topk_per_group")
    assert "WindowGroupLimit" in plan  # k rows per group, not full sort


def test_x28_benchmark_side_broadcast(spark, sf_dir):
    plan = _plan(spark, sf_dir, "x28_contamination_check")
    assert "BroadcastHashJoin" in plan  # holdout shingles broadcast


def test_x30_filter_is_map_side(spark, sf_dir):
    plan = _plan(spark, sf_dir, "x30_mixture_resample")
    # only exchange is the output-order sort: no hash/aggregate shuffle
    assert "hashpartitioning" not in plan
    assert "rangepartitioning" in plan  # the ORDER BY for the oracle


def test_x27_join_keys_include_salt(spark, sf_dir):
    plan = _optimized(spark, sf_dir, "x27_salted_skew_join")
    assert "__salt" in plan


def test_entry_query_prunes_columns(spark, sf_dir):
    """The flagship star join must not scan all lineitem columns for a
    2-measure aggregate (column pruning reached the reader)."""
    plan = _plan(spark, sf_dir, "x2_join_star_q5")
    scans = [
        s for s in plan.split("FileScan parquet")[1:] if "lineitem.parquet" in s
    ]
    assert scans, f"no lineitem scan found in plan:\n{plan[:2000]}"
    read_schema = scans[0].split("ReadSchema:")[1].split("\n")[0]
    assert "l_comment" not in read_schema and "l_shipdate" not in read_schema


def test_x36_quota_cap_group_limit_below_sort(spark, sf_dir):
    plan = _plan(spark, sf_dir, "x36_source_quota_cap")
    assert "WindowGroupLimit" in plan  # per-source cap prunes before sort
    assert "hashpartitioning(source" in plan  # partitioned by source key


def test_x35_array_ops_stay_map_side(spark, sf_dir):
    plan = _plan(spark, sf_dir, "x35_embedding_array_ops")
    # higher-order array functions: no explode-row-blowup, no agg shuffle —
    # only the output-order sort exchanges data
    assert "Generate" not in plan
    assert "hashpartitioning" not in plan


def test_x37_incremental_dedup_shuffles_hashes_not_text(spark, sf_dir):
    plan = _plan(spark, sf_dir, "x37_incremental_dedup")
    # source filters reach both parquet scans
    assert "PushedFilters: [IsNotNull(source), EqualTo(source,src0)]" in plan
    assert "PushedFilters: [IsNotNull(source), Not(EqualTo(source,src0))]" in plan
    # anti-join on the 16-byte fingerprint, reference side reduced to
    # distinct hashes (and broadcast at this scale)
    assert "LeftAnti" in plan
    # keep-first is a group-limit (partial+final): only one row per hash
    # survives the map side, never the whole dup group
    assert plan.count("WindowGroupLimit") >= 2
    # the fingerprint projection sits BELOW the hash exchange: the join and
    # window shuffle hashes + 3 small columns, never document text
    import re

    ex = re.search(r"Exchange hashpartitioning\(h#\d+", plan)
    assert ex is not None


def test_p16_topk_ranks_aggregated_series(spark, sf_dir):
    plan = _plan(spark, sf_dir, "p16_topk_bottomk")
    # series sum aggregates partial+final BEFORE any window: the rank input
    # is |series|, not |events|
    assert plan.count("HashAggregate") >= 2
    assert "Window" in plan
    assert "hashpartitioning(event_type" in plan


def test_x45_q10_pushdown_broadcast_topk(spark, sf_dir):
    plan = _plan(spark, sf_dir, "x45_returned_revenue_q10")
    # returnflag filter reaches the lineitem scan
    assert "EqualTo(l_returnflag,R)" in plan
    # nation broadcast; top-20 via TakeOrderedAndProject, no global sort
    assert "BroadcastHashJoin" in plan
    assert "TakeOrderedAndProject" in plan


def test_x46_q18_aggregates_before_join(spark, sf_dir):
    plan = _plan(spark, sf_dir, "x46_large_orders_q18")
    # the HAVING agg runs below the joins (partial+final pair over the
    # lineitem scan), so the joins see |qualifying orders| rows; top-100
    # never global-sorts. The tree prints root-first, so the aggregate
    # lines must appear BELOW (after) the join lines in the dump.
    assert plan.count("HashAggregate") >= 2
    assert "TakeOrderedAndProject" in plan
    assert plan.index("Join") < plan.index("HashAggregate")


def test_x47_q4_exists_is_semi_join(spark, sf_dir):
    plan = _plan(spark, sf_dir, "x47_priority_check_q4")
    # correlated EXISTS decorrelated to a semi join carrying the lateness
    # predicate — no row multiplication before the aggregate
    assert "LeftSemi" in plan
    assert "INTERVAL '60' DAY" in plan
    assert plan.count("HashAggregate") >= 2  # partial+final
    # the order-date window reaches the orders scan
    assert "(o_orderdate" in plan[plan.index("FileScan") :]


def test_x48_q21_semi_anti_share_orderkey_partitioning(spark, sf_dir):
    plan = _plan(spark, sf_dir, "x48_suppliers_kept_waiting_q21")
    assert "LeftSemi" in plan and "LeftAnti" in plan
    assert "TakeOrderedAndProject" in plan  # top-10, no global sort
    # supplier is a broadcast dim, never shuffled
    assert "BroadcastHashJoin [l_suppkey" in plan


def test_x49_q22_anti_side_prefiltered_scalar_broadcast(spark, sf_dir):
    plan = _plan(spark, sf_dir, "x49_dormant_rich_customers_q22")
    assert "LeftAnti" in plan
    # the 1-row average broadcasts (identity mode), not a shuffled join
    assert "IdentityBroadcastMode" in plan
    # recent-orders date filter is pushed into the anti side's scan
    assert "o_orderdate" in plan.split("LeftAnti", 1)[1]


def test_x52_q17_decorrelated_avg_joins_on_partkey(spark, sf_dir):
    plan = _plan(spark, sf_dir, "x52_small_qty_revenue_q17")
    # the 0.2*avg subquery became a per-part aggregate joined on l_partkey
    assert "hashpartitioning(l_partkey" in plan
    # brand filter pushed into the part scan before any join
    assert "Brand#23" in plan
    # boundary test runs in exact decimal, not double division
    assert "decimal(38,6)" in plan


def test_x56_range_frame_partitioned_per_user(spark, sf_dir):
    plan = _plan(spark, sf_dir, "x56_time_range_rolling")
    assert "RangeFrame, -3600" in plan  # time-distance frame, not ROWS
    assert "hashpartitioning(user_id" in plan  # per-series, never global


def test_x53_lm_join_aggregates_before_shuffle(spark, sf_dir):
    plan = _plan(spark, sf_dir, "x53_unigram_lm_score")
    # vocab counts partial-aggregate map-side before the token shuffle
    assert plan.count("partial_count") >= 1
    # corpus total is a 1-row broadcast, not a shuffled join
    assert "IdentityBroadcastMode" in plan


def test_x59_scd2_single_user_partitioning(spark, sf_dir):
    plan = _plan(spark, sf_dir, "x59_scd2_history")
    # lag-collapse, version, and validity windows all share ONE
    # hash-partitioning on user_id — a single shuffle of the change stream
    assert plan.count("Exchange hashpartitioning(user_id") == 1
    assert "Exchange SinglePartition" not in plan


def test_x60_transition_totals_broadcast(spark, sf_dir):
    plan = _plan(spark, sf_dir, "x60_transition_matrix")
    assert "hashpartitioning(user_id" in plan  # per-user sequence window
    assert "BroadcastHashJoin" in plan  # row totals broadcast, no re-shuffle


def test_x62_q6_all_predicates_reach_scan(spark, sf_dir):
    plan = _plan(spark, sf_dir, "x62_forecast_revenue_q6")
    scan = plan[plan.index("FileScan") :]
    # date window + discount band + quantity cap all pushed
    assert "l_shipdate" in scan and "l_discount" in scan and "l_quantity" in scan
    assert plan.count("HashAggregate") == 2  # partial + final, nothing else


def test_x64_q8_ratio_is_one_aggregation(spark, sf_dir):
    plan = _plan(spark, sf_dir, "x64_market_share_q8")
    # numerator (conditional) and denominator accumulate in the SAME agg
    assert "CASE WHEN (supp_nation" in plan
    # region filter pushed into its dim scan before broadcast
    assert "(r_name" in plan and "EUROPE" in plan
    # the fact table is scanned once (one lineitem FileScan)
    assert plan.count("lineitem.parquet") == 1


def test_x66_q13_left_join_keeps_zero_customers(spark, sf_dir):
    plan = _plan(spark, sf_dir, "x66_customer_distribution_q13")
    assert "LeftOuter" in plan  # not Inner: zero-order customers survive
    # the priority predicate filters the ORDERS side pre-join, not post-join
    assert "o_orderpriority" in plan.split("LeftOuter", 1)[1]


def test_x68_q19_disjunction_prunes_both_sides(spark, sf_dir):
    plan = _plan(spark, sf_dir, "x68_disjunctive_revenue_q19")
    scans = plan[plan.index("FileScan") :]
    # Catalyst extracts the common conjuncts: part pruned to the 3 brands,
    # lineitem pruned to the quantity envelope, BEFORE the join
    assert "p_brand" in scans
    assert "l_quantity" in scans


def test_runtime_bloom_filter_prunes_fact_side(spark, sf_dir):
    """100 TB evidence: with AQE runtime filtering on, a selective dim
    filter induces a bloom_filter_agg on the dim side applied to the fact
    scan BEFORE the shuffle join — the runtime analog of a static
    partition prune. The size thresholds are lowered to model the
    big-data regime (the stock 10GB application-side threshold exists
    precisely so this only fires when the fact side is huge — which is
    the regime the engine targets)."""
    from kafka_connect_spark.catalog import load
    from pyspark.sql import functions as F

    confs = {
        "spark.sql.optimizer.runtime.bloomFilter.enabled": "true",
        "spark.sql.optimizer.runtime.bloomFilter.applicationSideScanSizeThreshold": "1KB",
        "spark.sql.optimizer.runtime.bloomFilter.creationSideThreshold": "100MB",
        "spark.sql.autoBroadcastJoinThreshold": "-1",  # force the shuffle join
    }
    saved = {k: spark.conf.get(k, None) for k in confs}
    try:
        for k, v in confs.items():
            spark.conf.set(k, v)
        li = load(spark, sf_dir, "lineitem")
        o = load(spark, sf_dir, "orders").filter(F.col("o_orderpriority") == "1-URGENT")
        j = li.join(o, li.l_orderkey == o.o_orderkey).groupBy("o_orderpriority").count()
        plan = j._jdf.queryExecution().optimizedPlan().toString()
        assert "bloom_filter_agg" in plan or "BloomFilter" in plan
        assert "might_contain" in plan  # the fact-side application
        # and the result is still correct under the rewritten plan
        got = {r["o_orderpriority"]: r["count"] for r in j.collect()}
        want = {
            r["o_orderpriority"]: r["count"]
            for r in li.join(o, li.l_orderkey == o.o_orderkey)
            .groupBy("o_orderpriority")
            .count()
            .collect()
        }
        assert got == want and sum(got.values()) > 0
    finally:
        for k, v in saved.items():
            if v is None:
                spark.conf.unset(k)
            else:
                spark.conf.set(k, v)


def test_x138_bucket_model_broadcast_score_join(spark, sf_dir):
    """DSIR scoring must join the exploded gram stream to the 1024-bucket
    score table via BROADCAST (the model is fixed-size by construction) —
    a shuffle-hash join here would re-shuffle the whole token stream."""
    plan = _plan(spark, sf_dir, "x138_dsir_importance_weights")
    assert "BroadcastHashJoin" in plan
    # the per-doc weight agg is partial+final (map-side combine)
    assert plan.count("HashAggregate") >= 2


def test_x140_bm25_broadcasts_stats_and_takeordered(spark, sf_dir):
    """BM25's df table (|query terms| rows) and the (nd, avgdl) scalar
    must broadcast; top-10 must be TakeOrdered, not global sort+limit;
    and the query-term filter must prune the token stream BEFORE the
    tf aggregation (only matching postings shuffle)."""
    plan = _plan(spark, sf_dir, "x140_bm25_retrieval")
    assert "BroadcastHashJoin" in plan
    assert "TakeOrderedAndProject" in plan
    opt = _optimized(spark, sf_dir, "x140_bm25_retrieval")
    assert "table" in opt and "Filter" in opt


def test_x130b_sample_is_takeordered_then_broadcast(spark, sf_dir):
    """The sampled histogram's whole point is O(m^2) independent of n:
    the md5-clock sample must be TakeOrdered(128) over a narrow
    projection (never a full sort) and the m-row pair join must be a
    broadcast nested loop, not a shuffle."""
    plan = _plan(spark, sf_dir, "x130b_cosine_histogram_sampled")
    assert "TakeOrderedAndProject" in plan
    assert "BroadcastNestedLoopJoin" in plan


def test_x153_overlap_has_no_user_self_join(spark, sf_dir):
    """x153's pair counts must come from per-user type SETS expanded by a
    higher-order transform — never a user-keyed self-join (the |users| x
    |types|^2 blowup the docstring rules out). Joins in the plan are only
    the two broadcast total lookups on the tiny per-type table."""
    plan = _plan(spark, sf_dir, "x153_audience_overlap")
    assert "SortMergeJoin" not in plan
    assert "ShuffledHashJoin" not in plan
    assert "Generate explode" in plan or "Generate" in plan
    assert plan.count("BroadcastHashJoin") == 2


def test_x154_correlation_is_joinless(spark, sf_dir):
    """Dimension-pair products are generated inside each row (JVM
    higher-order transform) and aggregated — the single-pass moment-matrix
    shape. ANY join in this plan means an accidental self-join crept in."""
    plan = _plan(spark, sf_dir, "x154_dim_correlation")
    for j in ("SortMergeJoin", "BroadcastHashJoin", "ShuffledHashJoin",
              "CartesianProduct", "BroadcastNestedLoopJoin"):
        assert j not in plan, j
    assert plan.count("HashAggregate") >= 2  # partial + final


def test_x157_centroids_broadcast_not_shuffled(spark, sf_dir):
    """The k x d centroid table must BROADCAST into the per-vector distance
    pass (zip_with fold) — the corpus is scanned once and never shuffled
    by (vector, label). The only wide exchanges are the tiny centroid agg
    and the per-label rollup."""
    plan = _plan(spark, sf_dir, "x157_label_silhouette")
    assert "BroadcastNestedLoopJoin" in plan  # broadcast crossJoin of 10 rows
    assert "SortMergeJoin" not in plan


def test_x158_interval_join_is_user_keyed(spark, sf_dir):
    """The attribution range join must key on user_id (co-partitioned
    equi-join with the interval as a range predicate), not degenerate into
    a cartesian/broadcast-nested-loop over the whole table."""
    plan = _plan(spark, sf_dir, "x158_view_purchase_attribution")
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan
    assert "user_id" in plan


def _executed_after_run(spark, sf_dir, name: str) -> str:
    """Final AQE plan — static explain shows duplicated subtrees that AQE
    collapses at runtime via ReusedExchange; collect() first so the
    assertion sees what actually executed."""
    df = QUERIES[name](spark, sf_dir)
    df.collect()
    return df._jdf.queryExecution().executedPlan().toString()


def test_x219_session_pipeline_reused_not_recomputed(spark, sf_dir):
    """The sessionize -> minute-explode -> concurrency agg feeds both the
    per-day max and the argmax join-back; AQE must reuse that exchange,
    not run the session pipeline twice (at 100 TB it's the whole cost)."""
    plan = _executed_after_run(spark, sf_dir, "x219_peak_concurrency")
    assert "ReusedExchange" in plan
    # and the sessionize window is user-partitioned, never global
    assert "hashpartitioning(user_id" in plan


def test_x228_basket_distinct_reused_across_supports_and_pairs(spark, sf_dir):
    """The distinct (order, part) basket table feeds the pair self-join,
    the item supports and the order count; its shuffle must be built once
    and reused — four independent corpus distincts would quadruple the
    dominant cost."""
    plan = _executed_after_run(spark, sf_dir, "x228_association_rules")
    assert "ReusedExchange" in plan
    assert "BroadcastHashJoin" in plan  # item supports broadcast back


def test_x212_rank_tables_broadcast_and_reused(spark, sf_dir):
    """KW's midrank/total/group tables are value-domain aggregates joined
    back by broadcast; the (source, length) aggregation exchange is
    reused, and no corpus-wide sort exists (ranks come from the length
    histogram cumsum, not an orderBy over documents)."""
    plan = _executed_after_run(spark, sf_dir, "x212_kruskal_wallis_length")
    assert "ReusedExchange" in plan
    assert "BroadcastHashJoin" in plan


def test_x224_isotonic_in_row_minimax_no_joins(spark, sf_dir):
    """r15: the <=20-bin PAV minimax is evaluated IN-ROW on the sorted
    bin array (higher-order functions after one corpus agg + one 1-row
    agg) — no join of any kind may appear, and in particular no shuffle
    join, which would mean the bin table was mis-sized as corpus data."""
    plan = _plan(spark, sf_dir, "x224_isotonic_calibration")
    for shape in (
        "SortMergeJoin",
        "BroadcastHashJoin",
        "BroadcastNestedLoopJoin",
        "CartesianProduct",
        "ShuffledHashJoin",
    ):
        assert shape not in plan
    assert "array_max" in plan and "array_min" in plan


def test_x221_jl_projection_matrix_broadcast(spark, sf_dir):
    """The 1024-row sign matrix joins the exploded coordinates by
    broadcast; shuffling the corpus by dimension id for a 1 KB matrix
    would be the classic small-dim mistake."""
    plan = _plan(spark, sf_dir, "x221_jl_projection_distortion")
    assert "BroadcastHashJoin" in plan


def test_x246_q2_shape(spark, sf_dir):
    """Q2: dims broadcast into the derived partsupp, the part filter
    reaches the scan, and the top-100 is TakeOrderedAndProject (no
    global sort). The eu<->min-cost rejoin MAY shuffle — both sides are
    |parts|-sized at scale, which is the correct plan."""
    plan = _plan(spark, sf_dir, "x246_min_cost_supplier_q2")
    assert plan.count("BroadcastHashJoin") >= 5
    assert "TakeOrderedAndProject" in plan
    assert "EqualTo(p_size,15)" in plan  # pushed to the part scan


def test_x247_q11_no_sort_merge_join(spark, sf_dir):
    """Q11: supplier semi-join and the 1-row total both broadcast; the
    only shuffle is the ps_partkey hash agg — no SortMergeJoin
    anywhere."""
    plan = _plan(spark, sf_dir, "x247_important_stock_q11")
    assert "SortMergeJoin" not in plan
    assert plan.count("BroadcastHashJoin") >= 3


def test_x248_q20_filters_pushed(spark, sf_dir):
    """Q20: the shipdate range reaches the lineitem scan (the only
    corpus-sized input) and red parts ride a broadcast semi-join."""
    plan = _plan(spark, sf_dir, "x248_excess_inventory_q20")
    assert "GreaterThanOrEqual(l_shipdate" in plan
    assert "BroadcastHashJoin" in plan
    assert "SortMergeJoin" not in plan


def test_x265_single_pass_three_policies(spark, sf_dir):
    """The three keep-policy ranks must come from ONE corpus scan with
    each cluster-partitioned window evaluated once (the union-of-filters
    form re-evaluated all three windows per branch — 9 Window nodes,
    3 scans)."""
    plan = _plan(spark, sf_dir, "x265_keep_policy_comparison")
    assert plan.count("Window") == 3
    assert plan.count("Scan parquet") == 1


def test_x252_hrw_no_shuffle_before_argmax(spark, sf_dir):
    """HRW weights are a map-side fan-out; the only joins are the doc_id
    regime self-join and the broadcast rollup — no SortMergeJoin."""
    plan = _plan(spark, sf_dir, "x252_shard_rebalance_audit")
    assert "SortMergeJoin" not in plan


def test_x249_raking_windows_on_cells(spark, sf_dir):
    """All four raking steps are windows over the ONE materialized cell
    table — no corpus re-scan per step (the checkpoint cut), and no
    shuffle join anywhere."""
    plan = _plan(spark, sf_dir, "x249_ipf_raking")
    assert plan.count("Scan parquet") == 0  # cells come from the checkpoint
    assert "Scan ExistingRDD" in plan or "LocalTableScan" in plan
    assert "SortMergeJoin" not in plan


def test_x263_and_x253_single_corpus_pass(spark, sf_dir):
    """Both build a bounded value-domain table from ONE corpus pass and
    derive everything from the cut — the static plan shows zero parquet
    re-scans after the checkpoint."""
    for name in ("x263_operating_point", "x253_quantile_normalize_length"):
        plan = _plan(spark, sf_dir, name)
        assert plan.count("Scan parquet") == 0, name


def test_x272_block_dedup_two_hash_aggs_no_window(spark, sf_dir):
    """Segment dedup's keeper selection must be a hash agg (min over the
    encoded clock) + a join back on the block hash — NEVER a per-hash
    window (a sort per group) and never a pair join. Fixture-scale AQE
    may broadcast the keeper side; the property that survives 100x is
    the absence of any nested-loop/cartesian shape and the partial+final
    agg pairs."""
    plan = _plan(spark, sf_dir, "x272_segment_dedup_prune")
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan
    assert "Window" not in plan
    assert plan.count("HashAggregate") >= 4  # keeper min + source agg, x2


def test_x273_split_audit_one_bounds_broadcast(spark, sf_dir):
    """The temporal split's only join is the 1-row epoch-bounds broadcast
    (BroadcastNestedLoopJoin on a literal-true condition); everything
    else is two hash aggs ((type,user) then type). A SortMergeJoin or
    Window here would mean the bounds were recomputed per row group."""
    plan = _plan(spark, sf_dir, "x273_temporal_split_audit")
    assert plan.count("BroadcastNestedLoopJoin") == 1
    assert "SortMergeJoin" not in plan
    assert "Window" not in plan
    assert plan.count("HashAggregate") >= 4


def test_x274_hubness_sample_then_group_limit(spark, sf_dir):
    """Hubness: the 256-sample must be TakeOrdered (never a global sort),
    the top-5 rank must run under WindowGroupLimit (rows capped below
    the sort), and the in-degree join back to the sample must broadcast
    — the O(m^2) block is constant-size at any corpus."""
    plan = _plan(spark, sf_dir, "x274_knn_hubness_audit")
    assert "TakeOrderedAndProject" in plan
    assert "WindowGroupLimit" in plan
    assert "BroadcastHashJoin" in plan
    assert "CartesianProduct" not in plan


def test_x275_anisotropy_mean_scan_plus_constant_pairs(spark, sf_dir):
    """Anisotropy: the mean vector is ONE posexplode scan -> hash agg
    (partial+final) repacked by a bounded ObjectHashAggregate
    (collect_list over |dim| rows); the pair average is a broadcast
    self-join among 128 sampled rows. Corpus growth must touch only the
    scan — assert the sample is TakeOrdered and no shuffle join exists."""
    plan = _plan(spark, sf_dir, "x275_anisotropy_audit")
    assert "TakeOrderedAndProject" in plan
    assert "SortMergeJoin" not in plan
    assert "CartesianProduct" not in plan
    assert "ObjectHashAggregate" in plan


def test_x276_share_matrix_in_row_pairs_no_self_join(spark, sf_dir):
    """The share matrix must generate source pairs IN-ROW from the per-h
    collect_set (ObjectHashAggregate) — never an h-keyed self-join of
    the block table (which re-shuffles block volume twice and fans out
    per-h rows). The totals joins must broadcast (<=|sources| rows)."""
    plan = _plan(spark, sf_dir, "x276_segment_share_matrix")
    assert "ObjectHashAggregate" in plan  # collect_set, partial+final
    assert "SortMergeJoin" not in plan
    assert "CartesianProduct" not in plan
    assert plan.count("BroadcastHashJoin") == 2  # the two totals joins


def test_x277_sweep_single_scan_tagged_explode(spark, sf_dir):
    """The 4-way size fan-out must ride the tagged explode, never a
    per-size scan union: exactly the TWO scans of x272's two-consumer
    shape (keeper build + probe side), not eight (4 sizes x 2). Keeper
    stays a hash agg + join back — no window, no nested loop."""
    plan = _plan(spark, sf_dir, "x277_segment_size_sweep")
    # directional: the tagged explode means FAR fewer than the 8 scans
    # (4 sizes x 2 consumers) a per-size union would cost; exchange
    # reuse may legally collapse the two consumers to one.
    assert 1 <= plan.count("Scan parquet") <= 2
    assert "Window" not in plan
    assert "BroadcastNestedLoopJoin" not in plan
    assert "CartesianProduct" not in plan


def test_x278_manifest_gram_side_broadcast(spark, sf_dir):
    """The freeze manifest joins the eval gram set by BROADCAST (x269's
    property) and carries no nested-loop/cartesian shape; the keeper
    selection is a hash agg, not a window."""
    plan = _plan(spark, sf_dir, "x278_freeze_manifest")
    assert "BroadcastHashJoin" in plan
    assert "Window" not in plan
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan


def test_x279_blocklist_top_k_before_rank(spark, sf_dir):
    """The blocklist's top-k must be the DISTRIBUTED TakeOrderedAndProject
    (per-partition heads, driver merge), never a global rank window over
    the df tail; the rank window may only ever see the <= 20 survivors,
    so it sits ABOVE the TakeOrdered in the plan. The df-floor Filter
    sits below both, and there is no nested loop anywhere."""
    plan = _plan(spark, sf_dir, "x279_boilerplate_blocklist")
    import re

    assert "TakeOrderedAndProject" in plan
    df_filter = re.search(r"Filter \(n_docs#\d+L? >= 3\)", plan)
    assert df_filter is not None
    # executed plan prints top-down: Window above TakeOrdered above Filter
    assert plan.index("Window") < plan.index("TakeOrderedAndProject")
    assert df_filter.start() > plan.index("TakeOrderedAndProject")
    assert "BroadcastNestedLoopJoin" not in plan
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan
    assert "CartesianProduct" not in plan


def test_x280_leak_profile_broadcasts_eval_grams(spark, sf_dir):
    """x269's plan property inverted but identical: the corpus-side
    gram explode probes a BROADCAST of the eval gram set, and the
    zero-leak left join keeps eval items as real rows without any
    nested-loop shape."""
    plan = _plan(spark, sf_dir, "x280_eval_item_leak_profile")
    assert "BroadcastHashJoin" in plan
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan


def test_x150_signature_is_min_agg_columns_not_explode(spark, sf_dir):
    """The MinHash signature build must be 64 min-agg COLUMNS over the
    shingle occurrence stream (one partial HashAggregate carrying 64
    min buffers) followed by a stack() unpivot — never the occurrence
    x 64 row explode, which spilled at the 64x octave (164s -> 69s,
    docs/SCALING.md). The property is pinned on x150 because x281's
    localCheckpoint hides its (identical, shared-builder) upstream
    plan; both ride dedupfns.md5_minhash_rows."""
    plan = _plan(spark, sf_dir, "x150_minhash_calibration")
    # min buffers present (the toString elides long agg lists, so >= 1)
    assert plan.count("partial_min") >= 1
    assert "stack" in plan.lower()  # the |docs| x 64 unpivot
    # the old shape's hash-id fan-out is gone
    assert "explode(sequence(0, 63" not in plan


def test_lsh_candidate_dedup_exchange_is_pinned(spark, sf_dir):
    """r16: the LSH candidate dedup rides a user repartition on the
    query/pair id (REPARTITION_BY_NUM — exempt from AQE's byte-based
    coalescing, which had starved the CPU-dense dedup+verify stages to
    10 of 32 cores) instead of .distinct()'s ENSURE_REQUIREMENTS
    exchange on the full pair key. Pinned on x284 (lsh_cosine_pairs)
    and x274b (lsh_knn_graph). In x12e (dedupfns.lsh_candidate_pairs)
    the band self-join broadcasts one side, so the stream side KEEPS the
    signature aggregation's hash(id) partitioning and the optimizer
    removes the now-redundant repartition — pin that the dedup there
    introduces no ENSURE_REQUIREMENTS exchange on the pair key either."""
    import re

    for name, key in [
        ("x284_embedding_near_dup_lsh_centered", "id_a"),
        ("x274b_knn_hubness_full_lsh", "query_id"),
    ]:
        plan = _plan(spark, sf_dir, name)
        m = re.search(
            rf"hashpartitioning\({key}#\d+L?, \d+\), REPARTITION_BY_NUM",
            plan,
        )
        assert m, f"{name}: pinned candidate repartition missing"
    plan = _plan(spark, sf_dir, "x12e_minhash_lsh_pairs")
    assert not re.search(
        r"hashpartitioning\(id_a#\d+L?, id_b#\d+L?, \d+\), ENSURE_REQUIREMENTS",
        plan,
    ), "x12e: candidate dedup grew its own pair-key exchange"


def test_x285_quality_delta_shapes(spark, sf_dir):
    """x285's strip-side joins: the <=20-hash blocklist joins the block
    table by BROADCAST; no nested loop / cartesian anywhere; the only
    windows are x279's survivor-rank (<=20 rows) inside the blocklist
    builder."""
    plan = _plan(spark, sf_dir, "x285_curation_quality_delta")
    assert "BroadcastHashJoin" in plan
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan


def test_x286_abtt_constant_pair_block(spark, sf_dir):
    """x286's only non-linear block must be the constant 128-sample pair
    join (a broadcast nested loop over 128 x 128 — corpus-independent);
    the Gram mirror must NOT re-aggregate the corpus (the checkpointed
    2080-row aggregate feeds both union branches), and the power
    iterations join the Gram to 64-row broadcast vectors only."""
    plan = _plan(spark, sf_dir, "x286_all_but_top_audit")
    # exactly ONE conditioned BNLJ — the 128 x 128 sample pair block;
    # every other BNLJ is a 1-row Cross broadcast (mean vector / renorm
    # max / eigenvector rows), which is the intended scalar-attach shape
    import re

    conditioned = re.findall(r"BroadcastNestedLoopJoin BuildRight, Inner", plan)
    assert len(conditioned) == 1, plan.count("BroadcastNestedLoopJoin")
    for frag in plan.split("BroadcastNestedLoopJoin")[1:]:
        head = frag[:40]
        assert ("Cross" in head) or ("Inner" in head)
    assert "CartesianProduct" not in plan
    assert "SortMergeJoin" not in plan  # everything joinable is broadcast-sized


def test_x288_packing_distributed_offsets(spark, sf_dir):
    """x288's emit plan after the r15 de-single-tasking: the running
    token offset rides distributed_group_prefix_sum — a RANGE exchange
    spreads each language over partitions and the local window keys on
    (partition id, lang), so NO per-language single sorted task exists
    (the old partitionBy(lang) window shape); the offsets join back to
    the text rows by doc_id (text moves once, hash-distributed); no
    cartesian/nested-loop anywhere."""
    plan = _plan(spark, sf_dir, "x288_packed_texts")
    assert "Exchange rangepartitioning" in plan  # the prefix-sum spread
    # the CORPUS-SIZED window (the __lsum running sum over n_tok) is
    # keyed by (__pid, lang) — a plain lang-keyed window here would be
    # the single-task funnel; the only lang-alone window left is the
    # bounded per-(pid, lang) totals cumsum (<= 32 x |langs| rows)
    assert "hashpartitioning(__pid" in plan, plan
    lsum_windows = [
        ln for ln in plan.splitlines() if "Window" in ln and "__lsum" in ln
    ]
    assert lsum_windows and all("__pid" in ln for ln in lsum_windows), plan
    for bad in ("CartesianProduct", "BroadcastNestedLoopJoin"):
        assert bad not in plan, plan


def test_x290_nostraddle_fold_shape(spark, sf_dir):
    """x290's sequential fold runs as ONE grouped-Pandas node per
    language over (lang, doc_id, n_tok) — the token counts are computed
    map-side BEFORE the group exchange (the fold never sees text), and
    there are no joins or windows at all."""
    plan = _plan(spark, sf_dir, "x290_packed_nostraddle")
    assert "FlatMapGroupsInPandas" in plan
    for node in ("Join", "Window", "CartesianProduct"):
        assert node not in plan, plan
    # the fold's input is the 3 metadata columns — n_tok is PROJECTED
    # below the group exchange (the Project under the scan), so the
    # document text itself never enters the shuffle or the fold
    fold_line = plan.split("FlatMapGroupsInPandas")[1].splitlines()[0]
    assert "text" not in fold_line, fold_line
    assert "n_tok" in fold_line
    project = [ln for ln in plan.splitlines() if "Project" in ln][-1]
    assert "AS n_tok" in project  # computed map-side, pre-exchange
