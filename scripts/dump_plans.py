"""Generate docs/PLANS.md: formatted physical plans of the flagship
queries, as evidence of pushdown / pruning / join strategy / partial
aggregation. Regenerate after plan-affecting changes:

    python scripts/dump_plans.py [sf_dir]
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from kafka_connect_spark.queries import QUERIES
from kafka_connect_spark.session import get_spark

FLAGSHIPS = {
    "s1_jdbc_timestamp_scan": "filter pushed into the scan (PushedFilters)",
    "x2_join_star_q5": "star join: broadcast dims, partial+final agg",
    "x4_agg_tpch_q1": "two-phase hash aggregation with distinct",
    "x8_topk": "TakeOrderedAndProject (no global sort)",
    "p6_running_total": "per-key window, no single-partition sort",
    "x12c_ngram_jaccard_pairs": "shingle equi self-join + set algebra",
    "x13_ann_bruteforce_topk": "broadcast nested-loop + per-query top-k",
    "x14g_training_pipeline": "composite pipeline in one plan",
    "x14h_vocab": "top-k via TakeOrderedAndProject; rank window only over the 20 survivors",
    "t7_predicated_transform": "single-pass predicated SMT: one FileScan, no Union",
    "x21_asof_join": "as-of via one running window, no range-join explosion",
    "x22_range_join": "interval join: broadcast NL on the tiny range side",
    "x27_salted_skew_join": "hot key spread over 8 salts; join key (sk, __salt)",
    "x28_contamination_check": "benchmark shingles broadcast; corpus never shuffles pre-agg",
    "x29_sequence_packing": "distributed_group_prefix_sum offsets (no per-lang single task) + span explode + hash agg",
    "p7_avg_over_time": "per-series partitioned range window (no global WindowExec)",
    "s2c_jdbc_ts_incrementing_scan": "composite-offset OR-of-ranges pushed to the scan",
    "x30_mixture_resample": "map-side deterministic Bernoulli filter (the only exchange is the ordered output sort)",
    "x34_topk_per_group": "WindowGroupLimit keeps <= k rows per group below the sort",
    "p13_quantile_over_time": "bounded ROWS frame percentile, per-series partitions",
    "x33_cdc_aggregate_maintenance": "delta folding: one partial+final agg over the change stream",
    "x37_incremental_dedup": "anti-join shuffles 16-byte fingerprints, never text; keep-first via partial+final WindowGroupLimit",
    "p16_topk_bottomk": "rank window over the aggregated series table, not the raw events",
    "x40_data_quality_report": "constraint suite: one conditional-sum scan + one key-only anti-join",
    "x41_session_funnel": "per-user sessionize + funnel flags, all windows hash-partitioned on user_id",
    "x42_cohort_retention": "distinct (user, day) pre-shrink before the cohort join",
    "x43_containment_pairs": "int64-hashed shingle self-join, same shuffle shape as x12c",
    "x47_priority_check_q4": "correlated EXISTS -> semi join carrying the lateness predicate",
    "x48_suppliers_kept_waiting_q21": "semi + anti against one derived base, all hashed on l_orderkey",
    "x49_dormant_rich_customers_q22": "1-row scalar broadcast + anti join on date-filtered orders",
    "x50_top_supplier_q15": "lineitem aggregated once; MAX broadcasts back over the tiny view",
    "x51_supplier_count_q16": "NOT IN -> anti against broadcast excluded-supplier list",
    "x52_small_qty_revenue_q17": "correlated avg -> per-part agg joined back on l_partkey",
    "x53_unigram_lm_score": "explode + token hash-agg LM; score join hashes on token, total broadcasts",
    "x54_bigram_lm_score": "bigram transform (JVM higher-order), two count joins on bigram/prefix keys",
    "x56_time_range_rolling": "RANGE interval frame per user_id partition, one shuffle",
    "x58_length_decile_stats": "exact NTILE without the SinglePartition sort (two-phase rank)",
    "x59_scd2_history": "SCD2 intervals: all windows share one user_id partitioning",
    "x61_centroid_outliers": "centroid cosine via (label, dim) hash aggs, no vector join",
    "p24_range_aggregates": "whole *_over_time family fused into ONE partial+final hash agg",
    "x69_boilerplate_segments": "segment wordcount + join-back on segment key — corpus-global, no self-join",
    "x70_dedup_keep_best": "components + left join + per-cluster row_number; window sees one duplicate group at a time",
    "x73_downsample_tiers": "tiered rollup: raw scanned once, coarser tiers re-aggregate the tier below",
    "x72_skew_report": "key histogram + 1-row broadcast summary + TakeOrdered top keys",
    "x75_asof_forward_tolerance": "forward as-of: one per-user window on a packed 128-bit ordinal, no range join",
    "x76_heavy_hitter_bigrams": "MG candidates via mapInPandas, broadcast semi-join rescore; vocabulary never shuffles",
    "x77_winnow_fingerprint_pairs": "window-min fingerprint selection per doc partition; join carries the sparse 2/(w+1) set",
    "x78_series_correlation_matrix": "rollup agg -> bucket-aligned self-join -> pair agg; raw events scanned once",
    "x79_mips_bruteforce_topk": "broadcast queries, corpus never shuffles; per-query rank window",
    "p26_quantile_across_series": "nearest-rank quantiles: per-bucket window over series rollups, not raw rows",
    "p27_mad_anomalies": "two per-series window medians + join-back, all partitioned on user_id",
    "x80_inverted_index": "explode + two hash aggs; posting list built by sort_array, no global sort",
    "x81_vocab_growth": "first-occurrence min-agg per gram; decile bucketing off a 1-row broadcast scalar",
    "x82_ordered_funnel": "three chained min-aggs on one reused user_id partitioning, no per-user sort",
    "x85_fuzzy_name_pairs": "deletion-variant equi-join + exact levenshtein verify; no all-pairs",
    "x86_snapshot_diff": "map-side row hashes, one key-partitioned full-outer join",
    "x89_join_size_precheck": "exact join cardinality from two key histograms, O(distinct keys)",
    "x97_tfidf_cosine_pairs": "weighted posting join (x12c shuffle shape), decimal-exact dot/norms",
    "x100_bootstrap_ci": "replicate explode + ONE hash agg; no driver in the resample loop",
    "p29_alert_firing": "for-duration runs via gaps-and-islands window; no self-join",
    "x104_burst_detection": "trailing median as a 12-lag array sort; one per-series window",
    "x105_rolling_active_users": "coverage islands -> explode -> plain count; sliding distinct in one pass",
    "x130b_cosine_histogram_sampled": "md5-clock TakeOrdered(128) sample -> broadcast NL all-pairs; O(m^2) independent of n",
    "x138_dsir_importance_weights": "1024-bucket model broadcast to the gram stream; partial+final per-doc sum",
    "x140_bm25_retrieval": "query-term filter prunes postings pre-agg; df/avgdl broadcast; TakeOrdered(10)",
    "x153_audience_overlap": "per-user type sets + in-row pair transform; NO user self-join, 2 broadcast lookups",
    "x154_dim_correlation": "joinless moment matrix: in-row pair products -> one partial+final agg",
    "x157_label_silhouette": "k x d centroids broadcast into a zip_with fold; corpus scanned once",
    "x158_view_purchase_attribution": "user-keyed sort-merge range join (stream twin holds O(watermark) state)",
    "x161_contamination_closure": "recursive CTE: <= 3 key-partitioned join rounds, UnionLoop bounded by hop cap",
    "x163_bloom_filter_calibration": "filter = distinct (salt,bucket) set; probe joins the 64 Kibit broadcast",
    "x164_dup_graph_triangles": "oriented edge list joined twice (a<b<c); wedges from one degree agg",
    "x130_cosine_histogram": "block-pair applyInPandas over the bit-exact seq-fold kernel; only 21 histogram rows shuffle",
    "x145_knn_label_consistency": "distributed brute-force kNN: per-block local top-5 + tiny global re-rank",
    "x167_copurchase_lift": "in-row basket pair transform (bounded by basket size); part totals broadcast",
    "x168_dup_graph_pagerank": "3 bounded iterations over a checkpointed edge list; vertex-keyed join+agg each",
    "x171_hll_distinct_calibration": "fixed 1024-register agg per scope; estimate is one integer division chain",
    "x172_cusum_changepoint": "per-type windows over DAY rows (post-agg), broadcast per-type stats",
    "x175_event_transition_matrix": "one user-keyed lead window -> |types|^2 agg; no self-join",
    "x178_windowed_hll_users": "daily sketches replicate to 7 windows; raw users never recounted per window",
    "x179_theil_sen_trend": "pairwise slopes over broadcast DAY table; medians via exact rank",
    "x182_join_key_skew_audit": "count-of-counts closed forms: no per-key rank; one tiny-domain cumsum",
    "x122_zipf_fit": "distributed_rank: range exchange + sorted-partition ids, no SinglePartition corpus sort",
    "x187_quality_auc": "Mann-Whitney midranks collapsed onto the score-value domain; one corpus scan",
    "x192_vocab_coverage_curve": "top-K mass via count-of-counts straddle logic; vocab never rank-sorted",
    "x193_wasserstein_length_shift": "per-pair CDF merge over the length support; corpus touched by one hash agg",
    "x194_gain_chart": "distributed_ntile deciles (range exchange), 10-row cumulative window",
    "x199_entropy_rate": "bigrams via JVM higher-order transform; (source, prefix) hash aggs only",
    "x200_quantile_sketch": "one shared value histogram; windows bounded by the value domain",
    "x202_interarrival_profile": "day-sharded lag + boundary stitch; no per-type corpus window",
    "x203_power_iteration_pc1": "one corpus pass for the Gram; iterations on 8-row broadcasts",
    "x206_source_jsd": "vocab-sized join; absent-word KL mass in closed form, no anti-join",
    "x210_skyline_docs": "skyline via value-domain cummax + broadcast front join; corpus never rank-sorted",
    "x211_scalar_quantization_audit": "per-dim range broadcast onto one posexplode pass; 64-row output",
    "x212_kruskal_wallis_length": "value-domain midrank cumsum; rank tables broadcast back; AQE reuses the (source, length) exchange",
    "x216_ewma_anomaly": "offset-explode alignment on the (type, day) table (r15: self-join retired); integer power-of-two weights",
    "x219_peak_concurrency": "user-partitioned sessionize + minute-domain sweep-line; AQE reuses the concurrency exchange for max + argmax",
    "x221_jl_projection_distortion": "1 KB sign matrix broadcast onto the coordinate explode; fixed 4950-pair probe",
    "x224_isotonic_calibration": "PAV minimax evaluated in-row on the sorted <=20-bin array (r15: triple join retired); no sequential pooling loop",
    "x228_association_rules": "basket distinct built once (AQE ReusedExchange) feeding pair self-join + broadcast supports",
    "x232_tukey_fences": "per-source value-domain quartile selection; fences broadcast onto the histogram",
    "x235_token_burstiness": "one (token, doc) agg; top-30 TakeOrdered; VMR on exact decimals",
    "x245_bpe_encode": "distinct-word Zipf factoring: Arrow-batched encode of |vocab| rows, corpus joins back on word",
    "x246_min_cost_supplier_q2": "Q2: dims broadcast into derived partsupp; min-cost agg + rejoin; TakeOrdered(100)",
    "x247_important_stock_q11": "Q11: supplier semi broadcast; ps_partkey hash agg; 1-row total broadcast threshold",
    "x248_excess_inventory_q20": "Q20: shipdate pushed to the lineitem scan; red-part broadcast semi; (part, supp) equi-join",
    "x249_ipf_raking": "four raking steps as windows over the |sources| x |langs| cell table; one corpus pass",
    "x251_embedding_parity_drift": "one posexplode pass -> (label, dim) agg; count-free integer-dot cosine",
    "x252_shard_rebalance_audit": "x33 HRW weight fan-out map-side; argmax hash-agg per regime; 33x33 rollup",
    "x253_quantile_normalize_length": "two value-domain histograms + broadcast range-join percentile lookup",
    "x254_session_gap_sweep": "one user-partitioned lag/lead window; 4-threshold conditional sums",
    "x255_capture_recapture": "source filter pushed to scan; distinct-gram agg; 1-row Chapman closed form",
    "x256_lsh_parameter_planner": "x12c candidate pair table built once; ONE agg of 5-config conditional sums + stack fan-out (r15)",
    "x257_raking_ess": "x249 cell walk + 1-row integer cross-multiply ESS",
    "x267_df_cap_sensitivity": "ONE df-bounded shingle self-join carrying per-shingle df; 5 caps as ONE agg of conditional sums + stack fan-out (r15: union of 5 pipeline copies retired)",
    "x269_eval_ngram_decontamination": "eval gram set broadcast; corpus explodes once; broadcast hash join, no self-join",
    "x270_filter_funnel": "one scan -> per-doc signals -> cumulative pass flags as conditional sums; 1-row agg fanned to 5",
    "x271_decontamination_gram_sweep": "one scan emits (n, gram)-tagged distinct grams for all 4 sizes; broadcast eval join",
    "x272_segment_dedup_prune": "one exploded block scan -> hash-agg min clock keeper -> join back; two shuffles, no window",
    "x273_temporal_split_audit": "1-row bounds broadcast -> (type,user) hash agg -> type agg; two shuffles, no join",
    "x274_knn_hubness_audit": "TakeOrdered(256) sample -> broadcast self-join -> WindowGroupLimit top-5 -> in-degree agg",
    "x275_anisotropy_audit": "posexplode mean scan -> 1-row mean broadcast -> TakeOrdered(128) -> broadcast pair agg",
    "x276_segment_share_matrix": "distinct (h,source) -> per-h collect_set -> in-row pair explode -> pair agg + 2 broadcast total joins",
    "x277_segment_size_sweep": "one scan, (k,block)-tagged explode for 4 sizes -> (k,h) keeper agg -> join back -> per-k sums",
    "x278_freeze_manifest": "signals projection + md5 keeper agg + broadcast gram join -> first-failing-gate verdict -> (source,verdict) agg",
    "x279_boilerplate_blocklist": "per-h hash agg -> df-floor filter -> DISTRIBUTED TakeOrderedAndProject top-20 -> rank window over only the survivors",
    "x280_eval_item_leak_profile": "two distinct-gram explodes -> corpus probes broadcast eval grams -> per-eval-item aggs; zero-leak rows kept",
    "x281_minhash_k_sweep": "one 64-component signature build; per-k estimates as prefix conditional sums; single lazy stack() fan-out of the 1-row agg (no checkpoint, no union)",
    "x282_curated_accounting": "freeze_verdicts gates + blocklist top-k + ONE segment scan joined to the keep set, broadcast-left-joined to <=20 hashes; per-doc then per-source aggs",
    "x283_ann_lsh_topk_centered": "posexplode mean scan (davg-exact) -> centered bucket tag -> same candidate equi-join + raw-cosine rerank as x13b",
    "x284_embedding_near_dup_lsh_centered": "x12g's bucket self-join with centered signs; exact raw-cosine verify unchanged (precision 1.0)",
    "x274b_knn_hubness_full_lsh": "one bucket tag pass -> (table,bucket) self-join -> WindowGroupLimit top-5 -> in-degree hash agg; nothing corpus-sized broadcast",
    "x285_curation_quality_delta": "freeze gates -> keep set; ONE signal-carrying segment scan; blocklist broadcast-left-join; per-doc + per-source conditional sums",
    "x286_all_but_top_audit": "mean + 2080-row Gram as bounded build-time collects, power iterations replayed in pinned integer-ppm Python (r15); plan is the constant 128-sample pair block",
    "x288_packed_texts": "packing emit: distributed_group_prefix_sum offsets over the narrow projection, text joined back by doc_id (moves once, hash-distributed) -> ~1x span explode with the token SLICE cut map-side -> one (lang, seq_id) hash agg",
    "x289_ivf_cell_occupancy": "one Arrow-batched max-cosine assignment pass (codebook closed over) -> 16-row hash agg; the index artifact's balance audit",
    "x290_packed_nostraddle": "order-sequential greedy: per-lang applyInPandas fold over (doc_id, n_tok) pairs ONLY (16 bytes/doc, never text); oracle replays the fold as a recursive CTE",
    "x291_packing_policy_tradeoff": "x29's cumsum-window math aggregated per lang (straddlers = offset column algebra) joined to the no-straddle fold's per-lang seq count; 5-row join",
    "x292_curriculum_packed_accounting": "distributed_ntile phase tiling (range repartition, no SinglePartition sort) -> x29 span math re-keyed to (lang, phase); same two shuffles, finer partitions",
    "x293_pq_code_utilization": "one Arrow-batched PQ encode pass -> posexplode of m codes/vector -> (subspace, code) hash agg folded to m rows; the PQ artifact's codebook-utilization audit",
}


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    spark = get_spark("plan-dump")
    spark.sparkContext.setLogLevel("ERROR")
    jvm = spark._jvm
    mode = jvm.org.apache.spark.sql.execution.ExplainMode.fromString("formatted")
    out = [
        "# Physical plans (generated by scripts/dump_plans.py at "
        f"{os.path.basename(sf_dir)})",
        "",
        "Evidence for the scale claims in README.md: predicate pushdown,",
        "column pruning (ReadSchema), join strategy, partial aggregation.",
        "",
    ]
    for name, why in FLAGSHIPS.items():
        df = QUERIES[name](spark, sf_dir)
        plan = df._jdf.queryExecution().explainString(mode)
        out += [f"## {name}", "", f"*{why}*", "", "```", plan.strip(), "```", ""]
    os.makedirs("docs", exist_ok=True)
    with open("docs/PLANS.md", "w") as fh:
        fh.write("\n".join(out))
    print(f"wrote docs/PLANS.md ({len(FLAGSHIPS)} plans)")


if __name__ == "__main__":
    main()
