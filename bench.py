"""Benchmark harness: headline queries at $SPARK_GRAFT_SF_DIR (default
/root/testdata/sf0.1) on local[$SPARK_GRAFT_CPUS].

Prints ONE JSON line:
  {"metric": "...", "value": N, "unit": "sec", "queries": {...}, "sf": ...}

Each query executes to completion via the noop sink (no driver collect)
and is timed over $SPARK_GRAFT_BENCH_REPS runs (default 3), reporting the
PER-QUERY MEDIAN — single-shot numbers swing with run position (JVM/GC
state drift across a 50-query session moved the r3 pipeline number 37%),
medians make round-over-round diffs meaningful.
``pipeline_mask_envelope`` is the reference-workload analog (incremental
read -> MaskField -> JSON envelope -> sink; BASELINE.md's 3-4K rows/s
experiment) — its rows/sec lands in "pipeline_rows_per_sec"."""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from kafka_connect_spark.catalog import load
from kafka_connect_spark.queries import QUERIES
from kafka_connect_spark.session import get_spark
from kafka_connect_spark.transforms import mask_fields, to_json_envelope, with_topic

HEADLINE = [
    "x2_join_star_q5",
    "x4_agg_tpch_q1",
    "x1_inner_equijoin",
    "x7_window_rank_lag",
    "k2_upsert_last_writer_wins",
    "p2_grouped_sum",
    "p6_running_total",
    "x11_tumbling_window",
    "t2_cdc_unwrap_rewrite",
    "t4_json_envelope_roundtrip",
    "x12b_dedup_keep_first",
    "x12c_ngram_jaccard_pairs",
    "x12d_simhash",
    "x12e_minhash_lsh_pairs",
    "x13_ann_bruteforce_topk",
    "x13b_ann_lsh_topk",
    "x13c_ann_ivf_topk",
    "x16_sql_api_q3",
    "x17_pivot",
    "p7_avg_over_time",
    "x14f_chunking",
    "x12f_embedding_near_dup",
    "x14b_token_counts",
    "x14c_quality_score",
    "x14e_fingerprint",
    "mm_feature_extract",
    # round 2 additions
    "t4b_avro_envelope_roundtrip",
    "x14i_pii_redaction",
    "x14j_repetition_score",
    "x14k_bpe_token_counts",
    "x21_asof_join",
    "x22_range_join",
    "x23_percentiles",
    "x12h_dup_clusters",
    # round 3 additions
    "t2c_unwrap_add_fields_route",
    "x27_salted_skew_join",
    "x12i_lsh_dup_clusters",
    "s2c_jdbc_ts_incrementing_scan",
    "p11_increase_and_resets",
    "x28_contamination_check",
    "x29_sequence_packing",
    "x30_mixture_resample",
    "x31_emit_on_change",
    "mm_phash_pairs",
    "x32_token_commonness",
    "p12_zscore_anomalies",
    "x33_cdc_aggregate_maintenance",
    "x34_topk_per_group",
    "p13_quantile_over_time",
    # round 4 additions
    "p14_deriv",
    "p15_predict_linear",
    "mm_audio_frame_energy",
    "x35_embedding_array_ops",
    "x36_source_quota_cap",
    # round 5 additions (x39_bpe_train excluded: 10-round iterative trainer,
    # dominated by fixed per-round job overhead at bench SF — not a
    # throughput signal)
    "x37_incremental_dedup",
    "p16_topk_bottomk",
    "x12j_cluster_size_histogram",
    "x40_data_quality_report",
    "x41_session_funnel",
    "x42_cohort_retention",
    "x43_containment_pairs",
    "x44_cross_source_dup_matrix",
    "x45_returned_revenue_q10",
    "x46_large_orders_q18",
    # round 6 additions
    "x47_priority_check_q4",
    "x48_suppliers_kept_waiting_q21",
    "x49_dormant_rich_customers_q22",
    "x50_top_supplier_q15",
    "x51_supplier_count_q16",
    "x52_small_qty_revenue_q17",
    "x53_unigram_lm_score",
    "x54_bigram_lm_score",
    "x55_temperature_mixture_weights",
    "x56_time_range_rolling",
    "x57_weighted_sample",
    "x58_length_decile_stats",
    "x59_scd2_history",
    "x60_transition_matrix",
    "p17_clamp",
    "p18_offset_delta",
    "p19_absent",
    "x61_centroid_outliers",
    "x62_forecast_revenue_q6",
    "x63_volume_shipping_q7",
    "x64_market_share_q8",
    "x65_product_profit_q9",
    "x66_customer_distribution_q13",
    "x67_promo_revenue_q14",
    "x68_disjunctive_revenue_q19",
    "p20_holt_winters",
    # round 6 session-2 additions
    "p21_changes",
    "p23_stddev_over_time",
    "p24_range_aggregates",
    "p25_hourly_profile",
    "x69_boilerplate_segments",
    "x70_dedup_keep_best",
    "x71_semantic_dedup",
    "x72_skew_report",
    "x73_downsample_tiers",
    # round 6 session-3 additions
    "x74_distribution_drift_psi",
    "x75_asof_forward_tolerance",
    "x76_heavy_hitter_bigrams",
    "x77_winnow_fingerprint_pairs",
    "x78_series_correlation_matrix",
    "x79_mips_bruteforce_topk",
    "x79b_mips_lsh_topk",
    "p26_quantile_across_series",
    "p27_mad_anomalies",
    "x80_inverted_index",
    "x81_vocab_growth",
    "x82_ordered_funnel",
    "x83_top_session_paths",
    "x84_decay_score",
    "x85_fuzzy_name_pairs",
    "p28_label_join",
    "x86_snapshot_diff",
    "x87_ann_pq_topk",
    "x88_scd2_asof",
    "x89_join_size_precheck",
    "x90_pmi_collocations",
    "x91_rank_fusion",
    "x92_leakage_safe_split",
    "x93_corpus_datasheet",
    "x94_conversion_chi2",
    "x95_histogram_export",
    "x96_session_entry_exit",
    "x97_tfidf_cosine_pairs",
    "x98_rfm_segments",
    "x99_markov_eval",
    "x100_bootstrap_ci",
    "x101_lead_lag_xcorr",
    "x102_forecast_backtest",
    "p29_alert_firing",
    "x103_robust_trend",
    "x104_burst_detection",
    "p30_burn_rate",
    "x105_rolling_active_users",
    "x106_trending_ngrams",
    "x107_curation_pipeline_v2",
    "x108_distributed_median",
    "x109_threshold_sensitivity",
    "x110_pareto_abc",
    "x111_basket_lift",
    "x112_changepoint",
    "x113_novelty_score",
    "x114_length_cutoff_sweep",
    "x115_source_divergence",
    "p31_alert_flap_report",
    "x116_token_budget_allocation",
    "x117_dedup_savings",
    "x118_ranked_retrieval",
    "p32_scrape_gaps",
    "x119_embedding_quality_audit",
    "x120_lang_source_independence",
    "x121_session_length_histogram",
    "x122_zipf_fit",
    "x123_heaps_fit",
    "x124_source_lm_profile",
    "x125_source_rank_movers",
    "x126_subset_edges",
    "x127_pair_signal_panel",
    "x128_purchase_cadence",
    "x129_quality_flag_panel",
    "x130_cosine_histogram",
    "p33_counter_sanity",
    "x131_cluster_source_purity",
    "x132_seasonality_strength",
    "x133_retention_half_life",
    "x134_tokenizer_efficiency",
    "x135_crossmodal_agreement",
    "x136_corpus_summary",
    "x137_dup_distance_audit",
    # round 13 additions
    "x267_df_cap_sensitivity",
    "x268_dp_eps_sweep",
    "x269_eval_ngram_decontamination",
    "x270_filter_funnel",
    "x271_decontamination_gram_sweep",
    "x272_segment_dedup_prune",
    "x273_temporal_split_audit",
    "x274_knn_hubness_audit",
    "x275_anisotropy_audit",
    "x276_segment_share_matrix",
    "x277_segment_size_sweep",
    "x278_freeze_manifest",
    "x279_boilerplate_blocklist",
    "x280_eval_item_leak_profile",
    "x281_minhash_k_sweep",
    # round 14 additions
    "x282_curated_accounting",
    "x283_ann_lsh_topk_centered",
    "x284_embedding_near_dup_lsh_centered",
    "x287_embedding_near_dup_lsh_abtt",
    "x274b_knn_hubness_full_lsh",
    "x285_curation_quality_delta",
    "x286_all_but_top_audit",
    # round 15 additions
    "x288_packed_texts",
    "x289_ivf_cell_occupancy",
    "x290_packed_nostraddle",
    "x291_packing_policy_tradeoff",
    "x292_curriculum_packed_accounting",
    "x293_pq_code_utilization",
    # round 11 additions
    "x265_keep_policy_comparison",
    "x263_operating_point",
    "x264_sample_size_planner",
    "x260_pair_audit_queue",
    "x261_fold_leakage_report",
    "x259_dp_count_release",
    "x258_variant_props_profile",
    "x257_raking_ess",
    "x256_lsh_parameter_planner",
    "x252_shard_rebalance_audit",
    "x254_session_gap_sweep",
    "x255_capture_recapture",
    "x249_ipf_raking",
    "x251_embedding_parity_drift",
    "x253_quantile_normalize_length",
    "x246_min_cost_supplier_q2",
    "x247_important_stock_q11",
    "x248_excess_inventory_q20",
    # round 7 additions
    "x97b_tfidf_cosine_pairs_capped",
    "x130b_cosine_histogram_sampled",
    "x138_dsir_importance_weights",
    "x139_dup_substring_mass",
    "x140_bm25_retrieval",
    "x141_rank_agreement",
    "x142_stratified_eval_sample",
    "x143_benford_audit",
    "x144_bot_likeness_panel",
    "x145_knn_label_consistency",
    "x146_dsir_ess",
    "p34_histogram_quantile",
    "x147_dup_degree_histogram",
    "x148_context_fit_report",
    "x149_dim_robust_stats",
    "x150_minhash_calibration",
    "x151_mixture_plan",
    "x152_dim_truncation_fidelity",
    "x153_audience_overlap",
    "x154_dim_correlation",
    "x155_curriculum_plan",
    "x156_char_entropy_profile",
    "x157_label_silhouette",
    "x158_view_purchase_attribution",
    "x159_cms_token_frequency",
    "x160_kmv_distinct_calibration",
    "x161_contamination_closure",
    "x162_unattributed_purchases",
    "x163_bloom_filter_calibration",
    "x164_dup_graph_triangles",
    "x165_readability_profile",
    "x166_cdc_join_maintenance",
    "x167_copurchase_lift",
    "x168_dup_graph_pagerank",
    "x169_daily_anomaly_flags",
    "x170_rrf_rank_fusion",
    "x171_hll_distinct_calibration",
    "x172_cusum_changepoint",
    "x173_good_turing_unseen",
    "x174_ks_length_distance",
    "x175_event_transition_matrix",
    "x176_token_gini",
    "x177_weighted_sample",
    "x178_windowed_hll_users",
    "x179_theil_sen_trend",
    # round 8 additions
    "x180_retrieval_ndcg",
    "x181_k_anonymity_audit",
    "x182_join_key_skew_audit",
    "x183_source_lang_mi",
    "x184_calibration_curve",
    "x185_cohens_kappa",
    "x186_kaplan_meier_conversion",
    # round 9 additions
    "x187_quality_auc",
    "x188_spearman_signals",
    "x189_theta_sketch_overlap",
    "x190_mcnemar_lid",
    "x191_vocab_richness",
    "x192_vocab_coverage_curve",
    "x193_wasserstein_length_shift",
    "x194_gain_chart",
    "x195_brier_score",
    "x196_cliffs_delta_length",
    "x197_length_qq_profile",
    "x198_vocab_overlap",
    "x199_entropy_rate",
    "x200_quantile_sketch",
    "x201_volume_autocorrelation",
    "x202_interarrival_profile",
    "x203_power_iteration_pc1",
    "x204_mann_kendall_trend",
    "x205_conversion_wilson_ci",
    "x206_source_jsd",
    "x207_markov_stationary",
    "x208_session_profile",
    "x209_funnel_step_timing",
    "x210_skyline_docs",
    "x211_scalar_quantization_audit",
    # round 10 additions
    "x212_kruskal_wallis_length",
    "x213_cramers_v_panel",
    "x214_kendall_tau_signals",
    "x215_brown_forsythe_length",
    "x216_ewma_anomaly",
    "x217_nelson_aalen_hazard",
    "x218_two_proportion_ztest",
    "x219_peak_concurrency",
    "x220_dup_ngram_char_fraction",
    "x221_jl_projection_distortion",
    "x222_concentration_panel",
    "x223_cochran_armitage_trend",
    "x224_isotonic_calibration",
    "x225_pacf_profile",
    "x226_bh_fdr_panel",
    "x227_brier_decomposition",
    "x228_association_rules",
    "x229_mmr_diversified_topk",
    "x230_kcore_decomposition",
    "x231_fleiss_kappa",
    "x232_tukey_fences",
    "x233_trimmed_mean_panel",
    "x234_logrank_test",
    "x235_token_burstiness",
    "x236_simpson_audit",
    "x237_ols_diagnostics",
    "x238_group_kfold_split",
    "x239_keyword_extraction",
    "x240_log_odds_vocab_shift",
    "x241_cuped_adjustment",
    "x242_odds_ratio_panel",
    "x243_poisson_rate_test",
    "x244_sprt_conversion_drift",
]


# Registry queries NOT swept by the bench, with the reason — kept total
# (main() asserts HEADLINE + EXCLUDED == the whole registry) so the
# HEADLINE-vs-registry gap is auditable from the bench artifact alone.
_EXCLUDED_SPECIAL = {
    "x39_bpe_train": "iterative_trainer_fixed_overhead",
    "x245_bpe_encode": "iterative_trainer_fixed_overhead",
    "x250_bpe_fertility_audit": "iterative_trainer_fixed_overhead",
    "x266_bpe_vocab_sweep": "iterative_trainer_fixed_overhead",
    "x262_bpe_holdout_fertility": "iterative_trainer_fixed_overhead",
    "s3b_jdbc_live_roundtrip": "side_effecting_embedded_derby",
    "s6b_mm2_offset_translation": "side_effecting_offset_store",
}
# everything else is a sub-second micro-variant whose family
# representative IS in HEADLINE (e.g. x3b/c/d outer-join variants vs
# x1/x2; p1/p3-p5 PromQL variants vs p2/p6/p7; q2-q6 scalar DDL shapes)
_EXCLUDED_DEFAULT = "micro_variant_family_in_headline"


def excluded_map() -> dict[str, str]:
    return {
        name: _EXCLUDED_SPECIAL.get(name, _EXCLUDED_DEFAULT)
        for name in sorted(set(QUERIES) - set(HEADLINE))
    }


def run_noop(df) -> None:
    df.write.format("noop").mode("overwrite").save()


# --- self-qualification (r9 verdict item #1) -------------------------------
# Three same-code r9 runs spanned ±35% on the throughput analogs because the
# rig's ambient load differed between them; nothing in the artifact recorded
# that, so the round-over-round trend line was unreadable. The bench now
# measures a fixed, data-independent calibration canary (pure CPU: hash+sum
# over spark.range, no I/O, no shuffle skew) before the sweep and stamps it
# -- plus os.getloadavg() before any Spark work -- into BENCH_DETAIL.json.
# A run whose canary exceeds the committed idle band is flagged
# `contention_flag: true`; consumers should treat its deltas as environment,
# not plans. Calibration numbers live in BENCH_CANARY.json (committed).

_CANARY_ROWS = 256_000_000
# idle rig 2026-08-15, 7 runs post-warmup: 0.275-0.402s, median 0.327
# (BENCH_CANARY.json). Band hi = ~1.7x idle median: beyond the widest
# idle-to-idle swing we measured, well inside the 2-3x slowdown real
# contention produces (the r9 board-wide +20% came with individual queries
# at +132%).
_CANARY_BAND_HI = 0.55
_LOADAVG_AMBIENT_MAX = 4.0  # 1-min loadavg pre-Spark on a 32-cpu rig


def _canary_sec(spark, n: int = 5) -> float:
    from pyspark.sql import functions as F

    def once() -> float:
        t0 = time.time()
        spark.range(0, _CANARY_ROWS, 1, 32).select(
            F.sum(F.pmod(F.xxhash64("id"), F.lit(1_000_000)))
        ).collect()
        return time.time() - t0

    once()  # untimed warmup
    return _median([once() for _ in range(n)])


def _idle_canary_median(key: str = "idle_median_sec") -> tuple[float, str]:
    """The committed idle-rig canary median (BENCH_CANARY.json) — the
    normalization reference for canary-relative throughput. Returns
    (value, source): source records whether the committed file was read
    or the baked-in default kicked in (r14 ADVICE: a silent fallback
    goes stale when the file is recalibrated on a new rig; the artifact
    must say which number normalized it)."""
    _DEFAULTS = {"idle_median_sec": 0.327, "io_idle_median_sec": 2.575}
    try:
        with open(
            os.path.join(os.path.dirname(os.path.abspath(__file__)),
                         "BENCH_CANARY.json")
        ) as f:
            return float(json.load(f)[key]), "file"
    except (OSError, ValueError, KeyError):
        return _DEFAULTS[key], "default"


# --- I/O-shaped canary (r14 verdict item 2) ---------------------------------
# The pure-CPU canary held flat across r12->r14 while the pipeline analog
# fell 305k->201k->175k rows/s; the judge's interleaved r12-vs-HEAD A/B
# proved the decline was the machine epoch's I/O side (parquet scan /
# memory-bandwidth path), which hash+sum over spark.range cannot see. This
# second canary IS the analog's own shape — parquet scan -> MaskField ->
# JSON envelope -> noop — over a PINNED input (the sf0.1 lineitem fixture,
# always, regardless of $SPARK_GRAFT_SF_DIR: fixed file, fixed rows, fixed
# bytes), so rows-per-io-canary is decidable across rounds without a code
# A/B. Idle calibration lives in BENCH_CANARY.json next to the CPU one.
_IO_CANARY_SRC = "/root/testdata/sf0.1/lineitem.parquet"


def _io_canary_envelope(df, key_cols):
    """FROZEN copy of the r15-era ``to_json_envelope`` (schema struct
    serialized per row). r16 optimized the library function (constant
    schema rendered once — 1.93x); had the canary kept calling it, the
    instrument itself would have sped up and every future
    ``io_canary_drift`` reading would conflate code with machine epoch
    (observed: −43% "drift" on unchanged hardware). A canary must be
    frozen, so the canary — and only the canary — keeps the old shape;
    the committed idle calibration in BENCH_CANARY.json stays valid and
    the analogs' rows-per-io-canary now shows the code win, as it
    should."""
    from pyspark.sql import functions as F

    from kafka_connect_spark.transforms import _connect_type

    fields = F.array(
        *[
            F.struct(
                F.lit(f.name).alias("field"),
                F.lit(_connect_type(f.dataType)).alias("type"),
            )
            for f in df.schema.fields
        ]
    )
    schema_struct = F.struct(
        F.lit("struct").alias("type"), fields.alias("fields")
    )
    value = F.to_json(
        F.struct(
            schema_struct.alias("schema"),
            F.struct(*df.columns).alias("payload"),
        )
    )
    cols = [F.to_json(F.struct(*key_cols)).alias("key"), value.alias("value")]
    return df.select(*cols)


def _io_canary_sec(spark, n: int = 3) -> float:
    def once() -> float:
        df = spark.read.parquet(_IO_CANARY_SRC)
        # the pinned fixture carries no l_comment; mask the same column
        # the analog falls back to on this schema
        pipe = _io_canary_envelope(
            mask_fields(df, ["l_returnflag"]), key_cols=["l_orderkey"]
        )
        t0 = time.time()
        run_noop(pipe)
        return time.time() - t0

    return _median([once() for _ in range(n)])


def _median(xs: list[float]) -> float:
    s = sorted(xs)
    mid = len(s) // 2
    return s[mid] if len(s) % 2 else (s[mid - 1] + s[mid]) / 2


def _code_fingerprint() -> str:
    """Identity of the bench-RELEVANT code for the clean-artifact write
    guard: a digest over bench.py + every package source file. Stricter
    than needed (any package edit invalidates protection — correct,
    since new queries mean new numbers) but immune to doc/test-only
    commits, which a git-HEAD key is not."""
    import hashlib

    root = os.path.dirname(os.path.abspath(__file__))
    h = hashlib.sha256()
    paths = [os.path.join(root, "bench.py")]
    for base, _dirs, files in sorted(os.walk(os.path.join(root, "kafka_connect_spark"))):
        for f in sorted(files):
            if f.endswith(".py"):
                paths.append(os.path.join(base, f))
    for path in paths:
        h.update(path.encode())
        try:
            with open(path, "rb") as fh:
                h.update(fh.read())
        except OSError:
            h.update(b"?")
    return h.hexdigest()[:16]


def _git_head() -> str:
    """Git identity, recorded for provenance (not the guard key)."""
    import subprocess

    try:
        out = subprocess.run(
            ["git", "rev-parse", "HEAD"],
            cwd=os.path.dirname(os.path.abspath(__file__)),
            capture_output=True,
            text=True,
            timeout=10,
        )
        head = out.stdout.strip()
        dirty = subprocess.run(
            ["git", "status", "--porcelain"],
            cwd=os.path.dirname(os.path.abspath(__file__)),
            capture_output=True,
            text=True,
            timeout=10,
        ).stdout.strip()
        return head + ("+dirty" if dirty else "")
    except Exception:  # noqa: BLE001
        return "unknown"


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    sf = float(sf_dir.rstrip("/").rsplit("sf", 1)[-1]) if "sf" in sf_dir else -1.0
    reps = max(1, int(os.environ.get("SPARK_GRAFT_BENCH_REPS", "3")))
    # ambient load BEFORE any Spark work — once the bench runs, loadavg
    # measures us, not the environment
    loadavg_start = os.getloadavg()
    # console progress interleaves with stdout and broke the driver's JSON
    # parse in round 5 (BENCH_r05: rc=0, parsed=null) — keep stdout clean
    spark = get_spark(
        "bench", extra_conf={"spark.ui.showConsoleProgress": "false"}
    )
    spark.sparkContext.setLogLevel("ERROR")

    # warm the JVM + parquet footers so timings measure the queries
    load(spark, sf_dir, "lineitem").count()

    # r11: when the pre-sweep gate trips, back off and re-measure instead of
    # spending ~20 min producing numbers the flag says to distrust (r9 and
    # r10 both committed contended sweeps while an idle same-code run
    # existed). Each retry sleeps long enough for the 1-min loadavg to
    # decay, then re-reads loadavg + re-runs the canary.
    canary = _canary_sec(spark)
    loadavg_gate = loadavg_start[0]
    contention = canary > _CANARY_BAND_HI or loadavg_gate > _LOADAVG_AMBIENT_MAX
    retries = int(os.environ.get("SPARK_GRAFT_BENCH_CONTENTION_RETRIES", "2"))
    backoff = float(os.environ.get("SPARK_GRAFT_BENCH_CONTENTION_BACKOFF", "75"))
    contention_retries_used = 0
    while contention and contention_retries_used < retries:
        contention_retries_used += 1
        print(
            f"bench: contention gate tripped (canary={canary:.3f}s, "
            f"loadavg={loadavg_gate:.2f}); backing off {backoff:.0f}s "
            f"(retry {contention_retries_used}/{retries})",
            file=sys.stderr,
        )
        time.sleep(backoff)
        loadavg_gate = os.getloadavg()[0]
        canary = _canary_sec(spark)
        contention = (
            canary > _CANARY_BAND_HI or loadavg_gate > _LOADAVG_AMBIENT_MAX
        )

    timings: dict[str, float] = {}

    # I/O canary sample 1: bracket the throughput analogs (they are what
    # it normalizes). One untimed warmup, then median-of-3 — same
    # steady-state methodology as the analogs themselves.
    _io_canary_sec(spark, n=1)  # untimed warmup
    io_canary_pre = _io_canary_sec(spark, n=3)

    # Throughput analogs run FIRST (right after warmup): measured after the
    # 60-query headline sweep they inherit a churned JVM/GC state and swing
    # ~30% run-to-run; position-pinning makes the rows/sec trend comparable
    # across rounds.
    # reference-workload analog: scan -> mask -> topic routing -> JSON envelope
    li = load(spark, sf_dir, "lineitem")
    n_rows = li.count()
    pipe = to_json_envelope(
        with_topic(mask_fields(li, ["l_comment"] if "l_comment" in li.columns else ["l_returnflag"]),
                   "postgresql-jdbc-bulk-", "lineitem"),
        key_cols=["l_orderkey"] if "l_orderkey" in li.columns else None,
    )
    # untimed warmup run: same steady-state methodology as the poll loop
    # (r8 pinned the poll analog's cold-rep 2.2x effect; the r8 verdict
    # flagged the pipeline analog drifting the same way — median-of-3 only
    # half-hides a cold first rep)
    run_noop(pipe)
    runs = []
    for _ in range(reps):
        t0 = time.time()
        run_noop(pipe)
        runs.append(time.time() - t0)
    pipe_sec = _median(runs)
    timings["pipeline_mask_envelope"] = round(pipe_sec, 3)

    # semantics-matched baseline analog: the reference's experiment is an
    # incremental poll loop (offset filter -> mask -> serialize -> sink)
    # with committed offsets; sustained rows/s including commit overhead.
    import tempfile

    from kafka_connect_spark.sources.incremental import IncrementalTableSource

    def poll_sink(df) -> None:
        run_noop(to_json_envelope(mask_fields(df, ["o_orderpriority"])))

    # untimed warmup loop: the incremental-source machinery is JIT-cold on
    # its first pass and a 5-rep isolation run (round 8) measured the cold
    # rep at 31K rows/s vs 70-76K warm — the r6->r7 "-6.7% drift" was this
    # noise band, not a regression; warming before the timed reps pins the
    # metric to the steady state the baseline comparison wants
    warm = IncrementalTableSource(
        f"{sf_dir}/orders.parquet",
        "o_orderkey",
        "incrementing",
        tempfile.mkdtemp(prefix="bench-inc-warm-"),
        batch_max_rows=25_000,
    )
    while warm.run_once(spark, poll_sink) > 0:
        pass

    runs, polled = [], 0
    for _ in range(reps):
        inc = IncrementalTableSource(
            f"{sf_dir}/orders.parquet",
            "o_orderkey",
            "incrementing",
            tempfile.mkdtemp(prefix="bench-inc-"),  # fresh offsets per rep
            batch_max_rows=25_000,
        )
        t0 = time.time()
        polled = 0
        while (n := inc.run_once(spark, poll_sink)) > 0:
            polled += n
        runs.append(time.time() - t0)
    inc_sec = _median(runs)
    timings["incremental_poll_loop"] = round(inc_sec, 3)

    # r14: second canary sample right after the throughput analogs — the
    # machine-speed reading taken at the same run position as the numbers
    # it normalizes (the r13 305k->201k pipeline drop took an hour of
    # forensics to acquit as environment; rows-per-canary makes the
    # adjudication a committed number instead).
    canary_mid = _canary_sec(spark, n=3)
    # I/O canary sample 2: immediately after the analogs it normalizes.
    io_canary_post = _io_canary_sec(spark, n=3)

    for name in HEADLINE:
        runs = []
        for _ in range(reps):
            t0 = time.time()
            run_noop(QUERIES[name](spark, sf_dir))
            runs.append(time.time() - t0)
        timings[name] = round(_median(runs), 3)

    # r14: third canary sample after the sweep; the run's canary median
    # spans start/mid/end so a mid-run load spike is visible, not just a
    # pre-sweep one.
    canary_end = _canary_sec(spark, n=3)
    canary_samples = [canary, canary_mid, canary_end]
    canary_run_median = _median(canary_samples)
    idle_canary, idle_canary_source = _idle_canary_median()
    # drift FLAG (not gate): the run's canary vs the committed idle
    # fingerprint. >15% means wall-clock deltas vs other rounds carry an
    # environment component even if the hard contention gate stayed quiet.
    canary_drift = (canary_run_median - idle_canary) / idle_canary
    # canary-relative throughput: rows per canary-duration. A uniformly
    # slower/faster machine moves pipe_sec and the canary together, so
    # this number is comparable across runs in a way raw rows/s is not.
    pipeline_rows_per_canary = n_rows * canary_run_median / pipe_sec
    poll_rows_per_canary = polled * canary_run_median / inc_sec
    # I/O-canary normalization (r14 verdict item 2): same algebra against
    # the I/O-shaped reference, which moves WITH the analog when the
    # machine's scan/memory-bandwidth epoch shifts (the component the CPU
    # canary is blind to).
    io_canary_samples = [io_canary_pre, io_canary_post]
    io_canary_run_median = _median(io_canary_samples)
    io_idle_canary, io_idle_canary_source = _idle_canary_median(
        "io_idle_median_sec"
    )
    io_canary_drift = (io_canary_run_median - io_idle_canary) / io_idle_canary
    pipeline_rows_per_io_canary = n_rows * io_canary_run_median / pipe_sec
    poll_rows_per_io_canary = polled * io_canary_run_median / inc_sec

    total = round(sum(timings.values()), 3)
    detail = {
        "metric": "headline_queries_total_wall",
        "value": total,
        "unit": "sec",
        "queries": timings,
        "sf": sf,
        "reps": reps,
        "aggregation": "median",
        "pipeline_rows_per_sec": round(n_rows / pipe_sec, 1),
        "incremental_poll_rows_per_sec": round(polled / inc_sec, 1),
        # methodology pins: the throughput analogs run FIRST (post-warmup,
        # pre-sweep) since round 5 — r3's 60.7K poll number was measured
        # on a 60-query-hot JVM and is NOT comparable to these
        "throughput_position": "post-warmup",
        "poll_page_rows": 25_000,
        # r8: one untimed poll loop precedes the timed reps (cold-JIT rep
        # measured 2.2x slower than steady state; see comment at the loop)
        "poll_warmup_loop": True,
        # r9: the pipeline analog gets the same treatment — one untimed
        # run before the timed reps
        "pipeline_warmup_run": True,
        # r10: self-qualification — fixed CPU canary (median of 5, post-
        # warmup) + pre-Spark load average; band in BENCH_CANARY.json.
        # contention_flag=true => this run's wall-clock deltas vs other
        # rounds are environment, not plan changes.
        "canary_sec": round(canary, 3),
        # r14: contention-robust normalization (verdict item 2) — three
        # canary samples interleaved across the run (pre-sweep gate /
        # post-throughput-analogs / post-sweep), throughput re-expressed
        # per canary-duration, and a soft drift flag vs the committed
        # idle fingerprint (BENCH_CANARY.json).
        "canary_samples_sec": [round(c, 3) for c in canary_samples],
        "canary_run_median_sec": round(canary_run_median, 3),
        "canary_idle_median_sec": idle_canary,
        # r15 (r14 ADVICE): whether the idle reference came from the
        # committed BENCH_CANARY.json or the baked-in default — a "default"
        # here means the drift numbers below normalized against a possibly
        # stale constant and should be re-derived after recalibration.
        "canary_idle_source": idle_canary_source,
        "canary_drift_pct": round(100 * canary_drift, 1),
        "canary_drift_flag": abs(canary_drift) > 0.15,
        "pipeline_rows_per_canary": round(pipeline_rows_per_canary, 1),
        "poll_rows_per_canary": round(poll_rows_per_canary, 1),
        # r15 (r14 verdict item 2): I/O-shaped canary — the analog's own
        # shape (parquet scan -> mask -> JSON envelope -> noop) over the
        # PINNED sf0.1 lineitem fixture, sampled bracketing the analogs.
        "io_canary_samples_sec": [round(c, 3) for c in io_canary_samples],
        "io_canary_run_median_sec": round(io_canary_run_median, 3),
        "io_canary_idle_median_sec": io_idle_canary,
        "io_canary_idle_source": io_idle_canary_source,
        "io_canary_drift_pct": round(100 * io_canary_drift, 1),
        "io_canary_drift_flag": abs(io_canary_drift) > 0.15,
        "pipeline_rows_per_io_canary": round(pipeline_rows_per_io_canary, 1),
        "poll_rows_per_io_canary": round(poll_rows_per_io_canary, 1),
        "io_canary_src": _IO_CANARY_SRC,
        "canary_rows": _CANARY_ROWS,
        "canary_band_hi": _CANARY_BAND_HI,
        "loadavg_start": [round(x, 2) for x in loadavg_start],
        "loadavg_gate": round(loadavg_gate, 2),
        "loadavg_end": [round(x, 2) for x in os.getloadavg()],
        "contention_flag": contention,
        "contention_retries_used": contention_retries_used,
        "git_head": _git_head(),
        "code_fingerprint": _code_fingerprint(),
        "excluded": excluded_map(),
    }
    # every registry query is either benched or excluded-with-reason
    assert set(QUERIES) == set(HEADLINE) | set(detail["excluded"]), (
        sorted(set(QUERIES) ^ (set(HEADLINE) | set(detail["excluded"])))
    )
    # Full per-query map goes to a committed artifact: the driver captures
    # only the last ~2000 chars of stdout, and the 169-entry map (~6 KB)
    # overflowed that two rounds running (BENCH_r05/r06: rc=0, parsed=null).
    repo_dir = os.path.dirname(os.path.abspath(__file__))
    detail_name = "BENCH_DETAIL.json"
    detail_path = os.path.join(repo_dir, detail_name)
    if contention:
        # r11: a flagged run must never clobber a clean same-code artifact
        # (the r9/r10 failure mode: the idle mid-round BENCH_DETAIL got
        # overwritten by the contended final sweep). Divert to a side file
        # and leave the clean numbers as the committed record.
        try:
            with open(detail_path) as f:
                prev = json.load(f)
        except (OSError, ValueError):
            prev = None
        if (
            prev is not None
            and prev.get("contention_flag") is False
            and prev.get("code_fingerprint") == detail["code_fingerprint"]
        ):
            detail_name = "BENCH_DETAIL_CONTENDED.json"
            detail_path = os.path.join(repo_dir, detail_name)
    with open(detail_path, "w") as f:
        json.dump(detail, f, indent=1, sort_keys=True)
        f.write("\n")

    slowest = dict(
        sorted(timings.items(), key=lambda kv: kv[1], reverse=True)[:10]
    )
    summary = json.dumps(
        {
            "metric": "headline_queries_total_wall",
            "value": total,
            "unit": "sec",
            "queries": slowest,  # top-10 slowest; full map in BENCH_DETAIL.json
            "n_queries": len(timings),
            "sf": sf,
            "reps": reps,
            "aggregation": "median",
            "pipeline_rows_per_sec": detail["pipeline_rows_per_sec"],
            "incremental_poll_rows_per_sec": detail[
                "incremental_poll_rows_per_sec"
            ],
            "canary_sec": detail["canary_sec"],
            "canary_run_median_sec": detail["canary_run_median_sec"],
            "canary_drift_pct": detail["canary_drift_pct"],
            "canary_drift_flag": detail["canary_drift_flag"],
            "pipeline_rows_per_canary": detail["pipeline_rows_per_canary"],
            "poll_rows_per_canary": detail["poll_rows_per_canary"],
            "io_canary_run_median_sec": detail["io_canary_run_median_sec"],
            "io_canary_drift_pct": detail["io_canary_drift_pct"],
            "pipeline_rows_per_io_canary": detail[
                "pipeline_rows_per_io_canary"
            ],
            "contention_flag": contention,
            "excluded": {
                "n": len(detail["excluded"]),
                "reasons": {
                    r: sum(1 for v in detail["excluded"].values() if v == r)
                    for r in sorted(set(detail["excluded"].values()))
                },
                "detail": detail_name,
            },
            "detail": detail_name,
        }
    )
    assert len(summary) < 1500, f"summary line too long: {len(summary)}"
    # final, lone stdout line — flush stderr first so nothing interleaves
    sys.stderr.flush()
    sys.stdout.flush()
    print(summary, flush=True)


if __name__ == "__main__":
    main()
