"""Audit of GLOBAL window specs (``Window.orderBy`` with no
``partitionBy``): every such window funnels its input through one
SinglePartition task, so each surviving site must operate on a PROVABLY
bounded domain — an aggregated value table (distinct lengths, days,
buckets, sources), a post-limit head, or a partition-count row set —
never the corpus, the key table, or the vocab.

The r8 verdict asked for exactly this: x182's key-table rank was the one
corpus-unsafe site (fixed via the count-of-counts closed form), and the
other ~32 sites needed their domains stated. This test IS that statement,
kept in sync by construction: it AST-scans the package for
``Window.orderBy(...)`` calls (the attribute chain distinguishes them
from ``Window.partitionBy(...).orderBy(...)``), maps each to its
enclosing function, and fails on any site not in the audited allowlist —
so a new global window cannot land without writing down why its domain
is bounded (or being converted to ``distributed_rank`` /
``distributed_ntile`` / the count-of-counts closed form)."""

from __future__ import annotations

import ast
import os

PKG = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "kafka_connect_spark")

# (module relative to kafka_connect_spark/, enclosing function) -> why the
# windowed domain is bounded. "rows<=K" = a literal .limit(K) precedes the
# window; "agg:<X>" = the window input is an aggregation keyed by X, whose
# cardinality is bounded by the value domain, not the corpus.
AUDITED = {
    ("queries/relational.py", "x182_join_key_skew_audit"):
        "agg:count-of-counts — |distinct per-key counts| rows (power-law: ~1e3)",
    ("queries/metrics.py", "quart"):
        "agg:metric quartile table — |metrics| x 4 rows",
    ("queries/metrics.py", "x100_bootstrap_ci"):
        "agg:(metric, bootstrap replicate) — |metrics| x n_boot (fixed 64) rows",
    ("queries/metrics.py", "p30_burn_rate"):
        "agg:time buckets — |days x 24| rows for the sliding burn window",
    ("queries/metrics.py", "x179_theil_sen_trend"):
        "agg:days + day-pairs — |days| then |days|^2/2 rows (31 days fixed)",
    ("queries/metrics.py", "x186_kaplan_meier_conversion"):
        "agg:distinct duration days — |days| rows for the KM product",
    ("queries/metrics.py", "hist_quantiles"):
        "agg:(value, count) histogram — |distinct session durations / "
        "events-per-session| rows (x208's value-domain selection cumsum)",
    ("queries/text.py", "x14h_vocab"):
        "rows<=20 — rank window runs after .limit(20)",
    ("queries/text.py", "x58_length_decile_stats"):
        "agg:distinct n_chars — the two-phase ntile's tiny value-domain cumsum",
    ("queries/text.py", "x81_vocab_growth"):
        "agg:growth buckets — fixed bucket count cumsum",
    ("queries/text.py", "x91_rank_fusion"):
        "rows<=50 — per-signal ranks use distributed_rank; final window after .limit(50)",
    ("queries/text.py", "x110_pareto_abc"):
        "agg:sources — |distinct source| rows",
    ("queries/stats.py", "x217_nelson_aalen_hazard"):
        "agg:distinct duration days — the risk-set reverse cumsum and the "
        "hazard cumsum both run over |days| rows (x186's domain)",
    ("queries/stats.py", "x244_sprt_conversion_drift"):
        "agg:days — the SPRT cumulative LLR runs over |days| rows",
    ("queries/stats.py", "x226_bh_fdr_panel"):
        "agg:sources — the BH rank runs over the |sources| test panel",
    ("queries/stats.py", "x212_kruskal_wallis_length"):
        "agg:distinct n_chars — the midrank cumsum runs over the length "
        "histogram (value domain), never the corpus",
    ("queries/text.py", "x210_skyline_docs"):
        "agg:distinct n_chars — the skyline staircase cummax runs over "
        "the length-value domain, never the corpus",
    ("queries/text.py", "x116_token_budget_allocation"):
        "agg:sources — |distinct source| rows",
    ("queries/text.py", "x118_ranked_retrieval"):
        "rows<=5 — TakeOrdered top-5 precedes the rank window",
    ("queries/text.py", "x123_heaps_fit"):
        "agg:growth buckets — fixed bucket count cumsum",
    ("queries/text.py", "x125_source_rank_movers"):
        "agg:sources — |distinct source| rows (two windows)",
    ("queries/text.py", "x140_bm25_retrieval"):
        "rows<=10 — TakeOrdered top-10 precedes the rank window",
    ("queries/dedup.py", "boilerplate_blocklist_from_docs"):
        "rows<=top_k — TakeOrderedAndProject top-k (default 20) precedes "
        "the rank window (the x140 idiom); the df-floor filter runs "
        "before the distributed top-k",
    ("queries/text.py", "x142_stratified_eval_sample"):
        "agg:languages — |distinct lang| rows (largest-remainder seats)",
    ("queries/text.py", "x170_rrf_rank_fusion"):
        "rows<=10 — per-ranker ranks use distributed_rank; final window after .limit(10)",
    ("queries/text.py", "x174_ks_length_distance"):
        "agg:distinct lengths — |distinct n_chars| rows for the ECDF merge",
    ("queries/text.py", "x176_token_gini"):
        "agg:count-of-counts — |distinct freq values| rows (closed-form rank sums)",
    ("queries/quality.py", "x177_weighted_sample"):
        "rows<=20 — TakeOrdered top-20 precedes the rank window",
    ("queries/quality.py", "x194_gain_chart"):
        "agg:deciles — 10-row cumulative window",
    ("queries/quality.py", "x187_quality_auc"):
        "agg:distinct score values — <= 1e6 rows (integer ppm score) cumsum",
    ("queries/quality.py", "x253_quantile_normalize_length"):
        "agg:distinct n_chars — the corpus length-histogram cumsum "
        "(value domain; per-source windows are partitioned)",
    ("queries/quality.py", "x263_operating_point"):
        "agg:distinct score values — p-DESC cumsum over the <= 1e6-row "
        "(score, label) count table (x187's domain)",
    ("streaming/drift.py", "operating_point_from_counts"):
        "agg:distinct score values — x263's p-DESC cumsum over the "
        "score_label_counts state table (<= 1e6+1 rows)",
    ("streaming/drift.py", "auc_from_counts"):
        "agg:distinct score values — x187's value-domain cumsum over the "
        "score_label_counts state table (<= 1e6+1 rows)",
    ("streaming/drift.py", "gain_chart_from_counts"):
        "agg:(score value, label) — rank-interval cumsum over the <= "
        "2e6+2-row count table, then 10-row decile windows",
    ("queries/quality.py", "mr2_map"):
        "agg:signal value domain — |distinct n_chars| / |distinct n_toks| rows",
    ("queries/text.py", "x197_length_qq_profile"):
        "agg:distinct n_chars — corpus-decile cumsum over the length value domain",
    ("queries/text.py", "x192_vocab_coverage_curve"):
        "agg:count-of-counts — |distinct freq values| cumsum (closed-form top-K mass)",
    ("functions/skew.py", "distributed_rank"):
        "agg:range-partition ids — num_partitions rows (the offset cumsum)",
}


def _global_window_sites():
    sites = set()
    for root, _dirs, files in os.walk(PKG):
        for fn in files:
            if not fn.endswith(".py"):
                continue
            path = os.path.join(root, fn)
            rel = os.path.relpath(path, PKG)
            tree = ast.parse(open(path).read())
            funcs = [
                (n.lineno, n.end_lineno, n.name)
                for n in ast.walk(tree)
                if isinstance(n, (ast.FunctionDef, ast.AsyncFunctionDef))
            ]
            for node in ast.walk(tree):
                if not (
                    isinstance(node, ast.Call)
                    and isinstance(node.func, ast.Attribute)
                    and node.func.attr == "orderBy"
                    and isinstance(node.func.value, ast.Name)
                    and node.func.value.id == "Window"
                ):
                    continue
                encl = [
                    name
                    for (a, b, name) in funcs
                    if a <= node.lineno <= (b or a)
                ]
                sites.add((rel, encl[-1] if encl else "<module>"))
    return sites


def test_every_global_window_is_audited():
    sites = _global_window_sites()
    unaudited = sites - set(AUDITED)
    assert not unaudited, (
        "global Window.orderBy without a domain audit entry — either add "
        "a bounded-domain justification to AUDITED or convert the site to "
        f"distributed_rank/distributed_ntile/count-of-counts: {sorted(unaudited)}"
    )


def test_audit_has_no_stale_entries():
    sites = _global_window_sites()
    stale = set(AUDITED) - sites
    assert not stale, f"AUDITED entries with no matching site: {sorted(stale)}"
