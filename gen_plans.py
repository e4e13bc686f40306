#!/usr/bin/env python
"""Regenerate docs/PLANS.md: the formatted physical plan of each showcase
query at sf0.001, so plan regressions are visible in review diffs — the
human-readable companion to tests/test_plan_shapes.py.

Run ad hoc after operator changes: python gen_plans.py
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from riot_graphs_spark.plans.driver_queries import QUERIES  # noqa: E402
from riot_graphs_spark.session import get_spark  # noqa: E402

SF_DIR = "/root/testdata/sf0.001"

#: One representative per plan family — the queries whose physical shape
#: carries a scale guarantee worth eyeballing.
SHOWCASE = [
    # round-13 families: equal-mass distinct-axis buckets (no ntile),
    # integer-unit DFA profile, label-blocked anchor-sampled TwoNN,
    # vocab-bounded LLR margins, one-pass session sensitivity
    "user_decay_engagement",
    "ts_dfa",
    "emb_twonn_intrinsic_dim",
    "collocations_llr_top",
    "session_gap_sensitivity",
    "flagship_daily_delta",
    "a1_last_of_day",
    "q1_pricing_summary",
    "q5_regional_revenue",
    "q18_large_orders",
    "q4_order_priority",
    "q19_disjunctive",
    "q22_idle_customers",
    "ts_integral_daily",
    "ts_zscore_anomalies",
    "ts_m4_downsample",
    "cdc_latest_state",
    "dedup_minhash_signatures",
    "boilerplate_removal",
    "ann_cosine_topk",
    "fuzzy_edit_pairs",
    "j4_asof_interpolated",
    "corpus_chunks_packed",
    "rank_bm25",
    "text_lm_cross_entropy",
    "text_normalize",
    "dedup_keep_best",
    "corpus_shards",
    "dedup_incremental_novel",
    "repeated_span_ranges",
    "influxql_hourly_mean",
    "dedup_simhash_pairs",
    "ann_pq_topk",
    "ann_ivfpq_topk",
    "j6_interval_overlap",
    "chunk_sentences",
    "influxql_subquery",
    # round-4 families: broadcast-bounds clamp, tiny-aggregate windows,
    # zero-shuffle normalize, inverted-index containment, LM + narrow
    # window bucketing
    "dq_winsorize_events",
    "mixture_temperature",
    "emb_l2_normalize",
    "dedup_containment_pairs",
    "ccnet_perplexity_buckets",
    # round-4 late families: sketch-candidates + exact recount, two-phase
    # global numbering, regex URL curation, broadcast-bounded leakage
    "freq_heavy_hitters",
    "corpus_global_index",
    "url_dedup_domains",
    "ngram_leakage_report",
    "graph_pagerank_parts",
    "text_collocations_pmi",
    "graph_triangle_profile",
    "dedup_sorted_neighborhood",
    "ts_level_shift",
    "graph_hits_bipartite",
    "hybrid_search_rrf",
    "graph_label_propagation",
    "graph_k_core",
    "retention_km_curve",
    "path_top_sequences",
    # round-5 families: truncated-EWMA lag window (codegen, 1 exchange),
    # per-group MG sketch + broadcast recount, row-local unit-hash dedup
    "ts_ewma_window",
    "freq_heavy_hitters_grouped",
    "dedup_paragraph_hashes",
    # round-5 late: mergeable-partial rollup, one-pass CUBE expand,
    # O(k²)-moment single agg, broadcast-grid chi²
    "rollup_incremental_weekly",
    "cube_order_status_priority",
    "profile_correlations",
    "assoc_lang_source",
    # round-6 families: mergeable histogram-percentile state, tagged-union
    # PSI grid (no spine join), distinct-axis KS windows, single-scan
    # window-marginal MI, windowed (per-day) MG heavy hitters
    "rollup_incremental_percentiles",
    "psi_value_drift",
    "ks_value_drift",
    "mi_lang_source",
    "freq_trending_daily_users",
    "emb_centroid_drift",
    "equi_depth_value_edges",
    "mixture_ipf_weights",
    "ks_uniform_fit",
    "quality_quantile_normalized",
    # round-7 families (evaluation layer): counts-based rank-sum AUC,
    # distinct-axis lift buckets, broadcast-qrels NDCG, one-scan PR
    # thresholds, closed-form Wilson groups, marginal-join kappa,
    # rank-map Spearman, xB partial-aggregable Poisson bootstrap
    "quality_auc_report",
    "lift_quality_deciles",
    "ndcg_search_eval",
    "eval_pr_thresholds",
    "keep_rate_wilson_ci",
    "kappa_lang_agreement",
    "spearman_quality_length",
    "quality_mean_bootstrap_ci",
    # round-7 late families: one-window-sort ACF, string-exact Benford,
    # groups-axis Gini, zero-shuffle lexical diversity, bucket-axis CCF,
    # broadcast-seasonal-map decomposition
    "ts_autocorrelation",
    "benford_totalprice",
    "source_gini",
    "text_lexical_diversity",
    "ts_cross_correlation",
    "ts_seasonal_decompose",
    # round-8 families: shared-weight paired bootstrap (2-ary scorer
    # axis), grouped bootstrap with broadcast boot side, checkpoint-
    # staged manifest composition, discordant-cell McNemar, broadcast-
    # grid JSD, per-replicate weighted median, literal-threshold vocab
    # coverage, md5-relabel randomization test, staged-projection CDC
    # chunking + capped-bucket pairing, commutative-sum checksum,
    # literal-map RBO
    "quality_delta_auc_paired",
    "quality_mean_ci_by_source",
    "corpus_build_manifest",
    "mcnemar_langid_vs_majority",
    "js_source_lang_divergence",
    "doclen_median_bootstrap_ci",
    "vocab_coverage_curve",
    "perm_test_user_value",
    "cdc_chunk_dedup_report",
    "cdc_chunk_neardup_pairs",
    "integrity_checksum_orders",
    "emb_dim_stats",
    "quality_hist_calibration",
    "search_rbo_lexical_vs_dense",
    "split_dup_leakage",
    # round-8 late families: bucket-axis robust trend pair (weighted-
    # median slopes, integer-exact CUSUM + md5 permutation), distinct-
    # value-axis rank tests (MW counts, KW midranks), single-reduction
    # parametric tests (Welch, ANOVA with round-6-decimal moment cuts,
    # groups-axis pairwise grid, hypotheses-axis BH), TopK Zipf head +
    # doc-axis Heaps walk, bucket-axis backtest/periodogram/rolling-
    # corr, zero-shuffle clustering triad, key-axis join audit,
    # (time x arm)-grid log-rank, users-axis dose-response trend
    "ts_theil_sen",
    "ts_cusum_changepoint",
    "mw_doclen_sources",
    "welch_value_click_purchase",
    "anova_value_event_types",
    "kw_doclen_by_lang",
    "vocab_zipf_fit",
    "ts_forecast_backtest",
    "pairwise_welch_event_types",
    "emb_silhouette_fixed_cells",
    "ab_power_mde",
    "pairwise_welch_bh_fdr",
    "emb_davies_bouldin_fixed",
    "levene_doclen_by_lang",
    "ts_dominant_period",
    "join_audit_lineitem_orders",
    "ts_rolling_corr_click_view",
    "trend_conversion_by_activity",
    "logrank_churn_by_parity",
    "vocab_heaps_fit",
    "emb_calinski_harabasz_fixed",
    "ts_mann_kendall",
    "ts_seasonal_strength",
    # round-8 closing families: levels-grid weighted kappa, groups-axis
    # EB prior broadcast, token-axis vocab Jaccard, time-axis hazard /
    # RMST walks, distinct-gap KS, contingency-axis ARI
    "kappa_weighted_length_deciles",
    "keep_rate_eb_shrunk_by_source",
    "vocab_jaccard_sources",
    "retention_na_hazard",
    "ts_interarrival_expfit",
    "retention_survival_summary",
    "emb_cells_vs_labels_ari",    "hill_tail_price",
    "mahalanobis_outlier_docs",
    "huber_location_price",
    "pettitt_daily_value",
    "granger_clicks_purchases",
    "isotonic_purchase_by_activity",
    "textrank_keywords_top",
    "emb_power_iteration_top",
    "dtw_clicks_purchases",
    "ab_cuped_value",
    "wasserstein_doclen_en_rest",
    "markov_entropy_rate",
    # round-11 plan families: broadcast multi-probe routing, state-sized
    # sketch merge/read, word-table EM, bigram-axis novelty, contingency
    # lambda/U, moment-scan Welch/capability, day-axis HAC/KPSS/DW,
    # probe-broadcast hubness, pre-aggregated trade balance, user-keyed
    # attribution windows, key-skew audit
    "ann_ivf_multiprobe",
    "rollup_quantile_sketch",
    "unigram_train_pieces",
    "ngram_novelty_bigram",
    "gk_lambda_lang_source",
    "theils_u_lang_source",
    "welch_anova_value_event",
    "newey_west_daily_mean",
    "ts_kpss_level",
    "emb_hubness_topk",
    "nation_trade_balance",
    "attribution_position_based",
    "event_partition_skew",
    "qte_doclen_deciles",
    "wilcoxon_signed_rank_weekend",
    "quality_brier_decomposition",
]


def main() -> None:
    spark = get_spark(app_name="riot-graphs-plan-dump")
    spark.sparkContext.setLogLevel("ERROR")
    mode = spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString(
        "formatted"
    )
    out = [
        "# Physical plans (sf0.001, local)",
        "",
        "Auto-generated by `gen_plans.py` — do not edit. One representative",
        "query per plan family; the properties the plans must keep are",
        "asserted in `tests/test_plan_shapes.py`.",
        "",
    ]
    for name in SHOWCASE:
        df = QUERIES[name](spark, SF_DIR)
        plan = df._jdf.queryExecution().explainString(mode)
        out += [f"## {name}", "", "```", plan.rstrip(), "```", ""]
    path = os.path.join(os.path.dirname(os.path.abspath(__file__)), "docs", "PLANS.md")
    with open(path, "w") as f:
        f.write("\n".join(out))
    print(f"wrote {path} ({len(SHOWCASE)} plans)")
    spark.stop()


if __name__ == "__main__":
    main()
