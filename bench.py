#!/usr/bin/env python
"""Benchmark harness: runs the headline queries at $SPARK_GRAFT_SF_DIR
(default /root/testdata/sf0.1) on local[$SPARK_GRAFT_CPUS] and prints ONE
JSON line: {"metric": ..., "value": total_sec, "unit": "sec",
"queries": {name: sec}, "sf": ...}.

Each query is forced end-to-end with a noop write (full execution, no
driver-side collection overhead in the measurement). A short warmup query
amortizes JVM/codegen startup out of the numbers.
"""

from __future__ import annotations

import json
import os
import re
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from riot_graphs_spark.plans.driver_queries import queries  # noqa: E402
from riot_graphs_spark.session import get_spark  # noqa: E402

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")

#: Headline set: the flagship plus one representative per operator family
#: (SURVEY §2.2-§2.6 + extension surface when present).
HEADLINE = [
    "flagship_daily_delta",
    "p1_json_props",
    "p2_derived_revenue",
    "p5_regex_extract",
    "a1_last_of_day",
    "g1_hourly_agg",
    "g3_gap_fill",
    "g3_gap_fill_linear",
    "g4_percentiles",
    "g5_daily_delta",
    "q1_pricing_summary",
    "j1_lineitem_orders",
    "j2_orders_by_region",
    "j_salted_skew",
    "j3_delta_new_orders",
    "j4_asof_purchase_signup",
    "o2_dedup_latest",
    "o3_anchored_day",
    "o6_session_windows",
    "o6_sliding_window",
    "g1_first_last",
    "p13_wrap",
    "mm_image_features",
    # extension surface (present from the dedup/similarity/text modules)
    "dedup_exact_groups",
    "dedup_minhash_lsh",
    "dedup_simhash",
    "text_quality_scores",
    "text_top_terms",
    "corpus_select",
    "ann_cosine_topk",
    "ann_ivf_topk",
    "ann_ivf_multiprobe",
    "q3_shipping_priority",
    "pii_redact",
    "contamination_check",
    "sample_stratified",
    "pack_sequences",
    "profile_orders",
    "snapshot_diff_orders",
    "pivot_source_lang",
    "quality_deciles",
    "cap_per_source",
    "sketch_stats",
    "j5_range_join_ship_week",
    "q5_regional_revenue",
    "q6_forecast_revenue",
    "q18_large_orders",
    "corr_max_acctbal_per_nation",
    "setop_order_returns",
    "hist_order_totalprice",
    "dedup_cc_clusters",
    "ts_moving_average",
    "ts_integral_daily",
    "ts_ewma",
    "q7_nation_volume",
    "q10_returned_customers",
    "q19_disjunctive",
    "q22_idle_customers",
    "q8_market_share",
    "q9_product_profit",
    "q13_customer_distribution",
    "q21_waiting_suppliers",
    "text_repetition",
    "boilerplate_removal",
    "embed_neardup_clusters",
    "ann_recall_ivf",
    "funnel_signup_purchase",
    "retention_weekly",
    "chunk_documents",
    "ts_trend_fit",
    "ts_zscore_anomalies",
    "ts_holt_forecast",
    "ts_m4_downsample",
    "dq_orders_expectations",
    "cdc_latest_state",
    "scd2_user_history",
    "g3_gap_fill_zero",
    "fuzzy_edit_pairs",
    "repeated_spans",
    "ts_sample_per_type",
    "text_token_drift",
    "ts_mad_anomalies",
    "sample_weighted",
    "ts_rsi",
    "emb_quantize_int8",
    "corpus_chunks_packed",
    # cc_recursive_sql is deliberately NOT benched: it is the SQL-surface
    # showcase of WITH RECURSIVE (UNION ALL path enumeration, depth-capped),
    # correctness-checked at sf0.01; at sf0.1 the denser near-dup edge set
    # exceeds Spark's 1M recursion row limit — exactly why production dedup
    # routes through the iterative/star operators (benched above).
    "j4_asof_interpolated",
    "ts_day_over_day",
    "ts_top2_with_other",
    "ts_daily_unique_users",
    "dau_wau_sketch_rollup",
    "attribution_last_touch",
    "ts_ohlc_daily",
    "ts_cmo",
    "ts_percentile_bands",
    "dq_referential_integrity",
    "ts_math_transforms",
    "ts_difference",
    "ts_heatmap",
    "split_train_val_test",
    "sessions_daily",
    "ts_missing_buckets",
    "dedup_cc_clusters_star",
    "rank_bm25",
    "text_tfidf_terms",
    "text_lm_cross_entropy",
    "text_normalize",
    "emb_kmeans_cells",
    "corpus_shards",
    "dedup_incremental_novel",
    "dataset_card",
    "influxql_hourly_mean",
    "influxql_daily_derivative",
    "bpe_pair_counts",
    "dedup_graph_degrees",
    "repeated_span_ranges",
    "emb_assign_fixed_cells",
    "lsh_recall_vs_exact",
    "ann_quantized_rescore",
    "ts_weekly_profile",
    "dedup_report_by_source",
    "ts_seasonal_anomalies",
    "event_transitions",
    "customer_rfm",
    "basket_part_pairs",
    "bm25_search_topk",
    "semdedup_keep_best",
    "pareto_parts",
    "lang_id_confusion",
    "supplier_scorecard",
    "decontaminated_corpus",
    "influxql_cumulative_sum",
    "influxql_difference",
    "influxql_stddev_daily",
    "influxql_tz_day",
    "influxql_top_points",
    "influxql_elapsed",
    "influxql_fill_linear",
    "influxql_subquery",
    "pq_assign_fixed",
    "ann_pq_topk",
    "influxql_count_distinct",
    "influxql_mode",
    "dedup_simhash_pairs",
    "chunk_sentences",
    "j6_interval_overlap",
    "influxql_field_math",
    "skew_profile_custkey",
    "emb_outliers_fixed",
    "emb_random_projection",
    "token_fertility_by_lang",
    "pack_utilization",
    "mm_resize_plan",
    "dedup_cluster_size_hist",
    "dq_winsorize_events",
    "mixture_temperature",
    "emb_l2_normalize",
    "mm_phash_pairs",
    "mm_audio_neardup",
    "ccnet_perplexity_buckets",
    "text_bigram_lm",
    # dedup_containment_pairs is correctness-swept but NOT benched, same as
    # its symmetric sibling dedup_ngram_jaccard: both are exact verify
    # stages that production runs on post-LSH samples, not full corpora.
    "freq_heavy_hitters",
    "corpus_global_index",
    "url_dedup_domains",
    "ngram_leakage_report",
    "emb_matryoshka_recall",
    "graph_pagerank_parts",
    "ts_level_shift",
    "text_collocations_pmi",
    "graph_triangle_profile",
    "dedup_sorted_neighborhood",
    "graph_hits_bipartite",
    "item_item_similarity",
    "hybrid_search_rrf",
    "graph_label_propagation",
    "graph_k_core",
    "path_top_sequences",
    "retention_km_curve",
    "funnel_time_to_convert",
    "minhash_estimate_error",
    "url_exact_dedup_groups",
    # Round-5 completion: every registered query is benched except the
    # three documented exclusions (cc_recursive_sql and the two exact
    # verify-stage pair ops, see comments above) — the 2x gate only
    # protects what is measured.
    "a2_newest_event",
    "ann_lsh_topk",
    "bpe_train_merges",
    "unigram_train_pieces",
    "dedup_keep_best",
    "dedup_minhash_signatures",
    "dedup_paragraph_hashes",
    "emb_label_centroids",
    "embed_neardup_pairs",
    "freq_heavy_hitters_grouped",
    "g1_rollup_totals",
    "g6_annotations",
    "g7_distinct_tags",
    "j4_asof_next_purchase",
    "mixture_weights",
    "mm_audio_windows",
    "mm_frame_sample",
    "p12_html_anchor",
    "p6_parse_offset",
    "p7_parse_rfc2822",
    "p9_time_range",
    "q2_min_cost_supplier",
    "q4_order_priority",
    "q11_part_value_share",
    "q12_late_shipments",
    "q14_promo_revenue",
    "q15_top_supplier",
    "q16_supplier_counts",
    "q17_small_qty_revenue",
    "q20_excess_suppliers",
    "text_gopher_flags",
    "text_lang_id",
    "text_rolling_fingerprint",
    "text_token_count",
    "ts_cumulative_sum",
    "ts_derivative_rate",
    "ts_elapsed",
    "ts_ewma_window",
    "ts_holt_winters_seasonal",
    "ts_mode_value",
    "ts_spread_stats",
    "ts_time_weighted_avg",
    "ts_top3_per_type",
    "rollup_incremental_weekly",
    "cube_order_status_priority",
    "emb_knn_label_eval",
    "dedup_cross_source_matrix",
    "profile_correlations",
    "assoc_lang_source",
    # round-6 registrations
    "rollup_incremental_percentiles",
    "rollup_quantile_sketch",
    "psi_value_drift",
    "ks_value_drift",
    "mi_lang_source",
    "freq_trending_daily_users",
    "emb_centroid_drift",
    "equi_depth_value_edges",
    "mixture_ipf_weights",
    "ks_uniform_fit",
    "quality_quantile_normalized",
    # round-7 registrations (evaluation layer)
    "quality_auc_report",
    "kappa_lang_agreement",
    "spearman_quality_length",
    "eval_pr_thresholds",
    "lift_quality_deciles",
    "ndcg_search_eval",
    "keep_rate_wilson_ci",
    "quality_calibration_summary",
    "quality_auc_by_lang",
    "quality_mean_bootstrap_ci",
    "lang_id_class_report",
    "retrieval_recall_mrr",
    "ts_autocorrelation",
    "benford_totalprice",
    "source_gini",
    "text_lexical_diversity",
    "ts_cross_correlation",
    "ts_seasonal_decompose",
    "ab_purchase_rate_test",
    "freq_boilerplate_trigrams",
    "quality_auc_bootstrap_ci",
    "quality_delta_auc_paired",
    "quality_mean_ci_by_source",
    "corpus_build_manifest",
    "mcnemar_langid_vs_majority",
    "js_source_lang_divergence",
    "doclen_median_bootstrap_ci",
    "vocab_coverage_curve",
    "mixture_ess_uniform",
    "perm_test_user_value",
    "text_readability",
    "contamination_rate_by_source",
    "lang_mix_entropy",
    "vocab_entropy_by_source",
    "split_dup_leakage",
    "emb_similarity_hist",
    "quality_hist_calibration",
    "integrity_checksum_orders",
    "cdc_chunk_dedup_report",
    "emb_dim_stats",
    "privacy_k_anonymity",
    "blocklist_screen_report",
    "cdc_chunk_neardup_pairs",
    "search_rbo_lexical_vs_dense",
    "ab_simpsons_check",
    "ts_mann_kendall",
    "ts_seasonal_strength",
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
    "kappa_weighted_length_deciles",
    "keep_rate_eb_shrunk_by_source",
    "vocab_jaccard_sources",
    "retention_na_hazard",
    "ts_interarrival_expfit",
    "retention_survival_summary",
    "emb_cells_vs_labels_ari",
    # round-9 registrations (classical tests, robust/EVT stats, embedding
    # geometry, text analysis, graph widening, behavior chains)
    "chi2_lang_source",
    "jarque_bera_value",
    "kendall_tau_len_tokens",
    "cliffs_delta_doclen",
    "hl_shift_doclen",
    "importance_weighted_doclen",
    "partial_corr_price_qty_disc",
    "ols_tokens_chars",
    "ts_runs_test",
    "ts_ljung_box",
    "ts_variance_ratio",
    "ts_hurst_hourly",
    "ts_pacf",
    "ts_sax_motifs",
    "emb_isotropy",
    "emb_covariance_pairs",
    "emb_centroid_margin",
    "emb_label_cosine_contrast",
    "pii_scan_report",
    "feature_hash_audit",
    "rake_keywords_top",
    "text_script_profile",
    "vocab_simpson_diversity",
    "term_burstiness_top",
    "text_compressibility",
    "graph_assortativity",
    "graph_link_prediction",
    "graph_bfs_layers",
    "markov_stationary_events",
    "attribution_time_decay",
    "hellinger_doclen_sources",
    "hill_tail_price",
    "mahalanobis_outlier_docs",
    "huber_location_price",
    "pettitt_daily_value",
    "grubbs_daily_value",
    "gumbel_hourly_burst",
    "granger_clicks_purchases",
    "friedman_event_types",
    "cochran_q_quality_flags",
    "mcc_langid_en",
    "isotonic_purchase_by_activity",
    "cvm_doclen_en_rest",
    "vif_doc_features",
    "neyman_allocation_quality",
    "textrank_keywords_top",
    # round-9 post-window registrations (defer to the r10 driver window)
    "wasserstein_doclen_en_rest",
    "krippendorff_lang_alpha",
    "markov_entropy_rate",
    "event_pmi_userday",
    "mixture_temperature_sources",
    "pairwise_welch_holm",
    "emb_power_iteration_top",
    "ad_doclen_en_rest",
    "dtw_clicks_purchases",
    "ab_srm_check",
    "ab_cuped_value",
    "revenue_lorenz_deciles",
    "feature_info_gain",
    "pairwise_welch_by_fdr",
    "emb_spectral_gap",
    "esd_outlier_days",
    "yuen_trimmed_doclen",
    "cmh_purchase_by_activity",
    "binseg_daily_value",
    # round-10 registrations
    "retention_km_bands",
    "benford_significand",
    "cohens_d_doclen",
    "ab_ratio_value_per_event",
    "ab_sprt_purchase_daily",
    "hazard_ratio_churn_parity",
    "event_count_overdispersion",
    "ts_turning_points",
    "ts_bartels_rank",
    "ts_spectral_entropy",
    "ts_bollinger_daily",
    "ts_seasonal_mann_kendall",
    "chow_break_daily",
    "ols_tokens_2f",
    "breusch_pagan_tokens",
    "emb_participation_ratio",
    "emb_dim_moments",
    "emb_centroid_similarity",
    "emb_norm_outliers",
    "emb_int8_snr",
    "vocab_hapax_share",
    "text_case_profile",
    "text_digit_deciles",
    "lang_script_mismatch",
    "doclen_lognormal_ks",
    "token_yield_by_quality",
    "dedup_cluster_purity",
    "split_feature_parity",
    "orders_cohort_ltv",
    "order_to_ship_delay",
    "part_affinity_lift",
    # round-10 post-window registrations (defer to the r11 driver window)
    "user_activity_gini",
    "anova_value_weekday",
    "retention_weekly_wilson",
    "dq_completeness_profile",
    "dedup_lsh_band_stats",
    "event_interarrival_cv",
    "stopword_coverage_by_lang",
    "customer_order_frequency",
    "discount_band_profile",
    "jonckheere_value_by_activity",
    "mood_median_doclen_lang",
    "supplier_revenue_hhi",
    "ts_dickey_fuller",
    "return_rate_by_band",
    "quality_ks_by_source",
]


def sf_from_dir(path: str) -> float:
    m = re.search(r"sf([0-9.]+)", path)
    return float(m.group(1)) if m else -1.0


def main() -> None:
    spark = get_spark(app_name="riot-graphs-bench")
    spark.sparkContext.setLogLevel("ERROR")
    registry = queries()
    names = [n for n in HEADLINE if n in registry]
    # Targeted re-measurement: SPARK_GRAFT_BENCH_ONLY=q1,q2 restricts the
    # run (iterating on one plan without paying for the full headline set).
    only = os.environ.get("SPARK_GRAFT_BENCH_ONLY")
    if only:
        wanted = {n.strip() for n in only.split(",") if n.strip()}
        names = [n for n in names if n in wanted]

    # Warmup: spin the JVM, codegen, and parquet footers once.
    registry["flagship_daily_delta"](spark, SF_DIR).write.format("noop").mode(
        "overwrite"
    ).save()

    # Best of 2 runs per query: a single pass is hostage to host contention
    # spikes (observed up to ~1.7× run-to-run variance); min-of-2 reports
    # what the plan costs rather than what the neighbors were doing.
    timings: dict[str, float] = {}
    for name in names:
        best = float("inf")
        for _ in range(2):
            t0 = time.perf_counter()
            registry[name](spark, SF_DIR).write.format("noop").mode("overwrite").save()
            best = min(best, time.perf_counter() - t0)
        timings[name] = round(best, 2)

    total = round(sum(timings.values()), 2)
    sf = sf_from_dir(SF_DIR)

    def render(qmap: dict[str, float]) -> str:
        return json.dumps(
            {
                "metric": "headline_query_wall_time",
                "value": total,
                "unit": "sec",
                "queries": qmap,
                "sf": sf,
                "n_queries": len(timings),
            },
            separators=(",", ":"),
        )

    # The driver captures only the LAST 2000 chars of stdout and JSON-parses
    # the result (BENCH_r01: the full 102-entry line survived only as a tail
    # fragment, "parsed": null). The full per-query map always goes to disk
    # (bench_out.json); the stdout line keeps the most EXPENSIVE entries that
    # fit the capture window — those are what a performance audit reads first.
    with open(os.path.join(os.path.dirname(os.path.abspath(__file__)), "bench_out.json"), "w") as f:
        f.write(render(timings) + "\n")
    by_cost = sorted(timings, key=timings.get, reverse=True)
    shown = dict(timings)
    while len(render(shown)) > 1900 and by_cost:
        shown.pop(by_cost.pop())  # drop the cheapest until the line fits
    print(render(shown))
    spark.stop()


if __name__ == "__main__":
    main()
