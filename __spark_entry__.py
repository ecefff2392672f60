"""Driver contract for the spark-graft builder (PySpark target).

``entry(spark)`` runs the flagship query (the reference's whole pipeline
semantics: CDC normalize → collapse → MERGE → current state) on sf0.001.
``queries()``/``oracle_sql()`` expose every implemented operator from
SURVEY.md §2 plus the large-scale pipeline extensions; implementations
live in ``rust_cdc_spark/queries/``.
"""

from __future__ import annotations

import os
import sys
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from rust_cdc_spark.queries import load_all  # noqa: E402


def entry(spark: SparkSession) -> DataFrame:
    """Flagship: CDC merge pipeline (split log → state ⊕ changes) on
    sf0.001; driver checks rows>0 and stable schema."""
    registry = load_all()
    return registry["cdc_merge_upsert"].spark_fn(spark, "/root/testdata/sf0.001")


# Round-6 priority order (the driver checks 50 names per round, in this
# order), built per VERDICT r5 #1/#3: (1) the round-5 red query whose
# fix must land a green driver row, (2) the queries ADDED or CHANGED in
# round 6 (sessions 1 and 2 — 66 names, so ~16 spill past the 50-slot
# window into round 7; every spilled name is covered by the local
# full-registry sweeps at 3 SFs, the 0-row fixture sweep, the
# vanilla-TZ sweep, and pytest oracle parity), (3) the 41 names whose
# most recent driver row is from ROUND 1 — rotating the window onto
# the stalest checks once the new names drain. Everything below is
# green under tools/check_correctness.py at sf0.01 AND the sf0.001
# degenerate sweep (standard + vanilla-TZ sessions).
_R06_PRIORITY = [
    # 1 — the round-5 bug fix (DIVIDE_BY_ZERO on zero-conversion arms)
    "events_ab_test_lift",
    # 2 — new in round 6
    "events_forecast_holt", "events_cusum_drift", "text_zipf_slope",
    "docs_winnowing_fingerprints", "retrieval_query_likelihood",
    "host_graph_label_propagation", "join_size_estimate",
    "embedding_centroid_classifier_eval", "dedup_lsh_cost_estimate",
    "events_audience_overlap", "part_demand_croston",
    "layout_hilbert_key", "host_graph_modularity", "events_path_topk",
    "events_hll_mergeability",
    # 2b — new in round 6, second session
    "events_acf_lags", "events_seasonal_decompose", "events_theil_sen",
    "events_changepoint_binseg", "host_graph_adamic_adar",
    "host_graph_bfs_hops", "orders_benford_audit", "table_fd_discovery",
    "keyword_textrank_top", "text_mojibake_score",
    "embedding_coreset_kcenter", "embedding_hubness_degree",
    "retrieval_eval_map", "layout_partition_advisor",
    "cdc_update_conflicts", "quality_rule_kappa",
    "quality_label_model_vote", "tokenizer_unigram_prune",
    "host_graph_assortativity", "part_price_elasticity",
    "events_markov_attribution", "orders_duplicate_invoice_detect",
    "events_survival_km", "events_entropy_rate", "customer_revenue_gini",
    "events_hourly_concurrency", "events_anomaly_seasonal_resid",
    "events_uplift_by_segment", "cdc_key_churn_hotspots",
    "embedding_isotropy_score", "part_abc_xyz_classification",
    "events_haar_energy", "nation_trade_matrix",
    "events_cohort_did", "text_burrows_delta",
    "events_poisson_dispersion", "part_supplier_concentration",
    "events_gap_exponential_ks", "quality_signal_matrix",
    "cdc_out_of_order_audit", "events_retention_halflife",
    "host_graph_rich_club", "events_new_vs_returning",
    "events_sequential_pattern_support", "events_crosscorr_lead_lag",
    "sql_recursive_reachability", "sql_lateral_topn_per_group",
    "events_growth_accounting", "events_power_analysis_mde",
    "orders_skyline_price_date", "cdc_late_data_histogram",
    "tokenizer_viterbi_segment", "lineitem_ship_delay_percentiles",
    "events_composition_drift_tv", "cdc_merge_idempotence_probe",
    "customer_revenue_gini_by_nation", "events_segment_transition_matrix",
    "docs_source_vocab_jaccard", "events_weekend_effect",
    "events_purchase_gap_gamma_fit", "text_hapax_ratio_by_source",
    "part_brand_switch_matrix",
    "embedding_dim_variance_profile",
    "events_conversion_window_sensitivity",
    # 3 — stalest: last driver row is CORRECTNESS_r01
    "agg_cube_priority_status", "agg_distinct_lineitem", "agg_percentiles_by_status",
    "agg_rollup_returns", "asof_join_purchase_last_click", "cdc_collapse_last",
    "cdc_current_state", "cdc_ddl_comment_strip", "cdc_merge_upsert",
    "cdc_normalize", "cdc_op_stats", "cdc_route_regex",
    "cdc_txn_boundaries", "corpus_profile", "dedup_clusters",
    "dedup_exact_documents", "dedup_minhash_lsh_pairs", "dedup_ngram_jaccard_pairs",
    "dedup_simhash_fingerprints", "join_anti_customers_without_orders", "join_semi_parts_ordered",
    "lang_id_heuristic", "multimodal_frame_sample", "multimodal_payload_stats",
    "order_by_limit_top_orders", "pivot_status_by_priority", "q1_pricing_summary",
    "q3_shipping_priority", "q5_local_supplier_volume", "sample_bernoulli_documents",
    "sample_stratified_documents", "scalar_functions_orders", "set_except_nations",
    "set_intersect_nations", "similarity_knn_batch", "similarity_topk_cosine",
    "text_quality_score", "text_rolling_hash", "text_stats",
    "text_token_bpe_count", "window_topk_orders_per_customer",
]

# Next-stalest tier: names whose most recent driver row is
# CORRECTNESS_r02 — they follow the r6 block so the round-7 window
# (and any spill past 50 this round) lands on them next.
_R02_STALE = [
    "asof_join_next_click_1h", "bpe_encode_corpus", "cdc_incremental_agg",
    "cdc_pointintime_join", "cdc_scd2_history", "cdc_snapshot_bootstrap",
    "dedup_keep_best", "dense_rank_supplier_balance", "events_funnel_conversion",
    "events_json_props", "events_retention_cohorts", "events_sessionize",
    "events_tumbling_window", "grouping_sets_lineitem", "join_left_outer_customer_orders",
    "lag_lead_order_gaps", "layout_zorder_key", "multimodal_dedup_exact",
    "multimodal_phash_buckets", "q10_returned_items", "q11_important_parts",
    "q12_shipmode_priority", "q13_customer_distribution", "q14_promo_revenue",
    "q15_top_supplier", "q16_part_supplier_counts", "q17_small_quantity_revenue",
    "q18_large_volume_customers", "q19_disjunctive_predicates", "q20_excess_suppliers",
    "q21_waiting_orders", "q22_global_sales_opportunity", "q2_min_cost_supplier",
    "q4_order_priority_check", "q6_forecast_revenue", "q7_nation_volume",
    "q8_market_share", "q9_product_type_profit", "quality_classifier_train",
    "range_join_click_attribution", "retrieval_bm25_topk", "retrieval_rrf_fusion",
    "sample_weighted_documents", "scalar_string_funcs_part", "semantic_dedup_prune",
    "set_union_nation_presence", "subquery_above_avg_orders", "table_column_stats",
]

# Round-5 priority order (kept below the staleness tiers; adds no new
# names once the tiers above are consumed).
_R05_PRIORITY = [
    # new in round 5 (second session)
    "privacy_k_anonymity", "events_timeseries_pearson_topk",
    "dedup_incremental_minhash_probe",
    "embedding_dedup_threshold_sweep", "dedup_cluster_purity",
    "events_ab_test_lift",
    "contamination_bloom_probe", "integrity_referential_audit",
    "events_markov_stationary", "customer_cohort_ltv",
    "quality_ks_drift", "events_dedup_consecutive",
    "orders_basket_affinity", "retrieval_prf_expansion",
    "ccnet_perplexity_tails",
    "host_graph_kcore", "text_kneser_ney_bigram", "keyword_rake_top",
    "lang_id_passage_vote", "table_skew_metrics",
    "part_entity_resolution", "events_funnel_time_to_convert",
    "cdc_ivm_join_view", "cdc_delete_compliance",
    # new in round 5
    "preference_bradley_terry", "curriculum_difficulty_phases",
    "corpus_bleu_source_overlap", "events_abandoned_views",
    "multimodal_audio_frame_energy", "vocab_coverage_curve",
    "host_graph_hits", "multimodal_shot_boundaries",
    "cdc_scd2_type6", "text_readability_scores",
    "embedding_matryoshka_recall", "agg_approx_quantile_eval",
    "events_forecast_ses",
    # implementation changed in round 5
    "embedding_near_dup_exact", "embedding_near_dup",
    "agg_approx_distinct_lineitem", "lang_id_multiclass",
    "lang_id_confusion_matrix", "customer_rfm_segments",
    "events_power_users_pareto", "perplexity_filter_buckets",
    "cdc_scd2_as_of",
]

# Round-4 closure list (kept: these spill right after the round-5 names
# so the driver's 50-cap still sweeps recently-relevant queries first).
_R04_PRIORITY = [
    "cdc_snapshot_diff", "host_authority_pagerank",
    "corpus_drift_kl", "doc_novelty_score", "contamination_semantic",
    "host_graph_triangles", "boilerplate_sentence_inventory",
    "quality_calibration_bins", "dedup_jaccard_prefix_pairs",
    "dedup_source_matrix", "dedup_containment_pairs",
    "dedup_lsh_recall_eval", "dedup_simhash_recall_eval",
    "similarity_lsh_ndcg_eval", "preference_pairs_by_source",
    "contrastive_negatives", "dedup_minhash_estimate_eval",
    "lang_id_confusion_matrix", "dedup_accumulation_curve",
    "join_salted_orders_lineitem", "agg_salted_event_totals",
    "customer_rfm_segments", "supplier_return_rate",
    "revenue_growth_by_region_month", "vocab_oov_rate",
    "embedding_jl_project", "embedding_pca_abtt",
    "embedding_norm_outliers", "embedding_centroid_drift",
    "tokenizer_fertility", "vocab_countmin_topk",
    "corpus_burstiness", "embedding_quantize_int8",
    "sample_nested_subsets", "corpus_lang_source_mi",
    "text_ttr_mattr", "corpus_vocab_growth_heaps",
    "retrieval_mmr_rerank", "retrieval_maxsim_topk",
    "events_sliding_window", "events_rolling_1h_features",
    "events_session_stats", "events_user_profile_similarity",
    "events_transition_matrix", "events_decay_activity_score",
    "events_hourly_seasonality", "events_value_anomaly_mad",
    "events_dau_wau_stickiness", "events_power_users_pareto",
    "events_bot_score_heuristic",
]


def _ordered():
    reg = load_all()
    prio = [*_R06_PRIORITY, *_R02_STALE, *_R05_PRIORITY, *_R04_PRIORITY]
    seen: set[str] = set()
    first = [
        n for n in prio
        if n in reg and not (n in seen or seen.add(n))
    ]
    rest = [n for n in reg if n not in set(first)]
    return {n: reg[n] for n in [*first, *rest]}


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    return {name: q.spark_fn for name, q in _ordered().items()}


def oracle_sql() -> dict[str, str]:
    return {
        name: q.oracle for name, q in _ordered().items() if q.oracle is not None
    }
