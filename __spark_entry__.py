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


# Round-9 priority order (the driver checks 50 names per round, in
# this order), built per VERDICT r8 #1/#2: (1) the events_survival_km
# family — the r8 bisect localized the three-round driver-only
# hash-red to the epoch/day data path (_fold green / _hist red), so
# round 9 rewrites the day derivation on BOTH sides into the
# engine-proof integer-micros form and pins the parent, the _hist
# twin (same data path, re-verifies the rewrite), and TWO new 1-row
# twins that 3-point-bisect the data path whatever the r9 ledger
# says: _probe (scan-level raw ingredients under all three candidate
# day derivations) and _obs (the per-user censoring stage between
# probe and _hist) — readout matrices at queries/timeseries.py
# _KM_PREFIX_SQL and the _obs register() note. The two ANSWERED
# twins (_fold, _rcte) are deregistered — their r8 rows delivered the
# verdict. (2) The remaining 46 slots drain the r02 staleness tier
# (45 names, 7 rounds old) plus the first r03 name. Tier lists below
# are GENERATED oldest-driver-row-first by tools/staleness.py from
# the CORRECTNESS_r0N.json ledger — regenerate each round instead of
# hand-rotating. No new non-diagnostic queries are registered this
# round (the r8 cap carries: only the 2 diagnostics were added,
# 330 -> 330 after retiring the two answered twins). Everything below
# is green
# under tools/check_correctness.py at sf0.01 AND sf0.001/sf0.1 +
# vanilla-TZ sessions and the 0-row fixture sweep.
_R09_PRIORITY = [
    "events_survival_km", "events_survival_km_hist",
    "events_survival_km_probe", "events_survival_km_obs",
]

# tier r02 — 45 names
_STALE_R02 = [
    "asof_join_next_click_1h",
    "bpe_encode_corpus",
    "cdc_snapshot_bootstrap",
    "dedup_keep_best",
    "dense_rank_supplier_balance",
    "events_funnel_conversion",
    "events_json_props",
    "events_retention_cohorts",
    "events_sessionize",
    "events_tumbling_window",
    "grouping_sets_lineitem",
    "join_left_outer_customer_orders",
    "lag_lead_order_gaps",
    "layout_zorder_key",
    "multimodal_dedup_exact",
    "multimodal_phash_buckets",
    "q10_returned_items",
    "q11_important_parts",
    "q12_shipmode_priority",
    "q13_customer_distribution",
    "q14_promo_revenue",
    "q15_top_supplier",
    "q16_part_supplier_counts",
    "q17_small_quantity_revenue",
    "q18_large_volume_customers",
    "q19_disjunctive_predicates",
    "q20_excess_suppliers",
    "q21_waiting_orders",
    "q22_global_sales_opportunity",
    "q2_min_cost_supplier",
    "q4_order_priority_check",
    "q6_forecast_revenue",
    "q7_nation_volume",
    "q8_market_share",
    "q9_product_type_profit",
    "quality_classifier_train",
    "range_join_click_attribution",
    "retrieval_bm25_topk",
    "retrieval_rrf_fusion",
    "sample_weighted_documents",
    "scalar_string_funcs_part",
    "semantic_dedup_prune",
    "set_union_nation_presence",
    "subquery_above_avg_orders",
    "table_column_stats",
]
# tier r03 — 47 names
_STALE_R03 = [
    "agg_filter_clauses",
    "bpe_merge_candidates",
    "bpe_train_merges",
    "c4_quality_rules",
    "cdc_scd2_incremental",
    "char_entropy_filter",
    "chunk_documents_overlap",
    "cluster_balanced_sample",
    "collocation_pmi_top",
    "contamination_ngram_overlap",
    "curation_pipeline",
    "dedup_fuzzy_apply",
    "dedup_incremental_new_docs",
    "dedup_passage_exact",
    "dedup_simhash_pairs",
    "dedup_substring_removal",
    "dedup_substring_spans",
    "doc_length_histogram",
    "dsir_importance_weights",
    "embedding_cluster_profile",
    "embedding_kmeans_assign",
    "events_gap_fill",
    "gopher_quality_rules",
    "length_quantile_filter",
    "mixture_interleave",
    "mixture_schedule",
    "mixture_temperature_weights",
    "multimodal_feature_extract",
    "multimodal_resize",
    "pack_sequences",
    "quality_logistic_score",
    "quality_rule_attribution",
    "retrieval_tfidf_top_terms",
    "scalar_base64_roundtrip",
    "similarity_ivf_topk",
    "similarity_ivfpq_topk",
    "similarity_lsh_topk",
    "similarity_pq_rerank_topk",
    "split_leakage_check",
    "text_bigram_logprob",
    "text_pii_scrub",
    "text_repetition_score",
    "train_val_test_split",
    "url_domain_curation",
    "url_normalize_dedup",
    "vocab_top_tokens",
    "window_frame_functions",
]
# tier r04 — 43 names
_STALE_R04 = [
    "agg_salted_event_totals",
    "boilerplate_sentence_inventory",
    "contamination_semantic",
    "contrastive_negatives",
    "corpus_burstiness",
    "corpus_lang_source_mi",
    "corpus_vocab_growth_heaps",
    "dedup_accumulation_curve",
    "dedup_containment_pairs",
    "dedup_jaccard_prefix_pairs",
    "dedup_lsh_recall_eval",
    "dedup_minhash_estimate_eval",
    "dedup_simhash_recall_eval",
    "dedup_source_matrix",
    "embedding_centroid_drift",
    "embedding_jl_project",
    "embedding_norm_outliers",
    "embedding_pca_abtt",
    "embedding_quantize_int8",
    "events_bot_score_heuristic",
    "events_dau_wau_stickiness",
    "events_decay_activity_score",
    "events_hourly_seasonality",
    "events_rolling_1h_features",
    "events_session_stats",
    "events_sliding_window",
    "events_transition_matrix",
    "events_user_profile_similarity",
    "events_value_anomaly_mad",
    "host_graph_triangles",
    "join_salted_orders_lineitem",
    "preference_pairs_by_source",
    "quality_calibration_bins",
    "retrieval_maxsim_topk",
    "retrieval_mmr_rerank",
    "revenue_growth_by_region_month",
    "sample_nested_subsets",
    "similarity_lsh_ndcg_eval",
    "supplier_return_rate",
    "text_ttr_mattr",
    "tokenizer_fertility",
    "vocab_countmin_topk",
    "vocab_oov_rate",
]

def _ordered():
    reg = load_all()
    prio = [
        *_R09_PRIORITY,
        *_STALE_R02, *_STALE_R03, *_STALE_R04,
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
