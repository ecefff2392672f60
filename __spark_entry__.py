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


# Round-5 priority order (the driver checks 50 names per round, in this
# order). Rounds 1-4 drove the whole 192-name registry to green driver
# rows, so round 5 leads with (a) the queries ADDED this round and (b)
# every query whose implementation CHANGED this round (near-dup rewrite
# onto blocked GEMM / ids-only LSH, the split approx-distinct agg, the
# let-bound lang-id argmax) — the names whose last driver row predates
# the current code. The round-4 closure list follows, then the rest in
# registry order; everything is green under tools/check_correctness.py
# at sf0.01 (standard + vanilla-TZ sweeps, this session).
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
    prio = [*_R05_PRIORITY, *_R04_PRIORITY]
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
