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


# Round-3 priority order. CORRECTNESS_r01 ∪ r02 covers 100 of the 127
# registry names (the driver checks the first 50 per round); the names
# below run FIRST so round 3 closes the remaining verification surface:
#   (a) the 27 names never driver-checked in any round,
#   (b) 6 names whose only driver row predates their oracle (r1
#       no_oracle / canonicalizer error — all have value oracles now),
#   (c) the PQ/IVF ANN pair, which gained replay oracles this round.
# Round 3 grew the registry past the 50-cap: every name not in the
# priority list below (the priority tail embedding_norm_outliers /
# host_authority_pagerank / dedup_lsh_recall_eval, the window/drift/
# containment batches, and all operators added after the cap — in
# registry order) spills to round 4 and leads its order. Each spilled
# name is green at 3 SFs + vanilla session via
# tools/check_correctness.py (full-registry sweeps recorded in the
# round-3 session), and everything is continuously verified by the
# in-repo parity suite regardless.
_R03_PRIORITY = [
    # (a) never driver-checked
    "dsir_importance_weights", "split_leakage_check",
    "window_frame_functions", "dedup_incremental_new_docs",
    "mixture_schedule", "agg_filter_clauses",
    "text_pii_scrub", "text_repetition_score", "dedup_passage_exact",
    "contamination_ngram_overlap",
    "pack_sequences", "mixture_interleave", "curation_pipeline",
    "embedding_kmeans_assign", "embedding_cluster_profile",
    "vocab_top_tokens", "bpe_merge_candidates", "bpe_train_merges",
    "events_gap_fill", "chunk_documents_overlap", "cluster_balanced_sample",
    "train_val_test_split", "scalar_base64_roundtrip",
    "retrieval_tfidf_top_terms", "text_bigram_logprob",
    "doc_length_histogram", "quality_logistic_score",
    # (b) oracle added after their r1 row
    "dedup_simhash_pairs", "similarity_lsh_topk", "embedding_near_dup",
    "agg_approx_distinct_lineitem", "multimodal_feature_extract",
    "multimodal_resize",
    # (c) newly oracle-checkable ANN queries
    "similarity_pq_rerank_topk", "similarity_ivf_topk",
    # (d) new round-3 operators
    "dedup_substring_spans", "gopher_quality_rules", "bpe_train_merges",
    "similarity_ivfpq_topk", "mixture_temperature_weights",
    "perplexity_filter_buckets", "cdc_scd2_incremental",
    "url_domain_curation", "dedup_substring_removal",
    "c4_quality_rules", "url_normalize_dedup", "dedup_fuzzy_apply",
    "collocation_pmi_top", "char_entropy_filter",
    "quality_rule_attribution", "length_quantile_filter",
    "embedding_norm_outliers", "host_authority_pagerank",
    "dedup_lsh_recall_eval",
]


def _ordered():
    reg = load_all()
    first = [n for n in _R03_PRIORITY if n in reg]
    rest = [n for n in reg if n not in set(first)]
    return {n: reg[n] for n in [*first, *rest]}


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    return {name: q.spark_fn for name, q in _ordered().items()}


def oracle_sql() -> dict[str, str]:
    return {
        name: q.oracle for name, q in _ordered().items() if q.oracle is not None
    }
