"""Behavioral tests for the round-7 operator batch: invariants oracle
parity can't see (cross-query consistency, composition identities).
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from rust_cdc_spark.queries import load_all

SF = "/root/testdata/sf0.001"
SF1 = "/root/testdata/sf0.01"
REG = load_all()


def rows(spark, name, sf=SF):
    return REG[name].spark_fn(spark, sf).collect()


class TestCurationPipeline:
    def test_funnel_is_monotone(self, spark):
        """Each stage only removes documents: n_docs >= n_corpus >=
        url >= quality >= exact >= fuzzy >= kept >= 0 for every
        source — the alive_k = alive_{k-1} AND pass_k invariant."""
        out = rows(spark, "corpus_curation_pipeline", SF1)
        assert out
        for r in out:
            funnel = [
                r.n_docs, r.n_corpus, r.n_after_url, r.n_after_quality,
                r.n_after_exact, r.n_after_fuzzy, r.n_kept,
            ]
            assert all(a >= b for a, b in zip(funnel, funnel[1:])), r
            assert r.n_kept >= 0

    def test_checksum_tracks_survivors(self, spark):
        """survivor_checksum > 0 iff any doc survived (benchmark
        holdout removes doc_id 0, so every survivor id is > 0)."""
        for r in rows(spark, "corpus_curation_pipeline", SF1):
            assert (r.survivor_checksum > 0) == (r.n_kept > 0), r

    def test_weights_normalize_in_ppm(self, spark):
        """Floor-divided ppm weights sum into (1e6 - |sources|, 1e6]
        when anything survives — the integer-normalization contract
        shared with mixture_temperature_weights."""
        out = rows(spark, "corpus_curation_pipeline", SF1)
        kept_total = sum(r.n_kept for r in out)
        if kept_total == 0:
            assert all(r.weight_ppm is None for r in out)
            return
        total = sum(r.weight_ppm for r in out)
        assert 1_000_000 - len(out) < total <= 1_000_000

    def test_url_stage_matches_standalone(self, spark):
        """Stage-1 survivors equal url_normalize_dedup's kept set
        restricted to the benchmark-holdout corpus: the composed DAG
        reproduces the standalone operator's semantics."""
        from rust_cdc_spark.queries.curation import _BENCH_MOD

        url = REG["url_normalize_dedup"].spark_fn(spark, SF1)
        docs = REG["corpus_curation_pipeline"].spark_fn(spark, SF1)
        # standalone keeps min doc_id over ALL docs; the pipeline keeps
        # min over corpus (non-holdout) docs — counts agree on groups
        # whose canonical min is itself a corpus doc, and the composed
        # per-source total n_after_url can never exceed the standalone
        # canonical-group count.
        n_groups = url.count()
        n_after_url = sum(
            r.n_after_url for r in docs.collect()
        )
        assert 0 < n_after_url <= n_groups


class TestNonparametricTests:
    def test_mann_kendall_identities(self, spark):
        """S = concordant − discordant, |S| ≤ n(n−1)/2, var18 ≥ 0."""
        out = rows(spark, "events_mann_kendall_trend", SF1)
        assert out
        for r in out:
            assert r.s_stat == r.n_concordant - r.n_discordant
            assert abs(r.s_stat) <= r.n_days * (r.n_days - 1) // 2
            assert r.var18 >= 0

    def test_runs_test_identities(self, spark):
        out = rows(spark, "events_runs_test", SF1)
        assert out
        for r in out:
            assert r.n_plus + r.n_minus == r.n_days
            assert 1 <= r.n_runs <= r.n_days
            assert r.er_num == r.n_days + 2 * r.n_plus * r.n_minus

    def test_mannwhitney_u_identity(self, spark):
        """U₁ + U₂ = n₁·n₂ (doubled: u1_x2 + u2_x2 = 2·n1·n2) and the
        rank-sum total Σr·2 over BOTH samples is n(n+1)."""
        (r,) = rows(spark, "events_value_mannwhitney", SF1)
        assert r.u1_x2 + r.u2_x2 == 2 * r.n1 * r.n2
        assert 0 <= r.u1_x2 <= 2 * r.n1 * r.n2
        assert r.tie_cubes >= 0

    def test_chi2_bounds(self, spark):
        (r,) = rows(spark, "orders_chi2_priority_status", SF1)
        assert r.dof == (r.n_pri - 1) * (r.n_st - 1)
        assert r.chi2_micro >= 0
        # V² ∈ [0, 1]: χ² ≤ N·min(R−1, C−1)
        assert 0 <= r.cramers_v2_micro <= 1_000_000

    def test_theil_bounds(self, spark):
        import math

        (r,) = rows(spark, "customer_revenue_theil", SF1)
        assert 0 <= r.theil_micro <= int(1e6 * math.log(r.n_customers)) + 1
        assert r.theil_sum_micro // r.n_customers == r.theil_micro

    def test_mrr_reciprocal(self, spark):
        out = rows(spark, "retrieval_eval_mrr", SF1)
        assert len(out) == 3
        for r in out:
            if 1 <= r.first_rel_rank <= 20:
                assert r.rr_micro == 1_000_000 // r.first_rel_rank
            else:
                assert r.rr_micro == 0

    def test_spearman_bounds(self, spark):
        out = rows(spark, "quality_spearman_by_source", SF1)
        assert out
        for r in out:
            if r.spearman_micro is not None:
                assert -1_000_000 <= r.spearman_micro <= 1_000_000

    def test_jsd_bounds(self, spark):
        """JSD ≤ ln 2 per source (≈693147 micro-nats, plus per-cell
        rounding slack)."""
        out = rows(spark, "docs_js_divergence_sources", SF1)
        assert out
        for r in out:
            assert 0 <= r.jsd_micro <= 750_000
            assert 0 < r.vocab_present


class TestRound7Batch3:
    def test_kruskal_wallis_bounds(self, spark):
        """0 ≤ H ≤ n−1 (the k-group upper bound is n−1 when every
        group is a distinct block), and tie mass is nonnegative."""
        (r,) = rows(spark, "events_kruskal_wallis", SF1)
        assert r.n_groups >= 2
        assert -2 <= r.h_micro <= (r.n_values - 1) * 1_000_000
        assert r.tie_cubes >= 0

    def test_ljung_box_nonnegative(self, spark):
        out = rows(spark, "events_ljung_box", SF1)
        assert out
        for r in out:
            assert r.q_micro >= 0
            assert 1 <= r.n_lags <= 12

    def test_silhouette_bounds(self, spark):
        """s ∈ [−1, 1]; boundary points are a subset; seed centroids
        (vec_id < k) have a = 0 → s = 1 pulls means up."""
        out = rows(spark, "embedding_silhouette_simplified", SF1)
        assert out
        total = sum(r.n_points for r in out)
        for r in out:
            assert -1_000_000 <= r.mean_silhouette_micro <= 1_000_000
            assert 0 <= r.n_boundary <= r.n_points
        from rust_cdc_spark.sources.tables import load_table

        n_emb = load_table(spark, "embeddings", SF1).count()
        assert total == n_emb

    def test_dp_sensitivity_identities(self, spark):
        out = rows(spark, "privacy_user_sensitivity", SF1)
        assert out
        for r in out:
            assert 1 <= r.median_contrib <= r.max_contrib
            assert r.laplace_b_micro == 2_000_000 * r.max_contrib
            assert r.clipped_b_micro == 2_000_000 * r.median_contrib
            assert 0 < r.clip_ratio_micro <= 1_000_000

    def test_mcnemar_pairs(self, spark):
        out = rows(spark, "quality_rules_mcnemar", SF1)
        assert len(out) == 6
        for r in out:
            if r.b + r.c > 0:
                assert r.mcnemar_micro == (
                    (r.b - r.c) ** 2 * 1_000_000 // (r.b + r.c)
                )
            else:
                assert r.mcnemar_micro is None


class TestSimpsonPair:
    def test_simpson_complement(self, spark):
        out = rows(spark, "docs_simpson_diversity", SF1)
        assert out
        for r in out:
            assert 0 <= r.simpson_micro <= 1_000_000
            assert r.simpson_micro + r.gini_simpson_micro == 1_000_000
            assert r.vocab <= r.n_tokens

    def test_reversal_partition(self, spark):
        (r,) = rows(spark, "lineitem_simpson_reversal", SF1)
        assert (
            r.n_pos_groups + r.n_neg_groups + r.n_zero_groups == r.n_groups
        )
        assert r.overall_sign in (-1, 0, 1)
        assert isinstance(r.reversal, bool)


class TestPoissonBootstrap:
    def test_bootstrap_brackets_point_estimate(self, spark):
        """min ≤ mean ≤ max of replicate means; SE ≥ 0; and the
        replicate weights average ≈ 1 so the bootstrap mean sits near
        the plain mean of the daily series."""
        from collections import defaultdict

        from rust_cdc_spark.sources.tables import load_table
        from pyspark.sql import functions as F

        out = rows(spark, "events_poisson_bootstrap_ci", SF1)
        assert out
        daily = (
            load_table(spark, "events", SF1)
            .groupBy(
                "event_type",
                F.expr("floor(unix_timestamp(ts)) div 86400").alias("d"),
            )
            .count()
            .groupBy("event_type")
            .agg(
                (F.sum("count") * 1000 / F.count("*")).alias("mean_milli")
            )
            .collect()
        )
        plain = {r.event_type: r.mean_milli for r in daily}
        for r in out:
            assert r.boot_min_milli <= r.boot_mean_milli <= r.boot_max_milli
            assert r.boot_se_milli >= 0
            assert r.n_reps == 32
            # bootstrap mean within the replicate envelope of the
            # plain mean (weights are mean-1)
            assert r.boot_min_milli <= plain[r.event_type] * 1.05
            assert r.boot_max_milli >= plain[r.event_type] * 0.95


class TestSortedNeighborhood:
    def test_pairs_oriented_and_thresholded(self, spark):
        out = rows(spark, "dedup_sorted_neighborhood_pairs", SF1)
        for r in out:
            assert r.src != r.dst
            assert 500_000 <= r.jaccard_micro <= 1_000_000

    def test_snm_is_subset_of_exact_jaccard_pairs(self, spark):
        """Every SNM-verified pair must also appear in the exhaustive
        Jaccard pair query at the same threshold — SNM trades recall
        for linear candidates, never precision."""
        snm = {
            (r.src, r.dst)
            for r in rows(spark, "dedup_sorted_neighborhood_pairs", SF1)
        }
        full = {
            (min(r.doc_a, r.doc_b), max(r.doc_a, r.doc_b))
            for r in rows(spark, "dedup_ngram_jaccard_pairs", SF1)
        }
        oriented = {(min(a, b), max(a, b)) for a, b in snm}
        assert oriented <= full
