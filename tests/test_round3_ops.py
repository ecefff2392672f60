"""Property tests for the late-round-3 operators — invariants the
value oracles can't express (they check engine agreement; these check
the MATH is the intended one)."""

from __future__ import annotations

import pytest

from rust_cdc_spark.queries import load_all
from tests.conftest import SF_SMOKE

REGISTRY = load_all()


def run(spark, name):
    return REGISTRY[name].spark_fn(spark, SF_SMOKE)


class TestTransitionMatrix:
    def test_rows_are_probability_distributions(self, spark):
        rows = run(spark, "events_transition_matrix").collect()
        by_from = {}
        for r in rows:
            by_from.setdefault(r.from_type, []).append(r)
        for ft, grp in by_from.items():
            total = sum(r.p_micro for r in grp)
            # each cell rounded once → row sums to 1e6 ± |cells|/2
            assert abs(total - 1_000_000) <= len(grp), (ft, total)
            assert sum(r.n for r in grp) > 0

    def test_transition_count_conservation(self, spark):
        from rust_cdc_spark.sources.tables import load_table

        rows = run(spark, "events_transition_matrix").collect()
        ev = load_table(spark, "events", SF_SMOKE)
        n_events = ev.count()
        n_users = ev.select("user_id").distinct().count()
        # every event except each user's first is exactly one transition
        assert sum(r.n for r in rows) == n_events - n_users


class TestDecayScore:
    def test_score_bounded_by_undecayed_total(self, spark):
        from pyspark.sql import functions as F

        from rust_cdc_spark.sources.tables import load_table

        got = {r.user_id: r for r in run(spark, "events_decay_activity_score").collect()}
        totals = {
            r.user_id: r.t
            for r in load_table(spark, "events", SF_SMOKE)
            .groupBy("user_id")
            .agg(F.sum(F.round(F.col("value") * 100).cast("long")).alias("t"))
            .collect()
        }
        for uid, r in got.items():
            assert 0 <= r.score_micro_cents <= totals[uid] * 1_000_000
            assert r.days_since_last >= 0
            assert r.active_days >= 1


class TestCountMin:
    def test_estimates_are_one_sided(self, spark):
        rows = run(spark, "vocab_countmin_topk").collect()
        assert len(rows) == 20
        for r in rows:
            assert r.overestimate >= 0
            assert r.n_est == r.n_true + r.overestimate


class TestInt8Quantization:
    def test_error_and_range_bounds(self, spark):
        rows = run(spark, "embedding_quantize_int8").collect()
        for r in rows:
            # |code| <= 127 per dim → Σ|codes| ≤ 64·127
            assert r.sum_abs_codes <= 64 * 127
            # per-dim residual |127q − c·s| ≤ s/2 + s (rounding) → bound
            assert r.err_sq <= 64 * (r.scale_micro ** 2), r
            assert r.err_sq >= 0


class TestNestedSubsets:
    def test_tiers_nest_and_cover(self, spark):
        rows = run(spark, "sample_nested_subsets").collect()
        assert all(r.subset_pct in (1, 5, 10, 25, 50, 100) for r in rows)
        # nesting: the p% set = union of tiers ≤ p; monotone in p
        sizes = {}
        for p in (1, 5, 10, 25, 50, 100):
            sizes[p] = sum(1 for r in rows if r.subset_pct <= p)
        assert sizes[100] == len(rows)
        last = 0
        for p in (1, 5, 10, 25, 50, 100):
            assert sizes[p] >= last
            last = sizes[p]

    def test_membership_is_stable_under_corpus_growth(self, spark):
        # bucket depends only on doc_id → dropping docs never moves the
        # survivors between tiers
        rows = {r.doc_id: r.subset_pct for r in run(spark, "sample_nested_subsets").collect()}
        some = dict(list(rows.items())[: len(rows) // 2])
        assert all(rows[k] == v for k, v in some.items())


class TestLangSourceMI:
    def test_cells_cover_corpus_and_weights_consistent(self, spark):
        from rust_cdc_spark.sources.tables import load_table

        rows = run(spark, "corpus_lang_source_mi").collect()
        n_docs = load_table(spark, "documents", SF_SMOKE).count()
        assert sum(r.n_xy for r in rows) == n_docs
        for r in rows:
            assert r.w_micro == r.n_xy * r.pmi_micro


class TestTTRMattr:
    def test_bounds_and_short_doc_equality(self, spark):
        rows = run(spark, "text_ttr_mattr").collect()
        for r in rows:
            assert 0 < r.ttr_micro <= 1_000_000
            assert 0 < r.mattr_micro <= 1_000_000
            assert r.n_types <= r.n_tokens
            if r.n_tokens <= 50:
                assert r.mattr_micro == r.ttr_micro


class TestSnapshotDiff:
    def test_change_classes_are_consistent(self, spark):
        rows = run(spark, "cdc_snapshot_diff").collect()
        assert rows, "log thirds should differ somewhere"
        for r in rows:
            if r.change == "added":
                assert r.t1 is None and r.t2 is not None
            elif r.change == "removed":
                assert r.t2 is None and r.t1 is not None
            else:
                assert r.change == "changed"
                assert (r.t1 != r.t2) or (r.v1 != r.v2)


class TestPreferencePairs:
    def test_pairs_are_strict_and_within_source(self, spark):
        rows = run(spark, "preference_pairs_by_source").collect()
        assert rows
        for r in rows:
            assert r.chosen_quality > r.rejected_quality
            assert r.chosen_id != r.rejected_id
            assert 1 <= r.pair_rank <= 5


class TestContrastiveNegatives:
    def test_negatives_avoid_the_neighborhood(self, spark):
        from rust_cdc_spark.operators import similarity as SIM
        from rust_cdc_spark.sources.tables import load_table
        from pyspark.sql import functions as F

        emb = load_table(spark, "embeddings", SF_SMOKE)
        probes = emb.filter(F.col("vec_id").isin(0, 1, 2)).select(
            F.col("vec_id").alias("query_id"), F.col("embedding").alias("qv")
        )
        top50 = {
            (r.query_id, r.vec_id)
            for r in SIM.brute_force_topk(
                emb, probes, k=50, exclude_self=True
            ).collect()
        }
        rows = run(spark, "contrastive_negatives").collect()
        assert len(rows) == 15  # 3 anchors × 5 picks
        for r in rows:
            assert (r.anchor_id, r.negative_id) not in top50
            assert r.negative_id != r.anchor_id


class TestMinhashEstimate:
    def test_estimator_tracks_exact_jaccard(self, spark):
        rows = run(spark, "dedup_minhash_estimate_eval").collect()
        assert rows
        for r in rows:
            assert 0 <= r.est_micro <= 1_000_000
            assert r.est_micro % 62_500 == 0  # 1/16 quantization
            # 16 permutations: generous tolerance, catches sign errors
            assert abs(r.err_micro) <= 500_000
        # identical texts estimate exactly 1
        ident = [r for r in rows if r.jaccard == 1.0]
        if ident:
            assert all(r.est_micro == 1_000_000 for r in ident)


class TestTriangles:
    def test_matches_networkx_free_bruteforce(self, spark):
        row = run(spark, "host_graph_triangles").collect()[0]
        from rust_cdc_spark.sources.tables import load_table

        docs = load_table(spark, "documents", SF_SMOKE).select("doc_id").collect()
        from rust_cdc_spark.queries.curation import _PR_HOSTS

        H = _PR_HOSTS
        edges = set()
        for r in docs:
            s = (r.doc_id * r.doc_id) % H
            d = (r.doc_id * r.doc_id + r.doc_id + 17) % H
            if s != d:
                edges.add((min(s, d), max(s, d)))
        adj = {}
        for a, b in edges:
            adj.setdefault(a, set()).add(b)
            adj.setdefault(b, set()).add(a)
        tri = sum(
            1
            for a, b in edges
            for c in (adj[a] & adj[b])
            if c > b
        )
        wedges = sum(len(v) * (len(v) - 1) // 2 for v in adj.values())
        assert row.n_triangles == tri
        assert row.n_wedges == wedges
        assert row.n_edges == len(edges)
        assert row.n_nodes == len(adj)


if __name__ == "__main__":
    pytest.main([__file__, "-q"])
