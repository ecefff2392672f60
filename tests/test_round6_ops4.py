"""Behavioral invariants for the later round-6 session-2 batches —
cross-query consistency and textbook identities the oracle-parity
check can't express.
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


class TestInventoryAndTrade:
    def test_abc_xyz_partition_totals(self, spark):
        """Class counts partition the part universe."""
        from rust_cdc_spark.sources.tables import load_table

        n_parts = (
            load_table(spark, "lineitem", SF)
            .select("l_partkey").distinct().count()
        )
        out = rows(spark, "part_abc_xyz_classification")
        assert sum(r.n_parts for r in out) == n_parts
        assert {r.abc for r in out} <= {"A", "B", "C"}
        assert {r.xyz for r in out} <= {"X", "Y", "Z"}

    def test_trade_matrix_shares_sum_per_seller(self, spark):
        out = rows(spark, "nation_trade_matrix")
        by_seller: dict = {}
        for r in out:
            by_seller.setdefault(r.supp_nation, []).append(r)
        for rs in by_seller.values():
            share = sum(r.export_share_micro for r in rs)
            # floored ppm per flow
            assert 1_000_000 - len(rs) <= share <= 1_000_000

    def test_supplier_concentration_bounds(self, spark):
        for r in rows(spark, "part_supplier_concentration"):
            assert r.hhi_micro <= 1_000_000
            assert r.top_share_micro <= 1_000_000
            assert r.hhi_micro * r.n_suppliers >= 1_000_000 - r.n_suppliers
            assert 1 <= r.effective_suppliers <= r.n_suppliers * 1_000_000


class TestSpectralAndFit:
    def test_haar_energy_parseval_bound(self, spark):
        """Level energies are nonnegative; coefficient counts halve
        (weakly) as the scale doubles on a contiguous series."""
        out = rows(spark, "events_haar_energy")
        assert out
        for r in out:
            assert r.energy >= 0
            assert 1 <= r.level <= 6
            assert r.n_coeffs >= 1

    def test_dispersion_consistency(self, spark):
        """chi2 = dispersion · (n_days): the two statistics are the
        same rational up to the n factor (exact up to flooring)."""
        for r in rows(spark, "events_poisson_dispersion"):
            approx = r.dispersion_micro * r.n_days
            assert abs(approx - r.chi2_micro) <= r.n_days  # floor slack

    def test_gap_ks_bounds(self, spark):
        for r in rows(spark, "events_gap_exponential_ks"):
            assert 0 <= r.ks_micro <= 1_000_000
            assert r.mean_gap_s >= 0

    def test_crosscorr_in_range_and_pairs_positive(self, spark):
        out = rows(spark, "events_crosscorr_lead_lag")
        assert out
        for r in out:
            if r.crosscorr is not None:
                assert -1.0 - 1e-9 <= r.crosscorr <= 1.0 + 1e-9
            assert r.n_pairs >= 1
        assert {r.lag_days for r in out} <= set(range(-6, 7))


class TestExperimentation:
    def test_did_cells_reconcile(self, spark):
        r = rows(spark, "events_cohort_did", SF1)[0]
        if None not in (
            r.control_pre_micro, r.control_post_micro,
            r.treatment_pre_micro, r.treatment_post_micro,
        ):
            expect = (
                r.treatment_post_micro - r.treatment_pre_micro
            ) - (r.control_post_micro - r.control_pre_micro)
            assert r.did_micro == expect

    def test_mde_shrinks_with_more_users(self, spark):
        """MDE at sf0.01 (10× the users) must be smaller than at
        sf0.001 — the defining property of statistical power."""
        small = rows(spark, "events_power_analysis_mde", SF)[0]
        big = rows(spark, "events_power_analysis_mde", SF1)[0]
        if small.mde_abs_micro and big.mde_abs_micro:
            assert big.mde_abs_micro < small.mde_abs_micro

    def test_window_sensitivity_monotone(self, spark):
        """Conversion is monotone non-decreasing in the window."""
        out = sorted(
            rows(spark, "events_conversion_window_sensitivity", SF1),
            key=lambda r: r.window_hours,
        )
        convs = [r.conversion_micro for r in out]
        assert all(a <= b for a, b in zip(convs, convs[1:]))
        users = {r.n_signup_users for r in out}
        assert len(users) == 1  # same denominator at every window


class TestGrowthLedger:
    def test_growth_states_partition_actives(self, spark):
        """new + retained + resurrected = weekly actives, and the
        ledger reconciles with the distinct (user, week) table."""
        from rust_cdc_spark.sources.tables import load_table

        ev = load_table(spark, "events", SF)
        actives = (
            ev.select(
                "user_id",
                F.expr("floor(unix_timestamp(ts)) div 604800").alias("w"),
            )
            .distinct()
            .groupBy("w")
            .agg(F.count("*").alias("n"))
        )
        expect = {r.w: r.n for r in actives.collect()}
        out = rows(spark, "events_growth_accounting")
        for r in out:
            total = r.n_new + r.n_retained + r.n_resurrected
            assert total == expect[r.week], r

    def test_new_vs_returning_reconciles_first_days(self, spark):
        from rust_cdc_spark.sources.tables import load_table

        n_users = (
            load_table(spark, "events", SF)
            .select("user_id").distinct().count()
        )
        out = rows(spark, "events_new_vs_returning")
        assert sum(r.n_new_users for r in out) == n_users

    def test_halflife_positive_when_decaying(self, spark):
        r = rows(spark, "events_retention_halflife", SF1)[0]
        if r.decay_per_week_micro is not None and r.decay_per_week_micro < 0:
            assert r.halflife_milli_weeks > 0


class TestSequentialAndStyle:
    def test_sequential_support_bounded_by_arm_counts(self, spark):
        for r in rows(spark, "events_sequential_pattern_support"):
            assert r.support_users <= min(r.n_users_a, r.n_users_b)
            assert r.lift_micro >= 0

    def test_burrows_delta_symmetric_complete(self, spark):
        out = rows(spark, "text_burrows_delta")
        pairs = {(r.source_a, r.source_b) for r in out}
        n_sources = len({s for p in pairs for s in p})
        assert len(pairs) == n_sources * (n_sources - 1) // 2
        for r in out:
            assert r.source_a < r.source_b
            assert r.delta_milli >= 0

    def test_signal_matrix_bounds(self, spark):
        out = rows(spark, "quality_signal_matrix")
        assert len(out) == 6
        for r in out:
            if r.pearson_micro is not None:
                assert -1_000_001 <= r.pearson_micro <= 1_000_001


class TestSqlSurfaceShared:
    def test_recursive_matches_iterative_bfs(self, spark):
        """The shared-text recursive CTE and the frontier-loop
        operator agree on hop counts within the shared depth."""
        rec = {r.hop: r.n_hosts
               for r in rows(spark, "sql_recursive_reachability")}
        it = {r.hop: r.n_hosts
              for r in rows(spark, "host_graph_bfs_hops")}
        for hop, n in rec.items():
            assert it.get(hop) == n, (hop, n, it.get(hop))

    def test_lateral_matches_window_formulation(self, spark):
        """LATERAL top-2 equals the row_number window top-2."""
        lat = {
            (r.c_custkey, r.o_orderkey)
            for r in rows(spark, "sql_lateral_topn_per_group")
        }
        from rust_cdc_spark.sources.tables import load_table
        from pyspark.sql import Window

        orders = load_table(spark, "orders", SF)
        w = Window.partitionBy("o_custkey").orderBy(
            F.round("o_totalprice", 2).desc(), "o_orderkey"
        )
        win = {
            (r.o_custkey, r.o_orderkey)
            for r in orders.withColumn(
                "rk", F.row_number().over(w)
            ).filter(F.col("rk") <= 2).collect()
        }
        assert lat == win


class TestCdcAudits:
    def test_hotspot_shares_and_order(self, spark):
        out = rows(spark, "cdc_key_churn_hotspots")
        counts = [r.n_updates for r in out]
        assert counts == sorted(counts, reverse=True)
        hhi = {r.hhi_micro for r in out}
        assert len(hhi) == 1

    def test_out_of_order_bounds(self, spark):
        r = rows(spark, "cdc_out_of_order_audit")[0]
        assert 0 <= r.n_inversions <= r.n_steps
        if r.n_inversions == 0:
            assert r.max_backstep_s == 0

    def test_isotropy_bounds(self, spark):
        r = rows(spark, "embedding_isotropy_score")[0]
        assert -1_000_000 <= r.mean_pairwise_cos_micro <= 1_000_000

    def test_rich_club_monotone_membership(self, spark):
        out = sorted(rows(spark, "host_graph_rich_club"),
                     key=lambda r: r.k)
        sizes = [r.n_rich for r in out]
        assert all(a >= b for a, b in zip(sizes, sizes[1:]))
        edges = [r.e_rich for r in out]
        assert all(a >= b for a, b in zip(edges, edges[1:]))
