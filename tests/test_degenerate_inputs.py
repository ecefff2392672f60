"""Degenerate-input hardening (round-6, VERDICT #1/#2/#5).

The ANSI-mode bug class: ratio/variance queries that are well-defined on
sf0.01 but divide by zero (or cast NaN) on a legal degenerate
distribution — an arm with zero conversions, an empty funnel stage, a
single-source dedup cluster, a cohort with zero month-0 revenue.
sf0.001 *is* such a dataset for the A/B readout (control arm: 8 users,
0 conversions), which is what crashed `events_ab_test_lift` in round 5.

These tests pin NULL-not-crash semantics on synthetic worst-case frames
written as parquet fixtures, in addition to the registry-wide sf0.001
oracle-parity sweep in test_oracle_parity.py.
"""

from __future__ import annotations

import datetime as dt

import pytest

from rust_cdc_spark.queries import load_all


def _write_events(spark, path, rows):
    """rows: (event_id, ts, user_id, event_type, value, props)."""
    df = spark.createDataFrame(
        rows,
        "event_id bigint, ts timestamp, user_id bigint, "
        "event_type string, value double, props string",
    )
    df.coalesce(1).write.mode("overwrite").parquet(f"{path}/events.parquet")


_TS = dt.datetime(2024, 1, 1, 0, 0, 0)


class TestAbTestDegenerate:
    def test_zero_control_conversions_yields_null_lift(self, spark, tmp_path):
        """Control arm (even user_id) exists but never converts →
        lift_micro NULL, z still defined (treatment converted)."""
        rows = []
        eid = 0
        # control: users 2,4 with 1 purchase each (< 17 threshold)
        for uid in (2, 4):
            eid += 1
            rows.append((eid, _TS, uid, "purchase", 1.0, "{}"))
        # treatment: user 1 with 20 purchases (converts), user 3 with 0
        for i in range(20):
            eid += 1
            rows.append((eid, _TS, 1, "purchase", 1.0, "{}"))
        eid += 1
        rows.append((eid, _TS, 3, "view", 0.0, "{}"))
        _write_events(spark, tmp_path, rows)

        out = (
            load_all()["events_ab_test_lift"]
            .spark_fn(spark, str(tmp_path))
            .collect()
        )
        assert len(out) == 1
        r = out[0]
        assert r.control_users == 2 and r.control_conversions == 0
        assert r.treatment_users == 2 and r.treatment_conversions == 1
        assert r.lift_micro is None  # 0 denominator → NULL, not crash
        assert r.z_micro is not None  # pooled rate in (0,1): defined

    def test_zero_conversions_both_arms_yields_null_z(self, spark, tmp_path):
        """No conversions anywhere → pooled rate 0 → z NULL too."""
        rows = [
            (1, _TS, 1, "view", 0.0, "{}"),
            (2, _TS, 2, "view", 0.0, "{}"),
        ]
        _write_events(spark, tmp_path, rows)
        out = (
            load_all()["events_ab_test_lift"]
            .spark_fn(spark, str(tmp_path))
            .collect()
        )
        assert len(out) == 1
        r = out[0]
        assert r.lift_micro is None and r.z_micro is None

    def test_all_convert_yields_null_z(self, spark, tmp_path):
        """Pooled rate exactly 1 (everyone converts) → z NULL,
        lift defined (both arms have conversions)."""
        rows = []
        eid = 0
        for uid in (1, 2):
            for _ in range(17):
                eid += 1
                rows.append((eid, _TS, uid, "purchase", 1.0, "{}"))
        _write_events(spark, tmp_path, rows)
        out = (
            load_all()["events_ab_test_lift"]
            .spark_fn(spark, str(tmp_path))
            .collect()
        )
        r = out[0]
        assert r.lift_micro == 1_000_000
        assert r.z_micro is None

    def test_sf0001_is_the_degenerate_dataset(self, spark):
        """sf0.001's control arm has zero conversions — the exact
        distribution that crashed round 5. Must return a row with NULL
        lift, not DIVIDE_BY_ZERO."""
        out = (
            load_all()["events_ab_test_lift"]
            .spark_fn(spark, "/root/testdata/sf0.001")
            .collect()
        )
        assert len(out) == 1
        assert out[0].control_conversions == 0
        assert out[0].lift_micro is None


class TestRatioFamilyDegenerateSweep:
    """VERDICT #5: the other round-5 ratio queries must also survive
    sf0.001 (empty stages / single-source clusters / sparse cohorts).
    Oracle parity for these runs in test_oracle_parity.py; here we pin
    crash-freedom explicitly so a future ANSI regression is caught by
    name."""

    @pytest.mark.parametrize(
        "name",
        [
            "customer_cohort_ltv",
            "events_funnel_time_to_convert",
            "dedup_cluster_purity",
            "quality_ks_drift",
            "events_markov_stationary",
            "corpus_bleu_source_overlap",
            "preference_bradley_terry",
        ],
    )
    def test_runs_at_sf0001(self, spark, name):
        df = load_all()[name].spark_fn(spark, "/root/testdata/sf0.001")
        df.collect()  # must not raise on degenerate distributions


class TestEmptyTables:
    """Spot-pin the empty-tables fixes (the full 243-query sweep lives
    in tools/check_empty.py — too slow for the suite); these are the
    seven operators that crashed on 0-row tables in round 6."""

    @pytest.fixture(scope="class")
    def empty_dir(self, spark, tmp_path_factory):
        from tools.check_empty import build_empty_fixture

        dst = str(tmp_path_factory.mktemp("empty_sf"))
        build_empty_fixture(spark, "/root/testdata/sf0.001", dst)
        return dst

    @pytest.mark.parametrize(
        "name",
        [
            "cdc_scd2_incremental",
            "similarity_ivf_topk",
            "similarity_pq_rerank_topk",
            "similarity_ivfpq_topk",
            "integrity_referential_audit",
            "quality_classifier_train",
            "embedding_pca_abtt",
        ],
    )
    def test_runs_on_empty_tables(self, spark, empty_dir, name):
        load_all()[name].spark_fn(spark, empty_dir).collect()
