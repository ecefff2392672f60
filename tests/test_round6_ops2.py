"""Behavioral tests for the second round-6 batch: Hilbert layout key,
LSH cost estimation, Croston intermittent-demand, audience overlap."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from rust_cdc_spark.operators import layout as L
from rust_cdc_spark.queries import load_all

SF = "/root/testdata/sf0.001"


class TestHilbertKey:
    def test_matches_reference_walk(self, spark):
        """Spark fold == the textbook xy2d recursion on probe points."""

        def rot(n, x, y, rx, ry):
            if ry == 0:
                if rx == 1:
                    x, y = n - 1 - x, n - 1 - y
                x, y = y, x
            return x, y

        def xy2d(n, x, y):
            d, s = 0, n // 2
            while s > 0:
                rx = 1 if (x & s) > 0 else 0
                ry = 1 if (y & s) > 0 else 0
                d += s * s * ((3 * rx) ^ ry)
                x, y = rot(n, x, y, rx, ry)
                s //= 2
            return d

        n = 1 << L.HILBERT_BITS
        pts = [(0, 0), (1, 0), (0, 1), (5, 7), (100, 200),
               (4095, 4095), (4095, 0), (0, 4095), (2048, 2047)]
        df = spark.createDataFrame(pts, "gx long, gy long").withColumn(
            "hkey", F.expr(L.hilbert_key_sql("gx", "gy", "spark"))
        )
        for r in df.collect():
            assert r.hkey == xy2d(n, r.gx, r.gy), (r.gx, r.gy)

    def test_consecutive_keys_are_adjacent_cells(self, spark):
        """The Hilbert locality guarantee Z-order lacks: |Δcell| = 1
        between consecutive keys. Verify on a 16x16 subgrid walk by
        inverting: sort cells by key, check Manhattan distance 1."""
        pts = [(x, y) for x in range(16) for y in range(16)]
        df = spark.createDataFrame(pts, "gx long, gy long").withColumn(
            "hkey", F.expr(L.hilbert_key_sql("gx", "gy", "spark"))
        )
        cells = sorted((r.hkey, r.gx, r.gy) for r in df.collect())
        # the 16x16 corner of the 4096 grid is a contiguous prefix of
        # the curve only if keys are consecutive — they aren't (the
        # curve leaves the corner), so check adjacency where keys ARE
        # consecutive
        adjacent_pairs = 0
        for (k1, x1, y1), (k2, x2, y2) in zip(cells, cells[1:]):
            if k2 == k1 + 1:
                assert abs(x1 - x2) + abs(y1 - y2) == 1
                adjacent_pairs += 1
        assert adjacent_pairs > 100  # most of the subgrid is contiguous

    def test_tighter_file_spans_than_zorder(self, spark):
        """The layout claim itself: range-bucketing rows by key, the
        per-bucket bounding-box area (what min/max pruning sees) should
        be no worse on average for Hilbert than Morton."""
        pts = [(x, y) for x in range(64) for y in range(64)]
        df = spark.createDataFrame(pts, "x long, y long")
        hk = L.with_hilbert_key(df, ["x", "y"], key_col="k")
        zk = L.with_zorder_key(df, ["x", "y"], bits=L.HILBERT_BITS,
                               key_col="k")

        def avg_bbox_area(keyed):
            b = keyed.withColumn("bucket", F.ntile(16).over(
                __import__("pyspark.sql.window", fromlist=["Window"])
                .Window.orderBy("k")))
            spans = b.groupBy("bucket").agg(
                ((F.max("x") - F.min("x") + 1)
                 * (F.max("y") - F.min("y") + 1)).alias("area")
            )
            return spans.agg(F.avg("area")).collect()[0][0]

        assert avg_bbox_area(hk) <= avg_bbox_area(zk)


class TestLshCostEstimate:
    def test_predicts_actual_candidate_volume(self, spark):
        """Σ over bands of per-band candidate pairs ≥ the DISTINCT
        pair count the real LSH join produces (pairs colliding in
        multiple bands are counted once there, per-band here)."""
        reg = load_all()
        est = reg["dedup_lsh_cost_estimate"].spark_fn(spark, SF)
        total_candidates = est.agg(F.sum("candidate_pairs")).collect()[0][0]
        actual_pairs = reg["dedup_minhash_lsh_pairs"].spark_fn(
            spark, SF
        ).count()
        assert total_candidates >= actual_pairs
        assert total_candidates > 0

    def test_four_bands(self, spark):
        est = load_all()["dedup_lsh_cost_estimate"].spark_fn(spark, SF)
        rows = est.collect()
        assert sorted(r.band_id for r in rows) == [0, 1, 2, 3]
        for r in rows:
            assert r.max_bucket >= 1 and r.n_buckets >= r.n_colliding_buckets


class TestCroston:
    def test_steady_demand_rate(self, spark, tmp_path):
        """One unit every 2 days forever → size level 1, interval
        level 2, rate 0.5/day."""
        import datetime as dt

        rows = [
            (i, 1, i, 1, 1.0, 1.0, 0.0, 0.0, "N", "O",
             dt.datetime(2024, 1, 1) + dt.timedelta(days=2 * i))
            for i in range(1, 20)
        ]
        spark.createDataFrame(
            rows,
            "l_orderkey bigint, l_partkey bigint, l_suppkey bigint,"
            " l_linenumber int, l_quantity double, l_extendedprice double,"
            " l_discount double, l_tax double, l_returnflag string,"
            " l_linestatus string, l_shipdate timestamp",
        ).write.mode("overwrite").parquet(f"{tmp_path}/lineitem.parquet")
        r = load_all()["part_demand_croston"].spark_fn(
            spark, str(tmp_path)
        ).collect()[0]
        assert r.size_level_qty == 1
        assert r.interval_level_days == 2
        assert r.rate_micro_per_day == 500_000

    def test_single_demand_day_yields_null_rate(self, spark, tmp_path):
        import datetime as dt

        spark.createDataFrame(
            [(1, 7, 1, 1, 5.0, 1.0, 0.0, 0.0, "N", "O",
              dt.datetime(2024, 3, 1))],
            "l_orderkey bigint, l_partkey bigint, l_suppkey bigint,"
            " l_linenumber int, l_quantity double, l_extendedprice double,"
            " l_discount double, l_tax double, l_returnflag string,"
            " l_linestatus string, l_shipdate timestamp",
        ).write.mode("overwrite").parquet(f"{tmp_path}/lineitem.parquet")
        r = load_all()["part_demand_croston"].spark_fn(
            spark, str(tmp_path)
        ).collect()[0]
        assert r.n_demand_days == 1
        assert r.interval_level_days is None
        assert r.rate_micro_per_day is None


class TestAudienceOverlap:
    def test_intersections_bounded_by_totals(self, spark):
        rows = load_all()["events_audience_overlap"].spark_fn(
            spark, SF
        ).collect()
        assert rows
        for r in rows:
            assert r.type_a < r.type_b
            assert 0 < r.n_both <= min(r.n_a, r.n_b)
            assert 0 < r.jaccard_micro <= 1_000_000

    def test_matches_direct_self_join(self, spark):
        from rust_cdc_spark.sources.tables import load_table

        ev = load_table(spark, "events", SF)
        ut = ev.select("user_id", "event_type").distinct()
        a, b = ut.alias("a"), ut.alias("b")
        direct = {
            (r.ta, r.tb): r.n
            for r in a.join(
                b,
                (F.col("a.user_id") == F.col("b.user_id"))
                & (F.col("a.event_type") < F.col("b.event_type")),
            )
            .groupBy(
                F.col("a.event_type").alias("ta"),
                F.col("b.event_type").alias("tb"),
            )
            .agg(F.count("*").alias("n"))
            .collect()
        }
        ours = {
            (r.type_a, r.type_b): r.n_both
            for r in load_all()["events_audience_overlap"].spark_fn(
                spark, SF
            ).collect()
        }
        assert ours == direct


class TestModularity:
    def test_bounds_and_consistency(self, spark):
        r = load_all()["host_graph_modularity"].spark_fn(
            spark, SF
        ).collect()[0]
        # Q ∈ [-0.5, 1] scaled to micro
        assert -500_000 <= r.modularity_micro <= 1_000_000
        assert 0 <= r.intra_edges <= r.n_edges
        assert r.n_communities >= 1

    def test_matches_lpa_community_count(self, spark):
        reg = load_all()
        lpa = reg["host_graph_label_propagation"].spark_fn(spark, SF)
        n_comms = lpa.select("community").distinct().count()
        r = reg["host_graph_modularity"].spark_fn(spark, SF).collect()[0]
        assert r.n_communities == n_comms


class TestPathTopk:
    def test_shares_and_order(self, spark):
        rows = load_all()["events_path_topk"].spark_fn(spark, SF).collect()
        assert 0 < len(rows) <= 10
        ns = [r.n_users for r in rows]
        assert ns == sorted(ns, reverse=True)
        for r in rows:
            assert 0 < r.share_micro <= 1_000_000
            assert 1 <= len(r.path.split(">")) <= 4
