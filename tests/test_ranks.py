"""Exact distributed ranking / ntile (operators/ranks.py): the
scale-safe replacement for partition-less ``ntile(b) OVER (ORDER BY …)``
windows must be BIT-IDENTICAL to Spark's own global ntile on every
(n, buckets) shape — including n < b, skewed values, ties broken by a
unique key — while planning zero partition-less WindowExec nodes."""

from __future__ import annotations

import pytest
from pyspark.sql import Row, Window
from pyspark.sql import functions as F

from rust_cdc_spark.operators.ranks import (
    exact_global_ntile,
    with_global_rank,
)
from rust_cdc_spark.plans.explain import global_windows


def _mk(spark, n, n_part=7):
    # keys deliberately collide (k = i*i % 13) so the unique tie-break
    # (i) is load-bearing; values skew toward small residues
    rows = [Row(i=i, k=(i * i) % 13) for i in range(n)]
    return spark.createDataFrame(rows, schema="i long, k long").repartition(
        n_part
    )


class TestGlobalRank:
    @pytest.mark.parametrize("n", [0, 1, 5, 97, 1000])
    def test_rank_matches_global_row_number(self, spark, n):
        df = _mk(spark, n)
        got = {
            r["i"]: r["r"]
            for r in with_global_rank(
                df, [F.col("k").desc(), F.col("i")], rank_col="r"
            ).collect()
        }
        want = {
            r["i"]: r["r"]
            for r in df.withColumn(
                "r",
                F.row_number().over(
                    Window.orderBy(F.col("k").desc(), F.col("i"))
                ),
            ).collect()
        }
        assert got == want

    def test_total_col_is_row_count(self, spark):
        df = _mk(spark, 42)
        out = with_global_rank(
            df, [F.col("i")], rank_col="r", total_col="n"
        ).collect()
        assert all(r["n"] == 42 for r in out)


class TestExactNtile:
    @pytest.mark.parametrize(
        "n,b",
        [(1, 4), (3, 10), (10, 10), (11, 4), (97, 10), (1000, 7), (4, 4)],
    )
    def test_matches_spark_ntile(self, spark, n, b):
        df = _mk(spark, n)
        order = [F.col("k").desc(), F.col("i")]
        got = {
            r["i"]: r["bkt"]
            for r in exact_global_ntile(df, order, b, "bkt").collect()
        }
        want = {
            r["i"]: r["bkt"]
            for r in df.withColumn(
                "bkt", F.ntile(b).over(Window.orderBy(*order))
            ).collect()
        }
        assert got == want

    def test_plan_has_no_global_window(self, spark):
        df = _mk(spark, 100)
        out = exact_global_ntile(df, [F.col("k"), F.col("i")], 4, "bkt")
        assert global_windows(out) == []

    def test_preserves_columns(self, spark):
        df = _mk(spark, 20)
        out = exact_global_ntile(df, [F.col("i")], 4, "bkt")
        assert set(out.columns) == {"i", "k", "bkt"}


class TestReliableCheckpoint:
    def test_session_sets_checkpoint_dir(self, spark):
        """session.get_spark always configures a checkpoint dir, so
        reliable=True needs no per-caller setup (round-6 VERDICT #7)."""
        assert spark.sparkContext.getCheckpointDir() is not None

    def test_reliable_rank_matches_local(self, spark):
        df = _mk(spark, 97)
        order = [F.col("k").desc(), F.col("i")]
        fast = {
            r["i"]: r["r"]
            for r in with_global_rank(df, order, rank_col="r").collect()
        }
        durable = {
            r["i"]: r["r"]
            for r in with_global_rank(
                df, order, rank_col="r", reliable=True
            ).collect()
        }
        assert fast == durable

    def test_env_flag_resolves_default(self, spark, monkeypatch):
        monkeypatch.setenv("SPARK_GRAFT_RELIABLE_RANKS", "1")
        df = _mk(spark, 23)
        got = {
            r["i"]: r["r"]
            for r in with_global_rank(
                df, [F.col("i")], rank_col="r"
            ).collect()
        }
        assert got == {i: i + 1 for i in range(23)}
