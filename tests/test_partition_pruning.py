"""Partition-layout pruning evidence: static pruning from a literal
filter and DYNAMIC partition pruning (DPP) from a dim-side join filter —
the mechanism that turns a 100 TB fact scan into reading only the
partitions a filtered dimension selects at runtime.
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from rust_cdc_spark.plans import explain as X
from rust_cdc_spark.sources.tables import load_table
from tests.conftest import SF_SMOKE


@pytest.fixture(scope="module")
def orders_parted(tmp_path_factory, spark):
    d = str(tmp_path_factory.mktemp("orders_by_priority"))
    load_table(spark, "orders", SF_SMOKE).write.mode("overwrite").partitionBy(
        "o_orderpriority"
    ).parquet(d)
    return d


class TestPartitionPruning:
    def test_static_partition_pruning(self, spark, orders_parted):
        df = spark.read.parquet(orders_parted).filter(
            F.col("o_orderpriority") == "1-URGENT"
        )
        txt = X.plan_text(df)
        # the partition filter must appear as a scan PartitionFilters
        # clause, not a post-scan Filter over all partitions
        assert "PartitionFilters" in txt and "1-URGENT" in txt, txt

    def test_dynamic_partition_pruning_from_dim_join(self, spark, orders_parted):
        fact = spark.read.parquet(orders_parted)
        dim = spark.createDataFrame(
            [("1-URGENT", 1), ("2-HIGH", 2)], ["prio", "rank"]
        ).filter(F.col("rank") == 1)
        df = fact.join(
            F.broadcast(dim), fact.o_orderpriority == dim.prio
        ).select("o_orderkey", "prio")
        txt = X.plan_text(df)
        assert "dynamicpruning" in txt.lower(), txt

    def test_pruned_join_result_correct(self, spark, orders_parted):
        fact = spark.read.parquet(orders_parted)
        dim = spark.createDataFrame(
            [("1-URGENT", 1), ("2-HIGH", 2)], ["prio", "rank"]
        ).filter(F.col("rank") == 1)
        n = fact.join(
            F.broadcast(dim), fact.o_orderpriority == dim.prio
        ).count()
        want = fact.filter(F.col("o_orderpriority") == "1-URGENT").count()
        assert n == want > 0
