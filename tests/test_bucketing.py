"""Co-located join via bucketing: the write-once/shuffle-never layout.

Asserts the core 100 TB claim from operators/bucketing.py: a fact-fact
equi-join on the bucket key over two bucketed tables plans with ZERO
Exchange nodes, and produces exactly the same rows as the plain join.
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from rust_cdc_spark.operators.bucketing import write_bucketed
from rust_cdc_spark.plans import explain as X
from rust_cdc_spark.sources.tables import load_table
from tests.conftest import SF_SMOKE


@pytest.fixture(scope="module")
def bucketed(spark):
    li = load_table(spark, "lineitem", SF_SMOKE).select(
        "l_orderkey", "l_quantity", "l_extendedprice"
    )
    orders = load_table(spark, "orders", SF_SMOKE).select(
        "o_orderkey", "o_orderstatus", "o_totalprice"
    )
    write_bucketed(li, "lineitem_bkt", ["l_orderkey"], 8)
    write_bucketed(orders, "orders_bkt", ["o_orderkey"], 8)
    yield
    spark.sql("DROP TABLE IF EXISTS lineitem_bkt")
    spark.sql("DROP TABLE IF EXISTS orders_bkt")


def _join(spark):
    li = spark.table("lineitem_bkt")
    orders = spark.table("orders_bkt")
    return li.join(orders, li.l_orderkey == orders.o_orderkey).select(
        "l_orderkey", "o_orderstatus", "l_quantity"
    )


class TestBucketedJoin:
    def test_join_has_zero_exchanges(self, spark, bucketed):
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
        try:
            df = _join(spark)
            got = X.count_exchanges(df)
            assert got == 0, f"{got} exchanges\n{X.plan_text(df)}"
        finally:
            spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "10485760")

    def test_same_rows_as_plain_join(self, spark, bucketed):
        li = load_table(spark, "lineitem", SF_SMOKE)
        orders = load_table(spark, "orders", SF_SMOKE)
        plain = (
            li.join(orders, li.l_orderkey == orders.o_orderkey)
            .select("l_orderkey", "o_orderstatus", "l_quantity")
        )
        assert sorted(map(tuple, _join(spark).collect())) == sorted(
            map(tuple, plain.collect())
        )

    def test_bucketed_agg_has_zero_exchanges(self, spark, bucketed):
        # groupBy on the bucket key also reuses the stored partitioning
        df = (
            spark.table("lineitem_bkt")
            .groupBy("l_orderkey")
            .agg(F.sum("l_quantity").alias("q"))
        )
        got = X.count_exchanges(df)
        assert got == 0, f"{got} exchanges\n{X.plan_text(df)}"
