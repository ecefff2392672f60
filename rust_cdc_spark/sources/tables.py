"""Parquet table loaders for the driver test data.

Declarative ``spark.read.parquet`` scans — Catalyst handles predicate
pushdown and column pruning, so callers just ``select``/``filter`` and the
scan narrows itself (verify with ``plans.explain_checks``).
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession

TABLES = (
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
)

DEFAULT_SF_DIR = "/root/testdata/sf0.1"


def sf_dir_from_env() -> str:
    return os.environ.get("SPARK_GRAFT_SF_DIR", DEFAULT_SF_DIR)


def load_table(spark: SparkSession, name: str, sf_dir: str) -> DataFrame:
    """Load one table. ``events.ts`` is stored as parquet
    TIMESTAMP(NANOS), which the Spark vectorized reader rejects — read it
    as long (legacy conf) and convert ns→µs with integer division
    (``div``, not ``/``: float division loses precision on int64 ns)."""
    if name == "events":
        configure_reader(spark)
    df = spark.read.parquet(os.path.join(sf_dir, f"{name}.parquet"))
    if name == "events":
        from pyspark.sql import functions as F

        ts_type = dict(df.dtypes).get("ts")
        if ts_type == "bigint":  # TIMESTAMP(NANOS) read as ns-long
            df = df.withColumn("ts", F.expr("timestamp_micros(ts div 1000)"))
        elif ts_type == "timestamp_ntz":  # writer variance (e.g. duckdb)
            # NTZ wall-clock is UTC by corpus convention; session tz is
            # pinned UTC in configure_reader so this cast is exact.
            df = df.withColumn("ts", F.col("ts").cast("timestamp"))
    return df





def configure_reader(spark: SparkSession) -> None:
    """Session-level reader conf needed before the first events scan."""
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    spark.conf.set("spark.sql.session.timeZone", "UTC")


def load_tables(spark: SparkSession, sf_dir: str, *names: str) -> dict[str, DataFrame]:
    return {n: load_table(spark, n, sf_dir) for n in (names or TABLES)}


def register_views(spark: SparkSession, sf_dir: str, *names: str) -> None:
    """Register each table as a temp view so ``spark.sql`` can be used
    interchangeably with the DataFrame API (same Catalyst plans)."""
    for name, df in load_tables(spark, sf_dir, *names).items():
        df.createOrReplaceTempView(name)
