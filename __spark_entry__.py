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


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    return {name: q.spark_fn for name, q in load_all().items()}


def oracle_sql() -> dict[str, str]:
    return {
        name: q.oracle for name, q in load_all().items() if q.oracle is not None
    }
