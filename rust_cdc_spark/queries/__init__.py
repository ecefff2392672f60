"""Query registry — the engine's checkable surface.

Every operator from SURVEY.md §2 (and the large-scale pipeline extensions)
is exposed as a named query: a PySpark callable ``(spark, sf_dir) ->
DataFrame`` plus, where SQL-expressible, the equivalent ANSI SQL the
DuckDB oracle runs on the same parquet tables. Names and column aliases
are shared between the two sides — the driver hash-compares values after
sorting columns by name.

Modules self-register on import:
- ``cdc``        — the reference's own pipeline semantics (normalize,
                   route, collapse, merge, op stats).
- ``relational`` — the standard relational surface (§2.7): joins, aggs,
                   windows, set ops, scalar funcs.
- ``llm``        — large-scale training-data ops: dedup, text analysis,
                   similarity search.
- ``timeseries`` — event-time windowing / sessionization (batch shape of
                   the streaming operators).
"""

from __future__ import annotations

from collections.abc import Callable
from dataclasses import dataclass

from pyspark.sql import DataFrame, SparkSession


@dataclass(frozen=True)
class Query:
    name: str
    spark_fn: Callable[[SparkSession, str], DataFrame]
    oracle: str | None  # ANSI SQL for DuckDB; None → rows-only check


REGISTRY: dict[str, Query] = {}


def register(name: str, oracle: str | None = None):
    def deco(fn):
        REGISTRY[name] = Query(name, fn, oracle)
        return fn

    return deco


def load_all() -> dict[str, Query]:
    """Import all query modules (idempotent) and return the registry."""
    from rust_cdc_spark.queries import (  # noqa: F401
        cdc,
        curation,
        layout,
        llm,
        multimodal,
        relational,
        retrieval,
        sql_surface,
        timeseries,
        training,
    )

    return REGISTRY


def utc(spark: SparkSession) -> SparkSession:
    """Pin the session timezone for timestamp-bearing queries — the driver
    owns the SparkSession, so set it at query time. Matches DuckDB's
    UTC-naive timestamps and the reference's forced ``time_zone='+00:00'``
    replica session (/root/reference/src/mysql/conn.rs:606-632)."""
    spark.conf.set("spark.sql.session.timeZone", "UTC")
    return spark
