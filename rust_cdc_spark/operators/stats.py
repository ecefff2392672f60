"""Table statistics: per-column null counts / min / max in one pass.

Reference A5 analog: it hand-rolls recursive per-column null counts per
written file for Delta ``Add`` stats
(/root/reference/src/delta/writer.rs:401-472). Spark's Delta writer does
this automatically; this operator provides the same statistics as a
*queryable* one-pass aggregation (data-skipping stats, quality
monitoring, drift detection) — one partial-aggregated exchange,
regardless of column count.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

_ORDERED = (
    T.ByteType, T.ShortType, T.IntegerType, T.LongType, T.FloatType,
    T.DoubleType, T.DecimalType, T.StringType, T.DateType, T.TimestampType,
    T.TimestampNTZType,
)


def column_stats(df: DataFrame, columns: list[str] | None = None) -> DataFrame:
    """Long-format stats: one output row per column with
    (column, n_rows, n_nulls, min_str, max_str). Min/max are rendered to
    string so heterogeneous column types stack in one result."""
    cols = columns or df.columns
    total = F.count(F.lit(1))
    aggs = [total.alias("__n")]
    for c in cols:
        f = df.schema[c]
        aggs.append(F.count(F.when(F.col(c).isNull(), 1)).alias(f"__nulls_{c}"))
        if isinstance(f.dataType, _ORDERED):
            aggs.append(F.min(c).cast("string").alias(f"__min_{c}"))
            aggs.append(F.max(c).cast("string").alias(f"__max_{c}"))
        else:
            aggs.append(F.lit(None).cast("string").alias(f"__min_{c}"))
            aggs.append(F.lit(None).cast("string").alias(f"__max_{c}"))
    one = df.agg(*aggs)
    # unpivot via stack: one row per column
    stack_args = ", ".join(
        f"'{c}', __nulls_{c}, __min_{c}, __max_{c}" for c in cols
    )
    return one.selectExpr(
        "__n AS n_rows",
        f"stack({len(cols)}, {stack_args}) AS (column, n_nulls, min_str, max_str)",
    ).select("column", "n_rows", "n_nulls", "min_str", "max_str")
