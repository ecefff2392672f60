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


def cusum_daily_finish(daily: DataFrame) -> DataFrame:
    """One-sided CUSUM change detection over a per-key daily count
    table ``(event_type, d, n)`` — the shared finishing plan of the
    batch query ``events_cusum_drift`` and its streaming twin
    (``streaming/analytics.py``): target rate k = mean daily count
    (truncating div), excursion via the closed form
    s_t = P_t − min(0, min_{j≤t} P_j) over prefix sums of (n − k),
    alarm when s > 2k. Two per-type running windows, exact BIGINT —
    see the batch query's docstring for the recursion-to-closed-form
    argument.

    Input is calendar-bounded (days × types), so this finisher is
    cheap wherever it runs — including once per streaming microbatch
    over an incrementally-maintained daily table."""
    from pyspark.sql import Window

    scal = daily.groupBy("event_type").agg(
        F.count("*").cast("long").alias("n_days"),
        F.expr("sum(n) div count(*)").cast("long").alias("k"),
    )
    w = (
        Window.partitionBy("event_type")
        .orderBy("d")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    pre = (
        daily.join(scal, "event_type")
        .withColumn("t", F.row_number().over(
            Window.partitionBy("event_type").orderBy("d")))
        .withColumn("p", F.sum(F.col("n") - F.col("k")).over(w))
        .withColumn("runmin", F.min("p").over(w))
    )
    cusum = pre.withColumn(
        "s", F.col("p") - F.least(F.lit(0).cast("long"), F.col("runmin"))
    )
    alarm = F.col("s") > 2 * F.col("k")
    return cusum.groupBy("event_type").agg(
        F.max("n_days").cast("long").alias("n_days"),
        F.max("k").cast("long").alias("target_daily"),
        F.max("s").cast("long").alias("max_cusum"),
        F.sum(F.when(alarm, 1).otherwise(0)).cast("long")
        .alias("n_alarm_days"),
        F.coalesce(
            F.min(F.when(alarm, F.col("t"))), F.lit(0)
        ).cast("long").alias("first_alarm_day"),
    )


def binseg_daily_finish(daily: DataFrame) -> DataFrame:
    """Single change-point by binary segmentation over a per-key daily
    count table ``(event_type, d, x)`` — the shared finishing plan of
    the batch ``events_changepoint_binseg`` query and its streaming
    twin (``streaming/analytics.py``): exact BIGINT prefix sums, gain
    S_L²/n_L + S_R²/n_R − S²/n from three divisions of exact ints,
    argmax tie-broken on the earliest split. Input is calendar-bounded
    (days × types), so re-running per microbatch is cheap."""
    from pyspark.sql import Window

    wp = Window.partitionBy("event_type")
    wo = wp.orderBy("d")
    pre = daily.select(
        "event_type",
        "d",
        F.row_number().over(wo).alias("t"),
        F.sum("x").over(
            wo.rowsBetween(Window.unboundedPreceding, Window.currentRow)
        ).alias("sk"),
        F.sum("x").over(wp).alias("s"),
        F.count("*").over(wp).alias("n"),
    )
    gains = pre.filter(F.col("t") < F.col("n")).withColumn(
        "gain",
        F.col("sk").cast("double") * F.col("sk") / F.col("t")
        + (F.col("s") - F.col("sk")).cast("double")
        * (F.col("s") - F.col("sk"))
        / (F.col("n") - F.col("t"))
        - F.col("s").cast("double") * F.col("s") / F.col("n"),
    )
    best = gains.withColumn(
        "rk", F.row_number().over(wp.orderBy(F.col("gain").desc(), "t"))
    ).filter(F.col("rk") == 1)
    return best.select(
        "event_type",
        F.col("n").cast("long").alias("n_days"),
        F.col("t").cast("long").alias("split_index"),
        F.col("d").cast("long").alias("split_epoch_day"),
        F.expr("sk * 1000 div t").alias("mean_left_milli"),
        F.expr("(s - sk) * 1000 div (n - t)").alias("mean_right_milli"),
        F.round("gain", 6).alias("gain"),
    )


def mad_anomaly_finish(hist: DataFrame) -> DataFrame:
    """Per-type robust anomaly gate over a ``(event_type, cents, n)``
    VALUE HISTOGRAM — the shared finishing plan of the batch query
    ``events_value_anomaly_mad`` and its streaming twin
    (``streaming/analytics.py::value_anomaly_stream``). Identical exact
    integers to the event-level batch formula, because both statistics
    are plain sums: mean = Σ(cents·n) div Σn and
    mad = Σ(|cents−mean|·n) div Σn weight-fold the histogram exactly as
    ``sum(cents) div count(*)`` folds the raw events. Emits the value
    BUCKETS outside mean ± 3·mad — the alert payload a monitor needs
    (type, offending value, how many, against what baseline), and the
    exact projection of the batch query's per-event rows onto
    (event_type, cents).

    Input is value-bounded (|types| × |distinct cents|), so the
    finisher is cheap wherever it runs — including once per streaming
    microbatch over the incrementally-maintained histogram."""
    stats = hist.groupBy("event_type").agg(
        F.expr("sum(cents * n) div sum(n)").cast("long")
        .alias("mean_cents"),
    )
    mad = (
        hist.join(F.broadcast(stats), "event_type")
        .groupBy("event_type")
        .agg(
            F.expr("sum(abs(cents - mean_cents) * n) div sum(n)")
            .cast("long").alias("mad_cents"),
            F.max("mean_cents").alias("mean_cents"),
        )
    )
    return (
        hist.join(F.broadcast(mad), "event_type")
        .filter(
            F.abs(F.col("cents") - F.col("mean_cents"))
            > 3 * F.col("mad_cents")
        )
        .select(
            "event_type", "cents",
            F.col("n").cast("long").alias("n_events"),
            "mean_cents", "mad_cents",
        )
    )
