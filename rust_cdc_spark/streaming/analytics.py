"""Streaming twins of the batch analytics monitors (VERDICT r6 #8).

``cusum_drift_stream`` is the streaming form of the batch
``events_cusum_drift`` query: the data-scale work — rolling the event
stream up into per-(event_type, day) counts — runs as a watermark-able
Structured Streaming aggregation whose state Spark maintains
incrementally across microbatches; the CUSUM itself (two running
windows over the calendar-bounded daily table, shared finisher
``operators/stats.py::cusum_daily_finish``) re-derives per microbatch
inside ``foreachBatch``. That split is the right one at scale: the
stream agg touches every event exactly once and keeps state
proportional to (types × days), while the finisher's input is bounded
by the calendar, not data volume — re-running it per trigger costs
milliseconds and keeps the alarm semantics IDENTICAL to the batch
query, including the full-series mean-rate target (a fixed reference
rate is a one-line variant: pass ``target_k``).

Convergence contract (asserted in tests/test_streaming_analytics.py):
after the stream has consumed the whole fixture, the last emitted
result equals the batch query on the same data, row for row.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.streaming import StreamingQuery

from rust_cdc_spark.operators.stats import (
    binseg_daily_finish,
    cusum_daily_finish,
    mad_anomaly_finish,
)


def daily_counts_stream(events: DataFrame, watermark: str = "1 day") -> DataFrame:
    """Per-(event_type, day) counts as a streaming aggregation.

    The tumbling 1-day event-time window + watermark makes the state
    bounded and late-data-tolerant; output schema matches the batch
    daily rollup (event_type, d, n) after the window is projected to
    its start date."""
    return (
        events.withWatermark("ts", watermark)
        .groupBy(F.window("ts", "1 day").alias("w"), "event_type")
        .agg(F.count("*").cast("long").alias("n"))
    )


def cusum_drift_stream(
    events: DataFrame,
    emit: Callable[[DataFrame, int], None],
    watermark: str = "1 day",
    checkpoint_dir: str | None = None,
) -> StreamingQuery:
    """Start the streaming CUSUM monitor.

    ``emit(result_df, epoch_id)`` receives the finished per-type CUSUM
    table (same schema as the batch ``events_cusum_drift``) once per
    microbatch; write it to your sink of choice (memory table for
    tests, an upserted monitoring table in production). Complete output
    mode: each emission reflects ALL data seen so far, so the final
    emission equals the batch result — the convergence check."""
    daily = daily_counts_stream(events, watermark)

    def _finish(batch_df: DataFrame, epoch_id: int) -> None:
        d = batch_df.select(
            "event_type",
            # epoch-day key, matching the batch query's
            # floor(unix_timestamp)/86400 convention (tz-independent;
            # to_date(w.start) would shift the label — though not the
            # emitted result, d being only an ordering key — in a
            # non-UTC session; ADVICE r7)
            (F.unix_timestamp(F.col("w.start")) / 86400)
            .cast("long").alias("d"),
            F.col("n"),
        )
        emit(cusum_daily_finish(d), epoch_id)

    writer = (
        daily.writeStream.outputMode("complete").foreachBatch(_finish)
    )
    if checkpoint_dir is not None:
        writer = writer.option("checkpointLocation", checkpoint_dir)
    return writer.start()


def changepoint_stream(
    events: DataFrame,
    emit: Callable[[DataFrame, int], None],
    watermark: str = "1 day",
    checkpoint_dir: str | None = None,
) -> StreamingQuery:
    """Streaming twin of events_changepoint_binseg: the same
    incrementally-maintained daily rollup as cusum_drift_stream, with
    the shared binseg finisher re-deriving the best split per
    microbatch. Complete output mode, so the final emission equals
    the batch query — a live "the level shifted on day X" monitor
    whose verdict sharpens as data arrives."""
    daily = daily_counts_stream(events, watermark)

    def _finish(batch_df: DataFrame, epoch_id: int) -> None:
        d = batch_df.select(
            "event_type",
            # epoch-day key, matching the batch query's
            # floor(unix_timestamp)/86400 convention
            (F.unix_timestamp(F.col("w.start")) / 86400)
            .cast("long").alias("d"),
            F.col("n").alias("x"),
        )
        emit(binseg_daily_finish(d), epoch_id)

    writer = (
        daily.writeStream.outputMode("complete").foreachBatch(_finish)
    )
    if checkpoint_dir is not None:
        writer = writer.option("checkpointLocation", checkpoint_dir)
    return writer.start()


def value_histogram_stream(events: DataFrame) -> DataFrame:
    """Incrementally-maintained per-type value histogram
    ``(event_type, cents, n)`` — the state behind the streaming MAD
    anomaly gate. The aggregate is keyed by VALUE, not by event, so
    state is |types| × |distinct cents| regardless of stream length
    (the same value-histogram discipline the batch rank/tie queries
    use); complete output mode re-emits it whole each microbatch."""
    return (
        events.select(
            "event_type",
            F.round(F.col("value") * 100).cast("long").alias("cents"),
        )
        .groupBy("event_type", "cents")
        .agg(F.count("*").cast("long").alias("n"))
    )


def value_anomaly_stream(
    events: DataFrame,
    emit: Callable[[DataFrame, int], None],
    checkpoint_dir: str | None = None,
) -> StreamingQuery:
    """Streaming twin of ``events_value_anomaly_mad`` (VERDICT r7 #7):
    the live fat-finger/unit-mixup tripwire. Maintains the value
    histogram incrementally; each microbatch the shared
    ``mad_anomaly_finish`` re-derives mean ± 3·MAD per type over exact
    integers and emits the offending value buckets. Complete output
    mode, so the final emission equals the batch query's rows projected
    onto (event_type, cents) — the convergence check the test asserts.
    MAD is deliberately recomputed from the WHOLE histogram each batch
    (two-pass statistic; the histogram being value-bounded makes that
    cheap) rather than approximated incrementally — the gate must not
    drift as the anomalies it hunts enter the state."""
    hist = value_histogram_stream(events)

    def _finish(batch_df: DataFrame, epoch_id: int) -> None:
        emit(mad_anomaly_finish(batch_df), epoch_id)

    writer = (
        hist.writeStream.outputMode("complete").foreachBatch(_finish)
    )
    if checkpoint_dir is not None:
        writer = writer.option("checkpointLocation", checkpoint_dir)
    return writer.start()
