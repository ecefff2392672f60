"""Derive a CDC change stream from the driver's ``events`` table.

The reference consumes a live MySQL binlog; for oracle-checkable testing we
need a *deterministic* change stream over shared data. This adapter maps
the synthetic ``events`` table (event_id, ts, user_id, event_type, value,
props) onto the CDC envelope:

- key       := user_id            (the "primary key" of the virtual table)
- op        := signup→I, click/view/purchase→U, error→D
- log_pos   := event_id           (binlog total order; monotone)
- after     := struct(user_id, event_type, value, props)   for I/U
- before    := same struct                                  for D

This gives the exact shape the reference's ingest path sees
(OpBody::{Add,Update,Delete}, /root/reference/src/delta/mod.rs:52-59) while
staying 100% SQL-expressible for the DuckDB oracle.

Pure projection — no shuffle; the mapping stays inside whole-stage codegen.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from rust_cdc_spark.sources.tables import load_table

# CASE mapping; kept as a plain SQL expression so the DuckDB oracle can
# state the identical rule.
OP_EXPR = (
    "CASE event_type WHEN 'signup' THEN 'I' WHEN 'error' THEN 'D' ELSE 'U' END"
)


def events_as_cdc(spark: SparkSession, sf_dir: str) -> DataFrame:
    """events table → CDC envelope rows (database='app', table='users')."""
    ev = load_table(spark, "events", sf_dir)
    image = F.struct(
        F.col("user_id"),
        F.col("event_type"),
        F.col("value"),
        F.col("props"),
    )
    op = F.expr(OP_EXPR)
    return ev.select(
        F.col("ts"),
        F.lit(1).cast("long").alias("server_id"),
        F.lit("binlog.000001").alias("log_file"),
        F.col("event_id").alias("log_pos"),
        F.col("user_id").alias("key"),
        F.lit("app").alias("database"),
        F.lit("users").alias("table"),
        op.alias("op"),
        F.when(op == "D", image).alias("before"),
        F.when(op != "D", image).alias("after"),
    )
