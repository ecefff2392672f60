"""Snapshot bootstrap: consistent initial load ⊕ overlapping binlog tail.

Onboarding an existing table into CDC needs more than tailing the log:
the log does not reach back to the beginning of time, so ingestion
starts from a *snapshot* plus the binlog from the snapshot's position.
At 100 TB the snapshot cannot be a single consistent read — it is taken
in parallel key-range chunks, each chunk consistent only as of its own
binlog *watermark* position (the DBLog / Flink-CDC incremental-snapshot
algorithm; the reference starts from a caller-supplied (file, pos) —
/root/reference/src/mysql/conn.rs COM_BINLOG_DUMP — and leaves the
snapshot to the operator).

Reconciliation rule, per key: a binlog event positioned AFTER the key's
chunk watermark supersedes the snapshot row; at or before the watermark
the snapshot row already includes it and must win. Spark-first
restatement: lift each snapshot row into the change envelope *at its
chunk's watermark position*, union with the (at-least-once, overlap
included) tail, and run the ordinary last-writer-wins collapse with the
snapshot flag as the tie-breaker — one union and one key-partitioned
window, no per-chunk driver loop, replay-idempotent by construction.
"""

from __future__ import annotations

from typing import Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from rust_cdc_spark.operators.collapse import DEFAULT_ORDER, collapse_last_image

SNAP_FLAG = "__is_snapshot"


def snapshot_as_envelope(
    snapshot: DataFrame,
    key_cols: Sequence[str],
    image_cols: Sequence[str],
    watermark_file: str | None = None,
    watermark_pos: str = "hw",
) -> DataFrame:
    """Lift consistent-as-of-watermark snapshot rows into the CDC
    envelope: op='I', the row as the after-image, ordered at the chunk's
    watermark position (column ``watermark_pos``). ``key_cols`` stay
    top-level so the collapse can key on them; ``image_cols`` must match
    the change stream's after-struct fields (struct types have to line
    up for the union)."""
    out = snapshot.select(
        *key_cols,
        (F.col("log_file") if "log_file" in snapshot.columns
         else F.lit(watermark_file)).alias("log_file"),
        F.col(watermark_pos).cast("long").alias("log_pos"),
        F.lit("I").alias("op"),
        F.lit(None).cast("string").alias("database"),
        F.lit(None).cast("string").alias("table"),
        F.struct(*[F.col(c) for c in image_cols]).alias("after"),
    )
    return out.withColumn("before", F.lit(None).cast(out.schema["after"].dataType))


def bootstrap_state(
    snapshot_env: DataFrame,
    changes: DataFrame,
    key_cols: list[str],
    order_by: Sequence[str] = DEFAULT_ORDER,
    keep_deletes: bool = False,
) -> DataFrame:
    """Merge a chunked snapshot with an overlapping change tail into the
    bootstrapped table state.

    ``snapshot_env`` rows sit at their chunk watermark (see
    ``snapshot_as_envelope``); ``changes`` may reach arbitrarily far back
    before any watermark (at-least-once tail) — last-writer-wins makes
    the overlap harmless. Ties at exactly the watermark go to the
    snapshot row, which by definition already contains that change.
    """
    tail = changes.withColumn(SNAP_FLAG, F.lit(0))
    snap = snapshot_env.withColumn(SNAP_FLAG, F.lit(1))
    unioned = tail.unionByName(snap, allowMissingColumns=True)
    return collapse_last_image(
        unioned,
        key_cols,
        order_by=[*order_by, SNAP_FLAG],
        keep_deletes=keep_deletes,
    ).drop(SNAP_FLAG)
