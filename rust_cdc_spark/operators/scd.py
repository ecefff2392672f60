"""SCD Type-2 history from a CDC stream.

The reference's sink keeps only the current image per key (ValueBuffers
LWW → MERGE, /root/reference/src/delta/value_buffer.rs:15-83). The other
canonical downstream shape is the full history: every change opens a
version row, the next change for the same key closes it — the
slowly-changing-dimension Type 2 table a warehouse builds from exactly
this stream.

Spark-first restatement: version validity is a ``lead()`` window over
the key in binlog order — ONE shuffle keyed on the key, no self-join,
no iteration. Deletes close the prior version (they bound its
``valid_to``) but do not open one, so a deleted key simply has no
current row.

Invariants (pinned in tests/test_incremental_view.py):
- versions of a key are contiguous: each ``valid_to`` equals the next
  version's ``valid_from``; the last is open (NULL);
- a key has at most one current version, and none if its final op is a
  delete;
- the current versions are exactly the LWW collapse
  (operators/collapse.py) minus tombstones.
"""

from __future__ import annotations

from typing import Sequence

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

from rust_cdc_spark.datamodel import OP_DELETE
from rust_cdc_spark.operators.collapse import DEFAULT_ORDER


def scd2_history(
    cdc: DataFrame,
    key_cols: list[str],
    order_by: str | Sequence[str] = DEFAULT_ORDER,
) -> DataFrame:
    """CDC envelope → Type-2 version rows.

    Returns the input's I/U rows (deletes only *close* versions) with
    ``valid_to_<c>`` columns (the next event's order values, NULL while
    open) and ``is_current``. The caller projects image attributes.
    """
    if isinstance(order_by, str):
        order_cols = [order_by]
    else:
        order_cols = [c for c in order_by if c in cdc.columns]
        if not order_cols:
            raise ValueError(
                f"no order columns of {list(order_by)} in {cdc.columns}"
            )
    w = Window.partitionBy(*key_cols).orderBy(*order_cols)
    out = cdc
    for c in order_cols:
        out = out.withColumn(f"valid_to_{c}", F.lead(c).over(w))
    # open (NULL lead) ⇒ current; closed or tombstone ⇒ not.
    out = out.withColumn(
        "is_current",
        F.col(f"valid_to_{order_cols[0]}").isNull()
        & (F.col("op") != OP_DELETE),
    )
    return out.filter(F.col("op") != OP_DELETE)


def as_of_snapshot(
    history: DataFrame,
    position,
    valid_from: str = "log_pos",
    valid_to: str = "valid_to_log_pos",
) -> DataFrame:
    """Reconstruct the table state AS OF a binlog position from SCD2
    history: the version rows in effect at ``position`` (valid_from ≤ P,
    and P before valid_to; keys deleted by P have their last version
    closed and correctly vanish). ``position`` may be a literal or a
    Column (e.g. a broadcast scalar). Pure filter over the history — at
    100 TB this is a partition-prunable scan when history is stored
    partitioned/z-ordered on the validity range, never a replay."""
    p = position if isinstance(position, Column) else F.lit(position)
    return history.filter(
        (F.col(valid_from) <= p)
        & (F.col(valid_to).isNull() | (p < F.col(valid_to)))
    )


def scd2_apply_batch(
    history: DataFrame,
    batch: DataFrame,
    key_cols: list[str],
    order_by: str | Sequence[str] = DEFAULT_ORDER,
) -> DataFrame:
    """Incrementally maintain an SCD2 history with a new CDC batch.

    ``history`` is :func:`scd2_history` output (version rows with
    ``valid_to_*`` and ``is_current``); ``batch`` is a raw CDC envelope
    whose events are strictly later, per key, than the history's
    coverage (a binlog position split guarantees this). Equivalent to
    rebuilding from the concatenated log — pinned in
    tests/test_scd_apply.py — because the full-log ``lead()`` closes a
    key's last pre-batch version with exactly the key's FIRST batch
    event, which is what the join below writes.

    Scale shape: one key-keyed window over the BATCH (batch-sized, not
    table-sized), one key-equi join of history against the batch's
    |changed keys| first-event rows (AQE broadcasts it while small),
    and the batch's own one-window history. Nothing scans proportional
    to table history except the closing join's probe side — on Delta
    this is the classic MERGE that touches only matched files.
    """
    if isinstance(order_by, str):
        order_cols = [order_by]
    else:
        order_cols = [c for c in order_by if c in batch.columns]
        if not order_cols:
            raise ValueError(
                f"no order columns of {list(order_by)} in {batch.columns}"
            )
    new_rows = scd2_history(batch, key_cols, order_cols)
    w = Window.partitionBy(*key_cols).orderBy(*order_cols)
    first = (
        batch.withColumn("__rn", F.row_number().over(w))
        .filter(F.col("__rn") == 1)
        .select(
            *key_cols,
            *[F.col(c).alias(f"__close_{c}") for c in order_cols],
        )
    )
    out = history.join(first, on=key_cols, how="left")
    touched = F.col(f"__close_{order_cols[0]}").isNotNull()
    for c in order_cols:
        out = out.withColumn(
            f"valid_to_{c}",
            F.when(F.col("is_current") & touched, F.col(f"__close_{c}"))
            .otherwise(F.col(f"valid_to_{c}")),
        )
    out = out.withColumn(
        "is_current", F.col("is_current") & ~touched
    ).drop(*[f"__close_{c}" for c in order_cols])
    return out.unionByName(new_rows)
