"""Incremental view maintenance over a CDC stream.

The reference maintains the *base table* (MERGE of collapsed change
batches, /root/reference/src/delta/mod.rs:124-183). The first thing a
consumer builds on that table is an aggregate view — and recomputing it
per microbatch is O(table) when the batch is O(batch). For distributive
aggregates (count, sum — and avg/rate derived from them) the view can
be maintained from the batch alone plus the previous per-key state:

    touched   = keys appearing in the collapsed batch
    delta(g)  = Σ contributions of touched keys' NEW images (deletes none)
              − Σ contributions of touched keys' OLD images
    view'     = view ⊕ delta          (outer join, add, drop zero groups)

This is classic retraction-based IVM (the algebra behind Flink's
retract streams and Materialize/DBSP deltas), restated as three
key-partitioned DataFrame ops. Group-changing updates are handled for
free: the old image retracts from its old group, the new image adds to
its new one.

Exactness contract: sum columns must be integer-quantized by the caller
(e.g. cents, micro-units). Integer addition is associative, so
``view ⊕ delta`` is bit-identical to a full recompute — the equivalence
the tests and the DuckDB oracle assert. Float sums would drift by
summation order and turn the view into an approximation.

Scale shape: the batch collapse is a batch-sized window; old-image
lookup is a key-equi semi join against the state table (delta-sized,
not table-sized, when the state is bucketed/partitioned by key); the
delta agg and the view join are |groups|-sized. Nothing scans the full
base table.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from rust_cdc_spark.datamodel import OP_DELETE


def contributions(
    rows: DataFrame, group_cols: list[str], sum_cols: list[str], sign: int
) -> DataFrame:
    """(group, ±1 count, ±sums) per input row — one side of a delta."""
    return rows.select(
        *group_cols,
        F.lit(sign).cast("bigint").alias("__dn"),
        *[
            (F.lit(sign) * F.col(c)).cast("bigint").alias(f"__d_{c}")
            for c in sum_cols
        ],
    )


def batch_delta(
    prev_state: DataFrame,
    batch_final: DataFrame,
    key_cols: list[str],
    group_cols: list[str],
    sum_cols: list[str],
) -> DataFrame:
    """Per-group delta of one collapsed CDC batch against the previous
    state.

    ``prev_state``: one row per live key (key cols + attribute cols).
    ``batch_final``: the batch collapsed to its final image per key —
    key cols, ``op`` (tombstones kept), and the same attribute cols.
    Returns (group_cols, __dn, __d_<sum_col>...) with one row per group.
    """
    touched = batch_final.select(*key_cols).distinct()
    old = prev_state.join(touched, key_cols, "left_semi")
    new = batch_final.filter(F.col("op") != OP_DELETE)
    both = contributions(old, group_cols, sum_cols, -1).unionByName(
        contributions(new, group_cols, sum_cols, +1)
    )
    return both.groupBy(*group_cols).agg(
        F.sum("__dn").alias("__dn"),
        *[F.sum(f"__d_{c}").alias(f"__d_{c}") for c in sum_cols],
    )


def apply_delta(
    view: DataFrame,
    delta: DataFrame,
    group_cols: list[str],
    count_col: str,
    sum_col_map: dict[str, str],
) -> DataFrame:
    """``view ⊕ delta``: outer-join on the group, add counts and sums,
    drop groups whose count reaches zero. ``sum_col_map`` maps each view
    sum column to the source attribute it sums (e.g. {"total_cents":
    "cents"})."""
    joined = view.join(delta, group_cols, "full_outer")
    out = joined.select(
        *group_cols,
        (
            F.coalesce(F.col(count_col), F.lit(0))
            + F.coalesce(F.col("__dn"), F.lit(0))
        ).alias(count_col),
        *[
            (
                F.coalesce(F.col(vc), F.lit(0))
                + F.coalesce(F.col(f"__d_{src}"), F.lit(0))
            ).alias(vc)
            for vc, src in sum_col_map.items()
        ],
    )
    return out.filter(F.col(count_col) > 0)


def aggregate_view(
    state: DataFrame,
    group_cols: list[str],
    count_col: str,
    sum_col_map: dict[str, str],
) -> DataFrame:
    """Full recompute of the maintained view — the bootstrap (and the
    equivalence oracle the incremental path must match bit-for-bit)."""
    return state.groupBy(*group_cols).agg(
        F.count("*").cast("bigint").alias(count_col),
        *[
            F.sum(F.col(src)).cast("bigint").alias(vc)
            for vc, src in sum_col_map.items()
        ],
    )
