"""Generalized as-of join: backward / forward / nearest, with tolerance.

Spark has no native as-of join (SURVEY.md §2.7); the naive encoding is
a range join that plans as BroadcastNestedLoopJoin — quadratic. The
scalable shape (used by every merge-asof implementation) is: union both
sides, ONE shuffle on the equi-keys, and carry the nearest other-side
row with a running window. Direction is just the window frame:

- backward: last right row with on ≤ left.on  → last(ignorenulls)
  over (-∞, current], right sorted before left at equal ``on``.
- forward:  first right row with on ≥ left.on → first(ignorenulls)
  over [current, +∞), right sorted after left at equal ``on``.
- nearest:  both carries, pick the smaller |Δon| (ties → backward,
  pandas ``merge_asof`` semantics).

``tolerance`` (in ``on`` units) nulls out matches farther than the
bound — evaluated AFTER the carry, so it is a map-stage filter, not a
join predicate; the plan stays one exchange regardless of tolerance.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def asof_join(
    left: DataFrame,
    right: DataFrame,
    on: str,
    by: list[str],
    direction: str = "backward",
    tolerance: int | float | None = None,
    suffix: str = "_right",
) -> DataFrame:
    """As-of join ``left`` to ``right`` on ordering column ``on`` within
    equi-keys ``by``. Returns all left rows/columns plus every non-key
    right column (suffixed), null where no match qualifies.

    ``on`` must be numeric/orderable and is compared by subtraction for
    the tolerance bound (cast timestamps to epoch first)."""
    if direction not in ("backward", "forward", "nearest"):
        raise ValueError(f"unknown direction {direction!r}")

    val_cols = [c for c in right.columns if c not in by and c != on]
    r = right.select(
        *by,
        F.col(on),
        F.lit(False).alias("__is_left"),
        F.struct(F.col(on).alias("__on"), *val_cols).alias("__carry"),
        *[F.lit(None).cast(left.schema[c].dataType).alias(c)
          for c in left.columns if c not in by and c != on],
    )
    l = left.select(  # noqa: E741
        *by,
        F.col(on),
        F.lit(True).alias("__is_left"),
        F.lit(None).cast(r.schema["__carry"].dataType).alias("__carry"),
        *[F.col(c) for c in left.columns if c not in by and c != on],
    )
    unioned = l.unionByName(r.select(*l.columns))

    # At equal `on`, the right row must fall inside the left row's frame:
    # before it for backward (ascending: False < True), after it for
    # forward (descending tiebreak puts True/left first). The final
    # xxhash64(__carry) key makes the choice among multiple right rows
    # sharing the same `on` value deterministic across partitionings
    # (content-derived, so stable across runs/engines — unlike
    # monotonically_increasing_id, which is partition-layout-dependent).
    tie = F.xxhash64("__carry").asc()
    back_w = (
        Window.partitionBy(*by)
        .orderBy(F.col(on).asc(), F.col("__is_left").asc(), tie)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    fwd_w = (
        Window.partitionBy(*by)
        .orderBy(F.col(on).asc(), F.col("__is_left").desc(), tie)
        .rowsBetween(Window.currentRow, Window.unboundedFollowing)
    )
    df = unioned
    if direction in ("backward", "nearest"):
        df = df.withColumn(
            "__back", F.last("__carry", ignorenulls=True).over(back_w)
        )
    if direction in ("forward", "nearest"):
        df = df.withColumn(
            "__fwd", F.first("__carry", ignorenulls=True).over(fwd_w)
        )

    if direction == "backward":
        carry = F.col("__back")
    elif direction == "forward":
        carry = F.col("__fwd")
    else:
        d_back = F.col(on) - F.col("__back.__on")
        d_fwd = F.col("__fwd.__on") - F.col(on)
        carry = (
            F.when(F.col("__back").isNull(), F.col("__fwd"))
            .when(F.col("__fwd").isNull(), F.col("__back"))
            .when(d_fwd < d_back, F.col("__fwd"))
            .otherwise(F.col("__back"))  # ties → backward
        )
    df = df.filter(F.col("__is_left")).withColumn("__m", carry)
    if tolerance is not None:
        dist = F.abs(F.col(on) - F.col("__m.__on"))
        df = df.withColumn(
            "__m", F.when(dist <= F.lit(tolerance), F.col("__m"))
        )
    out_cols = (
        [*by, on]
        + [c for c in left.columns if c not in by and c != on]
        + [F.col(f"__m.{c}").alias(f"{c}{suffix}") for c in ["__on", *val_cols]]
    )
    out = df.select(*out_cols)
    return out.withColumnRenamed(f"__on{suffix}", f"{on}{suffix}")
