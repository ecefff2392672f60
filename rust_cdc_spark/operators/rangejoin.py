"""Range (interval) join: points × intervals without a nested-loop plan.

Spark plans a pure non-equi join predicate (`p.ts BETWEEN i.start AND
i.end`) as BroadcastNestedLoopJoin or CartesianProduct — quadratic work
and a broadcast that falls over once the interval side outgrows memory.
The standard scale fix (used by Databricks' range-join optimization and
time-series engines generally) is **bin bucketing**: quantize time into
fixed bins, equi-join on the bin id, then apply the exact range predicate
as a residual filter.

- points map to exactly ONE bin → no duplicate pairs from the equi join
  (each qualifying pair meets in the point's bin, once).
- intervals explode to ceil(len/bin)+1 bins — pick ``bin_seconds`` near
  the typical interval length so the blowup stays ~2×.
- the bin-id equi join shuffles both sides by a well-distributed key and
  Catalyst runs it as a hash join; work is proportional to true
  bin co-occupancy, not |points|×|intervals|.

The reference has no interval join (its DataFusion 12 SQL surface would
nested-loop it, /root/reference/src/delta/mod.rs:428-459); this is part
of the §2.7 standard-relational gap our engine fills natively.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def range_join(
    points: DataFrame,
    intervals: DataFrame,
    point_ts: str,
    start_col: str,
    end_col: str,
    bin_seconds: int = 1800,
    closed: str = "right",
) -> DataFrame:
    """Inner join of ``points`` to every interval containing their
    timestamp, via bin-bucketed equi join + residual range filter.

    ``closed`` ∈ {"right", "both"}: "right" matches
    ``start < ts <= end`` (attribution-window semantics), "both"
    matches ``start <= ts <= end``. Output columns are the union of
    both inputs (caller aliases collisions beforehand).
    """
    if closed not in ("right", "both"):
        raise ValueError(f"closed must be 'right' or 'both', got {closed!r}")
    p = points.withColumn(
        "_bin",
        F.floor(F.col(point_ts).cast("double") / F.lit(bin_seconds)).cast("long"),
    )
    i = (
        intervals.withColumn(
            "_bin",
            F.explode(
                F.sequence(
                    F.floor(F.col(start_col).cast("double") / F.lit(bin_seconds)).cast("long"),
                    F.floor(F.col(end_col).cast("double") / F.lit(bin_seconds)).cast("long"),
                )
            ),
        )
    )
    lo = (
        F.col(point_ts) > F.col(start_col)
        if closed == "right"
        else F.col(point_ts) >= F.col(start_col)
    )
    return (
        p.join(i, on="_bin")
        .filter(lo & (F.col(point_ts) <= F.col(end_col)))
        .drop("_bin")
    )
