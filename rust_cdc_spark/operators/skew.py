"""Skew-mitigation operators: salting for hot keys.

AQE's skew-join handling (enabled in session.py) covers sort-merge joins
at runtime; explicit salting is the deterministic tool for the two cases
AQE doesn't re-plan: hot-key *aggregations* and broadcast-ineligible
joins against a skewed build side. Both are pure DataFrame rewrites:

- ``salted_agg``: two-phase aggregation — phase 1 groups on
  (key, salt ∈ [0, n)), phase 2 combines partials per key. The hot key's
  rows split across n reducers instead of one straggler.
- ``salted_join``: replicate the small side n× (one copy per salt),
  salt the big side randomly-but-deterministically (hash of a unique
  column % n), join on (key, salt). Replication cost n·|small| buys a
  balanced shuffle of the big side.

Both take an explicit combine contract instead of guessing how to merge
partials — the same shape Spark's own partial aggregation uses.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def with_salt(df: DataFrame, n_salts: int, unique_col: str) -> DataFrame:
    """Deterministic salt from a unique column (no rand(): deterministic
    retries/replays matter more than perfect uniformity)."""
    return df.withColumn("__salt", F.pmod(F.xxhash64(F.col(unique_col)), F.lit(n_salts)))


def salted_agg(
    df: DataFrame,
    key_cols: list[str],
    partial_aggs: list[Column],
    final_aggs: list[Column],
    n_salts: int,
    unique_col: str,
) -> DataFrame:
    """Two-phase salted aggregation.

    ``partial_aggs`` run per (key, salt); ``final_aggs`` combine the
    partial columns per key. Example (count + sum):

        partial: [F.count("*").alias("c"), F.sum("v").alias("s")]
        final:   [F.sum("c").alias("n"),  F.sum("s").alias("total")]
    """
    salted = with_salt(df, n_salts, unique_col)
    partial = salted.groupBy(*key_cols, "__salt").agg(*partial_aggs)
    return partial.groupBy(*key_cols).agg(*final_aggs)


def salted_join(
    big: DataFrame,
    small: DataFrame,
    on: list[str],
    n_salts: int,
    big_unique_col: str,
    how: str = "inner",
) -> DataFrame:
    """Skew-safe equi-join: salt the big side, replicate the small side
    across all salts, join on keys + salt.

    The small side exists in ``n_salts`` copies, so modes that can emit
    an UNMATCHED small-side row (right/full outer) need replication-
    aware handling: a copy is unmatched whenever its particular salt has
    no big-side partner, which says nothing about the key as a whole.
    Those modes therefore decompose: the salted join covers the matched
    (and, for full, the big-preserving) part, and the truly-unmatched
    small rows come from a key-level anti-join against the big side's
    DISTINCT keys — an aggregation that collapses even the most skewed
    key to one row before the anti-join, so no salting is needed there.
    Semi/anti against the replicated side remain unsupported.
    """
    supported = (
        "inner", "left", "leftouter", "left_outer",
        "right", "rightouter", "right_outer", "full", "fullouter",
        "full_outer", "outer",
    )
    if how not in supported:
        raise ValueError(
            f"salted_join supports inner/left/right/full, got {how!r}"
        )
    outerish = how not in ("inner", "left", "leftouter", "left_outer")
    big_s = with_salt(big, n_salts, big_unique_col)
    small_r = small.crossJoin(
        F.broadcast(
            big.sparkSession.range(n_salts).select(F.col("id").cast("long").alias("__salt"))
        )
    )
    inner_how = (
        how if not outerish
        else ("left" if how not in ("right", "rightouter", "right_outer")
              else "inner")
    )
    out = big_s.join(small_r, on=[*on, "__salt"], how=inner_how).drop("__salt")
    if not outerish:
        return out
    unmatched_small = small.join(
        big.select(*on).distinct(), on=on, how="left_anti"
    )
    return out.unionByName(unmatched_small, allowMissingColumns=True)
