"""Generalized as-of join (operators/asof.py): directions, ties,
tolerance, plan shape — verified against pandas.merge_asof.
"""

from __future__ import annotations

import pandas as pd
import pytest

from rust_cdc_spark.operators.asof import asof_join
from rust_cdc_spark.plans import explain as X

LEFT = [  # (key, t, lval)
    ("a", 10, "l1"), ("a", 20, "l2"), ("a", 35, "l3"),
    ("b", 5, "l4"), ("b", 50, "l5"),
    ("c", 7, "l6"),  # key with no right rows
]
RIGHT = [  # (key, t, rval)
    ("a", 8, "r1"), ("a", 20, "r2"), ("a", 31, "r3"), ("a", 40, "r4"),
    ("b", 6, "r5"),
]


@pytest.fixture(scope="module")
def frames(spark):
    l = spark.createDataFrame(LEFT, "key string, t long, lval string")  # noqa: E741
    r = spark.createDataFrame(RIGHT, "key string, t long, rval string")
    return l, r


def _pandas_asof(direction, tolerance=None):
    lp = pd.DataFrame(LEFT, columns=["key", "t", "lval"]).sort_values("t")
    rp = pd.DataFrame(RIGHT, columns=["key", "t", "rval"]).sort_values("t")
    out = pd.merge_asof(
        lp, rp, on="t", by="key", direction=direction,
        tolerance=tolerance, suffixes=("", "_right"),
    )
    return {
        (row.key, row.t): (None if pd.isna(row.rval) else row.rval)
        for row in out.itertuples()
    }


def _spark_asof(l, r, direction, tolerance=None):  # noqa: E741
    out = asof_join(l, r, on="t", by=["key"], direction=direction,
                    tolerance=tolerance)
    return {(row.key, row.t): row.rval_right for row in out.collect()}


class TestDirections:
    @pytest.mark.parametrize("direction", ["backward", "forward", "nearest"])
    def test_matches_pandas_merge_asof(self, frames, direction):
        l, r = frames  # noqa: E741
        assert _spark_asof(l, r, direction) == _pandas_asof(direction)

    @pytest.mark.parametrize("direction", ["backward", "forward", "nearest"])
    @pytest.mark.parametrize("tolerance", [5, 11])
    def test_tolerance_matches_pandas(self, frames, direction, tolerance):
        l, r = frames  # noqa: E741
        assert _spark_asof(l, r, direction, tolerance) == _pandas_asof(
            direction, tolerance
        )

    def test_exact_match_included_both_directions(self, frames):
        l, r = frames  # noqa: E741
        # left (a,20) has a right row exactly at 20 → both directions hit it
        assert _spark_asof(l, r, "backward")[("a", 20)] == "r2"
        assert _spark_asof(l, r, "forward")[("a", 20)] == "r2"

    def test_nearest_tie_prefers_backward(self, spark):
        l = spark.createDataFrame([("k", 10, "l")], "key string, t long, lval string")  # noqa: E741
        r = spark.createDataFrame(
            [("k", 8, "before"), ("k", 12, "after")],
            "key string, t long, rval string",
        )
        assert _spark_asof(l, r, "nearest")[("k", 10)] == "before"

    def test_unknown_direction_raises(self, frames):
        l, r = frames  # noqa: E741
        with pytest.raises(ValueError):
            asof_join(l, r, on="t", by=["key"], direction="sideways")


class TestPlanShape:
    def test_single_exchange_no_nested_loop(self, frames):
        l, r = frames  # noqa: E741
        out = asof_join(l, r, on="t", by=["key"], direction="nearest",
                        tolerance=100)
        plan = X.plan_text(out)
        assert "NestedLoop" not in plan and "Cartesian" not in plan
        assert X.count_exchanges(out) <= 2  # two source exchanges pre-union


class TestDuplicateRightTies:
    """Multiple right rows sharing one `on` value: which one is carried
    is unspecified, but it must be DETERMINISTIC — the same row across
    partitionings and repeated runs (the window tie-breaks on
    xxhash64(carry), a content hash, never on physical row order)."""

    DUP_RIGHT = [
        ("k", 10, "r1"), ("k", 10, "r2"), ("k", 10, "r3"),
        ("k", 30, "r4"), ("k", 30, "r5"),
    ]

    @pytest.mark.parametrize("direction", ["backward", "forward", "nearest"])
    def test_stable_across_partitionings(self, spark, direction):
        l = spark.createDataFrame(  # noqa: E741
            [("k", 10, "l1"), ("k", 20, "l2"), ("k", 30, "l3")],
            "key string, t long, lval string",
        )
        picks = set()
        for r_parts, shuffled in [(1, False), (7, True), (3, True)]:
            rows = list(self.DUP_RIGHT)
            if shuffled:
                rows = rows[::-1]
            r = spark.createDataFrame(
                rows, "key string, t long, rval string"
            ).repartition(r_parts)
            picks.add(tuple(sorted(_spark_asof(l, r, direction).items())))
        assert len(picks) == 1, f"nondeterministic pick: {picks}"

    def test_carried_value_belongs_to_tie_group(self, spark):
        l = spark.createDataFrame(  # noqa: E741
            [("k", 15, "l1")], "key string, t long, lval string"
        )
        r = spark.createDataFrame(
            self.DUP_RIGHT, "key string, t long, rval string"
        )
        assert _spark_asof(l, r, "backward")[("k", 15)] in {"r1", "r2", "r3"}
        assert _spark_asof(l, r, "forward")[("k", 15)] in {"r4", "r5"}


class TestAsofProperty:
    def test_random_tables_match_pandas(self, spark):
        """Randomized check across all directions (seeded, 6 draws):
        arbitrary key/time multisets, including duplicate times within a
        key on the LEFT side (right-side ties stay unique — with
        duplicate right times the pick among equals is unspecified in
        both engines)."""
        import random

        rng = random.Random(7)
        for trial in range(6):
            keys = ["a", "b", "c"]
            left = [
                (rng.choice(keys), rng.randrange(0, 40), f"l{i}")
                for i in range(rng.randrange(3, 12))
            ]
            right_ts = {}
            right = []
            for i in range(rng.randrange(2, 10)):
                k = rng.choice(keys)
                t = rng.randrange(0, 40)
                while (k, t) in right_ts:
                    t = rng.randrange(0, 400)
                right_ts[(k, t)] = True
                right.append((k, t, f"r{i}"))
            lp = pd.DataFrame(left, columns=["key", "t", "lval"]).sort_values("t")
            rp = pd.DataFrame(right, columns=["key", "t", "rval"]).sort_values("t")
            l = spark.createDataFrame(left, "key string, t long, lval string")  # noqa: E741
            r = spark.createDataFrame(right, "key string, t long, rval string")
            for direction in ["backward", "forward", "nearest"]:
                for tol in [None, 7]:
                    got = {
                        (row.key, row.t, row.lval): row.rval_right
                        for row in asof_join(
                            l, r, on="t", by=["key"],
                            direction=direction, tolerance=tol,
                        ).collect()
                    }
                    want_df = pd.merge_asof(
                        lp, rp, on="t", by="key", direction=direction,
                        tolerance=tol, suffixes=("", "_right"),
                    )
                    want = {
                        (w.key, w.t, w.lval):
                            (None if pd.isna(w.rval) else w.rval)
                        for w in want_df.itertuples()
                    }
                    assert got == want, (trial, direction, tol)
