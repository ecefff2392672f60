"""Incremental view maintenance (operators/incremental.py): the view
advanced by per-batch deltas must equal a full recompute after EVERY
batch — bit-for-bit, since sums are integer-quantized.

The change sequence is adversarial by construction: group-changing
updates (a key moving between event types), deletes that empty a group,
re-inserts of deleted keys, and a batch touching a key twice (collapse
must fold it before the delta is taken).
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from rust_cdc_spark.operators import incremental as IV
from rust_cdc_spark.operators.collapse import collapse_last_image

GROUP = ["grp"]
KEYS = ["key"]
SCHEMA = "log_pos long, key long, op string, grp string, cents long"

# (log_pos, key, op, group, cents)
BATCHES = [
    [  # bootstrap
        (1, 1, "I", "a", 100),
        (2, 2, "I", "a", 250),
        (3, 3, "I", "b", 400),
    ],
    [  # plain update + new key
        (4, 1, "U", "a", 150),
        (5, 4, "I", "b", 50),
    ],
    [  # group-changing update: key 2 moves a -> b
        (6, 2, "U", "b", 250),
    ],
    [  # delete empties group handling; double-touch collapses first
        (7, 3, "D", "b", 400),
        (8, 4, "U", "b", 75),
        (9, 4, "U", "a", 80),
    ],
    [  # delete last member of a group, then re-insert the key
        (10, 1, "D", "a", 150),
        (11, 2, "D", "b", 250),
        (12, 4, "D", "a", 80),
        (13, 4, "I", "b", 500),
    ],
]


def _df(spark, rows):
    return spark.createDataFrame(rows, SCHEMA)


def _apply_to_state(state, batch_final):
    """Reference state transition: (state − touched) ∪ new images."""
    touched = batch_final.select(*KEYS).distinct()
    kept = state.join(touched, KEYS, "left_anti")
    new = batch_final.filter(F.col("op") != "D").select(
        *KEYS, "grp", "cents"
    )
    return kept.unionByName(new)


@pytest.fixture(scope="module")
def run(spark):
    state = _df(spark, BATCHES[0]).filter(F.col("op") != "D").select(
        "key", "grp", "cents"
    )
    view = IV.aggregate_view(state, GROUP, "n", {"s": "cents"})
    snapshots = [(state, view)]
    for rows in BATCHES[1:]:
        batch_final = collapse_last_image(
            _df(spark, rows), KEYS, order_by="log_pos"
        ).select("key", "op", "grp", "cents")
        delta = IV.batch_delta(state, batch_final, KEYS, GROUP, ["cents"])
        view = IV.apply_delta(view, delta, GROUP, "n", {"s": "cents"})
        state = _apply_to_state(state, batch_final)
        snapshots.append((state, view))
    return snapshots


def _as_map(df):
    return {r.grp: (r.n, r.s) for r in df.collect()}


class TestIncrementalEqualsRecompute:
    def test_every_batch_matches_full_recompute(self, run):
        for i, (state, view) in enumerate(run):
            expect = _as_map(
                IV.aggregate_view(state, GROUP, "n", {"s": "cents"})
            )
            got = _as_map(view)
            assert got == expect, f"batch {i}: {got} != {expect}"

    def test_group_change_moved_contribution(self, run):
        state2 = _as_map(run[2][1])
        # after batch 2: key 2 (250) moved a -> b
        assert state2["a"] == (1, 150)  # only key 1
        assert state2["b"] == (3, 700)  # keys 2, 3, 4

    def test_emptied_groups_are_dropped(self, run):
        final = _as_map(run[4][1])
        # batch 4 deleted keys 1, 2 and moved 4 into b with 500;
        # group a must disappear entirely, not linger at n=0.
        assert "a" not in final
        assert final == {"b": (1, 500)}

    def test_double_touch_collapses_before_delta(self, run):
        v = _as_map(run[3][1])
        # key 4 was updated twice in batch 3; only the final image (a, 80)
        # may count.
        assert v["a"] == (2, 230)  # keys 1 (150) + 4 (80)
        assert v["b"] == (1, 250)  # key 2 only (3 deleted)
