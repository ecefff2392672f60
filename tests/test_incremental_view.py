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


# ── Materialized view following a table's change feed ──────────────────

ENV_SCHEMA = (
    "log_pos long, op string,"
    " before struct<user_id:long, grp:string, value:double>,"
    " after struct<user_id:long, grp:string, value:double>"
)


def _env(spark, rows):
    """rows: (log_pos, op, before|None, after|None) tuples."""
    return spark.createDataFrame(rows, ENV_SCHEMA)


ENV_BATCHES = [
    [
        (1, "I", None, (1, "a", 1.25)),
        (2, "I", None, (2, "a", 2.50)),
        (3, "I", None, (3, "b", 4.00)),
    ],
    [  # update + group move + new key
        (4, "U", (1, "a", 1.25), (1, "a", 1.75)),
        (5, "U", (2, "a", 2.50), (2, "b", 2.50)),
        (6, "I", None, (4, "b", 0.50)),
    ],
    [  # delete + update
        (7, "D", (3, "b", 4.00), None),
        (8, "U", (4, "b", 0.50), (4, "a", 0.80)),
    ],
]


class TestMaterializedAggView:
    @pytest.fixture()
    def table_and_view(self, spark, tmp_path):
        from rust_cdc_spark.streaming.materialized_view import (
            MaterializedAggView,
        )
        from rust_cdc_spark.streaming.pipeline import ParquetUpsertTable

        table = ParquetUpsertTable(str(tmp_path / "base"), ["user_id"])
        view = MaterializedAggView(
            str(tmp_path / "view"),
            ["grp"],
            count_col="n",
            sum_exprs={
                "cents": F.round(F.col("value") * 100).cast("bigint")
            },
        )
        return table, view

    def _recompute(self, spark, table, view):
        base = table.read(spark)
        return {
            r.grp: (r.n, r.cents)
            for r in IV.aggregate_view(
                view._measured(base), ["grp"], "n", view._sum_col_map()
            ).collect()
        }

    def test_refresh_tracks_every_version(self, spark, table_and_view):
        table, view = table_and_view
        for i, rows in enumerate(ENV_BATCHES):
            table.merge(_env(spark, rows), order_by="log_pos", txn_version=i)
            view.refresh(spark, table)
            assert view.base_version() == table.version()
            got = {r.grp: (r.n, r.cents) for r in view.read(spark).collect()}
            assert got == self._recompute(spark, table, view), f"batch {i}"
        # final state: keys 1 (a,175), 2 (b,250), 4 (a,80)
        got = {r.grp: (r.n, r.cents) for r in view.read(spark).collect()}
        assert got == {"a": (2, 255), "b": (1, 250)}

    def test_replay_is_noop_and_catchup_telescopes(self, spark, table_and_view):
        table, view = table_and_view
        table.merge(_env(spark, ENV_BATCHES[0]), order_by="log_pos", txn_version=0)
        view.refresh(spark, table)
        v = view.base_version()
        view.refresh(spark, table)  # replay — must not advance or churn
        assert view.base_version() == v
        # two merges, ONE refresh: diff(v, v+2) telescopes both batches
        table.merge(_env(spark, ENV_BATCHES[1]), order_by="log_pos", txn_version=1)
        table.merge(_env(spark, ENV_BATCHES[2]), order_by="log_pos", txn_version=2)
        view.refresh(spark, table)
        got = {r.grp: (r.n, r.cents) for r in view.read(spark).collect()}
        assert got == self._recompute(spark, table, view)
        assert got == {"a": (2, 255), "b": (1, 250)}


# ── SCD Type-2 history invariants ──────────────────────────────────────


class TestScd2History:
    @pytest.fixture(scope="class")
    def hist(self, spark):
        from rust_cdc_spark.queries import load_all
        from tests.conftest import SF_SMOKE

        return load_all()["cdc_scd2_history"].spark_fn(
            spark, SF_SMOKE
        ).collect()

    def test_versions_are_contiguous_per_key(self, hist):
        by_key = {}
        for r in hist:
            by_key.setdefault(r.key, []).append(r)
        for rs in by_key.values():
            rs.sort(key=lambda r: r.valid_from)
            for a, b in zip(rs, rs[1:]):
                # a's validity must end at or before b's start; a gap is
                # allowed only if a delete closed a (tombstones emit no
                # row), in which case valid_to < next valid_from.
                assert a.valid_to is not None and a.valid_to <= b.valid_from

    def test_at_most_one_current_per_key(self, hist):
        cur = {}
        for r in hist:
            if r.is_current:
                cur[r.key] = cur.get(r.key, 0) + 1
        assert all(n == 1 for n in cur.values())
        for r in hist:
            assert r.is_current == (r.valid_to is None)

    def test_current_versions_equal_lww_collapse(self, spark, hist):
        from rust_cdc_spark.operators.collapse import collapse_last_image
        from rust_cdc_spark.sources.events_cdc import events_as_cdc
        from tests.conftest import SF_SMOKE

        cur = {
            r.key: (r.event_type, r.value) for r in hist if r.is_current
        }
        state = collapse_last_image(
            events_as_cdc(spark, SF_SMOKE), ["key"], keep_deletes=False
        ).collect()
        expect = {
            r.key: (r.after.event_type, r.after.value) for r in state
        }
        assert cur == expect
