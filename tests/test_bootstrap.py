"""Chunked-snapshot bootstrap reconciliation (operators/bootstrap.py):
watermark tie-breaks, overlap idempotence, delete/re-insert races.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from rust_cdc_spark.operators import bootstrap as BOOT

ENV_SCHEMA = (
    "log_file string, log_pos long, key long, op string, "
    "database string, table string, "
    "before struct<k:long, v:string>, after struct<k:long, v:string>"
)


def _changes(spark, rows):
    """rows: (pos, key, op, v) in binlog.000001."""
    data = [
        (
            "binlog.000001",
            pos,
            k,
            op,
            "app",
            "t",
            (k, v) if op == "D" else None,
            (k, v) if op != "D" else None,
        )
        for pos, k, op, v in rows
    ]
    return spark.createDataFrame(data, ENV_SCHEMA)


def _snapshot(spark, rows):
    """rows: (key, hw, v) — chunk-consistent reads."""
    df = spark.createDataFrame(rows, "key long, hw long, v string")
    return BOOT.snapshot_as_envelope(
        df, ["key"], ["key", "v"], watermark_file="binlog.000001"
    ).withColumn(
        "after", F.col("after").cast("struct<k:long, v:string>")
    ).withColumn("before", F.col("before").cast("struct<k:long, v:string>"))


def _state(snapshot_env, changes, **kw):
    out = BOOT.bootstrap_state(snapshot_env, changes, ["key"], **kw)
    return {r.key: r.after.v for r in out.collect()}


class TestBootstrapState:
    def test_tail_after_watermark_supersedes_snapshot(self, spark):
        snap = _snapshot(spark, [(1, 100, "snap")])
        tail = _changes(spark, [(150, 1, "U", "newer")])
        assert _state(snap, tail) == {1: "newer"}

    def test_overlap_before_watermark_loses_to_snapshot(self, spark):
        # at-least-once tail reaching back BEFORE the watermark: the
        # snapshot already contains those changes and must win.
        snap = _snapshot(spark, [(1, 100, "snap")])
        tail = _changes(spark, [(50, 1, "U", "stale"), (99, 1, "U", "stale2")])
        assert _state(snap, tail) == {1: "snap"}

    def test_tie_at_watermark_goes_to_snapshot(self, spark):
        # the event at exactly hw is included in the chunk read
        snap = _snapshot(spark, [(1, 100, "snap-incl-100")])
        tail = _changes(spark, [(100, 1, "U", "the-event-at-100")])
        assert _state(snap, tail) == {1: "snap-incl-100"}

    def test_per_chunk_watermarks_differ(self, spark):
        # key 1's chunk snapshotted early (hw=10), key 2's late (hw=200):
        # the same tail event position supersedes one but not the other
        snap = _snapshot(spark, [(1, 10, "early"), (2, 200, "late")])
        tail = _changes(spark, [(150, 1, "U", "mid"), (150, 2, "U", "mid")])
        assert _state(snap, tail) == {1: "mid", 2: "late"}

    def test_delete_after_watermark_removes_snapshot_row(self, spark):
        snap = _snapshot(spark, [(1, 100, "snap")])
        tail = _changes(spark, [(120, 1, "D", "snap")])
        assert _state(snap, tail) == {}

    def test_delete_then_reinsert_after_watermark(self, spark):
        snap = _snapshot(spark, [(1, 100, "snap")])
        tail = _changes(spark, [(120, 1, "D", "snap"), (130, 1, "I", "back")])
        assert _state(snap, tail) == {1: "back"}

    def test_key_missing_from_snapshot_inserted_by_tail(self, spark):
        # deleted as of the chunk read (no snapshot row), re-created later
        snap = _snapshot(spark, [(1, 100, "snap")])
        tail = _changes(spark, [(50, 2, "D", "gone"), (130, 2, "I", "fresh")])
        assert _state(snap, tail) == {1: "snap", 2: "fresh"}

    def test_snapshot_only_keys_survive(self, spark):
        snap = _snapshot(spark, [(1, 100, "a"), (2, 100, "b")])
        tail = _changes(spark, [(150, 3, "I", "c")])
        assert _state(snap, tail) == {1: "a", 2: "b", 3: "c"}

    def test_replaying_tail_twice_is_idempotent(self, spark):
        snap = _snapshot(spark, [(1, 100, "snap")])
        tail = _changes(spark, [(150, 1, "U", "newer")])
        once = _state(snap, tail)
        twice = _state(snap, tail.unionByName(tail))
        assert once == twice == {1: "newer"}

    def test_keep_deletes_surfaces_tombstones(self, spark):
        snap = _snapshot(spark, [(1, 100, "snap")])
        tail = _changes(spark, [(120, 1, "D", "snap")])
        out = BOOT.bootstrap_state(snap, tail, ["key"], keep_deletes=True)
        rows = out.collect()
        assert len(rows) == 1 and rows[0].op == "D"


class TestPositionOnlyOrdering:
    """order_by=("log_pos",): the coherent collapse for a
    position-watermarked snapshot over a stream whose positions are
    globally monotonic but whose file names differ — with the default
    (log_file, log_pos) order, the snapshot's synthetic (file, hw)
    coordinate is incoherent across file boundaries (positions reset
    per file), and a later-file tail event could lose to or wrongly
    beat the snapshot purely on the file-name comparison."""

    def _multi_file_tail(self, spark, rows):
        """rows: (file, pos, key, op, v)."""
        data = [
            (f, pos, k, op, "app", "t",
             (k, v) if op == "D" else None,
             (k, v) if op != "D" else None)
            for f, pos, k, op, v in rows
        ]
        return spark.createDataFrame(data, ENV_SCHEMA)

    def test_later_file_event_past_watermark_supersedes(self, spark):
        snap = _snapshot(spark, [(1, 100, "snap")])
        tail = self._multi_file_tail(
            spark, [("binlog.000002", 150, 1, "U", "newer")]
        )
        out = BOOT.bootstrap_state(
            snap, tail, ["key"], order_by=("log_pos",)
        )
        assert {r.key: r.after.v for r in out.collect()} == {1: "newer"}

    def test_later_file_event_before_watermark_loses(self, spark):
        # position-only semantics: pos <= hw means "already in the
        # snapshot" regardless of which file name carried it
        snap = _snapshot(spark, [(1, 100, "snap")])
        tail = self._multi_file_tail(
            spark, [("binlog.000002", 50, 1, "U", "stale")]
        )
        out = BOOT.bootstrap_state(
            snap, tail, ["key"], order_by=("log_pos",)
        )
        assert {r.key: r.after.v for r in out.collect()} == {1: "snap"}

    def test_default_order_would_misresolve_this_stream(self, spark):
        # documents WHY cdc_snapshot_bootstrap passes order_by: under
        # (log_file, log_pos) the file-name comparison decides first,
        # so the stale later-file event (pos 50 <= hw) wrongly beats
        # the snapshot row stamped with an earlier file name
        snap = _snapshot(spark, [(1, 100, "snap")])
        tail = self._multi_file_tail(
            spark, [("binlog.000002", 50, 1, "U", "stale")]
        )
        out = BOOT.bootstrap_state(snap, tail, ["key"])
        assert {r.key: r.after.v for r in out.collect()} == {1: "stale"}
