"""Incremental SCD2 maintenance (operators/scd.scd2_apply_batch):
applying a batch to an existing history must equal rebuilding from the
concatenated log — including delete-closure, multi-batch folding, and
keys that exist only on one side of the split.
"""

from __future__ import annotations

import random

from rust_cdc_spark.operators import scd as SCD

ENV_SCHEMA = (
    "log_file string, log_pos long, key long, op string, "
    "after struct<v:string>"
)


def _env(spark, rows):
    """rows: (pos, key, op, v)."""
    return spark.createDataFrame(
        [("binlog.000001", pos, k, op, (v,)) for pos, k, op, v in rows],
        ENV_SCHEMA,
    )


def _canon(df):
    return sorted(
        (r.key, r.log_pos, r.valid_to_log_pos, r.is_current, r.after.v)
        for r in df.collect()
    )


def _full_vs_incremental(spark, rows, split_pos):
    full = SCD.scd2_history(_env(spark, rows), ["key"], order_by="log_pos")
    initial = [r for r in rows if r[0] <= split_pos]
    batch = [r for r in rows if r[0] > split_pos]
    inc = SCD.scd2_apply_batch(
        SCD.scd2_history(_env(spark, initial), ["key"], order_by="log_pos"),
        _env(spark, batch),
        ["key"],
        order_by="log_pos",
    )
    return _canon(full), _canon(inc)


class TestScd2ApplyBatch:
    ROWS = [
        (10, 1, "I", "a"), (20, 1, "U", "b"), (60, 1, "U", "c"),
        (15, 2, "I", "x"), (70, 2, "D", "x"),          # deleted in batch
        (30, 3, "I", "m"),                              # untouched key
        (65, 4, "I", "new"), (80, 4, "U", "new2"),      # batch-only key
        (25, 5, "D", "gone"), (75, 5, "I", "back"),     # delete then re-add
    ]

    def test_equals_full_rebuild(self, spark):
        full, inc = _full_vs_incremental(spark, self.ROWS, split_pos=50)
        assert inc == full

    def test_batch_first_event_closes_open_version(self, spark):
        _, inc = _full_vs_incremental(spark, self.ROWS, split_pos=50)
        k1 = [r for r in inc if r[0] == 1]
        # (key, from, to, current, v): 10→20 closed, 20→60 closed, 60 open
        assert k1 == [(1, 10, 20, False, "a"), (1, 20, 60, False, "b"),
                      (1, 60, None, True, "c")]

    def test_delete_in_batch_leaves_no_current(self, spark):
        _, inc = _full_vs_incremental(spark, self.ROWS, split_pos=50)
        k2 = [r for r in inc if r[0] == 2]
        assert k2 == [(2, 15, 70, False, "x")]  # closed by D, no current

    def test_multi_batch_fold_equals_full(self, spark):
        full = SCD.scd2_history(
            _env(spark, self.ROWS), ["key"], order_by="log_pos"
        )
        hist = SCD.scd2_history(
            _env(spark, [r for r in self.ROWS if r[0] <= 25]),
            ["key"], order_by="log_pos",
        )
        for lo, hi in [(25, 60), (60, 200)]:
            part = [r for r in self.ROWS if lo < r[0] <= hi]
            hist = SCD.scd2_apply_batch(
                hist, _env(spark, part), ["key"], order_by="log_pos"
            )
        assert _canon(hist) == _canon(full)

    def test_randomized_equivalence(self, spark):
        rnd = random.Random(7)
        rows = []
        for pos in range(1, 120):
            rows.append(
                (pos, rnd.randrange(8),
                 rnd.choice(["I", "U", "U", "D"]), f"v{pos}")
            )
        for split in (1, 40, 118):
            full, inc = _full_vs_incremental(spark, rows, split_pos=split)
            assert inc == full, f"split {split}"
