"""Z-order layout: Morton-key bit math and measured file-level pruning
(operators/layout.py).
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from rust_cdc_spark.operators import layout as L
from rust_cdc_spark.sources.tables import load_table
from tests.conftest import SF_SMOKE


def _py_spread2(x: int) -> int:
    out = 0
    for i in range(32):
        out |= ((x >> i) & 1) << (2 * i)
    return out


def _py_morton(cols: list[int], bits: int) -> int:
    n = len(cols)
    out = 0
    for i in range(bits):
        for j, c in enumerate(cols):
            out |= ((c >> i) & 1) << (i * n + (n - 1 - j))
    return out


class TestMortonKey:
    def test_spread_matches_reference_bit_loop(self, spark):
        vals = [0, 1, 2, 3, 255, 256, 65535, 12345]
        df = spark.createDataFrame([(v,) for v in vals], "x long")
        got = [
            r.s for r in
            df.select(L.spread_bits2(F.col("x")).alias("s"))
            .orderBy("x").collect()
        ]
        assert got == [_py_spread2(v) for v in sorted(vals)]

    def test_two_col_key_interleaves(self, spark):
        df = spark.createDataFrame(
            [(3, 5), (65535, 0), (0, 65535), (1000, 2000)], "x long, y long"
        )
        got = [
            (r.x, r.y, r.k)
            for r in df.select(
                "x", "y", L.zorder_key2(F.col("x"), F.col("y")).alias("k")
            ).collect()
        ]
        for x, y, k in got:
            assert k == _py_morton([x, y], 16), (x, y)

    def test_generic_three_col_key(self, spark):
        df = spark.createDataFrame(
            [(1, 2, 3), (7, 0, 7), (255, 255, 255)], "x long, y long, z long"
        )
        key = L.zorder_key([F.col("x"), F.col("y"), F.col("z")], bits=8)
        got = [(r.x, r.y, r.z, r.k) for r in df.select("x", "y", "z", key.alias("k")).collect()]
        for x, y, z, k in got:
            assert k == _py_morton([x, y, z], 8), (x, y, z)

    def test_key_is_locality_preserving(self, spark):
        """Neighbouring grid cells share key prefixes: the max key of a
        quadrant is below the min key of the next quadrant."""
        rows = [(x, y) for x in range(64) for y in range(64)]
        df = spark.createDataFrame(rows, "x long, y long")
        keyed = df.select(
            "x", "y", L.zorder_key2(F.col("x"), F.col("y")).alias("k")
        )
        # quadrant (x<32, y<32) occupies exactly the first quarter of key space
        q = keyed.agg(
            F.max(F.when((F.col("x") < 32) & (F.col("y") < 32), F.col("k"))).alias("qmax"),
            F.min(F.when((F.col("x") >= 32) | (F.col("y") >= 32), F.col("k"))).alias("rest_min"),
        ).first()
        assert q.qmax < q.rest_min


class TestFileSkipping:
    @pytest.fixture(scope="class")
    def layouts(self, spark, tmp_path_factory):
        base = tmp_path_factory.mktemp("layout")
        ev = load_table(spark, "events", SF_SMOKE).select(
            "event_id", "user_id", "value"
        )
        zpath, lpath = str(base / "zorder"), str(base / "linear")
        L.write_zordered(ev, zpath, ["user_id", "event_id"], n_files=64)
        L.write_linear(ev, lpath, "user_id", n_files=64)
        bounds = ev.agg(
            F.min("user_id").alias("lu"), F.max("user_id").alias("hu"),
            F.min("event_id").alias("le"), F.max("event_id").alias("he"),
        ).first()
        return zpath, lpath, bounds

    @staticmethod
    def _avg_pruning(path, col, lo, hi, width=0.05):
        """Mean file-pruning fraction of a ``width``-wide range scan,
        averaged over window positions across the value span (so no
        single z-curve seam dominates the measurement)."""
        span = hi - lo
        fracs = []
        for at in (0.15, 0.35, 0.55, 0.75, 0.9):
            wlo = lo + int(span * at)
            whi = wlo + max(1, int(span * width))
            fracs.append(L.file_pruning_fraction(path, col, wlo, whi))
        return sum(fracs) / len(fracs)

    def test_zorder_prunes_both_dimensions(self, layouts):
        zpath, _, b = layouts
        pu = self._avg_pruning(zpath, "user_id", b.lu, b.hu)
        pe = self._avg_pruning(zpath, "event_id", b.le, b.he)
        assert pu >= 0.5, f"user_id pruning too weak: {pu}"
        assert pe >= 0.5, f"event_id pruning too weak: {pe}"

    def test_linear_prunes_only_leading_column(self, layouts):
        _, lpath, b = layouts
        pu = self._avg_pruning(lpath, "user_id", b.lu, b.hu)
        pe = self._avg_pruning(lpath, "event_id", b.le, b.he)
        assert pu >= 0.8, f"leading-column pruning should be sharp: {pu}"
        assert pe <= 0.2, f"non-sort column should not prune: {pe}"

    def test_zordered_data_roundtrips(self, spark, layouts):
        zpath, _, _ = layouts
        ev = load_table(spark, "events", SF_SMOKE)
        assert spark.read.parquet(zpath).count() == ev.count()
        orig = ev.agg(F.sum("event_id")).first()[0]
        got = spark.read.parquet(zpath).agg(F.sum("event_id")).first()[0]
        assert got == orig


class TestHilbertEngines:
    def test_arrow_and_sql_hilbert_keys_identical(self, spark):
        """The r9 Arrow (numpy int64) xy2d path must be byte-identical
        to the packed-BIGINT expression fold it replaced as the default
        — the walk is pure integer arithmetic, so any divergence is a
        transcription bug, not float noise."""
        ev = load_table(spark, "events", SF_SMOKE)
        a = L.with_hilbert_key(ev, ["user_id", "event_id"], engine="arrow")
        s = L.with_hilbert_key(ev, ["user_id", "event_id"], engine="sql")
        al = a.select("event_id", "hkey")
        sl = s.select("event_id", "hkey")
        assert al.exceptAll(sl).count() == 0
        assert sl.exceptAll(al).count() == 0

    def test_null_coords_agree_across_engines(self, spark):
        """ADVICE r9 follow-up: NULL input coordinates must not crash
        the numpy path and must produce the SAME key as the SQL fold.
        (Investigation note: scale_to_grid clamps a NULL input to grid
        cell 0 before either engine runs — Spark's greatest() skips
        nulls — so the walk never actually sees a NULL through
        with_hilbert_key; the arrow path additionally NULL-masks
        defensively for direct callers of _hilbert_key_arrow.)"""
        df = spark.createDataFrame(
            [(1, 10, 20), (2, None, 30), (3, 40, None), (4, 50, 60)],
            "rid long, x long, y long",
        )
        a = {
            r.rid: r.hkey
            for r in L.with_hilbert_key(df, ["x", "y"], engine="arrow")
            .collect()
        }
        s = {
            r.rid: r.hkey
            for r in L.with_hilbert_key(df, ["x", "y"], engine="sql")
            .collect()
        }
        assert a == s
        assert all(v is not None for v in a.values())
