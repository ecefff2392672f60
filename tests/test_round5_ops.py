"""Unit tests for round-5 operators: blocked-GEMM exact near-dup,
let-bound lang-id argmax, audio framing, Bradley-Terry MM arithmetic,
absence anti-join."""

from __future__ import annotations

import math
import random

from pyspark.sql import functions as F
from pyspark.sql import types as T

from rust_cdc_spark.functions import text as TX
from rust_cdc_spark.functions import vectors as V
from rust_cdc_spark.operators import multimodal as MM
from rust_cdc_spark.operators import similarity as SIM


class TestBlockedExactNearDup:
    def _emb(self, spark, n=60, dim=8, seed=7):
        rng = random.Random(seed)
        rows = [
            (i, [rng.uniform(-1, 1) for _ in range(dim)]) for i in range(n)
        ]
        return rows, spark.createDataFrame(
            rows,
            T.StructType([
                T.StructField("vec_id", T.LongType()),
                T.StructField("embedding", T.ArrayType(T.FloatType())),
            ]),
        )

    def test_matches_bruteforce_all_block_pairs(self, spark):
        """Every pair must be found exactly once, including pairs whose
        two vectors land in different blocks in either id order (the
        min/max orientation case)."""
        rows, emb = self._emb(spark)
        got = {
            (r.vec_a, r.vec_b): r.cos_sim
            for r in SIM.exact_near_dup_pairs_blocked(
                emb, threshold=0.2, n_blocks=4
            ).collect()
        }
        vecs = {i: [float(x) for x in v] for i, v in rows}
        # float32 storage: quantize exactly as Spark does before scoring
        import numpy as np

        q = {i: np.array(v, dtype=np.float32).astype(np.float64)
             for i, v in vecs.items()}
        want = {}
        for i in q:
            for j in q:
                if i >= j:
                    continue
                a, b = q[i], q[j]
                cos = float(a @ b / (np.linalg.norm(a) * np.linalg.norm(b)))
                if cos >= 0.2:
                    want[(i, j)] = round(cos, 4)
        assert set(got) == set(want)
        for k in want:
            assert math.isclose(got[k], want[k], abs_tol=2e-4), (k, got[k], want[k])

    def test_empty_result_high_threshold(self, spark):
        _rows, emb = self._emb(spark, n=10)
        out = SIM.exact_near_dup_pairs_blocked(emb, threshold=1.5, n_blocks=3)
        assert out.count() == 0


class TestLangIdArgmax:
    def _pred(self, spark, text):
        df = spark.createDataFrame([(text,)], ["text"])
        return df.select(TX.lang_id_multi("text").alias("p")).first().p

    def test_english(self, spark):
        assert self._pred(spark, "the cat sat on the mat and it is warm") == "en"

    def test_below_threshold_other(self, spark):
        assert self._pred(spark, "zzz qqq www eee rrr") == "other"

    def test_tie_breaks_to_first_sorted_language(self, spark):
        # 'la' is in both es and fr lists; coverage ties → es (sorted first)
        from rust_cdc_spark.functions.text import LANG_STOPWORDS

        assert "la" in LANG_STOPWORDS["es"] and "la" in LANG_STOPWORDS["fr"]
        assert self._pred(spark, "la la la") == "es"

    def test_score_at_threshold_wins_over_other(self, spark):
        # exactly 1 stopword in 25 tokens = 0.04 == min_score → language
        text = "the " + " ".join(f"x{i}" for i in range(24))
        assert self._pred(spark, text) == "en"


class TestAudioFrameEnergy:
    def _media(self, spark, payloads):
        return spark.createDataFrame(
            [(i, bytearray(p)) for i, p in enumerate(payloads)],
            T.StructType([
                T.StructField("media_id", T.LongType()),
                T.StructField("payload", T.BinaryType()),
            ]),
        )

    def test_frame_math_exact(self, spark):
        data = bytes(range(1, 11))  # 10 samples
        media = self._media(spark, [data])
        out = {
            r.frame_idx: (r.start_sample, r.energy)
            for r in MM.audio_frame_energy(media, frame=4, hop=3).collect()
        }
        # frames: [0..4) [3..7) [6..10) — 1+(10-4)//3 = 3 frames
        sq = [b * b for b in data]
        assert out == {
            0: (0, sum(sq[0:4])),
            1: (3, sum(sq[3:7])),
            2: (6, sum(sq[6:10])),
        }

    def test_short_payload_yields_no_frames(self, spark):
        media = self._media(spark, [b"ab", b"abcd"])
        out = MM.audio_frame_energy(media, frame=4, hop=2).collect()
        assert [(r.media_id, r.frame_idx) for r in out] == [(1, 0)]


class TestBradleyTerry:
    def test_strength_orders_by_dominance(self, spark, tmp_path):
        """src with higher per-rank quality dominates duels → strictly
        higher MM strength after each iteration."""
        from rust_cdc_spark.queries import load_all

        reg = load_all()
        out = {
            r.source: r
            for r in reg["preference_bradley_terry"]
            .spark_fn(spark, "/root/testdata/sf0.001")
            .collect()
        }
        assert out, "no sources"
        for r in out.values():
            assert r.n_matches >= r.wins >= 0
            assert r.strength1_micro >= 1 and r.strength2_micro >= 1
        # monotone sanity: the max-wins source outranks the min-wins one
        best = max(out.values(), key=lambda r: (r.wins, r.source))
        worst = min(out.values(), key=lambda r: (r.wins, r.source))
        if best.wins > worst.wins:
            assert best.strength2_micro > worst.strength2_micro


class TestAbandonedViews:
    def test_window_boundaries(self, spark):
        rows = [
            # u1: view at t0, purchase 30 min later → converted
            (1, "2024-01-01 00:00:00", 1, "view"),
            (2, "2024-01-01 00:30:00", 1, "purchase"),
            # u2: view, purchase exactly +1h → converted (<= bound)
            (3, "2024-01-01 00:00:00", 2, "view"),
            (4, "2024-01-01 01:00:00", 2, "purchase"),
            # u3: purchase BEFORE the view and one at +61min → abandoned
            (5, "2024-01-01 00:00:00", 3, "purchase"),
            (6, "2024-01-01 00:10:00", 3, "view"),
            (7, "2024-01-01 01:11:00", 3, "purchase"),
        ]
        df = spark.createDataFrame(
            [(i, t, u, e) for i, t, u, e in rows],
            ["event_id", "ts", "user_id", "event_type"],
        ).withColumn("ts", F.to_timestamp("ts"))
        views = df.filter(F.col("event_type") == "view").select(
            "event_id", "user_id", "ts"
        )
        purch = df.filter(F.col("event_type") == "purchase").select(
            F.col("user_id").alias("p_user"), F.col("ts").alias("p_ts")
        )
        abandoned = views.join(
            purch,
            (F.col("user_id") == F.col("p_user"))
            & (F.col("p_ts") > F.col("ts"))
            & (F.col("p_ts") <= F.col("ts") + F.expr("INTERVAL 1 HOUR")),
            "left_anti",
        )
        assert [r.user_id for r in abandoned.collect()] == [3]
