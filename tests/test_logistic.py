"""Distributed GD training (operators/logistic.py): numpy equivalence,
partition invariance, learning progress.
"""

from __future__ import annotations

import math

from pyspark.sql import functions as F

from rust_cdc_spark.operators.logistic import (
    QUANT,
    apply_linear_model,
    train_linear_model,
)


def _numpy_reference(rows, n_iters, lr):
    """Pure-Python replica of the quantized batch-GD (same arithmetic
    order; must be bit-identical, not approximately equal)."""
    n = len(rows)
    w = [0.0, 0.0, 0.0]
    hist = []
    for _ in range(n_iters):
        sums = [0, 0, 0]
        for y, x1, x2 in rows:
            feats = (1.0, x1, x2)
            pred = 0.0
            for wj, xj in zip(w, feats):
                pred = pred + wj * xj
            resid = pred - y
            for j, xj in enumerate(feats):
                sums[j] += math.floor(resid * xj * QUANT)
        w = [wj - lr * ((s / QUANT) / n) for wj, s in zip(w, sums)]
        hist.append(list(w))
    return hist


def _toy(spark, n_parts=4):
    rows = [
        (1.0, 0.9, 0.1), (1.0, 0.8, 0.3), (1.0, 0.7, 0.2),
        (0.0, 0.1, 0.9), (0.0, 0.3, 0.7), (0.0, 0.2, 0.95),
        (1.0, 0.95, 0.4), (0.0, 0.05, 0.6),
    ]
    df = spark.createDataFrame(rows, "y double, a double, b double")
    return rows, df.repartition(n_parts)


class TestTrainLinearModel:
    def test_bit_identical_to_python_reference(self, spark):
        rows, df = _toy(spark)
        got = train_linear_model(df, ["a", "b"], "y", n_iters=4, lr=0.5)
        want = _numpy_reference(rows, 4, 0.5)
        for (it, w), ref in zip(got, want):
            assert w == ref, f"iter {it}: {w} != {ref}"

    def test_partitioning_invariant(self, spark):
        _, df1 = _toy(spark, n_parts=1)
        _, df8 = _toy(spark, n_parts=8)
        a = train_linear_model(df1, ["a", "b"], "y", n_iters=3)
        b = train_linear_model(df8, ["a", "b"], "y", n_iters=3)
        assert a == b  # integer gradient sums commute

    def test_loss_decreases(self, spark):
        rows, df = _toy(spark)
        hist = train_linear_model(df, ["a", "b"], "y", n_iters=6, lr=0.5)

        def loss(w):
            tot = 0.0
            for y, x1, x2 in rows:
                p = w[0] + w[1] * x1 + w[2] * x2
                tot += (p - y) ** 2
            return tot

        losses = [loss(w) for _, w in hist]
        assert losses[-1] < losses[0] * 0.5

    def test_apply_separates_classes(self, spark):
        _, df = _toy(spark)
        hist = train_linear_model(df, ["a", "b"], "y", n_iters=10, lr=0.5)
        scored = apply_linear_model(df, ["a", "b"], hist[-1][1])
        acc = scored.select(
            F.avg(
                ((F.col("prediction") > 0.5) == (F.col("y") > 0.5)).cast("int")
            )
        ).first()[0]
        assert acc == 1.0  # linearly separable toy set

    def test_corpus_model_beats_chance(self, spark):
        from rust_cdc_spark.functions import text as TX
        from rust_cdc_spark.sources.tables import load_table
        from tests.conftest import SF_SMOKE

        docs = load_table(spark, "documents", SF_SMOKE)
        feats = docs.select(
            F.when(TX.quality_score("text") >= 0.5, 1.0).otherwise(0.0).alias("y"),
            F.least(
                TX.token_count("text").cast("double") / 64.0, F.lit(1.0)
            ).alias("f_len"),
            TX.stopword_ratio("text").alias("f_sw"),
            (TX.avg_token_len("text") / 10.0).alias("f_atl"),
        )
        hist = train_linear_model(
            feats, ["f_len", "f_sw", "f_atl"], "y", n_iters=10, lr=1.0
        )
        scored = apply_linear_model(feats, ["f_len", "f_sw", "f_atl"], hist[-1][1])
        acc = scored.select(
            F.avg(((F.col("prediction") > 0.5) == (F.col("y") > 0.5)).cast("int"))
        ).first()[0]
        base = feats.select(F.avg("y")).first()[0]
        assert acc > max(base, 1 - base)  # beats majority-class baseline
