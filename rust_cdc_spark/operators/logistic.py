"""Distributed training of the quality classifier: batch gradient
descent as DataFrame aggregations.

`quality_logistic_score` SERVES a fixed linear model; this module
TRAINS one at corpus scale, same discipline as the IVF k-means trainer
and the BPE trainer (operators/similarity.py, operators/bpe.py): each
iteration is ONE aggregation over the data; the only driver-side state
is the model (n_features doubles).

Determinism at scale: a float gradient is a sum over rows, and Spark
sums doubles in partition order — nondeterministic across runs and
engines. Each row's gradient contribution is therefore **quantized to
integer micro-units** (floor(g · 1e6)) and summed as BIGINT: integer
addition commutes, so the learned weights are bit-identical across
partitionings, retries, and engines (same idiom as the repo's
micro-unit BM25/DSIR scores). The per-row model application stays pure
codegen arithmetic (squared loss → no exp(), whose last-ulp behavior
differs between libm implementations).

100 TB shape: per iteration one map stage (p = w·x, residual·x_j) and
one ≤n_features-column integer sum agg with map-side partials — the
shuffle carries one row per partition, not per example. n_iters total
passes; weights broadcast as literals each pass (bytes, not data).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

QUANT = 1_000_000  # gradient micro-units


def train_linear_model(
    df: DataFrame,
    feature_cols: list[str],
    label_col: str,
    n_iters: int = 5,
    lr: float = 0.5,
) -> list[tuple[int, list[float]]]:
    """Batch-GD weights for a linear model p = w·[1, x...] under squared
    loss. Returns [(iteration, weights_after)] — weights include the
    leading bias term. Bit-deterministic (see module docstring)."""
    # empty training frame: zero gradients either way — n=1 keeps the
    # update arithmetic defined and weights stay 0 (empty-tables sweep)
    n = df.count() or 1
    feats = [F.lit(1.0), *[F.col(c).cast("double") for c in feature_cols]]
    w = [0.0] * len(feats)
    history: list[tuple[int, list[float]]] = []
    for it in range(n_iters):
        pred = sum(F.lit(wj) * xj for wj, xj in zip(w, feats))
        resid = pred - F.col(label_col).cast("double")
        sums = df.agg(
            *[
                F.sum(F.floor(resid * xj * F.lit(QUANT)).cast("long")).alias(f"g{j}")
                for j, xj in enumerate(feats)
            ]
        ).first()
        w = [
            wj - lr * ((sums[f"g{j}"] or 0) / QUANT) / n
            for j, wj in enumerate(w)
        ]
        history.append((it, list(w)))
    return history


def apply_linear_model(
    df: DataFrame, feature_cols: list[str], weights: list[float]
) -> DataFrame:
    """Serve the trained model: p = w·[1, x...] as one codegen
    expression (the trained twin of quality_logistic_score's fused
    scorer)."""
    feats = [F.lit(1.0), *[F.col(c).cast("double") for c in feature_cols]]
    pred = sum(F.lit(wj) * xj for wj, xj in zip(weights, feats))
    return df.withColumn("prediction", pred)
