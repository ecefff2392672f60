"""Product quantization: embedding compression + asymmetric-distance scan.

At 100 TB the embedding column IS the dataset (64 floats = 256 B/row);
raw-vector ANN scans are IO-bound before they are compute-bound. PQ
(Jégou et al. 2011, "Product Quantization for Nearest Neighbor Search"
— public method) splits each vector into ``m`` subspaces, k-means-codes
each subspace separately, and stores ``m`` small codes per vector
(8 bytes here vs 256 — 32×). Queries scan the CODES: the probe builds a
per-subspace lookup table of exact subdistances once, and each row's
approximate distance is ``m`` table lookups — pure codegen
(``element_at`` into literal arrays), no vector arithmetic per row, no
UDF in the scan.

Engine shapes:
- **Training** (model-scale driver state only): subvectors explode to
  (vec_id, subspace, subvec) rows — ONE DataFrame, all ``m`` subspace
  quantizers trained together; each Lloyd iteration is one
  vectorized-UDF argmin pass + one (subspace, code)-keyed average agg
  returning m·k rows. Deterministic init (md5 order) and stable argmin
  → the codebook is reproducible.
- **Encoding**: one Arrow-batched numpy argmin pass (the IVF scorer
  precedent, operators/similarity.py — interpreted per-element HOFs
  are measured orders slower for k·d arithmetic).
- **Scan**: map-only codegen + TakeOrdered top-k; composes with the IVF
  coarse quantizer (scan only probed cells) exactly as IVF-PQ does.
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def _sub_rows(corpus: DataFrame, m: int, dim: int,
              id_col: str, vec_col: str) -> DataFrame:
    d = dim // m
    subs = F.array(*[
        F.struct(
            F.lit(j).alias("j"),
            F.slice(vec_col, j * d + 1, d).alias("v"),
        )
        for j in range(m)
    ])
    return corpus.select(
        F.col(id_col).alias("i"), F.explode(subs).alias("s")
    ).select("i", F.col("s.j").alias("j"), F.col("s.v").alias("v"))


def _assign_udf(codebooks: list[list[list[float]]]):
    """codes per (subspace, subvec) row — stable L2 argmin, vectorized."""
    from pyspark.sql.functions import pandas_udf

    import numpy as np

    C = [np.asarray(cb, dtype=np.float64) for cb in codebooks]

    @pandas_udf("int")
    def assign(j: pd.Series, v: pd.Series) -> pd.Series:
        out = np.empty(len(j), dtype="int32")
        jv = j.to_numpy()
        V = np.stack(v.to_numpy()).astype(np.float64)
        for jj in np.unique(jv):
            mask = jv == jj
            d2 = ((V[mask, None, :] - C[jj][None, :, :]) ** 2).sum(axis=2)
            out[mask] = np.argmin(d2, axis=1)
        return pd.Series(out)

    return assign


def train_pq(
    corpus: DataFrame,
    m: int = 8,
    k: int = 16,
    dim: int = 64,
    iters: int = 3,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    seed: int = 42,
) -> list[list[list[float]]]:
    """Train the m sub-quantizers (k codes each); returns
    codebooks[j][code] = centroid (d/m floats). Driver state = the
    codebook (m·k·d/m floats), nothing else."""
    d = dim // m
    sub = _sub_rows(corpus, m, dim, id_col, vec_col)
    w = Window.partitionBy("j").orderBy(
        F.md5(F.concat_ws("|", F.lit(str(seed)), "j", "i"))
    )
    init = (
        sub.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= k)
        .orderBy("j", "rn")
        .collect()
    )
    codebooks = [
        [[float(x) for x in r["v"]] for r in init if r["j"] == j]
        for j in range(m)
    ]
    for _ in range(iters):
        assigned = sub.withColumn(
            "code", _assign_udf(codebooks)("j", "v")
        )
        means = (
            assigned.groupBy("j", "code")
            .agg(*[
                F.avg(F.element_at("v", i + 1)).alias(f"c{i}")
                for i in range(d)
            ])
            .collect()
        )
        for r in means:  # empty clusters keep their previous centroid
            codebooks[r["j"]][r["code"]] = [float(r[f"c{i}"]) for i in range(d)]
    return codebooks


def encode_pq(
    corpus: DataFrame,
    codebooks: list[list[list[float]]],
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """(id, codes array<int>) — the 32×-compressed index table."""
    from pyspark.sql.functions import pandas_udf

    import numpy as np

    C = [np.asarray(cb, dtype=np.float64) for cb in codebooks]
    m = len(C)
    d = C[0].shape[1]

    @pandas_udf("array<int>")
    def codes(v: pd.Series) -> pd.Series:
        V = np.stack(v.to_numpy()).astype(np.float64)
        out = np.empty((len(V), m), dtype="int32")
        for j in range(m):
            sub = V[:, j * d:(j + 1) * d]
            d2 = ((sub[:, None, :] - C[j][None, :, :]) ** 2).sum(axis=2)
            out[:, j] = np.argmin(d2, axis=1)
        return pd.Series(list(out))

    return corpus.select(id_col, codes(vec_col).alias("codes"))


def pq_topk(
    codes_df: DataFrame,
    codebooks: list[list[list[float]]],
    probe: list[float],
    k: int = 10,
    id_col: str = "vec_id",
) -> DataFrame:
    """Asymmetric-distance top-k over the code table: the probe's exact
    per-subspace subdistances become literal lookup arrays, and every
    row costs m ``element_at`` lookups + an add chain — all codegen; the
    global top-k is TakeOrderedAndProject (per-partition heaps)."""
    m = len(codebooks)
    d = len(codebooks[0][0])
    luts = []
    for j in range(m):
        pj = probe[j * d:(j + 1) * d]
        luts.append([
            sum((pv - cv) ** 2 for pv, cv in zip(pj, c))
            for c in codebooks[j]
        ])
    score = sum(
        F.element_at(
            F.array(*[F.lit(x) for x in luts[j]]),
            F.element_at("codes", j + 1) + 1,
        )
        for j in range(m)
    )
    return (
        codes_df.select(id_col, score.alias("adc_dist2"))
        .orderBy(F.col("adc_dist2").asc(), id_col)
        .limit(k)
    )


def build_ivf_pq_index(
    corpus: DataFrame,
    coarse_centroids: list[list[float]],
    codebooks: list[list[list[float]]],
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """(id, cid, codes): the IVF-PQ index table — each vector's coarse
    cell (IVF inverted list) plus its PQ codes. This is the layout every
    billion-vector system stores: the raw vectors leave the hot path
    entirely; a query touches only the probed cells' CODE rows.
    (Classic IVF-PQ encodes residuals against the cell centroid; this
    variant codes the raw vector — one fewer coupling between the two
    quantizers at a small recall cost, recovered by the exact rerank.)"""
    from rust_cdc_spark.operators.similarity import _nearest_centroids_udf

    cid = _nearest_centroids_udf(coarse_centroids, 1)(vec_col)[0]
    coded = encode_pq(corpus, codebooks, id_col, vec_col)
    cells = corpus.select(id_col, cid.alias("cid"))
    return cells.join(coded, id_col)


def ivf_pq_topk(
    index: DataFrame,
    coarse_centroids: list[list[float]],
    codebooks: list[list[list[float]]],
    probe: list[float],
    n_probe: int = 4,
    k: int = 10,
    id_col: str = "vec_id",
) -> DataFrame:
    """ADC top-k over only the ``n_probe`` cells nearest the probe:
    a partition-prunable `cid IN (...)` filter (driver-computed cell
    list — model-scale math, no data touched) followed by the codegen
    lookup-table scan of pq_topk. Cost ∝ corpus · n_probe / n_cells
    CODE rows, not vectors."""
    import numpy as np

    from rust_cdc_spark.operators.similarity import _unit_rows

    Cn = _unit_rows(coarse_centroids)
    p = np.asarray(probe, dtype=np.float64)
    pn = p / (np.linalg.norm(p) or 1.0)
    order = np.argsort(-(Cn @ pn), kind="stable")[:n_probe]
    probed = index.filter(F.col("cid").isin([int(c) for c in order]))
    return pq_topk(probed, codebooks, probe, k=k, id_col=id_col)
