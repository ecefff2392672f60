"""Product quantization: embedding compression + asymmetric-distance scan.

At 100 TB the embedding column IS the dataset (64 floats = 256 B/row);
raw-vector ANN scans are IO-bound before they are compute-bound. PQ
(Jégou et al. 2011, "Product Quantization for Nearest Neighbor Search"
— public method) splits each vector into ``m`` subspaces, k-means-codes
each subspace separately, and stores ``m`` small codes per vector
(16 bytes here vs 256 — 16×). Queries scan the CODES: the probe builds a
per-subspace lookup table of exact subdistances once, and each row's
approximate distance is ``m`` table lookups — pure codegen
(``element_at`` into literal arrays), no vector arithmetic per row, no
UDF in the scan.

Engine shapes:
- **Training** (model-scale driver state only): each Lloyd iteration is
  one map pass assigning every subspace's code with argmin folds over
  codebook array literals, plus a (subspace, code)-keyed
  aggregate returning m·k rows. Centroid updates are INTEGER-QUANTIZED
  (per-element micro-units, summed as BIGINT — aggregation-order-free,
  so the trained codebook is bit-identical across partitionings AND
  across engines; the DuckDB oracle replays the whole training as an
  unrolled CTE chain, queries/ann_replay.py). Deterministic init (md5
  order) + stable argmin (first minimum) complete the reproducibility.
- **Scorer choice**: the SQL scorer folds each distance over the
  codebook as a nested array *literal* (zip_with/aggregate — constant
  generated-code size, one Literal node, zero Python, zero Arrow
  transfer, bit-reproducible; see ``_assign_code`` for why this beats
  the unrolled-chain form it replaced). For production-size coarse
  quantizers (k in the thousands) the k·d-per-row interpreted fold
  loses to BLAS, so ``scorer="numpy"`` keeps the Arrow-batched matmul
  path (the operators/similarity.py precedent, measured ~100× over
  element-wise HOF scoring at 400k×64, SCALE.md).
- **Scan**: map-only codegen + TakeOrdered top-k over integer micro-unit
  ADC scores (quantized per lookup-table cell, so the per-row sum is an
  exact integer — cross-engine aggregation order is moot); composes with
  the IVF coarse quantizer (scan only probed cells) exactly as IVF-PQ
  does.

The reference has no ANN surface (this is a pipeline extension); the
binlog-side citations live in sources/. Float discipline notes:
`floor(x + 0.5)` is used for half-away-from-zero rounding of the
(always non-negative) micro quantities so driver-side Python, Spark
`round`, and DuckDB `round` agree bit-for-bit.
"""

from __future__ import annotations

import math

import pandas as pd
from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

from rust_cdc_spark.functions import vectors as V

# codegen↔numpy auto-switch: total codebook entries (m·k·d) above which
# the literal expression tree is too large to compile pleasantly.
_CODEGEN_MAX_ENTRIES = 16384




def _assign_code(vec_sql: str, codebook_j: list[list[float]],
                 j: int) -> Column:
    """Argmin over subspace j's codes; ties → lowest code.

    Implemented as ``array_min`` over (d2, code) structs — struct
    comparison is lexicographic, so equal d2 resolves to the lowest
    code, the same rule as the oracle's `ORDER BY d2, code`.

    The codebook rides along as ONE nested array *literal*
    (``F.lit(list[list[float]])`` → a single Literal node) and each
    distance is a ``zip_with``/``aggregate`` left fold over it —
    bit-identical to an explicit ``(e1-c1)² + (e2-c2)² + …`` chain
    (same left-associated add order, same exact double constants), so
    the DuckDB replay oracle still matches bit-for-bit. The earlier
    k-way *unrolled* chain expression hit Janino's method-size limits
    at m·k·d scale: every query paid a seconds-long failed compile and
    then ran the giant tree interpreted anyway (measured 7× slower
    than the fold form at m=16,k=16,d=4 — the fold's generated code is
    constant-size, so it always compiles)."""
    d = len(codebook_j[0])
    cblit = V.lit_matrix(codebook_j)
    sub = F.transform(
        F.slice(F.expr(vec_sql), j * d + 1, d), lambda x: x.cast("double")
    )
    d2 = F.transform(
        cblit,
        lambda c: F.aggregate(
            F.zip_with(sub, c, lambda a, b: (a - b) * (a - b)),
            F.lit(0.0),
            lambda acc, x: acc + x,
        ),
    )
    return F.array_min(
        F.transform(
            d2,
            lambda dd, i: F.struct(
                dd.alias("d2"), i.cast("int").alias("code")
            ),
        )
    )["code"]


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
    """numpy scorer for (subspace, subvec) rows — stable L2 argmin,
    Arrow-batched. The large-m·k·d escape hatch (see module docstring);
    NOT bit-guaranteed against the SQL replay (BLAS summation order),
    so oracle-checked queries use the codegen scorer."""
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


def _micro_mean(s: int, n: int) -> float:
    """floor(Σmicro / n) / 1e6 — double division of exact integers then
    floor: the identical op sequence Spark SQL and DuckDB evaluate, so
    driver-side Python lands on the same double."""
    return math.floor(s / n) / 1e6


def train_pq(
    corpus: DataFrame,
    m: int = 8,
    k: int = 16,
    dim: int = 64,
    iters: int = 3,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    seed: int = 42,
    scorer: str = "auto",
) -> list[list[list[float]]]:
    """Train the m sub-quantizers (k codes each); returns
    codebooks[j][code] = centroid (d/m floats). Driver state = the
    codebook (m·k·d/m floats), nothing else.

    Bit-reproducible: md5-ordered init, first-minimum assignment, and
    integer-micro centroid updates (Σ round(x·1e6) as BIGINT — exact
    whatever the partitioning — then floor-div by the count). The DuckDB
    twin (queries/ann_replay.pq_replay_cte) replays every step.
    """
    d = dim // m
    if scorer == "auto":
        scorer = "codegen" if m * k * d <= _CODEGEN_MAX_ENTRIES else "numpy"
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
    if not init:
        # empty training corpus: one zero code per subspace keeps the
        # encode/scoring expressions well-typed; scanning the (empty)
        # corpus then yields zero rows (empty-tables sweep, round 6)
        return [[[0.0] * d] for _ in range(m)]
    for _ in range(iters):
        if scorer == "codegen":
            # assignment first (the encode-shaped projection — one
            # argmin array, compiles comfortably), THEN posexplode with
            # dynamic element_at lookups. Embedding per-subspace element
            # columns inside the exploded structs fused argmins +
            # Generate + partial-agg into one generated class big
            # enough to OOM Janino on a default-1g-heap session.
            coded = (
                corpus.select(
                    F.col(vec_col).alias("__v"),
                    F.array(*[
                        _assign_code(vec_col, codebooks[j], j)
                        for j in range(m)
                    ]).alias("__codes"),
                )
                .select(F.posexplode("__codes").alias("j", "code"), "__v")
                .select(
                    "j", "code",
                    *[
                        F.element_at(
                            "__v", F.col("j") * d + F.lit(i + 1)
                        ).cast("double").alias(f"e{i}")
                        for i in range(d)
                    ],
                )
            )
        else:
            coded = sub.withColumn(
                "code", _assign_udf(codebooks)("j", "v")
            ).select(
                "j", "code",
                *[F.element_at("v", i + 1).cast("double").alias(f"e{i}")
                  for i in range(d)],
            )
        sums = (
            coded.groupBy("j", "code")
            .agg(
                F.count("*").alias("n"),
                *[
                    F.sum(F.round(F.col(f"e{i}") * 1e6).cast("bigint"))
                    .alias(f"s{i}")
                    for i in range(d)
                ],
            )
            .collect()
        )
        for r in sums:  # empty clusters keep their previous centroid
            codebooks[r["j"]][r["code"]] = [
                _micro_mean(r[f"s{i}"], r["n"]) for i in range(d)
            ]
    return codebooks


def encode_pq(
    corpus: DataFrame,
    codebooks: list[list[list[float]]],
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    scorer: str = "auto",
) -> DataFrame:
    """(id, codes array<int>) — the 16×-compressed index table. Codegen
    argmin chains by default (bit-shared with the oracle); numpy above
    the codegen size threshold."""
    m = len(codebooks)
    d = len(codebooks[0][0])
    if scorer == "auto":
        scorer = "codegen" if m * len(codebooks[0]) * d <= _CODEGEN_MAX_ENTRIES else "numpy"
    if scorer == "codegen":
        return corpus.select(
            id_col,
            F.array(*[
                _assign_code(vec_col, codebooks[j], j)
                for j in range(m)
            ]).alias("codes"),
        )

    from pyspark.sql.functions import pandas_udf

    import numpy as np

    C = [np.asarray(cb, dtype=np.float64) for cb in codebooks]

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


def adc_luts_micro(
    codebooks: list[list[list[float]]], probe: list[float]
) -> list[list[int]]:
    """Per-subspace ADC lookup tables in integer micro-units.
    luts[j][code] = round_half_away((Σ_d (p-c)²) · 1e6). The inner sum is
    a left fold (Python `sum` ≡ the SQL chain); quantizing each CELL to
    an integer makes the per-row ADC score an exact integer sum —
    aggregation order cannot perturb it in any engine."""
    m = len(codebooks)
    d = len(codebooks[0][0])
    luts = []
    for j in range(m):
        pj = probe[j * d:(j + 1) * d]
        luts.append([
            int(math.floor(
                sum((pv - cv) * (pv - cv) for pv, cv in zip(pj, c)) * 1e6
                + 0.5
            ))
            for c in codebooks[j]
        ])
    return luts


def pq_topk(
    codes_df: DataFrame,
    codebooks: list[list[list[float]]],
    probe: list[float],
    k: int = 10,
    id_col: str = "vec_id",
) -> DataFrame:
    """Asymmetric-distance top-k over the code table: the probe's exact
    per-subspace subdistances become integer-micro literal lookup
    arrays, and every row costs m ``element_at`` lookups + a BIGINT add
    chain — all codegen; the global top-k is TakeOrderedAndProject
    (per-partition heaps). Returns (id, adc_micro)."""
    m = len(codebooks)
    luts = adc_luts_micro(codebooks, probe)
    score: Column | None = None
    for j in range(m):
        t = F.element_at(
            V.lit_longs(luts[j]),
            F.element_at("codes", j + 1) + 1,
        )
        score = t if score is None else score + t
    return (
        codes_df.select(id_col, score.alias("adc_micro"))
        .orderBy(F.col("adc_micro").asc(), id_col)
        .limit(k)
    )


def build_ivf_pq_index(
    corpus: DataFrame,
    coarse_centroids: list[list[float]],
    codebooks: list[list[list[float]]],
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    scorer: str = "auto",
) -> DataFrame:
    """(id, cid, codes): the IVF-PQ index table — each vector's coarse
    cell (IVF inverted list) plus its PQ codes. This is the layout every
    billion-vector system stores: the raw vectors leave the hot path
    entirely; a query touches only the probed cells' CODE rows.
    (Classic IVF-PQ encodes residuals against the cell centroid; this
    variant codes the raw vector — one fewer coupling between the two
    quantizers at a small recall cost, recovered by the exact rerank.)"""
    from rust_cdc_spark.operators.similarity import nearest_cell_col

    cid = nearest_cell_col(vec_col, coarse_centroids, scorer=scorer)
    coded = encode_pq(corpus, codebooks, id_col, vec_col, scorer=scorer)
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
    from rust_cdc_spark.operators.similarity import nearest_cells_driver

    order = nearest_cells_driver(probe, coarse_centroids, n_probe)
    probed = index.filter(F.col("cid").isin(order))
    return pq_topk(probed, codebooks, probe, k=k, id_col=id_col)
