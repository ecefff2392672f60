"""All-but-the-top embedding postprocessing — PCA by replayable power
iteration.

Web-scale embedding corpora are postprocessed before ANN / semantic
dedup by removing the mean and the projection onto the top principal
components (Mu & Viswanath 2018, "All-but-the-Top"): the dominant
directions carry corpus-frequency signal, not semantics, and removing
them measurably improves cosine retrieval. The eigensolver is the
usually-unverifiable step, so the trainer here follows the replay
discipline of ``operators/pq.py`` / ``queries/ann_replay.py`` — every
arithmetic step is deterministic and re-run by the DuckDB oracle
(``ann_replay.pca_replay_sql``), putting the *training* under the
value-hash gate, not just the final projection:

- the second-moment matrix is an exact BIGINT aggregate over micro-unit
  (×1e6) quantized coordinates — aggregation-order-free, so any
  partitioning (and the oracle's relational re-aggregation) produces
  identical bits;
- covariance, the fixed-count power iteration (1/8-filled init vector,
  zero-norm guard), normalization, and Hotelling deflation are
  left-associated IEEE-double chains written identically here (Python
  left folds) and in the oracle's unrolled CTEs.

Scale shape: the moment aggregate is ONE partial-aggregated shuffle
keyed on (pos1, pos2) — dim² = 4096 keys, constant in corpus size; the
64×64 matrix is the only driver-side state (model-scale, the same
class as PQ codebooks); projection + residual are pure-codegen
zip_with/aggregate folds over component literals — map-only, no
shuffle, no Python row path.
"""

from __future__ import annotations

import math

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from rust_cdc_spark.functions import vectors as V

DIM = 64  # embedding dimensionality of the corpus tables
COMPS = 2  # components removed by all-but-the-top
ITERS = 24  # fixed power-iteration count (replayed, not converged-upon):
# on a near-isotropic spectrum (synthetic embeddings are Marchenko-
# Pastur-flat, λ2/λ1 ≈ 0.93) this lands the Rayleigh quotient within 2%
# of λmax; correctness never depends on convergence — the oracle
# replays the same fixed count.


def quantized(emb: DataFrame) -> DataFrame:
    """(vec_id, q: array<long>) — micro-unit (×1e6) coordinates; the
    exact-integer ground truth both engines aggregate from."""
    return emb.select(
        "vec_id",
        F.transform(
            F.col("embedding"),
            lambda x: F.round(x.cast("double") * 1e6).cast("long"),
        ).alias("q"),
    )


def moment_stats(
    emb: DataFrame, dim: int = DIM
) -> tuple[int, list[int], list[list[int]]]:
    """Exact integer first/second moments: (n, S[dim], M[dim][dim]) with
    S_i = Σ q_i and M_ij = Σ q_i·q_j over the corpus. |q| ≤ ~1e6 for
    unit-scale embeddings, so products are ≤ 1e12 and int64 sums never
    wrap before ~9e6 such products; the BINDING cross-engine bound is
    tighter — train_components rounds each moment to binary64 before
    dividing (matching the oracle's CAST(m AS DOUBLE)/n), and a BIGINT
    moment is exactly representable in a double only below 2^53
    (~9e15), i.e. ~10⁴–10⁶ typical-magnitude vectors. Past that scale,
    shard the aggregate by (pos1, pos2, salt) AND divide per shard
    before combining (double addition of per-shard means), or widen to
    DECIMAL in both engines."""
    q = quantized(emb)
    flat = q.select("vec_id", F.posexplode("q").alias("pos", "v"))
    srows = (
        flat.groupBy("pos")
        .agg(F.sum("v").alias("s"), F.count("*").alias("n"))
        .collect()
    )
    if not srows:
        # empty corpus: zero moments — train_components degrades to a
        # zero-mean identity-free rotation and the (empty) projection
        # emits zero rows (empty-tables sweep, round 6)
        return 0, [0] * dim, [[0] * dim for _ in range(dim)]
    n = int(srows[0]["n"])
    S = [0] * dim
    for r in srows:
        S[r["pos"]] = int(r["s"])
    pairs = (
        q.select(F.posexplode("q").alias("p1", "v1"), "q")
        .select("p1", "v1", F.posexplode("q").alias("p2", "v2"))
        .groupBy("p1", "p2")
        .agg(F.sum(F.col("v1") * F.col("v2")).alias("m"))
    )
    M = [[0] * dim for _ in range(dim)]
    for r in pairs.collect():
        M[r["p1"]][r["p2"]] = int(r["m"])
    return n, S, M


def _chain(terms: list[float]) -> float:
    """Left-associated sum — the evaluation order of the oracle's SQL
    `t1 + t2 + …` chains and Spark's 0.0-seeded aggregate folds (IEEE
    `0.0 + t1 == t1`)."""
    acc = terms[0]
    for t in terms[1:]:
        acc = acc + t
    return acc


def train_components(
    n: int,
    S: list[int],
    M: list[list[int]],
    dim: int = DIM,
    comps: int = COMPS,
    iters: int = ITERS,
) -> tuple[list[float], list[tuple[float, list[float]]]]:
    """Mean + top-``comps`` (eigenvalue-scale, component) pairs via
    power iteration with Hotelling deflation. Bit-for-bit the
    arithmetic of ``ann_replay.pca_replay_sql``: moments round to
    binary64 FIRST and then divide (float(m)/n — exactly the oracle's
    CAST(m AS DOUBLE)/n; a direct int/int true division would round
    the exact rational instead and diverge 1 ulp once |m| > 2^53,
    which 24 power iterations can amplify into a flipped rounded
    output), left-fold chains,
    `sqrt` IEEE, zero-norm guarded, deflation as C - (λ·v_i)·v_j."""
    n = n or 1  # zero moments on an empty corpus → zero mean/cov
    mean = [(float(S[i]) / n) / 1e6 for i in range(dim)]
    C = [
        [
            (float(M[i][j]) / n) / 1e12 - mean[i] * mean[j]
            for j in range(dim)
        ]
        for i in range(dim)
    ]
    out: list[tuple[float, list[float]]] = []
    for _c in range(comps):
        v = [0.125] * dim  # 1/sqrt(64): exact in binary64
        nrm = 1.0
        for _t in range(iters):
            w = [
                _chain([C[i][j] * v[j] for j in range(dim)])
                for i in range(dim)
            ]
            nrm = math.sqrt(_chain([w[i] * w[i] for i in range(dim)]))
            if nrm == 0.0:
                nrm = 1.0
            v = [w[i] / nrm for i in range(dim)]
        out.append((nrm, v))
        C = [
            [C[i][j] - (nrm * v[i]) * v[j] for j in range(dim)]
            for i in range(dim)
        ]
    return mean, out


def project_abtt(
    emb: DataFrame,
    mean: list[float],
    components: list[tuple[float, list[float]]],
) -> DataFrame:
    """(vec_id, pc{i}_micro…, resid_micro): per-vector projections onto
    each removed component and the residual norm after subtracting mean
    and all components — the all-but-the-top output. Pure codegen:
    centered coords once per row, one fold per component, micro-unit
    rounding at the end (round of a bit-identical double is
    engine-safe)."""
    q = quantized(emb)
    ml = V.lit_doubles(mean)
    cent = F.zip_with(
        F.col("q"),
        ml,
        lambda a, b: a.cast("double") / F.lit(1.0e6) - b,
    )
    df = q.select("vec_id", cent.alias("c"))
    projs = []
    for idx, (_lam, v) in enumerate(components, start=1):
        vl = V.lit_doubles(v)
        p = F.aggregate(
            F.zip_with(F.col("c"), vl, lambda a, b: a * b),
            F.lit(0.0),
            lambda acc, x: acc + x,
        )
        projs.append(p.alias(f"_p{idx}"))
    csq = F.aggregate(F.col("c"), F.lit(0.0), lambda acc, x: acc + x * x)
    tmp = df.select("vec_id", *projs, csq.alias("_csq"))
    resid_sq = F.col("_csq")
    for idx in range(1, len(components) + 1):
        resid_sq = resid_sq - F.col(f"_p{idx}") * F.col(f"_p{idx}")
    return tmp.select(
        "vec_id",
        *[
            F.round(F.col(f"_p{i}") * 1e6)
            .cast("bigint")
            .alias(f"pc{i}_micro")
            for i in range(1, len(components) + 1)
        ],
        F.round(F.sqrt(F.greatest(resid_sq, F.lit(0.0))) * 1e6)
        .cast("bigint")
        .alias("resid_micro"),
    )
