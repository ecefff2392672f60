"""Similarity search over embedding columns (``array<float>``).

Two tiers, same contract (query vectors × corpus → top-k neighbors):

- ``brute_force_topk``  — exact cosine; the correctness baseline. One
  broadcast of the query set, one codegen'd map over the corpus, top-k
  via rank-window (per-query heaps; no global sort).
- ``lsh_topk``          — random-hyperplane LSH (signed projections →
  bucket join) for the 100 TB path: candidates only from matching
  buckets, exact re-scoring on candidates. Recall < 1 by design;
  multi-probe via ``n_tables`` independent hash tables.

Hyperplanes are generated deterministically (seeded) on the driver as
literal arrays — tiny (n_tables × n_bits × dim floats), broadcast with
the plan; no driver-side data loops.

Distributed top-k background: candidate pruning before exact scoring is
the standard scale approach in the literature (e.g. "Incremental Based
Framework for Efficient Top-K Similarity Search", EDBT 2020; REPOSE's
reference-point pruning for distributed trajectory top-k, ICDE 2021 —
see PAPERS.md); hyperplane LSH is the embedding-space instance of the
same candidate-then-verify shape.
"""

from __future__ import annotations

import random

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from rust_cdc_spark.functions import vectors as V


def brute_force_topk(
    corpus: DataFrame,
    queries: DataFrame,
    k: int = 10,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    qid_col: str = "query_id",
    qvec_col: str = "qv",
    exclude_self: bool = False,
) -> DataFrame:
    """Exact top-k cosine neighbors for every query vector.

    ``queries`` is expected to be small (a probe batch) → broadcast;
    the corpus is scanned once, scored in codegen, and reduced per query
    with a rank window. ``exclude_self`` drops corpus rows whose id
    equals the query id *before* ranking. Returns
    (query_id, vec_id, cos_sim, rank).
    """
    scored = corpus.crossJoin(F.broadcast(queries)).select(
        F.col(qid_col).alias("query_id"),
        F.col(id_col).alias("vec_id"),
        F.round(V.cosine(F.col(vec_col), F.col(qvec_col)), 4).alias("cos_sim"),
    )
    if exclude_self:
        scored = scored.filter(F.col("query_id") != F.col("vec_id"))
    w = Window.partitionBy("query_id").orderBy(
        F.col("cos_sim").desc(), F.col("vec_id")
    )
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
    )


def _hyperplanes(dim: int, n_bits: int, n_tables: int, seed: int = 42):
    rng = random.Random(seed)
    return [
        [[rng.gauss(0.0, 1.0) for _ in range(dim)] for _ in range(n_bits)]
        for _ in range(n_tables)
    ]


def _bucket_col(vec, planes) -> F.Column:
    """Sign-bit bucket id for one hash table: bit i = (vec · plane_i) > 0."""
    bits = [
        F.when(
            V.dot(vec, F.array(*[F.lit(x) for x in plane])) > 0, F.lit(1 << i)
        ).otherwise(F.lit(0))
        for i, plane in enumerate(planes)
    ]
    acc = bits[0]
    for b in bits[1:]:
        acc = acc + b
    return acc


def lsh_topk(
    corpus: DataFrame,
    queries: DataFrame,
    dim: int,
    k: int = 10,
    n_bits: int = 8,
    n_tables: int = 4,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    qid_col: str = "query_id",
    qvec_col: str = "qv",
    seed: int = 42,
) -> DataFrame:
    """Approximate top-k: random-hyperplane LSH candidate generation +
    exact cosine re-scoring. Corpus is bucketed once per table
    (n_tables narrow maps); the join is bucket-equi — at 100 TB each
    query touches ~corpus/2^n_bits rows per table instead of everything.
    """
    planes = _hyperplanes(dim, n_bits, n_tables, seed)
    c_bucketed = corpus.select(
        F.col(id_col).alias("vec_id"),
        F.col(vec_col).alias("cv"),
        F.explode(
            F.array(*[
                F.struct(
                    F.lit(t).alias("table_id"),
                    _bucket_col(F.col(vec_col), planes[t]).alias("bucket"),
                )
                for t in range(n_tables)
            ])
        ).alias("h"),
    ).select("vec_id", "cv", "h.table_id", "h.bucket")
    q_bucketed = queries.select(
        F.col(qid_col).alias("query_id"),
        F.col(qvec_col).alias("qv"),
        F.explode(
            F.array(*[
                F.struct(
                    F.lit(t).alias("table_id"),
                    _bucket_col(F.col(qvec_col), planes[t]).alias("bucket"),
                )
                for t in range(n_tables)
            ])
        ).alias("h"),
    ).select("query_id", "qv", "h.table_id", "h.bucket")
    candidates = (
        c_bucketed.join(F.broadcast(q_bucketed), on=["table_id", "bucket"])
        .select("query_id", "vec_id", "qv", "cv")
        .dropDuplicates(["query_id", "vec_id"])
    )
    scored = candidates.select(
        "query_id",
        "vec_id",
        F.round(V.cosine(F.col("cv"), F.col("qv")), 4).alias("cos_sim"),
    )
    w = Window.partitionBy("query_id").orderBy(
        F.col("cos_sim").desc(), F.col("vec_id")
    )
    return scored.withColumn("rank", F.row_number().over(w)).filter(
        F.col("rank") <= k
    )


def embedding_near_dup_pairs(
    corpus: DataFrame,
    threshold: float = 0.95,
    n_bits: int = 8,
    n_tables: int = 4,
    dim: int = 64,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    seed: int = 42,
) -> DataFrame:
    """Embedding-cosine near-duplicate pairs (cos ≥ threshold) via the
    same hyperplane-LSH bucketing, self-joined. Returns
    (vec_a, vec_b, cos_sim)."""
    planes = _hyperplanes(dim, n_bits, n_tables, seed)
    bucketed = corpus.select(
        F.col(id_col).alias("vec_id"),
        F.col(vec_col).alias("v"),
        F.explode(
            F.array(*[
                F.struct(
                    F.lit(t).alias("table_id"),
                    _bucket_col(F.col(vec_col), planes[t]).alias("bucket"),
                )
                for t in range(n_tables)
            ])
        ).alias("h"),
    ).select("vec_id", "v", "h.table_id", "h.bucket")
    a, b = bucketed.alias("a"), bucketed.alias("b")
    return (
        a.join(b, on=["table_id", "bucket"])
        .filter(F.col("a.vec_id") < F.col("b.vec_id"))
        .select(
            F.col("a.vec_id").alias("vec_a"),
            F.col("b.vec_id").alias("vec_b"),
            F.round(V.cosine(F.col("a.v"), F.col("b.v")), 4).alias("cos_sim"),
        )
        .dropDuplicates(["vec_a", "vec_b"])
        .filter(F.col("cos_sim") >= threshold)
    )
