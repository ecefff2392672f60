"""Deterministic sampling for training-data curation.

Dataset curation needs samples that are (a) stratified (per language /
source / quality bucket quotas), (b) reproducible run-to-run and
engine-to-engine, and (c) cheap at 100 TB. ``rand()``-based sampling
fails (b) — task retries reshuffle rows and change the sample. Hashing a
stable id gives a deterministic pseudo-random order: ``md5(id)`` is
uniform, so "first n per group by hash" IS a uniform stratified sample,
and any engine reproduces it bit-for-bit (oracle-checked in the
``sample_stratified_documents`` query).

Scale shape: one shuffle on the group key; the rank window prunes to n
rows per group map-side under partial aggregation of the top-k pattern.
For group-free sampling, ``where md5(id) < threshold`` is a map-only
Bernoulli sample with the same determinism.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def stratified_sample(
    df: DataFrame,
    group_cols: list[str],
    n_per_group: int,
    id_col: str,
    salt: str = "",
) -> DataFrame:
    """Deterministic uniform sample of ``n_per_group`` rows per group:
    rank by ``md5(salt || id)`` (id as tiebreak) and keep the first n.
    Change ``salt`` to draw an independent sample."""
    key = F.md5(F.concat(F.lit(salt), F.col(id_col).cast("string")))
    w = Window.partitionBy(*group_cols).orderBy(key, F.col(id_col))
    return (
        df.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= n_per_group)
        .drop("rn")
    )


def hex_threshold(fraction: float) -> str:
    """32-hex-digit threshold such that a uniform md5 digest compares
    lexicographically below it with probability ``fraction``."""
    return format(int(fraction * 16**32), "032x")


def bernoulli_sample(df: DataFrame, fraction: float, id_col: str, salt: str = "") -> DataFrame:
    """Deterministic map-only ~``fraction`` sample: keep rows whose
    ``md5(salt || id)`` sorts below ``hex_threshold(fraction)``. A plain
    string comparison — bit-identical in every engine, no numeric
    conversion of the digest needed."""
    digest = F.md5(F.concat(F.lit(salt), F.col(id_col).cast("string")))
    return df.filter(digest < hex_threshold(fraction))
