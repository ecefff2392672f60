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


def md5_uniform(id_col: str, salt: str = "", digits: int = 12):
    """Exact uniform in (0, 1] derived from ``md5(salt || id)``.

    The first ``digits`` hex digits form X; u = (X+1) / 16^digits. Each
    term digit/2^(4i) is a dyadic rational (divisor built by bit shift,
    never libm pow) and X+1 < 2^49 fits the double mantissa, so u is
    EXACTLY representable — any engine folding the same digits gets the
    same bits. No hex-parsing builtins needed, so the identical formula
    runs in DuckDB."""
    h = f"md5(concat('{salt}', cast({id_col} as string)))"
    return F.expr(
        f"aggregate(sequence(1, {digits}), cast(0.0 as double),"
        f" (acc, i) -> acc +"
        f" (instr('0123456789abcdef', substr({h}, i, 1)) - 1)"
        f" / cast(shiftleft(1L, 4 * i) as double))"
        f" + 1.0 / cast(shiftleft(1L, {4 * digits}) as double)"
    )


def weighted_sample(
    df: DataFrame,
    weight_col: str,
    k: int,
    id_col: str,
    salt: str = "",
) -> DataFrame:
    """Deterministic weighted sample without replacement (Efraimidis–
    Spirakis A-ES): rank by key = -ln(u)/w ascending and keep the k
    smallest — inclusion probability proportional to ``weight_col``.
    With w = token count this is token-budget-proportional document
    sampling. The key is quantized to integer picounits before ordering
    (with the id as tiebreak) so the selected set is engine-stable.

    Scale shape: the key is a map expression; top-k is
    TakeOrderedAndProject — per-partition heaps, no global sort."""
    u = md5_uniform(id_col, salt)
    key = F.round(-F.log(u) / F.col(weight_col) * 1e12).cast("bigint")
    return (
        df.withColumn("es_key", key)
        .orderBy("es_key", id_col)
        .limit(k)
    )
