"""Multi-dimensional data layout (Z-order / Morton clustering) for
min-max file skipping.

At 100 TB the cheapest query is the one that never reads the file.
Parquet footers carry per-column min/max; a range-partitioned write
sorted on ONE column makes those stats selective for that column only —
a filter on any other column still scans every file. Interleaving the
bits of several columns into one Morton key and range-partitioning on
the key bounds every file to a small hyper-rectangle of the key space,
so min/max stats become selective for EVERY participating column at
once (the Delta Lake / Iceberg ``OPTIMIZE ZORDER BY`` layout, done here
with plain DataFrame ops).

Everything is codegen arithmetic — the bit-spread uses the standard
mask-shift ladder (no UDF, no driver loop over rows), the scale bounds
come from one tiny min/max aggregate joined back in-plan (no collect),
and the clustered write is ``repartitionByRange`` + partition-local sort
(one exchange, the same cost as any other clustered write).

Measured effect (tests/test_layout.py, file-level min/max pruning on the
events table): linear sort prunes ~94% of files on its leading column
and 0% on the second; the Z-order layout prunes >60% on BOTH columns.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

# Mask-shift ladder: spread the low 32 bits of x so bit i lands at 2i.
_SPREAD2 = (
    (16, 0x0000FFFF0000FFFF),
    (8, 0x00FF00FF00FF00FF),
    (4, 0x0F0F0F0F0F0F0F0F),
    (2, 0x3333333333333333),
    (1, 0x5555555555555555),
)


def spread_bits2(col: Column) -> Column:
    """Spread a ≤32-bit non-negative long so bit i moves to bit 2i
    (codegen-only: shiftleft/AND ladder)."""
    x = col.cast("long")
    for shift, mask in _SPREAD2:
        x = (x.bitwiseOR(F.shiftleft(x, shift))).bitwiseAND(F.lit(mask))
    return x


def scale_to_grid(col: Column, lo: Column, hi: Column, bits: int) -> Column:
    """Linearly scale ``col`` from [lo, hi] onto the 2^bits integer grid.

    Integer-safe: works in double for the ratio, clamps to the grid so
    hi maps to 2^bits - 1 (not 2^bits, which would overflow the grid).
    """
    n = (1 << bits) - 1
    span = (hi - lo).cast("double")
    frac = F.when(span > 0, (col - lo).cast("double") / span).otherwise(F.lit(0.0))
    return F.least(
        F.greatest(F.floor(frac * F.lit(n + 1)).cast("long"), F.lit(0)),
        F.lit(n),
    )


def zorder_key2(x: Column, y: Column) -> Column:
    """Morton-interleave two grid coordinates (≤16 bits each for a key
    that stays well inside a signed 64-bit long): bit i of ``x`` lands at
    2i+1, bit i of ``y`` at 2i."""
    return F.shiftleft(spread_bits2(x), 1).bitwiseOR(spread_bits2(y))


def zorder_key(cols: list[Column], bits: int = 16) -> Column:
    """Morton key over any number of grid coordinates.

    Two columns take the mask-ladder fast path; n>2 builds the generic
    bit-gather expression (bits·n codegen terms — still one projection,
    no shuffle, no Python)."""
    if len(cols) == 2 and bits <= 16:
        return zorder_key2(cols[0], cols[1])
    n = len(cols)
    key = F.lit(0).cast("long")
    for i in range(bits):
        for j, c in enumerate(cols):
            bit = F.shiftright(c.cast("long"), i).bitwiseAND(F.lit(1))
            key = key.bitwiseOR(F.shiftleft(bit, i * n + (n - 1 - j)))
    return key


def with_zorder_key(
    df: DataFrame, cols: list[str], bits: int = 16, key_col: str = "zkey"
) -> DataFrame:
    """Append a Morton key over ``cols`` scaled by their own min/max.

    The bounds come from one scalar aggregate cross-joined back
    (broadcast of a single row — no collect, no second pass over data
    beyond the tiny agg)."""
    aggs = []
    for c in cols:
        aggs += [
            F.min(c).cast("long").alias(f"__lo_{c}"),
            F.max(c).cast("long").alias(f"__hi_{c}"),
        ]
    bounds = df.agg(*aggs)
    joined = df.crossJoin(F.broadcast(bounds))
    grid = [
        scale_to_grid(
            F.col(c).cast("long"),
            F.col(f"__lo_{c}"),
            F.col(f"__hi_{c}"),
            bits,
        )
        for c in cols
    ]
    return joined.withColumn(key_col, zorder_key(grid, bits)).drop(
        *[f"__lo_{c}" for c in cols], *[f"__hi_{c}" for c in cols]
    )


def write_zordered(
    df: DataFrame,
    path: str,
    cols: list[str],
    n_files: int,
    bits: int = 16,
) -> None:
    """Cluster ``df`` on the Morton key of ``cols`` and write ``n_files``
    parquet files, each covering a compact key range (range partition +
    partition-local sort — exactly one exchange; the key itself is
    dropped from the files)."""
    keyed = with_zorder_key(df, cols, bits)
    (
        keyed.repartitionByRange(n_files, "zkey")
        .sortWithinPartitions("zkey")
        .drop("zkey")
        .write.mode("overwrite")
        .parquet(path)
    )


def write_linear(df: DataFrame, path: str, col: str, n_files: int) -> None:
    """Baseline layout: range-clustered on a single column."""
    (
        df.repartitionByRange(n_files, col)
        .sortWithinPartitions(col)
        .write.mode("overwrite")
        .parquet(path)
    )


def file_pruning_fraction(path: str, col: str, lo, hi) -> float:
    """Fraction of parquet files a ``col BETWEEN lo AND hi`` scan can
    skip on footer min/max alone (file-level skipping — the unit that
    matters on object storage). Driver-side metadata read only; data
    pages are never touched."""
    import pyarrow.dataset as ds

    dataset = ds.dataset(path, format="parquet")
    total = skipped = 0
    for frag in dataset.get_fragments():
        mins, maxs = [], []
        md = frag.metadata
        schema_names = [md.row_group(0).column(i).path_in_schema
                        for i in range(md.num_columns)]
        ci = schema_names.index(col)
        for rg in range(md.num_row_groups):
            stats = md.row_group(rg).column(ci).statistics
            if stats is None or not stats.has_min_max:
                mins, maxs = None, None
                break
            mins.append(stats.min)
            maxs.append(stats.max)
        total += 1
        if mins is not None and (max(maxs) < lo or min(mins) > hi):
            skipped += 1
    return skipped / total if total else 0.0


# ── Hilbert curve key (round 6) ────────────────────────────────────────
#
# Z-order's weakness is the "seam jump": consecutive Morton codes can
# be far apart in space (the key wraps across quadrant boundaries), so
# a file holding a key range can still span a wide hyper-rectangle.
# The Hilbert curve is the locality-optimal space-filling curve —
# consecutive keys are ALWAYS adjacent cells — which tightens per-file
# bounding boxes and improves min/max pruning on range predicates
# (Iceberg and Databricks "liquid clustering" both offer Hilbert for
# exactly this reason).
#
# The xy2d walk (Wikipedia formulation) is a 12-step fold over the
# halving quadrant size s, with state (d, x, y). The state is packed
# into ONE BIGINT — d·2²⁶ + x·2¹³ + y (12-bit grid → d < 2²⁴,
# x,y < 2¹²) — because the portable fold needs accumulator type ==
# element type in DuckDB's list_reduce, and DuckDB 1.0.0 miscomputes
# struct lambdas with swap dependencies (see queries/timeseries.py
# _holt_lambda). The XOR in d += s²·((3rx) ^ ry) is replaced by the
# arithmetic identity 3rx + ry − 2·rx·ry (equal on {0,1}²), keeping
# the expression pure +−·/ for both engines. rx/ry/the rotation are
# let-bound via single-element transform() so each decode happens
# once per step.

HILBERT_BITS = 12
_H_N = 1 << HILBERT_BITS          # grid side
_H_CD = 1 << 26                   # d field shift in the packed state
_H_CX = 1 << 13                   # x field shift
_H_M = 1 << 13                    # field modulus


def _hilbert_lambda(flavor: str) -> str:
    """One xy2d step over the packed state. ``flavor`` is 'spark' or
    'duckdb' — identical arithmetic, dialect-specific spellings
    (div vs //, named_struct vs {}, transform vs list_transform,
    0- vs 1-based single-element indexing)."""
    if flavor == "spark":
        div, tr, idx = "div", "transform", "[0]"
        st1 = ("named_struct('d', a {div} {CD}, 'x', (a {div} {CX}) % {M},"
               " 'y', a % {M}, 's', s)")
        st2 = ("named_struct('d', v.d, 'x', v.x, 'y', v.y, 's', v.s,"
               " 'rx', CASE WHEN (v.x & v.s) > 0 THEN 1L ELSE 0L END,"
               " 'ry', CASE WHEN (v.y & v.s) > 0 THEN 1L ELSE 0L END)")
        arr = "array({x})"
    else:
        div, tr, idx = "//", "list_transform", "[1]"
        st1 = ("{{'d': a {div} {CD}, 'x': (a {div} {CX}) % {M},"
               " 'y': a % {M}, 's': s}}")
        st2 = ("{'d': v.d, 'x': v.x, 'y': v.y, 's': v.s,"
               " 'rx': CASE WHEN (v.x & v.s) > 0 THEN 1 ELSE 0 END,"
               " 'ry': CASE WHEN (v.y & v.s) > 0 THEN 1 ELSE 0 END}")
        arr = "[{x}]"
    st1 = st1.format(div=div, CD=_H_CD, CX=_H_CX, M=_H_M)
    body = (
        f"(w.d + w.s * w.s * (3 * w.rx + w.ry - 2 * w.rx * w.ry)) * {_H_CD}"
        f" + (CASE WHEN w.ry = 0 THEN (CASE WHEN w.rx = 1"
        f" THEN {_H_N - 1} - w.y ELSE w.y END) ELSE w.x END) * {_H_CX}"
        f" + (CASE WHEN w.ry = 0 THEN (CASE WHEN w.rx = 1"
        f" THEN {_H_N - 1} - w.x ELSE w.x END) ELSE w.y END)"
    )
    return (
        f"(a, s) -> {tr}({arr.format(x=st1)},"
        f" v -> {tr}({arr.format(x=st2)}, w -> {body}){idx}){idx}"
    )


def _hilbert_svals(flavor: str) -> str:
    s = ", ".join(
        (f"{1 << i}L" if flavor == "spark" else f"CAST({1 << i} AS BIGINT)")
        for i in range(HILBERT_BITS - 1, -1, -1)
    )
    return f"array({s})" if flavor == "spark" else f"[{s}]"


def hilbert_key_sql(x: str, y: str, flavor: str) -> str:
    """Full xy2d expression over two {HILBERT_BITS}-bit grid coordinate
    expressions, in either dialect."""
    fold = "aggregate" if flavor == "spark" else "list_reduce"
    init = f"(CAST({x} AS BIGINT) * {_H_CX} + CAST({y} AS BIGINT))"
    if flavor == "spark":
        return (
            f"aggregate({_hilbert_svals(flavor)}, {init},"
            f" {_hilbert_lambda(flavor)}) div {_H_CD}"
        )
    return (
        f"list_reduce(list_prepend({init}, {_hilbert_svals(flavor)}),"
        f" {_hilbert_lambda(flavor)}) // {_H_CD}"
    )


def with_hilbert_key(
    df: DataFrame, cols: list[str], key_col: str = "hkey",
    engine: str = "arrow",
) -> DataFrame:
    """Append a Hilbert clustering key over exactly two columns scaled
    by their own min/max onto the {HILBERT_BITS}-bit grid — the
    locality-optimal alternative to :func:`with_zorder_key` (same
    bounds discipline: one scalar agg broadcast back, no collect).

    ``engine='arrow'`` (default) runs the 12-step xy2d walk as
    vectorized int64 numpy over Arrow batches; ``'sql'`` keeps the
    packed-BIGINT expression fold. The walk is pure integer arithmetic
    — both engines produce byte-identical keys (asserted in
    test_layout/test_round6_ops2 and the r9 prototype diff) — but the
    HOF fold builds two nested structs per bit per row in interpreted
    expression eval, measured 1.88 s vs 0.44 s at sf0.1 (guide §4.2:
    hand whole batches to vectorized native code). Same justified-UDF
    precedent as byte_bucket_sums; map-only, partition-parallel.
    NULL input coordinates map to grid cell 0 on BOTH engines
    (scale_to_grid clamps; greatest() skips nulls — asserted
    cross-engine in test_layout), and the arrow walk additionally
    NULL-masks defensively for direct callers (ADVICE r9). Note for
    pre-r9 callers: the default engine changed from 'sql' to 'arrow'
    in round 9; pass ``engine='sql'`` to keep the expression fold."""
    assert len(cols) == 2, "Hilbert key is 2-D (use zorder for n-D)"
    aggs = []
    for c in cols:
        aggs += [
            F.min(c).cast("long").alias(f"__lo_{c}"),
            F.max(c).cast("long").alias(f"__hi_{c}"),
        ]
    joined = df.crossJoin(F.broadcast(df.agg(*aggs)))
    gx, gy = [
        scale_to_grid(
            F.col(c).cast("long"),
            F.col(f"__lo_{c}"),
            F.col(f"__hi_{c}"),
            HILBERT_BITS,
        )
        for c in cols
    ]
    base = joined.withColumn("__gx", gx).withColumn("__gy", gy).drop(
        *[f"__lo_{c}" for c in cols], *[f"__hi_{c}" for c in cols]
    )
    if engine == "sql":
        return (
            base.withColumn(
                key_col,
                F.expr(hilbert_key_sql("__gx", "__gy", "spark"))
                .cast("long"),
            )
            .drop("__gx", "__gy")
        )
    return _hilbert_key_arrow(base, key_col)


def _hilbert_key_arrow(base: DataFrame, key_col: str) -> DataFrame:
    """xy2d over (__gx, __gy) as vectorized int64 numpy (mapInPandas);
    emits the input columns minus the grids plus ``key_col``. Exactly
    the packed-fold recurrence: d += s²·(3rx + ry − 2rx·ry) per bit,
    with the (rx, ry) rotation applied to the grid coords."""
    from pyspark.sql import types as T

    in_cols = [c for c in base.columns if c not in ("__gx", "__gy")]
    schema = T.StructType(
        [base.schema[c] for c in in_cols]
        + [T.StructField(key_col, T.LongType(), True)]
    )
    n = 1 << HILBERT_BITS

    def run(batches):
        import numpy as np
        import pandas as pd

        for pdf in batches:
            # Defensive NULL handling (ADVICE r9): through
            # with_hilbert_key nulls never reach here — scale_to_grid
            # clamps a NULL input to grid 0 on both engines (greatest()
            # skips nulls) — but a DIRECT caller passing nullable grid
            # coords would crash to_numpy(dtype=int64). Mask to a NULL
            # key instead; the no-null fast path stays plain int64.
            na = pdf["__gx"].isna() | pdf["__gy"].isna()
            has_na = bool(na.any())
            x = (pdf["__gx"].fillna(0) if has_na else pdf["__gx"]).to_numpy(
                dtype="int64"
            )
            y = (pdf["__gy"].fillna(0) if has_na else pdf["__gy"]).to_numpy(
                dtype="int64"
            )
            d = np.zeros(len(x), dtype="int64")
            for i in range(HILBERT_BITS - 1, -1, -1):
                s = 1 << i
                rx = ((x & s) > 0).astype("int64")
                ry = ((y & s) > 0).astype("int64")
                d += s * s * (3 * rx + ry - 2 * rx * ry)
                nx = np.where(ry == 0, np.where(rx == 1, n - 1 - y, y), x)
                ny = np.where(ry == 0, np.where(rx == 1, n - 1 - x, x), y)
                x, y = nx, ny
            out = pdf[in_cols].copy()
            if has_na:
                key = pd.array(d, dtype="Int64")
                key[na.to_numpy()] = pd.NA
                out[key_col] = key
            else:
                out[key_col] = d
            yield out

    return base.mapInPandas(run, schema=schema)
