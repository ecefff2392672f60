"""Vector math over ``array<float>`` embedding columns.

Pure ``pyspark.sql.functions`` higher-order functions (zip_with +
aggregate) — JVM-side, codegen'd, no Python round-trip. Computation is
done in DOUBLE regardless of storage type so results are stable and match
the DuckDB oracle bit-for-bit after rounding.

At 100 TB scale these are map-only expressions; the expensive part of
similarity search is the pairing strategy (see operators/similarity.py),
not the arithmetic.
"""

from __future__ import annotations

import math

from pyspark.sql import Column
from pyspark.sql import functions as F


def _d(v: Column) -> Column:
    return F.transform(v, lambda x: x.cast("double"))


def dot(a: Column, b: Column) -> Column:
    return F.aggregate(
        F.zip_with(_d(a), _d(b), lambda x, y: x * y),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )


def norm(a: Column) -> Column:
    return F.sqrt(
        F.aggregate(_d(a), F.lit(0.0), lambda acc, x: acc + x * x)
    )


def cosine(a: Column, b: Column) -> Column:
    return dot(a, b) / (norm(a) * norm(b))


def normalized(a: Column) -> Column:
    """Unit-normalized DOUBLE copy of the vector. Pairwise scoring
    should pre-normalize each row ONCE and use :func:`dot_pre` — the
    naive ``cosine(a, b)`` inside a pair join re-evaluates both norms
    (plus the float→double casts) PER PAIR, tripling the per-candidate
    higher-order-function cost; over an O(candidates) join that is the
    dominant term (measured ~4× on the near-dup queries at sf0.1).

    Implementation note: the sum-of-squares is bound ONCE per row as
    the ``aggregate`` accumulator and the normalization happens in the
    aggregate's ``finish`` lambda — a naive
    ``transform(v, x -> x / norm(v))`` would re-evaluate the norm
    aggregate per ELEMENT after Catalyst collapses the projection."""
    d = _d(a)
    return F.aggregate(
        d,
        F.lit(0.0),
        lambda acc, x: acc + x * x,
        lambda s: F.transform(d, lambda x: x / F.sqrt(s)),
    )


def dot_pre(a: Column, b: Column) -> Column:
    """Dot product of two already-DOUBLE (e.g. pre-normalized) vectors —
    skips the element casts :func:`dot` performs."""
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x * y),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )


def l2_distance(a: Column, b: Column) -> Column:
    return F.sqrt(
        F.aggregate(
            F.zip_with(_d(a), _d(b), lambda x, y: (x - y) * (x - y)),
            F.lit(0.0),
            lambda acc, x: acc + x,
        )
    )


def _finite(v) -> float:
    """Literal-safety guard: repr(float) yields 'inf'/'nan', which the
    SQL parser rejects ('infD' is not a literal) — so a NaN sneaking
    into a centroid/hyperplane (e.g. a degenerate k-means cluster)
    would crash at PARSE time with an opaque error. Fail loud at build
    time instead; non-finite model state is always an upstream bug."""
    f = float(v)
    if not math.isfinite(f):
        raise ValueError(
            f"non-finite value {f!r} in a vector literal — refusing to"
            " build an unparseable SQL constant (check for degenerate"
            " clusters / zero-norm divisions upstream)"
        )
    return f


def lit_doubles(values) -> Column:
    """DOUBLE array literal built as ONE parsed SQL expression instead
    of len(values) py4j `F.lit` round-trips. Driver-side plan
    construction of literal-heavy operators (LSH hyperplanes, JL sign
    matrices, k-means centroids) is dominated by py4j call latency —
    measured 1.2 s for 1536 scalar lits vs 18 ms for the equivalent
    parsed string. `repr(float)` is the shortest round-trip form and
    Spark's DOUBLE literal parse is correctly rounded, so values are
    bit-identical to the `F.lit` chain."""
    return F.expr(
        "array(" + ",".join(f"{_finite(v)!r}D" for v in values) + ")"
    )


def lit_longs(values) -> Column:
    """BIGINT array literal as one parsed expression (see
    :func:`lit_doubles`)."""
    return F.expr(
        "array(" + ",".join(f"{int(v)}L" for v in values) + ")"
    )


def lit_matrix(rows) -> Column:
    """Nested DOUBLE array-of-arrays literal as ONE parsed expression.
    Classic PySpark's ``F.lit(list[list[float]])`` expands element-wise
    over py4j (measured: construction time scales with entry count, not
    call count), so centroid/codebook literals cost ~1 ms per element
    to *build*; the parsed string form is ~65× cheaper and yields the
    same correctly-rounded DOUBLE constants."""
    return F.expr(
        "array("
        + ",".join(
            "array(" + ",".join(f"{_finite(v)!r}D" for v in row) + ")"
            for row in rows
        )
        + ")"
    )
