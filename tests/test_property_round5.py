"""Property-based tests for round-5 operators (hypothesis).

- exact_global_ntile vs Spark's own global NTILE window on random data
  and bucket counts — the distributed decomposition must be
  value-identical to the single-partition formulation it replaces.
- exact_near_dup_pairs_blocked vs the naive per-pair baseline on random
  vectors, thresholds, and block counts — blocking/orientation must
  never drop, duplicate, or misorder a pair.
"""

from __future__ import annotations

import math

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st
from pyspark.sql import functions as F
from pyspark.sql import types as T

from rust_cdc_spark.operators import similarity as SIM
from rust_cdc_spark.operators.ranks import exact_global_ntile

_SETTINGS = settings(
    max_examples=12,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)


@st.composite
def keyed_rows(draw):
    n = draw(st.integers(min_value=1, max_value=60))
    # deliberately duplicate-heavy keys: ntile exactness under ties is
    # exactly what the unique tie-break column must guarantee
    return [
        (i, draw(st.integers(min_value=0, max_value=7)))
        for i in range(n)
    ]


@_SETTINGS
@given(rows=keyed_rows(), b=st.integers(min_value=1, max_value=7))
def test_exact_global_ntile_equals_sql_ntile(spark, rows, b):
    df = spark.createDataFrame(rows, ["id", "k"])
    got = {
        r.id: r.bucket
        for r in exact_global_ntile(
            df, [F.col("k"), F.col("id")], b, "bucket"
        ).collect()
    }
    want_rows = sorted(rows, key=lambda t: (t[1], t[0]))
    n = len(want_rows)
    q, rem = divmod(n, b)
    want = {}
    pos = 0
    for bucket in range(1, b + 1):
        size = q + (1 if bucket <= rem else 0)
        for _ in range(size):
            if pos < n:
                want[want_rows[pos][0]] = bucket
                pos += 1
    assert got == want


@st.composite
def corpora(draw):
    n = draw(st.integers(min_value=2, max_value=40))
    dim = draw(st.sampled_from([3, 8]))
    vecs = [
        (
            i,
            [
                draw(
                    st.floats(
                        min_value=-1,
                        max_value=1,
                        allow_nan=False,
                        width=32,
                    )
                )
                for _ in range(dim)
            ],
        )
        for i in range(n)
    ]
    # zero vectors make cosine undefined — nudge them
    vecs = [
        (i, v if any(abs(x) > 1e-6 for x in v) else [1.0] + v[1:])
        for i, v in vecs
    ]
    return vecs


@_SETTINGS
@given(
    vecs=corpora(),
    threshold=st.sampled_from([-0.5, 0.0, 0.3, 0.8]),
    n_blocks=st.integers(min_value=1, max_value=6),
)
def test_blocked_exact_pairs_equals_naive(spark, vecs, threshold, n_blocks):
    import numpy as np

    emb = spark.createDataFrame(
        vecs,
        T.StructType(
            [
                T.StructField("vec_id", T.LongType()),
                T.StructField("embedding", T.ArrayType(T.FloatType())),
            ]
        ),
    )
    got = {
        (r.vec_a, r.vec_b): r.cos_sim
        for r in SIM.exact_near_dup_pairs_blocked(
            emb, threshold=threshold, n_blocks=n_blocks
        ).collect()
    }
    q = {
        i: np.array(v, dtype=np.float32).astype(np.float64)
        for i, v in vecs
    }
    all_cos = {}
    for i in q:
        for j in q:
            if i >= j:
                continue
            all_cos[(i, j)] = float(
                q[i] @ q[j] / (np.linalg.norm(q[i]) * np.linalg.norm(q[j]))
            )
    # Pair-set parity away from the threshold BOUNDARY (no drops, no
    # dupes, right orientation). A pair whose true cosine sits within
    # ~1 ulp of the threshold can legitimately land on either side:
    # the blocked path normalizes then GEMMs while this oracle divides
    # the raw dot by the norm product, and the two roundings differ in
    # the last place (hypothesis found cos = -1e-38 vs threshold 0.0).
    # EPS bounds that reordering error; it is a float-arithmetic fact,
    # not implementation slack.
    eps = 1e-9
    must = {k for k, v in all_cos.items() if v >= threshold + eps}
    forbidden = {k for k, v in all_cos.items() if v < threshold - eps}
    assert must <= set(got), must - set(got)
    assert not (forbidden & set(got)), forbidden & set(got)
    for k in got:
        assert k in all_cos  # genuine unordered pair, a < b
        v = all_cos[k]
        assert v >= threshold - eps, (k, v)
        assert math.isclose(got[k], round(v, 4), abs_tol=2e-4), (k, got[k], v)
