"""Property-based CDC semantics tests (hypothesis).

The model under test: the reference's ValueBuffers/IngestProcessor
semantics (/root/reference/src/delta/value_buffer.rs,
/root/reference/src/delta/mod.rs:124-183) — add/overwrite by key,
update = remove(before)+add(after), delete = remove, last writer wins in
log order. A 20-line Python dict simulator states those semantics
directly; hypothesis generates random event streams and checks the
engine's distributed collapse/merge produces the same final state —
including the split-log merge invariant under every random split point.
"""

from __future__ import annotations

import pytest
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st
from pyspark.sql import functions as F

from rust_cdc_spark.operators.collapse import collapse_last_image
from rust_cdc_spark.operators.merge import merge_upsert

KEYS = list(range(6))  # few keys → dense op interleavings per key


@st.composite
def event_streams(draw):
    n = draw(st.integers(min_value=1, max_value=40))
    ops = []
    for pos in range(1, n + 1):
        key = draw(st.sampled_from(KEYS))
        op = draw(st.sampled_from(["I", "U", "D"]))
        val = draw(st.integers(min_value=0, max_value=99))
        ops.append((pos, key, op, val))
    return ops


def simulate(events):
    """The reference's buffer semantics, literally."""
    state: dict[int, int] = {}
    for _pos, key, op, val in sorted(events):
        if op == "D":
            state.pop(key, None)
        else:  # I and U both land as the new image (LWW)
            state[key] = val
    return state


def to_cdc(spark, events):
    df = spark.createDataFrame(events, ["log_pos", "k", "op", "val"])
    img = F.struct(F.col("k"), F.col("val"))
    return df.select(
        "log_pos",
        "op",
        F.when(F.col("op") == "D", img).alias("before"),
        F.when(F.col("op") != "D", img).alias("after"),
    )


@pytest.fixture(scope="module")
def hspark():
    from rust_cdc_spark.session import get_spark

    return get_spark("hypothesis_cdc", cpus=4)


@settings(
    max_examples=15,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture, HealthCheck.too_slow],
)
@given(events=event_streams())
def test_collapse_matches_buffer_semantics(hspark, events):
    cdc = to_cdc(hspark, events).withColumn(
        "k", F.coalesce(F.col("after.k"), F.col("before.k"))
    )
    final = collapse_last_image(cdc, ["k"], keep_deletes=False)
    got = {r["k"]: r["after"]["val"] for r in final.select("k", "after").collect()}
    assert got == simulate(events)


@settings(
    max_examples=10,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture, HealthCheck.too_slow],
)
@given(events=event_streams(), split=st.integers(min_value=0, max_value=40))
def test_split_log_merge_invariant(hspark, events, split):
    """state(prefix) MERGE changes(suffix) == state(whole log) for EVERY
    split point — the exactly-once/resume correctness property."""
    first = [e for e in events if e[0] <= split]
    second = [e for e in events if e[0] > split]
    want = simulate(events)

    first_state = simulate(first)
    target = (
        hspark.createDataFrame(
            [(k, v) for k, v in first_state.items()], "k int, val int"
        )
        if first_state
        else hspark.createDataFrame([], "k int, val int")
    )
    if not second:
        got = {r.k: r.val for r in target.collect()}
    else:
        merged = merge_upsert(target, to_cdc(hspark, second), ["k"])
        got = {r.k: r.val for r in merged.collect()}
    assert got == want


@st.composite
def rotated_streams(draw):
    """Multi-file logs where log_pos RESTARTS at each rotation — the
    real binlog shape that breaks any pos-only ordering."""
    n_files = draw(st.integers(min_value=2, max_value=3))
    events = []
    for f in range(1, n_files + 1):
        n = draw(st.integers(min_value=1, max_value=15))
        for pos in range(4, 4 + n):  # binlogs restart near 4
            key = draw(st.sampled_from(KEYS))
            op = draw(st.sampled_from(["I", "U", "D"]))
            val = draw(st.integers(min_value=0, max_value=99))
            events.append((f"binlog.{f:06d}", pos, key, op, val))
    return events


def simulate_rotated(events):
    state: dict[int, int] = {}
    for _f, _pos, key, op, val in sorted(events):
        if op == "D":
            state.pop(key, None)
        else:
            state[key] = val
    return state


@settings(
    max_examples=12,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture, HealthCheck.too_slow],
)
@given(events=rotated_streams())
def test_collapse_respects_file_rotation(hspark, events):
    """The file-major (log_file, log_pos) composite order must pick the
    truly-latest image even when a later file's positions are smaller
    than an earlier file's."""
    df = hspark.createDataFrame(
        events, ["log_file", "log_pos", "k", "op", "val"]
    )
    img = F.struct(F.col("k"), F.col("val"))
    cdc = df.select(
        "log_file",
        "log_pos",
        "op",
        F.when(F.col("op") == "D", img).alias("before"),
        F.when(F.col("op") != "D", img).alias("after"),
    ).withColumn("k", F.coalesce(F.col("after.k"), F.col("before.k")))
    final = collapse_last_image(cdc, ["k"], keep_deletes=False)
    got = {r["k"]: r["after"]["val"] for r in final.select("k", "after").collect()}
    assert got == simulate_rotated(events)
