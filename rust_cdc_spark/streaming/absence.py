"""Streaming absence detection: "A happened and B did NOT follow within
W" — the stateful twin of the batch `events_abandoned_views` anti-join.

A CEP-style negative pattern cannot be a join (the interesting case is
the row that never arrives), so it runs as arbitrary stateful
processing (``applyInPandasWithState`` — same primitive and idioms as
streaming/funnel.py and streaming/txn_assembly.py): per user, pending
trigger timestamps wait for a follow-up; a follow-up inside the window
emits a matched row with its latency, event-time expiry (relative to
the user's latest seen event) emits an abandoned row in-band, and a
processing-time timeout flushes whatever is still pending when the
user goes quiet (the "no more data will save you" case).

State per user: the pending trigger timestamps only — bytes, scaling
with a user's concurrent unmatched triggers (human-bounded), never
with history. Partitioned by user across executors; runs on the
RocksDB state store when `use_rocksdb_state_store` is set.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql import types as T
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

ABSENCE_SCHEMA = T.StructType(
    [
        T.StructField("user_id", T.LongType()),
        T.StructField("trigger_ts", T.DoubleType()),
        T.StructField("followed", T.BooleanType()),
        T.StructField("latency_s", T.DoubleType()),
    ]
)

_STATE_SCHEMA = T.StructType(
    [T.StructField("pending", T.ArrayType(T.DoubleType()))]
)


def absence_stream(
    events: DataFrame,
    trigger: str,
    followup: str,
    window_s: float = 3600.0,
    user_col: str = "user_id",
    ts_col: str = "ts",
    type_col: str = "event_type",
    timeout_ms: int = 60_000,
) -> DataFrame:
    """events stream → one row per trigger event: (user_id, trigger_ts,
    followed, latency_s). ``followed`` is True when a ``followup``
    event for the same user lands in (trigger_ts, trigger_ts +
    window_s]; False rows surface on event-time expiry or on the
    inactivity timeout."""

    def _empty() -> pd.DataFrame:
        return pd.DataFrame(
            {
                "user_id": pd.Series([], dtype="int64"),
                "trigger_ts": pd.Series([], dtype="float64"),
                "followed": pd.Series([], dtype=bool),
                "latency_s": pd.Series([], dtype="float64"),
            }
        )

    def step(
        key: tuple, pdfs: Iterator[pd.DataFrame], state: GroupState
    ) -> Iterator[pd.DataFrame]:
        (user,) = key
        if state.hasTimedOut:
            (pending,) = state.get
            state.remove()
            if pending:
                yield pd.DataFrame(
                    [
                        {"user_id": user, "trigger_ts": t,
                         "followed": False, "latency_s": None}
                        for t in sorted(pending)
                    ]
                )
            else:
                yield _empty()
            return
        (pending,) = state.get if state.exists else ([],)
        pending = list(pending or [])
        frames = list(pdfs)
        out: list[dict] = []
        if frames:
            rows = pd.concat(frames, ignore_index=True)
            rows = rows.sort_values(ts_col)
            hi = None
            for ts, etype in zip(rows[ts_col], rows[type_col]):
                ts = ts.timestamp() if hasattr(ts, "timestamp") else float(ts)
                hi = ts if hi is None or ts > hi else hi
                if etype == trigger:
                    pending.append(ts)
                elif etype == followup:
                    matched = [
                        t for t in pending if t < ts <= t + window_s
                    ]
                    for t in sorted(matched):
                        out.append({
                            "user_id": user, "trigger_ts": t,
                            "followed": True, "latency_s": ts - t,
                        })
                    pending = [t for t in pending if t not in matched]
            # event-time expiry IN-BAND: a pending trigger whose window
            # closed before the newest event this user produced can
            # never be matched (per-user event-time is monotone enough
            # for the batch slice — late strays inside the slice were
            # handled by the sort)
            if hi is not None:
                expired = [t for t in pending if t + window_s < hi]
                for t in sorted(expired):
                    out.append({
                        "user_id": user, "trigger_ts": t,
                        "followed": False, "latency_s": None,
                    })
                pending = [t for t in pending if t + window_s >= hi]
        if pending:
            state.update((pending,))
            state.setTimeoutDuration(timeout_ms)
        elif state.exists:
            state.remove()
        yield pd.DataFrame(out) if out else _empty()

    return events.groupBy(user_col).applyInPandasWithState(
        step,
        outputStructType=ABSENCE_SCHEMA,
        stateStructType=_STATE_SCHEMA,
        outputMode="append",
        timeoutConf=GroupStateTimeout.ProcessingTimeTimeout,
    )
