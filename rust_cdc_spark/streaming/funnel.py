"""Streaming conversion funnel: per-user stage progression as arbitrary
stateful processing.

The batch funnel (`events_funnel_conversion`) finds users whose
signup → click → purchase stages occur in event-time order by joining
per-stage min-aggregations. Streaming can't wait for the full log; this
operator tracks each user's furthest in-order stage with
``applyInPandasWithState`` (same primitive as
streaming/txn_assembly.py) and emits exactly one record per user —
when the final stage completes (converted) or when the state times out
with no progress (abandoned — emitted so downstream conversion-rate
aggregates count the denominator).

State per user: (next stage index, per-stage first event-times) —
bytes, partitioned by user across executors; scales with ACTIVE users,
not history. Out-of-order arrivals inside a microbatch are handled by
sorting the batch slice on event time; cross-batch regressions (a stage
arriving after a later stage already advanced the cursor) are ignored,
matching the batch semantics of "ordered min timestamps".
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql import types as T
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

FUNNEL_SCHEMA = T.StructType(
    [
        T.StructField("user_id", T.LongType()),
        T.StructField("stages_hit", T.IntegerType()),
        T.StructField("converted", T.BooleanType()),
        T.StructField("first_ts", T.DoubleType()),
        T.StructField("last_ts", T.DoubleType()),
    ]
)

STATE_SCHEMA = T.StructType(
    [
        T.StructField("next_stage", T.IntegerType()),
        T.StructField("first_ts", T.DoubleType()),
        T.StructField("last_ts", T.DoubleType()),
    ]
)


def funnel_stream(
    events: DataFrame,
    stages: list[str],
    user_col: str = "user_id",
    ts_col: str = "ts",
    type_col: str = "event_type",
    timeout_ms: int = 60_000,
) -> DataFrame:
    """events stream → one row per finished funnel journey.

    ``stages`` is the ordered stage list (e.g. ["signup", "click",
    "purchase"]). Emits (user_id, stages_hit, converted, first_ts,
    last_ts) when the last stage is reached or the user times out."""
    n_stages = len(stages)
    stage_idx = {s: i for i, s in enumerate(stages)}

    def step(
        key: tuple, pdfs: Iterator[pd.DataFrame], state: GroupState
    ) -> Iterator[pd.DataFrame]:
        (user,) = key
        if state.hasTimedOut:
            next_stage, first_ts, last_ts = state.get
            state.remove()
            yield pd.DataFrame(
                [{
                    "user_id": user, "stages_hit": int(next_stage),
                    "converted": False, "first_ts": first_ts,
                    "last_ts": last_ts,
                }]
            )
            return
        next_stage, first_ts, last_ts = (
            state.get if state.exists else (0, None, None)
        )
        frames = list(pdfs)
        if frames:  # pd.concat raises on an empty iterator — and state
            # maintenance can invoke a group with no new rows
            rows = pd.concat(frames, ignore_index=True)
            rows["stage_i"] = rows[type_col].map(stage_idx)
            rows = rows.dropna(subset=["stage_i"]).sort_values(ts_col)
        else:
            rows = pd.DataFrame({ts_col: [], "stage_i": []})
        for ts, stage_i in zip(rows[ts_col], rows["stage_i"]):
            ts = ts.timestamp() if hasattr(ts, "timestamp") else float(ts)
            if int(stage_i) == next_stage:
                next_stage += 1
                first_ts = ts if first_ts is None else first_ts
                last_ts = ts
                if next_stage == n_stages:
                    state.remove() if state.exists else None
                    yield pd.DataFrame(
                        [{
                            "user_id": user, "stages_hit": n_stages,
                            "converted": True, "first_ts": first_ts,
                            "last_ts": last_ts,
                        }]
                    )
                    return
        state.update((int(next_stage), first_ts, last_ts))
        state.setTimeoutDuration(timeout_ms)
        # always yield a (typed, empty) frame — the Arrow state protocol
        # expects every group invocation to produce a batch (see
        # txn_assembly, which established the idiom)
        yield pd.DataFrame(
            {
                "user_id": pd.Series([], dtype="int64"),
                "stages_hit": pd.Series([], dtype="int32"),
                "converted": pd.Series([], dtype=bool),
                "first_ts": pd.Series([], dtype="float64"),
                "last_ts": pd.Series([], dtype="float64"),
            }
        )

    return (
        events.groupBy(user_col)
        .applyInPandasWithState(
            step,
            outputStructType=FUNNEL_SCHEMA,
            stateStructType=STATE_SCHEMA,
            outputMode="append",
            timeoutConf=GroupStateTimeout.ProcessingTimeTimeout,
        )
    )
