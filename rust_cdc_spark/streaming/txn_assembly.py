"""Transaction assembly: group CDC row events into whole commits.

The binlog interleaves row events with transaction markers — GTID opens
a transaction, Xid commits it (reference decode at
/root/reference/src/mysql/event/decode.rs:214-257,98-100; SURVEY.md S9
"Xid ends a microbatch's transaction grouping"). Downstream consumers
often need *whole transactions* (consistency boundaries for audit,
outbox patterns, atomic multi-row apply). This operator assembles them
with Spark's arbitrary-stateful-processing primitive:

    stream.groupBy("gtid").applyInPandasWithState(assemble, ...)

State per gtid: accumulated row ops. Emission: when the TXN (Xid) marker
for that gtid arrives — or on timeout (abandoned/abortless transactions
don't leak state forever; the reference's in-memory buffers have no such
bound). State is partitioned by key across executors — scales with
in-flight transactions, not with history.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql import types as T
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

TXN_SCHEMA = T.StructType(
    [
        T.StructField("gtid", T.StringType()),
        T.StructField("xid", T.LongType()),
        T.StructField("n_ops", T.IntegerType()),
        T.StructField("tables", T.ArrayType(T.StringType())),
        T.StructField("first_pos", T.LongType()),
        T.StructField("last_pos", T.LongType()),
        T.StructField("complete", T.BooleanType()),
    ]
)

STATE_SCHEMA = T.StructType(
    [
        T.StructField("n_ops", T.IntegerType()),
        T.StructField("tables", T.ArrayType(T.StringType())),
        T.StructField("first_pos", T.LongType()),
        T.StructField("last_pos", T.LongType()),
    ]
)


def _assemble(
    key: tuple, pdfs: Iterator[pd.DataFrame], state: GroupState
) -> Iterator[pd.DataFrame]:
    (gtid,) = key
    if state.hasTimedOut:
        n_ops, tables, first_pos, last_pos = state.get
        state.remove()
        yield pd.DataFrame(
            [
                {
                    "gtid": gtid, "xid": None, "n_ops": int(n_ops),
                    "tables": tables, "first_pos": first_pos,
                    "last_pos": last_pos, "complete": False,
                }
            ]
        )
        return

    n_ops, tables, first_pos, last_pos = (
        state.get if state.exists else (0, [], None, None)
    )
    tables = list(tables)
    xid = None
    committed = False
    for pdf in pdfs:
        for row in pdf.itertuples():
            if row.op == "TXN":
                committed = True
                xid = int(row.xid) if row.xid is not None and not pd.isna(row.xid) else None
            else:
                n_ops += 1
                if row.table not in tables:
                    tables.append(row.table)
            pos = int(row.log_pos)
            first_pos = pos if first_pos is None else min(first_pos, pos)
            last_pos = pos if last_pos is None else max(last_pos, pos)

    if committed:
        if state.exists:
            state.remove()
        yield pd.DataFrame(
            [
                {
                    "gtid": gtid, "xid": xid, "n_ops": int(n_ops),
                    "tables": tables, "first_pos": first_pos,
                    "last_pos": last_pos, "complete": True,
                }
            ]
        )
    else:
        state.update((int(n_ops), tables, first_pos, last_pos))
        state.setTimeoutDuration(60_000)  # abandoned-txn sweep
        yield pd.DataFrame(
            {
                "gtid": pd.Series([], dtype=object),
                "xid": pd.Series([], dtype="float64"),
                "n_ops": pd.Series([], dtype="int32"),
                "tables": pd.Series([], dtype=object),
                "first_pos": pd.Series([], dtype="float64"),
                "last_pos": pd.Series([], dtype="float64"),
                "complete": pd.Series([], dtype=bool),
            }
        )


def assemble_transactions(cdc_stream: DataFrame) -> DataFrame:
    """CDC envelope stream → one row per completed transaction
    (gtid, xid, n_ops, tables, offset span). Incomplete transactions
    emit with complete=false after a processing-time timeout."""
    return (
        cdc_stream.filter("gtid IS NOT NULL")
        .select("gtid", "op", "table", "log_pos", "xid")
        .groupBy("gtid")
        .applyInPandasWithState(
            _assemble,
            outputStructType=TXN_SCHEMA,
            stateStructType=STATE_SCHEMA,
            outputMode="append",
            timeoutConf=GroupStateTimeout.ProcessingTimeTimeout,
        )
    )
