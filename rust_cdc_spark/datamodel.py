"""Core data model: the normalized CDC event envelope.

The reference models a binlog stream as ``MysqlEvent { header, payload }``
with a 17-variant payload enum (/root/reference/src/mysql/event/mod.rs:26-123)
and row images as positional value vectors
(/root/reference/src/mysql/event/mod.rs:208-229). The Spark-first design
normalizes all of that into ONE wide CDC row shape — the same shape Delta
CDF / Debezium use — so the whole stream is a single typed DataFrame:

    ts, server_id, log_file, log_pos, gtid, xid,
    database, table, op ∈ {I,U,D,DDL}, before, after, query

``before``/``after`` are per-table structs (typed when the table schema is
known, else a ``map<string,string>`` fallback tolerant of schema drift).
Update rows carry both images; insert only ``after``; delete only
``before`` — exactly the reference's ``RowType::{NewRow, DeletedRow,
UpdatedRow}`` semantics.
"""

from __future__ import annotations

from pyspark.sql import types as T

# Operation codes (reference: OpBody::{Add,Update,Delete,Query},
# /root/reference/src/delta/mod.rs:52-59).
OP_INSERT = "I"
OP_UPDATE = "U"
OP_DELETE = "D"
OP_DDL = "DDL"

ROW_OPS = (OP_INSERT, OP_UPDATE, OP_DELETE)


def cdc_envelope_schema(table_schema: T.StructType | None = None) -> T.StructType:
    """CDC envelope; ``before``/``after`` typed by ``table_schema`` when
    given, else the schema-drift-tolerant map<string,string> fallback.

    Mirrors EventHeaderV4 (/root/reference/src/mysql/event/mod.rs:232-239):
    timestamp/server_id/log_pos, plus GTID & Xid transaction markers
    (decode at /root/reference/src/mysql/event/decode.rs:214-257,98-100).
    """
    image = table_schema or T.MapType(T.StringType(), T.StringType())
    return T.StructType(
        [
            T.StructField("ts", T.TimestampType(), False),
            T.StructField("server_id", T.LongType(), True),
            T.StructField("log_file", T.StringType(), True),
            T.StructField("log_pos", T.LongType(), False),
            T.StructField("gtid", T.StringType(), True),
            T.StructField("xid", T.LongType(), True),
            T.StructField("database", T.StringType(), False),
            T.StructField("table", T.StringType(), False),
            T.StructField("op", T.StringType(), False),
            T.StructField("before", image, True),
            T.StructField("after", image, True),
            T.StructField("query", T.StringType(), True),
        ]
    )


# The map-fallback envelope is the wire format of the replay source.
CDC_SCHEMA = cdc_envelope_schema()
