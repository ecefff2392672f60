"""Kafka CDC source (reference S10 — planned but stubbed there:
``Record::Kafka`` with ``todo!()``, /root/reference/src/delta/mod.rs:45-50,
147-150).

In Spark this is a built-in: ``spark.readStream.format("kafka")``. The
engine adds the envelope parsing — Kafka values carry the same JSON event
shape the replay source reads (FIXTURES.md F6), so one parser serves
file replay, Kafka, and any other byte transport. The parse is
``from_json`` (JVM, codegen) — no Python in the ingest path.

The Kafka client jars are not in the v1 image; ``read_stream`` raises a
clear error without them, while ``parse_cdc_json`` is fully testable on
any DataFrame with a string column.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

# Wire JSON schema: epoch-seconds ts + map images (typed casting happens
# downstream against the schema registry, as in streaming/pipeline.py).
WIRE_SCHEMA = T.StructType(
    [
        T.StructField("ts", T.LongType()),
        T.StructField("server_id", T.LongType()),
        T.StructField("file", T.StringType()),
        T.StructField("pos", T.LongType()),
        T.StructField("gtid", T.StringType()),
        T.StructField("xid", T.LongType()),
        T.StructField("database", T.StringType()),
        T.StructField("table", T.StringType()),
        T.StructField("op", T.StringType()),
        T.StructField("before", T.MapType(T.StringType(), T.StringType())),
        T.StructField("after", T.MapType(T.StringType(), T.StringType())),
        T.StructField("query", T.StringType()),
    ]
)


def parse_cdc_json(df: DataFrame, value_col: str = "value") -> DataFrame:
    """Parse a JSON-bytes column into the CDC envelope (datamodel.py).
    Malformed records yield NULL envelopes — filter on ``log_pos IS
    NULL`` for the dead-letter path (the K4 quarantine analog)."""
    parsed = df.withColumn(
        "_ev", F.from_json(F.col(value_col).cast("string"), WIRE_SCHEMA)
    )
    return parsed.select(
        F.timestamp_seconds(F.col("_ev.ts")).alias("ts"),
        F.col("_ev.server_id").alias("server_id"),
        F.col("_ev.file").alias("log_file"),
        F.col("_ev.pos").alias("log_pos"),
        F.col("_ev.gtid").alias("gtid"),
        F.col("_ev.xid").alias("xid"),
        F.col("_ev.database").alias("database"),
        F.col("_ev.table").alias("table"),
        F.col("_ev.op").alias("op"),
        F.col("_ev.before").alias("before"),
        F.col("_ev.after").alias("after"),
        F.col("_ev.query").alias("query"),
    )


def read_stream(
    spark: SparkSession,
    bootstrap_servers: str,
    topic: str,
    starting_offsets: str = "latest",
) -> DataFrame:
    """Kafka → CDC envelope stream. Requires the spark-sql-kafka package
    on the classpath (not in the v1 image)."""
    try:
        raw = (
            spark.readStream.format("kafka")
            .option("kafka.bootstrap.servers", bootstrap_servers)
            .option("subscribe", topic)
            .option("startingOffsets", starting_offsets)
            .load()
        )
    except Exception as e:  # pragma: no cover - jar-dependent
        raise RuntimeError(
            "kafka source requires org.apache.spark:spark-sql-kafka jars "
            "on the classpath (add via spark.jars.packages)"
        ) from e
    return parse_cdc_json(raw, "value")
