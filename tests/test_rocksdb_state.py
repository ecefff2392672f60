"""RocksDB state-store parity (O3): the reference persists its offset/
snapshot state in RocksDB (/root/reference/src/snapshot/
rocksdb_backend.rs:10-85); the engine analog is backing Spark's stateful
streaming operators with the RocksDB state store provider. Asserts the
provider loads in this build, that a stateful query actually writes
RocksDB artifacts into the checkpoint, and that state survives a
restart (the reference's resume guarantee)."""

from __future__ import annotations

import glob
import json
import os

from pyspark.sql import functions as F

from rust_cdc_spark.streaming.pipeline import (
    ROCKSDB_PROVIDER,
    use_rocksdb_state_store,
)


def _write_events(d: str, fname: str, events: list[dict]) -> None:
    os.makedirs(d, exist_ok=True)
    with open(os.path.join(d, fname), "w") as fh:
        for e in events:
            fh.write(json.dumps(e) + "\n")


def _ev(pos: int, op: str) -> dict:
    return {
        "ts": 1700000000 + pos, "server_id": 1, "pos": pos,
        "gtid": None, "xid": None, "database": "app", "table": "users",
        "op": op, "before": None, "after": {"id": str(pos)}, "query": None,
    }


def test_rocksdb_state_store_restart(spark, tmp_path):
    """Stateful agg over the CDC replay source with RocksDB state:
    stop, append a new binlog file, restart from the same checkpoint —
    counts must ACCUMULATE (state restored from RocksDB snapshots/
    changelogs), and the state dir must contain RocksDB artifacts."""
    from rust_cdc_spark.streaming.replay_source import register

    register(spark)
    binlog = str(tmp_path / "binlog")
    cp = str(tmp_path / "cp")
    _write_events(binlog, "binlog.000001.jsonl",
                  [_ev(1, "I"), _ev(2, "I"), _ev(3, "U")])

    assert use_rocksdb_state_store(spark), "RocksDB provider absent"
    try:
        assert (
            spark.conf.get("spark.sql.streaming.stateStore.providerClass")
            == ROCKSDB_PROVIDER
        )

        def run(queryname: str) -> dict:
            q = (
                spark.readStream.format("mysql-cdc-replay")
                .option("path", binlog)
                .load()
                .groupBy("op").agg(F.count("*").alias("n"))
                .writeStream.format("memory")
                .queryName(queryname)
                .outputMode("complete")
                .option("checkpointLocation", cp)
                .start()
            )
            q.processAllAvailable()
            rows = {r.op: r.n for r in
                    spark.sql(f"SELECT * FROM {queryname}").collect()}
            q.stop()
            return rows

        first = run("rocks_counts_1")
        assert first == {"I": 2, "U": 1}

        # RocksDB artifacts in the checkpoint: zip snapshots and/or
        # changelog files (never the HDFS provider's .delta files)
        state_files = glob.glob(os.path.join(cp, "state", "**"),
                                recursive=True)
        assert any(f.endswith((".zip", ".changelog")) for f in state_files), \
            f"no RocksDB artifacts under {cp}/state: {state_files[:10]}"
        assert not any(f.endswith(".delta") for f in state_files)

        _write_events(binlog, "binlog.000002.jsonl",
                      [_ev(4, "I"), _ev(5, "D")])
        second = run("rocks_counts_2")
        # restart resumed operator state: old counts + only-new events
        assert second == {"I": 3, "U": 1, "D": 1}
    finally:
        spark.conf.unset("spark.sql.streaming.stateStore.providerClass")
        spark.conf.unset(
            "spark.sql.streaming.stateStore.rocksdb"
            ".changelogCheckpointing.enabled"
        )


def test_rocksdb_streaming_dedup(spark, tmp_path):
    """The A4 streaming-dedup path (dropDuplicatesWithinWatermark) on
    RocksDB: duplicate keys across microbatches are dropped while the
    state store holds the seen-set."""
    assert use_rocksdb_state_store(spark)
    try:
        src = str(tmp_path / "src")
        os.makedirs(src)
        with open(os.path.join(src, "a.json"), "w") as fh:
            fh.write('{"k":"a","t":"2024-01-01T00:00:00"}\n'
                     '{"k":"b","t":"2024-01-01T00:00:10"}\n'
                     '{"k":"a","t":"2024-01-01T00:00:20"}\n')
        from rust_cdc_spark.streaming.pipeline import streaming_dedup

        stream = (
            spark.readStream.schema("k string, t string").json(src)
            .withColumn("t", F.to_timestamp("t"))
        )
        q = (
            streaming_dedup(stream, ["k"], "t", "1 hour")
            .writeStream.format("memory").queryName("rocks_dedup")
            .outputMode("append")
            .option("checkpointLocation", str(tmp_path / "cp2"))
            .start()
        )
        q.processAllAvailable()
        rows = spark.sql("SELECT k FROM rocks_dedup").collect()
        q.stop()
        assert sorted(r.k for r in rows) == ["a", "b"]
    finally:
        spark.conf.unset("spark.sql.streaming.stateStore.providerClass")
        spark.conf.unset(
            "spark.sql.streaming.stateStore.rocksdb"
            ".changelogCheckpointing.enabled"
        )
