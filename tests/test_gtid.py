"""GTID-set semantics and failover-safe resume (streaming/gtid.py +
the replay source's ``gtidexecuted`` option).
"""

from __future__ import annotations

import json
import os

from rust_cdc_spark.streaming.gtid import GtidSet


class TestGtidSet:
    def test_parse_and_roundtrip(self):
        s = GtidSet("uuidB:1-3,uuidA:1-50:60:70-80")
        assert str(s) == "uuidA:1-50:60:70-80,uuidB:1-3"

    def test_contains(self):
        s = GtidSet("u:1-50:60:70-80")
        assert s.contains("u:1") and s.contains("u:50") and s.contains("u:60")
        assert s.contains("u:75")
        assert not s.contains("u:51") and not s.contains("u:61")
        assert not s.contains("other:10")
        assert not s.contains(None) and not s.contains("")

    def test_add_merges_adjacent(self):
        s = GtidSet("u:1-3")
        s.add("u:4")  # adjacent → one range
        assert str(s) == "u:1-4"
        s.add("u:6")
        assert str(s) == "u:1-4:6"
        s.add("u:5")  # bridges the gap
        assert str(s) == "u:1-6"

    def test_union(self):
        a, b = GtidSet("u:1-5,v:1"), GtidSet("u:4-9")
        assert str(a.union(b)) == "u:1-9,v:1"

    def test_multi_source_uuids(self):
        s = GtidSet()
        for g in ["a:1", "b:1", "a:2"]:
            s.add(g)
        assert str(s) == "a:1-2,b:1"
        assert s.contains("b:1") and not s.contains("b:2")

    def test_empty_set_is_falsy(self):
        assert not GtidSet("")
        assert GtidSet("u:1")


class TestFailoverResume:
    """Replica A dies mid-stream; the consumer reconnects to replica B,
    whose binlog numbering/positions are unrelated and whose log contains
    transactions already consumed from A. With the executed GTID set,
    the overlap must be dropped inside the source."""

    def _write(self, directory, fname, events):
        os.makedirs(directory, exist_ok=True)
        with open(os.path.join(directory, fname), "w") as fh:
            for e in events:
                fh.write(json.dumps(e) + "\n")

    def _ev(self, pos, txn, op, after=None, before=None):
        return {
            "ts": 1700000000 + txn,
            "server_id": 1,
            "pos": pos,
            "gtid": f"primary:{txn}",
            "xid": None,
            "database": "app",
            "table": "users",
            "op": op,
            "before": before,
            "after": after,
            "query": None,
        }

    def test_no_duplicate_transactions_after_failover(self, spark, tmp_path):
        from rust_cdc_spark.streaming.pipeline import (
            ParquetUpsertTable,
            start_cdc_pipeline,
        )

        # replica A: txns 1-3 (balance is a running count of applied txns
        # — a duplicate apply would be visible in the final value)
        a_dir = str(tmp_path / "replicaA")
        self._write(a_dir, "binlog.000007.jsonl", [
            self._ev(4, 1, "I", after={"id": 1, "name": "ann", "balance": 1.0}),
            self._ev(90, 2, "U",
                     before={"id": 1, "name": "ann", "balance": 1.0},
                     after={"id": 1, "name": "ann", "balance": 2.0}),
            self._ev(180, 3, "I", after={"id": 2, "name": "bob", "balance": 1.0}),
        ])
        # replica B: same txns 2-3 at DIFFERENT file/pos, plus new 4-5
        b_dir = str(tmp_path / "replicaB")
        self._write(b_dir, "binlog.000001.jsonl", [
            self._ev(4, 2, "U",
                     before={"id": 1, "name": "ann", "balance": 1.0},
                     after={"id": 1, "name": "ann", "balance": 2.0}),
            self._ev(77, 3, "I", after={"id": 2, "name": "bob", "balance": 1.0}),
            self._ev(150, 4, "U",
                     before={"id": 2, "name": "bob", "balance": 1.0},
                     after={"id": 2, "name": "bob", "balance": 2.0}),
            self._ev(200, 5, "I", after={"id": 3, "name": "cyd", "balance": 1.0}),
        ])

        table = ParquetUpsertTable(str(tmp_path / "t"), ["id"])
        # phase 1: consume replica A fully
        q = start_cdc_pipeline(
            spark, a_dir, table,
            checkpoint_dir=str(tmp_path / "cpA"),
        )
        q.processAllAvailable(); q.stop()
        got = {r.id: r.balance for r in table.read(spark).collect()}
        assert got == {"1": "2.0", "2": "1.0"}

        # phase 2: failover to replica B with A's executed set; fresh
        # checkpoint (offsets don't transfer across servers)
        q = start_cdc_pipeline(
            spark, b_dir, table,
            checkpoint_dir=str(tmp_path / "cpB"),
            gtid_executed="primary:1-3",
            app_id="replicaB",  # new incarnation → new idempotence scope
        )
        q.processAllAvailable(); q.stop()
        got = {r.id: r.balance for r in table.read(spark).collect()}
        assert got == {"1": "2.0", "2": "2.0", "3": "1.0"}

    def test_without_gtid_filter_overlap_would_apply(self, spark, tmp_path):
        """Control: replaying B without the executed set re-applies txns
        2-3 (harmless here only because images are absolute, but the
        filter must demonstrably drop them — row counts differ)."""
        from rust_cdc_spark.streaming.replay_source import register

        b_dir = str(tmp_path / "replicaB")
        self._write(b_dir, "binlog.000001.jsonl", [
            self._ev(4, 2, "I", after={"id": 1, "name": "a", "balance": 1.0}),
            self._ev(9, 4, "I", after={"id": 2, "name": "b", "balance": 1.0}),
        ])
        register(spark)

        def consume(**opts):
            reader = spark.readStream.format("mysql-cdc-replay").option(
                "path", b_dir
            )
            for k, v in opts.items():
                reader = reader.option(k, v)
            seen = []
            q = (
                reader.load().writeStream
                .foreachBatch(lambda b, e: seen.extend(b.collect()))
                .outputMode("append")
                .start()
            )
            q.processAllAvailable(); q.stop()
            return seen

        assert len(consume()) == 2
        assert [r.gtid for r in consume(gtidexecuted="primary:1-3")] == [
            "primary:4"
        ]


class TestShardedPipeline:
    """N shard binlogs (hash-sharded by key) merge into one table in a
    single streaming query; each shard resumes from its own offsets."""

    def _write(self, directory, fname, events):
        os.makedirs(directory, exist_ok=True)
        with open(os.path.join(directory, fname), "w") as fh:
            for e in events:
                fh.write(json.dumps(e) + "\n")

    def _ev(self, pos, key, op, val):
        img = {"id": key, "name": f"u{key}", "balance": val}
        return {
            "ts": 1700000000 + pos, "server_id": 1, "pos": pos,
            "gtid": None, "xid": None, "database": "app", "table": "users",
            "op": op,
            "before": img if op == "D" else None,
            "after": img if op != "D" else None,
            "query": None,
        }

    def test_two_shards_merge_into_one_table(self, spark, tmp_path):
        from rust_cdc_spark.streaming.pipeline import (
            ParquetUpsertTable,
            start_sharded_pipeline,
        )

        # even keys on shard0, odd keys on shard1; positions overlap
        # across shards (each shard numbers its own binlog from 4)
        s0 = str(tmp_path / "shard0")
        self._write(s0, "binlog.000001.jsonl", [
            self._ev(4, 2, "I", 1.0),
            self._ev(9, 4, "I", 1.0),
            self._ev(12, 2, "U", 2.0),
        ])
        s1 = str(tmp_path / "shard1")
        self._write(s1, "binlog.000001.jsonl", [
            self._ev(4, 1, "I", 1.0),
            self._ev(9, 1, "D", 1.0),
            self._ev(12, 3, "I", 5.0),
        ])
        table = ParquetUpsertTable(str(tmp_path / "t"), ["id"])
        q = start_sharded_pipeline(
            spark, {"s0": s0, "s1": s1}, table,
            checkpoint_dir=str(tmp_path / "cp"),
        )
        q.processAllAvailable(); q.stop()
        got = {r.id: r.balance for r in table.read(spark).collect()}
        assert got == {"2": "2.0", "4": "1.0", "3": "5.0"}  # key 1 deleted

    def test_restart_resumes_every_shard(self, spark, tmp_path):
        from rust_cdc_spark.streaming.pipeline import (
            ParquetUpsertTable,
            start_sharded_pipeline,
        )

        s0, s1 = str(tmp_path / "s0"), str(tmp_path / "s1")
        self._write(s0, "binlog.000001.jsonl", [self._ev(4, 2, "I", 1.0)])
        self._write(s1, "binlog.000001.jsonl", [self._ev(4, 1, "I", 1.0)])
        table = ParquetUpsertTable(str(tmp_path / "t"), ["id"])
        cp = str(tmp_path / "cp")
        q = start_sharded_pipeline(spark, {"s0": s0, "s1": s1}, table, cp)
        q.processAllAvailable(); q.stop()

        # each shard rotates to a new file with more changes
        self._write(s0, "binlog.000002.jsonl", [self._ev(4, 2, "U", 9.0)])
        self._write(s1, "binlog.000002.jsonl", [self._ev(4, 3, "I", 7.0)])
        q = start_sharded_pipeline(spark, {"s0": s0, "s1": s1}, table, cp)
        q.processAllAvailable(); q.stop()
        got = {r.id: r.balance for r in table.read(spark).collect()}
        assert got == {"1": "1.0", "2": "9.0", "3": "7.0"}


class TestGtidSetBinaryCodec:
    """encode()/decode(): the SID-block payload COM_BINLOG_DUMP_GTID
    carries (u64 n_sids; per sid 16 uuid bytes, u64 n_intervals,
    u64 start / u64 end-EXCLUSIVE per interval)."""

    def test_roundtrip_multi_sid_multi_interval(self):
        from rust_cdc_spark.streaming.gtid import GtidSet

        text = (
            "11111111-2222-3333-4444-555555555555:1-50:60:70-80,"
            "aaaaaaaa-bbbb-cccc-dddd-eeeeeeeeeeee:5-7"
        )
        s = GtidSet(text)
        assert GtidSet.decode(s.encode()) == s

    def test_golden_bytes_single_txn(self):
        import struct
        import uuid

        from rust_cdc_spark.streaming.gtid import GtidSet

        u = "12345678-1234-5678-1234-567812345678"
        data = GtidSet(f"{u}:42").encode()
        assert data == (
            struct.pack("<Q", 1) + uuid.UUID(u).bytes
            + struct.pack("<Q", 1) + struct.pack("<QQ", 42, 43)
        )

    def test_trailing_bytes_rejected(self):
        import pytest

        from rust_cdc_spark.streaming.gtid import GtidSet

        with pytest.raises(ValueError, match="trailing"):
            GtidSet.decode(GtidSet("a0a0a0a0-0000-0000-0000-000000000000:1").encode() + b"x")

    def test_dump_gtid_packet_layout(self):
        import struct

        from rust_cdc_spark.sources import wire as W
        from rust_cdc_spark.streaming.gtid import GtidSet

        data = GtidSet("12345678-1234-5678-1234-567812345678:7").encode()
        pkt = W.build_com_binlog_dump_gtid(1001, data, "b.000002", 4)
        assert pkt[0] == W.COM_BINLOG_DUMP_GTID
        flags, server_id = struct.unpack_from("<HI", pkt, 1)
        assert flags == W.BINLOG_THROUGH_GTID and server_id == 1001
        (nlen,) = struct.unpack_from("<I", pkt, 7)
        assert pkt[11 : 11 + nlen] == b"b.000002"
        (pos,) = struct.unpack_from("<Q", pkt, 11 + nlen)
        (dsize,) = struct.unpack_from("<I", pkt, 19 + nlen)
        assert pos == 4 and pkt[23 + nlen :] == data and dsize == len(data)
