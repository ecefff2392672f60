"""Golden tests against the reference's captured real-MySQL binlog files
(read-only fixtures at /root/reference/tests/events/*). Asserted values
mirror the reference's own test suite (tests/test.rs:38-380): xid 852,
insert image [1,'cdc-1'], the 9-column update before/after including
packed-BCD DECIMAL(10,4), delete image, GTID uuid:gno — now produced by
OUR parser from the same bytes. Skipped if the fixtures are absent.
"""

from __future__ import annotations

import os

import pytest

from rust_cdc_spark.sources.binlog_file import (
    binlog_file_to_jsonl,
    parse_binlog_file,
)

BASE = "/root/reference/tests/events"

pytestmark = pytest.mark.skipif(
    not os.path.isdir(BASE), reason="reference fixtures not present"
)


def _fixture(name: str) -> str:
    d = os.path.join(BASE, name)
    bins = [f for f in os.listdir(d) if "bin" in f and not f.endswith(".md")]
    return os.path.join(d, sorted(bins)[0])


def _events(name: str) -> list[dict]:
    return list(parse_binlog_file(_fixture(name)))


class TestGoldenDecode:
    def test_write_rows_v2(self):
        """tests/test.rs:134-172: insert rows into rustcdc."""
        evs = _events("30_write_rows_v2")
        inserts = [e for e in evs if e["op"] == "I"]
        assert [e["after"] for e in inserts] == [
            {"col_0": 1, "col_1": "cdc-1"},
            {"col_0": 2, "col_1": "cdc-2"},
        ]
        assert all(e["database"] == "rustcdc" and e["table"] == "rustcdc" for e in inserts)

    def test_xid_852(self):
        """tests/test.rs:63-89: xid=852 commit marker."""
        evs = _events("16_xid")
        assert [e["xid"] for e in evs if e["op"] == "TXN"] == [852]

    def test_update_rows_v2_wide_types(self):
        """tests/test.rs:175-242: before (abc…,1.0,2.0,3.0000) → after
        (xd…,4.0,4.0,4.0000) across varchar/text/float/double/decimal."""
        evs = _events("31_update_rows_v2")
        ups = [e for e in evs if e["op"] == "U"]
        assert len(ups) == 1
        b, a = ups[0]["before"], ups[0]["after"]
        assert b["col_1"] == "abc" and a["col_1"] == "xd"
        assert b["col_5"] == "abc" and a["col_5"] == "xd"  # LONGTEXT
        assert (b["col_6"], b["col_7"], b["col_8"]) == (1.0, 2.0, "3.0000")
        assert (a["col_6"], a["col_7"], a["col_8"]) == (4.0, 4.0, "4.0000")

    def test_delete_rows_v2(self):
        """tests/test.rs:245-289: deleted image [1,'abcde']."""
        evs = _events("32_delete_rows_v2")
        dels = [e for e in evs if e["op"] == "D"]
        assert [e["before"] for e in dels] == [{"col_0": 1, "col_1": "abcde"}]

    def test_gtid_attached(self):
        """tests/test.rs:319-359: GTID uuid:gno attached to row events."""
        evs = _events("gtid_prev_gtid")
        ins = [e for e in evs if e["op"] == "I"]
        assert ins[0]["gtid"] == "95b11928-268e-11ed-b39c-04d4c4eb9817:3"

    def test_ddl_comment_preserved_for_strip(self):
        """QueryEvent text round-trip (tests/test.rs:293-315) — comments
        intact on the wire; stripping is the router's job."""
        from rust_cdc_spark.operators.ddl import parse_ddl, strip_comments

        evs = _events("query")
        ddls = [e for e in evs if e["op"] == "DDL"]
        create = [e for e in ddls if "CREATE TABLE" in e["query"]][0]
        assert strip_comments(create["query"]).startswith("CREATE TABLE")
        drop = [e for e in ddls if e["query"].startswith("DROP")][0]
        assert parse_ddl(drop["query"]).kind == "drop_table"


class TestRealBinlogThroughPipeline:
    def test_file_to_stream_to_table(self, spark, tmp_path):
        """The full offline-replay path on real bytes: binary binlog →
        JSONL → streaming source → MERGE → queryable state."""
        from pyspark.sql import types as T

        from rust_cdc_spark.streaming.pipeline import (
            ParquetUpsertTable,
            start_cdc_pipeline,
        )

        d = str(tmp_path / "replay")
        os.makedirs(d)
        n = binlog_file_to_jsonl(
            _fixture("30_write_rows_v2"), os.path.join(d, "binlog.000002.jsonl")
        )
        assert n >= 4
        schema = T.StructType(
            [
                T.StructField("col_0", T.LongType()),
                T.StructField("col_1", T.StringType()),
            ]
        )
        table = ParquetUpsertTable(
            str(tmp_path / "rustcdc"), ["col_0"], image_schema=schema
        )
        q = start_cdc_pipeline(
            spark,
            d,
            table,
            dbs=["rustcdc"],
            tables=["rustcdc"],
            checkpoint_dir=str(tmp_path / "cp"),
        )
        q.processAllAvailable()
        q.stop()
        got = {r.col_0: r.col_1 for r in table.read(spark).collect()}
        assert got == {1: "cdc-1", 2: "cdc-2"}


class TestCrc32Verification:
    """VERDICT r8 #4: the readers must VERIFY the CRC32 trailer the
    reference only strips (decode.rs:335-341). The fixtures carry real
    server-computed CRC32s — including the 8.0.21 FDE written before
    LOG_EVENT_BINLOG_IN_USE_F was set (the mysqlbinlog special case)."""

    def test_goldens_verify_clean(self):
        """Every event in every real fixture passes CRC32 verification
        (default-on), across both the 5.6.19 and 8.0.21 capture eras."""
        from rust_cdc_spark.sources.binlog_file import read_raw_events

        for name in sorted(os.listdir(BASE)):
            d = os.path.join(BASE, name)
            if not os.path.isdir(d):
                continue
            bins = [
                f for f in os.listdir(d)
                if "bin" in f and not f.endswith(".md")
            ]
            if not bins:
                continue
            evs = list(read_raw_events(os.path.join(d, sorted(bins)[0])))
            assert evs and all(e.crc_ok for e in evs), name

    def test_corrupted_byte_routes_to_dlq(self, tmp_path):
        """Flip one byte inside a row event's body: the event must land
        in the DLQ as a Crc32Mismatch ERR record — NOT decode to a
        garbage (or silently wrong) row image."""
        src = _fixture("30_write_rows_v2")
        data = bytearray(open(src, "rb").read())
        # locate the first WRITE_ROWS_V2 (0x1E) event and flip a byte in
        # the middle of its row payload
        pos = 4
        while pos < len(data):
            size = int.from_bytes(data[pos + 9:pos + 13], "little")
            if data[pos + 4] == 0x1E:
                data[pos + size - 10] ^= 0xFF
                break
            pos += size
        else:
            pytest.fail("no WRITE_ROWS_V2 event in fixture")
        bad = tmp_path / "binlog.corrupt"
        bad.write_bytes(bytes(data))
        evs = list(parse_binlog_file(str(bad)))
        errs = [e for e in evs if e["op"] == "ERR"]
        assert len(errs) == 1 and "Crc32Mismatch" in errs[0]["query"]
        # the corrupted insert must NOT have decoded; the other insert
        # in the same statement is in the same event, so both are gone
        assert all(
            e["after"] != {"col_0": 1, "col_1": "cdc-1"} or e["op"] != "I"
            for e in evs
        )

    def test_verify_off_restores_strip_only(self, tmp_path):
        """verify_checksum=False keeps the legacy strip-only behavior
        (the reference's): the corrupt event decodes (to whatever the
        bytes say) or DLQs on a decode error, but never Crc32Mismatch."""
        from rust_cdc_spark.sources.binlog_file import (
            envelopes_from_events,
            read_raw_events,
        )

        src = _fixture("30_write_rows_v2")
        data = bytearray(open(src, "rb").read())
        pos = 4
        while pos < len(data):
            size = int.from_bytes(data[pos + 9:pos + 13], "little")
            if data[pos + 4] == 0x1E:
                data[pos + size - 10] ^= 0xFF
                break
            pos += size
        bad = tmp_path / "binlog.corrupt"
        bad.write_bytes(bytes(data))
        evs = list(
            envelopes_from_events(
                read_raw_events(str(bad), verify_checksum=False), "b.000001"
            )
        )
        assert not any(
            e["op"] == "ERR" and "Crc32Mismatch" in (e["query"] or "")
            for e in evs
        )

    def test_wire_stream_verifies(self):
        """The live wire reader shares verification: a dump stream whose
        row event is corrupted yields crc_ok=False on that event."""
        import io

        from rust_cdc_spark.sources.binlog_file import HEADER_LEN
        from rust_cdc_spark.sources.wire import binlog_events_from_stream

        # build a packet stream from the fixture's raw events
        src = _fixture("30_write_rows_v2")
        data = bytearray(open(src, "rb").read())
        pos = 4
        frames = []
        while pos < len(data):
            size = int.from_bytes(data[pos + 9:pos + 13], "little")
            frames.append(bytearray(data[pos:pos + size]))
            pos += size
        for fr in frames:
            if fr[4] == 0x1E:
                fr[len(fr) - 10] ^= 0xFF
                break  # corrupt only the FIRST row event
        buf = bytearray()
        seq = 0
        for fr in frames:
            payload = bytes([0x00]) + bytes(fr)
            buf += len(payload).to_bytes(3, "little") + bytes([seq]) + payload
            seq = (seq + 1) & 0xFF
        buf += (5).to_bytes(3, "little") + bytes([seq]) + b"\xfe\x00\x00\x00\x00"
        evs = list(binlog_events_from_stream(io.BytesIO(buf)))
        bad = [e for e in evs if not e.crc_ok]
        assert len(bad) == 1 and bad[0].type_code == 0x1E
        assert all(e.crc_ok for e in evs if e.type_code != 0x1E)
        # verify_checksum=False (the live source's
        # .option("verifychecksum","false")): strip-only, nothing flagged
        evs2 = list(
            binlog_events_from_stream(io.BytesIO(buf), verify_checksum=False)
        )
        assert all(e.crc_ok for e in evs2)
