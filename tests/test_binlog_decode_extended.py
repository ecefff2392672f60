"""Decode-path robustness: charset-aware strings, STRING meta unpacking,
ENUM/SET, v1 temporals, legacy DECIMAL, TABLE_MAP optional metadata
(signedness / charsets / column names / enum labels), binary JSON, and
the dead-letter quarantine for undecodable events.

Wire bytes are hand-encoded in-test from the public formats (mysql-server
libbinlogevents rows_event.h TLV layout, sql/json_binary.cc), independent
of the decoder. Reference gaps these tests go beyond: collation handling
(the reference only carries the id table, /root/reference/src/mysql/
collation.rs), ENUM/SET decode (carried but undecoded, event/mod.rs:543),
and JSONB (untouched bytes in the reference)."""

from __future__ import annotations

import datetime
import struct
from decimal import Decimal

import pytest

from rust_cdc_spark.functions import jsonb as JB
from rust_cdc_spark.functions import mysql_types as MT
from rust_cdc_spark.sources import binlog_rows as BR
from tests.test_binlog_decode import enc_long, enc_newdecimal, enc_varchar


class TestV1TemporalsAndLegacy:
    def test_timestamp_v1(self):
        buf = (1_600_000_000).to_bytes(4, "little")
        v, off = MT.decode_value(buf, 0, MT.TIMESTAMP)
        assert (v, off) == (datetime.datetime(2020, 9, 13, 12, 26, 40), 4)

    def test_time_v1(self):
        buf = (11_22_33).to_bytes(3, "little")  # 112233 → 11:22:33
        v, off = MT.decode_value(buf, 0, MT.TIME)
        assert (v, off) == ("11:22:33", 3)

    def test_time_v1_negative(self):
        raw = (-112233).to_bytes(3, "little", signed=True)
        v, _ = MT.decode_value(raw, 0, MT.TIME)
        assert v == "-11:22:33"

    def test_legacy_decimal_as_packed_bcd(self):
        buf = enc_newdecimal("12.50", 10, 4)
        v, _ = MT.decode_value(buf + b"\x00", 0, MT.DECIMAL, (10, 4))
        assert v == Decimal("12.5000")

    def test_newdate(self):
        packed = (2024 << 9) | (8 << 5) | 13
        v, _ = MT.decode_value(packed.to_bytes(3, "little"), 0, MT.NEWDATE)
        assert v == datetime.date(2024, 8, 13)


class TestCharsetDecode:
    def test_latin1_is_cp1252(self):
        raw = bytes([4]) + b"caf\xe9"
        v, _ = MT.decode_value(raw, 0, MT.VARCHAR, (160,), collation_id=8)
        assert v == "café"
        # cp1252's 0x80-0x9F are punctuation, not ISO-8859-1 controls
        raw = bytes([1]) + b"\x93"
        v, _ = MT.decode_value(raw, 0, MT.VARCHAR, (160,), collation_id=8)
        assert v == "“"

    def test_gbk(self):
        raw = bytes([2]) + "中".encode("gbk")
        v, _ = MT.decode_value(raw, 0, MT.VARCHAR, (160,), collation_id=28)
        assert v == "中"

    def test_binary_collation_keeps_bytes(self):
        raw = bytes([3]) + b"\x00\xff\x7f"
        v, _ = MT.decode_value(raw, 0, MT.VARCHAR, (160,), collation_id=63)
        assert v == b"\x00\xff\x7f"

    def test_default_collation_is_utf8(self):
        raw = bytes([3]) + "中".encode()
        v, _ = MT.decode_value(raw, 0, MT.VARCHAR, (160,))
        assert v == "中"

    # ── tier-2 charsets: GOLDEN byte fixtures (explicit bytes a real
    # MySQL server stores for these collations — not Python
    # round-trips), one per codec family in the collation map. Ids are
    # the primary collation of each charset in
    # information_schema.collations.
    GOLDEN = [
        (13, b"\x93\xfa\x96{\x8c\xea", "日本語"),    # sjis
        (95, b"\x93\xfa\x96{\x87@", "日本①"),        # cp932 (NEC ext)
        (1, b"\xa4\xa4\xa4\xe5", "中文"),             # big5
        (2, b"\xa3\xf3d\xbc", "Łódź"),                # latin2
        (4, b"caf\x82", "café"),                      # cp850 (DOS é)
        (12, b"\xc6\xfc\xcb\xdc", "日本"),            # ujis / euc_jp
        (19, b"\xc7\xd1\xb1\xb9", "한국"),            # euckr
        (14, b"\xcf\xf0\xe8\xe2\xe5\xf2", "Привет"),  # cp1251
        (35, b"N-\x00A", "中A"),                      # ucs2 (UTF-16-BE)
        (248, b"\xd6\xd0\xa2\xe3", "中€"),            # gb18030
        (40, b"\x9fesk\xec", "český"),                # cp852
        (7, b"\xe0\xce\xc9\xcb\xcf\xc4", "Юникод"),   # koi8r
        (18, b"\xe4\xb7\xc2", "ไทย"),                 # tis620
        (41, b"R\xeega", "Rīga"),                     # latin7
        (39, b"caf\x8e\xa0", "café†"),                # macroman
        (38, b"\xfc\x97d\x90", "Łódź"),               # macce
    ]

    @pytest.mark.parametrize("cid,raw,expect", GOLDEN)
    def test_tier2_charset_golden_bytes(self, cid, raw, expect):
        buf = bytes([len(raw)]) + raw
        v, _ = MT.decode_value(buf, 0, MT.VARCHAR, (160,), collation_id=cid)
        assert v == expect

    def test_unknown_collation_degrades_to_replacement_never_crashes(self):
        # an id absent from the map + bytes invalid as UTF-8: decode
        # must produce replacement chars, not raise
        raw = b"\x93\xfa\xff"
        buf = bytes([len(raw)]) + raw
        v, _ = MT.decode_value(buf, 0, MT.VARCHAR, (160,), collation_id=999)
        assert isinstance(v, str) and "�" in v


class TestStringMetaUnpack:
    def test_unpack_long_char(self):
        # CHAR(85) utf8mb4 → 340 bytes: high length bits packed into b1
        assert MT.unpack_string_meta(0xEE, 0x54) == (MT.STRING, 340)

    def test_unpack_plain(self):
        assert MT.unpack_string_meta(MT.STRING, 40) == (MT.STRING, 40)
        assert MT.unpack_string_meta(MT.ENUM, 1) == (MT.ENUM, 1)
        assert MT.unpack_string_meta(MT.SET, 2) == (MT.SET, 2)

    def test_long_char_two_byte_prefix(self):
        s = "y" * 300
        raw = (300).to_bytes(2, "little") + s.encode()
        v, off = MT.decode_value(raw, 0, MT.STRING, (0xEE, 0x54))
        assert (v, off) == (s, 302)

    def test_enum_one_byte_index(self):
        v, off = MT.decode_value(b"\x02", 0, MT.STRING, (MT.ENUM, 1))
        assert (v, off) == (2, 1)

    def test_enum_with_labels(self):
        v, _ = MT.decode_value(
            b"\x02", 0, MT.STRING, (MT.ENUM, 1),
            enum_set_values=["red", "green", "blue"],
        )
        assert v == "green"

    def test_enum_two_byte_index(self):
        v, off = MT.decode_value(
            (300).to_bytes(2, "little"), 0, MT.STRING, (MT.ENUM, 2)
        )
        assert (v, off) == (300, 2)

    def test_set_bitmask_with_labels(self):
        v, off = MT.decode_value(
            (0b101).to_bytes(2, "little"), 0, MT.STRING, (MT.SET, 2),
            enum_set_values=["a", "b", "c"],
        )
        assert (v, off) == (["a", "c"], 2)

    def test_set_bitmask_without_labels(self):
        v, _ = MT.decode_value(b"\x05", 0, MT.STRING, (MT.SET, 1))
        assert v == 0b101


def _tlv(field_type: int, payload: bytes) -> bytes:
    assert len(payload) < 251
    return bytes([field_type, len(payload)]) + payload


def _table_map_with_metadata() -> bytes:
    """rustcdc-style table, binlog_row_metadata=FULL:
    (id INT UNSIGNED, name VARCHAR(40) CHARSET latin1,
     color ENUM('red','green','blue'), flag TINYINT)."""
    col_types = [MT.LONG, MT.VARCHAR, MT.STRING, MT.TINY]
    metas = (160).to_bytes(2, "little") + bytes([MT.ENUM, 1])
    body = (71).to_bytes(6, "little") + b"\x01\x00"
    body += bytes([3]) + b"cdc\x00"
    body += bytes([7]) + b"rustcdc\x00"
    body += bytes([len(col_types)]) + bytes(col_types)
    body += bytes([len(metas)]) + metas
    body += b"\x00"  # nothing nullable
    body += _tlv(BR._OM_SIGNEDNESS, b"\x80")  # id UNSIGNED, flag signed
    body += _tlv(BR._OM_DEFAULT_CHARSET, b"\x08")  # latin1_swedish_ci
    body += _tlv(BR._OM_ENUM_SET_DEFAULT_CHARSET, b"\x2d")  # utf8mb4
    names = b"".join(bytes([len(n)]) + n for n in (b"id", b"name", b"color", b"flag"))
    body += _tlv(BR._OM_COLUMN_NAME, names)
    labels = b"\x03" + b"\x03red\x05green\x04blue"
    body += _tlv(BR._OM_ENUM_STR_VALUE, labels)
    return body


class TestTableMapOptionalMetadata:
    def test_tlv_parse(self):
        entry = BR.decode_table_map(_table_map_with_metadata())
        assert entry.unsigned == [True, False, False, False]
        assert entry.charsets[1] == 8
        assert entry.charsets[2] == 45
        assert entry.column_names == ["id", "name", "color", "flag"]
        assert entry.enum_set_values[2] == ["red", "green", "blue"]

    def test_default_charset_override_pairs(self):
        # two char columns; second overrides the default with gbk (28)
        body = (72).to_bytes(6, "little") + b"\x01\x00"
        body += bytes([3]) + b"cdc\x00" + bytes([2]) + b"t2\x00"
        body += bytes([2]) + bytes([MT.VARCHAR, MT.VARCHAR])
        body += bytes([4]) + (160).to_bytes(2, "little") * 2
        body += b"\x00"
        body += _tlv(BR._OM_DEFAULT_CHARSET, b"\x08" + b"\x01\x1c")
        entry = BR.decode_table_map(body)
        assert entry.charsets == [8, 28]

    def test_schema_for_entry_from_wire_metadata(self):
        from pyspark.sql import types as T

        entry = BR.decode_table_map(_table_map_with_metadata())
        schema = BR.schema_for_entry(entry)
        assert [f.name for f in schema.fields] == ["id", "name", "color", "flag"]
        assert schema["id"].dataType == T.LongType()      # unsigned INT widens
        assert schema["name"].dataType == T.StringType()
        assert schema["color"].dataType == T.StringType()  # labeled ENUM
        assert schema["flag"].dataType == T.ByteType()     # signed TINYINT
        assert not schema["id"].nullable

    def test_schema_without_metadata_falls_back(self):
        from pyspark.sql import types as T

        body = (72).to_bytes(6, "little") + b"\x01\x00"
        body += bytes([3]) + b"cdc\x00" + bytes([2]) + b"t2\x00"
        body += bytes([2]) + bytes([MT.LONG, MT.STRING])
        body += bytes([2]) + bytes([MT.ENUM, 1])
        body += b"\x00"
        schema = BR.schema_for_entry(BR.decode_table_map(body))
        assert [f.name for f in schema.fields] == ["col_0", "col_1"]
        assert schema["col_0"].dataType == T.IntegerType()  # signedness unknown
        assert schema["col_1"].dataType == T.IntegerType()  # unlabeled ENUM → index

    def test_rows_decode_with_metadata(self):
        """End-to-end: unsigned widening + latin1 + enum label + named
        columns, all from wire metadata alone."""
        reg = BR.TableRegistry()
        reg.handle(BR.decode_table_map(_table_map_with_metadata()))
        img = (
            b"\x00"                       # null bitmap: none
            + (0xFFFFFFFF).to_bytes(4, "little")   # id (unsigned)
            + bytes([4]) + b"caf\xe9"     # name, latin1
            + b"\x02"                     # color = enum index 2
            + b"\xff"                     # flag = -1 (signed tiny)
        )
        rows_body = (
            (71).to_bytes(6, "little") + b"\x01\x00"
            + (2).to_bytes(2, "little")   # v2 extra-data len
            + bytes([4]) + b"\x0f" + img
        )
        _, rows = BR.decode_rows_event(rows_body, BR.WRITE_ROWS_V2, reg)
        assert rows == [{
            "after": {"id": 4294967295, "name": "café", "color": "green", "flag": -1}
        }]


# ── JSONB ───────────────────────────────────────────────────────────────

def _enc_jval(v) -> tuple[int, bytes, bool]:
    if v is None:
        return 0x04, b"\x00", True
    if v is True:
        return 0x04, b"\x01", True
    if v is False:
        return 0x04, b"\x02", True
    if isinstance(v, int) and -(1 << 15) <= v < (1 << 15):
        return 0x05, v.to_bytes(2, "little", signed=True), True
    if isinstance(v, int):
        return 0x07, v.to_bytes(4, "little", signed=True), False
    if isinstance(v, float):
        return 0x0B, struct.pack("<d", v), False
    if isinstance(v, str):
        raw = v.encode()
        assert len(raw) < 128
        return 0x0C, bytes([len(raw)]) + raw, False
    if isinstance(v, dict):
        return 0x00, _enc_jcontainer(v), False
    if isinstance(v, list):
        return 0x02, _enc_jcontainer(v), False
    raise TypeError(v)


def _enc_jcontainer(v) -> bytes:
    """Independent small-format JSONB container encoder (test-local)."""
    obj = isinstance(v, dict)
    items = list(v.items()) if obj else [(None, x) for x in v]
    count = len(items)
    keys = [k.encode() for k, _ in items] if obj else []
    vals = [_enc_jval(x) for _, x in items]
    off = 4 + (4 * count if obj else 0) + 3 * count
    key_offs = []
    for k in keys:
        key_offs.append(off)
        off += len(k)
    entries, payload = [], b""
    for t, p, inline in vals:
        if inline:
            entries.append(bytes([t]) + p.ljust(2, b"\x00"))
        else:
            entries.append(bytes([t]) + off.to_bytes(2, "little"))
            off += len(p)
            payload += p
    out = count.to_bytes(2, "little") + off.to_bytes(2, "little")
    if obj:
        for ko, k in zip(key_offs, keys):
            out += ko.to_bytes(2, "little") + len(k).to_bytes(2, "little")
    return out + b"".join(entries) + b"".join(keys) + payload


def jsonb_bytes(v) -> bytes:
    t, p, _ = _enc_jval(v)
    if t in (0x00, 0x02):
        return bytes([t]) + p
    return bytes([t]) + p


class TestJsonb:
    def test_scalars_and_nesting(self):
        doc = {
            "a": 1, "b": "x", "c": True, "d": None, "e": 1.5,
            "f": [1, 2, "three"], "g": {"h": 70000}, "i": -5,
        }
        assert JB.decode_jsonb(jsonb_bytes(doc)) == doc

    def test_array_top_level(self):
        assert JB.decode_jsonb(jsonb_bytes([1, None, "s", False])) == [1, None, "s", False]

    def test_text_rendering(self):
        assert JB.decode_jsonb_text(jsonb_bytes({"k": [1, True]})) == '{"k":[1,true]}'

    def test_empty_payload_is_null(self):
        assert JB.decode_jsonb(b"") is None
        assert JB.decode_jsonb_text(b"") == "null"

    def test_varint_long_string(self):
        data = b"\x0c" + bytes([0x82, 0x01]) + b"a" * 130
        assert JB.decode_jsonb(data) == "a" * 130

    def test_large_object_inlined_int32(self):
        data = (
            b"\x01"
            + (1).to_bytes(4, "little") + (20).to_bytes(4, "little")
            + (19).to_bytes(4, "little") + (1).to_bytes(2, "little")
            + b"\x07" + (70000).to_bytes(4, "little")
            + b"k"
        )
        assert JB.decode_jsonb(data) == {"k": 70000}

    def test_opaque_decimal(self):
        packed = enc_newdecimal("12.34", 10, 4)
        data = (
            b"\x0f" + bytes([MT.NEWDECIMAL])
            + bytes([len(packed) + 2]) + bytes([10, 4]) + packed
        )
        assert JB.decode_jsonb(data) == "12.3400"

    def test_opaque_datetime(self):
        # my_time packed: ((year*13+month)<<5|day)<<17 | h<<12 | m<<6 | s,
        # then <<24 | micros
        v = ((((2021 * 13 + 3) << 5) | 4) << 17) | (5 << 12) | (6 << 6) | 7
        packed = (v << 24) | 250000
        data = (
            b"\x0f" + bytes([MT.DATETIME2]) + bytes([8])
            + packed.to_bytes(8, "little", signed=True)
        )
        assert JB.decode_jsonb(data) == "2021-03-04 05:06:07.250000"

    def test_json_column_through_decode_value(self):
        payload = jsonb_bytes({"k": 1})
        buf = bytes([len(payload)]) + payload
        v, off = MT.decode_value(buf, 0, MT.JSON, (1,))
        assert (v, off) == ('{"k":1}', len(buf))


class TestDeadLetterQuarantine:
    def _binlog_file(self, tmp_path, events: list[tuple[int, bytes]]) -> str:
        """Synthesize a binlog: magic + FDE(crc32 alg) + events."""
        # ends at the alg byte (1 = CRC32); frame() appends the real CRC
        fde_body = (
            b"\x04\x00" + b"x" * 50 + b"\x00" * 4 + bytes([19])
            + bytes(39) + b"\x01"
        )
        out = b"\xfebin"
        pos = 4

        import zlib

        def frame(tc: int, body: bytes, crc: bool = True) -> bytes:
            nonlocal pos
            size = 19 + len(body) + (4 if crc else 0)
            pos += size
            header = (
                (1_600_000_000).to_bytes(4, "little") + bytes([tc])
                + (1).to_bytes(4, "little") + size.to_bytes(4, "little")
                + pos.to_bytes(4, "little") + b"\x00\x00"
            )
            if not crc:
                return header + body
            # real CRC32 trailer — verification is on by default now
            trailer = (zlib.crc32(header + body) & 0xFFFFFFFF).to_bytes(
                4, "little"
            )
            return header + body + trailer

        out += frame(0x0F, fde_body)
        for tc, body in events:
            out += frame(tc, body)
        p = tmp_path / "binlog.000009"
        p.write_bytes(out)
        return str(p)

    def test_rows_without_table_map_quarantined(self, tmp_path):
        from rust_cdc_spark.sources.binlog_file import parse_binlog_file

        rows_body = (
            (99).to_bytes(6, "little") + b"\x01\x00"
            + (2).to_bytes(2, "little") + bytes([1]) + b"\x01"
            + b"\x00" + enc_long(1)
        )
        path = self._binlog_file(tmp_path, [(BR.WRITE_ROWS_V2, rows_body)])
        evs = list(parse_binlog_file(path))
        assert len(evs) == 1
        assert evs[0]["op"] == "ERR"
        assert "no TABLE_MAP" in evs[0]["query"]
        assert evs[0]["before"] is None and evs[0]["after"] is None

    def test_good_rows_still_decode_after_bad_event(self, tmp_path):
        from rust_cdc_spark.sources.binlog_file import parse_binlog_file

        tmap = (
            (71).to_bytes(6, "little") + b"\x01\x00"
            + bytes([3]) + b"cdc\x00" + bytes([7]) + b"rustcdc\x00"
            + bytes([2]) + bytes([MT.LONG, MT.VARCHAR])
            + bytes([2]) + (160).to_bytes(2, "little")
            + b"\x02"
        )
        bad = (
            (99).to_bytes(6, "little") + b"\x01\x00"
            + (2).to_bytes(2, "little") + bytes([1]) + b"\x01"
            + b"\x00" + enc_long(1)
        )
        good = (
            (71).to_bytes(6, "little") + b"\x01\x00"
            + (2).to_bytes(2, "little") + bytes([2]) + b"\x03"
            + b"\x00" + enc_long(5) + enc_varchar("ok")
        )
        path = self._binlog_file(
            tmp_path,
            [(BR.TABLE_MAP_EVENT, tmap), (BR.WRITE_ROWS_V2, bad),
             (BR.WRITE_ROWS_V2, good)],
        )
        evs = list(parse_binlog_file(path))
        assert [e["op"] for e in evs] == ["ERR", "I"]
        assert evs[1]["after"] == {"col_0": 5, "col_1": "ok"}

    def test_split_dead_letters_routes_err(self, spark):
        from rust_cdc_spark.streaming.pipeline import split_dead_letters

        df = spark.createDataFrame(
            [(1, "I"), (None, "I"), (2, "ERR")],
            "log_pos long, op string",
        )
        ok, dead = split_dead_letters(df)
        assert ok.count() == 1
        assert dead.count() == 2


class TestTransactionPayload:
    """MySQL 8.0.20+ Transaction_payload_event (compressed transactions,
    binlog_transaction_compression=ON). The reference has NO dispatch
    arm for type 0x28 (/root/reference/src/mysql/event/mod.rs:257-367
    stops at the classic codes); here the uncompressed path decodes
    fully and the zstd path is env-gated to the DLQ (no zstandard wheel
    in image, checked 2026-08-16)."""

    TS = 1_600_000_123
    GTID = "12345678-1234-5678-1234-567812345678:42"

    @staticmethod
    def _frame(tc: int, body: bytes, log_pos: int = 0) -> bytes:
        """Bare v4 event frame (19-byte header + body, NO checksum) —
        the embedded-payload wire shape."""
        size = 19 + len(body)
        return (
            TestTransactionPayload.TS.to_bytes(4, "little") + bytes([tc])
            + (1).to_bytes(4, "little") + size.to_bytes(4, "little")
            + log_pos.to_bytes(4, "little") + b"\x00\x00" + body
        )

    @staticmethod
    def _lenenc(v: int) -> bytes:
        if v < 0xFB:
            return bytes([v])
        if v < 2**16:
            return b"\xfc" + v.to_bytes(2, "little")
        if v < 2**24:
            return b"\xfd" + v.to_bytes(3, "little")
        return b"\xfe" + v.to_bytes(8, "little")

    @classmethod
    def _tp_body(
        cls, payload: bytes, compression: int = 255,
        uncompressed: int | None = None, payload_size: int | None = None,
    ) -> bytes:
        le = cls._lenenc
        ps = le(len(payload) if payload_size is None else payload_size)
        body = le(1) + le(len(ps)) + ps          # OTW_PAYLOAD_SIZE
        ct = le(compression)
        body += le(2) + le(len(ct)) + ct         # OTW_COMPRESSION_TYPE
        if uncompressed is not None:
            us = le(uncompressed)
            body += le(3) + le(len(us)) + us     # OTW_UNCOMPRESSED_SIZE
        return body + le(0) + payload            # END mark, then events

    def _inner_txn(self) -> bytes:
        """TABLE_MAP + WRITE_ROWS_V2 + XID — a whole transaction as the
        server would embed it."""
        from tests.test_binlog_decode import _table_map_body

        tmap = _table_map_body(
            71, "cdc", "rustcdc", [MT.LONG, MT.VARCHAR],
            metas=(160).to_bytes(2, "little"), nullable_bits=0b10,
        )
        img = b"\x00" + enc_long(9) + enc_varchar("packed")
        rows = (
            (71).to_bytes(6, "little") + b"\x01\x00"
            + (2).to_bytes(2, "little") + bytes([2]) + bytes([0b11]) + img
        )
        xid = (777).to_bytes(8, "little")
        return (
            self._frame(BR.TABLE_MAP_EVENT, tmap)
            + self._frame(BR.WRITE_ROWS_V2, rows)
            + self._frame(0x10, xid)
        )

    def _outer(self, tp_body: bytes, log_pos: int = 4321):
        """[GTID, TRANSACTION_PAYLOAD] RawEvents, as on the wire."""
        import uuid

        from rust_cdc_spark.sources.binlog_file import (
            GTID_EVENT,
            TRANSACTION_PAYLOAD_EVENT,
            RawEvent,
        )

        u, gno = self.GTID.split(":")
        gtid_body = b"\x01" + uuid.UUID(u).bytes + int(gno).to_bytes(8, "little")
        return [
            RawEvent(self.TS, GTID_EVENT, 1, 19 + len(gtid_body), 4300, 0,
                     gtid_body),
            RawEvent(self.TS, TRANSACTION_PAYLOAD_EVENT, 1,
                     19 + len(tp_body), log_pos, 0, tp_body),
        ]

    def test_uncompressed_payload_decodes_whole_transaction(self):
        from rust_cdc_spark.sources.binlog_file import envelopes_from_events

        body = self._tp_body(self._inner_txn(), compression=255)
        evs = list(envelopes_from_events(iter(self._outer(body)), "b.000001"))
        assert [e["op"] for e in evs] == ["I", "TXN"]
        ins, txn = evs
        assert ins["after"] == {"col_0": 9, "col_1": "packed"}
        assert ins["database"] == "cdc" and ins["table"] == "rustcdc"
        # outer GTID context reaches the inner rows
        assert ins["gtid"] == self.GTID
        # resume-safe offsets: every inner event pins to the OUTER pos
        assert ins["pos"] == 4321 and txn["pos"] == 4321
        assert txn["xid"] == 777

    def test_zstd_payload_quarantines_without_wheel(self):
        from rust_cdc_spark.sources.binlog_file import envelopes_from_events

        try:
            import zstandard  # noqa: F401
        except ImportError:
            zstandard = None
        if zstandard is not None:  # env-gate: wheel appeared, decode fully
            cctx = zstandard.ZstdCompressor()
            inner = self._inner_txn()
            body = self._tp_body(
                cctx.compress(inner), compression=0, uncompressed=len(inner)
            )
            evs = list(
                envelopes_from_events(iter(self._outer(body)), "b.000001")
            )
            assert [e["op"] for e in evs] == ["I", "TXN"]
            return
        body = self._tp_body(b"\x28\xb5\x2f\xfd dummy", compression=0,
                             uncompressed=64)
        evs = list(envelopes_from_events(iter(self._outer(body)), "b.000001"))
        assert [e["op"] for e in evs] == ["ERR"]
        assert "zstandard" in evs[0]["query"]

    def test_multibyte_lenenc_header(self):
        """A >251-byte payload forces the 0xFC two-byte length-encoded
        size — the path a real multi-row transaction always takes."""
        from rust_cdc_spark.sources.binlog_file import envelopes_from_events

        inner = self._inner_txn()
        pad = self._frame(0x10, (778).to_bytes(8, "little"))
        while len(inner) < 300:
            inner += pad
        body = self._tp_body(inner, compression=255)
        assert b"\xfc" in body[:16]  # the size field really is multibyte
        evs = list(envelopes_from_events(iter(self._outer(body)), "b.000001"))
        assert evs[0]["op"] == "I" and all(
            e["op"] == "TXN" for e in evs[1:]
        ) and len(evs) >= 3

    def test_truncated_payload_quarantines(self):
        from rust_cdc_spark.sources.binlog_file import envelopes_from_events

        inner = self._inner_txn()
        body = self._tp_body(inner[: len(inner) // 2], compression=255,
                             payload_size=len(inner))
        evs = list(envelopes_from_events(iter(self._outer(body)), "b.000001"))
        assert [e["op"] for e in evs] == ["ERR"]
        assert "truncated" in evs[0]["query"]

    def test_unknown_compression_quarantines(self):
        from rust_cdc_spark.sources.binlog_file import envelopes_from_events

        body = self._tp_body(b"xx", compression=7)
        evs = list(envelopes_from_events(iter(self._outer(body)), "b.000001"))
        assert [e["op"] for e in evs] == ["ERR"]
        assert "compression" in evs[0]["query"]

    def test_hostile_uncompressed_size_rejected_before_alloc(self):
        """ADVICE r8: a corrupt/hostile header claiming terabytes must
        reject on the size CAP — before any decompressor allocation,
        and identically with or without the zstandard wheel."""
        from rust_cdc_spark.sources.binlog_file import envelopes_from_events

        body = self._tp_body(b"\x28\xb5\x2f\xfd tiny", compression=0,
                             uncompressed=1 << 40)
        evs = list(envelopes_from_events(iter(self._outer(body)), "b.000001"))
        assert [e["op"] for e in evs] == ["ERR"]
        assert "cap" in evs[0]["query"]

    def test_mid_replay_failure_emits_no_partial_transaction(self):
        """ADVICE r8: a payload whose embedded stream fails mid-replay
        (complete first event, truncated second) must quarantine as ONE
        ERR record — no already-replayed inner rows may precede it (a
        downstream would otherwise apply a visibly partial
        transaction)."""
        from rust_cdc_spark.sources.binlog_file import envelopes_from_events

        inner = self._inner_txn()
        # keep the first full frame (TABLE_MAP), truncate inside the
        # second frame's body so the rows event is incomplete
        first_len = int.from_bytes(inner[9:13], "little")
        cut = inner[: first_len + 25]
        assert len(cut) < len(inner)
        body = self._tp_body(cut, compression=255)
        evs = list(envelopes_from_events(iter(self._outer(body)), "b.000001"))
        assert [e["op"] for e in evs] == ["ERR"]
        assert "claims" in evs[0]["query"] or "truncated" in evs[0]["query"]


class TestPartialJsonUpdate:
    """PARTIAL_UPDATE_ROWS_EVENT (0x27, binlog_row_value_options=
    PARTIAL_JSON): after-image JSON columns carry diff vectors applied
    to the before-image at decode time, so downstream always sees full
    document text. No reference arm exists for this type code
    (src/mysql/event/mod.rs:257-367)."""

    def _registry(self):
        body = _table_map_with_partial_json()
        reg = BR.TableRegistry()
        reg.handle(BR.decode_table_map(body))
        return reg

    @staticmethod
    def _diff(op: int, path: str, value=None) -> bytes:
        out = bytes([op]) + bytes([len(path)]) + path.encode()
        if op != 2:  # REMOVE carries no value
            v = jsonb_bytes(value)
            out += bytes([len(v)]) + v
        return out

    def _event_body(self, before_doc, diffs: bytes,
                    value_options: int = 1, partial_bits: int = 1) -> bytes:
        """Real-server layout: BI is ordinary; value_options (+
        partial_bits over the table's JSON columns) PRECEDE the AI —
        the shared-image belongs to the update after-image (WL#2955;
        verified against go-mysql decodeImage)."""
        jb = jsonb_bytes(before_doc)
        before_img = b"\x00" + enc_long(7) + bytes([len(jb)]) + jb
        after_img = b"\x00" + enc_long(7) + bytes([len(diffs)]) + diffs
        body = (72).to_bytes(6, "little") + b"\x01\x00"
        body += (2).to_bytes(2, "little")  # extra-data: just the len
        body += bytes([2])                 # col count
        body += bytes([0b11]) + bytes([0b11])  # present1, present2
        body += before_img
        body += bytes([value_options])     # lenenc value_options
        if value_options & 1:
            body += bytes([partial_bits])
        return body + after_img

    def test_diffs_applied_to_before_image(self):
        reg = self._registry()
        before = {"a": 1, "b": [1, 2, 3], "keep": "x"}
        diffs = (
            self._diff(0, "$.a", 42)          # REPLACE
            + self._diff(2, "$.b[1]")         # REMOVE
            + self._diff(1, "$.c", "new")     # INSERT member
        )
        tid, rows = BR.decode_rows_event(
            self._event_body(before, diffs),
            BR.PARTIAL_UPDATE_ROWS_V2, reg,
        )
        assert tid == 72
        [row] = rows
        import json

        assert json.loads(row["before"]["col_1"]) == before
        assert json.loads(row["after"]["col_1"]) == {
            "a": 42, "b": [1, 3], "keep": "x", "c": "new"
        }

    def test_value_options_zero_means_full_document(self):
        """A partial event whose row has value_options=0 carries plain
        full images — the decoder must not expect partial_bits."""
        reg = self._registry()
        jb = jsonb_bytes({"full": True})
        body = (72).to_bytes(6, "little") + b"\x01\x00"
        body += (2).to_bytes(2, "little") + bytes([2])
        body += bytes([0b11]) + bytes([0b11])
        img = b"\x00" + enc_long(1) + bytes([len(jb)]) + jb
        body += img             # ordinary before-image
        body += bytes([0])      # value_options = 0, no partial_bits
        body += img             # full after-image
        _, rows = BR.decode_rows_event(body, BR.PARTIAL_UPDATE_ROWS_V2, reg)
        assert rows[0]["after"]["col_1"] == '{"full":true}'

    def test_diff_against_vanished_target_quarantines(self):
        """A diff path missing from the before-image is an error (the
        replica drifted) — through the envelope loop it lands in the
        DLQ, it does not silently no-op."""
        from rust_cdc_spark.sources.binlog_file import (
            RawEvent,
            envelopes_from_events,
        )

        reg = BR.TableRegistry()
        reg.handle(BR.decode_table_map(_table_map_with_partial_json()))
        body = self._event_body({"a": 1}, self._diff(0, "$.missing", 9))
        ev = RawEvent(1, BR.PARTIAL_UPDATE_ROWS_V2, 1, 19 + len(body),
                      500, 0, body)
        envs = list(envelopes_from_events(iter([ev]), "b.1", registry=reg))
        assert [e["op"] for e in envs] == ["ERR"]
        assert "missing" in envs[0]["query"]

    def test_truncated_diff_length_field_quarantines(self):
        """ADVICE r8: an event truncated AT the diff-vector length field
        must raise (→ DLQ), not read an empty slice as n=0 and pass the
        before-image through unchanged — a silently wrong after value."""
        import pytest

        reg = self._registry()
        diffs = self._diff(0, "$.a", 2)
        body = self._event_body({"a": 1}, diffs)
        # the JSON column is last: cutting its length byte + vector off
        # leaves pos == len(body) when the length field is read
        cut = body[: len(body) - (len(diffs) + 1)]
        with pytest.raises(ValueError, match="length field truncated"):
            BR.decode_rows_event(cut, BR.PARTIAL_UPDATE_ROWS_V2, reg)

    def test_truncated_diff_vector_quarantines(self):
        """Mid-vector truncation (length byte present, bytes missing)
        raises before decode_diff_vector sees a short slice."""
        import pytest

        reg = self._registry()
        body = self._event_body({"a": 1}, self._diff(0, "$.a", 2))
        with pytest.raises(ValueError, match="diff vector truncated"):
            BR.decode_rows_event(body[:-3], BR.PARTIAL_UPDATE_ROWS_V2, reg)

    def test_quoted_and_nested_paths(self):
        from rust_cdc_spark.functions.json_diff import (
            apply_diffs,
            decode_diff_vector,
            parse_json_path,
        )

        assert parse_json_path('$."weird key"[2].x') == ["weird key", 2, "x"]
        assert parse_json_path("$") == []
        raw = self._diff(0, '$."k.with.dots"', [1, 2])
        diffs = decode_diff_vector(raw)
        assert apply_diffs('{"k.with.dots":null}', diffs) == '{"k.with.dots":[1,2]}'

    def test_root_replace(self):
        from rust_cdc_spark.functions.json_diff import (
            apply_diffs,
            decode_diff_vector,
        )

        diffs = decode_diff_vector(self._diff(0, "$", {"whole": "new"}))
        assert apply_diffs('{"old":1}', diffs) == '{"whole":"new"}'

    def test_array_insert_appends_past_end(self):
        from rust_cdc_spark.functions.json_diff import (
            apply_diffs,
            decode_diff_vector,
        )

        diffs = decode_diff_vector(self._diff(1, "$.b[99]", 4))
        assert apply_diffs('{"b":[1,2,3]}', diffs) == '{"b":[1,2,3,4]}'


def _table_map_with_partial_json() -> bytes:
    """TABLE_MAP for (id LONG, doc JSON) — JSON meta = 1 length byte so
    the synthesized images stay compact."""
    from tests.test_binlog_decode import _table_map_body

    return _table_map_body(
        72, "cdc", "jdoc", [MT.LONG, MT.JSON], metas=bytes([1]),
        nullable_bits=0b10,
    )


class TestRowsQueryEvent:
    """ROWS_QUERY_EVENT (0x1D, binlog_rows_query_log_events=ON): the
    originating SQL text rides the envelope's query column on every row
    of the statement — the audit/lineage surface row-based replication
    otherwise loses. Cleared at transaction boundaries."""

    def test_query_text_attached_to_rows_and_cleared(self):
        from tests.test_binlog_decode import (
            _table_map_body,
            enc_long,
            enc_varchar,
        )

        from rust_cdc_spark.sources.binlog_file import (
            ROWS_QUERY_EVENT,
            XID_EVENT,
            RawEvent,
            envelopes_from_events,
        )

        reg = BR.TableRegistry()
        reg.handle(BR.decode_table_map(_table_map_body(
            71, "cdc", "rustcdc", [MT.LONG, MT.VARCHAR],
            metas=(160).to_bytes(2, "little"), nullable_bits=0b10,
        )))

        def rows_body(n: int) -> bytes:
            img = b"\x00" + enc_long(n) + enc_varchar(f"r{n}")
            return (
                (71).to_bytes(6, "little") + b"\x01\x00"
                + (2).to_bytes(2, "little") + bytes([2]) + bytes([0b11])
                + img
            )

        sql = "INSERT INTO rustcdc VALUES (1, 'r1') /* app=checkout */"
        evs = [
            RawEvent(1, ROWS_QUERY_EVENT, 1, 0, 100, 0,
                     b"\x01" + sql.encode()),
            RawEvent(1, BR.WRITE_ROWS_V2, 1, 0, 200, 0, rows_body(1)),
            RawEvent(1, XID_EVENT, 1, 0, 300, 0, (5).to_bytes(8, "little")),
            # second txn WITHOUT a rows-query event
            RawEvent(1, BR.WRITE_ROWS_V2, 1, 0, 400, 0, rows_body(2)),
            RawEvent(1, XID_EVENT, 1, 0, 500, 0, (6).to_bytes(8, "little")),
        ]
        envs = list(envelopes_from_events(iter(evs), "b.1", registry=reg))
        assert [e["op"] for e in envs] == ["I", "TXN", "I", "TXN"]
        assert envs[0]["query"] == sql
        assert envs[1]["query"] is None  # not smeared onto the Xid
        assert envs[2]["query"] is None  # cleared at the txn boundary


class TestXaTransactions:
    """Two-phase XA through the envelope loop: rows of a prepared
    transaction are HELD until XA COMMIT (pos-pinned to the commit) and
    dropped on XA ROLLBACK — a rolled-back prepare must never emit
    phantom rows. One-phase XA flushes at the prepare event. The
    reference streams XA rows immediately and leaks the XA statements
    as DDL envelopes."""

    XID = "X'6774726964',X'627175616c',1"  # gtrid / bqual / formatID

    def _events(self, outcome: str):
        from tests.test_binlog_decode import (
            _table_map_body,
            enc_long,
            enc_varchar,
        )

        from rust_cdc_spark.sources.binlog_file import (
            QUERY_EVENT,
            XA_PREPARE_LOG_EVENT,
            XID_EVENT,
            RawEvent,
        )

        def q(sql: str, pos: int) -> RawEvent:
            body = (
                (1).to_bytes(4, "little") + (0).to_bytes(4, "little")
                + bytes([3]) + (0).to_bytes(2, "little")
                + (0).to_bytes(2, "little") + b"cdc\x00" + sql.encode()
            )
            return RawEvent(1, QUERY_EVENT, 1, 0, pos, 0, body)

        tmap = _table_map_body(
            71, "cdc", "rustcdc", [MT.LONG, MT.VARCHAR],
            metas=(160).to_bytes(2, "little"), nullable_bits=0b10,
        )

        def rows(n: int, pos: int) -> "RawEvent":
            img = b"\x00" + enc_long(n) + enc_varchar(f"r{n}")
            body = (
                (71).to_bytes(6, "little") + b"\x01\x00"
                + (2).to_bytes(2, "little") + bytes([2]) + bytes([0b11])
                + img
            )
            return RawEvent(1, BR.WRITE_ROWS_V2, 1, 0, pos, 0, body)

        import struct

        one_phase = outcome == "one_phase"
        prep_body = (
            bytes([1 if one_phase else 0])
            + struct.pack("<iii", 1, 5, 5) + b"gtrid" + b"bqual"
        )
        evs = [
            RawEvent(1, BR.TABLE_MAP_EVENT, 1, 0, 90, 0, tmap),
            q(f"XA START {self.XID}", 100),
            RawEvent(1, BR.TABLE_MAP_EVENT, 1, 0, 150, 0, tmap),
            rows(1, 200),
            q(f"XA END {self.XID}", 250),
            RawEvent(1, XA_PREPARE_LOG_EVENT, 1, 0, 300, 0, prep_body),
            # an ORDINARY transaction interleaves before the XA decision
            RawEvent(1, BR.TABLE_MAP_EVENT, 1, 0, 350, 0, tmap),
            rows(2, 400),
            RawEvent(1, XID_EVENT, 1, 0, 450, 0, (9).to_bytes(8, "little")),
        ]
        if outcome == "commit":
            evs.append(q(f"XA COMMIT {self.XID}", 500))
        elif outcome == "rollback":
            evs.append(q(f"XA ROLLBACK {self.XID}", 500))
        return evs

    def _run(self, outcome: str):
        from rust_cdc_spark.sources.binlog_file import envelopes_from_events

        return list(envelopes_from_events(iter(self._events(outcome)), "b.1"))

    def test_commit_releases_rows_pos_pinned_after_interleaved_txn(self):
        envs = self._run("commit")
        ops = [(e["op"], e.get("after", {}) or {}) for e in envs]
        # interleaved txn first (row 2), then the decided XA rows (row 1)
        assert [e["op"] for e in envs] == ["I", "TXN", "I", "TXN"]
        assert envs[0]["after"]["col_0"] == 2
        assert envs[2]["after"]["col_0"] == 1
        assert envs[2]["pos"] == 500  # pinned to the XA COMMIT
        assert "XA COMMIT" in envs[3]["query"]
        # and no XA statement leaked as a DDL envelope
        assert all(e["op"] != "DDL" for e in envs), ops

    def test_rollback_emits_no_phantom_rows(self):
        envs = self._run("rollback")
        assert [e["op"] for e in envs] == ["I", "TXN"]
        assert envs[0]["after"]["col_0"] == 2  # only the ordinary txn

    def test_one_phase_flushes_at_prepare(self):
        envs = self._run("one_phase")
        assert [e["op"] for e in envs] == ["I", "TXN", "I", "TXN"]
        assert envs[0]["after"]["col_0"] == 1  # decided at prepare (pos 300)
        assert envs[0]["pos"] == 300
        assert envs[2]["after"]["col_0"] == 2

    def test_one_phase_marker_carries_decoded_xid(self):
        """ADVICE r8: the prepare-event one-phase TXN marker renders the
        decoded xid (gtrid/bqual/formatID) for audit linkage, matching
        what the QUERY-form path preserves via the statement text."""
        envs = self._run("one_phase")
        marker = envs[1]["query"]
        assert marker == (
            f"XA COMMIT X'{b'gtrid'.hex()}',X'{b'bqual'.hex()}',1 ONE PHASE"
        )

    def test_xid_text_roundtrip(self):
        from rust_cdc_spark.sources.binlog_file import _parse_xa_xid

        assert _parse_xa_xid(f"XA COMMIT {self.XID}") == (1, b"gtrid", b"bqual")
        assert _parse_xa_xid("XA ROLLBACK X'61'") == (1, b"a", b"")
        assert _parse_xa_xid("XA RECOVER") is None

    def test_xa_spanning_two_compressed_payloads(self):
        """The composition that actually occurs on a
        binlog_transaction_compression=ON server: the prepared XA txn
        and its XA COMMIT arrive in DIFFERENT payload events. The XA
        buffer is shared with the payload recursion, so the rows
        survive the payload boundary and release at the commit."""
        from rust_cdc_spark.sources.binlog_file import (
            TRANSACTION_PAYLOAD_EVENT,
            RawEvent,
            envelopes_from_events,
        )

        evs = self._events("commit")
        # wrap [XA START .. XA PREPARE] in payload A, the interleaved
        # ordinary txn in payload B, and XA COMMIT in payload C
        def wrap(raw_events, log_pos):
            inner = b"".join(
                TestTransactionPayload._frame(e.type_code, e.body,
                                              log_pos=e.log_pos)
                for e in raw_events
            )
            body = TestTransactionPayload._tp_body(inner, compression=255)
            return RawEvent(1, TRANSACTION_PAYLOAD_EVENT, 1,
                            19 + len(body), log_pos, 0, body)

        outer = [
            evs[0],                      # TABLE_MAP (outside, fine)
            wrap(evs[1:6], 1000),        # XA START..PREPARE
            wrap(evs[6:9], 2000),        # ordinary txn
            wrap(evs[9:], 3000),         # XA COMMIT
        ]
        envs = list(envelopes_from_events(iter(outer), "b.1"))
        assert [e["op"] for e in envs] == ["I", "TXN", "I", "TXN"]
        assert envs[0]["after"]["col_0"] == 2   # ordinary txn first
        assert envs[2]["after"]["col_0"] == 1   # XA rows at the commit
        assert envs[2]["pos"] == 3000           # pinned to payload C

    def test_partial_bits_span_all_table_json_columns(self):
        """binlog_row_image=MINIMAL shape: a table with TWO JSON columns
        where only the second appears in the after-image. The
        partial_bits bitmap is indexed over the TABLE's JSON columns
        (bit 1 = second JSON column), not over after-image membership —
        the real-server domain (go-mysql sizes it from JsonColumnCount)."""
        from tests.test_binlog_decode import _table_map_body, enc_long

        reg = BR.TableRegistry()
        reg.handle(BR.decode_table_map(_table_map_body(
            73, "cdc", "jj", [MT.LONG, MT.JSON, MT.JSON],
            metas=bytes([1, 1]), nullable_bits=0b110,
        )))
        before_doc2 = {"n": 1}
        jb1 = jsonb_bytes({"other": True})
        jb2 = jsonb_bytes(before_doc2)
        diffs = TestPartialJsonUpdate._diff(0, "$.n", 99)
        body = (73).to_bytes(6, "little") + b"\x01\x00"
        body += (2).to_bytes(2, "little") + bytes([3])
        body += bytes([0b111])  # present1: full before-image
        body += bytes([0b101])  # present2: id + SECOND json col only
        # before image: 3 present cols → 1-byte null bitmap + values
        body += (
            b"\x00" + enc_long(5)
            + bytes([len(jb1)]) + jb1 + bytes([len(jb2)]) + jb2
        )
        body += bytes([1])      # value_options: PARTIAL_JSON
        body += bytes([0b10])   # partial bit 1 → the second table JSON col
        # after image: 2 present cols → 1-byte null bitmap + values
        body += b"\x00" + enc_long(5) + bytes([len(diffs)]) + diffs
        _, rows = BR.decode_rows_event(body, BR.PARTIAL_UPDATE_ROWS_V2, reg)
        [row] = rows
        assert "col_1" not in row["after"]  # not in the after-image
        assert row["after"]["col_2"] == '{"n":99}'
        assert row["before"]["col_1"] == '{"other":true}'

    def test_commit_for_unknown_prepare_is_dlq(self):
        """XA COMMIT for a txn prepared before this stream's start
        offset: the rows are unrecoverable from here — one loud DLQ
        record, never a silent no-op."""
        from rust_cdc_spark.sources.binlog_file import envelopes_from_events

        evs = [e for e in self._events("commit")
               if e.type_code == 0x02 and b"XA COMMIT" in e.body]
        envs = list(envelopes_from_events(iter(evs), "b.1"))
        assert [e["op"] for e in envs] == ["ERR"]
        assert "unknown prepared" in envs[0]["query"]

    def test_unresolved_prepare_at_stream_end_is_dlq(self):
        """Stream (or microbatch) ends between XA PREPARE and its
        decision: the held rows surface as a DLQ record naming the xid
        and the recovery action — the cross-microbatch case is loud,
        not silent loss."""
        from rust_cdc_spark.sources.binlog_file import envelopes_from_events

        evs = self._events("commit")[:-1]  # drop the XA COMMIT
        envs = list(envelopes_from_events(iter(evs), "b.1"))
        # ordinary interleaved txn still flows; the XA rows become ERR
        assert [e["op"] for e in envs] == ["I", "TXN", "ERR"]
        assert "unresolved XA prepare" in envs[2]["query"]
        assert "1 row(s)" in envs[2]["query"]

    def test_commit_after_rotation_pins_current_file(self):
        """Prepare in one binlog file, commit in the next: released
        rows must carry the COMMIT's (file, pos) — a (prepare-file,
        commit-pos) pair points at unrelated bytes."""
        from rust_cdc_spark.sources.binlog_file import (
            ROTATE_EVENT,
            RawEvent,
            envelopes_from_events,
        )

        evs = self._events("commit")
        commit = evs[-1]
        rotate = RawEvent(1, ROTATE_EVENT, 1, 0, 0, 0,
                          (4).to_bytes(8, "little") + b"b.2")
        envs = list(envelopes_from_events(
            iter(evs[:-1] + [rotate, commit]), "b.1"
        ))
        released = [e for e in envs if e["op"] == "I"
                    and e["after"]["col_0"] == 1]
        assert released[0]["file"] == "b.2"
        assert released[0]["pos"] == commit.log_pos

    def test_unparseable_xid_text_still_pairs_via_raw_tail(self):
        """START/COMMIT texts the xid regex can't parse still pair via
        the normalized statement tail, so the rows release at commit
        instead of leaking."""
        from rust_cdc_spark.sources.binlog_file import (
            _parse_xa_xid,
            envelopes_from_events,
        )

        weird = "'plain-string-xid',12345"  # not the X'..' form
        assert _parse_xa_xid(f"XA START {weird}") is None
        evs = self._events("commit")

        def swap(e):
            if e.type_code != 0x02:
                return e
            sql = e.body[13 + 4:].decode()
            for verb in ("XA START", "XA END", "XA COMMIT"):
                if sql.startswith(verb):
                    from rust_cdc_spark.sources.binlog_file import RawEvent
                    return RawEvent(e.timestamp, e.type_code, e.server_id,
                                    e.event_size, e.log_pos, e.flags,
                                    _q_body_ext(f"{verb} {weird}"))
            return e

        envs = list(envelopes_from_events(iter([swap(e) for e in evs]), "b.1"))
        assert [e["op"] for e in envs] == ["I", "TXN", "I", "TXN"]
        assert envs[2]["after"]["col_0"] == 1  # released at the commit


def _q_body_ext(sql: str) -> bytes:
    return (
        (1).to_bytes(4, "little") + (0).to_bytes(4, "little") + bytes([3])
        + (0).to_bytes(2, "little") + (0).to_bytes(2, "little")
        + b"cdc\x00" + sql.encode()
    )


class TestXaOnePhaseAndEdgeCases:
    """Real-server one-phase XA (logged as QUERY 'XA COMMIT ... ONE
    PHASE' with NO prepare event — the prepare-event one_phase flag is
    a format capability, not what servers emit), empty prepared txns,
    and corrupt-prepare quarantine (round-8 second review pass)."""

    XID = "X'6774726964',X'627175616c',1"

    def _q(self, sql: str, pos: int):
        from rust_cdc_spark.sources.binlog_file import QUERY_EVENT, RawEvent

        return RawEvent(1, QUERY_EVENT, 1, 0, pos, 0, _q_body_ext(sql))

    def _tmap(self, pos: int):
        from tests.test_binlog_decode import _table_map_body

        from rust_cdc_spark.sources.binlog_file import RawEvent

        body = _table_map_body(
            71, "cdc", "rustcdc", [MT.LONG, MT.VARCHAR],
            metas=(160).to_bytes(2, "little"), nullable_bits=0b10,
        )
        return RawEvent(1, BR.TABLE_MAP_EVENT, 1, 0, pos, 0, body)

    def _rows(self, n: int, pos: int):
        from tests.test_binlog_decode import enc_long, enc_varchar

        from rust_cdc_spark.sources.binlog_file import RawEvent

        img = b"\x00" + enc_long(n) + enc_varchar(f"r{n}")
        body = (
            (71).to_bytes(6, "little") + b"\x01\x00"
            + (2).to_bytes(2, "little") + bytes([2]) + bytes([0b11]) + img
        )
        return RawEvent(1, BR.WRITE_ROWS_V2, 1, 0, pos, 0, body)

    def _xid_ev(self, pos: int):
        from rust_cdc_spark.sources.binlog_file import XID_EVENT, RawEvent

        return RawEvent(1, XID_EVENT, 1, 0, pos, 0, (9).to_bytes(8, "little"))

    def test_one_phase_query_commit_does_not_swallow_later_rows(self):
        """The statement context MUST close at the ONE PHASE commit —
        otherwise every subsequent ordinary row would be buffered under
        the decided xid and silently withheld."""
        from rust_cdc_spark.sources.binlog_file import envelopes_from_events

        evs = [
            self._q(f"XA START {self.XID}", 100),
            self._tmap(150), self._rows(1, 200),
            self._q(f"XA END {self.XID}", 250),
            self._q(f"XA COMMIT {self.XID} ONE PHASE", 300),
            # ordinary txn AFTER the one-phase commit
            self._tmap(350), self._rows(2, 400), self._xid_ev(450),
        ]
        envs = list(envelopes_from_events(iter(evs), "b.1"))
        assert [e["op"] for e in envs] == ["I", "TXN", "I", "TXN"]
        assert envs[0]["after"]["col_0"] == 1 and envs[0]["pos"] == 300
        assert envs[2]["after"]["col_0"] == 2  # NOT swallowed

    def test_one_phase_with_unparseable_xid_pairs_via_tail(self):
        """ONE PHASE suffix is stripped from the raw-tail key so an
        exotic xid's START and one-phase COMMIT still pair."""
        from rust_cdc_spark.sources.binlog_file import envelopes_from_events

        weird = "'plain',7"
        evs = [
            self._q(f"XA START {weird}", 100),
            self._tmap(150), self._rows(1, 200),
            self._q(f"XA END {weird}", 250),
            self._q(f"XA COMMIT {weird} ONE PHASE", 300),
        ]
        envs = list(envelopes_from_events(iter(evs), "b.1"))
        assert [e["op"] for e in envs] == ["I", "TXN"]
        assert envs[0]["after"]["col_0"] == 1

    def test_empty_prepared_txn_commit_is_clean(self):
        """A prepared txn with zero decoded rows (empty, or all rows
        DLQ'd) gets a TXN marker at commit — never a false
        unknown-prepare ERR."""
        import struct

        from rust_cdc_spark.sources.binlog_file import (
            XA_PREPARE_LOG_EVENT,
            RawEvent,
            envelopes_from_events,
        )

        prep = RawEvent(
            1, XA_PREPARE_LOG_EVENT, 1, 0, 300, 0,
            bytes([0]) + struct.pack("<iii", 1, 5, 5) + b"gtridbqual",
        )
        evs = [
            self._q("XA START X'6774726964',X'627175616c',1", 100),
            self._q("XA END X'6774726964',X'627175616c',1", 200),
            prep,
            self._q("XA COMMIT X'6774726964',X'627175616c',1", 400),
        ]
        envs = list(envelopes_from_events(iter(evs), "b.1"))
        assert [e["op"] for e in envs] == ["TXN"]

    def test_corrupt_prepare_quarantines_not_crashes(self):
        from rust_cdc_spark.sources.binlog_file import (
            XA_PREPARE_LOG_EVENT,
            RawEvent,
            envelopes_from_events,
        )

        bad = RawEvent(1, XA_PREPARE_LOG_EVENT, 1, 0, 300, 0, b"\x00\x01")
        evs = [bad, self._tmap(350), self._rows(2, 400), self._xid_ev(450)]
        envs = list(envelopes_from_events(iter(evs), "b.1"))
        assert [e["op"] for e in envs] == ["ERR", "I", "TXN"]

    def test_truncated_diff_vector_is_dlq(self):
        """A diff whose path length overruns the buffer raises (→ DLQ),
        never silently applies a truncated path."""
        import pytest as _pytest

        from rust_cdc_spark.functions.json_diff import decode_diff_vector

        raw = bytes([0]) + bytes([50]) + b"$.a"  # claims 50, has 3
        with _pytest.raises(ValueError, match="truncated"):
            decode_diff_vector(raw)
