"""Golden decode tests for the binlog type system (FIXTURES.md F1-F4).

Wire bytes are synthesized in-test from the public binlog format (an
independent hand-encoding, not shared with the decoder), then decoded and
asserted against the same values the reference's golden corpus asserts
(/root/reference/tests/test.rs:134-242): insert image ``[1, 'cdc-1']``,
update before/after across numeric/decimal types, delete image.
"""

from __future__ import annotations

import datetime
import struct
from decimal import Decimal

import pytest

from rust_cdc_spark.functions import mysql_types as MT
from rust_cdc_spark.sources import binlog_rows as BR


# ── independent little encoders (test-local) ────────────────────────────

def enc_varchar(s: str, max_len: int = 160) -> bytes:
    raw = s.encode()
    if max_len > 255:
        return len(raw).to_bytes(2, "little") + raw
    return bytes([len(raw)]) + raw


def enc_long(v: int) -> bytes:
    return v.to_bytes(4, "little", signed=True)


def enc_newdecimal(text: str, p: int, s: int) -> bytes:
    """Hand-packed BCD per the documented format."""
    d = Decimal(text)
    negative = d < 0
    d = d.copy_abs()  # context-free; abs() rounds to context precision (28 digits)
    int_digits, frac_digits = p - s, s
    q = f"{d:.{s}f}"  # fixed-point, never scientific notation
    if "." in q:
        ip, fp = q.split(".")
    else:
        ip, fp = q, ""
    ip = ip.lstrip("-").zfill(int_digits)
    fp = fp.ljust(frac_digits, "0")
    out = bytearray()
    # integer part: leading partial group then full 9-digit groups
    lead = int_digits % 9
    pos = 0
    if lead:
        out += int(ip[:lead]).to_bytes(MT._DIG2BYTES[lead], "big")
        pos = lead
    while pos < int_digits:
        out += int(ip[pos : pos + 9]).to_bytes(4, "big")
        pos += 9
    pos = 0
    while pos + 9 <= frac_digits:
        out += int(fp[pos : pos + 9]).to_bytes(4, "big")
        pos += 9
    tail = frac_digits - pos
    if tail:
        out += int(fp[pos:]).to_bytes(MT._DIG2BYTES[tail], "big")
    if negative:
        out = bytearray(b ^ 0xFF for b in out)
    out[0] ^= 0x80
    return bytes(out)


class TestScalarDecode:
    def test_lenenc_int(self):
        assert MT.read_lenenc_int(b"\x05", 0) == (5, 1)
        assert MT.read_lenenc_int(b"\xfc\x34\x12", 0) == (0x1234, 3)
        assert MT.read_lenenc_int(b"\xfd\x56\x34\x12", 0) == (0x123456, 4)
        assert MT.read_lenenc_int(b"\xfe" + (99).to_bytes(8, "little"), 0) == (99, 9)

    def test_long_roundtrip(self):
        v, off = MT.decode_value(enc_long(1), 0, MT.LONG)
        assert (v, off) == (1, 4)
        v, _ = MT.decode_value(enc_long(-7), 0, MT.LONG)
        assert v == -7
        v, _ = MT.decode_value(b"\xff\xff\xff\xff", 0, MT.LONG, unsigned=True)
        assert v == 4294967295

    def test_varchar_cdc1(self):
        """Reference golden: VarChar('cdc-1') (tests/test.rs:140-159)."""
        v, off = MT.decode_value(enc_varchar("cdc-1"), 0, MT.VARCHAR, (160,))
        assert (v, off) == ("cdc-1", 6)

    def test_varchar_two_byte_len(self):
        v, _ = MT.decode_value(enc_varchar("x" * 300, 1000), 0, MT.VARCHAR, (1000,))
        assert v == "x" * 300

    def test_float_double(self):
        v, _ = MT.decode_value(struct.pack("<f", 4.0), 0, MT.FLOAT, (4,))
        assert v == 4.0
        v, _ = MT.decode_value(struct.pack("<d", 2.0), 0, MT.DOUBLE, (8,))
        assert v == 2.0

    @pytest.mark.parametrize(
        "text,p,s",
        [
            ("3.0000", 10, 4),
            ("4.0000", 10, 4),
            ("1234.5678", 10, 4),
            ("-1234.5678", 10, 4),
            ("0.0000", 10, 4),
            ("-0.0100", 10, 4),
            ("123456789012.34", 14, 2),
            ("-99999999.999999999", 17, 9),
            ("42", 5, 0),
        ],
    )
    def test_newdecimal_golden(self, text, p, s):
        buf = enc_newdecimal(text, p, s)
        assert len(buf) == MT.decimal_binary_size(p, s)
        v, off = MT.decode_newdecimal(buf, 0, p, s)
        assert off == len(buf)
        assert v == Decimal(text)

    def test_datetime2_with_fraction(self):
        """The fsp decode the reference left unresolved
        (event/mod.rs:388-390)."""
        ym = 2021 * 13 + 3
        packed = (1 << 39) | (ym << 22) | (4 << 17) | (5 << 12) | (6 << 6) | 7
        frac = 2500  # fsp=3 → 2 bytes, unit 100 µs → 250000 µs
        buf = packed.to_bytes(5, "big") + frac.to_bytes(2, "big")
        v, off = MT.decode_datetime2(buf, 0, fsp=3)
        assert v == datetime.datetime(2021, 3, 4, 5, 6, 7, 250000)
        assert off == 7

    def test_timestamp2(self):
        secs = 1_600_000_000
        buf = secs.to_bytes(4, "big")
        v, off = MT.decode_timestamp2(buf, 0, fsp=0)
        assert v == datetime.datetime(2020, 9, 13, 12, 26, 40)

    def test_time2_negative(self):
        packed = (1 << 23) | (1 << 12) | (2 << 6) | 3  # +01:02:03
        v, _ = MT.decode_time2(packed.to_bytes(3, "big"), 0)
        assert v == "01:02:03"
        neg = (1 << 24) - packed
        v, _ = MT.decode_time2(neg.to_bytes(3, "big"), 0)
        assert v == "-01:02:03"

    def test_date(self):
        packed = (2024 << 9) | (8 << 5) | 13
        v, _ = MT.decode_date(packed.to_bytes(3, "little"), 0)
        assert v == datetime.date(2024, 8, 13)

    def test_blob_text(self):
        buf = (3).to_bytes(2, "little") + b"abc"
        v, off = MT.decode_value(buf, 0, MT.BLOB, (2,))
        assert (v, off) == ("abc", 5)


class TestSparkTypeMapping:
    """SURVEY.md §1.3 mapping table."""

    def test_unsigned_widening(self):
        from pyspark.sql import types as T

        assert MT.spark_type_for(MT.LONG) == T.IntegerType()
        assert MT.spark_type_for(MT.LONG, unsigned=True) == T.LongType()
        assert MT.spark_type_for(MT.LONGLONG, unsigned=True) == T.DecimalType(20, 0)
        assert MT.spark_type_for(MT.NEWDECIMAL, (10, 4)) == T.DecimalType(10, 4)
        assert MT.spark_type_for(MT.VARCHAR, (160,)) == T.StringType()
        assert MT.spark_type_for(MT.BLOB, is_text=True) == T.StringType()
        assert MT.spark_type_for(MT.BLOB) == T.BinaryType()
        assert MT.spark_type_for(MT.DATETIME2, (3,)) == T.TimestampNTZType()


def _table_map_body(
    table_id: int, schema: str, table: str, col_types: list[int], metas: bytes,
    nullable_bits: int = 0,
) -> bytes:
    body = table_id.to_bytes(6, "little") + b"\x01\x00"
    body += bytes([len(schema)]) + schema.encode() + b"\x00"
    body += bytes([len(table)]) + table.encode() + b"\x00"
    body += bytes([len(col_types)]) + bytes(col_types)
    body += bytes([len(metas)]) + metas
    body += nullable_bits.to_bytes((len(col_types) + 7) // 8, "little")
    return body


class TestTableMapAndRows:
    """F1/F2 fixture shape: rustcdc(id INT, title VARCHAR(40)) —
    reference asserts table id 71, cols [Long, VarChar(160)]
    (tests/test.rs:92-131)."""

    def _registry(self):
        body = _table_map_body(
            71, "cdc", "rustcdc", [MT.LONG, MT.VARCHAR],
            metas=(160).to_bytes(2, "little"), nullable_bits=0b10,
        )
        entry = BR.decode_table_map(body)
        reg = BR.TableRegistry()
        reg.handle(entry)
        return reg, entry

    def test_table_map_decode(self):
        _, entry = self._registry()
        assert entry.table_id == 71
        assert (entry.schema_name, entry.table_name) == ("cdc", "rustcdc")
        assert entry.column_types == [MT.LONG, MT.VARCHAR]
        assert entry.column_metas == [(), (160,)]
        assert entry.nullable == [False, True]

    def _rows_body(self, images: list[bytes], event_type: int, n_cols=2) -> bytes:
        body = (71).to_bytes(6, "little") + b"\x01\x00"
        if event_type in BR._V2_EVENTS:
            body += (2).to_bytes(2, "little")  # extra-data: just the len
        body += bytes([n_cols])
        bm = bytes([(1 << n_cols) - 1])
        body += bm
        if event_type in BR._UPDATE_EVENTS:
            body += bm
        for img in images:
            body += img
        return body

    def test_write_rows_v2_golden(self):
        """Insert image [Long(1), VarChar('cdc-1')]
        (reference tests/test.rs:134-172)."""
        reg, _ = self._registry()
        img = b"\x00" + enc_long(1) + enc_varchar("cdc-1")  # null bitmap 0
        tid, rows = BR.decode_rows_event(
            self._rows_body([img], BR.WRITE_ROWS_V2), BR.WRITE_ROWS_V2, reg
        )
        assert tid == 71
        assert rows == [{"after": {"col_0": 1, "col_1": "cdc-1"}}]

    def test_update_rows_v2_golden(self):
        """Update before ('abc') → after ('xd')
        (reference tests/test.rs:175-242 shape)."""
        reg, _ = self._registry()
        img = (
            b"\x00" + enc_long(1) + enc_varchar("abc")
            + b"\x00" + enc_long(1) + enc_varchar("xd")
        )
        _, rows = BR.decode_rows_event(
            self._rows_body([img], BR.UPDATE_ROWS_V2), BR.UPDATE_ROWS_V2, reg
        )
        assert rows == [
            {
                "before": {"col_0": 1, "col_1": "abc"},
                "after": {"col_0": 1, "col_1": "xd"},
            }
        ]

    def test_delete_rows_v2_golden(self):
        """Delete image [Long(1), VarChar('abcde')]
        (reference tests/test.rs:245-289)."""
        reg, _ = self._registry()
        img = b"\x00" + enc_long(1) + enc_varchar("abcde")
        _, rows = BR.decode_rows_event(
            self._rows_body([img], BR.DELETE_ROWS_V2), BR.DELETE_ROWS_V2, reg
        )
        assert rows == [{"before": {"col_0": 1, "col_1": "abcde"}}]

    def test_null_value_in_row(self):
        reg, _ = self._registry()
        img = b"\x02" + enc_long(9)  # bit 1 set → col_1 NULL, value absent
        _, rows = BR.decode_rows_event(
            self._rows_body([img], BR.WRITE_ROWS_V2), BR.WRITE_ROWS_V2, reg
        )
        assert rows == [{"after": {"col_0": 9, "col_1": None}}]

    def test_multi_row_event(self):
        reg, _ = self._registry()
        imgs = b"".join(
            b"\x00" + enc_long(i) + enc_varchar(f"r{i}") for i in (1, 2, 3)
        )
        _, rows = BR.decode_rows_event(
            self._rows_body([imgs], BR.WRITE_ROWS_V2), BR.WRITE_ROWS_V2, reg
        )
        assert [r["after"]["col_0"] for r in rows] == [1, 2, 3]

    def test_wide_type_update_golden(self):
        """F3 fixture shape: 9 columns incl. FLOAT/DOUBLE/NEWDECIMAL;
        before (…,1.0,2.0,3.0000) → after (…,4.0,4.0,4.0000)."""
        metas = bytes([4, 8, 10, 4])  # float len, double len, decimal p,s
        body = _table_map_body(
            72, "cdc", "wide",
            [MT.LONG, MT.FLOAT, MT.DOUBLE, MT.NEWDECIMAL],
            metas=metas,
        )
        reg = BR.TableRegistry()
        reg.handle(BR.decode_table_map(body))
        before = (
            b"\x00" + enc_long(1) + struct.pack("<f", 1.0)
            + struct.pack("<d", 2.0) + enc_newdecimal("3.0000", 10, 4)
        )
        after = (
            b"\x00" + enc_long(1) + struct.pack("<f", 4.0)
            + struct.pack("<d", 4.0) + enc_newdecimal("4.0000", 10, 4)
        )
        rows_body = (
            (72).to_bytes(6, "little") + b"\x01\x00"
            + (2).to_bytes(2, "little")
            + bytes([4]) + b"\x0f" + b"\x0f"
            + before + after
        )
        _, rows = BR.decode_rows_event(rows_body, BR.UPDATE_ROWS_V2, reg)
        b, a = rows[0]["before"], rows[0]["after"]
        assert (b["col_1"], b["col_2"], b["col_3"]) == (1.0, 2.0, Decimal("3.0000"))
        assert (a["col_1"], a["col_2"], a["col_3"]) == (4.0, 4.0, Decimal("4.0000"))


class TestPropertyDecimal:
    """Property-based NewDecimal coverage: random (precision, scale,
    value) triples round-trip through the independent test encoder and
    the engine decoder."""

    from hypothesis import given, settings
    from hypothesis import strategies as st

    @staticmethod
    @st.composite
    def decimals(draw):
        from tests.test_binlog_decode import TestPropertyDecimal as _T  # noqa
        p = draw(_T.st.integers(min_value=1, max_value=30))
        s = draw(_T.st.integers(min_value=0, max_value=min(p, 20)))
        int_digits = p - s
        int_part = draw(_T.st.integers(min_value=0, max_value=10**int_digits - 1)) if int_digits else 0
        frac_part = draw(_T.st.integers(min_value=0, max_value=10**s - 1)) if s else 0
        sign = draw(_T.st.sampled_from(["", "-"]))
        text = f"{sign}{int_part}"
        if s:
            text += f".{frac_part:0{s}d}"
        return text, p, s

    @settings(max_examples=200, deadline=None)
    @given(case=decimals())
    def test_roundtrip(self, case):
        from decimal import Decimal

        text, p, s = case
        buf = enc_newdecimal(text, p, s)
        assert len(buf) == MT.decimal_binary_size(p, s)
        v, off = MT.decode_newdecimal(buf, 0, p, s)
        assert off == len(buf)
        assert v == Decimal(text), (text, p, s, v)
