"""MySQL binary JSON (JSONB) decode — binlog JSON columns → JSON text.

Row events carry JSON columns in MySQL's binary JSON format, publicly
documented in mysql-server ``sql/json_binary.cc`` (the long header
comment specifies every byte). The reference does NOT decode it — its
``Json(serde_json::Value)`` variant lives only in the unused
``value.rs`` model, and raw JSONB bytes pass through untouched — so this
module goes beyond reference parity, like the v2 fractional-second
temporals in ``mysql_types``.

Layout summary (from the public spec):

- value        = type byte + payload
- 0x00/0x01    small/large object:  count, size (u16/u32 each), then
                ``count`` key entries (offset u16/u32 + key length u16),
                then ``count`` value entries (type byte + u16/u32 offset
                OR the value inlined when it fits), then keys, then values
- 0x02/0x03    small/large array: same without key entries
- 0x04         literal: 0x00 null / 0x01 true / 0x02 false
- 0x05..0x0a   int16/uint16/int32/uint32/int64/uint64 (LE)
- 0x0b         double (LE IEEE754)
- 0x0c         utf8mb4 string: varint length (7 bits/byte, high bit =
               continuation) + bytes
- 0x0f         opaque: 1 column-type byte + varint length + payload
               (DECIMAL as packed-BCD with a 2-byte p/s header; temporal
               types as the 8-byte packed my_time integer)

Decoded values render to JSON text (``json.dumps``) so the Spark-side
column is a plain queryable string — ``F.get_json_object`` /
``from_json`` take it from there.
"""

from __future__ import annotations

import datetime
import json
import struct

_SMALL_OBJECT = 0x00
_LARGE_OBJECT = 0x01
_SMALL_ARRAY = 0x02
_LARGE_ARRAY = 0x03
_LITERAL = 0x04
_INT16 = 0x05
_UINT16 = 0x06
_INT32 = 0x07
_UINT32 = 0x08
_INT64 = 0x09
_UINT64 = 0x0A
_DOUBLE = 0x0B
_STRING = 0x0C
_OPAQUE = 0x0F

# Inlined-in-offset-field types: small format fits 2 bytes, large 4.
_INLINE_SMALL = {_LITERAL, _INT16, _UINT16}
_INLINE_LARGE = _INLINE_SMALL | {_INT32, _UINT32}


def _varint(buf: bytes, off: int) -> tuple[int, int]:
    """Variable-length length field: 7 bits per byte, LE groups, high bit
    set on all but the last byte."""
    n = shift = 0
    while True:
        b = buf[off]
        off += 1
        n |= (b & 0x7F) << shift
        if not b & 0x80:
            return n, off
        shift += 7


def _opaque(buf: bytes) -> object:
    """Opaque value: packed DECIMAL or packed temporal, else hex text."""
    from rust_cdc_spark.functions import mysql_types as MT

    field_type = buf[0]
    _, off = _varint(buf, 1)
    data = buf[off:]
    if field_type in (MT.DECIMAL, MT.NEWDECIMAL):
        p, s = data[0], data[1]
        v, _ = MT.decode_newdecimal(data, 2, p, s)
        return str(v)
    if field_type in (MT.DATE, MT.DATETIME, MT.DATETIME2, MT.TIMESTAMP2,
                      MT.TIME, MT.TIME2):
        packed = int.from_bytes(data[:8], "little", signed=True)
        return _packed_temporal(field_type, packed)
    return data.hex()


def _packed_temporal(field_type: int, packed: int) -> str:
    """my_time.h packed temporal: value<<24 | microseconds, with
    value = ((year*13+month)<<5 | day) << 17 | hour<<12 | min<<6 | sec."""
    from rust_cdc_spark.functions import mysql_types as MT

    neg = packed < 0
    packed = abs(packed)
    micros = packed % (1 << 24)
    v = packed >> 24
    if field_type in (MT.TIME, MT.TIME2):
        hour = (v >> 12) & 0x3FF
        minute = (v >> 6) & 0x3F
        second = v & 0x3F
        base = f"{'-' if neg else ''}{hour:02d}:{minute:02d}:{second:02d}"
        return base + (f".{micros:06d}" if micros else "")
    day = (v >> 17) & 0x1F
    ym = v >> 22
    year, month = divmod(ym, 13)
    hour = (v >> 12) & 0x1F
    minute = (v >> 6) & 0x3F
    second = v & 0x3F
    if field_type == MT.DATE:
        return datetime.date(year, month, day).isoformat()
    dt = datetime.datetime(year, month, day, hour, minute, second, micros)
    return dt.isoformat(sep=" ")


def _value(buf: bytes, type_byte: int, off: int) -> object:
    if type_byte in (_SMALL_OBJECT, _LARGE_OBJECT):
        return _container(buf, off, large=type_byte == _LARGE_OBJECT, obj=True)
    if type_byte in (_SMALL_ARRAY, _LARGE_ARRAY):
        return _container(buf, off, large=type_byte == _LARGE_ARRAY, obj=False)
    if type_byte == _LITERAL:
        return {0x00: None, 0x01: True, 0x02: False}[buf[off]]
    if type_byte == _INT16:
        return int.from_bytes(buf[off : off + 2], "little", signed=True)
    if type_byte == _UINT16:
        return int.from_bytes(buf[off : off + 2], "little")
    if type_byte == _INT32:
        return int.from_bytes(buf[off : off + 4], "little", signed=True)
    if type_byte == _UINT32:
        return int.from_bytes(buf[off : off + 4], "little")
    if type_byte == _INT64:
        return int.from_bytes(buf[off : off + 8], "little", signed=True)
    if type_byte == _UINT64:
        return int.from_bytes(buf[off : off + 8], "little")
    if type_byte == _DOUBLE:
        return struct.unpack_from("<d", buf, off)[0]
    if type_byte == _STRING:
        n, off = _varint(buf, off)
        return buf[off : off + n].decode("utf-8", errors="replace")
    if type_byte == _OPAQUE:
        return _opaque(buf[off:])
    raise ValueError(f"unknown JSONB type byte {type_byte:#x}")


def _container(buf: bytes, base: int, large: bool, obj: bool) -> object:
    w = 4 if large else 2
    inline = _INLINE_LARGE if large else _INLINE_SMALL
    count = int.from_bytes(buf[base : base + w], "little")
    pos = base + 2 * w  # skip count + size
    keys: list[str] = []
    if obj:
        for _ in range(count):
            koff = int.from_bytes(buf[pos : pos + w], "little")
            klen = int.from_bytes(buf[pos + w : pos + w + 2], "little")
            keys.append(
                buf[base + koff : base + koff + klen].decode("utf-8", errors="replace")
            )
            pos += w + 2
    values: list[object] = []
    for _ in range(count):
        tb = buf[pos]
        if tb in inline:
            values.append(_value(buf, tb, pos + 1))
        else:
            voff = int.from_bytes(buf[pos + 1 : pos + 1 + w], "little")
            values.append(_value(buf, tb, base + voff))
        pos += 1 + w
    return dict(zip(keys, values)) if obj else values


def decode_jsonb(data: bytes) -> object:
    """JSONB bytes → Python value (empty payload = JSON null)."""
    if not data:
        return None
    return _value(data, data[0], 1)


def decode_jsonb_text(data: bytes) -> str:
    """JSONB bytes → compact JSON text for the Spark string column."""
    return json.dumps(decode_jsonb(data), separators=(",", ":"), ensure_ascii=False)
