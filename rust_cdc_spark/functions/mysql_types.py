"""MySQL column-type system → Spark types, plus binlog value decode.

The wire model follows the binlog TABLE_MAP/ROWS event format as publicly
documented (MySQL source: libbinlogevents; dev.mysql.com binary-log
docs). The reference implements the same decode in Rust
(``ColTypes::read_value``, /root/reference/src/mysql/event/mod.rs:461-571;
type codes at :404-440) — this module re-derives it in Python for the
Spark source's batch decoder, and goes further than the reference on the
v2 temporal types (DATETIME2/TIMESTAMP2/TIME2 fractional seconds, which
the reference leaves unresolved — event/mod.rs:388-390).

Decode is pure Python by design: it runs inside the stream reader /
``mapInPandas`` over Arrow batches of raw events, i.e. once per change
row at ingest — never in the analytic hot path.
"""

from __future__ import annotations

import datetime
import struct
from decimal import Decimal

from pyspark.sql import types as T

# ── Type codes (public protocol constants; reference mapping at
#    /root/reference/src/mysql/event/mod.rs:404-440) ────────────────────
DECIMAL = 0
TINY = 1
SHORT = 2
LONG = 3
FLOAT = 4
DOUBLE = 5
NULL = 6
TIMESTAMP = 7
LONGLONG = 8
INT24 = 9
DATE = 10
TIME = 11
DATETIME = 12
YEAR = 13
NEWDATE = 14
VARCHAR = 15
BIT = 16
TIMESTAMP2 = 17
DATETIME2 = 18
TIME2 = 19
JSON = 245
NEWDECIMAL = 246
ENUM = 247
SET = 248
TINY_BLOB = 249
MEDIUM_BLOB = 250
LONG_BLOB = 251
BLOB = 252
VAR_STRING = 253
STRING = 254
GEOMETRY = 255


def spark_type_for(
    type_code: int,
    meta: tuple = (),
    unsigned: bool = False,
    is_text: bool = False,
) -> T.DataType:
    """Map a MySQL column type (+ per-column metadata) to the Spark type,
    with unsigned widening (SURVEY.md §1.3 table). ``meta`` carries
    (precision, scale) for NEWDECIMAL, fractional digits for temporals.
    """
    if type_code == TINY:
        return T.ShortType() if unsigned else T.ByteType()
    if type_code == SHORT:
        return T.IntegerType() if unsigned else T.ShortType()
    if type_code in (LONG, INT24):
        return T.LongType() if unsigned else T.IntegerType()
    if type_code == LONGLONG:
        return T.DecimalType(20, 0) if unsigned else T.LongType()
    if type_code == FLOAT:
        return T.FloatType()
    if type_code == DOUBLE:
        return T.DoubleType()
    if type_code == NULL:
        return T.NullType()
    if type_code in (TIMESTAMP, TIMESTAMP2):
        return T.TimestampType()
    if type_code in (DATETIME, DATETIME2):
        return T.TimestampNTZType()
    if type_code in (DATE, NEWDATE):
        return T.DateType()
    if type_code in (TIME, TIME2):
        return T.StringType()  # Spark has no TIME type
    if type_code == YEAR:
        return T.ShortType()
    if type_code in (VARCHAR, VAR_STRING, STRING):
        return T.StringType()
    if type_code == BIT:
        return T.BinaryType()
    if type_code in (DECIMAL, NEWDECIMAL):
        p, s = (meta + (10, 0))[:2] if meta else (10, 0)
        return T.DecimalType(p, s)
    if type_code == ENUM:
        return T.StringType()
    if type_code == SET:
        return T.ArrayType(T.StringType())
    if type_code in (TINY_BLOB, MEDIUM_BLOB, LONG_BLOB, BLOB, GEOMETRY):
        return T.StringType() if is_text else T.BinaryType()
    if type_code == JSON:
        return T.StringType()
    raise ValueError(f"unknown MySQL type code {type_code}")


# ── Wire decode ─────────────────────────────────────────────────────────
# Each decoder consumes bytes at offset and returns (value, new_offset).

def _read_uint_le(buf: bytes, off: int, n: int) -> tuple[int, int]:
    return int.from_bytes(buf[off : off + n], "little"), off + n


def _read_int_le(buf: bytes, off: int, n: int) -> tuple[int, int]:
    return int.from_bytes(buf[off : off + n], "little", signed=True), off + n


def _read_uint_be(buf: bytes, off: int, n: int) -> tuple[int, int]:
    return int.from_bytes(buf[off : off + n], "big"), off + n


def read_lenenc_int(buf: bytes, off: int) -> tuple[int, int]:
    """MySQL length-encoded integer (reference analog:
    /root/reference/src/mysql/io/, lenenc read)."""
    first = buf[off]
    if first < 0xFB:
        return first, off + 1
    if first == 0xFC:
        return _read_uint_le(buf, off + 1, 2)
    if first == 0xFD:
        return _read_uint_le(buf, off + 1, 3)
    if first == 0xFE:
        return _read_uint_le(buf, off + 1, 8)
    raise ValueError(f"invalid lenenc prefix {first:#x}")


# ── Charset / collation ─────────────────────────────────────────────────
# Collation id → Python codec for the common MySQL character sets. The
# reference ships the full ~900-line id↔name table
# (/root/reference/src/mysql/collation.rs:6-900) because it must echo
# collation names over the wire; for decode we only need the id → codec
# mapping, and ids not listed here fall back to utf-8-with-replacement
# (MySQL ≥8 defaults to utf8mb4 everywhere). Ids are the public ones from
# information_schema.collations. MySQL's "latin1" is cp1252 (its 0x80-0x9F
# are Windows punctuation, not ISO-8859-1 control codes).
_CODEC_SPECS: list[tuple[str | None, list[int | range]]] = [
    ("cp1252", [5, 8, 15, 31, 47, 48, 49, 94]),            # latin1
    ("ascii", [11, 65]),
    ("utf-8", [33, 76, 83, range(192, 224)]),              # utf8mb3
    ("utf-8", [45, 46, range(224, 248), range(255, 324)]),  # utf8mb4
    (None, [63]),                                           # binary
    ("gbk", [28, 87]),
    ("gb2312", [24, 86]),
    ("gb18030", [248, 249, 250]),
    ("big5", [1, 84]),
    ("shift_jis", [13, 88]),                                # sjis
    ("cp932", [95, 96]),
    ("euc_jp", [12, 91]),                                   # ujis
    ("euc_kr", [19, 85]),
    ("iso8859-2", [2, 9, 21, 27, 77]),                      # latin2
    ("iso8859-7", [25, 70]),                                # greek
    ("iso8859-8", [16, 71]),                                # hebrew
    ("iso8859-9", [30, 78]),                                # latin5
    ("cp1250", [26, 34, 44, 66, 99]),
    ("cp1251", [14, 23, 50, 51, 52]),
    ("cp1256", [57, 67]),
    ("cp1257", [29, 58, 59]),
    ("cp850", [4, 80]),
    ("cp852", [40, 81]),
    ("cp866", [36, 68]),
    ("tis-620", [18, 89]),                                  # tis620 (Thai)
    ("iso8859-13", [20, 41, 42, 79]),                       # latin7
    ("mac_roman", [39, 53]),                                # macroman
    ("mac_latin2", [38, 43]),                               # macce
    ("koi8-r", [7, 74]),
    ("koi8-u", [22, 75]),
    ("utf-16-be", [35, 90, 54, 55, range(101, 125)]),       # ucs2 + utf16
    ("utf-16-le", [56, 62]),
    ("utf-32-be", [60, 61, range(160, 184)]),               # utf32
]

_COLLATION_CODEC: dict[int, str | None] = {}
for _codec, _ids in _CODEC_SPECS:
    for _i in _ids:
        if isinstance(_i, range):
            for _j in _i:
                _COLLATION_CODEC[_j] = _codec
        else:
            _COLLATION_CODEC[_i] = _codec


def codec_for_collation(collation_id: int | None) -> str | None:
    """Python codec for a MySQL collation id; ``None`` means binary (keep
    bytes). Unknown ids → utf-8 (decode uses errors='replace', so worst
    case matches the old always-utf-8 behavior rather than crashing)."""
    if collation_id is None:
        return "utf-8"
    return _COLLATION_CODEC.get(collation_id, "utf-8")


def unpack_string_meta(b1: int, b2: int) -> tuple[int, int]:
    """TABLE_MAP meta for type STRING is (real_type, length) packed into
    two bytes: ENUM/SET piggyback their real type in b1, and CHAR columns
    longer than 255 *bytes* pack the high length bits into b1's 0x30
    field (public format, mysql-server rpl_utility.cc; the reference
    stops at the raw bytes — event/mod.rs:452)."""
    if b1 == 0:  # pre-5.0 servers: no real-type byte
        return STRING, b2
    if (b1 & 0x30) != 0x30:
        return b1 | 0x30, b2 | (((b1 & 0x30) ^ 0x30) << 4)
    return b1, b2


# NewDecimal packed-BCD: digits-per-byte-group table (public format; the
# reference copies the same dig2bytes table from mysql-server,
# event/mod.rs:530-542).
_DIG2BYTES = [0, 1, 1, 2, 2, 3, 3, 4, 4, 4]
_DIGITS_PER_GROUP = 9


def decimal_binary_size(precision: int, scale: int) -> int:
    intg = precision - scale
    intg0, intgx = divmod(intg, _DIGITS_PER_GROUP)
    frac0, fracx = divmod(scale, _DIGITS_PER_GROUP)
    return intg0 * 4 + _DIG2BYTES[intgx] + frac0 * 4 + _DIG2BYTES[fracx]


def decode_newdecimal(buf: bytes, off: int, precision: int, scale: int) -> tuple[Decimal, int]:
    """MySQL packed-BCD DECIMAL(p,s): sign-flipped big-endian groups of
    up to 9 digits in 4 bytes. Format documented in mysql-server
    strings/decimal.cc (public)."""
    size = decimal_binary_size(precision, scale)
    raw = bytearray(buf[off : off + size])
    positive = bool(raw[0] & 0x80)
    raw[0] ^= 0x80
    if not positive:
        for i in range(len(raw)):
            raw[i] ^= 0xFF

    intg = precision - scale
    intg0, intgx = divmod(intg, _DIGITS_PER_GROUP)
    frac0, fracx = divmod(scale, _DIGITS_PER_GROUP)

    pos = 0
    int_part = ""
    if intgx:
        n = _DIG2BYTES[intgx]
        int_part = str(int.from_bytes(raw[pos : pos + n], "big"))
        pos += n
    for _ in range(intg0):
        int_part += str(int.from_bytes(raw[pos : pos + 4], "big")).zfill(9)
        pos += 4
    frac_part = ""
    for _ in range(frac0):
        frac_part += str(int.from_bytes(raw[pos : pos + 4], "big")).zfill(9)
        pos += 4
    if fracx:
        n = _DIG2BYTES[fracx]
        frac_part += str(int.from_bytes(raw[pos : pos + n], "big")).zfill(fracx)
        pos += n

    text = (("" if positive else "-") + (int_part or "0")
            + (("." + frac_part) if frac_part else ""))
    return Decimal(text), off + size


def _read_frac(buf: bytes, off: int, fsp: int) -> tuple[int, int]:
    """Fractional seconds: ceil(fsp/2) big-endian bytes → microseconds.
    (The part the reference never solved — event/mod.rs:388-390.)"""
    n = (fsp + 1) // 2
    if n == 0:
        return 0, off
    frac, off = _read_uint_be(buf, off, n)
    return frac * (10 ** (6 - 2 * n)), off


def decode_datetime2(buf: bytes, off: int, fsp: int = 0) -> tuple[datetime.datetime, int]:
    """DATETIME2: 5-byte big-endian packed
    (1 sign bit | 17 bits yyyymm | 5 day | 5 hour | 6 min | 6 sec)
    + fractional bytes. Public format: mysql-server my_time.cc."""
    packed, off = _read_uint_be(buf, off, 5)
    packed &= (1 << 39) - 1  # drop sign bit (always 1 for valid datetimes)
    ym = packed >> 22
    year, month = divmod(ym, 13)
    day = (packed >> 17) & 0x1F
    hour = (packed >> 12) & 0x1F
    minute = (packed >> 6) & 0x3F
    second = packed & 0x3F
    micros, off = _read_frac(buf, off, fsp)
    return datetime.datetime(year, month, day, hour, minute, second, micros), off


def decode_timestamp2(buf: bytes, off: int, fsp: int = 0) -> tuple[datetime.datetime, int]:
    """TIMESTAMP2: 4-byte big-endian unix seconds + fractional bytes;
    always UTC."""
    secs, off = _read_uint_be(buf, off, 4)
    micros, off = _read_frac(buf, off, fsp)
    return (
        datetime.datetime.fromtimestamp(secs, tz=datetime.timezone.utc).replace(tzinfo=None)
        + datetime.timedelta(microseconds=micros)
    ), off


def decode_time2(buf: bytes, off: int, fsp: int = 0) -> tuple[str, int]:
    """TIME2: 3-byte big-endian packed (sign | 1 reserved+10 hour |
    6 min | 6 sec) + fraction; rendered as 'HH:MM:SS[.ffffff]' string
    (Spark has no TIME type)."""
    packed, off = _read_uint_be(buf, off, 3)
    negative = not (packed & (1 << 23))
    if negative:
        packed = (1 << 24) - packed
    hours = (packed >> 12) & 0x3FF
    minutes = (packed >> 6) & 0x3F
    seconds = packed & 0x3F
    micros, off = _read_frac(buf, off, fsp)
    sign = "-" if negative else ""
    base = f"{sign}{hours:02d}:{minutes:02d}:{seconds:02d}"
    if fsp:
        base += f".{micros:06d}"[: 1 + fsp + len(base) - len(base)]
    return base, off


def decode_date(buf: bytes, off: int) -> tuple[datetime.date, int]:
    """DATE: 3 bytes little-endian packed (day 5 | month 4 | year 15)."""
    packed, off = _read_uint_le(buf, off, 3)
    day = packed & 0x1F
    month = (packed >> 5) & 0x0F
    year = packed >> 9
    return datetime.date(year, month, day), off


def decode_datetime_v1(buf: bytes, off: int) -> tuple[datetime.datetime, int]:
    """Legacy DATETIME: u64 yyyymmddHHMMSS."""
    v, off = _read_uint_le(buf, off, 8)
    d, t = divmod(v, 1_000_000)
    year, md = divmod(d, 10_000)
    month, day = divmod(md, 100)
    hour, ms = divmod(t, 10_000)
    minute, second = divmod(ms, 100)
    return datetime.datetime(year, month, day, hour, minute, second), off


def decode_timestamp_v1(buf: bytes, off: int) -> tuple[datetime.datetime, int]:
    """Legacy TIMESTAMP (pre-5.6.4 columns): 4-byte LE unix seconds, no
    fraction (reference decodes the same field at
    /root/reference/src/mysql/event/mod.rs:486-489)."""
    secs, off = _read_uint_le(buf, off, 4)
    return (
        datetime.datetime.fromtimestamp(secs, tz=datetime.timezone.utc).replace(tzinfo=None)
    ), off


def decode_time_v1(buf: bytes, off: int) -> tuple[str, int]:
    """Legacy TIME: 3-byte LE signed int packed as HHMMSS (reference
    event/mod.rs:493-497), rendered 'HH:MM:SS' like TIME2."""
    v, off = _read_int_le(buf, off, 3)
    sign = "-" if v < 0 else ""
    v = abs(v)
    hours, ms = divmod(v, 10_000)
    minutes, seconds = divmod(ms, 100)
    return f"{sign}{hours:02d}:{minutes:02d}:{seconds:02d}", off


def _decode_chars(raw: bytes, collation_id: int | None):
    """Bytes → str via the column collation's codec; binary collation
    keeps bytes. errors='replace' so a mis-tagged column degrades to
    replacement chars rather than crashing ingest."""
    codec = codec_for_collation(collation_id)
    if codec is None:
        return bytes(raw)
    return raw.decode(codec, errors="replace")


def decode_value(
    buf: bytes,
    off: int,
    type_code: int,
    meta: tuple = (),
    unsigned: bool = False,
    is_text: bool = True,
    collation_id: int | None = None,
    enum_set_values: list[str] | None = None,
):
    """Decode one column value at ``off``; returns (value, new_offset).

    ``meta`` per type: VARCHAR → (max_len,); NEWDECIMAL → (p, s);
    DATETIME2/TIMESTAMP2/TIME2 → (fsp,); BLOB → (len_bytes,);
    BIT → (b1, b2); FLOAT/DOUBLE → (len,); STRING → the raw TABLE_MAP
    (b1, b2) pair — unpacked here via ``unpack_string_meta`` (ENUM/SET
    piggyback their real type in b1).

    ``collation_id`` selects the text codec (TABLE_MAP optional
    metadata); ``enum_set_values`` are the ENUM/SET label strings when
    the master logs binlog_row_metadata=FULL — with them an ENUM decodes
    to its label and a SET to the list of set labels; without, to the
    1-based index / bitmask int.
    """
    if type_code == STRING and len(meta) == 2:
        real_type, real_len = unpack_string_meta(meta[0], meta[1])
        if real_type == ENUM:
            n = 2 if real_len == 2 else 1
            idx, off = _read_uint_le(buf, off, n)
            if enum_set_values and 0 < idx <= len(enum_set_values):
                return enum_set_values[idx - 1], off
            return idx, off
        if real_type == SET:
            mask, off = _read_uint_le(buf, off, max(1, real_len))
            if enum_set_values:
                return [
                    v for i, v in enumerate(enum_set_values) if mask >> i & 1
                ], off
            return mask, off
        type_code, meta = real_type, (real_len,)
    if type_code == TINY:
        v, off = (_read_uint_le if unsigned else _read_int_le)(buf, off, 1)
        return v, off
    if type_code == SHORT:
        return (_read_uint_le if unsigned else _read_int_le)(buf, off, 2)
    if type_code in (LONG, INT24):
        return (_read_uint_le if unsigned else _read_int_le)(buf, off, 4)
    if type_code == LONGLONG:
        return (_read_uint_le if unsigned else _read_int_le)(buf, off, 8)
    if type_code == FLOAT:
        return struct.unpack_from("<f", buf, off)[0], off + 4
    if type_code == DOUBLE:
        return struct.unpack_from("<d", buf, off)[0], off + 8
    if type_code == NULL:
        return None, off
    if type_code == YEAR:
        v, off = _read_uint_le(buf, off, 1)
        return (1900 + v) if v else 0, off
    if type_code in (DATE, NEWDATE):
        return decode_date(buf, off)
    if type_code == DATETIME:
        return decode_datetime_v1(buf, off)
    if type_code == TIMESTAMP:
        return decode_timestamp_v1(buf, off)
    if type_code == TIME:
        return decode_time_v1(buf, off)
    if type_code == DATETIME2:
        return decode_datetime2(buf, off, meta[0] if meta else 0)
    if type_code == TIMESTAMP2:
        return decode_timestamp2(buf, off, meta[0] if meta else 0)
    if type_code == TIME2:
        return decode_time2(buf, off, meta[0] if meta else 0)
    if type_code in (VARCHAR, VAR_STRING, STRING):
        max_len = meta[0] if meta else 255
        if max_len > 255:
            n, off = _read_uint_le(buf, off, 2)
        else:
            n, off = _read_uint_le(buf, off, 1)
        raw = buf[off : off + n]
        return _decode_chars(raw, collation_id), off + n
    if type_code in (DECIMAL, NEWDECIMAL):
        # Legacy DECIMAL (code 0) never reaches a row event in practice:
        # row-based replication (5.1) postdates NEWDECIMAL (5.0), and the
        # server rewrites old columns on first ALTER. If one does appear,
        # it carries the same packed-BCD payload (python-mysql-replication
        # makes the same identification).
        p, s = meta if len(meta) == 2 else (10, 0)
        return decode_newdecimal(buf, off, p, s)
    if type_code == BIT:
        b1, b2 = meta if len(meta) == 2 else (1, 0)
        n = (b1 + 7) // 8 + (b2 + 7) // 8
        return bytes(buf[off : off + n]), off + n
    if type_code in (BLOB, TINY_BLOB, MEDIUM_BLOB, LONG_BLOB, GEOMETRY, JSON):
        len_bytes = meta[0] if meta else 2
        n, off = _read_uint_le(buf, off, len_bytes)
        raw = bytes(buf[off : off + n])
        if type_code == JSON:
            from rust_cdc_spark.functions.jsonb import decode_jsonb_text

            return decode_jsonb_text(raw), off + n
        if is_text and type_code not in (GEOMETRY,):
            return _decode_chars(raw, collation_id if collation_id is not None else 45), off + n
        return raw, off + n
    raise ValueError(f"decode not implemented for type code {type_code}")
