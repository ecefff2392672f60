"""Binlog ROWS_EVENT / TABLE_MAP payload decode → typed row images.

Implements the publicly documented binlog row formats (MySQL
libbinlogevents: Table_map_event, Rows_event v1/v2) — the engine analog
of the reference's ``parse_rows_event``/``parse_one_row``
(/root/reference/src/mysql/event/decode.rs:352-452) and
``decode_table_map`` (:287-322), re-derived from the public format, not
translated.

These functions are pure Python and run batch-at-a-time inside the
streaming source (one call per event, not per analytic row) — the CDC
ingest path, never the query hot path.
"""

from __future__ import annotations

from dataclasses import dataclass, field

from rust_cdc_spark.functions import json_diff as JD
from rust_cdc_spark.functions import mysql_types as MT

# Event type codes (public constants; reference enum at
# /root/reference/src/mysql/event/mod.rs:257-367).
TABLE_MAP_EVENT = 0x13
WRITE_ROWS_V1 = 0x17
UPDATE_ROWS_V1 = 0x18
DELETE_ROWS_V1 = 0x19
WRITE_ROWS_V2 = 0x1E
UPDATE_ROWS_V2 = 0x1F
DELETE_ROWS_V2 = 0x20
# MySQL 8.0 binlog_row_value_options=PARTIAL_JSON: updates whose
# after-image JSON columns may carry diff vectors instead of full
# documents. No reference arm exists for this type code.
PARTIAL_UPDATE_ROWS_V2 = 0x27
# value_options bit: after-image JSON columns may be partial
_VALUE_OPTIONS_PARTIAL_JSON = 0x01

_V2_EVENTS = {WRITE_ROWS_V2, UPDATE_ROWS_V2, DELETE_ROWS_V2,
              PARTIAL_UPDATE_ROWS_V2}
_UPDATE_EVENTS = {UPDATE_ROWS_V1, UPDATE_ROWS_V2, PARTIAL_UPDATE_ROWS_V2}
_WRITE_EVENTS = {WRITE_ROWS_V1, WRITE_ROWS_V2}
_DELETE_EVENTS = {DELETE_ROWS_V1, DELETE_ROWS_V2}


@dataclass
class TableMapEntry:
    """Schema registry entry (reference ``SingleTableMap``,
    /root/reference/src/mysql/connection/mod.rs:32-49), extended with the
    TABLE_MAP *optional metadata* (signedness, per-column charset, column
    names, ENUM/SET labels — public TLV layout, mysql-server
    libbinlogevents rows_event.h) that the reference never parses.
    Column names are absent on the wire unless the master logs
    binlog_row_metadata=FULL — else enrich from information_schema out
    of band."""

    table_id: int
    schema_name: str
    table_name: str
    column_types: list[int]
    column_metas: list[tuple]
    nullable: list[bool]
    column_names: list[str] | None = None
    unsigned: list[bool] | None = None          # per numeric column → all
    charsets: list[int | None] | None = None    # collation id per column
    enum_set_values: list[list[str] | None] | None = None


@dataclass
class TableRegistry:
    """table_id → TableMapEntry, fed by TABLE_MAP events (reference
    ``TableMap::handle``, connection/mod.rs:51-85). Persisted in the
    stream checkpoint so restarts can decode rows without re-seeing
    TABLE_MAP (reference snapshot ``LogEntry.tables``).

    ``name_resolver(schema, table) -> list[str] | None`` closes the
    SURVEY §7 column-name gap: masters logging
    ``binlog_row_metadata=MINIMAL`` put no COLUMN_NAME TLV on the wire
    (the reference silently decodes to positional values); when set,
    the resolver is consulted once per (schema, table) — the live
    source backs it with an ``information_schema.columns`` COM_QUERY,
    the reference-style out-of-band lookup. A resolver that fails or
    returns the wrong arity leaves the positional ``col_i`` fallback."""

    inner: dict[int, TableMapEntry] = field(default_factory=dict)
    name_resolver: object | None = None
    _name_cache: dict[tuple, list | None] = field(default_factory=dict)

    def handle(self, entry: TableMapEntry) -> None:
        if not entry.column_names and self.name_resolver is not None:
            key = (entry.schema_name, entry.table_name)
            if key not in self._name_cache:
                try:
                    self._name_cache[key] = self.name_resolver(*key)
                except Exception:
                    self._name_cache[key] = None  # keep col_i fallback
            names = self._name_cache[key]
            if names and len(names) == len(entry.column_types):
                entry.column_names = list(names)
        self.inner[entry.table_id] = entry

    def get(self, table_id: int) -> TableMapEntry | None:
        return self.inner.get(table_id)


def _meta_for(type_code: int, meta_buf: bytes, pos: int) -> tuple[tuple, int]:
    """Per-type metadata widths (public TABLE_MAP optional-metadata
    layout; reference read at event/mod.rs:442-458)."""
    if type_code in (MT.FLOAT, MT.DOUBLE, MT.BLOB, MT.GEOMETRY, MT.JSON):
        return (meta_buf[pos],), pos + 1
    if type_code in (MT.VARCHAR, MT.VAR_STRING):
        return (int.from_bytes(meta_buf[pos : pos + 2], "little"),), pos + 2
    if type_code in (MT.STRING,):
        # real_type byte + length byte (ENUM/SET piggyback here)
        b1, b2 = meta_buf[pos], meta_buf[pos + 1]
        return (b1, b2), pos + 2
    if type_code == MT.NEWDECIMAL:
        return (meta_buf[pos], meta_buf[pos + 1]), pos + 2
    if type_code == MT.BIT:
        return (meta_buf[pos], meta_buf[pos + 1]), pos + 2
    if type_code in (MT.TIMESTAMP2, MT.DATETIME2, MT.TIME2):
        return (meta_buf[pos],), pos + 1
    return (), pos


# Optional-metadata TLV type codes (public enum
# Table_map_event::Optional_metadata_field_type, libbinlogevents).
_OM_SIGNEDNESS = 1
_OM_DEFAULT_CHARSET = 2
_OM_COLUMN_CHARSET = 3
_OM_COLUMN_NAME = 4
_OM_SET_STR_VALUE = 5
_OM_ENUM_STR_VALUE = 6
_OM_ENUM_SET_DEFAULT_CHARSET = 10
_OM_ENUM_SET_COLUMN_CHARSET = 11

_NUMERIC_TYPES = {
    MT.TINY, MT.SHORT, MT.INT24, MT.LONG, MT.LONGLONG,
    MT.FLOAT, MT.DOUBLE, MT.DECIMAL, MT.NEWDECIMAL,
}
_CHAR_TYPES = {
    MT.VARCHAR, MT.VAR_STRING, MT.BLOB,
    MT.TINY_BLOB, MT.MEDIUM_BLOB, MT.LONG_BLOB,
}


def _col_class(tc: int, meta: tuple) -> str:
    """numeric / char / enumset / other — the server groups optional
    metadata by these classes (is_numeric_field / is_character_field /
    is_enum_or_set_field in rows_event.cc); ENUM/SET piggyback on the
    STRING type byte with their real type in meta b1."""
    if tc in _NUMERIC_TYPES:
        return "numeric"
    if tc in _CHAR_TYPES:
        return "char"
    if tc in (MT.ENUM, MT.SET):
        return "enumset"
    if tc == MT.STRING:
        if len(meta) == 2:
            rt, _ = MT.unpack_string_meta(meta[0], meta[1])
            if rt in (MT.ENUM, MT.SET):
                return "enumset"
        return "char"
    return "other"


def _parse_str_values(payload: bytes) -> list[list[str]]:
    """SET/ENUM_STR_VALUE payload: per column, lenenc count then count
    lenenc-prefixed label strings."""
    out: list[list[str]] = []
    pos = 0
    while pos < len(payload):
        count, pos = MT.read_lenenc_int(payload, pos)
        labels = []
        for _ in range(count):
            n, pos = MT.read_lenenc_int(payload, pos)
            labels.append(payload[pos : pos + n].decode("utf-8", errors="replace"))
            pos += n
        out.append(labels)
    return out


def _apply_optional_metadata(entry: TableMapEntry, buf: bytes) -> None:
    """Parse the TABLE_MAP optional-metadata TLV block in place."""
    classes = [
        _col_class(tc, m)
        for tc, m in zip(entry.column_types, entry.column_metas)
    ]
    numeric_idx = [i for i, c in enumerate(classes) if c == "numeric"]
    char_idx = [i for i, c in enumerate(classes) if c == "char"]
    enumset_idx = [i for i, c in enumerate(classes) if c == "enumset"]

    pos = 0
    while pos + 1 < len(buf):
        field_type = buf[pos]
        length, pos = MT.read_lenenc_int(buf, pos + 1)
        payload = buf[pos : pos + length]
        pos += length
        if field_type == _OM_SIGNEDNESS:
            # one bit per numeric column, MSB-first: set bit = UNSIGNED
            flags = [False] * len(entry.column_types)
            for j, i in enumerate(numeric_idx):
                flags[i] = bool(payload[j // 8] & (0x80 >> (j % 8)))
            entry.unsigned = flags
        elif field_type in (_OM_DEFAULT_CHARSET, _OM_ENUM_SET_DEFAULT_CHARSET):
            idx = char_idx if field_type == _OM_DEFAULT_CHARSET else enumset_idx
            default, p = MT.read_lenenc_int(payload, 0)
            overrides: dict[int, int] = {}
            while p < len(payload):
                ci, p = MT.read_lenenc_int(payload, p)
                coll, p = MT.read_lenenc_int(payload, p)
                overrides[ci] = coll
            charsets = entry.charsets or [None] * len(entry.column_types)
            for j, i in enumerate(idx):
                charsets[i] = overrides.get(j, default)
            entry.charsets = charsets
        elif field_type in (_OM_COLUMN_CHARSET, _OM_ENUM_SET_COLUMN_CHARSET):
            idx = char_idx if field_type == _OM_COLUMN_CHARSET else enumset_idx
            charsets = entry.charsets or [None] * len(entry.column_types)
            p = 0
            for i in idx:
                coll, p = MT.read_lenenc_int(payload, p)
                charsets[i] = coll
            entry.charsets = charsets
        elif field_type == _OM_COLUMN_NAME:
            names, p = [], 0
            while p < len(payload):
                n, p = MT.read_lenenc_int(payload, p)
                names.append(payload[p : p + n].decode("utf-8", errors="replace"))
                p += n
            if len(names) == len(entry.column_types):
                entry.column_names = names
        elif field_type in (_OM_SET_STR_VALUE, _OM_ENUM_STR_VALUE):
            want_set = field_type == _OM_SET_STR_VALUE
            targets = [
                i for i in enumset_idx
                if (_real_enumset_type(entry, i) == MT.SET) == want_set
            ]
            values = entry.enum_set_values or [None] * len(entry.column_types)
            for labels, i in zip(_parse_str_values(payload), targets):
                values[i] = labels
            entry.enum_set_values = values
        # other TLVs (geometry type, primary key, visibility): skipped
        # by length — positional metadata the decode doesn't need.


def _real_enumset_type(entry: TableMapEntry, i: int) -> int:
    tc, meta = entry.column_types[i], entry.column_metas[i]
    if tc == MT.STRING and len(meta) == 2:
        rt, _ = MT.unpack_string_meta(meta[0], meta[1])
        return rt
    return tc


def schema_for_entry(entry: TableMapEntry):
    """TableMapEntry → typed Spark ``StructType``, resolved entirely from
    wire metadata: names from COLUMN_NAME, unsigned widening from
    SIGNEDNESS, binary-collation char columns stay ``binary``, ENUM/SET
    type to label string / label array when the labels were logged and to
    index int / bitmask long when they weren't. The reference needs an
    out-of-band information_schema query for this
    (/root/reference/src/mysql/connection/mod.rs fetch of column names);
    with ``binlog_row_metadata=FULL`` the binlog alone suffices."""
    from pyspark.sql import types as T

    fields = []
    for i, tc in enumerate(entry.column_types):
        name = entry.column_names[i] if entry.column_names else f"col_{i}"
        meta = entry.column_metas[i]
        unsigned = bool(entry.unsigned[i]) if entry.unsigned else False
        labels = entry.enum_set_values[i] if entry.enum_set_values else None
        rt = tc
        if tc == MT.STRING and len(meta) == 2:
            rt, real_len = MT.unpack_string_meta(meta[0], meta[1])
            meta = (real_len,)
        if rt == MT.ENUM:
            dtype = T.StringType() if labels else T.IntegerType()
        elif rt == MT.SET:
            dtype = T.ArrayType(T.StringType()) if labels else T.LongType()
        else:
            is_text = not (
                entry.charsets is not None
                and entry.charsets[i] == 63
                and (rt in _CHAR_TYPES or rt == MT.STRING)
            )
            dtype = MT.spark_type_for(rt, meta, unsigned=unsigned, is_text=is_text)
            if rt in (MT.VARCHAR, MT.VAR_STRING, MT.STRING) and not is_text:
                dtype = T.BinaryType()
        fields.append(T.StructField(name, dtype, entry.nullable[i]))
    return T.StructType(fields)


def decode_table_map(body: bytes) -> TableMapEntry:
    """TABLE_MAP body (post-header + payload, checksum stripped),
    including the optional-metadata TLV block when present."""
    table_id = int.from_bytes(body[0:6], "little")
    pos = 8  # 6-byte table id + 2-byte flags
    schema_len = body[pos]
    pos += 1
    schema = body[pos : pos + schema_len].decode()
    pos += schema_len + 1  # trailing NUL
    table_len = body[pos]
    pos += 1
    table = body[pos : pos + table_len].decode()
    pos += table_len + 1
    col_count, pos = MT.read_lenenc_int(body, pos)
    col_types = list(body[pos : pos + col_count])
    pos += col_count
    meta_len, pos = MT.read_lenenc_int(body, pos)
    meta_buf = body[pos : pos + meta_len]
    pos += meta_len
    metas: list[tuple] = []
    mpos = 0
    for tc in col_types:
        m, mpos = _meta_for(tc, meta_buf, mpos)
        metas.append(m)
    null_bitmap = body[pos : pos + (col_count + 7) // 8]
    pos += (col_count + 7) // 8
    nullable = [bool(null_bitmap[i // 8] >> (i % 8) & 1) for i in range(col_count)]
    entry = TableMapEntry(table_id, schema, table, col_types, metas, nullable)
    if pos < len(body):
        _apply_optional_metadata(entry, body[pos:])
    return entry


def _bitmap_get(bitmap: bytes, i: int) -> bool:
    return bool(bitmap[i // 8] >> (i % 8) & 1)


def _decode_image(
    body: bytes, pos: int, entry: TableMapEntry, present: bytes,
    partial_cols: frozenset = frozenset(), before: dict | None = None,
) -> tuple[dict, int]:
    """One row image: null bitmap over present columns, then values
    positionally (reference ``parse_one_row``, decode.rs:428-452).

    ``partial_cols``/``before``: for PARTIAL_UPDATE_ROWS after-images,
    the JSON columns whose value is a length-prefixed diff vector
    rather than a full document — decoded and APPLIED to the
    before-image here, so every consumer downstream sees full JSON
    text (see functions/json_diff.py)."""
    n_present = sum(
        1 for i in range(len(entry.column_types)) if _bitmap_get(present, i)
    )
    null_bitmap = body[pos : pos + (n_present + 7) // 8]
    pos += (n_present + 7) // 8
    values: dict = {}
    j = 0  # index among present columns
    for i, tc in enumerate(entry.column_types):
        if not _bitmap_get(present, i):
            continue
        name = (
            entry.column_names[i]
            if entry.column_names
            else f"col_{i}"
        )
        if _bitmap_get(null_bitmap, j):
            values[name] = None
        elif i in partial_cols:
            len_bytes = entry.column_metas[i][0] if entry.column_metas[i] else 4
            if pos + len_bytes > len(body):
                # A truncated event here would otherwise read an empty
                # slice → n=0 → empty diff vector → the before-image
                # passed through UNCHANGED: a silently wrong after value
                # instead of a quarantine (ADVICE r8). Fail loudly so
                # the envelope loop DLQs the event.
                raise ValueError(
                    f"partial-JSON diff length field truncated at {pos}"
                    f" (need {len_bytes} bytes, have {len(body) - pos})"
                )
            n = int.from_bytes(body[pos : pos + len_bytes], "little")
            pos += len_bytes
            if pos + n > len(body):
                raise ValueError(
                    f"partial-JSON diff vector truncated at {pos}"
                    f" (need {n} bytes, have {len(body) - pos})"
                )
            diffs = JD.decode_diff_vector(bytes(body[pos : pos + n]))
            pos += n
            values[name] = JD.apply_diffs(
                before.get(name) if before else None, diffs
            )
        else:
            values[name], pos = MT.decode_value(
                body,
                pos,
                tc,
                entry.column_metas[i],
                unsigned=bool(entry.unsigned[i]) if entry.unsigned else False,
                collation_id=entry.charsets[i] if entry.charsets else None,
                enum_set_values=(
                    entry.enum_set_values[i] if entry.enum_set_values else None
                ),
            )
        j += 1
    return values, pos


def decode_rows_event(
    body: bytes, event_type: int, registry: TableRegistry
) -> tuple[int, list[dict]]:
    """ROWS_EVENT body → (table_id, row dicts).

    Insert rows → {"after": {...}}; delete rows → {"before": {...}};
    update rows → {"before": {...}, "after": {...}} (two images back to
    back, reference decode.rs:398-423).
    """
    table_id = int.from_bytes(body[0:6], "little")
    pos = 8  # table id + flags
    if event_type in _V2_EVENTS:
        extra_len = int.from_bytes(body[pos : pos + 2], "little")
        pos += extra_len  # includes the 2 length bytes
    col_count, pos = MT.read_lenenc_int(body, pos)
    bm_len = (col_count + 7) // 8
    present1 = body[pos : pos + bm_len]
    pos += bm_len
    present2 = present1
    if event_type in _UPDATE_EVENTS:
        present2 = body[pos : pos + bm_len]
        pos += bm_len

    entry = registry.get(table_id)
    if entry is None:
        raise KeyError(f"no TABLE_MAP for table id {table_id}")

    rows: list[dict] = []
    end = len(body)
    # the partial_bits bitmap spans ALL JSON columns of the TABLE (one
    # bit each, regardless of after-image inclusion — MySQL
    # print_verbose_one_row / go-mysql decodeImage both size it from
    # the table's JSON column count)
    pj_cols = [
        i for i, tc in enumerate(entry.column_types) if tc == MT.JSON
    ]
    while pos < end:
        if event_type == PARTIAL_UPDATE_ROWS_V2:
            # per row: the before-image is ordinary; the AFTER-image is
            # preceded by a shared-image — value_options lenenc, then
            # (when the PARTIAL_JSON bit is set) the partial_bits
            # bitmap (public layout per WL#2955: value_options belongs
            # to the update after-image, never the before-image)
            before, pos = _decode_image(body, pos, entry, present1)
            value_options, pos = MT.read_lenenc_int(body, pos)
            partial: frozenset = frozenset()
            if value_options & _VALUE_OPTIONS_PARTIAL_JSON and pj_cols:
                nb = (len(pj_cols) + 7) // 8
                bits = body[pos : pos + nb]
                pos += nb
                partial = frozenset(
                    col for j, col in enumerate(pj_cols)
                    if _bitmap_get(bits, j) and _bitmap_get(present2, col)
                )
            after, pos = _decode_image(
                body, pos, entry, present2,
                partial_cols=partial, before=before,
            )
            rows.append({"before": before, "after": after})
        elif event_type in _UPDATE_EVENTS:
            before, pos = _decode_image(body, pos, entry, present1)
            after, pos = _decode_image(body, pos, entry, present2)
            rows.append({"before": before, "after": after})
        elif event_type in _WRITE_EVENTS:
            after, pos = _decode_image(body, pos, entry, present1)
            rows.append({"after": after})
        else:
            before, pos = _decode_image(body, pos, entry, present1)
            rows.append({"before": before})
    return table_id, rows
