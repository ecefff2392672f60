"""Binary binlog *file* parser: the offline replay path.

Parses real MySQL binlog files (magic + v4 event headers + payloads, per
the public binary-log format) into normalized CDC event dicts — the same
shape the JSONL replay source and Kafka parser emit, so a recorded binlog
file can feed the whole pipeline. The reference reads the same files in
its golden tests (/root/reference/tests/events/*); its event loop decode
is /root/reference/src/mysql/conn.rs:307-356 + event/mod.rs:155-205 —
re-derived here from the public format.

This is driver-side ingest tooling (file → event dicts → JSONL/stream);
the per-event work is O(bytes) once per change, never in the query path.
"""

from __future__ import annotations

import datetime
from collections.abc import Iterator
from dataclasses import dataclass

from rust_cdc_spark.functions import mysql_types as MT
from rust_cdc_spark.sources import binlog_rows as BR

MAGIC = b"\xfebin"
HEADER_LEN = 19

# event type codes (public constants)
QUERY_EVENT = 0x02
ROTATE_EVENT = 0x04
FORMAT_DESCRIPTION_EVENT = 0x0F
XID_EVENT = 0x10
GTID_EVENT = 0x21
ANONYMOUS_GTID_EVENT = 0x22
PREVIOUS_GTIDS_EVENT = 0x23
ROWS_QUERY_EVENT = 0x1D  # original SQL (binlog_rows_query_log_events=ON)
XA_PREPARE_LOG_EVENT = 0x26  # two-phase XA: prepared-txn marker
TRANSACTION_PAYLOAD_EVENT = 0x28  # MySQL 8.0.20+ compressed transactions


def _parse_xa_xid(text: str) -> tuple[int, bytes, bytes] | None:
    """Parse the xid from MySQL's serialized XA statement text:
    ``XA START|COMMIT|ROLLBACK X'<gtrid hex>',X'<bqual hex>',<formatID>``
    (the exact form the server writes into QUERY events). Returns
    (formatID, gtrid, bqual) or None if the text isn't that shape."""
    import re

    m = re.match(
        r"XA\s+(?:START|BEGIN|END|COMMIT|ROLLBACK)\s+"
        r"X'([0-9a-fA-F]*)'\s*(?:,\s*X'([0-9a-fA-F]*)')?\s*(?:,\s*(\d+))?",
        text.strip(), re.IGNORECASE,
    )
    if not m:
        return None
    gtrid = bytes.fromhex(m.group(1))
    bqual = bytes.fromhex(m.group(2) or "")
    fmt = int(m.group(3) or "1")
    return (fmt, gtrid, bqual)


def _decode_xa_prepare(body: bytes) -> tuple[bool, tuple[int, bytes, bytes]]:
    """XA_PREPARE_LOG_EVENT body → (one_phase, xid). Layout (public
    libbinlogevents XA_prepare_event): u8 one_phase, u32 formatID,
    u32 gtrid_length, u32 bqual_length, gtrid bytes, bqual bytes."""
    import struct

    one_phase = bool(body[0])
    fmt, glen, blen = struct.unpack_from("<iii", body, 1)
    gtrid = bytes(body[13 : 13 + glen])
    bqual = bytes(body[13 + glen : 13 + glen + blen])
    return one_phase, (fmt, gtrid, bqual)

# Transaction_payload_event on-the-wire TLV field types and compression
# codes (public libbinlogevents format: each header field is
# lenenc(type) + lenenc(length) + value, terminated by a bare END mark;
# the transaction's ordinary event stream follows the header). Servers
# with binlog_transaction_compression=ON wrap whole transactions in
# these; the reference has no dispatch arm for them at all
# (/root/reference/src/mysql/event/mod.rs:257-367 stops at the classic
# type codes), so a modern server would stream events it cannot decode.
_TP_OTW_END = 0
_TP_OTW_PAYLOAD_SIZE = 1
_TP_OTW_COMPRESSION_TYPE = 2
_TP_OTW_UNCOMPRESSED_SIZE = 3
TP_COMPRESSION_ZSTD = 0
TP_COMPRESSION_NONE = 255


# MySQL length-encoded integer (net_field_length) → (value, pos): ONE
# shared decoder — functions/mysql_types.read_lenenc_int — re-exported
# under the local name (a second implementation here would silently
# drift from future bounds-checking fixes; ADVICE-style dedup, r8).
_lenenc = MT.read_lenenc_int


def decode_transaction_payload(body: bytes) -> bytes:
    """Transaction_payload_event body → the embedded event-stream bytes.

    Parses the TLV header (payload size, compression type, uncompressed
    size), then returns the transaction's inner binlog-event stream,
    decompressing if needed. ZSTD (the server default) is env-gated:
    the ``zstandard`` wheel is not in this image (checked 2026-08-16,
    rounds 8 AND 9 — ``import zstandard`` → ModuleNotFoundError, no
    network to fetch it),
    so a ZSTD payload raises ImportError with a clear message and lands
    in the DLQ rather than crashing ingest; compression NONE (emitted
    when per-transaction compression is off/ineffective) decodes fully.
    """
    pos = 0
    payload_size: int | None = None
    compression = TP_COMPRESSION_NONE
    uncompressed_size: int | None = None
    while pos < len(body):
        ftype, pos = _lenenc(body, pos)
        if ftype == _TP_OTW_END:
            break
        flen, pos = _lenenc(body, pos)
        value = body[pos : pos + flen]
        pos += flen
        if ftype == _TP_OTW_PAYLOAD_SIZE:
            payload_size, _ = _lenenc(value, 0)
        elif ftype == _TP_OTW_COMPRESSION_TYPE:
            compression, _ = _lenenc(value, 0)
        elif ftype == _TP_OTW_UNCOMPRESSED_SIZE:
            uncompressed_size, _ = _lenenc(value, 0)
        # unknown field types are skipped (forward-compatible TLV)
    payload = body[pos:] if payload_size is None else body[pos : pos + payload_size]
    if payload_size is not None and len(payload) != payload_size:
        raise ValueError(
            f"payload truncated: header says {payload_size} bytes,"
            f" {len(payload)} present"
        )
    if compression == TP_COMPRESSION_NONE:
        return payload
    if compression == TP_COMPRESSION_ZSTD:
        # ADVICE r8: cap the single up-front allocation the declared
        # size drives BEFORE touching the decompressor — a
        # corrupt/hostile header claiming terabytes must not OOM the
        # executor ahead of the mismatch check. zstd's worst practical
        # ratio for binlog event streams is far under 2^10; anything
        # above that is corrupt by construction. Checked before the
        # env-gated import so hostile sizes reject identically with or
        # without the wheel.
        if uncompressed_size is not None:
            cap = max(1024 * len(payload), 1 << 20)
            if uncompressed_size > cap:
                raise ValueError(
                    f"zstd header claims {uncompressed_size} bytes from a"
                    f" {len(payload)}-byte payload (> {cap} cap): corrupt"
                    " or hostile size field"
                )
        try:
            import zstandard  # noqa: PLC0415 — env-gated decompressor
        except ImportError as exc:
            raise ImportError(
                "Transaction_payload_event is zstd-compressed but the"
                " 'zstandard' package is unavailable in this environment"
                " (2026-08-16: not in image, no network); the event is"
                " quarantined to the DLQ"
            ) from exc
        # None = no size field: a streaming decompress, not "0 bytes";
        # a declared 0 means exactly-empty output (the `or 0` form
        # degraded it to unlimited — ADVICE r8).
        if uncompressed_size is not None:
            data = zstandard.ZstdDecompressor().decompress(
                payload, max_output_size=max(uncompressed_size, 1)
            )
        else:
            data = zstandard.ZstdDecompressor().decompress(payload)
        if uncompressed_size is not None and len(data) != uncompressed_size:
            raise ValueError(
                f"zstd payload decompressed to {len(data)} bytes,"
                f" header says {uncompressed_size}"
            )
        return data
    raise ValueError(f"unknown payload compression type {compression}")


def iter_embedded_events(data: bytes, outer_log_pos: int = 0) -> Iterator[RawEvent]:
    """Iterate the ordinary binlog events embedded in a transaction
    payload: bare v4 headers + bodies, NO file magic and NO per-event
    checksum (the payload is written with checksum alg off — the outer
    event's CRC already covers it). ``log_pos`` of every inner event is
    overridden with the OUTER event's end position: a consumer cannot
    seek into the middle of a compressed payload, so the only
    resume-safe offset for every row inside it is the position after
    the whole payload event (same reasoning as the GTID-set failover
    path in streaming/gtid.py)."""
    pos = 0
    while pos < len(data):
        if pos + HEADER_LEN > len(data):
            raise ValueError(
                f"embedded event header truncated at offset {pos}"
            )
        header = data[pos : pos + HEADER_LEN]
        ts = int.from_bytes(header[0:4], "little")
        type_code = header[4]
        server_id = int.from_bytes(header[5:9], "little")
        event_size = int.from_bytes(header[9:13], "little")
        flags = int.from_bytes(header[17:19], "little")
        if event_size < HEADER_LEN or pos + event_size > len(data):
            raise ValueError(
                f"embedded event at offset {pos} claims {event_size}"
                f" bytes, {len(data) - pos} remain"
            )
        body = data[pos + HEADER_LEN : pos + event_size]
        yield RawEvent(
            ts, type_code, server_id, event_size, outer_log_pos, flags, body
        )
        pos += event_size


@dataclass
class RawEvent:
    timestamp: int
    type_code: int
    server_id: int
    event_size: int
    log_pos: int
    flags: int
    body: bytes  # checksum stripped
    # False → the event's CRC32 trailer did not match header+body; the
    # envelope loop quarantines it to the DLQ instead of decoding
    # garbage (K4). Default True covers artificial/embedded events,
    # checksum-NONE streams, and verify_checksum=False readers.
    crc_ok: bool = True


def verify_crc32(header: bytes, body: bytes) -> tuple[bytes, bool]:
    """Split a CRC32-suffixed event body into (payload, crc_ok).

    The server's checksum covers the 19-byte common header plus the
    body up to the 4-byte little-endian CRC trailer (public
    binlog_checksum format; the reference only STRIPS the trailer —
    /root/reference/src/mysql/event/decode.rs:335-341 — so a
    corrupt-on-disk event decodes as garbage or DLQs by luck there).

    FDE special case (same one mysqlbinlog handles): the server
    computes the FORMAT_DESCRIPTION event's CRC BEFORE setting the
    LOG_EVENT_BINLOG_IN_USE_F header flag (0x0001), so an FDE copied
    from an in-use binlog fails as-is — retry with that bit cleared.
    Observed directly in the reference's own 8.0.21 fixtures
    (tests/events/15_format_desc: flags=0x0001, CRC matches only with
    the bit cleared) vs its 5.6.19 fixtures (flag clear, matches)."""
    import zlib

    payload, trailer = body[:-4], body[-4:]
    expect = int.from_bytes(trailer, "little")
    if zlib.crc32(header + payload) & 0xFFFFFFFF == expect:
        return payload, True
    if header[4] == FORMAT_DESCRIPTION_EVENT and header[17] & 0x1:
        fixed = header[:17] + bytes([header[17] & ~0x1]) + header[18:]
        if zlib.crc32(fixed + payload) & 0xFFFFFFFF == expect:
            return payload, True
    return payload, False


def read_raw_events(
    path: str, verify_checksum: bool = True
) -> Iterator[RawEvent]:
    """Iterate events; learns the checksum algorithm from the
    FORMAT_DESCRIPTION event, strips CRC32 suffixes, and (by default)
    VERIFIES them — a mismatch marks the event ``crc_ok=False`` so the
    envelope loop routes it to the DLQ rather than decoding corrupt
    bytes. ``verify_checksum=False`` restores strip-only behavior."""
    with open(path, "rb") as fh:
        if fh.read(4) != MAGIC:
            raise ValueError(f"{path}: not a binlog file (bad magic)")
        checksum_len = 0
        while True:
            header = fh.read(HEADER_LEN)
            if len(header) < HEADER_LEN:
                return
            ts = int.from_bytes(header[0:4], "little")
            type_code = header[4]
            server_id = int.from_bytes(header[5:9], "little")
            event_size = int.from_bytes(header[9:13], "little")
            log_pos = int.from_bytes(header[13:17], "little")
            flags = int.from_bytes(header[17:19], "little")
            body = fh.read(event_size - HEADER_LEN)
            if type_code == FORMAT_DESCRIPTION_EVENT:
                # body: 2 ver + 50 server-version + 4 ts + 1 header-len +
                # per-type post-header lens… + [checksum_alg + crc4]
                alg = body[-5]
                checksum_len = 4 if alg == 1 else 0
            crc_ok = True
            if checksum_len:
                payload, ok = verify_crc32(header, body)
                crc_ok = ok or not verify_checksum
            else:
                payload = body
            yield RawEvent(
                ts, type_code, server_id, event_size, log_pos, flags,
                payload, crc_ok,
            )


def _decode_query(body: bytes) -> tuple[str, str]:
    """QueryEvent → (schema, sql). Post-header: thread_id u32, exec_time
    u32, schema_len u8, error_code u16, status_vars_len u16."""
    schema_len = body[8]
    status_len = int.from_bytes(body[11:13], "little")
    pos = 13 + status_len
    schema = body[pos : pos + schema_len].decode()
    pos += schema_len + 1  # trailing NUL
    return schema, body[pos:].decode("utf-8", errors="replace")


def _decode_gtid(body: bytes) -> str:
    import uuid as _uuid

    u = str(_uuid.UUID(bytes=bytes(body[1:17])))
    gno = int.from_bytes(body[17:25], "little")
    return f"{u}:{gno}"


def parse_binlog_file(path: str, file_name: str | None = None,
                      registry: BR.TableRegistry | None = None) -> Iterator[dict]:
    """Binlog file → normalized CDC event dicts (the replay-source wire
    shape): row events become op I/U/D with image dicts; QueryEvents
    become op DDL; GTID/Xid attach to subsequent/preceding rows the same
    way the reference surfaces them (metadata columns)."""
    file_name = file_name or path.rsplit("/", 1)[-1]
    return envelopes_from_events(read_raw_events(path), file_name, registry)


def envelopes_from_events(
    events: Iterator[RawEvent],
    file_name: str,
    registry: BR.TableRegistry | None = None,
    _gtid: str | None = None,
    _xa_state: dict | None = None,
) -> Iterator[dict]:
    """RawEvent stream → normalized envelopes. Shared by the offline file
    parser above and the live wire reader (``sources/wire.py``) — same
    decode, registry, and quarantine semantics regardless of transport,
    mirroring how the reference's event loop is transport-agnostic past
    the packet layer (/root/reference/src/mysql/conn.rs:307-356).
    ``_gtid`` seeds the current-GTID state when recursing into a
    Transaction_payload_event (whose GTID event precedes the payload in
    the OUTER stream); ``_xa_state`` shares the XA buffer with that
    recursion — a prepared XA transaction and its XA COMMIT arrive in
    DIFFERENT payload events (each payload wraps one transaction), so
    the buffer must outlive any single payload's decode."""
    registry = registry or BR.TableRegistry()
    current_gtid: str | None = _gtid
    rows_query: str | None = None  # ROWS_QUERY_EVENT statement context
    # Two-phase XA: rows logged between XA START and XA PREPARE are
    # HELD here and released only by XA COMMIT (pos-pinned to the
    # commit, which is the resume-safe offset) or dropped by XA
    # ROLLBACK — without this, a rolled-back prepared transaction
    # would emit phantom rows downstream. One-phase XA (XA COMMIT ...
    # ONE PHASE) flushes at the prepare event itself. RESTART CAVEAT
    # (documented, same gap Debezium has): the buffer is stream state,
    # so a resume that starts after an in-flight txn's XA START but
    # before its XA COMMIT cannot recover those rows — resume offsets
    # should not be advanced past an unresolved prepare (the TXN
    # marker emitted at commit carries the query text for auditing).
    xa = (
        _xa_state
        if _xa_state is not None
        else {"current": None, "buffer": {}, "alias": {}}
    )
    row_event_types = {
        BR.WRITE_ROWS_V1, BR.WRITE_ROWS_V2, BR.UPDATE_ROWS_V1,
        BR.UPDATE_ROWS_V2, BR.DELETE_ROWS_V1, BR.DELETE_ROWS_V2,
        BR.PARTIAL_UPDATE_ROWS_V2,
    }
    for ev in events:
        if not ev.crc_ok:
            # K4: the reader verified the event's CRC32 trailer against
            # header+body and it did NOT match — the bytes are corrupt
            # (disk rot, truncated copy, link corruption). Decoding them
            # would produce garbage rows or, worse, a plausible-looking
            # wrong image; quarantine instead (the reference only strips
            # the trailer, decode.rs:335-341, so it decodes the garbage).
            yield {
                "ts": ev.timestamp,
                "server_id": ev.server_id,
                "file": file_name,
                "pos": ev.log_pos,
                "gtid": current_gtid,
                "xid": None,
                "database": "",
                "table": "",
                "op": "ERR",
                "before": None,
                "after": None,
                "query": f"Crc32Mismatch: event checksum failed "
                         f"[event_type={ev.type_code:#x} "
                         f"body={ev.body[:64].hex()}]",
            }
            continue
        if ev.type_code == ROTATE_EVENT:
            # body: u64 next-pos + next file name. Covers both the real
            # rotation at the end of a file and the ARTIFICIAL rotate a
            # live dump stream opens with (which is how a wire consumer
            # learns the current file name at all — conn.rs:311-317).
            file_name = ev.body[8:].decode("utf-8", errors="replace")
            continue
        if ev.type_code in (GTID_EVENT, ANONYMOUS_GTID_EVENT):
            current_gtid = _decode_gtid(ev.body) if ev.type_code == GTID_EVENT else None
            rows_query = None  # query context is per-transaction
            continue
        if ev.type_code == ROWS_QUERY_EVENT:
            # the originating SQL text, logged right before its row
            # events when binlog_rows_query_log_events=ON — attach it to
            # every row of the statement (audit/lineage surface the
            # reference ignores). Body: 1 length byte (servers truncate
            # it; the text runs to the end of the event) + query text.
            rows_query = ev.body[1:].decode("utf-8", errors="replace")
            continue
        if ev.type_code == BR.TABLE_MAP_EVENT:
            registry.handle(BR.decode_table_map(ev.body))
            continue
        if ev.type_code == TRANSACTION_PAYLOAD_EVENT:
            # MySQL 8.0.20+ compressed transaction: unwrap and replay
            # the embedded event stream through this same loop (shared
            # registry; the outer GTID seeds the inner context; every
            # inner offset is pinned to the outer event's end position
            # — see iter_embedded_events). Undecodable payloads (zstd
            # without the env-gated wheel, truncation) quarantine to
            # the DLQ like any other bad record instead of killing the
            # ingest loop.
            try:
                inner = decode_transaction_payload(ev.body)
                # Materialize the whole replay BEFORE yielding anything:
                # a payload that fails mid-replay (truncated inner
                # frame) must quarantine as ONE unit, not emit a visibly
                # partial transaction with a trailing ERR record nothing
                # ties back to the earlier rows (ADVICE r8). A payload
                # is one transaction — bounded by max_allowed_packet —
                # so buffering it is the same memory class as the XA
                # hold-until-commit buffer above.
                replayed = list(
                    envelopes_from_events(
                        iter_embedded_events(inner, ev.log_pos),
                        file_name,
                        registry,
                        _gtid=current_gtid,
                        _xa_state=xa,
                    )
                )
                yield from replayed
            except Exception as exc:  # noqa: BLE001 — quarantine
                yield {
                    "ts": ev.timestamp,
                    "server_id": ev.server_id,
                    "file": file_name,
                    "pos": ev.log_pos,
                    "gtid": current_gtid,
                    "xid": None,
                    "database": "",
                    "table": "",
                    "op": "ERR",
                    "before": None,
                    "after": None,
                    "query": f"{type(exc).__name__}: {exc} "
                             f"[event_type={ev.type_code:#x} "
                             f"body={ev.body[:64].hex()}]",
                }
            continue
        base = {
            "ts": ev.timestamp,
            "server_id": ev.server_id,
            "file": file_name,
            "pos": ev.log_pos,
            "gtid": current_gtid,
            "xid": None,
            "query": None,
        }
        if ev.type_code in row_event_types:
            try:
                table_id, rows = BR.decode_rows_event(ev.body, ev.type_code, registry)
            except Exception as exc:  # noqa: BLE001 — quarantine, don't crash
                # K4 analog: an undecodable event (unknown type code, no
                # TABLE_MAP, truncated payload) routes to the dead-letter
                # side instead of killing the ingest loop (the reference
                # writer's bad-record path, delta/writer.rs:317-338).
                # op="ERR" + NULL images; split_dead_letters picks it up.
                yield {
                    **base,
                    "database": "",
                    "table": "",
                    "op": "ERR",
                    "before": None,
                    "after": None,
                    "query": f"{type(exc).__name__}: {exc} "
                             f"[event_type={ev.type_code:#x} "
                             f"body={ev.body[:64].hex()}]",
                }
                continue
            entry = registry.get(table_id)
            if ev.type_code in BR._WRITE_EVENTS:
                op = "I"
            elif ev.type_code in BR._UPDATE_EVENTS:
                op = "U"
            else:
                op = "D"
            for row in rows:
                env = {
                    **base,
                    "database": entry.schema_name,
                    "table": entry.table_name,
                    "op": op,
                    "before": _jsonable(row.get("before")),
                    "after": _jsonable(row.get("after")),
                    "query": rows_query,
                }
                if xa["current"] is not None:
                    xa["buffer"].setdefault(xa["current"], []).append(env)
                else:
                    yield env
        elif ev.type_code == QUERY_EVENT:
            schema, sql = _decode_query(ev.body)
            up = sql.strip().upper()
            if up in ("BEGIN", "COMMIT"):
                if up == "COMMIT":
                    rows_query = None  # txn over — don't smear the SQL
                continue
            if up.startswith("XA "):
                # key by the parsed xid; an unparseable text degrades to
                # the normalized statement tail (everything after the
                # verb, with a one-phase commit's trailing ONE PHASE
                # stripped), which is then identical between a txn's
                # START and its COMMIT/ROLLBACK — so exotic
                # serializations still pair up instead of silently
                # orphaning the buffer
                xid = _parse_xa_xid(sql)
                parts = sql.strip().split(None, 2)
                tail = parts[2].strip() if len(parts) > 2 else ""
                if tail.upper().endswith("ONE PHASE"):
                    tail = tail[: -len("ONE PHASE")].strip().rstrip(",")
                key = xid if xid is not None else ("raw", tail)
                if up.startswith(("XA START", "XA BEGIN")):
                    xa["current"] = key
                    # materialize the entry NOW: a prepared txn with
                    # zero decoded rows (empty txn, or every row DLQ'd)
                    # must still have its COMMIT answered with a TXN
                    # marker, not a spurious unknown-prepare ERR
                    xa["buffer"].setdefault(key, [])
                elif up.startswith("XA END"):
                    pass  # statement phase over; txn resolves at prepare
                elif up.startswith("XA COMMIT"):
                    rows_query = None
                    # real servers log one-phase XA as this QUERY form
                    # with NO prepare event — the statement phase is
                    # still open here, so always close it
                    xa["current"] = None
                    held = xa["buffer"].pop(key, None)
                    if held is None:
                        # the prepare re-keyed a raw-tail buffer under
                        # its binary xid; follow the alias
                        alt = xa["alias"].pop(key, None)
                        if alt is not None:
                            held = xa["buffer"].pop(alt, None)
                    if held is None and xid is not None:
                        held = xa["buffer"].pop(("raw", parts[2].strip()),
                                                None)
                    if held is None:
                        # commit for a txn we never saw prepare: its
                        # rows were logged before this stream's start
                        # offset. Say so loudly (DLQ) — resuming past
                        # an unresolved prepare loses data.
                        yield {
                            **base, "database": schema, "table": "",
                            "op": "ERR", "before": None, "after": None,
                            "query": "XA COMMIT for unknown prepared"
                                     f" transaction: {sql} — rows were"
                                     " logged before this stream's"
                                     " start offset",
                        }
                        continue
                    # purge any alias still pointing at the decided txn
                    # (added when an unparseable START was re-keyed at
                    # prepare but the COMMIT parsed fine)
                    xa["alias"] = {
                        k: v for k, v in xa["alias"].items() if v != key
                    }
                    for env in held:
                        # (file, pos)-pin to the commit: the only
                        # offset at which these rows are durably
                        # decided (the prepare may sit in an earlier
                        # binlog file entirely)
                        yield {**env, "file": file_name,
                               "pos": ev.log_pos, "gtid": current_gtid}
                    yield {
                        **base, "database": schema, "table": "",
                        "op": "TXN", "before": None, "after": None,
                        "query": sql,
                    }
                elif up.startswith("XA ROLLBACK"):
                    rows_query = None
                    xa["current"] = None  # may close a one-phase block
                    xa["buffer"].pop(key, None)  # phantoms never emitted
                    alt = xa["alias"].pop(key, None)
                    if alt is not None:
                        xa["buffer"].pop(alt, None)
                    if xid is not None:
                        xa["buffer"].pop(("raw", parts[2].strip()), None)
                continue
            yield {
                **base,
                "database": schema,
                "table": "",
                "op": "DDL",
                "before": None,
                "after": None,
                "query": sql,
            }
        elif ev.type_code == XA_PREPARE_LOG_EVENT:
            try:
                one_phase, xid = _decode_xa_prepare(ev.body)
            except Exception as exc:  # noqa: BLE001 — quarantine
                # a truncated/corrupt prepare must not kill the ingest
                # generator (same policy as the row-event path)
                xa["current"] = None
                yield {
                    **base, "database": "", "table": "",
                    "op": "ERR", "before": None, "after": None,
                    "query": f"{type(exc).__name__}: {exc} "
                             f"[event_type={ev.type_code:#x} "
                             f"body={ev.body[:64].hex()}]",
                }
                continue
            # the prepare always refers to the txn whose statements just
            # ran: re-key its buffer under the BINARY xid so the later
            # XA COMMIT (parsed from text) matches even when XA START's
            # text form didn't parse
            cur = xa["current"]
            xa["current"] = None  # statement phase sealed
            if cur is not None and cur != xid and cur in xa["buffer"]:
                xa["buffer"][xid] = xa["buffer"].pop(cur)
                xa["alias"][cur] = xid  # let a raw-tail COMMIT find it
            if one_phase:
                # XA COMMIT ... ONE PHASE: decided right here
                rows_query = None
                for env in xa["buffer"].pop(xid, []):
                    yield {**env, "file": file_name, "pos": ev.log_pos,
                           "gtid": current_gtid}
                # render the decoded xid into the marker (same audit
                # linkage the QUERY-form one-phase path preserves by
                # carrying the full statement text; ADVICE r8)
                fmt, gtrid, bqual = xid
                yield {
                    **base, "database": "", "table": "",
                    "op": "TXN", "before": None, "after": None,
                    "query": f"XA COMMIT X'{gtrid.hex()}',X'{bqual.hex()}'"
                             f",{fmt} ONE PHASE",
                }
            continue
        elif ev.type_code == XID_EVENT:
            rows_query = None  # statement context ends with the txn
            yield {
                **base,
                "xid": int.from_bytes(ev.body[0:8], "little"),
                "database": "",
                "table": "",
                "op": "TXN",
                "before": None,
                "after": None,
            }
        # Rotate / FDE / heartbeat / previous-gtids: positional metadata,
        # consumed internally (reference conn.rs:311-317 does the same).
    if _xa_state is None and any(xa["buffer"].values()):
        # the stream ended (file EOF, or a microbatch's end offset in
        # the live source) with prepared-but-undecided XA transactions.
        # Their rows cannot be emitted — a later XA ROLLBACK may still
        # retract them — but they are NOT dropped silently either: one
        # DLQ record per unresolved txn makes the split visible (the
        # later batch's XA COMMIT then raises its own unknown-prepare
        # DLQ record). Recover by resuming from <= the earliest
        # unresolved XA START. Top-level only: the payload recursion
        # shares this state and must not flush it.
        for key, held in xa["buffer"].items():
            if not held:
                continue  # an undecided EMPTY txn loses nothing
            yield {
                "ts": held[-1]["ts"],
                "server_id": held[-1]["server_id"],
                "file": file_name,
                "pos": held[-1]["pos"],
                "gtid": held[-1]["gtid"],
                "xid": None,
                "database": "",
                "table": "",
                "op": "ERR",
                "before": None,
                "after": None,
                "query": "unresolved XA prepare at stream end:"
                         f" {len(held)} row(s) held for xid {key!r} —"
                         " resume from <= this transaction's XA START"
                         " or re-snapshot",
            }


def _jsonable(image: dict | None) -> dict | None:
    if image is None:
        return None
    out = {}
    for k, v in image.items():
        if isinstance(v, (datetime.datetime, datetime.date)):
            out[k] = v.isoformat()
        elif v is None or isinstance(v, (int, float, str, bool)):
            out[k] = v
        else:  # Decimal, bytes…
            out[k] = str(v)
    return out


def binlog_file_to_jsonl(binlog_path: str, out_path: str) -> int:
    """Convert a binary binlog into the JSONL the streaming replay source
    consumes. Returns the number of events written."""
    import json

    n = 0
    with open(out_path, "w") as fh:
        for ev in parse_binlog_file(binlog_path):
            fh.write(json.dumps(ev) + "\n")
            n += 1
    return n
