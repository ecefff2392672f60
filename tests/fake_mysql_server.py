"""Loopback fake MySQL server for end-to-end live-connector tests.

Speaks just enough of the public protocol to drive
``rust_cdc_spark/streaming/live_source.py`` over a REAL TCP socket:
Initial Handshake v10 + mysql_native_password verification, the
COM_QUERY text protocol (SET → OK, SHOW MASTER STATUS / SHOW BINARY
LOGS → resultsets, classic EOF framing), COM_PING, and
COM_BINLOG_DUMP streaming raw event frames from a reference binlog
fixture (artificial ROTATE first, exactly like a live server, so the
client learns the current file name from the wire).

The visible binlog tail is mutable (``server.tail = pos``) so tests can
simulate new transactions arriving between microbatches: SHOW MASTER
STATUS reports the current tail and dumps stop there.
"""

from __future__ import annotations

import hashlib
import socket
import socketserver
import struct
import threading

from rust_cdc_spark.sources import wire as W

_CAPS_LOW = 0xFFFF & ~W.CLIENT_SSL  # classic framing: no DEPRECATE_EOF
NONCE = bytes(range(1, 21))


def _greeting_payload(offer_ssl: bool = False) -> bytes:
    cap = (_CAPS_LOW | W.CLIENT_PLUGIN_AUTH) & ~W.CLIENT_DEPRECATE_EOF
    if offer_ssl:
        cap |= W.CLIENT_SSL
    out = bytes([10]) + b"8.0.99-fake\x00"
    out += (99).to_bytes(4, "little")
    out += NONCE[:8] + b"\x00"
    out += (cap & 0xFFFF).to_bytes(2, "little")
    out += bytes([45])
    out += (2).to_bytes(2, "little")
    out += (cap >> 16).to_bytes(2, "little")
    out += bytes([21])
    out += bytes(10)
    out += NONCE[8:] + b"\x00"
    out += b"mysql_native_password\x00"
    return out


def _native_expected(password: str) -> bytes:
    if not password:
        return b""
    h1 = hashlib.sha1(password.encode()).digest()
    h2 = hashlib.sha1(h1).digest()
    mask = hashlib.sha1(NONCE + h2).digest()
    return bytes(a ^ b for a, b in zip(h1, mask))


OK = b"\x00\x00\x00\x02\x00"
EOF_PKT = b"\xfe\x00\x00\x02\x00"


def _lenenc(s: bytes) -> bytes:
    assert len(s) < 0xFB
    return bytes([len(s)]) + s


def _coldef(name: bytes) -> bytes:
    return (
        _lenenc(b"def") + _lenenc(b"") + _lenenc(b"") + _lenenc(b"")
        + _lenenc(name) + b"\x0c" + b"\x00" * 12
    )


def split_frames(path: str) -> list[bytes]:
    """Binlog file → raw event frames (header+body+checksum intact)."""
    data = open(path, "rb").read()
    assert data[:4] == b"\xfebin", f"{path}: not a binlog"
    frames, pos = [], 4
    while pos < len(data):
        size = int.from_bytes(data[pos + 9: pos + 13], "little")
        frames.append(data[pos: pos + size])
        pos += size
    return frames


def _frame_bounds(frames: list[bytes]) -> list[tuple[int, int]]:
    """(start_offset, end_offset) of each frame within the log file."""
    out, pos = [], 4
    for f in frames:
        out.append((pos, pos + len(f)))
        pos += len(f)
    return out


def _artificial_rotate(file_name: str, pos: int) -> bytes:
    body = struct.pack("<Q", pos) + file_name.encode()
    header = struct.pack(
        "<IBIIIH", 0, 0x04, 1, W.HEADER_LEN + len(body), 0, 0x20
    )
    return header + body


class FakeMySQLServer:
    """``with FakeMySQLServer(fixture_path, "binlog.000002") as srv:`` —
    then connect to 127.0.0.1:``srv.port`` with user/password
    ``srv.user``/``srv.password``."""

    def __init__(self, fixture_path: str, file_name: str,
                 user: str = "repl", password: str = "replpass",
                 ssl_context=None, column_names=None):
        self.frames = split_frames(fixture_path)
        self.bounds = _frame_bounds(self.frames)
        self.file_name = file_name
        self.user, self.password = user, password
        self.ssl_context = ssl_context  # server-side TLS when set
        # {(schema, table): [names]} answered to the live source's
        # information_schema.columns lookup (binlog_row_metadata=MINIMAL
        # masters put no COLUMN_NAME TLV on the wire)
        self.column_names = column_names or {}
        self.tail = self.bounds[-1][1]  # visible end of the log
        # GTID auto-position requests received: decoded executed-set
        # text per COM_BINLOG_DUMP_GTID
        self.gtid_dump_requests: list[str] = []
        # failure injection: when set to N, the NEXT dump abruptly
        # closes the socket (no EOF packet — a transport death, as a
        # network partition or master crash produces) after sending N
        # event frames, then re-arms to healthy so the retry succeeds
        self.drop_dump_after: int | None = None
        # like drop_dump_after but does NOT re-arm: EVERY dump dies
        # after N frames (until fewer than N remain, when it completes)
        # — a persistently flaky link that still makes forward progress
        # on each attempt. Exercises the per-stall retry budget.
        self.drop_every_dump_after: int | None = None
        self.dump_requests: list[tuple[str, int]] = []
        self.queries: list[str] = []
        self.tls_upgrades = 0
        outer = self

        class Handler(socketserver.BaseRequestHandler):
            def handle(self):  # noqa: PLR0912 — protocol switch
                sock = self.request
                sock.settimeout(60)
                stream = sock.makefile("rb")
                sock.sendall(W.write_packet(
                    0, _greeting_payload(offer_ssl=outer.ssl_context is not None)
                ))
                _, resp = W.read_packet(stream)
                caps = int.from_bytes(resp[0:4], "little")
                if outer.ssl_context is not None and (caps & W.CLIENT_SSL):
                    # 32-byte SSLRequest → upgrade, then the real
                    # HandshakeResponse arrives over TLS
                    assert len(resp) == 32, "expected SSLRequest prefix"
                    sock = outer.ssl_context.wrap_socket(
                        sock, server_side=True
                    )
                    self.request = sock
                    stream = sock.makefile("rb")
                    outer.tls_upgrades += 1
                    _, resp = W.read_packet(stream)
                # HandshakeResponse41: caps u32, max-packet u32, charset,
                # 23 reserved, NUL-user, lenenc auth
                user_end = resp.index(0, 32)
                user = resp[32:user_end].decode()
                alen = resp[user_end + 1]
                auth = resp[user_end + 2: user_end + 2 + alen]
                if user != outer.user or auth != _native_expected(outer.password):
                    sock.sendall(W.write_packet(
                        2, b"\xff\x15\x04#28000Access denied".replace(b"#", b"#", 1)
                    ))
                    return
                sock.sendall(W.write_packet(2, OK))
                while True:
                    try:
                        _, cmd = W.read_packet(stream)
                    except (EOFError, OSError):
                        return
                    if not cmd:
                        return
                    op = cmd[0]
                    if op == 0x01:  # COM_QUIT
                        return
                    if op == W.COM_PING:
                        sock.sendall(W.write_packet(1, OK))
                    elif op == W.COM_QUERY:
                        self._com_query(sock, cmd[1:].decode())
                    elif op == 0x12:  # COM_BINLOG_DUMP
                        self._dump(sock, cmd)
                        return  # dump mode ends the command loop
                    elif op == 0x1E:  # COM_BINLOG_DUMP_GTID
                        self._dump_gtid(sock, cmd)
                        return
                    else:
                        sock.sendall(W.write_packet(
                            1, b"\xff\x30\x04#42000unknown command"
                        ))

            def _com_query(self, sock, sql: str):
                outer.queries.append(sql)
                up = sql.strip().upper()
                if up == "SHOW MASTER STATUS":
                    self._resultset(
                        sock, [b"File", b"Position"],
                        [[outer.file_name.encode(),
                          str(outer.tail).encode()]],
                    )
                elif up == "SHOW BINARY LOGS":
                    self._resultset(
                        sock, [b"Log_name", b"File_size"],
                        [[outer.file_name.encode(),
                          str(outer.tail).encode()]],
                    )
                elif "INFORMATION_SCHEMA.COLUMNS" in up:
                    names = []
                    for (schema, table), cols in outer.column_names.items():
                        if f"'{schema}'" in sql and f"'{table}'" in sql:
                            names = cols
                            break
                    self._resultset(
                        sock, [b"COLUMN_NAME"],
                        [[n.encode()] for n in names],
                    )
                else:  # SET …, anything session-shaped
                    sock.sendall(W.write_packet(1, OK))

            def _resultset(self, sock, cols, rows):
                seq = 1
                sock.sendall(W.write_packet(seq, bytes([len(cols)])))
                for c in cols:
                    seq += 1
                    sock.sendall(W.write_packet(seq, _coldef(c)))
                seq += 1
                sock.sendall(W.write_packet(seq, EOF_PKT))  # classic sep
                for r in rows:
                    seq += 1
                    sock.sendall(W.write_packet(
                        seq, b"".join(_lenenc(v) for v in r)
                    ))
                seq += 1
                sock.sendall(W.write_packet(seq, EOF_PKT))

            def _dump(self, sock, cmd: bytes):
                pos = int.from_bytes(cmd[1:5], "little")
                file = cmd[11:].decode() or outer.file_name
                outer.dump_requests.append((file, pos))
                seq = 1
                sock.sendall(W.write_packet(
                    seq, b"\x00" + _artificial_rotate(file, pos)
                ))
                sent = 0
                for frame, (lo, hi) in zip(outer.frames, outer.bounds):
                    if hi > outer.tail:
                        break
                    # FDE is always (re)sent; data events from pos on
                    if lo >= pos or frame[4] == 0x0F:
                        if (
                            outer.drop_dump_after is not None
                            and sent >= outer.drop_dump_after
                        ):
                            outer.drop_dump_after = None  # fail ONCE
                            sock.close()  # mid-dump transport death
                            return
                        if (
                            outer.drop_every_dump_after is not None
                            and sent >= outer.drop_every_dump_after
                        ):
                            sock.close()  # chronic flaky link
                            return
                        seq += 1
                        sock.sendall(W.write_packet(seq, b"\x00" + frame))
                        sent += 1
                seq += 1
                sock.sendall(W.write_packet(seq, EOF_PKT))  # end of dump

            def _dump_gtid(self, sock, cmd: bytes):
                """COM_BINLOG_DUMP_GTID: parse the client's executed set
                and serve every transaction NOT in it — the server-side
                skip of GTID auto-positioning. Transactions are framed
                GTID event → … → XID; frames outside any GTID-tagged
                transaction (FDE, DDL on this fixture shape) always go.
                Assumes checksum-free fixtures (alg 0) so the GTID body
                parses at fixed offsets."""
                import struct
                import uuid as _uuid

                from rust_cdc_spark.streaming.gtid import GtidSet

                (nlen,) = struct.unpack_from("<I", cmd, 7)
                off = 11 + nlen + 8  # skip name + u64 pos
                (dsize,) = struct.unpack_from("<I", cmd, off)
                gset = GtidSet.decode(cmd[off + 4 : off + 4 + dsize])
                outer.gtid_dump_requests.append(str(gset))
                seq = 1
                sock.sendall(W.write_packet(
                    seq, b"\x00" + _artificial_rotate(outer.file_name, 4)
                ))
                skipping = False
                sent = 0
                for frame, (lo, hi) in zip(outer.frames, outer.bounds):
                    if hi > outer.tail:
                        break
                    tc = frame[4]
                    if tc == 0x21:  # GTID event opens a transaction
                        u = str(_uuid.UUID(bytes=frame[20:36]))
                        gno = int.from_bytes(frame[36:44], "little")
                        skipping = gset.contains(f"{u}:{gno}")
                        if skipping:
                            continue
                    elif skipping:
                        if tc == 0x10:  # XID closes the skipped txn
                            skipping = False
                        continue
                    if (
                        outer.drop_dump_after is not None
                        and sent >= outer.drop_dump_after
                    ):
                        outer.drop_dump_after = None  # fail ONCE
                        sock.close()  # mid-dump transport death
                        return
                    seq += 1
                    sock.sendall(W.write_packet(seq, b"\x00" + frame))
                    sent += 1
                seq += 1
                sock.sendall(W.write_packet(seq, EOF_PKT))

        class Server(socketserver.ThreadingTCPServer):
            allow_reuse_address = True
            daemon_threads = True

        self._server = Server(("127.0.0.1", 0), Handler)
        self.port = self._server.server_address[1]
        self._thread = threading.Thread(
            target=self._server.serve_forever, daemon=True
        )

    def __enter__(self):
        self._thread.start()
        return self

    def __exit__(self, *exc):
        self._server.shutdown()
        self._server.server_close()
        return False
