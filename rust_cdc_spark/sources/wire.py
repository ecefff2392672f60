"""MySQL client/replication wire protocol: packet framing, handshake and
auth scrambles, COM_BINLOG_DUMP, and the event stream — the S1 "live
source" slot, testable against scripted socket bytes.

Everything here is the publicly documented protocol (dev.mysql.com
client/server protocol docs; the reference implements the same frames in
Rust: handshake/auth /root/reference/src/mysql/conn.rs:133-157,499-604,
auth plugins src/mysql/connection/auth.rs:17-190, dump request
conn.rs:307-356 — re-derived here, not translated).

Transport is any ``read(n) -> bytes`` object (socket file, BytesIO, pcap
replay), so the whole conversation unit-tests without a server: frames →
events → ``binlog_file.envelopes_from_events`` → the exact JSONL shape
the streaming replay source consumes. A production connector is these
functions over a TCP socket plus the replay source's offset contract.
"""

from __future__ import annotations

import hashlib
import struct
from collections.abc import Iterator
from dataclasses import dataclass

from rust_cdc_spark.sources.binlog_file import (
    FORMAT_DESCRIPTION_EVENT,
    HEADER_LEN,
    RawEvent,
    verify_crc32,
)

MAX_PACKET = 0xFFFFFF

# capability flags (protocol constants)
CLIENT_LONG_PASSWORD = 0x0001
CLIENT_PROTOCOL_41 = 0x0200
CLIENT_SECURE_CONNECTION = 0x8000
CLIENT_PLUGIN_AUTH = 0x0008_0000
CLIENT_CONNECT_WITH_DB = 0x0008
CLIENT_SSL = 0x0800
CLIENT_DEPRECATE_EOF = 0x0100_0000

COM_BINLOG_DUMP = 0x12
COM_REGISTER_SLAVE = 0x15
BINLOG_DUMP_NON_BLOCK = 0x01


# ── Packet framing ──────────────────────────────────────────────────────

def read_packet(stream) -> tuple[int, bytes]:
    """One logical packet: 3-byte LE length + 1-byte sequence + payload,
    re-assembling the 16 MiB (0xFFFFFF) continuation chain."""
    parts: list[bytes] = []
    while True:
        header = _read_exact(stream, 4)
        length = int.from_bytes(header[0:3], "little")
        seq = header[3]
        parts.append(_read_exact(stream, length))
        if length < MAX_PACKET:
            return seq, b"".join(parts)


def write_packet(seq: int, payload: bytes) -> bytes:
    """Frame a payload, splitting at the 16 MiB boundary per protocol."""
    out = bytearray()
    while True:
        chunk, payload = payload[:MAX_PACKET], payload[MAX_PACKET:]
        out += len(chunk).to_bytes(3, "little") + bytes([seq & 0xFF]) + chunk
        seq += 1
        if len(chunk) < MAX_PACKET:
            return bytes(out)


def _read_exact(stream, n: int) -> bytes:
    buf = b""
    while len(buf) < n:
        chunk = stream.read(n - len(buf))
        if not chunk:
            raise EOFError(f"stream closed mid-packet ({len(buf)}/{n} bytes)")
        buf += chunk
    return buf


# ── Handshake / auth ────────────────────────────────────────────────────

@dataclass
class Handshake:
    protocol_version: int
    server_version: str
    connection_id: int
    nonce: bytes  # 20-byte scramble (8 + 12 across the two chunks)
    capabilities: int
    auth_plugin: str


def parse_handshake(payload: bytes) -> Handshake:
    """Initial Handshake Packet v10 (conn.rs:133-157 reads the same)."""
    protocol_version = payload[0]
    end = payload.index(0, 1)
    server_version = payload[1:end].decode()
    pos = end + 1
    connection_id = int.from_bytes(payload[pos : pos + 4], "little")
    pos += 4
    nonce1 = payload[pos : pos + 8]
    pos += 9  # 8 scramble + 1 filler
    cap_low = int.from_bytes(payload[pos : pos + 2], "little")
    pos += 2
    auth_plugin = ""
    nonce2 = b""
    cap_high = 0
    if pos < len(payload):
        pos += 1  # charset
        pos += 2  # status flags
        cap_high = int.from_bytes(payload[pos : pos + 2], "little")
        pos += 2
        auth_len = payload[pos]
        pos += 1 + 10  # auth data len + reserved
        nonce2 = payload[pos : pos + max(13, auth_len - 8) - 1]
        pos += max(13, auth_len - 8)
        if (cap_high << 16) & CLIENT_PLUGIN_AUTH:
            pend = payload.index(0, pos) if 0 in payload[pos:] else len(payload)
            auth_plugin = payload[pos:pend].decode()
    return Handshake(
        protocol_version,
        server_version,
        connection_id,
        nonce1 + nonce2,
        (cap_high << 16) | cap_low,
        auth_plugin,
    )


def scramble_native_password(password: str, nonce: bytes) -> bytes:
    """mysql_native_password: SHA1(pass) XOR SHA1(nonce + SHA1(SHA1(pass)))
    (reference auth.rs:17-60)."""
    if not password:
        return b""
    h1 = hashlib.sha1(password.encode()).digest()
    h2 = hashlib.sha1(h1).digest()
    h3 = hashlib.sha1(nonce[:20] + h2).digest()
    return bytes(a ^ b for a, b in zip(h1, h3))


def scramble_caching_sha2(password: str, nonce: bytes) -> bytes:
    """caching_sha2_password fast path: XOR(SHA256(pass),
    SHA256(SHA256(SHA256(pass)) + nonce)) (reference auth.rs:62-190)."""
    if not password:
        return b""
    h1 = hashlib.sha256(password.encode()).digest()
    h2 = hashlib.sha256(h1).digest()
    h3 = hashlib.sha256(h2 + nonce[:20]).digest()
    return bytes(a ^ b for a, b in zip(h1, h3))


def _sha256_password_initial(password: str, nonce: bytes) -> bytes:
    """sha256_password (non-TLS): the initial auth response is a single
    0x01 byte — a request for the server's RSA public key; the password
    goes RSA-encrypted in the auth continuation (reference
    auth.rs:29-30 routes the plugin straight into encrypt_rsa with
    request id 0x01; mariadb.com/kb/en/sha256_password-plugin)."""
    if not password:
        return b""
    return b"\x01"


_SCRAMBLERS = {
    "mysql_native_password": scramble_native_password,
    "caching_sha2_password": scramble_caching_sha2,
    "sha256_password": _sha256_password_initial,
}


# ── caching_sha2 full auth: RSA-OAEP password exchange ──────────────────
# When the server's scramble cache misses it answers the fast-path
# scramble with AuthMoreData 0x04 ("perform full authentication"); over
# a non-TLS connection the client then requests the server's RSA public
# key, XORs the NUL-terminated password with the nonce (wrapping), and
# sends it RSA-OAEP(SHA-1)-encrypted (reference auth.rs:127-190; the
# MariaDB/MySQL caching_sha2_password docs describe the same exchange).
# Implemented from the public specs — PKCS#8/PKCS#1 DER layout and
# RFC 8017 EME-OAEP — with an injectable RNG so the padding is
# deterministic under test.

AUTH_MORE_DATA = 0x01
AUTH_SWITCH = 0xFE
FAST_AUTH_OK = 0x03
PERFORM_FULL_AUTH = 0x04
PUBLIC_KEY_REQUEST = 0x02


def _der_read(buf: bytes, off: int) -> tuple[int, bytes, int]:
    """One DER TLV: (tag, content, next_offset)."""
    tag = buf[off]
    length = buf[off + 1]
    off += 2
    if length & 0x80:
        nbytes = length & 0x7F
        length = int.from_bytes(buf[off:off + nbytes], "big")
        off += nbytes
    return tag, buf[off:off + length], off + length


def parse_rsa_public_key_pem(pem: bytes | str) -> tuple[int, int]:
    """PEM public key → (n, e). Accepts the X.509 SubjectPublicKeyInfo
    form MySQL sends (``BEGIN PUBLIC KEY``) and bare PKCS#1
    (``BEGIN RSA PUBLIC KEY``)."""
    import base64

    text = pem.decode() if isinstance(pem, bytes) else pem
    b64 = "".join(
        line.strip() for line in text.splitlines()
        if line.strip() and not line.startswith("-----")
    )
    der = base64.b64decode(b64)
    tag, body, _ = _der_read(der, 0)
    if tag != 0x30:
        raise WireError(0, "malformed RSA public key (no outer SEQUENCE)")
    tag, first, nxt = _der_read(body, 0)
    if tag == 0x02:  # PKCS#1: SEQUENCE { INTEGER n, INTEGER e }
        n = int.from_bytes(first, "big")
        _, e_bytes, _ = _der_read(body, nxt)
        return n, int.from_bytes(e_bytes, "big")
    # SPKI: SEQUENCE { SEQUENCE alg, BIT STRING { PKCS#1 } }
    tag, bitstr, _ = _der_read(body, nxt)
    if tag != 0x03:
        raise WireError(0, "malformed RSA public key (no BIT STRING)")
    _, inner, _ = _der_read(bitstr[1:], 0)  # [0] = unused-bits count
    tag, n_bytes, nxt = _der_read(inner, 0)
    _, e_bytes, _ = _der_read(inner, nxt)
    return int.from_bytes(n_bytes, "big"), int.from_bytes(e_bytes, "big")


def _mgf1(seed: bytes, length: int) -> bytes:
    out = b""
    counter = 0
    while len(out) < length:
        out += hashlib.sha1(seed + counter.to_bytes(4, "big")).digest()
        counter += 1
    return out[:length]


def rsa_oaep_encrypt(message: bytes, n: int, e: int, rng=None) -> bytes:
    """RFC 8017 RSAES-OAEP with SHA-1/MGF1-SHA1 and an empty label (the
    padding MySQL's full-auth path uses). ``rng(hLen) -> bytes``
    defaults to ``os.urandom``; inject for deterministic tests."""
    import os

    rng = rng or os.urandom
    k = (n.bit_length() + 7) // 8
    h_len = 20
    if len(message) > k - 2 * h_len - 2:
        raise WireError(0, "password too long for server RSA key")
    l_hash = hashlib.sha1(b"").digest()
    ps = bytes(k - len(message) - 2 * h_len - 2)
    db = l_hash + ps + b"\x01" + message
    seed = rng(h_len)
    masked_db = bytes(
        a ^ b for a, b in zip(db, _mgf1(seed, k - h_len - 1))
    )
    masked_seed = bytes(a ^ b for a, b in zip(seed, _mgf1(masked_db, h_len)))
    em = b"\x00" + masked_seed + masked_db
    c = pow(int.from_bytes(em, "big"), e, n)
    return c.to_bytes(k, "big")


def _xor_rotating(data: bytes, key: bytes) -> bytes:
    """XOR with key wrap-around (the reference's xor_eq, auth.rs:168)."""
    return bytes(b ^ key[i % len(key)] for i, b in enumerate(data))


def encrypt_password_full_auth(
    password: str, nonce: bytes, pem: bytes | str, rng=None
) -> bytes:
    """The full-auth payload: RSA-OAEP(XOR(password + NUL, nonce))."""
    n, e = parse_rsa_public_key_pem(pem)
    plain = _xor_rotating(password.encode() + b"\x00", nonce[:20])
    return rsa_oaep_encrypt(plain, n, e, rng=rng)


def authenticate(
    stream, send, password: str, handshake: Handshake, seq: int, rng=None
) -> None:
    """Drive the post-HandshakeResponse auth conversation to OK/ERR.

    Handles: plain OK; ERR; AuthSwitchRequest (re-scramble with the
    requested plugin + fresh nonce); caching_sha2 AuthMoreData fast-auth
    success (0x03 → await OK) and perform-full-auth (0x04 → public-key
    request, RSA-OAEP password exchange, await OK); sha256_password
    AuthMoreData carrying the server public key directly (the initial
    response already requested it)."""
    nonce = handshake.nonce
    plugin = handshake.auth_plugin or "mysql_native_password"
    while True:
        pseq, reply = read_packet(stream)
        if not reply:
            raise WireError(0, "empty auth packet")
        head = reply[0]
        if head == 0x00:  # OK
            return
        if head == ERR_HEADER:
            code = int.from_bytes(reply[1:3], "little")
            raise WireError(code, reply[3:].decode("utf-8", "replace"))
        if head == AUTH_SWITCH:
            end = reply.index(0, 1)
            plugin = reply[1:end].decode()
            nonce = reply[end + 1:].rstrip(b"\x00")
            if plugin not in _SCRAMBLERS:
                raise WireError(0, f"unsupported auth plugin {plugin!r}")
            send(write_packet(pseq + 1, _SCRAMBLERS[plugin](password, nonce)))
            continue
        if head == AUTH_MORE_DATA:
            if plugin == "sha256_password":
                # the payload IS the PEM public key we asked for with
                # the initial 0x01 response
                send(write_packet(
                    pseq + 1,
                    encrypt_password_full_auth(password, nonce, reply[1:],
                                               rng=rng),
                ))
                continue
            status = reply[1] if len(reply) > 1 else None
            if status == FAST_AUTH_OK:
                continue  # OK packet follows
            if status == PERFORM_FULL_AUTH:
                send(write_packet(pseq + 1, bytes([PUBLIC_KEY_REQUEST])))
                kseq, key_pkt = read_packet(stream)
                pem = key_pkt[1:] if key_pkt[:1] == b"\x01" else key_pkt
                send(write_packet(
                    kseq + 1,
                    encrypt_password_full_auth(password, nonce, pem,
                                               rng=rng),
                ))
                continue
            raise WireError(0, f"unexpected AuthMoreData status {status}")
        raise WireError(0, f"unexpected auth packet header {head:#x}")


def _capability_flags(
    handshake: Handshake, database: str | None, ssl: bool
) -> int:
    caps = (
        CLIENT_LONG_PASSWORD | CLIENT_PROTOCOL_41
        | CLIENT_SECURE_CONNECTION | CLIENT_PLUGIN_AUTH
    )
    # Negotiate DEPRECATE_EOF when the server offers it (conn.rs:162 sets
    # it unconditionally; masking keeps pre-5.7 servers on classic
    # framing, which read_text_resultset also handles).
    caps |= handshake.capabilities & CLIENT_DEPRECATE_EOF
    if database:
        caps |= CLIENT_CONNECT_WITH_DB
    if ssl:
        caps |= CLIENT_SSL
    return caps


def build_ssl_request(
    handshake: Handshake, database: str | None = None
) -> bytes:
    """SSLRequest: the 32-byte fixed prefix of HandshakeResponse41 with
    CLIENT_SSL set (protocol/connect/ssl_request.rs encodes the same
    caps/max-packet/collation/23-reserved layout). Sent in the clear at
    seq 1; the full HandshakeResponse then repeats these flags over the
    upgraded TLS stream at seq 2."""
    caps = _capability_flags(handshake, database, ssl=True)
    return struct.pack("<IIB23x", caps, 1 << 24, 45)


def build_handshake_response(
    user: str,
    password: str,
    handshake: Handshake,
    database: str | None = None,
    ssl: bool = False,
) -> bytes:
    """Handshake Response 41 (conn.rs:499-604 writes the same fields).
    ``ssl=True`` keeps CLIENT_SSL in the flags so they byte-match the
    SSLRequest that preceded the TLS upgrade."""
    plugin = handshake.auth_plugin or "mysql_native_password"
    auth = _SCRAMBLERS[plugin](password, handshake.nonce)
    caps = _capability_flags(handshake, database, ssl=ssl)
    out = struct.pack("<IIB23x", caps, 1 << 24, 45)  # caps, max pkt, utf8mb4
    out += user.encode() + b"\x00"
    out += bytes([len(auth)]) + auth
    if database:
        out += database.encode() + b"\x00"
    out += plugin.encode() + b"\x00"
    return out


def tls_upgrade(sock, context=None, server_hostname: str | None = None):
    """Wrap an already-connected socket in TLS, at the point right after
    the SSLRequest packet went out (the reference upgrades its stream the
    same way: connection/stream.rs, Capabilities::SSL at :61). The
    default context skips certificate verification — the posture of the
    reference's MySqlSslMode::Preferred with no ssl_ca (conn.rs:64-65);
    pass a verifying context (``ssl.create_default_context(cafile=…)``)
    for VerifyCa/VerifyIdentity semantics."""
    import ssl

    if context is None:
        context = ssl.SSLContext(ssl.PROTOCOL_TLS_CLIENT)
        context.check_hostname = False
        context.verify_mode = ssl.CERT_NONE
    return context.wrap_socket(
        sock, server_hostname=server_hostname or "mysql"
    )


def establish(
    sock,
    user: str,
    password: str,
    database: str | None = None,
    ssl_mode: str = "preferred",
    ssl_context=None,
):
    """Connection phase over a real socket: read the greeting; if
    ``ssl_mode`` allows and the server offers CLIENT_SSL, send SSLRequest
    and upgrade to TLS; send HandshakeResponse41 (over TLS when
    upgraded); drive auth to OK. Returns ``(stream, send, handshake)``
    speaking over the (possibly TLS-wrapped) socket — ready for
    ``session_setup`` / ``replicate``-style conversations.

    ``ssl_mode``: ``"disabled"`` never upgrades, ``"preferred"`` upgrades
    when the server offers (the reference's default, conn.rs:64),
    ``"required"`` raises if the server lacks CLIENT_SSL."""
    stream = sock.makefile("rb")
    seq, payload = read_packet(stream)
    hs = parse_handshake(payload)
    offers = bool(hs.capabilities & CLIENT_SSL)
    if ssl_mode == "required" and not offers:
        raise WireError(0, "server does not support TLS")
    use_ssl = ssl_mode != "disabled" and offers
    if use_ssl:
        sock.sendall(write_packet(seq + 1, build_ssl_request(hs, database)))
        sock = tls_upgrade(sock, context=ssl_context)
        stream = sock.makefile("rb")
        seq += 1
    sock.sendall(write_packet(
        seq + 1,
        build_handshake_response(user, password, hs, database, ssl=use_ssl),
    ))
    authenticate(stream, sock.sendall, password, hs, seq + 1)
    return stream, sock.sendall, hs


def build_com_binlog_dump(server_id: int, log_file: str, log_pos: int) -> bytes:
    """COM_BINLOG_DUMP: resume the event stream at (file, pos) — the wire
    form of the replay source's offset contract (conn.rs:307-317)."""
    return (
        bytes([COM_BINLOG_DUMP])
        + struct.pack("<IHI", log_pos, 0, server_id)
        + log_file.encode()
    )


COM_BINLOG_DUMP_GTID = 0x1E
BINLOG_THROUGH_GTID = 0x04


def build_com_binlog_dump_gtid(
    server_id: int,
    gtid_set_data: bytes,
    log_file: str = "",
    log_pos: int = 4,
) -> bytes:
    """COM_BINLOG_DUMP_GTID: GTID auto-positioning — "send everything my
    executed set doesn't contain". The modern fleet resume: after a
    failover the new primary's (file, pos) numbering is unrelated, but
    the GTID set is server-independent, so the same checkpoint resumes
    against ANY server. Public wire layout (little-endian): command
    byte, u16 flags (BINLOG_THROUGH_GTID), u32 server_id, u32
    filename-length + name, u64 pos, u32 data-size + the SID-block set
    (``GtidSet.encode()``). Beyond the reference, which only ever
    issues positional dumps (conn.rs:307-317)."""
    name = log_file.encode()
    return (
        bytes([COM_BINLOG_DUMP_GTID])
        + struct.pack("<HI", BINLOG_THROUGH_GTID, server_id)
        + struct.pack("<I", len(name))
        + name
        + struct.pack("<Q", log_pos)
        + struct.pack("<I", len(gtid_set_data))
        + gtid_set_data
    )


# ── Replication event stream ────────────────────────────────────────────

OK_HEADER = 0x00
ERR_HEADER = 0xFF
EOF_HEADER = 0xFE


class WireError(RuntimeError):
    def __init__(self, code: int, message: str):
        super().__init__(f"MySQL error {code}: {message}")
        self.code = code


class DumpInterrupted(WireError):
    """The dump socket died WITHOUT a clean EOF/ERR packet — a transport
    failure (reset, half-close, network partition), not a protocol end.
    Distinct from WireError-with-a-code so callers can retry transport
    failures while still failing fast on server refusals (e.g. 1236 bad
    log position)."""

    def __init__(self, message: str):
        super().__init__(0, message)


def binlog_events_from_stream(
    stream, strict: bool = False, verify_checksum: bool = True
) -> Iterator[RawEvent]:
    """Post-COM_BINLOG_DUMP packet stream → RawEvents. Each packet is
    0x00 + event frame (19-byte header + body); 0xFE (short) ends the
    stream, 0xFF raises the server error. Learns the checksum algorithm
    from the FORMAT_DESCRIPTION event exactly like the file reader, and
    (by default) VERIFIES each CRC32 trailer — a mismatch marks the
    event ``crc_ok=False`` so the shared envelope loop quarantines it
    to the DLQ instead of decoding bytes the link corrupted (the
    reference only strips the trailer, decode.rs:335-341).

    ``strict=True`` (the live connector) raises :class:`DumpInterrupted`
    when the byte stream ends without an EOF packet — on a real server a
    dump NEVER ends spontaneously, so bare EOF always means the
    transport died mid-batch and silently returning would truncate the
    microbatch (committed offsets would then skip the lost tail: data
    loss, not an error). ``strict=False`` keeps the lenient behavior for
    scripted/recorded buffers that simply run out of bytes."""
    checksum_len = 0
    while True:
        try:
            _, payload = read_packet(stream)
        except EOFError:
            if strict:
                raise DumpInterrupted(
                    "dump stream ended without EOF packet (transport"
                    " failure mid-dump)"
                ) from None
            return
        marker = payload[0]
        if marker == EOF_HEADER and len(payload) < 9:
            return
        if marker == ERR_HEADER:
            code = int.from_bytes(payload[1:3], "little")
            msg = payload[3:].decode("utf-8", errors="replace")
            if msg.startswith("#"):  # sql-state prefix
                msg = msg[6:]
            raise WireError(code, msg)
        frame = payload[1:]
        header, body = frame[:HEADER_LEN], frame[HEADER_LEN:]
        type_code = header[4]
        if type_code == FORMAT_DESCRIPTION_EVENT:
            alg = body[-5]
            checksum_len = 4 if alg == 1 else 0
        crc_ok = True
        if checksum_len:
            stripped, ok = verify_crc32(header, body)
            crc_ok = ok or not verify_checksum
        else:
            stripped = body
        yield RawEvent(
            timestamp=int.from_bytes(header[0:4], "little"),
            type_code=type_code,
            server_id=int.from_bytes(header[5:9], "little"),
            event_size=int.from_bytes(header[9:13], "little"),
            log_pos=int.from_bytes(header[13:17], "little"),
            flags=int.from_bytes(header[17:19], "little"),
            body=stripped,
            crc_ok=crc_ok,
        )


def replicate(
    stream,
    user: str,
    password: str,
    server_id: int,
    log_file: str,
    log_pos: int,
    send,
) -> Iterator[RawEvent]:
    """Full conversation: handshake → auth → dump request → events.
    ``stream`` is the read side, ``send(bytes)`` the write side — a TCP
    socket in production, scripted buffers in tests."""
    seq, payload = read_packet(stream)
    hs = parse_handshake(payload)
    send(write_packet(seq + 1, build_handshake_response(user, password, hs)))
    authenticate(stream, send, password, hs, seq + 1)
    send(write_packet(0, build_com_binlog_dump(server_id, log_file, log_pos)))
    yield from binlog_events_from_stream(stream)


# ── COM_QUERY text protocol ──────────────────────────────────────────
# The reference drives its session setup over plain text queries before
# requesting the dump: SET NAMES / sql_mode / time_zone
# (/root/reference/src/mysql/conn.rs:499-604 establish), checksum
# negotiation (`SET @master_binlog_checksum` :367-374), `show master
# status` for the start position (:394-458 set_binlog_pos + fetch), and
# COM_PING keepalives (:376-380).

COM_QUERY = 0x03
COM_PING = 0x0E
_NULL_CELL = 0xFB


def build_com_query(sql: str) -> bytes:
    return bytes([COM_QUERY]) + sql.encode("utf-8")


def build_com_ping() -> bytes:
    return bytes([COM_PING])


def _lenenc_int(buf: bytes, off: int) -> tuple[int, int]:
    """MySQL length-encoded integer → (value, next_offset)."""
    first = buf[off]
    if first < 0xFB:
        return first, off + 1
    if first == 0xFC:
        return int.from_bytes(buf[off + 1:off + 3], "little"), off + 3
    if first == 0xFD:
        return int.from_bytes(buf[off + 1:off + 4], "little"), off + 4
    if first == 0xFE:
        return int.from_bytes(buf[off + 1:off + 9], "little"), off + 9
    raise ValueError(f"invalid lenenc prefix {first:#x}")


def _lenenc_str(buf: bytes, off: int) -> tuple[bytes, int]:
    n, off = _lenenc_int(buf, off)
    return buf[off:off + n], off + n


def _parse_column_def(payload: bytes) -> str:
    """Column definition packet → column name (the only field the
    session-setup queries need)."""
    off = 0
    for _ in range(4):  # catalog, schema, table, org_table
        _, off = _lenenc_str(payload, off)
    name, off = _lenenc_str(payload, off)
    return name.decode("utf-8", errors="replace")


def read_text_resultset(
    stream, deprecate_eof: bool = True
) -> tuple[list[str], list[list[str | None]]]:
    """Read a COM_QUERY response: (column_names, rows). Statements that
    return no rows (SET ...) yield ([], []). ERR raises WireError.

    ``deprecate_eof`` is the negotiated CLIENT_DEPRECATE_EOF capability:
    when False (classic framing, pre-5.7 servers or servers that did not
    offer the flag) the server sends an EOF packet between the column
    definitions and the first row — it is consumed here as a separator,
    NOT as end-of-rows."""
    _, payload = read_packet(stream)
    if payload and payload[0] == ERR_HEADER:
        code = int.from_bytes(payload[1:3], "little")
        raise WireError(code, payload[3:].decode("utf-8", errors="replace"))
    if payload and payload[0] == 0x00:  # OK — no resultset
        return [], []
    n_cols, _ = _lenenc_int(payload, 0)
    cols = []
    for _ in range(n_cols):
        _, p = read_packet(stream)
        cols.append(_parse_column_def(p))
    if not deprecate_eof:
        _, sep = read_packet(stream)
        if not (sep and sep[0] == 0xFE and len(sep) < 9):
            raise WireError(0, "expected EOF separator after column defs")
    rows: list[list[str | None]] = []
    while True:
        _, p = read_packet(stream)
        if p and p[0] == ERR_HEADER:
            code = int.from_bytes(p[1:3], "little")
            raise WireError(code, p[3:].decode("utf-8", errors="replace"))
        if p and p[0] == 0xFE and len(p) < 9:  # EOF / OK-as-EOF
            return cols, rows
        row: list[str | None] = []
        off = 0
        for _ in range(n_cols):
            if p[off] == _NULL_CELL:
                row.append(None)
                off += 1
            else:
                v, off = _lenenc_str(p, off)
                row.append(v.decode("utf-8", errors="replace"))
        rows.append(row)


def query(
    stream, send, sql: str, deprecate_eof: bool = True
) -> tuple[list[str], list[list[str | None]]]:
    """Send a text-protocol query and read its resultset."""
    send(write_packet(0, build_com_query(sql)))
    return read_text_resultset(stream, deprecate_eof=deprecate_eof)


def session_setup(
    stream, send, charset: str = "utf8mb4", deprecate_eof: bool = True
) -> tuple[str, int]:
    """The reference's pre-dump session ritual: pin charset/sql_mode/
    time_zone, negotiate checksum, fetch the master position. Returns
    (log_file, log_pos) to dump from. Pass the negotiated
    CLIENT_DEPRECATE_EOF flag (``handshake.capabilities &
    CLIENT_DEPRECATE_EOF``) so resultset framing matches the server."""
    q = lambda sql: query(stream, send, sql, deprecate_eof=deprecate_eof)  # noqa: E731
    q(f"SET NAMES {charset}")
    q("SET time_zone='+00:00'")
    q("SET @master_binlog_checksum = @@global.binlog_checksum")
    cols, rows = q("SHOW MASTER STATUS")
    if not rows:
        raise WireError(0, "binlog disabled: SHOW MASTER STATUS empty")
    file_idx = cols.index("File") if "File" in cols else 0
    pos_idx = cols.index("Position") if "Position" in cols else 1
    return rows[0][file_idx], int(rows[0][pos_idx])


def ping(stream, send) -> bool:
    send(write_packet(0, build_com_ping()))
    _, payload = read_packet(stream)
    return bool(payload) and payload[0] == 0x00
