"""``mysql-cdc`` — the LIVE MySQL replica Structured Streaming source.

This is the composed wire connector: the same handshake/auth/dump
conversation as the reference's live loop
(/root/reference/src/mysql/conn.rs:133-157,297-357), driven over a real
TCP socket and mapped onto Spark's microbatch offset contract. It
composes three already-tested layers:

- ``sources/wire.py``       — packet framing, connection phase
  (native/caching_sha2/sha256 auth, optional TLS), COM_QUERY text
  protocol, COM_BINLOG_DUMP, post-dump event stream;
- ``sources/binlog_file.py::envelopes_from_events`` — transport-agnostic
  RawEvent → normalized CDC envelope decode (TABLE_MAP registry, GTID
  attach, DDL/Xid markers, DLQ quarantine);
- the replay source's offset discipline (``streaming/replay_source.py``)
  — {"file", "pos"} offsets, one ordered partition per microbatch.

Execution model (deliberately Spark-shaped, not a port of the
reference's single long-lived connection):

- The DRIVER polls the admin surface: ``initialOffset``/``latestOffset``
  issue ``SHOW MASTER STATUS`` over a persistent COM_QUERY connection —
  the binlog tail is the only cluster-global fact the planner needs.
- Each microbatch's EXECUTOR task opens its own dump connection and
  replays exactly ``[start, end)``: COM_BINLOG_DUMP is a random-access
  protocol (any (file, pos) may be requested), so a failed task retries
  idempotently with no shared socket state — Spark's offset+commit logs
  provide exactly-once downstream, where the reference approximates it
  with a 5 s offset recorder (conn.rs:272-295).
- A binlog is a single totally-ordered log, so ``partitions()`` returns
  ONE partition; parallelism comes downstream (routing, merge shuffle),
  never from splitting the log, which would break per-key ordering.

Options: ``host``, ``port``, ``user``, ``password``, ``serverid``
(replica server-id announced in the dump request), ``startingoffsets``
(``latest`` default | ``earliest`` | explicit ``{"file","pos"}`` JSON),
``sslmode`` (``disabled``|``preferred``|``required``),
``gtidexecuted`` (failover resume: drop already-applied transactions,
same contract as the replay source).
"""

from __future__ import annotations

import json
import socket as _socket
from dataclasses import dataclass

from pyspark.sql.datasource import (
    DataSource,
    DataSourceStreamReader,
    InputPartition,
)
from pyspark.sql.types import StructType

from rust_cdc_spark.datamodel import CDC_SCHEMA
from rust_cdc_spark.sources import wire as W


def _off_key(off: dict) -> tuple:
    # binlog names sort lexicographically (binlog.000001 …)
    return (off["file"], off["pos"])


@dataclass
class DumpPartition(InputPartition):
    options: dict
    start: dict
    end: dict


class _AdminConn:
    """Driver-side COM_QUERY connection (SHOW MASTER STATUS / SHOW
    BINARY LOGS / ping). Reconnects transparently — the planner only
    ever needs the next answer, not session state."""

    def __init__(self, options: dict):
        self.o = options
        self._stream = None
        self._send = None
        self._eof = True

    def _connect(self):
        sock = _socket.create_connection(
            (self.o["host"], int(self.o.get("port", "3306"))), timeout=30
        )
        sock.settimeout(30)
        stream, send, hs = W.establish(
            sock,
            self.o["user"],
            self.o.get("password", ""),
            ssl_mode=self.o.get("sslmode", "preferred"),
        )
        self._eof = bool(hs.capabilities & W.CLIENT_DEPRECATE_EOF)
        self._stream, self._send = stream, send

    def query(self, sql: str):
        for attempt in (0, 1):
            try:
                if self._stream is None:
                    self._connect()
                return W.query(
                    self._stream, self._send, sql, deprecate_eof=self._eof
                )
            except (OSError, EOFError):
                self._stream = None
                if attempt:
                    raise
        raise AssertionError("unreachable")

    def close(self) -> None:
        """Deterministically release the socket (executors resolving
        many tables must not leak one fd per lookup)."""
        stream, self._stream, self._send = self._stream, None, None
        if stream is None:
            return
        # sock.makefile() keeps the (possibly TLS-wrapped) socket on the
        # SocketIO layer; close both so the fd drops now, not at GC.
        sock = getattr(getattr(stream, "raw", None), "_sock", None)
        for closer in (stream, sock):
            if closer is not None:
                try:
                    closer.close()
                except OSError:
                    pass

    def __enter__(self):
        return self

    def __exit__(self, *exc):
        self.close()

    def master_status(self) -> dict:
        cols, rows = self.query("SHOW MASTER STATUS")
        if not rows:
            raise W.WireError(0, "binlog disabled: SHOW MASTER STATUS empty")
        f = cols.index("File") if "File" in cols else 0
        p = cols.index("Position") if "Position" in cols else 1
        return {"file": rows[0][f], "pos": int(rows[0][p])}

    def earliest(self) -> dict:
        cols, rows = self.query("SHOW BINARY LOGS")
        if not rows:
            raise W.WireError(0, "binlog disabled: SHOW BINARY LOGS empty")
        first = sorted(r[0] for r in rows)[0]
        return {"file": first, "pos": 4}  # 4 = past the magic, first event


def _open_dump(o: dict, log_file: str, log_pos: int, gtid_data: bytes | None = None):
    """Open one dump connection: TCP connect → handshake/auth (+TLS per
    sslmode) → session-setup ritual → COM_BINLOG_DUMP from (file, pos),
    or COM_BINLOG_DUMP_GTID (auto-positioning) when ``gtid_data`` — an
    encoded executed-GTID set — is given. Returns (sock, raw-event
    iterator in strict mode)."""
    sock = _socket.create_connection(
        (o["host"], int(o.get("port", "3306"))), timeout=30
    )
    sock.settimeout(30)
    try:
        stream, send, hs = W.establish(
            sock,
            o["user"],
            o.get("password", ""),
            ssl_mode=o.get("sslmode", "preferred"),
        )
        eof = bool(hs.capabilities & W.CLIENT_DEPRECATE_EOF)
        # the reference's pre-dump ritual: charset/tz pin + checksum
        # negotiation (conn.rs:499-604, 367-374); ignore the
        # position it returns — ours comes from the offset contract.
        try:
            W.session_setup(stream, send, deprecate_eof=eof)
        except W.WireError:
            pass  # minimal servers (tests) may not implement it all
        server_id = int(o.get("serverid", "54321"))
        if gtid_data is not None:
            send(W.write_packet(0, W.build_com_binlog_dump_gtid(
                server_id, gtid_data, log_file, log_pos
            )))
        else:
            send(W.write_packet(0, W.build_com_binlog_dump(
                server_id, log_file, log_pos
            )))
        # CRC32 verification defaults ON (corrupt link bytes → DLQ);
        # ``.option("verifychecksum", "false")`` restores strip-only.
        verify = o.get("verifychecksum", "true").lower() != "false"
        return sock, W.binlog_events_from_stream(
            stream, strict=True, verify_checksum=verify
        )
    except BaseException:
        sock.close()
        raise


def _resilient_dump(o: dict, start: dict):
    """RawEvent stream for one microbatch that SURVIVES transport
    failures: on a mid-dump socket death (strict-mode DumpInterrupted /
    OSError / timeout) it reconnects — full handshake + session setup —
    and re-issues COM_BINLOG_DUMP from the END position of the last
    event already delivered, so nothing is duplicated and nothing is
    lost (COM_BINLOG_DUMP is random-access; resuming mid-transaction is
    fine because the envelope decoder's registry/GTID state lives ABOVE
    this generator and persists across the reconnect). Server refusals
    (ERR packets — e.g. 1236 bad position) are NOT retried: those mean
    the request itself is wrong and a retry loop would hammer the
    master. ``reconnectretries`` (default 3) bounds attempts per batch;
    ``reconnectbackoff`` (seconds, default 0.5, linearly increasing)
    spaces them. Exactly-once does not DEPEND on this — a task that
    exhausts its retries fails and Spark's offset/commit logs + MERGE
    idempotence still deliver it on the re-run — this keeps transient
    blips from burning whole task/query retries.

    Resume-position tracking mirrors ``_until``'s file tracking: a real
    rotate resets (file, 4); the artificial rotate (log_pos 0) and the
    re-sent FDE (log_pos ≤ its original position) never move the cursor
    backwards because only ``log_pos > cur_pos`` advances it."""
    import time as _time

    retries = int(o.get("reconnectretries", "3"))
    backoff = float(o.get("reconnectbackoff", "0.5"))
    cur_file, cur_pos = start["file"], int(start["pos"])
    # GTID auto-positioning (``dumpgtid=true`` + ``gtidexecuted``): the
    # FIRST request is COM_BINLOG_DUMP_GTID — the server skips executed
    # transactions and CHOOSES the position, so (file, pos) is anchored
    # only once the first positioned event arrives; until then a
    # reconnect re-sends the GTID request (idempotent — the executed
    # set hasn't changed), after it the usual positional resume applies.
    gtid_data = None
    if o.get("dumpgtid", "").lower() == "true" and o.get("gtidexecuted"):
        from rust_cdc_spark.streaming.gtid import GtidSet

        gtid_data = GtidSet(o["gtidexecuted"]).encode()
    anchored = gtid_data is None
    attempt = 0
    # ``reconnectretries`` bounds attempts PER STALL, not per batch: a
    # reconnect that made forward progress (the cursor advanced since
    # the last failure) resets the counter, so a long microbatch over a
    # flaky link doesn't exhaust the budget cumulatively and burn a full
    # Spark task retry — the very cost this mechanism exists to avoid
    # (ADVICE r8).
    last_fail_at = (cur_file, cur_pos, anchored)
    while True:
        sock = None
        clean = False
        try:
            sock, raw = _open_dump(
                o, cur_file, cur_pos, None if anchored else gtid_data
            )
            for ev in raw:
                if ev.type_code == 0x04:  # ROTATE (real or artificial)
                    new_file = ev.body[8:].decode("utf-8", errors="replace")
                    if new_file != cur_file:
                        cur_file, cur_pos = new_file, 4
                    yield ev
                    continue
                yield ev
                if not anchored and ev.log_pos and ev.type_code != 0x0F:
                    # first positioned NON-FDE event: the server's chosen
                    # start is now known. The FDE must not anchor — it is
                    # always re-sent with its original file-start
                    # position, which in GTID mode can sit BEFORE the
                    # chosen start (a positional resume from there would
                    # replay the very transactions the server skipped).
                    cur_pos, anchored = ev.log_pos, True
                elif anchored and ev.log_pos and ev.log_pos > cur_pos:
                    cur_pos = ev.log_pos
            clean = True
        except W.DumpInterrupted:
            pass  # transport died mid-dump — retry below
        except (OSError, EOFError):
            pass  # connect/handshake-phase transport failure — retry
        finally:
            if sock is not None:
                sock.close()
        if clean:
            return  # server ended the dump with a clean EOF packet
        progressed = (cur_file, cur_pos, anchored) != last_fail_at
        last_fail_at = (cur_file, cur_pos, anchored)
        attempt = 1 if progressed else attempt + 1
        if attempt > retries:
            raise W.DumpInterrupted(
                f"dump failed {attempt} times for {cur_file}:{cur_pos}"
                f" (reconnectretries={retries} exhausted)"
            )
        _time.sleep(backoff * attempt)


class MySQLBinlogStreamReader(DataSourceStreamReader):
    def __init__(self, options: dict):
        self.options = dict(options)
        self._admin: _AdminConn | None = None

    def __getstate__(self):
        # the driver-side admin connection holds a live socket — never
        # ships to executors; read() opens its own dump connection
        state = dict(self.__dict__)
        state["_admin"] = None
        return state

    def _conn(self) -> _AdminConn:
        if self._admin is None:
            self._admin = _AdminConn(self.options)
        return self._admin

    def initialOffset(self) -> dict:
        mode = self.options.get("startingoffsets", "latest")
        if mode == "latest":
            return self._conn().master_status()
        if mode == "earliest":
            return self._conn().earliest()
        off = json.loads(mode)  # explicit {"file":..., "pos":...}
        return {"file": off["file"], "pos": int(off["pos"])}

    def latestOffset(self) -> dict:
        # The server's tail is monotone (failover is handled by the
        # gtidexecuted overlap-drop, not by offset rewind), so no
        # cursor clamping is needed — unlike the throttled replay
        # source, each microbatch simply covers [last end, tail).
        return self._conn().master_status()

    def partitions(self, start: dict, end: dict):
        return [DumpPartition(self.options, start, end)]

    def read(self, partition: DumpPartition):
        import datetime

        from rust_cdc_spark.sources.binlog_file import envelopes_from_events
        from rust_cdc_spark.streaming.gtid import GtidSet

        from rust_cdc_spark.sources import binlog_rows as BR

        o, start, end = partition.options, partition.start, partition.end
        if _off_key(start) >= _off_key(end):
            return
        executed = GtidSet(o.get("gtidexecuted", ""))

        admin_holder: list[_AdminConn] = []

        def resolve_names(schema: str, table: str) -> list[str] | None:
            """SURVEY §7 column-name gap: when the master logs
            binlog_row_metadata=MINIMAL, TABLE_MAP has no names — fetch
            them out of band (ONE lazily-opened COM_QUERY connection
            shared by all lookups in this partition read, closed with
            the dump socket; the registry caches per (schema, table)).

            Identifiers come from untrusted TABLE_MAP bytes: a crafted
            table name on a multi-tenant master must not inject into
            the COM_QUERY run under the replication account, so names
            containing quote/backslash/NUL characters are rejected
            outright (MySQL permits them in identifiers, but a master
            using them gets unresolved names, never string splicing)."""
            if any(c in f"{schema}{table}" for c in ("'", '"', "`", "\\", "\0")):
                return None
            if not admin_holder:
                admin_holder.append(_AdminConn(o))
            _, rows = admin_holder[0].query(
                "SELECT COLUMN_NAME FROM information_schema.columns"
                f" WHERE table_schema = '{schema}'"
                f" AND table_name = '{table}'"
                " ORDER BY ORDINAL_POSITION"
            )
            return [r[0] for r in rows] or None

        registry = BR.TableRegistry(name_resolver=resolve_names)
        raw = _resilient_dump(o, start)
        try:
            for env in envelopes_from_events(
                self._until(raw, start["file"], end), start["file"],
                registry=registry,
            ):
                if executed and executed.contains(env.get("gtid")):
                    continue
                yield (
                    datetime.datetime.utcfromtimestamp(env["ts"]),
                    env.get("server_id"),
                    env["file"],
                    env["pos"],
                    env.get("gtid"),
                    env.get("xid"),
                    env["database"],
                    env["table"],
                    env["op"],
                    _stringify(env.get("before")),
                    _stringify(env.get("after")),
                    env.get("query"),
                )
        finally:
            if admin_holder:
                admin_holder[0].close()
            raw.close()  # propagates to the dump socket's finally

    @staticmethod
    def _until(raw, start_file: str, end: dict):
        """Pass RawEvents through until the stream reaches the batch end
        offset: stop AFTER the first event whose end position lands at or
        past ``end`` — the dump is otherwise endless (the server holds
        the connection open waiting for new writes)."""
        cur_file = start_file
        for ev in raw:
            if ev.type_code == 0x04:  # ROTATE (real or artificial)
                cur_file = ev.body[8:].decode("utf-8", errors="replace")
                yield ev  # envelopes_from_events tracks the name too
                if (cur_file, 4) >= _off_key(end):
                    return
                continue
            yield ev
            if ev.log_pos and (cur_file, ev.log_pos) >= _off_key(end):
                return

    def commit(self, end: dict) -> None:
        pass  # Spark's commit log is the durable record


def _stringify(image: dict | None) -> dict | None:
    if image is None:
        return None
    return {k: (None if v is None else str(v)) for k, v in image.items()}


class MySQLBinlogSource(DataSource):
    """spark.readStream.format("mysql-cdc")
    .option("host", …).option("port", …).option("user", …)…"""

    @classmethod
    def name(cls) -> str:
        return "mysql-cdc"

    def schema(self) -> StructType:
        return CDC_SCHEMA

    def streamReader(self, schema: StructType) -> MySQLBinlogStreamReader:
        return MySQLBinlogStreamReader(self.options)


def register(spark) -> None:
    spark.dataSource.register(MySQLBinlogSource)
