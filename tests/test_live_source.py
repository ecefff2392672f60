"""Live wire connector end-to-end: a loopback fake MySQL server drives
the composed ``mysql-cdc`` Structured Streaming source over a REAL TCP
socket — handshake → auth → SHOW MASTER STATUS offset polling →
COM_BINLOG_DUMP → RawEvent decode → CDC envelopes → (optionally)
route + MERGE. Reference parity target: the live loop at
/root/reference/src/mysql/conn.rs:133-157,297-357.

Fixtures are the reference's own committed binlog files
(/root/reference/tests/events/*), so the stream's output is asserted
against the already-golden-tested offline file parser byte-for-byte.
"""

from __future__ import annotations

import os

import pytest
from pyspark.sql import types as T

from rust_cdc_spark.sources.binlog_file import parse_binlog_file
from rust_cdc_spark.streaming.live_source import register
from tests.fake_mysql_server import FakeMySQLServer, split_frames

BASE = "/root/reference/tests/events"
pytestmark = pytest.mark.skipif(
    not os.path.isdir(BASE), reason="reference fixtures absent"
)

FIX_INSERTS = os.path.join(BASE, "30_write_rows_v2", "mysql-bin.000002")
FIX_UPDATES = os.path.join(BASE, "31_update_rows_v2", "mysql-bin.000001")


def _run_stream(spark, srv, tmp_path, checkpoint="cp", queryname="live_sink"):
    register(spark)
    q = (
        spark.readStream.format("mysql-cdc")
        .option("host", "127.0.0.1")
        .option("port", str(srv.port))
        .option("user", srv.user)
        .option("password", srv.password)
        .option("startingoffsets", "earliest")
        .option("sslmode", "disabled")
        .load()
        .writeStream.format("parquet")
        .option("path", str(tmp_path / "sink"))
        .option("checkpointLocation", str(tmp_path / checkpoint))
        .start()
    )
    q.processAllAvailable()
    q.stop()
    from rust_cdc_spark.datamodel import CDC_SCHEMA

    return spark.read.schema(CDC_SCHEMA).parquet(str(tmp_path / "sink"))


def _canon(env: dict) -> tuple:
    img = lambda d: (  # noqa: E731 — stringified image, wire shape
        None if d is None
        else tuple(sorted((k, None if v is None else str(v)) for k, v in d.items()))
    )
    return (
        env["pos"], env["op"], env["database"], env["table"],
        env.get("query"), img(env.get("before")), img(env.get("after")),
    )


class TestLiveStream:
    def test_stream_equals_file_parser(self, spark, tmp_path):
        """Socket bytes and file bytes land in identical envelopes."""
        with FakeMySQLServer(FIX_INSERTS, "mysql-bin.000002") as srv:
            got = _run_stream(spark, srv, tmp_path)
            rows = got.collect()
        want = [_canon(e) for e in parse_binlog_file(FIX_INSERTS)]
        have = [
            _canon({
                "pos": r.log_pos, "op": r.op, "database": r.database,
                "table": r.table, "query": r.query,
                "before": dict(r.before) if r.before is not None else None,
                "after": dict(r.after) if r.after is not None else None,
            })
            for r in rows
        ]
        assert sorted(have) == sorted(want)
        # the dump was requested from the earliest offset, over the wire
        assert srv.dump_requests[0] == ("mysql-bin.000002", 4)
        # the driver polled the admin surface, reference session ritual
        assert any("SHOW MASTER STATUS" in q.upper() for q in srv.queries)

    def test_incremental_tail_and_checkpoint_resume(self, spark, tmp_path):
        """New transactions arriving between runs are picked up from the
        checkpointed offset — no replay, no gap (S3 resume semantics on
        the live connector)."""
        frames = split_frames(FIX_INSERTS)
        # cut the visible tail right after the first Xid (frame ends @820)
        first_txn_end = 820
        with FakeMySQLServer(FIX_INSERTS, "mysql-bin.000002") as srv:
            srv.tail = first_txn_end
            got1 = _run_stream(spark, srv, tmp_path).collect()
            assert all(r.log_pos <= first_txn_end for r in got1)
            assert any(r.op == "I" for r in got1)

            srv.tail = sum(len(f) for f in frames) + 4  # full log visible
            got2 = _run_stream(spark, srv, tmp_path).collect()

        want = [_canon(e) for e in parse_binlog_file(FIX_INSERTS)]
        have = [
            _canon({
                "pos": r.log_pos, "op": r.op, "database": r.database,
                "table": r.table, "query": r.query,
                "before": dict(r.before) if r.before is not None else None,
                "after": dict(r.after) if r.after is not None else None,
            })
            for r in got2
        ]
        assert sorted(have) == sorted(want)
        # exactly-once across restarts: no duplicated positions
        poss = [r.log_pos for r in got2 if r.op in ("I", "U", "D")]
        assert len(poss) == len(set(poss))
        # the second dump resumed from the checkpointed offset, not 4
        resumed = [p for _, p in srv.dump_requests if p >= first_txn_end]
        assert resumed, f"no resumed dump in {srv.dump_requests}"

    def test_live_pipeline_merge_equals_batch_replay(self, spark, tmp_path):
        """fake server → stream → route → collapse+MERGE: final table
        state equals applying the batch-parsed envelopes by hand
        (insert then update → one row with the updated image)."""
        from rust_cdc_spark.streaming.pipeline import (
            ParquetUpsertTable,
            start_live_cdc_pipeline,
        )

        schema = T.StructType(
            [T.StructField("col_0", T.LongType())]
            + [T.StructField(f"col_{i}", T.StringType()) for i in range(1, 6)]
            + [
                T.StructField("col_6", T.DoubleType()),
                T.StructField("col_7", T.DoubleType()),
                T.StructField("col_8", T.StringType()),
            ]
        )
        with FakeMySQLServer(FIX_UPDATES, "mysql-bin.000001") as srv:
            table = ParquetUpsertTable(
                str(tmp_path / "rustcdc_table"), ["col_0"], image_schema=schema
            )
            q = start_live_cdc_pipeline(
                spark,
                {
                    "host": "127.0.0.1", "port": srv.port,
                    "user": srv.user, "password": srv.password,
                    "startingoffsets": "earliest", "sslmode": "disabled",
                },
                table,
                dbs=["rustcdc"],
                tables=["rustcdc"],
                checkpoint_dir=str(tmp_path / "cp"),
            )
            q.processAllAvailable()
            q.stop()
        rows = table.read(spark).collect()
        # batch oracle: fold the file-parsed envelopes by primary key
        state: dict = {}
        for e in parse_binlog_file(FIX_UPDATES):
            if e["table"] != "rustcdc" or e["op"] not in ("I", "U", "D"):
                continue
            if e["op"] == "D":
                state.pop(e["before"]["col_0"], None)
            else:
                state[e["after"]["col_0"]] = e["after"]
        assert len(rows) == len(state) == 1
        r = rows[0]
        want = state[r.col_0]
        assert (r.col_1, r.col_6, r.col_7, r.col_8) == (
            want["col_1"], want["col_6"], want["col_7"], want["col_8"]
        )

    def test_wrong_password_fails_loudly(self, spark, tmp_path):
        with FakeMySQLServer(FIX_INSERTS, "mysql-bin.000002") as srv:
            register(spark)
            reader = (
                spark.readStream.format("mysql-cdc")
                .option("host", "127.0.0.1")
                .option("port", str(srv.port))
                .option("user", srv.user)
                .option("password", "wrong")
                .option("startingoffsets", "earliest")
                .option("sslmode", "disabled")
            )
            with pytest.raises(Exception, match="(?i)access denied|1045"):
                q = (
                    reader.load()
                    .writeStream.format("noop")
                    .option("checkpointLocation", str(tmp_path / "cp_bad"))
                    .start()
                )
                try:
                    q.processAllAvailable()
                finally:
                    exc = q.exception()
                    q.stop()
                if exc is not None:
                    raise exc


class TestLiveTLS:
    def test_stream_over_tls(self, spark, tmp_path):
        """sslmode=required drives the SSLRequest → TLS upgrade → auth →
        dump conversation over a real encrypted socket (reference:
        MySqlSslMode + connection/stream.rs upgrade)."""
        import ssl
        import subprocess

        key = str(tmp_path / "srv.key")
        crt = str(tmp_path / "srv.crt")
        subprocess.run(
            [
                "openssl", "req", "-x509", "-newkey", "rsa:2048",
                "-keyout", key, "-out", crt, "-days", "1", "-nodes",
                "-subj", "/CN=mysql",
            ],
            check=True, capture_output=True,
        )
        ctx = ssl.SSLContext(ssl.PROTOCOL_TLS_SERVER)
        ctx.load_cert_chain(crt, key)
        with FakeMySQLServer(
            FIX_INSERTS, "mysql-bin.000002", ssl_context=ctx
        ) as srv:
            register(spark)
            q = (
                spark.readStream.format("mysql-cdc")
                .option("host", "127.0.0.1")
                .option("port", str(srv.port))
                .option("user", srv.user)
                .option("password", srv.password)
                .option("startingoffsets", "earliest")
                .option("sslmode", "required")
                .load()
                .writeStream.format("parquet")
                .option("path", str(tmp_path / "sink_tls"))
                .option("checkpointLocation", str(tmp_path / "cp_tls"))
                .start()
            )
            q.processAllAvailable()
            q.stop()
            assert srv.tls_upgrades >= 2  # admin conn + dump conn
        from rust_cdc_spark.datamodel import CDC_SCHEMA

        got = spark.read.schema(CDC_SCHEMA).parquet(
            str(tmp_path / "sink_tls")
        )
        want = [_canon(e) for e in parse_binlog_file(FIX_INSERTS)]
        assert got.count() == len(want)


class TestColumnNameResolution:
    def test_information_schema_fallback_names_images(
        self, spark, tmp_path
    ):
        """SURVEY §7 column-name gap: the fixture's TABLE_MAP carries no
        COLUMN_NAME TLV (binlog_row_metadata=MINIMAL), so the live
        source must fetch names from information_schema.columns — the
        out-of-band lookup the reference skips — and images must carry
        real column names instead of the positional col_i fallback."""
        with FakeMySQLServer(
            FIX_INSERTS,
            "mysql-bin.000002",
            column_names={("rustcdc", "rustcdc"): ["id", "payload"]},
        ) as srv:
            got = _run_stream(
                spark, srv, tmp_path, checkpoint="cp_names",
                queryname="live_names",
            )
            rows = [r for r in got.collect() if r.op == "I"]
            assert rows, "fixture yields inserts"
            for r in rows:
                assert set(dict(r.after).keys()) == {"id", "payload"}
            assert any(
                "INFORMATION_SCHEMA.COLUMNS" in q.upper()
                for q in srv.queries
            )

    def test_resolver_arity_mismatch_keeps_positional(self, spark, tmp_path):
        """A wrong-arity answer (schema drifted between the binlog event
        and the lookup) must NOT rename columns — decode keeps the
        positional fallback rather than guessing an alignment."""
        with FakeMySQLServer(
            FIX_INSERTS,
            "mysql-bin.000002",
            column_names={("rustcdc", "rustcdc"): ["only_one_name"]},
        ) as srv:
            got = _run_stream(
                spark, srv, tmp_path, checkpoint="cp_arity",
                queryname="live_arity",
            )
            rows = [r for r in got.collect() if r.op == "I"]
            assert rows
            for r in rows:
                assert set(dict(r.after).keys()) == {"col_0", "col_1"}


class TestMidStreamReconnect:
    """Transport failure INSIDE a dump read: the server kills the socket
    mid-partition (no EOF packet). Two guarantees, layered: (1) the
    reader reconnects in-task and resumes from the last delivered
    event's end position — the batch completes with zero loss and zero
    duplication; (2) with reconnection disabled the task fails LOUDLY
    (strict mode turns bare EOF into DumpInterrupted instead of the old
    silent truncation — which would have COMMITTED a short batch and
    lost the tail) and a checkpoint restart replays the batch
    exactly-once. The reference's 5 s offset recorder only approximates
    this (/root/reference/src/mysql/conn.rs:272-295)."""

    def test_mid_dump_drop_reconnects_within_batch(self, spark, tmp_path):
        with FakeMySQLServer(FIX_INSERTS, "mysql-bin.000002") as srv:
            srv.drop_dump_after = 3  # die mid-transaction, first dump only
            got = _run_stream(spark, srv, tmp_path).collect()
            dumps = list(srv.dump_requests)
        want = [_canon(e) for e in parse_binlog_file(FIX_INSERTS)]
        have = [
            _canon({
                "pos": r.log_pos, "op": r.op, "database": r.database,
                "table": r.table, "query": r.query,
                "before": dict(r.before) if r.before is not None else None,
                "after": dict(r.after) if r.after is not None else None,
            })
            for r in got
        ]
        assert sorted(have) == sorted(want)  # no loss, no duplication
        # it really did reconnect: a second dump, resumed PAST the start
        assert len(dumps) >= 2, dumps
        assert dumps[1][1] > dumps[0][1], dumps
        poss = [r.log_pos for r in got if r.op in ("I", "U", "D")]
        assert len(poss) == len(set(poss))

    def test_drop_without_retries_fails_loudly_then_restart_is_exactly_once(
        self, spark, tmp_path
    ):
        register(spark)

        def start_query():
            return (
                spark.readStream.format("mysql-cdc")
                .option("host", "127.0.0.1")
                .option("port", str(srv.port))
                .option("user", srv.user)
                .option("password", srv.password)
                .option("startingoffsets", "earliest")
                .option("sslmode", "disabled")
                .option("reconnectretries", "0")
                .load()
                .writeStream.format("parquet")
                .option("path", str(tmp_path / "sink"))
                .option("checkpointLocation", str(tmp_path / "cp"))
                .start()
            )

        with FakeMySQLServer(FIX_INSERTS, "mysql-bin.000002") as srv:
            srv.drop_dump_after = 2
            q = start_query()
            with pytest.raises(Exception, match="dump|Dump|stream"):
                q.processAllAvailable()
            q.stop()
            assert q.exception() is not None  # loud failure, not a short batch
            # server is healthy again (injection is one-shot): restart
            # from the SAME checkpoint replays the failed batch
            q2 = start_query()
            q2.processAllAvailable()
            q2.stop()
        from rust_cdc_spark.datamodel import CDC_SCHEMA

        got = (
            spark.read.schema(CDC_SCHEMA)
            .parquet(str(tmp_path / "sink"))
            .collect()
        )
        want = [_canon(e) for e in parse_binlog_file(FIX_INSERTS)]
        have = [
            _canon({
                "pos": r.log_pos, "op": r.op, "database": r.database,
                "table": r.table, "query": r.query,
                "before": dict(r.before) if r.before is not None else None,
                "after": dict(r.after) if r.after is not None else None,
            })
            for r in got
        ]
        assert sorted(have) == sorted(want)
        poss = [r.log_pos for r in got if r.op in ("I", "U", "D")]
        assert len(poss) == len(set(poss))  # exactly-once after restart


class TestReconnectExhaustive:
    def test_drop_at_every_frame_position_is_lossless(self):
        """Property, exhaustively: for EVERY possible mid-dump death
        point k (the server kills the socket after k frames), the
        resilient dump's envelope stream equals the offline file parse
        — no loss, no duplication, regardless of whether the cut lands
        on the FDE, between transactions, or mid-transaction (between
        TABLE_MAP and its rows, between GTID and Xid). Raw-level: no
        Spark, one reconnect cycle per k."""
        from rust_cdc_spark.sources.binlog_file import envelopes_from_events
        from rust_cdc_spark.streaming.live_source import _resilient_dump

        want = [_canon(e) for e in parse_binlog_file(FIX_INSERTS)]
        n_frames = len(split_frames(FIX_INSERTS))
        with FakeMySQLServer(FIX_INSERTS, "mysql-bin.000002") as srv:
            opts = {
                "host": "127.0.0.1", "port": str(srv.port),
                "user": srv.user, "password": srv.password,
                "sslmode": "disabled", "reconnectbackoff": "0.01",
            }
            # k = n_frames would send everything before the cut point is
            # reached (no frame left to withhold), so the last real cut
            # is after n_frames - 1 frames
            for k in range(1, n_frames):
                srv.drop_dump_after = k
                raw = _resilient_dump(
                    opts, {"file": "mysql-bin.000002", "pos": 4}
                )
                have = [
                    _canon(e)
                    for e in envelopes_from_events(raw, "mysql-bin.000002")
                ]
                assert sorted(have) == sorted(want), f"cut at frame {k}"
                assert srv.drop_dump_after is None  # injection fired

    def test_retry_budget_is_per_stall_not_per_batch(self):
        """ADVICE r8: a chronically flaky link that still makes forward
        progress on every attempt must NOT exhaust ``reconnectretries``
        cumulatively. The fake server kills EVERY dump after 3 frames
        (FDE + 2 data events — each reconnect advances the cursor), so
        completing the batch takes more reconnects than the retry
        budget (1); since each failure follows progress, the counter
        resets per stall and the batch still completes losslessly."""
        from rust_cdc_spark.sources.binlog_file import envelopes_from_events
        from rust_cdc_spark.streaming.live_source import _resilient_dump

        want = [_canon(e) for e in parse_binlog_file(FIX_INSERTS)]
        with FakeMySQLServer(FIX_INSERTS, "mysql-bin.000002") as srv:
            srv.drop_every_dump_after = 3
            opts = {
                "host": "127.0.0.1", "port": str(srv.port),
                "user": srv.user, "password": srv.password,
                "sslmode": "disabled", "reconnectbackoff": "0.01",
                "reconnectretries": "1",
            }
            raw = _resilient_dump(
                opts, {"file": "mysql-bin.000002", "pos": 4}
            )
            have = [
                _canon(e)
                for e in envelopes_from_events(raw, "mysql-bin.000002")
            ]
            n_dumps = len(srv.dump_requests)
        assert sorted(have) == sorted(want)
        assert n_dumps > 2  # needed more reconnects than the budget

    def test_retry_budget_still_bounds_a_true_stall(self):
        """The flip side: zero forward progress (every dump dies before
        delivering ANY positioned event past the cursor) must still
        exhaust the budget and raise — the reset is per stall, not a
        retry-forever loop."""
        import pytest as _pytest

        from rust_cdc_spark.sources import wire as W
        from rust_cdc_spark.streaming.live_source import _resilient_dump

        with FakeMySQLServer(FIX_INSERTS, "mysql-bin.000002") as srv:
            srv.drop_every_dump_after = 1  # FDE only: cursor never moves
            opts = {
                "host": "127.0.0.1", "port": str(srv.port),
                "user": srv.user, "password": srv.password,
                "sslmode": "disabled", "reconnectbackoff": "0.01",
                "reconnectretries": "2",
            }
            raw = _resilient_dump(
                opts, {"file": "mysql-bin.000002", "pos": 4}
            )
            with _pytest.raises(W.DumpInterrupted, match="exhausted"):
                list(raw)
            n_dumps = len(srv.dump_requests)
        assert n_dumps == 3  # initial + 2 retries, then gave up


class TestGtidAutoPosition:
    """COM_BINLOG_DUMP_GTID end-to-end: the client sends its executed
    set, the fake server skips those transactions server-side (the
    fleet-failover resume — position numbering is server-local, the
    GTID set is not). Beyond the reference, which only issues
    positional dumps."""

    UUID = "12345678-1234-5678-1234-567812345678"

    def _gtid_binlog(self, tmp_path, n_txns=3):
        """Checksum-free (alg 0) binlog: FDE + per txn
        GTID(uuid:gno) + TABLE_MAP + WRITE_ROWS_V2(id=gno) + XID."""
        import uuid as _uuid

        from tests.test_binlog_decode import (
            _table_map_body,
            enc_long,
            enc_varchar,
        )

        fde_body = (
            b"\x04\x00" + b"x" * 50 + b"\x00" * 4 + bytes([19])
            + bytes(39) + b"\x00" + b"\x00" * 4  # alg 0 at body[-5]
        )
        out = b"\xfebin"
        pos = 4

        def frame(tc: int, body: bytes) -> bytes:
            nonlocal pos
            size = 19 + len(body)
            pos += size
            return (
                (1_600_000_000).to_bytes(4, "little") + bytes([tc])
                + (1).to_bytes(4, "little") + size.to_bytes(4, "little")
                + pos.to_bytes(4, "little") + b"\x00\x00" + body
            )

        out += frame(0x0F, fde_body)
        tmap = _table_map_body(
            71, "cdc", "rustcdc", [3, 15],  # LONG, VARCHAR
            metas=(160).to_bytes(2, "little"), nullable_bits=0b10,
        )
        for gno in range(1, n_txns + 1):
            gtid_body = (
                b"\x01" + _uuid.UUID(self.UUID).bytes
                + gno.to_bytes(8, "little")
            )
            img = b"\x00" + enc_long(gno) + enc_varchar(f"row-{gno}")
            rows = (
                (71).to_bytes(6, "little") + b"\x01\x00"
                + (2).to_bytes(2, "little") + bytes([2]) + bytes([0b11])
                + img
            )
            out += frame(0x21, gtid_body)
            out += frame(0x13, tmap)
            out += frame(0x1E, rows)  # WRITE_ROWS_V2
            out += frame(0x10, (100 + gno).to_bytes(8, "little"))
        p = tmp_path / "gtid-bin.000001"
        p.write_bytes(out)
        return str(p)

    def _opts(self, srv, executed):
        return {
            "host": "127.0.0.1", "port": str(srv.port),
            "user": srv.user, "password": srv.password,
            "sslmode": "disabled", "dumpgtid": "true",
            "gtidexecuted": executed, "reconnectbackoff": "0.01",
        }

    def _envelopes(self, opts, start_pos=4):
        from rust_cdc_spark.sources.binlog_file import envelopes_from_events
        from rust_cdc_spark.streaming.live_source import _resilient_dump

        raw = _resilient_dump(
            opts, {"file": "gtid-bin.000001", "pos": start_pos}
        )
        return list(envelopes_from_events(raw, "gtid-bin.000001"))

    def test_server_skips_executed_transactions(self, tmp_path):
        path = self._gtid_binlog(tmp_path)
        executed = f"{self.UUID}:1"
        with FakeMySQLServer(path, "gtid-bin.000001") as srv:
            envs = self._envelopes(self._opts(srv, executed))
            assert srv.gtid_dump_requests == [executed]
            assert srv.dump_requests == []  # no positional fallback used
        inserts = [e for e in envs if e["op"] == "I"]
        assert [e["after"]["col_0"] for e in inserts] == [2, 3]
        assert [e["gtid"] for e in inserts] == [
            f"{self.UUID}:2", f"{self.UUID}:3"
        ]

    def test_nothing_executed_streams_everything(self, tmp_path):
        path = self._gtid_binlog(tmp_path)
        with FakeMySQLServer(path, "gtid-bin.000001") as srv:
            # a set for a DIFFERENT server: nothing matches
            envs = self._envelopes(self._opts(
                srv, "aaaaaaaa-bbbb-cccc-dddd-eeeeeeeeeeee:1-9"
            ))
        assert [e["after"]["col_0"] for e in envs if e["op"] == "I"] == [1, 2, 3]

    def test_reconnect_before_anchor_resends_gtid_request(self, tmp_path):
        """Dump dies after the FDE (no positioned event delivered): the
        retry must re-send the GTID request, not a positional dump from
        a position the server never confirmed."""
        path = self._gtid_binlog(tmp_path)
        executed = f"{self.UUID}:1"
        with FakeMySQLServer(path, "gtid-bin.000001") as srv:
            srv.drop_dump_after = 1  # FDE sent, then transport death
            envs = self._envelopes(self._opts(srv, executed))
            assert len(srv.gtid_dump_requests) == 2  # re-sent, same set
            assert srv.dump_requests == []
        assert [e["after"]["col_0"] for e in envs if e["op"] == "I"] == [2, 3]

    def test_reconnect_after_anchor_is_positional(self, tmp_path):
        """Once positioned events flowed, a mid-dump death resumes with
        a plain positional dump from the last delivered end position —
        no re-skip round-trip, no duplicates."""
        path = self._gtid_binlog(tmp_path)
        executed = f"{self.UUID}:1"
        with FakeMySQLServer(path, "gtid-bin.000001") as srv:
            srv.drop_dump_after = 4  # FDE + txn2's GTID/TABLE_MAP/ROWS
            envs = self._envelopes(self._opts(srv, executed))
            assert len(srv.gtid_dump_requests) == 1
            assert len(srv.dump_requests) == 1  # positional resume
            assert srv.dump_requests[0][1] > 4
        inserts = [e["after"]["col_0"] for e in envs if e["op"] == "I"]
        assert inserts == [2, 3]  # nothing lost, nothing duplicated

    def test_spark_stream_with_gtid_auto_position(self, spark, tmp_path):
        """Option plumbing end-to-end: the Structured Streaming source
        with dumpgtid=true resumes via GTID auto-positioning inside its
        microbatch read and the sink sees only unexecuted transactions."""
        path = self._gtid_binlog(tmp_path)
        executed = f"{self.UUID}:1"
        register(spark)
        with FakeMySQLServer(path, "gtid-bin.000001") as srv:
            q = (
                spark.readStream.format("mysql-cdc")
                .option("host", "127.0.0.1")
                .option("port", str(srv.port))
                .option("user", srv.user)
                .option("password", srv.password)
                .option("startingoffsets", "earliest")
                .option("sslmode", "disabled")
                .option("dumpgtid", "true")
                .option("gtidexecuted", executed)
                .load()
                .writeStream.format("parquet")
                .option("path", str(tmp_path / "sink"))
                .option("checkpointLocation", str(tmp_path / "cp"))
                .start()
            )
            q.processAllAvailable()
            q.stop()
            assert srv.gtid_dump_requests == [executed]
        from rust_cdc_spark.datamodel import CDC_SCHEMA

        rows = (
            spark.read.schema(CDC_SCHEMA)
            .parquet(str(tmp_path / "sink"))
            .collect()
        )
        ids = sorted(
            int(r.after["col_0"]) for r in rows if r.op == "I"
        )
        assert ids == [2, 3]
        gtids = {r.gtid for r in rows if r.op == "I"}
        assert gtids == {f"{self.UUID}:2", f"{self.UUID}:3"}
