"""Streaming analytics surface: the batch queries' streaming twins —
watermarked tumbling windows, session windows, bounded-state dedup —
driven through real streaming queries (memory sink, processAllAvailable),
asserted against the batch result on the same data. Plus the Kafka
envelope parser (S10) on static data.
"""

from __future__ import annotations

import json
import os

import pytest
from pyspark.sql import functions as F

from rust_cdc_spark.sources.kafka import parse_cdc_json
from rust_cdc_spark.sources.tables import load_table
from tests.conftest import SF_SMOKE


@pytest.fixture(scope="module")
def events_stream_dir(tmp_path_factory, spark):
    """Events re-laid as a streaming-readable directory with a
    TimestampType ts (watermarks reject NTZ)."""
    d = str(tmp_path_factory.mktemp("events_stream"))
    load_table(spark, "events", SF_SMOKE).write.mode("overwrite").parquet(d)
    return d


def _run_stream(spark, stream_df, name):
    q = (
        stream_df.writeStream.outputMode("complete")
        .format("memory")
        .queryName(name)
        .start()
    )
    q.processAllAvailable()
    q.stop()
    return spark.sql(f"SELECT * FROM {name}")


def test_windowed_agg_stream_matches_batch(spark, events_stream_dir):
    schema = spark.read.parquet(events_stream_dir).schema
    stream = (
        spark.readStream.schema(schema)
        .parquet(events_stream_dir)
        .withWatermark("ts", "1 hour")
        .groupBy(F.window("ts", "1 hour"), F.col("event_type"))
        .agg(F.count("*").alias("n"), F.round(F.sum("value"), 2).alias("v"))
    )
    got = {
        (str(r["window"]["start"]), r["event_type"]): (r["n"], r["v"])
        for r in _run_stream(spark, stream, "win_out").collect()
    }
    batch = (
        spark.read.parquet(events_stream_dir)
        .groupBy(F.window("ts", "1 hour"), F.col("event_type"))
        .agg(F.count("*").alias("n"), F.round(F.sum("value"), 2).alias("v"))
    )
    want = {
        (str(r["window"]["start"]), r["event_type"]): (r["n"], r["v"])
        for r in batch.collect()
    }
    assert got == want and len(got) > 0


def test_sliding_window_stream_matches_batch(spark, events_stream_dir):
    """Hopping window (1 h width / 15 min slide) under readStream +
    watermark — the streaming twin of events_sliding_window. Every event
    lands in 4 windows in both engines."""
    schema = spark.read.parquet(events_stream_dir).schema
    win = F.window("ts", "1 hour", "15 minutes")
    agg = lambda df: df.groupBy(win, F.col("event_type")).agg(  # noqa: E731
        F.count("*").alias("n"), F.round(F.sum("value"), 2).alias("v")
    )
    stream = agg(
        spark.readStream.schema(schema)
        .parquet(events_stream_dir)
        .withWatermark("ts", "1 hour")
    )
    key = lambda r: (str(r["window"]["start"]), r["event_type"])  # noqa: E731
    got = {key(r): (r["n"], r["v"])
           for r in _run_stream(spark, stream, "slide_out").collect()}
    want = {key(r): (r["n"], r["v"])
            for r in agg(spark.read.parquet(events_stream_dir)).collect()}
    assert got == want and len(got) > 0


def test_session_window_stream(spark, events_stream_dir):
    """session_window(ts, 30 min) — the streaming sessionizer whose batch
    twin is events_sessionize. Assert per-user session counts match the
    batch lag/gap computation."""
    schema = spark.read.parquet(events_stream_dir).schema
    stream = (
        spark.readStream.schema(schema)
        .parquet(events_stream_dir)
        .withWatermark("ts", "2 hours")
        .groupBy(F.session_window("ts", "30 minutes"), F.col("user_id"))
        .agg(F.count("*").alias("n_events"))
    )
    out = _run_stream(spark, stream, "sess_out")
    got = {
        r.user_id: r.n_sessions
        for r in out.groupBy("user_id").agg(F.count("*").alias("n_sessions")).collect()
    }

    from rust_cdc_spark.queries import load_all

    batch = load_all()["events_sessionize"].spark_fn(spark, SF_SMOKE)
    want = {r.user_id: r.n_sessions for r in batch.collect()}
    assert got == want


def test_streaming_dedup_bounded_state(spark, events_stream_dir):
    from rust_cdc_spark.streaming.pipeline import streaming_dedup

    schema = spark.read.parquet(events_stream_dir).schema
    stream = spark.readStream.schema(schema).parquet(events_stream_dir)
    # duplicate key: user_id+event_type — keep first occurrence
    deduped = streaming_dedup(stream, ["user_id", "event_type"], "ts", "1 hour")
    q = (
        deduped.writeStream.outputMode("append")
        .format("memory")
        .queryName("dedup_out")
        .start()
    )
    q.processAllAvailable()
    q.stop()
    got = spark.sql("SELECT count(*) AS n, count(DISTINCT user_id || '|' || event_type) AS d FROM dedup_out").collect()[0]
    assert got.n == got.d  # exactly one row per key survived
    assert got.n > 0


def test_kafka_envelope_parse(spark):
    """S10: the same JSON envelope parses from any byte transport;
    malformed records null out (K4 dead-letter path)."""
    good = json.dumps(
        {
            "ts": 1700000100, "server_id": 1, "file": "binlog.000007",
            "pos": 42, "gtid": "u:1", "xid": 9, "database": "app",
            "table": "users", "op": "U",
            "before": {"id": "1", "name": "a"},
            "after": {"id": "1", "name": "b"}, "query": None,
        }
    )
    df = spark.createDataFrame(
        [(good.encode(),), (b"not json at all",)], "value binary"
    )
    out = parse_cdc_json(df).collect()
    ok = [r for r in out if r.log_pos is not None]
    dead = [r for r in out if r.log_pos is None]
    assert len(ok) == 1 and len(dead) == 1
    r = ok[0]
    assert (r.database, r.table, r.op, r.log_pos) == ("app", "users", "U", 42)
    assert r.after["name"] == "b" and r.before["name"] == "a"
    assert str(r.ts).startswith("2023-11-14")


def test_transaction_assembly(spark, tmp_path):
    """S9 stateful op: rows grouped into whole commits keyed by GTID,
    emitted on the Xid marker — driven through a real streaming query."""
    import json as _json

    from rust_cdc_spark.streaming.replay_source import register
    from rust_cdc_spark.streaming.txn_assembly import assemble_transactions

    d = str(tmp_path / "txn_binlog")
    os.makedirs(d)
    evs = [
        # txn g1: two row ops + commit
        {"ts": 1, "pos": 1, "gtid": "u:1", "database": "app", "table": "users",
         "op": "I", "after": {"id": "1"}},
        {"ts": 1, "pos": 2, "gtid": "u:1", "database": "app", "table": "orders",
         "op": "U", "before": {"id": "2"}, "after": {"id": "2"}},
        {"ts": 1, "pos": 3, "gtid": "u:1", "database": "", "table": "",
         "op": "TXN", "xid": 77},
        # txn g2: one op + commit
        {"ts": 2, "pos": 4, "gtid": "u:2", "database": "app", "table": "users",
         "op": "D", "before": {"id": "1"}},
        {"ts": 2, "pos": 5, "gtid": "u:2", "database": "", "table": "",
         "op": "TXN", "xid": 78},
    ]
    with open(os.path.join(d, "binlog.000001.jsonl"), "w") as fh:
        for e in evs:
            fh.write(_json.dumps({"server_id": 1, "before": None, "after": None,
                                  "xid": None, "query": None, **e}) + "\n")

    register(spark)
    stream = spark.readStream.format("mysql-cdc-replay").option("path", d).load()
    out = assemble_transactions(stream)
    # availableNow, not processAllAvailable: registered processing-time
    # timeouts keep triggering batches, so "all available" never settles.
    q = (
        out.writeStream.outputMode("append").format("memory")
        .queryName("txn_out")
        .option("checkpointLocation", str(tmp_path / "cp_txn"))
        .trigger(availableNow=True)
        .start()
    )
    assert q.awaitTermination(120)
    rows = {r.gtid: r for r in spark.sql("SELECT * FROM txn_out").collect()}
    assert rows["u:1"].xid == 77 and rows["u:1"].n_ops == 2
    assert sorted(rows["u:1"].tables) == ["orders", "users"]
    assert rows["u:1"].complete and (rows["u:1"].first_pos, rows["u:1"].last_pos) == (1, 3)
    assert rows["u:2"].xid == 78 and rows["u:2"].n_ops == 1


def test_stream_stream_interval_join_matches_batch_range_join(
    spark, events_stream_dir
):
    """Streaming twin of operators/rangejoin.py. Spark rejects
    stream-stream joins without an equality predicate — the SAME bin
    trick that de-quadratifies the batch plan is what makes the
    streaming join expressible at all: equi-join on the time bin,
    residual range filter, watermarks bounding the join state (the
    unbounded-state hazard the reference's ValueBuffers never solved)."""
    from rust_cdc_spark.operators.rangejoin import range_join

    schema = spark.read.parquet(events_stream_dir).schema
    BIN = 1800

    def stream():
        return spark.readStream.schema(schema).parquet(events_stream_dir)

    clicks = (
        stream()
        .filter(F.col("event_type") == "click")
        .select(F.col("event_id").alias("click_id"), F.col("ts").alias("click_ts"))
        .withWatermark("click_ts", "1 hour")
        .withColumn(
            "_bin", F.floor(F.col("click_ts").cast("double") / BIN).cast("long")
        )
    )
    purchases = (
        stream()
        .filter(F.col("event_type") == "purchase")
        .select(F.col("event_id").alias("purchase_id"), F.col("ts").alias("p_ts"))
        .withWatermark("p_ts", "1 hour")
        .withColumn(
            "_bin",
            F.explode(
                F.sequence(
                    F.floor(
                        (F.col("p_ts").cast("double") - F.lit(30 * 60)) / BIN
                    ).cast("long"),
                    F.floor(F.col("p_ts").cast("double") / BIN).cast("long"),
                )
            ),
        )
    )
    joined = clicks.join(
        purchases,
        (clicks["_bin"] == purchases["_bin"])
        & (F.col("click_ts") > F.col("p_ts") - F.expr("INTERVAL 30 MINUTES"))
        & (F.col("click_ts") <= F.col("p_ts")),
    )
    q = (
        joined.writeStream.outputMode("append")
        .format("memory")
        .queryName("ssij_out")
        .start()
    )
    q.processAllAvailable()
    q.stop()
    got = {
        (r.click_id, r.purchase_id)
        for r in spark.sql("SELECT click_id, purchase_id FROM ssij_out").collect()
    }

    ev = spark.read.parquet(events_stream_dir)
    b_clicks = ev.filter(F.col("event_type") == "click").select(
        F.col("event_id").alias("click_id"), F.col("ts").alias("click_ts")
    )
    b_purch = ev.filter(F.col("event_type") == "purchase").select(
        F.col("event_id").alias("purchase_id"),
        (F.col("ts") - F.expr("INTERVAL 30 MINUTES")).alias("w_start"),
        F.col("ts").alias("w_end"),
    )
    want = {
        (r.click_id, r.purchase_id)
        for r in range_join(
            b_clicks, b_purch, "click_ts", "w_start", "w_end"
        ).collect()
    }
    assert got == want and len(want) > 0


def test_streaming_curation_matches_batch(spark, tmp_path):
    """Streaming corpus ingestion with inline curation: quality/lang
    filters (pure expressions run unchanged under streaming) + exact
    dedup via dropDuplicates on the content fingerprint (bounded state
    under a watermark-free append over a finite backlog). The surviving
    set must equal the batch curation verdicts on the same corpus."""
    from rust_cdc_spark.functions import text as TX

    src = str(tmp_path / "docs_stream")
    docs = load_table(spark, "documents", SF_SMOKE)
    docs.write.mode("overwrite").parquet(src)
    schema = spark.read.parquet(src).schema

    def curate(df):
        scored = df.select(
            "doc_id",
            "source",
            F.md5(
                F.regexp_replace(F.lower(F.trim(F.col("text"))), r"\s+", " ")
            ).alias("fp"),
            TX.quality_score("text").alias("quality"),
            (TX.stopword_ratio("text") >= 0.08).alias("lang_ok"),
        )
        return scored.filter(F.col("lang_ok") & (F.col("quality") >= 0.5))

    stream = curate(spark.readStream.schema(schema).parquet(src)).dropDuplicates(
        ["fp"]
    )
    q = (
        stream.writeStream.outputMode("append")
        .format("memory")
        .queryName("curated_stream")
        .start()
    )
    q.processAllAvailable()
    q.stop()
    got = spark.sql("SELECT fp, count(*) AS c FROM curated_stream GROUP BY fp")
    got_fps = {r.fp: r.c for r in got.collect()}

    want_fps = {
        r.fp for r in curate(spark.read.parquet(src)).select("fp").distinct().collect()
    }
    assert set(got_fps) == want_fps and len(want_fps) > 0
    # exactly-once per fingerprint through the streaming dedup
    assert all(c == 1 for c in got_fps.values())


def test_streaming_funnel_matches_batch_conversions(
    spark, events_stream_dir, tmp_path
):
    """The stateful streaming funnel (applyInPandasWithState) must emit
    the same CONVERTED user set as the batch funnel logic on the same
    events, and emit every remaining user as an abandoned journey when
    its processing-time timeout fires (the conversion-rate
    denominator). The sink is polled until every user has emitted —
    availableNow keeps scheduling state-maintenance batches while
    processing-time timeouts are registered, so neither
    processAllAvailable nor awaitTermination settles deterministically
    here."""
    import time
    from rust_cdc_spark.streaming.funnel import funnel_stream

    stages = ["signup", "click", "purchase"]
    schema = spark.read.parquet(events_stream_dir).schema
    stream = spark.readStream.schema(schema).parquet(events_stream_dir)
    out = funnel_stream(stream, stages, timeout_ms=10_000)
    q = (
        out.writeStream.outputMode("append")
        .format("memory").queryName("funnel_sink")
        .option("checkpointLocation", str(tmp_path / "cp_funnel"))
        .trigger(availableNow=True)
        .start()
    )
    # batch expectation: users with signup < click < purchase in order
    ev = spark.read.parquet(events_stream_dir)
    rows = ev.filter(F.col("event_type").isin(*stages)).select(
        "user_id", "ts", "event_type"
    ).collect()
    by_user: dict = {}
    by_user_rows: dict = {}
    for r in rows:
        by_user_rows.setdefault(r.user_id, []).append(r)
    for uid, urows in by_user_rows.items():
        urows.sort(key=lambda r: r.ts)
        nxt = 0
        for r in urows:
            if r.event_type == stages[nxt]:
                nxt += 1
                if nxt == len(stages):
                    break
        by_user[uid] = nxt == len(stages)
    want_converted = {u for u, conv in by_user.items() if conv}

    deadline = time.time() + 180
    all_rows = []
    while time.time() < deadline:
        all_rows = spark.sql("SELECT * FROM funnel_sink").collect()
        if len(all_rows) >= len(by_user):
            break
        time.sleep(5)
    q.stop()
    got = {r.user_id: r for r in all_rows if r.converted}
    assert set(got) == want_converted
    assert want_converted, "fixture must produce at least one conversion"
    for uid in want_converted:
        assert got[uid].stages_hit == 3
        assert got[uid].first_ts <= got[uid].last_ts
    # every user appears exactly once: converted or timed-out-abandoned
    assert sorted(r.user_id for r in all_rows) == sorted(by_user)
    abandoned = {r.user_id for r in all_rows if not r.converted}
    assert abandoned == set(by_user) - want_converted


def test_session_window_boundary_gap_semantics(spark):
    """Spark merges an event into the open session INCLUSIVELY: an
    event at exactly last + 30:00 still merges; only a strictly larger
    gap opens a new session. The events_session_stats oracle must
    therefore use `ts - lag(ts) > INTERVAL '30 minutes'` (the `>=` form
    looked right and passed at three SFs — random event data never
    lands on the boundary — so pin it with microsecond-adjacent
    gaps)."""
    import datetime as dt

    t0 = dt.datetime(2024, 1, 1, 0, 0, 0)
    us = dt.timedelta(microseconds=1)
    gap = dt.timedelta(minutes=30)
    rows = [
        (1, t0),
        (1, t0 + gap - us),        # 29:59.999999 later → same session
        (1, t0 + 2 * gap - us),    # gap exactly 30:00 → still merges
        (2, t0),
        (2, t0 + gap),             # exactly 30:00 → merges (inclusive)
        (2, t0 + 2 * gap + us),    # 30:00.000001 → NEW session
    ]
    df = spark.createDataFrame(rows, "user_id int, ts timestamp")
    got = {
        (r["user_id"], str(r["start"]), r["n"])
        for r in df.groupBy(
            F.session_window("ts", "30 minutes").alias("w"), "user_id"
        )
        .agg(F.count("*").alias("n"))
        .select("user_id", F.col("w.start").alias("start"), "n")
        .collect()
    }
    want = {
        (1, "2024-01-01 00:00:00", 3),
        (2, "2024-01-01 00:00:00", 2),
        (2, "2024-01-01 01:00:00.000001", 1),
    }
    assert got == want


def test_streaming_absence_matches_batch_anti_join(spark, tmp_path):
    """The stateful absence detector must agree with the batch
    anti-join semantics (events_abandoned_views): a trigger is
    'followed' iff a follow-up for the same user lands inside the
    window. In-band event-time expiry covers users who keep producing
    events; the processing-time timeout covers users who go quiet."""
    import time
    from rust_cdc_spark.streaming.absence import absence_stream

    T0 = 1_700_000_000
    rows = [
        # u1: matched inside the window
        (1, T0, "view"), (1, T0 + 600, "purchase"),
        # u2: purchase OUTSIDE window → in-band expiry (user kept
        # producing events past the deadline)
        (2, T0, "view"), (2, T0 + 7200, "purchase"),
        # u3: no follow-up at all → processing-time timeout flush
        (3, T0, "view"),
        # u4: one purchase satisfies BOTH open triggers
        (4, T0, "view"), (4, T0 + 100, "view"), (4, T0 + 200, "purchase"),
    ]
    src = str(tmp_path / "absence_src")
    spark.createDataFrame(
        [(u, float(ts), et) for u, ts, et in rows],
        "user_id long, ts double, event_type string",
    ).coalesce(1).write.parquet(src)

    schema = spark.read.parquet(src).schema
    stream = spark.readStream.schema(schema).parquet(src)
    out = absence_stream(
        stream, trigger="view", followup="purchase",
        window_s=3600.0, timeout_ms=5_000,
    )
    q = (
        out.writeStream.outputMode("append")
        .format("memory").queryName("absence_sink")
        .option("checkpointLocation", str(tmp_path / "cp_absence"))
        .trigger(availableNow=True)
        .start()
    )
    deadline = time.time() + 180
    got = []
    while time.time() < deadline:
        got = spark.sql("SELECT * FROM absence_sink").collect()
        if len(got) >= 5:
            break
        time.sleep(5)
    q.stop()
    by_user = {}
    for r in got:
        by_user.setdefault(r.user_id, []).append(r)
    assert len(got) == 5, got
    assert [(r.followed, r.latency_s) for r in by_user[1]] == [(True, 600.0)]
    assert [(r.followed, r.latency_s) for r in by_user[2]] == [(False, None)]
    assert [(r.followed, r.latency_s) for r in by_user[3]] == [(False, None)]
    assert sorted((r.followed, r.trigger_ts) for r in by_user[4]) == [
        (True, float(T0)), (True, float(T0 + 100)),
    ]


def test_cusum_stream_converges_to_batch(spark, events_stream_dir):
    """Streaming CUSUM twin (VERDICT r6 #8): the watermarked daily
    rollup + per-microbatch shared finisher converges to the batch
    events_cusum_drift result once the fixture is fully consumed."""
    from rust_cdc_spark.queries import load_all
    from rust_cdc_spark.streaming.analytics import cusum_drift_stream

    last = {}

    def emit(df, epoch_id):
        last["rows"] = df.collect()

    schema = spark.read.parquet(events_stream_dir).schema
    stream = spark.readStream.schema(schema).parquet(events_stream_dir)
    q = cusum_drift_stream(stream, emit)
    q.processAllAvailable()
    q.stop()

    got = sorted(tuple(r) for r in last["rows"])
    want = sorted(
        tuple(r)
        for r in load_all()["events_cusum_drift"]
        .spark_fn(spark, SF_SMOKE)
        .collect()
    )
    assert got == want and len(got) > 0


def test_binseg_stream_converges_to_batch(spark, events_stream_dir):
    """Streaming changepoint twin: same fixture, shared finisher —
    final emission equals the batch events_changepoint_binseg."""
    from rust_cdc_spark.queries import load_all
    from rust_cdc_spark.streaming.analytics import changepoint_stream

    last = {}

    def emit(df, epoch_id):
        last["rows"] = df.collect()

    schema = spark.read.parquet(events_stream_dir).schema
    stream = spark.readStream.schema(schema).parquet(events_stream_dir)
    q = changepoint_stream(stream, emit)
    q.processAllAvailable()
    q.stop()

    got = sorted(tuple(r) for r in last["rows"])
    want = sorted(
        tuple(r)
        for r in load_all()["events_changepoint_binseg"]
        .spark_fn(spark, SF_SMOKE)
        .collect()
    )
    assert got == want and len(got) > 0


def test_value_anomaly_stream_converges_to_batch(spark, events_stream_dir):
    """Streaming MAD anomaly twin (VERDICT r7 #7): the value-histogram
    streaming state + shared mad_anomaly_finish converges to the batch
    events_value_anomaly_mad projected onto (event_type, cents) buckets
    once the fixture is fully consumed."""
    from rust_cdc_spark.queries import load_all
    from rust_cdc_spark.streaming.analytics import value_anomaly_stream

    last = {}

    def emit(df, epoch_id):
        last["rows"] = df.collect()

    schema = spark.read.parquet(events_stream_dir).schema
    stream = spark.readStream.schema(schema).parquet(events_stream_dir)
    q = value_anomaly_stream(stream, emit)
    q.processAllAvailable()
    q.stop()

    got = sorted(tuple(r) for r in last["rows"])
    batch = (
        load_all()["events_value_anomaly_mad"]
        .spark_fn(spark, SF_SMOKE)
        .groupBy("event_type", "cents", "mean_cents", "mad_cents")
        .agg(F.count("*").cast("long").alias("n_events"))
        .select("event_type", "cents", "n_events", "mean_cents",
                "mad_cents")
    )
    want = sorted(tuple(r) for r in batch.collect())
    assert got == want and len(got) > 0
