"""End-to-end CDC ingestion throughput bench (reproduces the SCALE.md
numbers): derives a JSONL binlog from the events table, replays it
through the full pipeline (source → router → collapse → MERGE with
per-batch exactly-once commits), and prints one JSON line.

Usage: python tools/bench_ingest.py [sf_dir] [n_events] [batch_size...]
Defaults: sf0.1, 100000 events, batch sizes 5000 (the reference's
max_messages_per_batch) and n_events (single batch).
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from rust_cdc_spark.session import get_spark  # noqa: E402
from rust_cdc_spark.sources.tables import load_table  # noqa: E402
from rust_cdc_spark.streaming.pipeline import (  # noqa: E402
    ParquetUpsertTable,
    start_cdc_pipeline,
)


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    n_events = int(sys.argv[2]) if len(sys.argv) > 2 else 100_000
    batches = [int(b) for b in sys.argv[3:]] or [5_000, n_events]
    spark = get_spark("ingest_bench")
    rows = (
        load_table(spark, "events", sf_dir)
        .orderBy("event_id")
        .limit(n_events)
        .collect()
    )
    d = tempfile.mkdtemp(prefix="ingest_binlog_")
    per_file = max(1, len(rows) // 4)
    fh = None
    for i, r in enumerate(rows):
        if i % per_file == 0:
            if fh:
                fh.close()
            fh = open(
                os.path.join(d, f"binlog.{i // per_file + 1:06d}.jsonl"), "w"
            )
        op = {"signup": "I", "error": "D"}.get(r.event_type, "U")
        img = {"user_id": r.user_id, "event_type": r.event_type, "value": r.value}
        fh.write(json.dumps({
            "ts": int(r.ts.timestamp()), "server_id": 1,
            "pos": i % per_file + 4, "gtid": f"p:{i + 1}", "xid": None,
            "database": "app", "table": "users", "op": op,
            "before": img if op == "D" else None,
            "after": img if op != "D" else None, "query": None,
        }) + "\n")
    if fh:
        fh.close()

    results = {}
    for trig in batches:
        tdir = tempfile.mkdtemp(prefix="ingest_table_")
        table = ParquetUpsertTable(os.path.join(tdir, "t"), ["user_id"])
        t0 = time.time()
        q = start_cdc_pipeline(
            spark, d, table,
            checkpoint_dir=os.path.join(tdir, "cp"),
            max_events_per_trigger=trig,
        )
        q.processAllAvailable()
        q.stop()
        dt = time.time() - t0
        results[str(trig)] = {
            "events_per_sec": round(len(rows) / dt, 1),
            "total_sec": round(dt, 2),
            "state_rows": table.read(spark).count(),
        }
        shutil.rmtree(tdir)
    shutil.rmtree(d)
    print(json.dumps({
        "metric": "cdc_ingest_throughput", "events": len(rows),
        "sf_dir": sf_dir, "by_batch_size": results,
    }))


if __name__ == "__main__":
    main()
