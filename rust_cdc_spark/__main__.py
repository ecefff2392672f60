"""CLI — the engine as a runnable tool, mirroring the reference's binary
(/root/reference/src/main.rs: connect → stream → listener loop).

    python -m rust_cdc_spark replay  --binlog DIR|FILE --table PATH --keys id [--db-pattern P] [--table-pattern P]
    python -m rust_cdc_spark convert --binlog-file FILE --out FILE.jsonl
    python -m rust_cdc_spark query   --table PATH --sql "SELECT ..."
    python -m rust_cdc_spark compact --table PATH [--target-mb 128]
    python -m rust_cdc_spark history --table PATH

``replay`` ingests a recorded binlog (JSONL dir, or a binary binlog file
which is converted on the fly) into a managed upsert table; ``query``
runs SQL over the table's current snapshot (view name: ``t``).
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import tempfile


def _spark():
    from rust_cdc_spark.session import get_spark

    return get_spark("rust_cdc_spark_cli")


def cmd_convert(args) -> None:
    from rust_cdc_spark.sources.binlog_file import binlog_file_to_jsonl

    n = binlog_file_to_jsonl(args.binlog_file, args.out)
    print(json.dumps({"events": n, "out": args.out}))


def cmd_replay(args) -> None:
    from rust_cdc_spark.streaming.pipeline import (
        ParquetUpsertTable,
        start_cdc_pipeline,
    )

    spark = _spark()
    binlog_dir = args.binlog
    if os.path.isfile(binlog_dir):  # binary binlog → convert to JSONL
        from rust_cdc_spark.sources.binlog_file import binlog_file_to_jsonl

        tmp = tempfile.mkdtemp(prefix="rcs_replay_")
        binlog_file_to_jsonl(
            binlog_dir, os.path.join(tmp, "binlog.000001.jsonl")
        )
        binlog_dir = tmp
    table = ParquetUpsertTable(args.table, args.keys.split(","))
    q = start_cdc_pipeline(
        spark,
        binlog_dir,
        table,
        dbs=[args.db_pattern],
        tables=[args.table_pattern],
        checkpoint_dir=args.checkpoint or os.path.join(args.table, "_checkpoint"),
        max_events_per_trigger=args.max_events_per_trigger,
    )
    q.processAllAvailable()
    q.stop()
    df = table.read(spark)
    print(
        json.dumps(
            {
                "table": args.table,
                "version": table.version(),
                "rows": df.count() if df is not None else 0,
            }
        )
    )


def cmd_query(args) -> None:
    from rust_cdc_spark.streaming.pipeline import ParquetUpsertTable

    spark = _spark()
    table = ParquetUpsertTable(args.table, [])  # keys unused for reads
    table.register_view(spark, "t")
    spark.sql(args.sql).show(args.limit, truncate=False)


def cmd_compact(args) -> None:
    from rust_cdc_spark.streaming.pipeline import ParquetUpsertTable

    spark = _spark()
    table = ParquetUpsertTable(args.table, [])
    table.compact(
        spark,
        target_file_bytes=args.target_mb * 1024 * 1024,
        zorder_by=args.zorder_by.split(",") if args.zorder_by else None,
    )
    print(json.dumps({"table": args.table, "version": table.version()}))


def cmd_explain(args) -> None:
    from rust_cdc_spark.plans import explain as X
    from rust_cdc_spark.queries import load_all

    spark = _spark()
    reg = load_all()
    if args.name not in reg:
        print(json.dumps({"error": "unknown query", "known": sorted(reg)}))
        raise SystemExit(1)
    df = reg[args.name].spark_fn(spark, args.sf_dir)
    print(json.dumps({
        "query": args.name,
        "exchanges": X.count_exchanges(df),
        "python_eval": X.has_python_eval(df),
        "top_k": X.uses_top_k(df),
    }))
    if args.full:
        df.explain("formatted")


def cmd_history(args) -> None:
    from rust_cdc_spark.streaming.pipeline import ParquetUpsertTable

    table = ParquetUpsertTable(args.table, [])
    print(json.dumps({"versions": table.history(), "current": table.version()}))


def main(argv: list[str] | None = None) -> int:
    p = argparse.ArgumentParser(prog="rust_cdc_spark")
    sub = p.add_subparsers(dest="cmd", required=True)

    c = sub.add_parser("convert", help="binary binlog → JSONL")
    c.add_argument("--binlog-file", required=True)
    c.add_argument("--out", required=True)
    c.set_defaults(fn=cmd_convert)

    r = sub.add_parser("replay", help="ingest a recorded binlog into a table")
    r.add_argument("--binlog", required=True, help="JSONL dir or binary binlog file")
    r.add_argument("--table", required=True)
    r.add_argument("--keys", required=True, help="comma-separated key columns")
    r.add_argument("--db-pattern", default="*")
    r.add_argument("--table-pattern", default="*")
    r.add_argument("--checkpoint")
    r.add_argument("--max-events-per-trigger", type=int, default=None)
    r.set_defaults(fn=cmd_replay)

    q = sub.add_parser("query", help="SQL over a table snapshot (view 't')")
    q.add_argument("--table", required=True)
    q.add_argument("--sql", required=True)
    q.add_argument("--limit", type=int, default=20)
    q.set_defaults(fn=cmd_query)

    co = sub.add_parser("compact", help="rewrite snapshot into sized files")
    co.add_argument("--table", required=True)
    co.add_argument("--target-mb", type=int, default=128)
    co.add_argument("--zorder-by", help="comma-separated columns for Z-order clustering")
    co.set_defaults(fn=cmd_compact)

    h = sub.add_parser("history", help="list retained versions")
    h.add_argument("--table", required=True)
    h.set_defaults(fn=cmd_history)

    e = sub.add_parser("explain", help="plan facts for a registered query")
    e.add_argument("--name", required=True)
    e.add_argument("--sf-dir", default="/root/testdata/sf0.001")
    e.add_argument("--full", action="store_true", help="print the formatted plan")
    e.set_defaults(fn=cmd_explain)

    args = p.parse_args(argv)
    args.fn(args)
    return 0


if __name__ == "__main__":
    sys.exit(main())
