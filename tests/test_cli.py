"""CLI surface tests: replay a real binlog → query the table —
`python -m rust_cdc_spark` is the engine's operational entry point
(reference analog: /root/reference/src/main.rs)."""

from __future__ import annotations

import json
import os

import pytest

from rust_cdc_spark.__main__ import main

REF_BINLOG = "/root/reference/tests/events/30_write_rows_v2/mysql-bin.000002"

pytestmark = pytest.mark.skipif(
    not os.path.exists(REF_BINLOG), reason="reference fixtures not present"
)


def test_cli_convert_replay_history(spark, tmp_path, capsys):
    out_jsonl = str(tmp_path / "x.jsonl")
    assert main(["convert", "--binlog-file", REF_BINLOG, "--out", out_jsonl]) == 0
    assert json.loads(capsys.readouterr().out)["events"] >= 4

    table_path = str(tmp_path / "t")
    assert (
        main(
            [
                "replay",
                "--binlog", REF_BINLOG,
                "--table", table_path,
                "--keys", "col_0",
                "--db-pattern", "rustcdc",
                "--table-pattern", "rust*",
            ]
        )
        == 0
    )
    rep = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert rep["rows"] == 2 and rep["version"] == 0

    # schema was inferred (no image_schema given): values land as strings
    from rust_cdc_spark.streaming.pipeline import ParquetUpsertTable

    got = {
        r.col_0: r.col_1
        for r in ParquetUpsertTable(table_path, ["col_0"]).read(spark).collect()
    }
    assert got == {"1": "cdc-1", "2": "cdc-2"}

    assert main(["history", "--table", table_path]) == 0
    assert json.loads(capsys.readouterr().out)["current"] == 0
