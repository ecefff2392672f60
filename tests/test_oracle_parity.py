"""Local replica of the driver's correctness gate: run every registered
query through Spark AND its DuckDB oracle on the same parquet, compare
row multisets (columns sorted by name). Runs at sf0.001 for speed; the
driver runs sf0.01.
"""

from __future__ import annotations

import datetime
import decimal
import math

import duckdb
import pytest

from rust_cdc_spark.queries import load_all
from rust_cdc_spark.sources.tables import TABLES
from tests.conftest import SF_SMOKE

REGISTRY = load_all()
ORACLE_QUERIES = sorted(n for n, q in REGISTRY.items() if q.oracle)
ROWS_ONLY = sorted(n for n, q in REGISTRY.items() if not q.oracle)


def _norm(v):
    if isinstance(v, decimal.Decimal):
        return float(v)
    if isinstance(v, datetime.datetime):
        return v.replace(tzinfo=None).isoformat()
    if isinstance(v, datetime.date):
        return v.isoformat()
    if isinstance(v, float):
        if math.isnan(v):
            return "NaN"
        return round(v, 9)
    if isinstance(v, list):
        return tuple(_norm(x) for x in v)
    return v


def _duck(sf_dir: str, sql: str):
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'"
        )
    cur = con.execute(sql)
    cols = [d[0] for d in cur.description]
    rows = cur.fetchall()
    con.close()
    return cols, rows


def _sorted_rows(cols, rows):
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    return sorted(
        (tuple(_norm(r[i]) for i in order) for r in rows), key=repr
    ), [cols[i] for i in order]


@pytest.mark.parametrize("name", ORACLE_QUERIES)
def test_oracle_parity(spark, name):
    q = REGISTRY[name]
    sdf = q.spark_fn(spark, SF_SMOKE)
    s_cols = sdf.columns
    s_rows = [tuple(r) for r in sdf.collect()]
    d_cols, d_rows = _duck(SF_SMOKE, q.oracle)

    assert sorted(s_cols) == sorted(d_cols), f"{name}: column names differ"
    s_sorted, _ = _sorted_rows(s_cols, s_rows)
    d_sorted, _ = _sorted_rows(d_cols, d_rows)
    assert len(s_sorted) == len(d_sorted), (
        f"{name}: row count {len(s_sorted)} vs oracle {len(d_sorted)}"
    )
    mismatches = [
        (i, a, b) for i, (a, b) in enumerate(zip(s_sorted, d_sorted)) if a != b
    ]
    assert not mismatches, f"{name}: first mismatches {mismatches[:5]}"


@pytest.mark.parametrize("name", ROWS_ONLY)
def test_rows_only_queries_run(spark, name):
    q = REGISTRY[name]
    sdf = q.spark_fn(spark, SF_SMOKE)
    assert sdf.count() >= 0


def test_theil_exactness_bound():
    """customer_revenue_theil parity relies on cents·n ≤ 2^53: DuckDB
    forms x·n in HUGEINT and converts once to double, Spark multiplies
    doubles — beyond 2^53 the two round differently (ADVICE r7). Pin
    the bound on the largest test SF so data growth that breaks the
    assumption fails loudly here rather than as a silent hash drift."""
    import duckdb

    con = duckdb.connect()
    con.execute(
        "CREATE VIEW orders AS SELECT * FROM "
        "read_parquet('/root/testdata/sf0.1/orders.parquet')"
    )
    (max_cents, n) = con.execute(
        """
        WITH u AS (
            SELECT sum(CAST(round(o_totalprice * 100) AS BIGINT)) AS cents
            FROM orders GROUP BY o_custkey
        )
        SELECT max(cents), count(*) FROM u
        """
    ).fetchone()
    assert max_cents * n < 2**53, (
        f"cents*n = {max_cents * n} exceeds 2^53; the Theil oracle's "
        "one-IEEE-division exactness argument no longer holds"
    )
