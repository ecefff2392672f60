"""Data-layout queries: Z-order (Morton) clustering keys for
multi-dimensional min-max file skipping (operators/layout.py).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from rust_cdc_spark.operators import layout as L
from rust_cdc_spark.queries import register
from rust_cdc_spark.sources.tables import load_table

def _spread(c: str) -> str:
    """DuckDB mirror of the mask-shift spread ladder (operators/layout.py
    _SPREAD2) applied to a grid coordinate column: bit i → bit 2i."""
    x = c
    for shift, mask in L._SPREAD2:
        x = f"(({x} | ({x} << {shift})) & {mask})"
    return x


def _grid(col: str, lo: str, hi: str) -> str:
    """SQL mirror of operators/layout.scale_to_grid (bits=16)."""
    frac = (
        f"CASE WHEN ({hi} - {lo}) > 0 THEN "
        f"CAST({col} - {lo} AS DOUBLE) / CAST({hi} - {lo} AS DOUBLE) "
        f"ELSE 0.0 END"
    )
    return (
        f"LEAST(GREATEST(CAST(floor(({frac}) * 65536) AS BIGINT), 0), 65535)"
    )


@register(
    "layout_zorder_key",
    oracle=f"""
    WITH b AS (
        SELECT min(user_id) AS lo_u, max(user_id) AS hi_u,
               min(event_id) AS lo_e, max(event_id) AS hi_e
        FROM events
    ),
    g AS (
        SELECT event_id,
               {_grid('user_id', 'lo_u', 'hi_u')} AS gu,
               {_grid('event_id', 'lo_e', 'hi_e')} AS ge
        FROM events, b
    )
    SELECT event_id, (({_spread('gu')} << 1) | {_spread('ge')}) AS zkey
    FROM g
    """,
)
def layout_zorder_key(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Morton clustering key over (user_id, event_id), min/max-scaled to
    a 16-bit grid — the sort key `write_zordered` clusters files on so
    footer min/max stats prune on BOTH dimensions. Pure codegen bit
    arithmetic (mask-shift ladder), bounds via one broadcast scalar agg;
    value-level oracle reproduces the exact bit math in DuckDB."""
    ev = load_table(spark, "events", sf_dir)
    keyed = L.with_zorder_key(ev, ["user_id", "event_id"], bits=16)
    return keyed.select("event_id", F.col("zkey").cast("long").alias("zkey"))


def _grid12(col: str, lo: str, hi: str) -> str:
    """SQL mirror of operators/layout.scale_to_grid (bits=12, the
    Hilbert grid)."""
    frac = (
        f"CASE WHEN ({hi} - {lo}) > 0 THEN "
        f"CAST({col} - {lo} AS DOUBLE) / CAST({hi} - {lo} AS DOUBLE) "
        f"ELSE 0.0 END"
    )
    return (
        f"LEAST(GREATEST(CAST(floor(({frac}) * 4096) AS BIGINT), 0), 4095)"
    )


@register(
    "layout_hilbert_key",
    oracle=f"""
    WITH b AS (
        SELECT min(user_id) AS lo_u, max(user_id) AS hi_u,
               min(event_id) AS lo_e, max(event_id) AS hi_e
        FROM events
    ),
    g AS (
        SELECT event_id,
               {_grid12('user_id', 'lo_u', 'hi_u')} AS gu,
               {_grid12('event_id', 'lo_e', 'hi_e')} AS ge
        FROM events, b
    )
    SELECT event_id,
           CAST({L.hilbert_key_sql('gu', 'ge', 'duckdb')} AS BIGINT) AS hkey
    FROM g
    """,
)
def layout_hilbert_key(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hilbert clustering key over (user_id, event_id) on a 12-bit
    grid — the locality-optimal alternative to `layout_zorder_key`:
    consecutive keys are always ADJACENT cells (no Morton seam jumps),
    so range-partitioned files get tighter per-file bounding boxes and
    better min/max pruning on both dimensions (the Iceberg/liquid-
    clustering layout option). The xy2d walk runs as a 12-step packed
    BIGINT fold in pure codegen arithmetic — XOR replaced by an
    arithmetic identity so DuckDB replays the exact key
    (operators/layout.py:_hilbert_lambda).

    Scale shape: one tiny min/max agg broadcast back, then a pure map
    stage — same cost model as the z-order key; the clustered write
    itself is repartitionByRange on the key."""
    ev = load_table(spark, "events", sf_dir)
    keyed = L.with_hilbert_key(ev, ["user_id", "event_id"])
    return keyed.select("event_id", F.col("hkey").cast("long").alias("hkey"))


# Candidate partition keys to profile: (table, column).
_ADVISOR_CANDIDATES = [
    ("orders", "o_orderpriority"),
    ("orders", "o_orderstatus"),
    ("lineitem", "l_returnflag"),
    ("events", "event_type"),
    ("documents", "source"),
    ("documents", "lang"),
]
_ADVISOR_TARGET_ROWS = 1_000_000  # rows per output file target


def _advisor_sql(table: str, col: str) -> str:
    return f"""
    SELECT '{table}.{col}' AS candidate,
           CAST(sum(c) AS BIGINT) AS n_rows,
           CAST(count(*) AS BIGINT) AS ndv,
           CAST(sum(c * c) * 1000000 // (sum(c) * sum(c)) AS BIGINT)
               AS hhi_micro,
           CAST(max(c) * 1000000 // sum(c) AS BIGINT)
               AS max_share_micro,
           CAST(sum((c + {_ADVISOR_TARGET_ROWS} - 1)
                    // {_ADVISOR_TARGET_ROWS}) AS BIGINT)
               AS est_files,
           CAST(sum(CASE WHEN c * 10 < {_ADVISOR_TARGET_ROWS}
                         THEN 1 ELSE 0 END) AS BIGINT)
               AS n_small_partitions
    FROM (SELECT {col} AS v, CAST(count(*) AS BIGINT) AS c
          FROM {table} GROUP BY 1)
    """


@register(
    "layout_partition_advisor",
    # Partition-key dry run — the planning query run BEFORE committing
    # a partitionBy at 100 TB: per candidate column, cardinality, skew
    # (HHI + max partition share), estimated file count at the target
    # rows/file, and how many partitions land below 10% of the target
    # (the small-file problem). All exact integer arithmetic.
    oracle="\nUNION ALL\n".join(
        _advisor_sql(t, c) for t, c in _ADVISOR_CANDIDATES
    ),
)
def layout_partition_advisor(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Partition-key advisor: profiles each candidate partition column
    with the four facts that decide a physical layout — distinct-value
    count (too high → metadata explosion), Herfindahl skew and max
    partition share (one hot partition serializes every downstream
    stage), estimated files at the 1M-rows/file target, and the count
    of sub-10%-of-target partitions (the small-file problem) — the
    same dry-run-before-you-shuffle discipline as join_size_estimate
    and dedup_lsh_cost_estimate. At 100 TB a wrong partitionBy is a
    multi-hour mistake; this query is one scan per candidate.

    Scale shape: per candidate, ONE value-keyed count agg (map-side
    partials) collapsed to a 1-row profile; candidates union into a
    6-row result. Nothing but aggregates."""
    out = None
    for table, col in _ADVISOR_CANDIDATES:
        t = load_table(spark, table, sf_dir)
        vc = t.groupBy(F.col(col).alias("v")).agg(
            F.count("*").cast("long").alias("c")
        )
        row = vc.agg(
            F.lit(f"{table}.{col}").alias("candidate"),
            F.sum("c").cast("long").alias("n_rows"),
            F.count("*").cast("long").alias("ndv"),
            F.expr("sum(c * c) * 1000000 div (sum(c) * sum(c))")
            .cast("long")
            .alias("hhi_micro"),
            F.expr("max(c) * 1000000 div sum(c)")
            .cast("long")
            .alias("max_share_micro"),
            F.sum(
                F.expr(
                    f"(c + {_ADVISOR_TARGET_ROWS} - 1) "
                    f"div {_ADVISOR_TARGET_ROWS}"
                )
            ).cast("long").alias("est_files"),
            F.sum(
                F.when(
                    F.col("c") * 10 < _ADVISOR_TARGET_ROWS, 1
                ).otherwise(0)
            ).cast("long").alias("n_small_partitions"),
        )
        out = row if out is None else out.unionAll(row)
    return out
