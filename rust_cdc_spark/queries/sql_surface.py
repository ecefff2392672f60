"""Queries expressed through ``spark.sql`` — the engine's DQL surface
(reference Q1/Q2: DataFusion SQL over the sink table,
/root/reference/src/delta/mod.rs:428-494). Catalyst parses and plans the
same relational algebra as the DataFrame API; these queries exercise the
SQL entry point plus constructs that are most natural in SQL (grouping
sets, correlated/scalar subqueries).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from rust_cdc_spark.queries import register, utc
from rust_cdc_spark.sources.tables import register_views


@register(
    "q6_forecast_revenue",
    oracle="""
    SELECT round(sum(l_extendedprice * l_discount), 2) AS revenue,
           count(*) AS n_items
    FROM lineitem
    WHERE l_shipdate >= TIMESTAMP '1996-01-01'
      AND l_shipdate <  TIMESTAMP '1997-01-01'
      AND l_discount BETWEEN 0.02 AND 0.09
      AND l_quantity < 24
    """,
)
def q6_forecast_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q6 shape: pure filter+agg — every predicate must reach the
    parquet scan (no join, no wide shuffle; the map side reduces to one
    row per task)."""
    utc(spark)
    register_views(spark, sf_dir, "lineitem")
    return spark.sql(
        """
        SELECT round(sum(l_extendedprice * l_discount), 2) AS revenue,
               count(*) AS n_items
        FROM lineitem
        WHERE l_shipdate >= TIMESTAMP '1996-01-01'
          AND l_shipdate <  TIMESTAMP '1997-01-01'
          AND l_discount BETWEEN 0.02 AND 0.09
          AND l_quantity < 24
        """
    )


@register(
    "subquery_above_avg_orders",
    oracle="""
    SELECT o_orderkey, round(o_totalprice, 2) AS total
    FROM orders
    WHERE o_totalprice > (SELECT avg(o_totalprice) * 1.5 FROM orders)
      AND EXISTS (SELECT 1 FROM lineitem
                  WHERE l_orderkey = o_orderkey AND l_discount > 0.05)
    """,
)
def subquery_above_avg_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Scalar subquery + correlated EXISTS — Catalyst decorrelates the
    EXISTS into a left-semi join and evaluates the scalar once (a
    broadcast of one value, not a per-row subplan)."""
    register_views(spark, sf_dir, "orders", "lineitem")
    return spark.sql(
        """
        SELECT o_orderkey, round(o_totalprice, 2) AS total
        FROM orders
        WHERE o_totalprice > (SELECT avg(o_totalprice) * 1.5 FROM orders)
          AND EXISTS (SELECT 1 FROM lineitem
                      WHERE l_orderkey = o_orderkey AND l_discount > 0.05)
        """
    )


@register(
    "grouping_sets_lineitem",
    oracle="""
    SELECT l_returnflag, l_linestatus,
           count(*) AS n,
           round(sum(l_extendedprice), 2) AS sum_price
    FROM lineitem
    GROUP BY GROUPING SETS ((l_returnflag), (l_linestatus), ())
    """,
)
def grouping_sets_lineitem(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Explicit GROUPING SETS (beyond rollup/cube): per-flag, per-status
    and grand-total aggregates in one pass (one exchange, expand
    map-side)."""
    register_views(spark, sf_dir, "lineitem")
    return spark.sql(
        """
        SELECT l_returnflag, l_linestatus,
               count(*) AS n,
               round(sum(l_extendedprice), 2) AS sum_price
        FROM lineitem
        GROUP BY GROUPING SETS ((l_returnflag), (l_linestatus), ())
        """
    )


@register(
    "dense_rank_supplier_balance",
    oracle="""
    SELECT s_nationkey, s_suppkey, round(s_acctbal, 2) AS acctbal, rnk
    FROM (
        SELECT s_nationkey, s_suppkey, s_acctbal,
               dense_rank() OVER (PARTITION BY s_nationkey
                                  ORDER BY round(s_acctbal, 2) DESC) AS rnk
        FROM supplier
    )
    WHERE rnk <= 2
    """,
)
def dense_rank_supplier_balance(spark: SparkSession, sf_dir: str) -> DataFrame:
    """dense_rank window (vs row_number elsewhere): ties share ranks.
    Ranking on the rounded value keeps Spark/DuckDB tie groups
    identical."""
    register_views(spark, sf_dir, "supplier")
    return spark.sql(
        """
        SELECT s_nationkey, s_suppkey, round(s_acctbal, 2) AS acctbal, rnk
        FROM (
            SELECT s_nationkey, s_suppkey, s_acctbal,
                   dense_rank() OVER (PARTITION BY s_nationkey
                                      ORDER BY round(s_acctbal, 2) DESC) AS rnk
            FROM supplier
        )
        WHERE rnk <= 2
        """
    )


@register(
    "lag_lead_order_gaps",
    oracle="""
    SELECT o_custkey, o_orderkey,
           CAST(date_diff('day',
                lag(o_orderdate) OVER (PARTITION BY o_custkey
                                       ORDER BY o_orderdate, o_orderkey),
                o_orderdate) AS BIGINT) AS days_since_prev
    FROM orders
    QUALIFY days_since_prev IS NOT NULL
    """,
)
def lag_lead_order_gaps(spark: SparkSession, sf_dir: str) -> DataFrame:
    """lag() navigation window: per-customer days between consecutive
    orders."""
    utc(spark)
    register_views(spark, sf_dir, "orders")
    return spark.sql(
        """
        SELECT * FROM (
            SELECT o_custkey, o_orderkey,
                   CAST(datediff(o_orderdate,
                        lag(o_orderdate) OVER (PARTITION BY o_custkey
                                               ORDER BY o_orderdate, o_orderkey))
                        AS BIGINT) AS days_since_prev
            FROM orders
        )
        WHERE days_since_prev IS NOT NULL
        """
    )


@register(
    "q15_top_supplier",
    oracle="""
    WITH revenue AS (
        SELECT l_suppkey AS supplier_no,
               round(sum(l_extendedprice * (1 - l_discount)), 2) AS total_revenue
        FROM lineitem
        WHERE l_shipdate >= TIMESTAMP '1997-01-01'
          AND l_shipdate <  TIMESTAMP '1997-04-01'
        GROUP BY l_suppkey
    )
    SELECT s_suppkey, s_name, total_revenue
    FROM supplier JOIN revenue ON s_suppkey = supplier_no
    WHERE total_revenue = (SELECT max(total_revenue) FROM revenue)
    """,
)
def q15_top_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q15 shape: derived view reused twice (revenue + its max) —
    Catalyst plans the CTE once with exchange reuse."""
    utc(spark)
    register_views(spark, sf_dir, "lineitem", "supplier")
    return spark.sql(
        """
        WITH revenue AS (
            SELECT l_suppkey AS supplier_no,
                   round(sum(l_extendedprice * (1 - l_discount)), 2) AS total_revenue
            FROM lineitem
            WHERE l_shipdate >= TIMESTAMP '1997-01-01'
              AND l_shipdate <  TIMESTAMP '1997-04-01'
            GROUP BY l_suppkey
        )
        SELECT s_suppkey, s_name, total_revenue
        FROM supplier JOIN revenue ON s_suppkey = supplier_no
        WHERE total_revenue = (SELECT max(total_revenue) FROM revenue)
        """
    )


@register(
    "q17_small_quantity_revenue",
    oracle="""
    SELECT round(sum(l_extendedprice) / 7.0, 2) AS avg_yearly
    FROM lineitem JOIN part ON p_partkey = l_partkey
    WHERE p_brand = 'Brand#1'
      AND l_quantity < (SELECT 0.2 * avg(l2.l_quantity)
                        FROM lineitem l2 WHERE l2.l_partkey = p_partkey)
    """,
)
def q17_small_quantity_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q17 shape: correlated scalar subquery (per-part average) —
    Catalyst decorrelates into an aggregate + join, one pass over
    lineitem per side."""
    register_views(spark, sf_dir, "lineitem", "part")
    return spark.sql(
        """
        SELECT round(sum(l_extendedprice) / 7.0, 2) AS avg_yearly
        FROM lineitem JOIN part ON p_partkey = l_partkey
        WHERE p_brand = 'Brand#1'
          AND l_quantity < (SELECT 0.2 * avg(l2.l_quantity)
                            FROM lineitem l2 WHERE l2.l_partkey = p_partkey)
        """
    )


@register(
    "q21_waiting_orders",
    oracle="""
    SELECT s_name, count(*) AS numwait
    FROM supplier
    JOIN lineitem l1 ON s_suppkey = l1.l_suppkey
    JOIN orders    ON o_orderkey = l1.l_orderkey
    WHERE o_orderstatus = 'F'
      AND EXISTS (SELECT 1 FROM lineitem l2
                  WHERE l2.l_orderkey = l1.l_orderkey
                    AND l2.l_suppkey <> l1.l_suppkey)
      AND NOT EXISTS (SELECT 1 FROM lineitem l3
                      WHERE l3.l_orderkey = l1.l_orderkey
                        AND l3.l_suppkey <> l1.l_suppkey
                        AND l3.l_shipdate > l1.l_shipdate)
    GROUP BY s_name
    """,
)
def q21_waiting_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q21 shape: EXISTS + NOT EXISTS on the same fact (semi then
    anti join against two filtered self-references)."""
    utc(spark)
    register_views(spark, sf_dir, "supplier", "lineitem", "orders")
    return spark.sql(
        """
        SELECT s_name, count(*) AS numwait
        FROM supplier
        JOIN lineitem l1 ON s_suppkey = l1.l_suppkey
        JOIN orders    ON o_orderkey = l1.l_orderkey
        WHERE o_orderstatus = 'F'
          AND EXISTS (SELECT 1 FROM lineitem l2
                      WHERE l2.l_orderkey = l1.l_orderkey
                        AND l2.l_suppkey <> l1.l_suppkey)
          AND NOT EXISTS (SELECT 1 FROM lineitem l3
                          WHERE l3.l_orderkey = l1.l_orderkey
                            AND l3.l_suppkey <> l1.l_suppkey
                            AND l3.l_shipdate > l1.l_shipdate)
        GROUP BY s_name
        """
    )


@register(
    "q22_global_sales_opportunity",
    oracle="""
    SELECT cntry, count(*) AS numcust, round(sum(c_acctbal), 2) AS totacctbal
    FROM (
        SELECT substr(c_name, 10, 1) AS cntry, c_acctbal
        FROM customer
        WHERE c_acctbal > (SELECT avg(c_acctbal) FROM customer WHERE c_acctbal > 0)
          AND NOT EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey
                          AND o_orderdate >= TIMESTAMP '2000-01-01')
    )
    GROUP BY cntry
    """,
)
def q22_global_sales_opportunity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q22 shape: scalar subquery threshold + anti join + grouped
    aggregate over a derived column. Lapsed high-balance customers: the
    NOT EXISTS is windowed to orders since 2000 because every customer
    in this data has at least one historical order."""
    utc(spark)
    register_views(spark, sf_dir, "customer", "orders")
    return spark.sql(
        """
        SELECT cntry, count(*) AS numcust, round(sum(c_acctbal), 2) AS totacctbal
        FROM (
            SELECT substr(c_name, 10, 1) AS cntry, c_acctbal
            FROM customer
            WHERE c_acctbal > (SELECT avg(c_acctbal) FROM customer WHERE c_acctbal > 0)
              AND NOT EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey
                              AND o_orderdate >= TIMESTAMP '2000-01-01')
        )
        GROUP BY cntry
        """
    )


@register(
    "q8_market_share",
    oracle="""
    SELECT o_year,
           round(sum(CASE WHEN nation = 'NATION_1' THEN volume ELSE 0 END)
                 / sum(volume), 4) AS mkt_share
    FROM (
        SELECT CAST(year(o_orderdate) AS INT) AS o_year,
               l_extendedprice * (1 - l_discount) AS volume,
               n2.n_name AS nation
        FROM part
        JOIN lineitem ON p_partkey = l_partkey
        JOIN supplier ON s_suppkey = l_suppkey
        JOIN orders   ON l_orderkey = o_orderkey
        JOIN customer ON o_custkey = c_custkey
        JOIN nation n1 ON c_nationkey = n1.n_nationkey
        JOIN region    ON n1.n_regionkey = r_regionkey
        JOIN nation n2 ON s_nationkey = n2.n_nationkey
        WHERE r_name = 'AMERICA'
          AND o_orderdate BETWEEN TIMESTAMP '1996-01-01' AND TIMESTAMP '1997-12-31'
          AND p_type LIKE 'ECONOMY%'
    ) all_nations
    GROUP BY o_year
    """,
)
def q8_market_share(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q8 shape: 8-way join with two nation roles + conditional
    share-of-total aggregation."""
    utc(spark)
    register_views(
        spark, sf_dir, "part", "lineitem", "supplier", "orders", "customer",
        "nation", "region",
    )
    return spark.sql(
        """
        SELECT o_year,
               round(sum(CASE WHEN nation = 'NATION_1' THEN volume ELSE 0 END)
                     / sum(volume), 4) AS mkt_share
        FROM (
            SELECT CAST(year(o_orderdate) AS INT) AS o_year,
                   l_extendedprice * (1 - l_discount) AS volume,
                   n2.n_name AS nation
            FROM part
            JOIN lineitem ON p_partkey = l_partkey
            JOIN supplier ON s_suppkey = l_suppkey
            JOIN orders   ON l_orderkey = o_orderkey
            JOIN customer ON o_custkey = c_custkey
            JOIN nation n1 ON c_nationkey = n1.n_nationkey
            JOIN region    ON n1.n_regionkey = r_regionkey
            JOIN nation n2 ON s_nationkey = n2.n_nationkey
            WHERE r_name = 'AMERICA'
              AND o_orderdate BETWEEN TIMESTAMP '1996-01-01' AND TIMESTAMP '1997-12-31'
              AND p_type LIKE 'ECONOMY%'
        ) all_nations
        GROUP BY o_year
        """
    )


@register(
    "q13_customer_distribution",
    oracle="""
    SELECT c_count, count(*) AS custdist
    FROM (
        SELECT c_custkey, CAST(count(o_orderkey) AS BIGINT) AS c_count
        FROM customer LEFT JOIN orders
          ON c_custkey = o_custkey AND o_orderpriority <> '5-LOW'
        GROUP BY c_custkey
    ) c_orders
    GROUP BY c_count
    """,
)
def q13_customer_distribution(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q13 shape: outer join with join-condition filter, then a
    distribution (double aggregation)."""
    register_views(spark, sf_dir, "customer", "orders")
    return spark.sql(
        """
        SELECT c_count, count(*) AS custdist
        FROM (
            SELECT c_custkey, count(o_orderkey) AS c_count
            FROM customer LEFT JOIN orders
              ON c_custkey = o_custkey AND o_orderpriority <> '5-LOW'
            GROUP BY c_custkey
        ) c_orders
        GROUP BY c_count
        """
    )


@register(
    "scalar_base64_roundtrip",
    # the reference base64-encodes blob values for display
    # (/root/reference/src/mysql/value.rs:17-25); this exercises the
    # same binary<->text scalar slot end-to-end
    oracle="""
    SELECT p_partkey,
           to_base64(encode(p_name)) AS b64,
           decode(from_base64(to_base64(encode(p_name)))) AS roundtrip,
           CAST(octet_length(encode(p_name)) AS INT) AS n_bytes
    FROM part
    WHERE p_partkey % 10 = 0
    """,
)
def scalar_base64_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Binary scalar functions: utf-8 encode → base64 → decode round
    trip plus byte length — map-only, pushdown-filtered scan."""
    register_views(spark, sf_dir, "part")
    return spark.sql(
        """
        SELECT p_partkey,
               base64(encode(p_name, 'UTF-8')) AS b64,
               decode(unbase64(base64(encode(p_name, 'UTF-8'))), 'UTF-8')
                   AS roundtrip,
               CAST(octet_length(encode(p_name, 'UTF-8')) AS INT) AS n_bytes
        FROM part
        WHERE p_partkey % 10 = 0
        """
    )


# The SAME SQL text runs on BOTH engines (Spark 4 supports WITH
# RECURSIVE with UNION ALL recursion; DuckDB likewise) — the purest
# possible parity check for the recursive-query surface.
_RECURSIVE_REACH_SQL = """
WITH RECURSIVE raw AS (
    SELECT DISTINCT (doc_id * doc_id) % 53 AS src,
           (doc_id * doc_id + doc_id + 17) % 53 AS dst
    FROM documents
),
und AS (
    SELECT DISTINCT least(src, dst) AS a, greatest(src, dst) AS b
    FROM raw WHERE src <> dst
),
adj AS (
    SELECT a AS s, b AS t FROM und UNION ALL SELECT b, a FROM und
),
srcn AS (SELECT min(a) AS h FROM und),
bfs(host, hop) AS (
    SELECT h, 0 FROM srcn
    UNION ALL
    SELECT adj.t, bfs.hop + 1
    FROM bfs JOIN adj ON adj.s = bfs.host
    WHERE bfs.hop < 5
),
dist AS (
    SELECT host, CAST(min(hop) AS BIGINT) AS hop
    FROM bfs WHERE host IS NOT NULL GROUP BY host
)
SELECT hop, CAST(count(*) AS BIGINT) AS n_hosts
FROM dist GROUP BY hop
"""


@register("sql_recursive_reachability", oracle=_RECURSIVE_REACH_SQL)
def sql_recursive_reachability(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Recursive-CTE surface (Q2 depth): min-hop reachability from the
    lowest host computed by the IDENTICAL `WITH RECURSIVE` SQL text
    on both engines — Spark 4's recursive CTE (UNION ALL recursion +
    depth guard) against DuckDB's, zero translation layer. This is
    UNION ALL recursion, i.e. bounded PATH enumeration folded to min
    hop at the end — correct and cheap on the model-scale host graph;
    the linear-frontier form for big graphs is host_graph_bfs_hops
    (same answer, asserted by the oracle being shared there too).

    Scale shape: one doc scan collapses to the ≤53-node edge table;
    the recursion's working set is path rows bounded by depth 5 on a
    model-scale graph. At web scale, prefer the iterative operator."""
    register_views(spark, sf_dir, "documents")
    return spark.sql(_RECURSIVE_REACH_SQL)


# Shared SQL text again (Spark 4 LATERAL correlated subquery == DuckDB
# LATERAL): per-customer top-2 orders by value with a deterministic
# orderkey tie-break.
_LATERAL_TOPN_SQL = """
SELECT c.c_custkey, t.o_orderkey, t.o_totalprice
FROM customer c,
LATERAL (
    SELECT o_orderkey, round(o_totalprice, 2) AS o_totalprice
    FROM orders o
    WHERE o.o_custkey = c.c_custkey
    ORDER BY o_totalprice DESC, o_orderkey
    LIMIT 2
) t
"""


@register("sql_lateral_topn_per_group", oracle=_LATERAL_TOPN_SQL)
def sql_lateral_topn_per_group(spark: SparkSession, sf_dir: str) -> DataFrame:
    """LATERAL-join surface (Q2 depth): top-2 orders per customer via
    a correlated LATERAL subquery — the IDENTICAL SQL text executes
    on Spark 4 and DuckDB, pinning the declarative per-group-top-n
    idiom next to the window-function form
    (window_topk_orders_per_customer computes the same shape with
    row_number). Catalyst rewrites the LATERAL into a ranked window
    under the hood, so the physical plan remains a key-partitioned
    shuffle — no per-customer re-scan of orders.

    Scale shape: one orders shuffle keyed on custkey (the correlated
    LIMIT decorrelates to a partitioned rank), joined to the
    customer dimension. Same cost class as the window formulation."""
    register_views(spark, sf_dir, "customer", "orders")
    return spark.sql(_LATERAL_TOPN_SQL)
