"""ANSI-SQL front door for the analytics engine (VERDICT r3 item 9).

The engine's operators are DataFrame-first; this module exposes the
relational tier through ``spark.sql`` over registered temp views, so a
SQL-only consumer can run the same queries the DataFrame API serves —
and so each query's semantics are pinned three ways: DataFrame plan,
Spark SQL text, and the DuckDB oracle (queries.py), all hash-equal.

The SQL here is Spark dialect. It intentionally mirrors the DuckDB
oracle text (queries.py) with only the dialect-forced differences
(e.g. DuckDB ``epoch(ts)`` -> Spark ``unix_timestamp(ts)``); both are
plain ANSI aggregations/joins/windows, so Catalyst produces the same
physical plans it gives the DataFrame versions (broadcast dims,
partial aggs, single window sort per spec).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

TABLES = [
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings",
]


def register_views(
    spark: SparkSession, sf_dir: str, tables=None
) -> None:
    """Register the benchmark tables as temp views over their parquet
    files. Views are lazy — registration costs nothing; scans prune
    columns/partitions exactly as the DataFrame reads do."""
    for t in tables or TABLES:
        spark.read.parquet(f"{sf_dir}/{t}.parquet").createOrReplaceTempView(t)


# Spark-dialect SQL, column-for-column aliased like the DataFrame
# queries (queries.py) so results hash-compare equal.
SQL_QUERIES = {
    "agg_pricing_summary": """
        SELECT l_returnflag, l_linestatus,
               CAST(sum(l_quantity) AS DOUBLE) AS sum_qty,
               CAST(sum(l_extendedprice) AS DOUBLE) AS sum_base_price,
               CAST(sum(l_extendedprice * (1 - l_discount)) AS DOUBLE)
                   AS sum_disc_price,
               CAST(avg(l_quantity) AS DOUBLE) AS avg_qty,
               CAST(count(*) AS BIGINT) AS count_order
        FROM lineitem
        GROUP BY l_returnflag, l_linestatus
    """,
    "join_broadcast_dims": """
        SELECT n.n_name AS nation, CAST(count(*) AS BIGINT) AS n_orders,
               CAST(sum(o.o_totalprice) AS DOUBLE) AS revenue
        FROM orders o JOIN customer c ON o.o_custkey = c.c_custkey
                      JOIN nation n   ON c.c_nationkey = n.n_nationkey
        WHERE o.o_orderstatus = 'F'
        GROUP BY n.n_name
    """,
    "topk_per_group": """
        SELECT * FROM (
          SELECT o_custkey, o_orderkey, o_totalprice,
                 row_number() OVER (PARTITION BY o_custkey
                                    ORDER BY o_totalprice DESC, o_orderkey)
                     AS rnk
          FROM orders) ranked
        WHERE rnk <= 3
    """,
    "semi_join_exists": """
        SELECT c.c_custkey FROM customer c
        WHERE EXISTS (SELECT 1 FROM orders o
                      WHERE o.o_custkey = c.c_custkey
                        AND o.o_totalprice > 200000)
    """,
    "event_lag_gaps": """
        WITH e AS (SELECT *, unix_timestamp(ts) AS ts_sec FROM events)
        SELECT user_id, event_id,
               ts_sec - lag(ts_sec) OVER w AS gap_sec,
               CASE WHEN lag(ts_sec) OVER w IS NULL
                      OR ts_sec - lag(ts_sec) OVER w > 1800
                    THEN 1 ELSE 0 END AS session_start
        FROM e
        WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
    """,
    "rollup_order_stats": """
        SELECT coalesce(o_orderstatus, 'ALL') AS status,
               coalesce(o_orderpriority, 'ALL') AS priority,
               CAST(count(*) AS BIGINT) AS n,
               CAST(sum(o_totalprice) AS DOUBLE) AS revenue
        FROM orders
        GROUP BY ROLLUP(o_orderstatus, o_orderpriority)
    """,
}


def sql_query(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    """Run a named query through the SQL front door. Same result (and
    value hash) as ``queries.QUERIES[name](spark, sf_dir)``."""
    try:
        sql = SQL_QUERIES[name]
    except KeyError:
        raise KeyError(
            f"no SQL surface for {name!r}; available: "
            f"{sorted(SQL_QUERIES)}"
        ) from None
    register_views(spark, sf_dir)
    return spark.sql(sql)
